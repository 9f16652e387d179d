

class TestInt8Quantization:
    def test_codes_and_scale(self, spark) -> None:
        from parsel_spark.operators.similarity import quantize_embeddings

        rows = [(1, [2.0, -1.0, 0.5]), (2, [0.0, 0.0, 0.0])]
        got = {
            r["vec_id"]: r
            for r in quantize_embeddings(
                spark.createDataFrame(
                    rows, "vec_id long, embedding array<float>"
                )
            ).collect()
        }
        # max|x|=2 -> scale 2/127; codes floor(x*127/2)
        assert got[1]["qvec"] == [127, -64, 31]
        assert abs(got[1]["scale"] - 2.0 / 127.0) < 1e-15
        assert got[2]["qvec"] == [0, 0, 0] and got[2]["scale"] == 0.0

    def test_codes_bounded(self, spark) -> None:
        from parsel_spark.operators.similarity import quantize_embeddings

        import random

        rng = random.Random(7)
        rows = [
            (i, [rng.uniform(-9, 9) for _ in range(16)]) for i in range(50)
        ]
        out = quantize_embeddings(
            spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        ).collect()
        for r in out:
            assert all(-127 <= v <= 127 for v in r["qvec"]), r

    def test_knn_quantized_close_to_exact_dot(self, spark) -> None:
        """Quantized top-k must near-match the EXACT float dot-product
        top-k (the metric it approximates — knn_bruteforce ranks by
        cosine, a different ordering when norms vary)."""
        from parsel_spark.operators.similarity import knn_quantized

        import random

        rng = random.Random(3)
        base = [[rng.uniform(-1, 1) for _ in range(16)] for _ in range(5)]
        rows = []
        for i in range(100):
            c = base[i % 5]
            rows.append((i, [v + rng.uniform(-0.05, 0.05) for v in c]))
        qv = rows[0][1]
        exact_rank = sorted(
            (
                (sum(a * b for a, b in zip(vec, qv)), i)
                for i, vec in rows
                if i != 0
            ),
            key=lambda t: (-t[0], t[1]),
        )
        exact = {i for _, i in exact_rank[:10]}
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        quant = {r["vec_id"] for r in knn_quantized(df, 0, k=10).collect()}
        assert len(exact & quant) >= 9, (exact, quant)


class TestSemanticDecontam:
    def test_broadcast_exact_flags_planted(self, spark) -> None:
        """Exact mode: a train vector equal to an eval vector is
        contaminated at sim 1.0; an orthogonal one is not."""
        from parsel_spark.operators.decontam import semantic_decontaminate

        train = spark.createDataFrame(
            [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [1.0, 0.05])],
            "vec_id long, embedding array<double>",
        )
        ev = spark.createDataFrame(
            [(100, [1.0, 0.0])], "vec_id long, embedding array<double>"
        )
        got = {r["vec_id"]: r for r in semantic_decontaminate(
            train, ev, threshold=0.9, method="broadcast", dim=2
        ).collect()}
        assert got[1]["contaminated"] and got[1]["max_sim"] == 1.0
        assert not got[2]["contaminated"] and got[2]["max_sim"] == 0.0
        assert got[3]["contaminated"]  # cos ~ 0.9988

    def test_lsh_mode_no_candidates_not_contaminated(self, spark) -> None:
        """LSH rows with no bucket-mate eval candidate come back with
        NULL max_sim and contaminated=False (never dropped)."""
        from parsel_spark.operators.decontam import semantic_decontaminate

        import numpy as np
        rng = np.random.RandomState(7)
        rows = [(i, rng.randn(64).tolist()) for i in range(40)]
        train = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        )
        ev = spark.createDataFrame(
            rows[:1], "vec_id long, embedding array<double>"
        )
        out = semantic_decontaminate(
            train, ev, threshold=0.99, method="lsh", n_planes=6, dim=64
        )
        got = {r["vec_id"]: r for r in out.collect()}
        assert len(got) == 40  # every train row present
        assert got[0]["contaminated"]  # self-match
        assert any(r["max_sim"] is None and not r["contaminated"]
                   for r in got.values())

    def test_bad_method_raises(self, spark) -> None:
        import pytest as _pytest

        from parsel_spark.operators.decontam import semantic_decontaminate

        df = spark.createDataFrame(
            [(1, [1.0])], "vec_id long, embedding array<double>"
        )
        with _pytest.raises(ValueError):
            semantic_decontaminate(df, df, method="exact")
