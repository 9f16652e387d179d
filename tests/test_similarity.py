

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
