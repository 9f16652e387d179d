

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


class TestSemanticDedup:
    def _fixture(self, spark):
        from pyspark.sql import functions as F  # noqa: F401

        def v(*pairs):
            out = [0.0] * 8
            for i, x in pairs:
                out[i] = float(x)
            return out

        emb = spark.createDataFrame(
            [
                (0, v((0, 1.0))),            # cluster 0 anchor
                (1, v((0, 2.0))),            # same direction -> dup of 0
                (2, v((1, 1.0))),            # orthogonal -> kept
                (3, v((2, 1.0))),            # cluster 1 anchor
                (4, v((2, 1.0), (3, 0.01))), # near 3 -> dup of 3
                (5, v((0, 1.0))),            # identical to 0 but OTHER cluster
            ],
            "vec_id long, embedding array<float>",
        )
        assigned = spark.createDataFrame(
            [(0, 0), (1, 0), (2, 0), (3, 1), (4, 1), (5, 1)],
            "vec_id long, cid int",
        )
        return emb, assigned

    def test_dominated_by_lower_id_within_cluster(self, spark) -> None:
        from parsel_spark.operators.similarity import semantic_dedup

        emb, assigned = self._fixture(spark)
        got = {
            r["vec_id"]: (r["keep"], r["dup_of"])
            for r in semantic_dedup(emb, assigned, threshold=0.97).collect()
        }
        assert got[0] == (True, None)
        assert got[1] == (False, 0)
        assert got[2] == (True, None)
        assert got[3] == (True, None)
        assert got[4] == (False, 3)

    def test_cross_cluster_duplicate_not_caught(self, spark) -> None:
        """The documented recall boundary: candidates come only from the
        quantizer cell — an identical vector in ANOTHER cell survives."""
        from parsel_spark.operators.similarity import semantic_dedup

        emb, assigned = self._fixture(spark)
        got = {
            r["vec_id"]: r["keep"]
            for r in semantic_dedup(emb, assigned, threshold=0.97).collect()
        }
        assert got[5] is True

    def test_partitioning_invariance(self, spark) -> None:
        from parsel_spark.operators.similarity import semantic_dedup

        emb, assigned = self._fixture(spark)
        a = sorted(
            map(tuple, semantic_dedup(emb, assigned, 0.97).collect())
        )
        b = sorted(
            map(
                tuple,
                semantic_dedup(
                    emb.repartition(1), assigned.repartition(7), 0.97
                ).collect(),
            )
        )
        assert a == b

    def test_composes_with_ivf_index(self, spark) -> None:
        """End-to-end with the real coarse quantizer: planted duplicate
        pairs co-cluster (identical vectors share a nearest centroid by
        construction) and dedup drops the higher id of each."""
        from parsel_spark.operators.similarity import ivf_index, semantic_dedup

        rows = []
        for i in range(24):
            base = [float((i * 7 + d * 3) % 11 - 5) for d in range(8)]
            rows.append((i, base))
        # plant exact twins of 3 vectors at high ids
        for j, src in enumerate((1, 5, 9)):
            rows.append((100 + j, rows[src][1]))
        emb = spark.createDataFrame(
            rows, "vec_id long, embedding array<float>"
        )
        assigned, _ = ivf_index(emb, n_centroids=4, iters=1)
        got = {
            r["vec_id"]: (r["keep"], r["dup_of"])
            for r in semantic_dedup(emb, assigned, threshold=0.9999).collect()
        }
        assert got[100] == (False, 1)
        assert got[101] == (False, 5)
        assert got[102] == (False, 9)
        assert got[1][0] and got[5][0] and got[9][0]


class TestTopComponent:
    def test_matches_numpy_leading_eigenvector(self, spark) -> None:
        import numpy as np

        from parsel_spark.operators.similarity import top_component

        rng = [
            [float(3 * (i % 5 - 2) + (1 if i % 2 else -1)),
             float(4 * (i % 5 - 2) - (1 if i % 3 else 0))] + [0.0] * 6
            for i in range(40)
        ]
        df = spark.createDataFrame(
            [(i, v) for i, v in enumerate(rng)],
            "vec_id long, embedding array<float>",
        )
        got = {
            r["dim"]: r["component"]
            for r in top_component(df, iters=8, dim=8).collect()
        }
        x = np.array([got[d] for d in range(8)])
        m = np.array(rng, dtype=np.float64)
        w, v = np.linalg.eigh(m.T @ m)
        lead = v[:, -1]
        if np.dot(lead, x) < 0:
            lead = -lead
        assert np.allclose(x, lead, atol=1e-4), (x, lead)
        assert abs(np.linalg.norm(x) - 1.0) < 1e-6

    def test_deterministic_across_partitioning(self, spark) -> None:
        from parsel_spark.operators.similarity import top_component

        rows = [
            (i, [float((i * 7 + d * 3) % 11 - 5) for d in range(8)])
            for i in range(30)
        ]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        a = sorted(map(tuple, top_component(df, iters=3, dim=8).collect()))
        b = sorted(
            map(
                tuple,
                top_component(df.repartition(7), iters=3, dim=8).collect(),
            )
        )
        assert a == b

    def test_bad_iters(self, spark) -> None:
        import pytest as _pytest

        from parsel_spark.operators.similarity import top_component

        df = spark.createDataFrame(
            [(0, [1.0, 0.0])], "vec_id long, embedding array<float>"
        )
        with _pytest.raises(ValueError):
            top_component(df, iters=0)


class TestKnnGraph:
    def test_neighbors_within_bucket_ranked(self, spark) -> None:
        from parsel_spark.operators.similarity import knn_graph

        # co-directional family + an orthogonal singleton
        rows = [
            (0, [1.0, 0.0, 0.0, 0.0]),
            (1, [2.0, 0.1, 0.0, 0.0]),
            (2, [1.0, 0.5, 0.0, 0.0]),
            (3, [-1.0, -2.0, -1.0, -5.0]),
        ]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        got = {}
        for r in knn_graph(df, k=2, n_planes=2, dim=4).collect():
            got.setdefault(r["vec_id"], []).append(
                (r["rank"], r["neighbor"], r["sim"])
            )
        # 0's nearest is 1 (cos ~0.999) then 2 (cos ~0.894)
        n0 = sorted(got[0])
        assert [n for _, n, _ in n0] == [1, 2]
        assert n0[0][2] > n0[1][2]
        # every listed neighbor pair is mutual-bucket — ranks start at 1
        for edges in got.values():
            assert min(r for r, _, _ in edges) == 1

    def test_k_bounds_and_determinism(self, spark) -> None:
        import pytest as _pytest

        from parsel_spark.operators.similarity import knn_graph

        rows = [
            (i, [float((i * 3 + d) % 7 - 3) for d in range(4)])
            for i in range(30)
        ]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        a = sorted(map(tuple, knn_graph(df, k=3, dim=4).collect()))
        b = sorted(
            map(tuple, knn_graph(df.repartition(7), k=3, dim=4).collect())
        )
        assert a == b
        assert all(t[3] <= 3 for t in a)
        with _pytest.raises(ValueError):
            knn_graph(df, k=0)
