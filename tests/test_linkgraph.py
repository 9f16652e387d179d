"""PageRank over the crawl link graph (operators/linkgraph.py)."""

from __future__ import annotations

import math

import pytest

from parsel_spark.operators.linkgraph import pagerank, pagerank_oracle_cte


def _ranks(df):
    return {r["node"]: r["rank"] for r in df.collect()}


def _hand_pagerank(edges, iters, d=0.85):
    """Independent driver-side reference (plain Python dicts)."""
    nodes = sorted({s for s, _ in edges} | {t for _, t in edges})
    n = float(len(nodes))
    outdeg: dict = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    rank = {v: 1.0 / n for v in nodes}
    for _ in range(iters):
        dang = sum(rank[v] for v in nodes if v not in outdeg)
        contrib = {v: 0.0 for v in nodes}
        for s, t in edges:
            contrib[t] += rank[s] / outdeg[s]
        rank = {
            v: (1.0 - d) / n + d * (contrib[v] + dang / n) for v in nodes
        }
    return rank


class TestPagerank:
    def test_ring_is_uniform(self, spark):
        # A->B->C->A: the uniform vector is the exact fixpoint, so any
        # number of rounds returns exactly 1/3 each
        edges = spark.createDataFrame(
            [("a", "b"), ("b", "c"), ("c", "a")], "src string, dst string"
        )
        got = _ranks(pagerank(edges, iters=4))
        assert set(got) == {"a", "b", "c"}
        for v in got.values():
            assert math.isclose(v, 1.0 / 3.0, rel_tol=1e-12)

    def test_matches_hand_reference_with_dangling(self, spark):
        # star + chain + a dangling sink: b and d have no out-edges
        edges = [
            ("a", "b"),
            ("a", "c"),
            ("c", "a"),
            ("c", "d"),
            ("e", "a"),
        ]
        df = spark.createDataFrame(edges, "src string, dst string")
        for iters in (1, 2, 3):
            got = _ranks(pagerank(df, iters=iters))
            want = _hand_pagerank(edges, iters)
            assert set(got) == set(want)
            for v in got:
                assert math.isclose(got[v], want[v], rel_tol=1e-12), (
                    iters,
                    v,
                )

    def test_mass_conserved(self, spark):
        edges = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "b"), ("x", "a")]
        df = spark.createDataFrame(edges, "src string, dst string")
        got = _ranks(pagerank(df, iters=3))
        assert math.isclose(sum(got.values()), 1.0, rel_tol=1e-12)

    def test_partitioning_invariance(self, spark):
        edges = [
            (f"h{i % 7}", f"h{(i * 3 + i // 7) % 7}") for i in range(40)
        ] + [("h1", "sink")]
        df = spark.createDataFrame(edges, "src string, dst string").distinct()
        a = _ranks(pagerank(df, iters=3))
        b = _ranks(pagerank(df.repartition(1), iters=3))
        assert set(a) == set(b)
        for v in a:
            assert math.isclose(a[v], b[v], rel_tol=1e-12)

    def test_oracle_cte_matches_spark(self, spark):
        import duckdb

        edges = [
            ("a", "b"),
            ("a", "c"),
            ("b", "c"),
            ("c", "a"),
            ("c", "sink"),
        ]
        df = spark.createDataFrame(edges, "src string, dst string")
        got = _ranks(pagerank(df, iters=3))
        vals = " UNION ALL ".join(
            f"SELECT '{s}' AS src, '{t}' AS dst" for s, t in edges
        )
        rows = duckdb.sql(pagerank_oracle_cte(vals, iters=3)).fetchall()
        want = dict(rows)
        assert set(got) == set(want)
        for v in got:
            assert math.isclose(got[v], want[v], rel_tol=1e-12)

    def test_bad_args_raise(self, spark):
        df = spark.createDataFrame([("a", "b")], "src string, dst string")
        with pytest.raises(ValueError):
            pagerank(df, iters=0)
        with pytest.raises(ValueError):
            pagerank(df, damping=1.0)
        with pytest.raises(ValueError):
            pagerank_oracle_cte("SELECT 1 AS src, 2 AS dst", iters=0)


class TestAnchorRollup:
    def test_mode_and_counts(self, spark) -> None:
        from parsel_spark.operators.linkgraph import anchor_rollup

        anchors = spark.createDataFrame(
            [
                (1, "http://t/a", "click here"),
                (2, "http://t/a", "Acme homepage"),
                (3, "http://t/a", "Acme homepage"),
                (3, "http://t/a", "Acme homepage"),  # same src twice
                (4, "http://t/b", "b-page"),
            ],
            "doc_id long, href string, anchor_text string",
        )
        got = {
            r["href"]: (r["n_inlinks"], r["n_sources"], r["top_anchor_text"])
            for r in anchor_rollup(anchors).collect()
        }
        assert got["http://t/a"] == (4, 3, "Acme homepage")
        assert got["http://t/b"] == (1, 1, "b-page")

    def test_tie_breaks_lexicographically(self, spark) -> None:
        from parsel_spark.operators.linkgraph import anchor_rollup

        anchors = spark.createDataFrame(
            [(1, "http://t/x", "zeta"), (2, "http://t/x", "alpha")],
            "doc_id long, href string, anchor_text string",
        )
        (row,) = anchor_rollup(anchors).collect()
        assert row["top_anchor_text"] == "alpha"
