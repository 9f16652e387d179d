"""HyperLogLog cardinality sketch (operators/sketches.py)."""

from __future__ import annotations

import pytest

from parsel_spark.operators.sketches import hll_cardinality, hll_oracle_sql


class TestHllCardinality:
    def test_accuracy_at_5000(self, spark) -> None:
        df = spark.createDataFrame(
            [(f"http://h{i % 97}.test/p/{i}",) for i in range(5000)],
            "url string",
        )
        (row,) = hll_cardinality(df, "url").collect()
        assert row["m"] == 1024
        # typical rel-error 1.04/sqrt(1024) ~ 3.2%; allow 4 sigma
        assert abs(row["est_distinct"] - 5000) / 5000 < 0.13

    def test_duplicates_do_not_inflate(self, spark) -> None:
        rows = [(f"u{i}",) for i in range(300)] * 5
        df = spark.createDataFrame(rows, "url string")
        (row,) = hll_cardinality(df, "url").collect()
        assert abs(row["est_distinct"] - 300) / 300 < 0.15

    def test_small_range_correction(self, spark) -> None:
        df = spark.createDataFrame([(f"x{i}",) for i in range(10)], "url string")
        (row,) = hll_cardinality(df, "url").collect()
        # linear-counting branch: near-exact at tiny n
        assert abs(row["est_distinct"] - 10) < 2

    def test_oracle_parity(self, spark) -> None:
        import duckdb

        vals = [f"item-{i * 3}" for i in range(1200)]
        df = spark.createDataFrame([(v,) for v in vals], "v string")
        (srow,) = hll_cardinality(df, "v").collect()
        src = "SELECT 'item-' || (i * 3) AS v FROM range(1200) t(i)"
        (drow,) = duckdb.sql(hll_oracle_sql(src, "v")).fetchall()
        assert (srow["m"], srow["n_nonzero"], srow["est_distinct"]) == drow

    def test_partitioning_invariance(self, spark) -> None:
        df = spark.createDataFrame(
            [(f"u{i}",) for i in range(800)], "url string"
        )
        a = hll_cardinality(df, "url").collect()[0]
        b = hll_cardinality(df.repartition(13), "url").collect()[0]
        assert tuple(a) == tuple(b)

    def test_bad_b(self, spark) -> None:
        df = spark.createDataFrame([("x",)], "url string")
        with pytest.raises(ValueError):
            hll_cardinality(df, "url", b=3)
        with pytest.raises(ValueError):
            hll_oracle_sql("SELECT 1 AS v", "v", b=20)


class TestHllMerge:
    def test_union_equals_merged_registers(self, spark) -> None:
        """The mergeable-sketch property: sketch(A ∪ B) ==
        finish(merge(registers(A), registers(B))) — exactly, not
        approximately (registers are deterministic state)."""
        from parsel_spark.operators.sketches import (
            hll_cardinality,
            hll_estimate_from_registers,
            hll_merge,
            hll_registers,
        )

        a = spark.createDataFrame(
            [(f"u{i}",) for i in range(400)], "url string"
        )
        b = spark.createDataFrame(
            [(f"u{i}",) for i in range(200, 700)], "url string"
        )
        whole = a.unionByName(b)
        direct = hll_cardinality(whole, "url").collect()[0]
        merged = hll_estimate_from_registers(
            hll_merge(hll_registers(a, "url"), hll_registers(b, "url"))
        ).collect()[0]
        assert tuple(direct) == tuple(merged)

    def test_merge_requires_input(self) -> None:
        from parsel_spark.operators.sketches import hll_merge

        with pytest.raises(ValueError):
            hll_merge()


class TestCountMin:
    def test_one_sided_and_tight_when_wide(self, spark) -> None:
        from parsel_spark.operators.sketches import cm_estimate, cm_sketch

        rows = [("hot",)] * 500 + [(f"cold{i}",) for i in range(50)]
        df = spark.createDataFrame(rows, "host string")
        state = cm_sketch(df, "host", d=4, w=2048)
        keys = df.distinct()
        got = {
            r["host"]: r["est_count"]
            for r in cm_estimate(state, keys, "host", d=4, w=2048).collect()
        }
        assert got["hot"] >= 500
        # wide sketch, 51 keys: collisions across ALL 4 rows are
        # overwhelmingly unlikely -> exact
        assert got["hot"] == 500
        assert all(got[f"cold{i}"] == 1 for i in range(50))

    def test_merge_adds_counters(self, spark) -> None:
        from parsel_spark.operators.sketches import (
            cm_estimate,
            cm_merge,
            cm_sketch,
        )

        a = spark.createDataFrame([("x",)] * 3, "host string")
        b = spark.createDataFrame([("x",)] * 4 + [("y",)], "host string")
        merged = cm_merge(
            cm_sketch(a, "host"), cm_sketch(b, "host")
        )
        keys = spark.createDataFrame([("x",), ("y",)], "host string")
        got = {
            r["host"]: r["est_count"]
            for r in cm_estimate(merged, keys, "host").collect()
        }
        assert got == {"x": 7, "y": 1}

    def test_bad_args(self, spark) -> None:
        from parsel_spark.operators.sketches import cm_estimate, cm_sketch

        df = spark.createDataFrame([("x",)], "host string")
        with pytest.raises(ValueError):
            cm_sketch(df, "host", d=0)
        with pytest.raises(ValueError):
            cm_estimate(df, df, "host", w=1)


def test_hll_empty_corpus_estimates_zero(spark) -> None:
    import duckdb

    from parsel_spark.operators.sketches import hll_cardinality, hll_oracle_sql

    empty = spark.createDataFrame([], "url string")
    (row,) = hll_cardinality(empty, "url").collect()
    assert row["n_nonzero"] == 0
    assert row["est_distinct"] == 0.0
    (drow,) = duckdb.sql(
        hll_oracle_sql("SELECT 'x' AS v WHERE 1 = 0", "v")
    ).fetchall()
    assert (row["m"], row["n_nonzero"], row["est_distinct"]) == drow
