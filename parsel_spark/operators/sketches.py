"""Mergeable distributed sketches — cardinality estimation for frontier
planning.

A 10^10-URL frontier cannot afford exact ``count(distinct url)`` for
monitoring (a full shuffle of every URL); the standard answer is
HyperLogLog (Flajolet, Fusy, Gandouet, Meunier, AofA 2007; the "HLL++"
refinements in Heule, Nunkesser, Hall, EDBT 2013).  Spark's own
``approx_count_distinct`` IS HLL++, but its register hashing is
engine-private — useless under this repo's cross-engine value oracle.
This module implements HLL over the repo's 60-bit md5 base hash with
ENTIRELY integer register algebra, so DuckDB replays the sketch
bit-for-bit: registers are ``max(rho)`` per bucket (one map-side-combined
groupBy over 2^b buckets), and the harmonic sum is computed as the EXACT
integer ``Σ 2^(P+1-M)`` (multiply through by 2^(P+1) — no float
accumulation anywhere; the only floats are the final alpha/ln, computed
from identical literals in both engines and rounded).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def hll_cardinality(df: DataFrame, col: str, b: int = 10) -> DataFrame:
    """HyperLogLog distinct-count estimate of ``col`` — one row:
    ``(m, n_nonzero, est_distinct)``.

    * bucket = top ``b`` bits of the 60-bit md5 hash; rho = leading
      zeros of the remaining ``P = 60-b`` bits + 1 (via integer
      bit-length: ``length(bin(rest))`` — no float log);
    * register ``M_j = max(rho)`` per bucket — ONE map-side-combined
      groupBy over ≤ 2^b groups, the mergeable-sketch shape (union of
      corpora = elementwise max of registers);
    * raw estimate = alpha_m · m² / Σ 2^(−M_j), with the harmonic sum
      scaled to the exact integer ``Σ 2^(P+1−M_j)`` (empty buckets
      contribute 2^(P+1)); Flajolet's small-range correction
      ``m·ln(m/V)`` applies when est ≤ 2.5m and V (zero registers) > 0.

    Typical relative error ≈ 1.04/sqrt(2^b) (~3.2% at b=10).  Estimate
    rounded to 4 — the ln/alpha floats are computed from identical
    literals in both engines."""
    return hll_estimate_from_registers(hll_registers(df, col, b), b)


def hll_oracle_sql(source_sql: str, expr: str, b: int = 10) -> str:
    """DuckDB replay of :func:`hll_cardinality` — shared by the driver
    oracle and the unit tests.  ``source_sql`` yields the rows,
    ``expr`` is the hashed column expression."""
    if not 4 <= b <= 16:
        raise ValueError(f"b must be in [4, 16], got {b}")
    m = 1 << b
    p_bits = 60 - b
    if m >= 128:
        alpha = 0.7213 / (1.0 + 1.079 / m)
    elif m == 64:
        alpha = 0.709
    elif m == 32:
        alpha = 0.697
    else:
        alpha = 0.673
    return f"""
        WITH src AS ({source_sql}),
        h AS (
            SELECT ('0x' || substr(md5({expr}), 1, 15))::BIGINT AS h
            FROM src
        ), r AS (
            SELECT h // {1 << p_bits} AS bucket,
                   {p_bits} - (CASE WHEN h % {1 << p_bits} > 0
                       THEN length(bin(h % {1 << p_bits}))
                       ELSE 0 END) + 1 AS rho
            FROM h
        ), regs AS (
            SELECT bucket, max(rho) AS M FROM r GROUP BY bucket
        ), agg AS (
            SELECT count(*) AS n_nonzero,
                   coalesce(sum(1::BIGINT << ({p_bits} + 1 - M)),
                            0)::BIGINT AS s_present
            FROM regs
        )
        SELECT {m} AS m, n_nonzero::BIGINT AS n_nonzero,
               round(CASE WHEN ({alpha!r}::DOUBLE * {m} * {m}
                           * {float(1 << (p_bits + 1))!r}
                           / (s_present + ({m} - n_nonzero)::BIGINT
                              * {1 << (p_bits + 1)}::BIGINT)::DOUBLE)
                          <= 2.5 * {m}
                          AND ({m} - n_nonzero) > 0
                     THEN {float(m)!r} * ln({float(m)!r}
                          / ({m} - n_nonzero)::DOUBLE)
                     ELSE {alpha!r}::DOUBLE * {m} * {m}
                          * {float(1 << (p_bits + 1))!r}
                          / (s_present + ({m} - n_nonzero)::BIGINT
                             * {1 << (p_bits + 1)}::BIGINT)::DOUBLE END,
                     4) AS est_distinct
        FROM agg
    """


def hll_registers(df: DataFrame, col: str, b: int = 10) -> DataFrame:
    """The sketch STATE of :func:`hll_cardinality`: ``(bucket, M)``
    register rows (≤ 2^b of them).  This is what a 100 TB pipeline
    persists per partition/snapshot — registers of a union are the
    elementwise max (:func:`hll_merge`), so per-shard sketches combine
    without touching the data again."""
    if not 4 <= b <= 16:
        raise ValueError(f"b must be in [4, 16], got {b}")
    from .dedup import md5_hash60

    p_bits = 60 - b
    h = md5_hash60(F.col(col))
    bucket = F.expr(f"__h div {1 << p_bits}")
    rest = F.pmod(F.col("__h"), F.lit(1 << p_bits))
    rho = (
        F.lit(p_bits)
        - F.when(rest > 0, F.length(F.bin(rest))).otherwise(F.lit(0))
        + F.lit(1)
    )
    return (
        df.select(h.alias("__h"))
        .select(bucket.alias("bucket"), rho.alias("rho"))
        .groupBy("bucket")
        .agg(F.max("rho").alias("M"))
    )


def hll_merge(*register_sets: DataFrame) -> DataFrame:
    """Union of sketches = elementwise register max — the property that
    makes HLL the right cardinality monitor for a sharded frontier:
    each shard/snapshot sketches independently, merges are tiny
    (≤ 2^b rows each) and lossless w.r.t. the sketch."""
    if not register_sets:
        raise ValueError("need at least one register set")
    merged = register_sets[0]
    for regs in register_sets[1:]:
        merged = merged.unionByName(regs)
    return merged.groupBy("bucket").agg(F.max("M").alias("M"))


def hll_estimate_from_registers(regs: DataFrame, b: int = 10) -> DataFrame:
    """Finish a (possibly merged) register set into the
    ``(m, n_nonzero, est_distinct)`` row — same estimator as
    :func:`hll_cardinality` (exact integer harmonic sum + small-range
    correction)."""
    if not 4 <= b <= 16:
        raise ValueError(f"b must be in [4, 16], got {b}")
    m = 1 << b
    p_bits = 60 - b
    if m >= 128:
        alpha = 0.7213 / (1.0 + 1.079 / m)
    elif m == 64:
        alpha = 0.709
    elif m == 32:
        alpha = 0.697
    else:
        alpha = 0.673
    scaled = regs.agg(
        F.count(F.lit(1)).alias("n_nonzero"),
        # coalesce: an EMPTY corpus has zero register rows — the sum
        # must be 0, not NULL, so the small-range correction yields
        # m*ln(m/m) = 0.0 rather than a NULL estimate
        F.coalesce(
            F.sum(
                F.expr(f"shiftleft(CAST(1 AS BIGINT), {p_bits} + 1 - M)")
            ),
            F.lit(0).cast("long"),
        ).alias("s_present"),
    )
    n_nonzero = F.col("n_nonzero")
    total = F.col("s_present") + (F.lit(m) - n_nonzero) * F.lit(
        1 << (p_bits + 1)
    )
    raw = (
        F.lit(alpha * m * m)
        * F.lit(float(1 << (p_bits + 1)))
        / total.cast("double")
    )
    zeros = F.lit(m) - n_nonzero
    est = F.when(
        (raw <= 2.5 * m) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double")),
    ).otherwise(raw)
    return scaled.select(
        F.lit(m).alias("m"),
        n_nonzero.cast("long").alias("n_nonzero"),
        F.round(est, 4).alias("est_distinct"),
    )


def cm_sketch(df: DataFrame, col: str, d: int = 4, w: int = 1024) -> DataFrame:
    """Count-min sketch state (Cormode & Muthukrishnan, J.Algorithms
    2005) — the heavy-hitter / frequency monitor companion to the HLL:
    ``(r, slot, cnt)`` counter rows for a depth-``d`` × width-``w``
    matrix, hashes = the repo's 60-bit md5 family salted per row
    (``#cm{r}``).  ONE pass: explode the d (row, slot) pairs map-side,
    one map-side-combined groupBy over ≤ d·w groups.  Mergeable by
    counter ADDITION (:func:`cm_merge`); estimates are one-sided
    (``est >= true``), error ≤ e·N/w with prob 1−e^−d."""
    if d < 1 or w < 2:
        raise ValueError(f"need d >= 1 and w >= 2, got {d}, {w}")
    from .dedup import md5_hash60

    pairs = F.array(
        *[
            F.struct(
                F.lit(r).alias("r"),
                F.pmod(
                    md5_hash60(F.concat(F.col(col), F.lit(f"#cm{r}"))),
                    F.lit(w),
                ).alias("slot"),
            )
            for r in range(d)
        ]
    )
    return (
        df.select(F.explode(pairs).alias("p"))
        .select(F.col("p.r").alias("r"), F.col("p.slot").alias("slot"))
        .groupBy("r", "slot")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cm_merge(*states: DataFrame) -> DataFrame:
    """Union of count-min sketches = elementwise counter addition."""
    if not states:
        raise ValueError("need at least one sketch state")
    merged = states[0]
    for st in states[1:]:
        merged = merged.unionByName(st)
    return merged.groupBy("r", "slot").agg(F.sum("cnt").alias("cnt"))


def cm_estimate(
    state: DataFrame,
    keys: DataFrame,
    col: str,
    d: int = 4,
    w: int = 1024,
) -> DataFrame:
    """Point-query the sketch for each key row: ``est_count`` = min
    over the d counters the key hashes to (0 when a slot was never
    touched).  The state is ≤ d·w rows and BROADCASTS; keys never
    shuffle."""
    if d < 1 or w < 2:
        raise ValueError(f"need d >= 1 and w >= 2, got {d}, {w}")
    from .dedup import md5_hash60

    pairs = F.array(
        *[
            F.struct(
                F.lit(r).alias("r"),
                F.pmod(
                    md5_hash60(F.concat(F.col(col), F.lit(f"#cm{r}"))),
                    F.lit(w),
                ).alias("slot"),
            )
            for r in range(d)
        ]
    )
    ks = keys.select(F.col(col), F.explode(pairs).alias("p")).select(
        col, F.col("p.r").alias("r"), F.col("p.slot").alias("slot")
    )
    joined = ks.join(F.broadcast(state), ["r", "slot"], "left")
    return joined.groupBy(col).agg(
        F.min(F.coalesce("cnt", F.lit(0))).cast("long").alias("est_count")
    )
