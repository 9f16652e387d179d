"""Deterministic hash-based sampling / splitting — training-data
pipeline staples over a 100 TB corpus.

Random sampling (``df.sample``) is NOT what a production pipeline wants:
it changes across reruns, partitions and Spark versions, so a resumed or
re-executed job sees a different dataset.  These operators derive a
uniform [0, 1) value from ``md5(key || '#' || seed)`` — a pure function
of the ROW KEY, so:

* the same row lands in the same sample/split on every run, at every
  parallelism, on every engine (the exact same expression runs in the
  DuckDB oracle);
* sampling is a map-side FILTER — no shuffle, full predicate pushdown
  around it, and rates compose (a 10% sample of a 50% sample is the 5%
  sample of matching keys);
* train/val/test splits are disjoint and exhaustive by construction
  (interval partition of [0, 1)).

The unit value uses the first 15 md5 hex digits (60 bits) — BIGINT-safe
in any engine, bias < 2^-60.

Reference surface: the reference crawler has no sampling layer (its
test corpus is enumerated); these operators cover SURVEY §2's
training-data-pipeline extension the same way dedup/similarity do.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: 2^60 as a double — divisor turning the 60-bit hash into U[0, 1)
_UNIT = float(1 << 60)


def unit_hash(key: Column | str, seed: int = 0) -> Column:
    """U[0, 1) as a pure function of (key, seed): first 60 bits of
    ``md5(key || '#' || seed)`` over 2^60.  DuckDB twin:
    ``('0x' || substr(md5(key || '#' || seed), 1, 15))::BIGINT / 2^60``."""
    keyed = F.concat(F.col(key) if isinstance(key, str) else key,
                     F.lit(f"#{seed}"))
    h60 = F.conv(F.substring(F.md5(keyed), 1, 15), 16, 10).cast("long")
    return h60.cast("double") / F.lit(_UNIT)


def hash_sample(
    df: DataFrame, key_col: str, rate: float, seed: int = 0
) -> DataFrame:
    """Deterministic ``rate``-fraction sample keyed on ``key_col`` —
    a map-side filter (no shuffle, no RNG state); stable across reruns
    and engines."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    return df.filter(unit_hash(key_col, seed) < rate)


def hash_split(
    df: DataFrame,
    key_col: str,
    weights: dict[str, float],
    seed: int = 0,
    split_col: str = "split",
) -> DataFrame:
    """Deterministic disjoint+exhaustive split assignment: adds
    ``split_col`` with the name of the [0,1)-interval the row's unit
    hash falls into.  ``weights`` need not sum to 1 — they are
    normalized; iteration order defines the interval order, so pass an
    ordered dict (e.g. ``{"train": 0.8, "val": 0.1, "test": 0.1}``)."""
    if not weights:
        raise ValueError("weights must be non-empty")
    total = float(sum(weights.values()))
    if total <= 0:
        raise ValueError("weights must sum to a positive value")
    u = unit_hash(key_col, seed)
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name] / total
        case = F.when(u < F.lit(acc), F.lit(name))
        expr = case if expr is None else expr.when(u < F.lit(acc), F.lit(name))
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn(split_col, expr)


def hash_sample_strata(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    seed: int = 0,
) -> DataFrame:
    """Per-stratum deterministic sampling — the dataset-MIXING op of a
    training pipeline (e.g. keep 100% of wiki, 30% of web, 5% of logs):
    each row passes iff its unit hash is below ITS STRATUM's rate.
    Still a map-side filter (the rate table compiles into a literal
    CASE expression — no join, no shuffle, works inside any pushdown),
    still stable across reruns, and per-stratum samples stay nested
    across rate changes (same unit hash ⇒ raising a rate only ADDS
    rows)."""
    for stratum, rate in rates.items():
        if not 0.0 <= rate <= 1.0:
            raise ValueError(f"rate for {stratum!r} must be in [0, 1], got {rate}")
    if not 0.0 <= default_rate <= 1.0:
        raise ValueError(f"default_rate must be in [0, 1], got {default_rate}")
    rate_expr = None
    for stratum, rate in rates.items():
        cond = F.col(strata_col) == F.lit(stratum)
        rate_expr = (
            F.when(cond, F.lit(float(rate)))
            if rate_expr is None
            else rate_expr.when(cond, F.lit(float(rate)))
        )
    rate_expr = (
        F.lit(float(default_rate))
        if rate_expr is None
        else rate_expr.otherwise(F.lit(float(default_rate)))
    )
    return df.filter(unit_hash(key_col, seed) < rate_expr)


def source_mixture(
    docs: DataFrame,
    source_col: str = "source",
    tokens_col: Column | None = None,
) -> DataFrame:
    """Per-source corpus rollup — the "dataset card" numbers mixture
    planning starts from: (source, n_docs, total_tokens, token_share).
    ``tokens_col`` defaults to the BPE-ish counter (the budget unit a
    packing stage sees).

    Scale shape: one map-side-combined groupBy on the source key; the
    corpus-wide total joins back as a broadcast 1-row aggregate (no
    single-partition window)."""
    if tokens_col is None:
        from .textstats import bpe_token_count

        tokens_col = bpe_token_count().cast("long")
    per_source = docs.select(
        F.col(source_col).alias("source"), tokens_col.alias("__t")
    ).groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("__t").alias("total_tokens"),
    )
    total = per_source.groupBy().agg(
        F.sum("total_tokens").alias("__all")
    )
    return per_source.crossJoin(F.broadcast(total)).select(
        "source",
        "n_docs",
        "total_tokens",
        F.round(F.col("total_tokens") / F.col("__all"), 6).alias(
            "token_share"
        ),
    )


def mixture_sampling_rates(
    mixture: DataFrame,
    weights: dict[str, float],
    token_budget: int,
) -> DataFrame:
    """Per-source deterministic sampling rates realizing a target
    mixture: ``rate_s = min(1, token_budget * w_s / total_tokens_s)``
    (single-pass; a source too small for its target clamps at 1.0 and
    the shortfall is REPORTED, not silently redistributed — surplus
    re-allocation is a policy choice left to the caller).  Output:
    (source, weight, target_tokens, rate, expected_tokens, shortfall).
    Feed ``rate`` into ``hash_sample_strata`` for the map-side filter."""
    if token_budget <= 0:
        raise ValueError(f"token_budget must be positive: {token_budget}")
    total_w = sum(weights.values())
    if total_w <= 0:
        raise ValueError("weights must sum to a positive value")
    pairs = [(s, float(w) / total_w) for s, w in sorted(weights.items())]
    weight_expr = F.lit(None).cast("double")
    for source, weight in pairs:
        weight_expr = F.when(
            F.col("source") == source, F.lit(weight)
        ).otherwise(weight_expr)
    target = F.round(F.col("weight") * token_budget).cast("long")
    rate = F.least(
        F.lit(1.0), F.col("target_tokens") / F.col("total_tokens")
    )
    return (
        mixture.select("source", "total_tokens", weight_expr.alias("weight"))
        .filter(F.col("weight").isNotNull())
        .withColumn("target_tokens", target)
        .withColumn("rate", F.round(rate, 6))
        .withColumn(
            "expected_tokens",
            F.least("target_tokens", "total_tokens").cast("long"),
        )
        .withColumn(
            "shortfall",
            F.greatest(
                F.lit(0).cast("long"),
                (F.col("target_tokens") - F.col("total_tokens")).cast(
                    "long"
                ),
            ),
        )
        .select(
            "source", "weight", "target_tokens", "rate",
            "expected_tokens", "shortfall",
        )
    )


def cap_per_group(
    df: DataFrame,
    group_col: Column | str,
    cap: int,
    id_col: str,
    order_by: list[Column] | None = None,
    seed: int = 0,
) -> DataFrame:
    """Keep at most ``cap`` rows per group — the C4/FineWeb-style
    per-host (or per-domain / per-URL-prefix) contribution cap that
    stops a handful of giant hosts from dominating a 100 TB corpus.

    Deterministic by construction: the default order is
    ``(unit_hash(id_col, seed), id_col)`` — an unbiased, rerun-stable
    "random" subset of each oversized group (same engine-portable md5
    unit hash as :func:`hash_sample`, so the DuckDB oracle replays the
    exact predicate).  Pass ``order_by`` (e.g. ``[F.col("quality")
    .desc()]``) to keep the BEST rows instead; ``id_col`` is always the
    final tiebreak so ties cannot flap across runs or partitioning.

    Scale shape: ONE hash exchange on the group key + an in-partition
    sort (``row_number`` window) — no driver data, no all-group
    materialization.  Groups under the cap pass through unchanged; AQE
    skew handling applies to the exchange like any other window.  The
    returned frame keeps the input columns (the rank is internal).

    Reference counterpart: none (parsel stops at extraction); SURVEY §2
    training-data-pipeline extension, same category as hash_sample.
    """
    if cap < 1:
        raise ValueError(f"cap must be >= 1, got {cap}")
    gcol = F.col(group_col) if isinstance(group_col, str) else group_col
    from pyspark.sql import Window

    order = list(order_by) if order_by else [unit_hash(id_col, seed)]
    order.append(F.col(id_col).asc())
    w = Window.partitionBy(gcol).orderBy(*order)
    rn = F.row_number().over(w)
    return (
        df.withColumn("__cpg_rn", rn)
        .filter(F.col("__cpg_rn") <= F.lit(cap))
        .drop("__cpg_rn")
    )
