"""Deduplication operators over a document corpus — first-class
components of a training-data pipeline at 100 TB.

All four strategies keep the hot path JVM-side (built-in / higher-order
functions, no Python in the per-row loop) except simhash, which uses an
Arrow-batched pandas UDF with vectorized numpy bit math.

Scale notes:

* exact: groupBy on ``md5(text)`` — hash-partitioned aggregation with
  map-side partial aggregation; never shuffles the text column twice;
* near-dup joins are BLOCKED (by source or LSH band) so the candidate
  set is linear-ish, never the quadratic all-pairs;
* MinHash-LSH: signature/banding entirely with ``transform``/
  ``aggregate``/``xxhash64`` expressions; band buckets groupBy-shuffle
  only (band_hash, doc_id) pairs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

TOKENIZE_REGEX = " +"


def tokens_col(text_col: str = "text"):
    """Distinct lowercase whitespace tokens (JVM-side)."""
    return F.array_distinct(
        F.split(F.lower(F.trim(F.col(text_col))), TOKENIZE_REGEX)
    )


def exact_dedup(docs: DataFrame) -> DataFrame:
    """Representative (min doc_id) + duplicate count per distinct text.

    Grouping key is ``md5(text)`` — standard MD5, so an independent SQL
    engine reproduces the same groups."""
    return (
        docs.groupBy(F.md5("text").alias("text_md5"))
        .agg(
            F.min("doc_id").alias("doc_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
        .select("doc_id", "dup_count")
    )


def jaccard_pairs(
    docs: DataFrame, threshold: float = 0.6, block_col: str = "source"
) -> DataFrame:
    """Near-duplicate pairs by word-set Jaccard within a blocking key.

    Output: (doc_a, doc_b, jac) with doc_a < doc_b, jac rounded to 6dp
    for cross-engine comparability."""
    with_tokens = docs.select(
        "doc_id", F.col(block_col).alias("block"), tokens_col().alias("toks")
    ).repartition(F.col("block"))  # one tokenize pass; co-located self-join
    left = with_tokens.alias("a")
    right = with_tokens.alias("b")
    pairs = left.join(
        right,
        (F.col("a.block") == F.col("b.block"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    )
    inter = F.size(F.array_intersect("a.toks", "b.toks"))
    union = F.size(F.array_union("a.toks", "b.toks"))
    return (
        pairs.select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.round(inter.cast("double") / union.cast("double"), 6).alias("jac"),
        )
        .filter(F.col("jac") >= threshold)
    )


def _shingles(tok_expr, n: int = 3):
    """Word n-gram shingles from a token array (JVM transform/slice)."""
    return F.when(
        F.size(tok_expr) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(tok_expr) - n),
            lambda i: F.concat_ws(" ", F.slice(tok_expr, i + 1, n)),
        ),
    ).otherwise(F.array(F.concat_ws(" ", tok_expr)))


def minhash_signatures(
    docs: DataFrame, num_hashes: int = 32, shingle_n: int = 3
) -> DataFrame:
    """(doc_id, sig ARRAY<BIGINT>, shingles) — sig[k] = min over shingles
    of xxhash64(xxhash64(shingle), k).  Pure JVM expressions.

    Each shingle string is hashed ONCE (the expensive variable-length
    hash); the k-th minhash function is then the cheap fixed-width
    xxhash64 over the (long, k) pair — num_hashes× fewer string hashes
    than hashing ``shingle || '#' || k`` per k, identical independence
    properties.  The whole signature is ONE nested higher-order
    expression (transform over k of array_min over pre-hashed shingles)
    so the shingle array is built once per row — naively emitting
    ``num_hashes`` separate array_min columns makes Catalyst's
    project-collapse inline (and re-evaluate) the shingle construction
    per hash."""
    toks = F.split(F.lower(F.trim(F.col("text"))), TOKENIZE_REGEX)
    shingles = _shingles(toks, shingle_n)
    with_shingles = docs.select(
        "doc_id",
        shingles.alias("shingles"),
    ).withColumn(
        "sh_hashes", F.transform(F.col("shingles"), lambda s: F.xxhash64(s))
    )
    sig = F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda k: F.array_min(
            F.transform(F.col("sh_hashes"), lambda h: F.xxhash64(h, k))
        ),
    )
    return with_shingles.select("doc_id", sig.alias("sig"), "shingles")


def minhash_lsh_pairs(
    docs: DataFrame,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
    shingle_n: int = 3,
) -> DataFrame:
    """MinHash + banded LSH near-dup candidate generation, then exact
    shingle-Jaccard verification of candidates only."""
    rows_per_band = num_hashes // bands
    signed = minhash_signatures(docs, num_hashes, shingle_n)
    # shuffle barrier: materializes the signatures once and lets the
    # self-join below reuse ONE exchange for both sides (ReusedExchange)
    # instead of recomputing signatures per side
    signed = signed.repartition(F.col("doc_id"))
    banded = signed.select(
        "doc_id",
        "shingles",
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(
                        F.concat_ws(
                            ",",
                            *[
                                F.element_at("sig", b * rows_per_band + r + 1).cast(
                                    "string"
                                )
                                for r in range(rows_per_band)
                            ],
                        )
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band_idx", "band_hash"),
    )
    left = banded.alias("a")
    right = banded.alias("b")
    candidates = (
        left.join(
            right,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.shingles").alias("sh_a"),
            F.col("b.shingles").alias("sh_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    inter = F.size(F.array_intersect(F.array_distinct("sh_a"), F.array_distinct("sh_b")))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return candidates.select(
        "doc_a",
        "doc_b",
        F.round(inter.cast("double") / union.cast("double"), 6).alias("jac"),
    ).filter(F.col("jac") >= threshold)


# ---------------------------------------------------------------------------
# SimHash (vectorized pandas UDF — 64-bit weighted bit vote)
# ---------------------------------------------------------------------------

def _simhash_batch(texts: pd.Series) -> pd.Series:
    """64-bit weighted-bit-vote simhash per text; word hashes via
    pandas' vectorized siphash (`pd.util.hash_array`, fixed key —
    deterministic across processes/executors), bit votes as one numpy
    broadcast per document — no per-byte or per-bit Python loops."""
    out = np.zeros(len(texts), dtype=np.uint64)
    shifts = np.arange(64, dtype=np.uint64)
    one = np.uint64(1)
    for i, text in enumerate(texts):
        if not text:
            continue
        words = text.lower().split()
        if not words:
            continue
        hashes = pd.util.hash_array(np.asarray(words, dtype=object))
        bits = ((hashes[:, None] >> shifts) & one).astype(np.int64)
        votes = (2 * bits - 1).sum(axis=0)
        out[i] = ((votes >= 0).astype(np.uint64) << shifts).sum(dtype=np.uint64)
    return pd.Series(out.view(np.int64))


def simhash_col(text_col: str = "text"):
    return F.pandas_udf(_simhash_batch, T.LongType())(F.col(text_col))


def simhash_pairs(docs: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs with simhash hamming distance ≤ k.  Candidate
    blocking: 4 16-bit chunks — Hamming ≤ 3 implies at least one exact
    chunk match (pigeonhole), so the join is band-blocked, not all-pairs."""
    hashed = docs.select("doc_id", simhash_col().alias("sh"))
    # shuffle barrier: one pandas-UDF pass + ReusedExchange on self-join
    hashed = hashed.repartition(F.col("doc_id"))
    chunks = hashed.select(
        "doc_id",
        "sh",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned("sh", 16 * c).bitwiseAND(F.lit(0xFFFF))
                    for c in range(4)
                ]
            )
        ).alias("chunk_idx", "chunk"),
    )
    left = chunks.alias("a")
    right = chunks.alias("b")
    cand = (
        left.join(
            right,
            (F.col("a.chunk_idx") == F.col("b.chunk_idx"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.sh").alias("sh_a"),
            F.col("b.sh").alias("sh_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return cand.select("doc_a", "doc_b", hamming.alias("hamming")).filter(
        F.col("hamming") <= max_hamming
    )
