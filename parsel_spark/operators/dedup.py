"""Deduplication operators over a document corpus — first-class
components of a training-data pipeline at 100 TB.

All four strategies keep the hot path JVM-side (built-in / higher-order
functions, no Python in the per-row loop).  The minhash/simhash hash
families are deliberately SQL-expressible (md5 base hash + modular
integer mixing, everything < 2^62 so BIGINT-safe in any engine): the
driver's DuckDB oracle recomputes the exact signatures, candidates and
outputs — a hard value-level correctness gate, not a rows-only check.

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

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

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


# (semantic-plan-hash, col) → (n, d): the guard's aggregate is an eager
# Spark job, so repeated calls on the same input (bench warm-ups, the
# driver's query + oracle passes) must not pay it twice.  Bounded LRU
# (OrderedDict, capped): an unbounded memo would both grow for the
# process lifetime and serve stale counts forever when the same logical
# plan re-reads a path whose data was overwritten — with the cap, stale
# entries age out; the staleness window is at most one driver run's
# working set of distinct (plan, column) pairs.
from collections import OrderedDict as _OrderedDict

_BLOCK_GUARD_MEMO: _OrderedDict[tuple, tuple[int, int]] = _OrderedDict()
_BLOCK_GUARD_MEMO_CAP = 64


def check_block_cardinality(
    blocked: DataFrame,
    block_col: str,
    op_name: str,
    min_block_ratio: float,
    force: bool = False,
) -> None:
    """Guard for the blocked (exact self-join) candidate mode: when the
    blocking key's cardinality is below ``min_block_ratio`` of the row
    count, blocks average > 1/min_block_ratio rows and the within-block
    self-join degenerates toward all-pairs at scale.

    * grey zone (ratio < ``min_block_ratio``): ``RuntimeWarning`` naming
      the LSH mode (``block_col=None``) — the scale-safe default;
    * extreme zone (ratio < ``min_block_ratio / 10``): raises
      ``ValueError`` unless ``force=True`` — a key this coarse makes the
      self-join effectively all-pairs and must be an explicit opt-in.

    NOTE: the check runs ONE small aggregate Spark job eagerly at
    plan-construction time (memoized per (plan, column), so repeated
    calls on the same input are free).  ``min_block_ratio<=0`` disables
    it entirely — the zero-action path for pre-vetted keys."""
    if min_block_ratio <= 0:
        return
    try:
        plan_key: object = (
            blocked._jdf.queryExecution().analyzed().semanticHash()
        )
    except Exception:  # pragma: no cover - connect/other backends
        plan_key = id(blocked)
    key = (plan_key, block_col)
    if key in _BLOCK_GUARD_MEMO:
        n, d = _BLOCK_GUARD_MEMO[key]
        _BLOCK_GUARD_MEMO.move_to_end(key)
    else:
        row = blocked.agg(
            F.count(F.lit(1)).alias("n"),
            F.approx_count_distinct(block_col).alias("d"),
        ).first()
        n, d = int(row["n"]), int(row["d"])
        _BLOCK_GUARD_MEMO[key] = (n, d)
        while len(_BLOCK_GUARD_MEMO) > _BLOCK_GUARD_MEMO_CAP:
            _BLOCK_GUARD_MEMO.popitem(last=False)
    if not n or d / n >= min_block_ratio:
        return
    msg = (
        f"{op_name}: blocking key {block_col!r} has ~{d} distinct "
        f"values over {n} rows (ratio {d / n:.4f} < {min_block_ratio}); "
        "the within-block self-join is quadratic in the largest block "
        "and will not survive a 100x scale-up — use block_col=None "
        "(LSH candidate generation) instead"
    )
    if d / n < min_block_ratio / 10 and not force:
        raise ValueError(
            msg + " (ratio is in the extreme zone; pass force=True to "
            "run the blocked mode anyway)"
        )
    import warnings

    warnings.warn(msg, RuntimeWarning, stacklevel=3)


def jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.6,
    block_col: str | None = None,
    min_block_ratio: float = 0.01,
    force: bool = False,
) -> DataFrame:
    """Near-duplicate pairs by word-set Jaccard.

    ``block_col`` picks the candidate-generation strategy:

    * ``None`` (DEFAULT — the 100 TB path): MinHash-banded LSH
      candidates over the token sets (shingle_n=1 ⇒ the verified
      Jaccard IS the word-set Jaccard), then exact verification of
      candidates only — candidate volume stays near-linear regardless
      of any natural key's skew;
    * a column name: exact self-join within that blocking key.  Only
      sound at scale when the key is HIGH-cardinality — a handful of
      giant blocks makes the join quadratic within each block, so a
      low cardinality/rows ratio (< ``min_block_ratio``) raises a
      ``RuntimeWarning``, and an EXTREME ratio (< min_block_ratio/10)
      raises ``ValueError`` unless ``force=True``.

    Output: (doc_a, doc_b, jac) with doc_a < doc_b, jac rounded to 6dp
    for cross-engine comparability."""
    if block_col is None:
        return minhash_lsh_pairs(docs, threshold=threshold, shingle_n=1)
    check_block_cardinality(
        docs, block_col, "jaccard_pairs", min_block_ratio, force=force
    )
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


#: Mersenne prime 2^31-1 — the modulus of the per-k universal hash
#: lanes.  All arithmetic stays < 2^62, so the SAME expressions run
#: overflow-free as BIGINT in Spark AND in an independent SQL engine
#: (the DuckDB oracle mirrors them literally).
MERSENNE_P = 2147483647
_LANE_MASK = (1 << 30) - 1


def md5_hash60(col):
    """First 60 bits of md5 as a BIGINT — the cross-engine base hash
    (standard MD5 over UTF-8; DuckDB twin:
    ``('0x' || substr(md5(x),1,15))::BIGINT``)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def _minhash_mix(h, k):
    """k-th minhash function over a 60-bit base hash: two independent
    universal-hash lanes (mod Mersenne prime) over the top/bottom 30
    bits, recombined into a 62-bit value.  Products stay < 2^61 (k is
    widened to long so every multiply is 64-bit, ANSI-safe)."""
    k = k.cast("long")
    h1 = F.shiftrightunsigned(h, 30)
    h2 = h.bitwiseAND(F.lit(_LANE_MASK))
    a_k = (F.lit(2654435761) * (k + 1)) % MERSENNE_P
    b_k = (F.lit(40503) * (k + 7)) % MERSENNE_P
    c_k = (F.lit(2246822519) * (k + 1)) % MERSENNE_P
    d_k = (F.lit(374761393) * (k + 3)) % MERSENNE_P
    lane1 = (a_k * h1 + b_k) % MERSENNE_P
    lane2 = (c_k * h2 + d_k) % MERSENNE_P
    return lane1 * F.lit(1 << 31) + lane2


def _md5_hash60_py(value: str) -> int:
    """Python twin of ``md5_hash60``: first 60 bits of md5 (== first 15
    hex chars) — first 8 digest bytes big-endian, low nibble dropped."""
    return int.from_bytes(hashlib.md5(value.encode("utf-8")).digest()[:8], "big") >> 4


def _mix_constants(num_hashes: int):
    k = np.arange(num_hashes, dtype=np.int64)
    return (
        (2654435761 * (k + 1)) % MERSENNE_P,
        (40503 * (k + 7)) % MERSENNE_P,
        (2246822519 * (k + 1)) % MERSENNE_P,
        (374761393 * (k + 3)) % MERSENNE_P,
    )


def minhash_sig_udf(num_hashes: int = 32):
    """Arrow-batched signature computation producing EXACTLY the values
    of the ``_minhash_mix``/``md5_hash60`` expressions (cross-checked in
    tests): md5 runs in C (hashlib) and the per-k mixing is one numpy
    (n_shingles × num_hashes) broadcast — ~2.5× faster than evaluating
    the equivalent nested higher-order expressions, whose per-element
    lambda interpretation dominates at this arithmetic density.  Still
    map-side and linear; the DuckDB oracle replays the same math."""
    a_k, b_k, c_k, d_k = _mix_constants(num_hashes)

    @F.pandas_udf("array<long>")
    def _sig(shingle_lists: pd.Series) -> pd.Series:
        out = []
        for shingles in shingle_lists:
            if shingles is None:
                out.append(None)
                continue
            h = np.fromiter(
                (_md5_hash60_py(s) for s in shingles),
                dtype=np.int64,
                count=len(shingles),
            )
            h1 = (h >> 30)[:, None]
            h2 = (h & _LANE_MASK)[:, None]
            lane1 = (a_k[None, :] * h1 + b_k[None, :]) % MERSENNE_P
            lane2 = (c_k[None, :] * h2 + d_k[None, :]) % MERSENNE_P
            out.append((lane1 * (1 << 31) + lane2).min(axis=0))
        return pd.Series(out)

    return _sig


def minhash_sig_from_hashes_udf(num_hashes: int = 32):
    """Signature from PRE-HASHED shingles (``array<long>`` of
    ``md5_hash60`` values): only 8-byte ints cross the JVM↔Python
    boundary and land as one numpy array per row — the Arrow→pandas
    conversion of a STRING-list column materializes a Python string
    object per shingle, which dominated the old path's stage time
    (guide §4.1: control what crosses the boundary).  The per-k mixing
    is the same numpy broadcast as ``minhash_sig_udf``; values are
    bit-identical (pinned in tests) because ``md5_hash60`` (JVM
    expression) == ``_md5_hash60_py``."""
    a_k, b_k, c_k, d_k = _mix_constants(num_hashes)

    @F.pandas_udf("array<long>")
    def _sig(hash_lists: pd.Series) -> pd.Series:
        out = []
        for hashes in hash_lists:
            if hashes is None:
                out.append(None)
                continue
            h = np.asarray(hashes, dtype=np.int64)[:, None]
            lane1 = (a_k[None, :] * (h >> 30) + b_k[None, :]) % MERSENNE_P
            lane2 = (
                c_k[None, :] * (h & _LANE_MASK) + d_k[None, :]
            ) % MERSENNE_P
            out.append((lane1 * (1 << 31) + lane2).min(axis=0))
        return pd.Series(out)

    return _sig


def _shingle_table(docs: DataFrame, shingle_n: int = 3) -> DataFrame:
    """(doc_id, shingles) — the pure-JVM shingle projection (split /
    transform / slice), map-side, no Python."""
    toks = F.split(F.lower(F.trim(F.col("text"))), TOKENIZE_REGEX)
    return docs.select("doc_id", _shingles(toks, shingle_n).alias("shingles"))


def minhash_signatures(
    docs: DataFrame, num_hashes: int = 32, shingle_n: int = 3
) -> DataFrame:
    """(doc_id, sig ARRAY<BIGINT>, shingles) — sig[k] = min over shingles
    of ``_minhash_mix(md5_hash60(shingle), k)``.  Pure JVM expressions.

    Each shingle string is hashed ONCE (the expensive variable-length
    hash); the k-th minhash function is then cheap fixed-width integer
    mixing — num_hashes× fewer string hashes than hashing
    ``shingle || '#' || k`` per k.  The hash family is deliberately
    SQL-expressible (md5 + modular lanes), so the driver's DuckDB
    oracle reproduces the exact signatures/candidates — the hard
    correctness gate the xxhash64 variant could not have.  The whole
    signature is ONE nested higher-order expression (transform over k
    of array_min over pre-hashed shingles) so the shingle array is
    built once per row — naively emitting ``num_hashes`` separate
    array_min columns makes Catalyst's project-collapse inline (and
    re-evaluate) the shingle construction per hash.

    The signature itself is computed from JVM-side ``md5_hash60``
    shingle hashes (codegen'd md5 — the expensive variable-length hash
    never runs in Python) by ``minhash_sig_from_hashes_udf`` (Arrow +
    numpy min-mixing over int64 arrays, same exact values);
    ``minhash_signatures_expr`` keeps the pure-expression variant as
    the cross-check reference."""
    toks = F.split(F.lower(F.trim(F.col("text"))), TOKENIZE_REGEX)
    shingles = _shingles(toks, shingle_n)
    with_shingles = docs.select(
        "doc_id", shingles.alias("shingles")
    ).withColumn(
        "sh_hashes", F.transform("shingles", lambda s: md5_hash60(s))
    )
    sig = minhash_sig_from_hashes_udf(num_hashes)(F.col("sh_hashes"))
    return with_shingles.select("doc_id", sig.alias("sig"), "shingles")


def minhash_signatures_expr(
    docs: DataFrame, num_hashes: int = 32, shingle_n: int = 3
) -> DataFrame:
    """Pure-JVM-expression variant of ``minhash_signatures`` — the
    executable statement of the hash family (the DuckDB oracle mirrors
    it literally); tests pin ``minhash_signatures == this``."""
    toks = F.split(F.lower(F.trim(F.col("text"))), TOKENIZE_REGEX)
    shingles = _shingles(toks, shingle_n)
    with_shingles = docs.select(
        "doc_id",
        shingles.alias("shingles"),
    ).withColumn(
        "sh_hashes", F.transform(F.col("shingles"), lambda s: md5_hash60(s))
    )
    sig = F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda k: F.array_min(
            F.transform(F.col("sh_hashes"), lambda h: _minhash_mix(h, k))
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
    shingle-Jaccard verification of candidates only.

    Plan shape (guide §8: decide with small rows, attach payloads
    last): the band table carries ONLY ``(doc_id, band_idx,
    band_hash)`` — 20-odd bytes/row — so the candidate self-join never
    replicates the shingle arrays ``bands``× through an exchange (the
    previous shape did, and its candidate dedup sort-aggregated full
    arrays).  The self-join is pinned SHUFFLE_HASH on the band keys:
    both sides are the same subtree ending in the same exchange, so
    the signature UDF runs ONCE and the second side is a
    ReusedExchange — the broadcast conversion the optimizer would
    otherwise pick duplicates the whole signature pipeline including
    the Python stage (measured 2-4x on the bench corpus, varying with
    which plan AQE landed on).  Candidates collapse to distinct
    ``(doc_a, doc_b)`` pairs (hash aggregate over 16-byte rows), and
    the shingle arrays for exact Jaccard verification re-attach by
    joining the candidate ids back against a map-side shingle scan —
    at scale AQE broadcasts the (tiny) candidate side, so the shingle
    table never shuffles at all."""
    rows_per_band = num_hashes // bands
    signed = minhash_signatures(docs, num_hashes, shingle_n)
    # the band IDENTITY is the comma-joined signature slice (what the
    # oracle joins on); Spark joins on its xxhash64 so only a fixed
    # 8-byte key shuffles, not an ~80-byte string — identical candidate
    # sets modulo a ~2^-64 hash collision
    # band array as ONE F.expr parse — the DSL listcomp built ~50
    # Column objects (element_at/cast/concat_ws/xxhash64 per band) at
    # hundreds of py4j round-trips per query construction; the SQL
    # string states the identical expression tree
    band_terms = ", ".join(
        "xxhash64(concat_ws(',', "
        + ", ".join(
            f"CAST(element_at(sig, {b * rows_per_band + r + 1}) AS STRING)"
            for r in range(rows_per_band)
        )
        + "))"
        for b in range(bands)
    )
    banded = signed.select(
        "doc_id",
        F.posexplode(F.expr(f"array({band_terms})")).alias(
            "band_idx", "band_hash"
        ),
    )
    # Pin the candidate self-join's partition count (REPARTITION_BY_NUM
    # replaces the planner's exchange; AQE cannot coalesce it): the
    # band table is ~20 bytes/row, so AQE coalesces the join stage to
    # ONE task at bench scale while the join EXPANDS candidates on the
    # far side of the exchange — measured 10.8 s single-task for the
    # shingle_n=1 (word-set Jaccard) variant, whose band collisions
    # are densest.  n derives from defaultParallelism (cluster-scaled).
    n_pair = docs.sparkSession.sparkContext.defaultParallelism
    banded = banded.repartition(n_pair, "band_idx", "band_hash")
    left = banded.alias("a").hint("SHUFFLE_HASH")
    right = banded.alias("b").hint("SHUFFLE_HASH")
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
        )
        .distinct()
    )
    # exact-verify payloads attach AFTER the candidate decision: one
    # map-side shingle scan (pure JVM split/slice — no second Python
    # pass), joined on the candidate ids.  The shingle arrays are
    # DISTINCT'd once per doc BEFORE the join — value-identical
    # (array_intersect/array_union are set operations: same sets in,
    # same counts out) but the per-pair work drops from
    # distinct+intersect+union over dup-laden arrays to set ops over
    # pre-deduped ones, and the join ships each doc's distinct tokens
    # instead of its full token stream (shingle_n=1's arrays shrink
    # ~2×; measured 9.7 s → ~4 s on the verify stage at sf0.1).
    sh_tbl = _shingle_table(docs, shingle_n).select(
        "doc_id", F.array_distinct("shingles").alias("shingles")
    )
    # per-doc set size rides the join (8 bytes); per pair only the
    # intersect runs — |A∪B| = |A|+|B|−|A∩B| is an exact set identity,
    # so the per-pair array_union is algebra'd away (value-identical)
    pairs = candidates.join(
        sh_tbl.select(
            F.col("doc_id").alias("doc_a"),
            F.col("shingles").alias("sh_a"),
            F.size("shingles").alias("n_a"),
        ),
        "doc_a",
    ).join(
        sh_tbl.select(
            F.col("doc_id").alias("doc_b"),
            F.col("shingles").alias("sh_b"),
            F.size("shingles").alias("n_b"),
        ),
        "doc_b",
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.col("n_a") + F.col("n_b") - inter
    return pairs.select(
        "doc_a",
        "doc_b",
        F.round(inter.cast("double") / union.cast("double"), 6).alias("jac"),
    ).filter(F.col("jac") >= threshold)


# ---------------------------------------------------------------------------
# SimHash (60-bit weighted bit vote, pure JVM higher-order expressions)
# ---------------------------------------------------------------------------

SIMHASH_BITS = 60


def simhash_expr(text_col: str = "text", seg: int = 0):
    """60-bit simhash as ONE Spark SQL expression: word hashes are 60
    bits of md5 (hex chars ``1 + 15*seg`` .. ``15 + 15*seg``), each word
    (with multiplicity) votes ±1 per bit, bit b of the result is 1 iff
    the vote sum is ≥ 0.  ``seg=0`` is the classic 60-bit simhash
    (``md5_hash60`` word hashes); ``seg=1`` is the second independent
    60-bit lane of the 120-bit fingerprint (``simhash120_col``).

    Entirely JVM-side (no Python in the hot path) AND reproducible by
    an independent SQL engine — the DuckDB oracle computes the same
    value from the same text, which is the hard correctness gate the
    previous siphash pandas-UDF variant could not have."""
    hex_start = 1 + 15 * seg
    return F.expr(
        f"""
        aggregate(
          transform(
            split(lower(trim({text_col})), ' +'),
            w -> cast(conv(substring(md5(w), {hex_start}, 15), 16, 10) AS bigint)
          ),
          array_repeat(cast(0 AS bigint), {SIMHASH_BITS}),
          (acc, h) -> zip_with(
            acc, sequence(0, {SIMHASH_BITS - 1}),
            (v, b) -> v + 2 * (shiftright(h, b) % 2) - 1
          ),
          acc -> aggregate(
            zip_with(
              acc, sequence(0, {SIMHASH_BITS - 1}),
              (v, b) -> IF(v >= 0, shiftleft(cast(1 AS bigint), b),
                           cast(0 AS bigint))
            ),
            cast(0 AS bigint), (s, x) -> s + x
          )
        )
        """
    )


def _simhash60_batch(texts: pd.Series) -> pd.Series:
    """Arrow-batched twin of ``simhash_expr`` — identical values
    (cross-checked in tests): same ``' +'``-regex split of the
    space-trimmed lowercased text (duplicates kept), same md5-low-60-bit
    word hash, same ±1 bit votes; md5 in C, votes as one numpy
    broadcast per document."""
    import re as _re

    shifts = np.arange(SIMHASH_BITS, dtype=np.int64)
    out: list[int | None] = []
    for text in texts:
        if text is None:
            out.append(None)  # expr yields NULL for NULL text
            continue
        words = _re.split(" +", text.lower().strip(" "))
        hashes = np.fromiter(
            (_md5_hash60_py(w) for w in words), dtype=np.int64, count=len(words)
        )
        bits = (hashes[:, None] >> shifts[None, :]) & 1
        votes = (2 * bits - 1).sum(axis=0)
        out.append(int(((votes >= 0).astype(np.int64) << shifts).sum()))
    return pd.Series(out, dtype="object")


def simhash_col(text_col: str = "text"):
    return F.pandas_udf(_simhash60_batch, "long")(F.col(text_col))


def _word_md5_segments(text_col: str, segments: int = 1):
    """JVM-side per-word md5 segment hashes: ``array<string>`` of word
    md5 hex digests computed ONCE (codegen), then one ``array<long>``
    per 60-bit segment (hex chars 1-15 / 16-30) — what the simhash vote
    UDFs consume so only 8-byte ints cross the Python boundary (same
    boundary discipline as ``minhash_sig_from_hashes_udf``)."""
    words = F.split(F.lower(F.trim(F.col(text_col))), TOKENIZE_REGEX)
    md5s = F.transform(words, lambda w: F.md5(w))
    segs = []
    for seg in range(segments):
        start = 1 + 15 * seg
        segs.append(
            F.transform(
                md5s,
                lambda m: F.conv(F.substring(m, start, 15), 16, 10).cast(
                    "long"
                ),
            )
        )
    return segs


def _simhash_votes(seg_arrays: "list") -> "list[int | None]":
    """numpy ±1 bit votes over pre-hashed word segments (one 60-bit
    lane per input array) — the shared kernel of the vote UDFs."""
    shifts = np.arange(SIMHASH_BITS, dtype=np.int64)
    out: list[int | None] = []
    for hashes in seg_arrays:
        if hashes is None:
            out.append(None)
            continue
        h = np.asarray(hashes, dtype=np.int64)
        bits = (h[:, None] >> shifts[None, :]) & 1
        votes = (2 * bits - 1).sum(axis=0)
        out.append(int(((votes >= 0).astype(np.int64) << shifts).sum()))
    return out


def simhash_from_hashes_col(text_col: str = "text"):
    """60-bit simhash with JVM-side word hashing + numpy votes —
    bit-identical to ``simhash_expr``/``simhash_col`` (pinned in
    tests); the md5 of every word runs codegen'd in the JVM and only
    ``array<long>`` crosses to Python."""
    (seg1,) = _word_md5_segments(text_col, 1)

    @F.pandas_udf("long")
    def _vote(seg: pd.Series) -> pd.Series:
        return pd.Series(_simhash_votes(seg), dtype="object")

    return _vote(seg1)


def simhash120_from_hashes_col(text_col: str = "text"):
    """120-bit twin of :func:`simhash_from_hashes_col` — two 60-bit
    lanes from one JVM md5 pass; values bit-identical to
    ``simhash120_col`` / ``simhash_expr(seg=0/1)``."""
    seg1, seg2 = _word_md5_segments(text_col, 2)

    @F.pandas_udf("sh1 long, sh2 long")
    def _vote(s1: pd.Series, s2: pd.Series) -> pd.DataFrame:
        return pd.DataFrame(
            {"sh1": _simhash_votes(s1), "sh2": _simhash_votes(s2)}
        )

    return _vote(seg1, seg2)


def _simhash120_batch(texts: pd.Series) -> pd.DataFrame:
    """Arrow-batched 120-bit simhash: TWO independent 60-bit vote lanes
    from one md5 per word — lane 1 over md5 hex chars 1–15 (identical
    to ``_simhash60_batch``), lane 2 over chars 16–30.  Values are
    bit-identical to ``simhash_expr(seg=0/1)`` (cross-checked in
    tests); one C md5 + one numpy broadcast per document computes both
    lanes."""
    import re as _re

    shifts = np.arange(SIMHASH_BITS, dtype=np.int64)
    mask60 = (1 << 60) - 1
    sh1_out: list[int | None] = []
    sh2_out: list[int | None] = []
    for text in texts:
        if text is None:
            sh1_out.append(None)
            sh2_out.append(None)
            continue
        words = _re.split(" +", text.lower().strip(" "))
        digests = [hashlib.md5(w.encode("utf-8")).digest() for w in words]
        seg1 = np.fromiter(
            (int.from_bytes(d[:8], "big") >> 4 for d in digests),
            dtype=np.int64,
            count=len(digests),
        )
        # hex chars 16-30 == nibbles 15-29 of the big-endian digest
        seg2 = np.fromiter(
            ((int.from_bytes(d, "big") >> 8) & mask60 for d in digests),
            dtype=np.int64,
            count=len(digests),
        )
        for seg, out in ((seg1, sh1_out), (seg2, sh2_out)):
            bits = (seg[:, None] >> shifts[None, :]) & 1
            votes = (2 * bits - 1).sum(axis=0)
            out.append(int(((votes >= 0).astype(np.int64) << shifts).sum()))
    return pd.DataFrame({"sh1": sh1_out, "sh2": sh2_out})


def simhash120_col(text_col: str = "text"):
    """``STRUCT<sh1: BIGINT, sh2: BIGINT>`` — the 120-bit fingerprint
    as two 60-bit md5-segment lanes (the scale path: at billions of
    docs, 120 bits keeps the hamming-LSH bands ≥ ~17 bits wide at k=6
    instead of ~8, so band-bucket cardinality stays ~2^17 and the
    candidate join cannot degenerate toward all-pairs)."""
    return F.pandas_udf(_simhash120_batch, "sh1 long, sh2 long")(F.col(text_col))


def simhash_band_widths(max_hamming: int, bits: int = SIMHASH_BITS) -> list[int]:
    """Chunk widths for hamming-LSH blocking: ``max_hamming + 1`` bands
    (pigeonhole: ≤ k bit errors cannot touch all k+1 bands, so at least
    one band matches exactly — guaranteed recall)."""
    bands = max_hamming + 1
    if bands > bits:
        raise ValueError(f"max_hamming={max_hamming} needs > {bits} bits")
    base, rem = divmod(bits, bands)
    return [base + 1] * rem + [base] * (bands - rem)


def _chunk120(sh1, sh2, offset: int, width: int):
    """Bits ``offset .. offset+width-1`` of the 120-bit fingerprint
    (sh1 = bits 0–59, sh2 = bits 60–119) as one BIGINT — bands that
    straddle the 60-bit lane boundary splice both lanes."""
    if offset + width <= 60:
        return F.shiftrightunsigned(sh1, offset).bitwiseAND(F.lit((1 << width) - 1))
    if offset >= 60:
        return F.shiftrightunsigned(sh2, offset - 60).bitwiseAND(
            F.lit((1 << width) - 1)
        )
    lo = 60 - offset
    low_part = F.shiftrightunsigned(sh1, offset).bitwiseAND(F.lit((1 << lo) - 1))
    high_part = sh2.bitwiseAND(F.lit((1 << (width - lo)) - 1))
    return low_part.bitwiseOR(F.shiftleft(high_part, lo))


def simhash_pairs(
    docs: DataFrame, max_hamming: int = 3, bits: int = 120
) -> DataFrame:
    """Near-dup pairs with simhash hamming distance ≤ k.

    Candidate blocking derives the band count FROM k: ``k+1`` bands of
    ~``bits/(k+1)`` bits, so the pigeonhole recall guarantee holds for
    any ``max_hamming`` (round-1 shipped fixed 4×16-bit chunks, whose
    guarantee silently broke above k=3 — 35% of true pairs missed at
    k=6).

    ``bits`` picks the fingerprint width: 120 (DEFAULT — two md5
    segments, ``simhash120_col``) keeps bands ≥ ~17 bits wide at k=6,
    i.e. ~2^17 distinct band values, so candidate-bucket sizes stay
    ~N/2^17 at billions of docs; the classic 60-bit fingerprint at k=6
    leaves ~8-bit bands (≤512 buckets — degenerates toward all-pairs
    at scale) and is kept for parity/compat."""
    if bits not in (60, 120):
        raise ValueError(f"bits must be 60 or 120, got {bits}")
    widths = simhash_band_widths(max_hamming, bits=bits)
    assert len(widths) >= max_hamming + 1  # pigeonhole recall guard
    offsets = [sum(widths[:c]) for c in range(len(widths))]
    # simhash{,120}_from_hashes_col = JVM-md5 + numpy-vote twins of
    # simhash_expr(seg=0/1): identical values; word hashing stays
    # codegen'd in the JVM and only int64 arrays cross to Python
    if bits == 60:
        hashed = docs.select("doc_id", simhash_from_hashes_col().alias("sh1"))
        sh_cols = ["sh1"]
        chunk_exprs = [
            F.shiftrightunsigned("sh1", offsets[c]).bitwiseAND(
                F.lit((1 << widths[c]) - 1)
            )
            for c in range(len(widths))
        ]
    else:
        hashed = docs.select(
            "doc_id", simhash120_from_hashes_col().alias("s")
        ).select("doc_id", F.col("s.sh1").alias("sh1"), F.col("s.sh2").alias("sh2"))
        sh_cols = ["sh1", "sh2"]
        chunk_exprs = [
            _chunk120(F.col("sh1"), F.col("sh2"), offsets[c], widths[c])
            for c in range(len(widths))
        ]
    chunks = hashed.select(
        "doc_id",
        *sh_cols,
        F.posexplode(F.array(*chunk_exprs)).alias("chunk_idx", "chunk"),
    )
    # SHUFFLE_HASH pins the self-join to one exchange per side on the
    # chunk keys; both sides are the same subtree, so the simhash UDF
    # runs ONCE and the second side is a ReusedExchange.  (A broadcast
    # conversion would duplicate the whole fingerprint pipeline —
    # Python stage included — same failure mode as minhash_lsh_pairs.)
    # The explicit repartition replaces the planner's exchange with a
    # REPARTITION_BY_NUM one AQE cannot coalesce: the chunk shuffle's
    # bytes are small but the join EXPANDS pairs on the other side of
    # it (AQE coalesced this stage to 2 tasks at bench scale); n
    # derives from defaultParallelism, so it scales with the cluster.
    n_pair = docs.sparkSession.sparkContext.defaultParallelism
    chunks = chunks.repartition(n_pair, "chunk_idx", "chunk")
    left = chunks.alias("a").hint("SHUFFLE_HASH")
    right = chunks.alias("b").hint("SHUFFLE_HASH")
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
            *[F.col(f"a.{c}").alias(f"{c}_a") for c in sh_cols],
            *[F.col(f"b.{c}").alias(f"{c}_b") for c in sh_cols],
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    hamming = F.bit_count(F.col("sh1_a").bitwiseXOR(F.col("sh1_b"))).cast("long")
    if bits == 120:
        hamming = hamming + F.bit_count(
            F.col("sh2_a").bitwiseXOR(F.col("sh2_b"))
        ).cast("long")
    return cand.select("doc_a", "doc_b", hamming.alias("hamming")).filter(
        F.col("hamming") <= max_hamming
    )


def dup_clusters(
    pairs: DataFrame,
    nodes: DataFrame,
    id_col: str = "doc_id",
    max_iters: int = 50,
) -> DataFrame:
    """Connected components over near-duplicate pairs — the step that
    turns pairwise dup evidence (exact / jaccard / minhash / simhash /
    embedding / phash ``*_pairs`` outputs) into DEDUP GROUPS: output is
    ``(doc_id, cluster_id)`` for EVERY node, where ``cluster_id`` is the
    smallest doc_id reachable through the pair graph (singletons label
    themselves).  Downstream "keep one per cluster" is then a trivial
    ``groupBy(cluster_id).agg(min(doc_id))``.

    Algorithm: iterative min-label propagation.  Per round each node
    takes ``min(own label, min neighbor label)``; a fixpoint is reached
    after O(graph diameter) rounds — dup graphs are overwhelmingly
    tiny cliques/chains, so this converges in a handful of rounds (the
    alternating large-star/small-star variant trades more logic for
    fewer rounds on adversarial long paths; ``max_iters`` guards those).

    Scale shape: the edge list is symmetrized once, repartitioned
    hash(dst) and CACHED — per round it joins co-partitioned against
    the label table (carried hash(doc_id)), the neighbor-min is a
    map-side-combined groupBy, and labels are pinned with an eager
    ``localCheckpoint`` per round (iterative DataFrames MUST truncate
    lineage) with the converged-row counter riding the pin as an
    ``Observation`` — one action per round, no driver-side data.

    Determinism: min-label is a pure function of the graph; rounds and
    partitioning cannot change the fixpoint.

    Public background: label-propagation / alternating-star connected
    components for MapReduce-style engines (Kiveris et al., "Connected
    Components in MapReduce and Beyond", SoCC'14); the min-label round
    here is the hash-join specialization of the same idea."""
    from pyspark.sql import Observation

    from ..functions.planning import static_planning

    spark = pairs.sparkSession
    partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    with static_planning(spark):
        return _dup_cluster_rounds(
            pairs, nodes, id_col, max_iters, partitions, Observation
        )


def _dup_cluster_rounds(
    pairs: DataFrame,
    nodes: DataFrame,
    id_col: str,
    max_iters: int,
    partitions: int,
    Observation,
) -> DataFrame:
    a, b = "doc_a", "doc_b"
    if a not in pairs.columns:  # embedding pairs use vec_a/vec_b
        a, b = "vec_a", "vec_b"
    half = pairs.select(F.col(a).alias("src"), F.col(b).alias("dst"))
    edges = (
        half.unionByName(
            half.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .repartition(partitions, "dst")
        .cache()
    )
    labels = (
        nodes.select(F.col(id_col).alias("node"), F.col(id_col).alias("label"))
        .repartition(partitions, "node")
        .localCheckpoint(eager=True)
    )
    converged = False
    for _ in range(max_iters):
        nbr_min = (
            edges.join(
                labels.hint("SHUFFLE_HASH"),
                edges["dst"] == labels["node"],
            )
            .groupBy("src")
            .agg(F.min("label").alias("nbr_label"))
        )
        obs = Observation()
        stepped = (
            labels.join(
                nbr_min.hint("SHUFFLE_HASH"),
                labels["node"] == nbr_min["src"],
                "left",
            )
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce("nbr_label", F.col("label"))
                ).alias("label"),
                (F.coalesce("nbr_label", F.col("label")) < F.col("label"))
                .cast("long")
                .alias("__changed"),
            )
            .observe(obs, F.coalesce(F.sum("__changed"), F.lit(0)).alias("n"))
            .drop("__changed")
            .repartition(partitions, "node")
        )
        labels = stepped.localCheckpoint(eager=True)
        if int(obs.get["n"]) == 0:
            converged = True
            break
    edges.unpersist()
    if not converged:
        # A fixpoint needs O(graph diameter) rounds; exhausting the
        # budget means at least one component still carries >1 label —
        # returning those ids silently would be WRONG cluster ids.
        raise RuntimeError(
            f"dup_clusters did not converge within max_iters={max_iters} "
            "rounds (pair-graph diameter exceeds the round budget); "
            "raise max_iters — each round is O(edges) with no driver data"
        )
    return labels.select(
        F.col("node").alias(id_col), F.col("label").alias("cluster_id")
    )


# ---------------------------------------------------------------------------
# Substring-level (repeated n-gram) cross-document dedup
# ---------------------------------------------------------------------------

def seq_tokens_col(text_col: str = "text"):
    """POSITIONAL whitespace tokens — order- and case-preserving (unlike
    ``tokens_col``'s distinct-lowercase set semantics), so spans map
    back to reconstructable text.  Whitespace runs normalize to single
    spaces; that is the (documented) lossy part of reconstruction."""
    return F.split(F.trim(F.col(text_col)), TOKENIZE_REGEX)


def _gram_hash_array(n: int):
    """Array of 60-bit gram hashes over the ``toks`` column (JVM
    transform/slice; shorter-than-n docs give an empty array)."""
    return F.when(
        F.size("toks") >= n,
        F.transform(
            F.sequence(F.lit(0), F.size("toks") - n),
            lambda i: md5_hash60(F.concat_ws(" ", F.slice("toks", i + 1, n))),
        ),
    ).otherwise(F.array().cast("array<long>"))


def _gram_starts(docs: DataFrame, n: int, id_col: str, text_col: str) -> DataFrame:
    """(id, start, gram_hash): one row per token n-gram occurrence;
    ``start`` is the 0-based token index of the gram's first token and
    ``gram_hash`` the cross-engine 60-bit md5 of the space-joined gram.
    Map-only (split + transform + posexplode): no shuffle, no UDF."""
    toks = docs.select(F.col(id_col), seq_tokens_col(text_col).alias("toks"))
    return toks.select(
        F.col(id_col),
        F.posexplode(_gram_hash_array(n)).alias("start", "gram_hash"),
    )


def _gram_starts_with_total(
    docs: DataFrame, n: int, id_col: str, text_col: str
) -> DataFrame:
    """Like ``_gram_starts`` but ONE scan also carries the doc's token
    count, and zero-gram docs keep a single null-gram row
    (``posexplode_outer``) — downstream aggregates get totals without a
    second corpus scan + join."""
    toks = docs.select(F.col(id_col), seq_tokens_col(text_col).alias("toks"))
    return toks.select(
        F.col(id_col),
        F.size("toks").alias("total_tokens"),
        F.posexplode_outer(_gram_hash_array(n)).alias("start", "gram_hash"),
    )


def repeated_ngram_spans(
    docs: DataFrame,
    n: int = 5,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Substring-level cross-document dedup, step 1: the merged token
    spans of every n-gram that repeats across >= ``min_docs`` distinct
    documents (shared boilerplate paragraphs, licence blocks, nav text
    — what doc-level minhash cannot catch).  Output: (id, span_start,
    span_end, span_tokens) with 0-based inclusive token indices.

    Public background: Lee et al., "Deduplicating Training Data Makes
    Language Models Better" (ACL 2022) — the repeated-substring pass;
    this is the n-gram-granular bucketed form (shingle-hash -> count ->
    rejoin), never all-pairs, never a suffix array on one node.

    Scale shape: the gram pass is map-only; duplicated-gram detection
    is ONE map-side-combined groupBy on 8-byte hashes; the rejoin is a
    hash join on the same key; span merge is one window over
    hash(id) partitions.  Reference counterpart: parsel has none —
    this extends the engine's training-data surface."""
    grams = _gram_starts(docs, n, id_col, text_col)
    dup = (
        grams.groupBy("gram_hash")
        .agg(F.countDistinct(id_col).alias("nd"))
        .filter(F.col("nd") >= min_docs)
        .select("gram_hash")
    )
    hits = grams.join(dup, "gram_hash").select(id_col, "start")
    w = Window.partitionBy(id_col).orderBy("start")
    # gaps-and-islands: fixed-length intervals [start, start+n-1] merge
    # while the next start is within (prev start + n) — overlap OR
    # adjacency; window lag/sum replays identically in any SQL engine
    lag_start = F.lag("start").over(w)
    islands = hits.select(
        F.col(id_col),
        F.col("start"),
        F.sum(
            F.when(
                lag_start.isNull() | (F.col("start") > lag_start + n), 1
            ).otherwise(0)
        )
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("island"),
    )
    return islands.groupBy(id_col, "island").agg(
        F.min("start").alias("span_start"),
        (F.max("start") + (n - 1)).alias("span_end"),
        (F.max("start") - F.min("start") + n).alias("span_tokens"),
    ).drop("island")


def remove_repeated_ngrams(
    docs: DataFrame,
    n: int = 5,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Substring-level cross-document dedup, step 2: every doc with the
    repeated spans REMOVED (aggressive mode: all occurrences go — the
    boilerplate-strip semantic of production crawl->LLM pipelines;
    keep-one-copy needs a global tiebreak and is intentionally not this
    operator).  Output: (id, clean_text, removed_tokens).

    Scale shape: the span table from ``repeated_ngram_spans`` is
    grouped to ONE small row per affected doc and hash-joined back;
    token filtering happens IN PLACE with higher-order functions
    (filter-with-index over the token array vs the covered-position
    array) — the full corpus is never token-exploded or re-collected,
    so the only extra shuffle is the span join."""
    spans = repeated_ngram_spans(docs, n, min_docs, id_col, text_col)
    per_doc = spans.groupBy(id_col).agg(
        F.flatten(
            F.collect_list(F.sequence("span_start", "span_end"))
        ).alias("covered")
    )
    joined = docs.join(per_doc, id_col, "left")
    toks = seq_tokens_col(text_col)
    covered = F.coalesce(F.col("covered"), F.array().cast("array<int>"))
    kept = F.filter(
        F.transform(toks, lambda t, i: F.struct(t.alias("t"), i.alias("i"))),
        lambda s: ~F.array_contains(covered, s["i"]),
    )
    return joined.select(
        F.col(id_col),
        F.array_join(F.transform(kept, lambda s: s["t"]), " ").alias(
            "clean_text"
        ),
        F.size(covered).alias("removed_tokens"),
    )


def line_dedup(
    docs: DataFrame,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Cross-document LINE-level dedup — the paragraph/line-hash pass of
    the public CCNet recipe (Wenzek et al., "CCNet: Extracting High
    Quality Monolingual Datasets from Web Crawl Data", LREC 2020):
    normalize each line (lowercase, strip non-letters, squeeze spaces),
    hash it, and REMOVE every line whose normalized form occurs in
    >= ``min_docs`` distinct documents — the cheap first strike against
    nav bars, cookie banners, copyright footers and share buttons,
    coarser than ``repeated_ngram_spans`` but far cheaper (one 8-byte
    hash per LINE, not per token n-gram).  Lines that normalize to ''
    (blank / punctuation-only) are never counted and always kept.
    Output: (id, clean_text, removed_lines, total_lines); line order is
    preserved and untouched lines keep their exact bytes.

    Normalization is deliberately ASCII-letters-only (``[^a-z ]`` both
    in Spark's Java regex and the DuckDB/RE2 oracle) so the key is
    bit-identical across engines; non-Latin text therefore dedups on
    its spacing skeleton — acceptable for the boilerplate use case and
    documented here.

    Scale shape: line explode is map-only; the duplicate decision is
    ONE map-side-combined groupBy on the 60-bit line hash (only
    (hash, id) shuffles — Catalyst prunes the line text from the count
    and the rejoin); removal happens IN PLACE per doc with higher-order
    functions over the split array (same pattern as
    ``remove_repeated_ngrams``), so the corpus is never re-collected.
    Reference counterpart: parsel has none — training-data surface."""
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("line")), "[^a-z ]", ""), " +", " "
        )
    )
    keyed = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\n", -1)).alias(
            "line_no", "line"
        ),
    ).select(F.col(id_col), "line_no", norm.alias("key"))
    hashed = keyed.select(
        F.col(id_col), "line_no", md5_hash60(F.col("key")).alias("line_hash"), "key"
    )
    dup = (
        hashed.filter(F.col("key") != "")
        .groupBy("line_hash")
        .agg(F.countDistinct(id_col).alias("nd"))
        .filter(F.col("nd") >= min_docs)
        .select("line_hash")
    )
    per_doc = (
        hashed.join(dup, "line_hash")
        .groupBy(id_col)
        .agg(F.collect_list("line_no").alias("covered"))
    )
    joined = docs.join(per_doc, id_col, "left")
    arr = F.split(F.col(text_col), "\n", -1)
    covered = F.coalesce(F.col("covered"), F.array().cast("array<int>"))
    kept = F.filter(
        F.transform(arr, lambda l, i: F.struct(l.alias("t"), i.alias("i"))),
        lambda s: ~F.array_contains(covered, s["i"]),
    )
    return joined.select(
        F.col(id_col),
        F.array_join(F.transform(kept, lambda s: s["t"]), "\n").alias(
            "clean_text"
        ),
        F.size(covered).cast("long").alias("removed_lines"),
        F.size(arr).cast("long").alias("total_lines"),
    )


# ---------------------------------------------------------------------------
# Within-document repetition stats (Gopher-style quality signals)
# ---------------------------------------------------------------------------

def top_ngram_stats(
    docs: DataFrame,
    n: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-doc MOST-FREQUENT n-gram repetition signal — the
    "fraction of the doc taken up by the top n-gram" family of quality
    filters (public background: the repetition rules in Rae et al.,
    "Scaling Language Models: ... Gopher", 2021 — docs dominated by one
    repeated phrase are boilerplate/spam).  Output: (id, total_tokens,
    top_ngram_count, top_ngram_frac) where top_ngram_frac =
    count*n/total_tokens (token-fraction form, documented — the paper's
    char-fraction variant differs only by gram length weighting).

    Deterministic tiebreak: among equal-count grams the smallest
    gram_hash wins (irrelevant to count/frac, but keeps any future
    gram-exposing variant engine-stable).

    Scale shape: ONE corpus scan (total_tokens rides the exploded gram
    rows via ``posexplode_outer`` — zero-gram docs keep a null-gram
    row, so no totals re-scan/join), ONE two-phase groupBy on
    (id, gram_hash), then a map-side-combined max per id.  Docs shorter
    than n tokens report 0 counts (no grams)."""
    base = _gram_starts_with_total(docs, n, id_col, text_col)
    per_gram = base.groupBy(id_col, "gram_hash").agg(
        F.first("total_tokens").alias("total_tokens"),
        F.count("gram_hash").alias("cnt"),  # count(col): null grams -> 0
    )
    top = per_gram.groupBy(id_col).agg(
        F.first("total_tokens").alias("total_tokens"),
        F.max("cnt").alias("top_ngram_count"),
    )
    return top.select(
        F.col(id_col),
        F.col("total_tokens").cast("long").alias("total_tokens"),
        F.col("top_ngram_count").cast("long").alias("top_ngram_count"),
        F.round(
            F.col("top_ngram_count") * n / F.col("total_tokens"), 6
        ).alias("top_ngram_frac"),
    )


def dup_ngram_coverage(
    docs: DataFrame,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-doc WITHIN-DOC duplicate n-gram coverage — the "fraction of
    the doc covered by n-grams that occur more than once in the SAME
    doc" quality family (Gopher's duplicate-n-gram rules): internal
    repetition that cross-document dedup never sees.  Output: (id,
    total_tokens, covered_tokens, dup_coverage_frac) with covered =
    union of the [start, start+n-1] spans of every within-doc repeated
    gram (same gaps-and-islands merge as ``repeated_ngram_spans``, but
    (id, gram_hash) instead of across docs).

    Scale shape: ONE corpus scan — totals ride the exploded rows
    (``posexplode_outer`` keeps a null-gram row per zero-gram doc) and
    a row_number sentinel keeps one row per doc through the hit filter,
    so every doc reaches the final aggregate (0 coverage when no gram
    repeats) with no totals re-scan/join; window/agg exchanges only,
    all keyed on id."""
    base = _gram_starts_with_total(docs, n, id_col, text_col)
    marked = base.withColumn(
        "cnt",
        F.count("gram_hash").over(Window.partitionBy(id_col, "gram_hash")),
    ).withColumn(
        "rn",
        F.row_number().over(Window.partitionBy(id_col).orderBy("start")),
    )
    # keep duplicated-gram hits AND one sentinel row per doc (rn=1,
    # start nulled unless it is itself a hit) so docs with zero hits —
    # whether they have grams or not — reach the final aggregate
    hits = marked.filter((F.col("cnt") >= 2) | (F.col("rn") == 1)).select(
        id_col,
        "total_tokens",
        F.when(F.col("cnt") >= 2, F.col("start")).alias("start"),
    )
    w = Window.partitionBy(id_col).orderBy("start")
    lag_start = F.lag("start").over(w)
    islands = hits.select(
        F.col(id_col),
        "total_tokens",
        F.col("start"),
        F.sum(
            F.when(F.col("start").isNull(), 0)
            .when(
                lag_start.isNull() | (F.col("start") > lag_start + n), 1
            )
            .otherwise(0)
        )
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("island"),
    )
    spans = islands.groupBy(id_col, "island").agg(
        F.first("total_tokens").alias("total_tokens"),
        F.when(F.count("start") > 0, F.max("start") - F.min("start") + n)
        .otherwise(F.lit(0))
        .alias("span_tokens"),
    )
    covered = spans.groupBy(id_col).agg(
        F.first("total_tokens").alias("total_tokens"),
        F.sum("span_tokens").alias("covered_tokens"),
    )
    return covered.select(
        F.col(id_col),
        F.col("total_tokens").cast("long").alias("total_tokens"),
        F.col("covered_tokens").cast("long").alias("covered_tokens"),
        F.round(F.col("covered_tokens") / F.col("total_tokens"), 6).alias(
            "dup_coverage_frac"
        ),
    )
