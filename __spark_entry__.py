"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes one entry per implemented operator family from
SURVEY.md §2 (+ the training-data-pipeline operators); ``oracle_sql()``
gives the DuckDB-equivalent SQL for every SQL-expressible query.  The
crawl/selector queries synthesize their html input deterministically
FROM the ``documents`` table (pure column expressions), so the oracle
can state the expected extraction output in closed form — the planted
ground truth checks the whole parse→select→canonicalize pipeline.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

N_DOC_HOSTS = 7
N_SEED_DOCS = 10


def _spread(df: DataFrame) -> DataFrame:
    """Floor a scan's parallelism at the session's default parallelism.

    The bench tables are single-row-group parquet files, so the reader
    cannot split them: every scan yields ONE partition and everything up
    to the first exchange — including Arrow-batched parse UDFs and
    expression-dense projections — runs on one core of a 32-core
    machine (guide §6: scan-parallelism floor, the
    ``spark.sql.files.minPartitionNum`` idea, which cannot help here
    because a one-row-group file has a single split).  One round-robin
    repartition of the (tiny) input spreads that map work; when the
    input already carries >= default-parallelism partitions — any real
    multi-file table, and anything at production scale — this is a
    no-op, so the fix is scale-adaptive, not a local[32] constant.
    Results are unchanged: partitioning never affects row values, and
    the driver canonicalizes row order.

    OPT-IN per query (``_read(..., spread=True)``): it pays only where
    the pre-exchange per-row work is heavy — Arrow parse UDFs,
    expression-dense HOF projections, LSH/banding ahead of a pair join
    (measured 2-5x there).  For cheap-JVM-scan queries the extra
    exchange + 32-task scheduling costs more than single-core mapping
    of a few thousand rows saves (measured 2-4x SLOWER on the TPC-H
    rows), so those keep the plain scan."""
    spark = df.sparkSession
    par = spark.sparkContext.defaultParallelism
    try:
        n = df.rdd.getNumPartitions()
    except Exception:  # pragma: no cover - exotic backends
        return df
    return df.repartition(par) if n < par else df


#: (path, mtime_ns, size) -> scan partition count.  The plan->RDD
#: conversion behind ``getNumPartitions`` costs ~100 ms of driver time
#: per call (measured) and the bench pays it per query run; the count
#: is a pure function of the file set, so memoize keyed on the stat
#: signature (a rewritten file invalidates its entry).
_SCAN_PARTS_MEMO: dict[tuple, int] = {}

#: (path, mtime_ns, size) -> StructType.  ``spark.read.parquet`` infers
#: the schema from the footer on EVERY call (~70 ms of driver time per
#: table per query run); the schema is a pure function of the file set,
#: so memoize it the same way as the partition count.  Every query
#: still scans the parquet data itself — this caches metadata only.
_SCAN_SCHEMA_MEMO: dict[tuple, object] = {}


def _stat_key(path: str) -> tuple | None:
    try:
        st = os.stat(path)
    except OSError:  # pragma: no cover - directory tables etc.
        return None
    return (path, st.st_mtime_ns, st.st_size)


def _read(
    spark: SparkSession, sf_dir: str, table: str, spread: bool = False
) -> DataFrame:
    path = os.path.join(sf_dir, f"{table}.parquet")
    key = _stat_key(path)
    schema = _SCAN_SCHEMA_MEMO.get(key) if key is not None else None
    if schema is not None:
        df = spark.read.schema(schema).parquet(path)
    else:
        df = spark.read.parquet(path)
        if key is not None:
            _SCAN_SCHEMA_MEMO[key] = df.schema
    if not spread:
        return df
    if key is None:  # pragma: no cover - directory tables etc.
        return _spread(df)
    if key not in _SCAN_PARTS_MEMO:
        try:
            _SCAN_PARTS_MEMO[key] = df.rdd.getNumPartitions()
        except Exception:  # pragma: no cover - exotic backends
            return df
    par = spark.sparkContext.defaultParallelism
    return df.repartition(par) if _SCAN_PARTS_MEMO[key] < par else df


# ---------------------------------------------------------------------------
# deterministic html corpus derived from `documents` (shared ground truth)
# ---------------------------------------------------------------------------


def _clean_caption():
    # identical normalization exists in the oracle SQL
    return F.substring(
        F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", " "), 1, 40
    )


def _doc_url(doc_id_col):
    return F.concat(
        F.lit("http://docs-"),
        F.pmod(doc_id_col, F.lit(N_DOC_HOSTS)),
        F.lit(".test/d/"),
        doc_id_col,
    )


def _doc_pages(docs: DataFrame, corpus: DataFrame | None = None) -> DataFrame:
    """documents → (doc_id, url, html) with three planted out-links per
    doc in rotating un-canonical trap forms (upper-case host, :80 port,
    dot-segments) that all canonicalize to the closed-form target URL.

    The link-target modulus (corpus row count) joins in as a broadcast
    1-row aggregate instead of a driver-side ``count()`` at plan-build
    time — no extra action, the whole query stays one plan."""
    corpus = corpus if corpus is not None else docs
    n_df = corpus.groupBy().agg(F.count(F.lit(1)).alias("__n_total"))
    docs = docs.crossJoin(F.broadcast(n_df))
    doc_id = F.col("doc_id")
    n_total = F.col("__n_total")
    targets = [F.pmod(doc_id * 7 + j * 11 + 1, n_total) for j in range(3)]

    def trap(j: int, target):
        canonical = _doc_url(target)
        upper = F.concat(
            F.lit("HTTP://DOCS-"),
            F.pmod(target, F.lit(N_DOC_HOSTS)),
            F.lit(".TEST/d/"),
            target,
        )
        port = F.concat(
            F.lit("http://docs-"),
            F.pmod(target, F.lit(N_DOC_HOSTS)),
            F.lit(".test:80/d/"),
            target,
        )
        dots = F.concat(
            F.lit("http://docs-"),
            F.pmod(target, F.lit(N_DOC_HOSTS)),
            F.lit(".test/d/x/../"),
            target,
        )
        variant = F.pmod(doc_id + j, F.lit(3))
        return (
            F.when(variant == 0, canonical)
            .when(variant == 1, upper)
            .otherwise(dots if j % 2 else port)
        )

    # NOTE: variant 2 alternates between port/dot traps by link index
    anchors = [
        F.concat(
            F.lit(f'<a href="'), trap(j, targets[j]), F.lit(f'" class="l{j}">x</a>')
        )
        for j in range(3)
    ]
    html = F.concat(
        F.lit('<html><body><h1 class="t">'),
        _clean_caption(),
        F.lit("</h1>\n"),
        anchors[0],
        F.lit("\n"),
        anchors[1],
        F.lit("\n"),
        anchors[2],
        F.lit("\n</body></html>"),
    )
    return docs.select(
        "doc_id", _doc_url(doc_id).alias("url"), html.alias("html")
    )


def _oracle_doc_targets(j_values: str = "(0),(1),(2)") -> str:
    """SQL fragment producing (doc_id, url) planted-link ground truth."""
    return f"""
    WITH n AS (SELECT count(*) AS n FROM documents),
         js(j) AS (VALUES {j_values})
    SELECT d.doc_id AS doc_id,
           'http://docs-' || (((d.doc_id*7 + js.j*11 + 1) % n.n) % {N_DOC_HOSTS})
             || '.test/d/' || ((d.doc_id*7 + js.j*11 + 1) % n.n) AS url
    FROM documents d, js, n
    """


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = _read(spark, sf_dir, "lineitem")
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q_top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = _read(spark, sf_dir, "orders")
    window = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.withColumn("rnk", F.row_number().over(window))
        .filter(F.col("rnk") <= 3)
        .select("o_custkey", "o_orderkey", F.col("rnk").cast("long").alias("rnk"))
    )


def q_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _read(spark, sf_dir, "customer")
    orders = _read(spark, sf_dir, "orders")
    return customer.join(
        orders.select(F.col("o_custkey").alias("c_custkey")), "c_custkey", "left_anti"
    ).select("c_custkey", "c_mktsegment")


def q_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = _read(spark, sf_dir, "lineitem")
    orders = _read(spark, sf_dir, "orders")
    customer = _read(spark, sf_dir, "customer")
    nation = _read(spark, sf_dir, "nation")
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey")
        )
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def q_event_type_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _read(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 6).alias("sum_value"),
        F.count_distinct("user_id").alias("exact_users"),
    )


def q_event_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity): lag + cumulative
    window — the batch shape of the streaming session operator."""
    from pyspark.sql import Window

    events = _read(spark, sf_dir, "events")
    micros = F.unix_micros(F.col("ts").cast("timestamp"))
    user_window = Window.partitionBy("user_id").orderBy("ts", "event_id")
    with_gap = events.withColumn(
        "new_session",
        F.when(
            micros - F.lag(micros).over(user_window) > 1800 * 1_000_000,
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    with_session = with_gap.withColumn(
        "session_id",
        F.sum("new_session").over(
            user_window.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return with_session.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        ((F.max(micros) - F.min(micros)) / F.lit(1_000_000))
        .cast("long")
        .alias("duration_s"),
    )


def q_doc_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from parsel_spark.operators.dedup import exact_dedup

    return exact_dedup(_read(spark, sf_dir, "documents"))


def q_doc_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COMPAT ORACLE, NOT THE SCALE PATH (hence the *_blocked_compat
    query name): blocked-mode Jaccard — a deliberately quadratic
    within-block self-join kept only to oracle-check the blocked-mode
    semantics.  The operator DEFAULT is the scale-safe LSH mode (see
    q_doc_jaccard_lsh_pairs).  The low-cardinality 'source' key warns
    by design here — ``force=True`` acknowledges the extreme-ratio
    guard."""
    from parsel_spark.operators.dedup import jaccard_pairs

    return jaccard_pairs(
        _read(spark, sf_dir, "documents"), threshold=0.5, block_col="source",
        force=True,
    )


def q_doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from parsel_spark.functions import textstats as ts

    docs = _read(spark, sf_dir, "documents", spread=True)
    return docs.select(
        "doc_id",
        ts.token_count().cast("long").alias("n_tokens"),
        ts.char_count().cast("long").alias("n_chars_measured"),
        F.round(ts.mean_word_length(), 6).alias("mean_word_len"),
    )


def q_doc_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from parsel_spark.functions import textstats as ts

    docs = _read(spark, sf_dir, "documents", spread=True)
    return docs.select(
        "doc_id",
        F.round(ts.stopword_ratio(), 6).alias("stopword_ratio"),
        ts.quality_score().alias("quality"),
    )


def q_doc_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    from parsel_spark.functions import textstats as ts

    docs = _read(spark, sf_dir, "documents", spread=True)
    return ts.lang_id_df(docs, keep=["doc_id"])


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from parsel_spark.functions import textstats as ts

    docs = _read(spark, sf_dir, "documents", spread=True)
    return docs.select("doc_id", ts.fingerprint().alias("fingerprint"))


def q_doc_sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 10% sample keyed on doc_id (md5-unit-hash filter —
    map-side, no shuffle, stable across reruns/partitionings/engines;
    `df.sample` is none of those).  Returns the sampled ids plus the
    unit hash so the oracle checks the VALUE, not just membership."""
    from parsel_spark.functions.sampling import hash_sample, unit_hash

    docs = _read(spark, sf_dir, "documents")
    return hash_sample(docs, "doc_id", rate=0.1, seed=7).select(
        "doc_id", F.round(unit_hash("doc_id", seed=7), 9).alias("u")
    )


def q_doc_train_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic disjoint+exhaustive train/val/test assignment
    (interval partition of the unit hash): every doc gets a stable
    split label — the reproducible dataset-split op of a training
    pipeline."""
    from parsel_spark.functions.sampling import hash_split

    docs = _read(spark, sf_dir, "documents")
    return hash_split(
        docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}, seed=3
    ).select("doc_id", "split")


def q_doc_sample_strata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset MIXING: per-source deterministic sampling rates (the
    'keep 100% of wiki, 30% of web' op).  The rate table compiles into
    a literal CASE over the same md5 unit hash — map-side filter, no
    join; per-stratum samples stay nested when a rate is raised."""
    from parsel_spark.functions.sampling import hash_sample_strata, unit_hash

    docs = _read(spark, sf_dir, "documents")
    # deterministic rate per source bucket: sources are synthetic
    # ("src<k>"), so rate = 1.0 for src0, 0.5 for src1, 0.1 for the rest
    rates = {"src0": 1.0, "src1": 0.5}
    return hash_sample_strata(
        docs, "doc_id", "source", rates, default_rate=0.1, seed=11
    ).select("doc_id", "source", F.round(unit_hash("doc_id", 11), 9).alias("u"))


def q_doc_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing into 256-token training rows,
    shard-local (16 hash shards pack independently — the distributed
    packing shape): every doc gets (shard, seq_id, offset); the oracle
    replays the running-sum window verbatim."""
    from parsel_spark.operators.packing import pack_sequences

    docs = _read(spark, sf_dir, "documents")
    return pack_sequences(docs, token_budget=256, n_shards=16, seed=5)


def q_doc_pack_greedy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy NEXT-FIT packing (docs never straddle training rows;
    over-budget docs sit alone) — the sequential industry semantic,
    run as a per-shard applyInPandas fold; the oracle walks the same
    fold with a recursive CTE over per-shard row_numbers."""
    from parsel_spark.operators.packing import pack_sequences_greedy

    docs = _read(spark, sf_dir, "documents")
    return pack_sequences_greedy(docs, token_budget=256, n_shards=16, seed=5)


def q_doc_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking (packing.chunk_windows, window=24,
    stride=16 — 8 boundary tokens repeat): the long-document half of
    sequence prep.  Corpus token counts span 10..99, so single-window
    docs, multi-window docs, and short final windows all occur
    naturally.  The oracle replays tokenization, the stride lattice
    (generate_series), bounds, and the reconstructed window text
    (1-based-inclusive list_slice) value-for-value."""
    from parsel_spark.operators.packing import chunk_windows

    docs = _read(spark, sf_dir, "documents")
    return chunk_windows(docs, window=24, stride=16)


def q_doc_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary induction (textstats.vocab_topk, k=100): top words by
    occurrence with document frequency — the word-count table tokenizer
    training starts from.  Deterministic ordering (count DESC, word
    ASC); the oracle replays explode, both aggregates and the ranked
    cut."""
    from parsel_spark.functions.textstats import vocab_topk

    return vocab_topk(_read(spark, sf_dir, "documents", spread=True), k=100)


def q_doc_lang_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composition: language-ID → per-language corpus rollup (the
    CCNet/mC4-style per-language dataset card): lang_id_df tags every
    doc, source_mixture rolls up docs / BPE tokens / token share per
    predicted language.  The oracle chains the full lang-ID CTE with
    the rollup algebra — two independently-proven operators, one
    value-checked composition."""
    from parsel_spark.functions.sampling import source_mixture
    from parsel_spark.functions.textstats import lang_id_df

    docs = _read(spark, sf_dir, "documents")
    tagged = lang_id_df(docs, keep=["doc_id", "text"])
    return source_mixture(tagged, source_col="pred_lang")


def q_doc_length_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus length distribution (textstats.corpus_length_stats):
    count/min/max/mean/stddev + EXACT interpolated p50/p90/p99 over
    BPE-ish token counts — the dataset-card numbers packing and
    chunking parameters start from.  The oracle proves Spark's
    percentile interpolation and stddev_samp are bit-identical to
    DuckDB's quantile_cont/stddev_samp."""
    from parsel_spark.functions.textstats import corpus_length_stats

    return corpus_length_stats(_read(spark, sf_dir, "documents"))


def q_doc_html_markdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML→Markdown corpus extraction (markdown.html_to_markdown):
    planted pages with heading, bold, link (closed-form target URL),
    and a 2-item list must render to the EXACT markdown string the
    oracle states — heading marks, ``**``/link syntax, list lines and
    the blank-line block joins all value-checked.  One parse + one DFS
    per page, map-only (same fused UDF shape as the extractors)."""
    from parsel_spark.functions.markdown import html_to_markdown

    docs = _read(spark, sf_dir, "documents", spread=True)
    n_df = docs.groupBy().agg(F.count(F.lit(1)).alias("__n"))
    with_n = docs.crossJoin(F.broadcast(n_df))
    doc_id = F.col("doc_id")
    target = F.pmod(doc_id * 7 + 1, F.col("__n"))
    html = F.concat(
        F.lit("<html><body><h1>Doc "), doc_id, F.lit("</h1>"),
        F.lit("<p>Intro <b>bold"), doc_id,
        F.lit('</b> and <a href="'), _doc_url(target),
        F.lit('">link text</a>.</p>'),
        F.lit("<ul><li>alpha "), doc_id,
        F.lit("</li><li>beta</li></ul></body></html>"),
    )
    return with_n.select(
        "doc_id", html_to_markdown(html).alias("markdown")
    )


def q_doc_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-trained bigram-LM score (textstats.bigram_logprob — the
    KenLM-perplexity stand-in): every 10th doc carries a planted
    doc-unique word-salad suffix whose bigrams are unseen elsewhere,
    provably depressing its mean log probability.  The oracle replays
    the ENTIRE train+score computation — bigram/unigram counts, V,
    add-one smoothing, per-bigram ln, and the DECIMAL(30,15)
    order-independent per-doc sum."""
    from parsel_spark.functions.textstats import bigram_logprob

    docs = _read(spark, sf_dir, "documents", spread=True)
    doc_id = F.col("doc_id")
    salt = F.when(
        F.pmod(doc_id, F.lit(10)) == 0,
        F.concat(F.lit(" qq"), doc_id, F.lit(" ww"), doc_id),
    ).otherwise(F.lit(""))
    prepared = docs.select(
        "doc_id", F.concat(F.col("text"), salt).alias("text")
    )
    return bigram_logprob(prepared)


def q_doc_tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc TF-IDF keywords (textstats.tfidf_keywords, k=3):
    corpus-wide stopwords score exactly 0 (ln 1) and rarities rank
    first; deterministic (score DESC, word ASC) cut.  The oracle
    replays tf, df, the ln(N/df) score and the ranked window — ln of
    an integer ratio is the same IEEE double in both engines."""
    from parsel_spark.functions.textstats import tfidf_keywords

    return tfidf_keywords(_read(spark, sf_dir, "documents", spread=True), k=3)


def q_doc_c4_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 cleaning rules (textstats.c4_quality_flags, Raffel et al.
    2020 §2.2) over planted multi-line pages: every doc gets a kept
    content line (terminal '.'), a nav line with no terminal punct
    (provably dropped), every 4th a JavaScript-mention line (dropped
    despite its '.'), every 31st LOSES its second content line (fails
    the 2-sentence floor), every 23rd a '{' code line (page poisoned),
    every 29th a lorem-ipsum line (page poisoned).  The oracle replays
    line split, the filter lambda, rejoin, sentence counting and all
    three page gates in ANSI SQL."""
    from parsel_spark.functions.textstats import c4_quality_flags

    docs = _read(spark, sf_dir, "documents", spread=True)
    doc_id = F.col("doc_id")
    page = F.concat_ws(
        "\n",
        F.concat(F.substring("text", 1, 100), F.lit(".")),
        F.lit("Home About Contact"),
        F.when(
            F.pmod(doc_id, F.lit(4)) == 0,
            F.lit("Please enable JavaScript in your browser."),
        ),
        F.when(
            F.pmod(doc_id, F.lit(31)) != 0,
            F.concat(F.substring("text", 101, 80), F.lit("?")),
        ),
        F.when(
            F.pmod(doc_id, F.lit(23)) == 0,
            F.lit("function f() { return 1; }"),
        ),
        F.when(
            F.pmod(doc_id, F.lit(29)) == 0,
            F.lit("Lorem ipsum dolor sit amet."),
        ),
    )
    return c4_quality_flags(
        docs.select("doc_id", page.alias("text")), min_sentences=2
    )


def q_doc_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub pass: emails / IPv4s / phone runs → typed placeholders,
    entirely JVM-side regexp_replace.  PII is PLANTED deterministically
    (an address and an IP derived from doc_id appended to every text)
    so the redaction provably fires on every row and the oracle states
    the expected output in closed form over the same planted input."""
    from parsel_spark.functions.textstats import redact_pii

    docs = _read(spark, sf_dir, "documents", spread=True)
    doc_id = F.col("doc_id")
    planted = F.concat(
        F.col("text"),
        F.lit(" contact: user"),
        doc_id,
        F.lit("@example.com or 10.0.0."),
        F.pmod(doc_id, F.lit(256)),
    )
    return docs.select("doc_id", redact_pii(planted).alias("clean_text"))


def q_doc_bpe_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting under the BPE-ish pre-tokenizer (public GPT-2
    style pre-split, lookahead-free for Java-regex/RE2 parity) — the
    LLM-token-budget proxy next to the whitespace counter; pure JVM
    regexp_count, identical pattern replayed in the oracle."""
    from parsel_spark.functions.textstats import bpe_token_count

    docs = _read(spark, sf_dir, "documents", spread=True)
    return docs.select(
        "doc_id", bpe_token_count().cast("long").alias("n_bpe_tokens")
    )


def q_doc_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from parsel_spark.operators.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(_read(spark, sf_dir, "documents", spread=True), threshold=0.35)


def q_doc_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """120-bit simhash near-dup (two md5-segment lanes): k+1=7 bands of
    ≥17 bits, so band-bucket cardinality stays ~2^17 at billions of
    docs (the 60-bit fingerprint's k=6 bands are 8-9 bits ⇒ ≤512
    buckets — oracle-correct but not scale-safe)."""
    from parsel_spark.operators.dedup import simhash_pairs

    return simhash_pairs(
        _read(spark, sf_dir, "documents", spread=True), max_hamming=6, bits=120
    )


def q_doc_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERING: connected components over the minhash-LSH
    pair graph (iterative min-label propagation, eager-pinned rounds,
    converged-row counter riding each pin as an Observation) — the step
    that turns pairwise dup evidence into dedup groups.  Every doc gets
    a (doc_id, cluster_id = min reachable doc_id) row; singletons label
    themselves.  The DuckDB oracle replays the SAME pair graph (full
    minhash SQL) and closes it transitively with a recursive CTE."""
    from parsel_spark.operators.dedup import dup_clusters, minhash_lsh_pairs

    docs = _read(spark, sf_dir, "documents", spread=True)
    pairs = minhash_lsh_pairs(docs, threshold=0.35)
    return dup_clusters(pairs, docs)


def q_doc_cluster_representatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup pipeline's FINAL step: pairs → clusters → one KEPT doc
    per cluster, chosen by quality (highest quality_score, doc_id
    tie-break) — 'keep the best duplicate', not just the smallest id.
    Deterministic argmax via min(struct(-quality, doc_id)); the oracle
    replays clusters (recursive CTE) + a row_number pick."""
    from parsel_spark.functions import textstats as ts
    from parsel_spark.operators.dedup import dup_clusters, minhash_lsh_pairs

    docs = _read(spark, sf_dir, "documents", spread=True)
    pairs = minhash_lsh_pairs(docs, threshold=0.35)
    clusters = dup_clusters(pairs, docs)
    # 6dp-rounded BEFORE the argmax so the pick is bit-identical to the
    # oracle's (which works from the rounded doc_quality values)
    scored = docs.select(
        "doc_id", F.round(ts.quality_score(), 6).alias("q")
    ).join(clusters, "doc_id")
    best = (
        scored.groupBy("cluster_id")
        .agg(
            F.min(F.struct((-F.col("q")).alias("nq"), F.col("doc_id").alias("d")))
            .alias("best"),
            F.count(F.lit(1)).alias("cluster_size"),
        )
        .select(
            "cluster_id",
            F.col("best.d").alias("kept_doc_id"),
            F.round(-F.col("best.nq"), 6).alias("kept_quality"),
            "cluster_size",
        )
    )
    return best


def q_doc_jaccard_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB-path Jaccard near-dup: MinHash-band candidates over
    token sets (no quadratic-within-block self-join), exact verify."""
    from parsel_spark.operators.dedup import jaccard_pairs

    return jaccard_pairs(
        _read(spark, sf_dir, "documents", spread=True), threshold=0.8, block_col=None
    )


def q_doc_repeated_ngram_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SUBSTRING-LEVEL cross-document dedup, span pass: the merged token
    spans of every 5-gram shared by >= 2 distinct documents — the
    Lee-et-al-style repeated-substring pass (shared boilerplate
    paragraphs that doc-level minhash cannot catch).  Bucketed
    shingle-hash -> count -> rejoin; never all-pairs.  Reference
    counterpart: none (parsel is single-document) — training-data
    surface per SURVEY §9."""
    from parsel_spark.operators.dedup import repeated_ngram_spans

    return repeated_ngram_spans(
        _read(spark, sf_dir, "documents", spread=True), n=5, min_docs=2
    )


def q_doc_ngram_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SUBSTRING-LEVEL cross-document dedup, removal pass: every doc
    with its repeated 5-gram spans stripped (aggressive all-occurrence
    removal — the boilerplate-strip semantic), token filtering in place
    via higher-order functions (no token explode of the corpus)."""
    from parsel_spark.operators.dedup import remove_repeated_ngrams

    return remove_repeated_ngrams(
        _read(spark, sf_dir, "documents", spread=True), n=5, min_docs=2
    )


def _synth_multiline_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents re-shaped as MULTI-LINE pages (the corpus texts carry
    no newlines): a copyright footer planted on every doc, a newsletter
    plug on every 3rd, sandwiching two unique content lines cut from
    the doc's own text.  ``concat_ws`` skips the NULL conditional line
    identically in Spark and DuckDB, so both engines see byte-identical
    pages."""
    docs = _read(spark, sf_dir, "documents", spread=True)
    return docs.select(
        "doc_id",
        F.concat_ws(
            "\n",
            F.lit("Copyright ACME Corp -- All Rights Reserved."),
            F.substring("text", 1, 120),
            F.when(
                F.pmod(F.col("doc_id"), F.lit(3)) == 0,
                F.lit("Subscribe to our newsletter today!"),
            ),
            F.substring("text", 121, 140),
        ).alias("text"),
    )


def q_doc_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style cross-document LINE-level dedup (dedup.line_dedup)
    over synthesized multi-line pages: the planted copyright footer
    (every doc) and newsletter plug (every 3rd doc) are provably
    stripped, unique content lines provably kept byte-exact.  The
    oracle replays split, normalization, distinct-doc counting and
    in-order reassembly in ANSI SQL."""
    from parsel_spark.operators.dedup import line_dedup

    return line_dedup(_synth_multiline_docs(spark, sf_dir), min_docs=2)


def q_doc_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EVAL-SET DECONTAMINATION: flag docs whose distinct-5-gram overlap
    with the eval set reaches 30%.  The eval set is derived
    deterministically from the same corpus (doc_id % 97 == 0), so the
    planted contamination is closed-form: those docs overlap 100% with
    themselves and their exact/near dups inherit high overlap, while
    unrelated docs stay below threshold.  Broadcast eval-gram set; one
    map-side-combined groupBy — the scale shape of a 100 TB corpus vs
    a small benchmark suite."""
    from parsel_spark.operators.decontam import decontaminate

    docs = _read(spark, sf_dir, "documents", spread=True)
    ev = docs.filter(F.col("doc_id") % 97 == 0).select("doc_id", "text")
    return decontaminate(docs, ev, n=5, threshold=0.3)


#: opt-in EXSLT dates-and-times namespace (both selector_exslt_* rows)
_EXSLT_DATE_NS = {"date": "http://exslt.org/dates-and-times"}


def _exslt_pub_pages(
    spark: SparkSession, sf_dir: str, with_duration: bool = False
) -> DataFrame:
    """(doc_id, xml) pages carrying the closed-form per-doc pub date
    (year 2000+id%30, month 1+id%12, day 1+id%28) — the SINGLE source
    of the date synthesis both EXSLT date rows and their oracles state;
    ``with_duration`` adds the <dur>P{id%45}D</dur> element the
    arithmetic row consumes."""
    docs = _read(spark, sf_dir, "documents", spread=True)
    doc_id = F.col("doc_id")
    pub = F.concat(
        (F.lit(2000) + F.pmod(doc_id, F.lit(30))).cast("string"),
        F.lit("-"),
        F.lpad((F.lit(1) + F.pmod(doc_id, F.lit(12))).cast("string"), 2, "0"),
        F.lit("-"),
        F.lpad((F.lit(1) + F.pmod(doc_id, F.lit(28))).cast("string"), 2, "0"),
    )
    parts = [F.lit("<doc><pub>"), pub, F.lit("</pub>")]
    if with_duration:
        parts += [F.lit("<dur>P"), F.pmod(doc_id, F.lit(45)), F.lit("D</dur>")]
    parts.append(F.lit("</doc>"))
    return docs.select("doc_id", F.concat(*parts).alias("xml"))


def _exslt_first(q: str) -> F.Column:
    """First xpath result under the opt-in date namespace."""
    from parsel_spark.functions.udfs import xpath_getall

    return F.element_at(
        xpath_getall("xml", q, type="xml", namespaces=_EXSLT_DATE_NS), 1
    )


def q_selector_exslt_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXSLT ``date:`` module THROUGH the distributed UDF layer: XML
    docs carry a closed-form pub date per doc_id; xpath with the opt-in
    dates-and-times namespace must recover year / month / leap flag /
    day-in-year, which the oracle recomputes with native SQL date
    functions — two independent date implementations agreeing value-
    for-value."""
    pages = _exslt_pub_pages(spark, sf_dir)
    first = _exslt_first

    return pages.select(
        "doc_id",
        first("string(date:year(string(//pub)))").alias("pub_year"),
        first("string(date:month-in-year(string(//pub)))").alias("pub_month"),
        first("date:leap-year(string(//pub))").alias("is_leap"),
        first("string(date:day-in-year(string(//pub)))").alias("day_in_year"),
    )


def q_selector_exslt_date_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXSLT date: ARITHMETIC through the distributed UDF layer:
    date:add (day durations, incl. month-boundary carries) and
    date:difference (against a fixed anchor) over the same closed-form
    pub dates, checked against DuckDB's NATIVE date arithmetic
    (make_date + INTERVAL, date_diff) — two independent calendar
    implementations agreeing value-for-value, including the sign
    convention on differences."""
    pages = _exslt_pub_pages(spark, sf_dir, with_duration=True)
    first = _exslt_first

    return pages.select(
        "doc_id",
        first("date:add(string(//pub), string(//dur))").alias("due_date"),
        first("date:difference(string(//pub), '2015-06-15')").alias(
            "diff_to_anchor"
        ),
    )


def q_crawl_sitemap_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SITEMAP ingestion (sitemaps.org protocol): per-host sitemap XML
    is synthesized JVM-side from the documents table (every doc url
    under its host, namespaced <urlset>), parsed by the XXE-safe XML
    engine through ONE pandas-UDF pass (`extract_sitemap`), and the
    recovered page urls must equal the closed-form (host, doc url)
    ground truth the oracle states directly."""
    from parsel_spark.functions.udfs import extract_sitemap

    docs = _read(spark, sf_dir, "documents", spread=True)
    per_host = (
        docs.select(
            F.pmod("doc_id", F.lit(N_DOC_HOSTS)).alias("host"),
            _doc_url(F.col("doc_id")).alias("url"),
        )
        .groupBy("host")
        .agg(F.array_sort(F.collect_list("url")).alias("urls"))
    )
    xml = F.concat(
        F.lit(
            '<?xml version="1.0" encoding="UTF-8"?>'
            '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        ),
        F.aggregate(
            F.transform(
                "urls",
                lambda u: F.concat(
                    F.lit("<url><loc>"), u, F.lit("</loc></url>")
                ),
            ),
            F.lit(""),
            lambda acc, x: F.concat(acc, x),
        ),
        F.lit("</urlset>"),
    )
    sitemap = per_host.select("host", xml.alias("xml"))
    parsed = sitemap.select(
        "host", extract_sitemap("xml").alias("s")
    )
    return parsed.select(
        F.col("host").cast("long").alias("host"),
        F.explode("s.page_urls").alias("url"),
    )


def q_crawl_anchor_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANCHOR-TEXT pairs (the link-graph signal the href-only hot path
    drops): pages built with closed-form anchor text — nested markup
    inside the anchor included — must come back as exact (doc_id, href,
    anchor_text) rows through the one-parse extract_anchors UDF."""
    from parsel_spark.functions.udfs import extract_anchors

    docs = _read(spark, sf_dir, "documents", spread=True)
    n_df = docs.groupBy().agg(F.count(F.lit(1)).alias("__n"))
    with_n = docs.crossJoin(F.broadcast(n_df))
    doc_id = F.col("doc_id")
    anchors = []
    for j in range(3):
        target = F.pmod(doc_id * 7 + j * 11 + 1, F.col("__n"))
        anchors.append(
            F.concat(
                F.lit('<a href="'), _doc_url(target),
                F.lit(f'">anchor <b>{j}</b> of '), doc_id, F.lit("</a>"),
            )
        )
    html = F.concat(
        F.lit("<html><body>"), anchors[0], anchors[1], anchors[2],
        F.lit("</body></html>"),
    )
    pages = with_n.select("doc_id", html.alias("html"))
    return pages.select(
        "doc_id", F.explode(extract_anchors("html")).alias("a")
    ).select(
        "doc_id",
        F.col("a.href").alias("href"),
        F.col("a.text").alias("anchor_text"),
    )


def q_crawl_anchor_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inbound anchor-text aggregation (linkgraph.anchor_rollup) over
    the REAL anchor extraction of the crawl_anchor_text corpus: per
    link target, inlink/source counts and the deterministic-mode top
    anchor text (count DESC, text ASC).  The oracle restates the
    planted anchors in closed form and replays both aggregates and
    the mode window."""
    from parsel_spark.functions.udfs import extract_anchors
    from parsel_spark.operators.linkgraph import anchor_rollup

    docs = _read(spark, sf_dir, "documents", spread=True)
    n_df = docs.groupBy().agg(F.count(F.lit(1)).alias("__n"))
    with_n = docs.crossJoin(F.broadcast(n_df))
    doc_id = F.col("doc_id")
    anchors = []
    for j in range(3):
        target = F.pmod(doc_id * 7 + j * 11 + 1, F.col("__n"))
        anchors.append(
            F.concat(
                F.lit('<a href="'), _doc_url(target),
                F.lit(f'">anchor <b>{j}</b> of '), doc_id, F.lit("</a>"),
            )
        )
    html = F.concat(
        F.lit("<html><body>"), anchors[0], anchors[1], anchors[2],
        F.lit("</body></html>"),
    )
    pages = with_n.select("doc_id", html.alias("html"))
    pairs = pages.select(
        "doc_id", F.explode(extract_anchors("html")).alias("a")
    ).select(
        "doc_id",
        F.col("a.href").alias("href"),
        F.col("a.text").alias("anchor_text"),
    )
    return anchor_rollup(pairs)


def q_doc_fingerprint_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing-fingerprint dedup clusters (MOSS lineage — Schleimer
    et al., SIGMOD 2003 — reduced to the min-gram fingerprint the
    doc_fingerprint row already proves): every ODD doc is re-synthesized
    as its predecessor's text plus a 3-token tail, so {even, odd} pairs
    share their minimum 8-gram hash whenever no boundary window hashes
    lower — a deterministic md5 fact the oracle recomputes, never
    assumes.  Output: each doc with its fingerprint, the min-doc
    cluster representative and the cluster size (ONE hash(fingerprint)
    window).  The cheap first-pass dedup before minhash/simhash."""
    from pyspark.sql import Window

    from parsel_spark.functions.textstats import fingerprint

    docs = _read(spark, sf_dir, "documents")
    prev = docs.select(
        (F.col("doc_id") + 1).alias("doc_id"),
        F.col("text").alias("__prev"),
    )
    synth = docs.join(prev, "doc_id", "left").select(
        "doc_id",
        F.when(
            (F.pmod(F.col("doc_id"), F.lit(2)) == 1)
            & F.col("__prev").isNotNull(),
            F.concat(F.col("__prev"), F.lit(" zz tail zz")),
        ).otherwise(F.col("text")).alias("text"),
    )
    fp = synth.select("doc_id", fingerprint().alias("fingerprint"))
    w = Window.partitionBy("fingerprint")
    return fp.select(
        "doc_id",
        "fingerprint",
        F.min("doc_id").over(w).alias("fp_cluster"),
        F.count(F.lit(1)).over(w).alias("n_group"),
    )


def q_doc_top_ngram_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITHIN-DOC repetition signal (Gopher-style quality rule): the
    most frequent 2-gram's occurrence count and token fraction per doc.
    NOTE: occurrence-weighted — self-overlapping grams ('la la la')
    can push the fraction above 1, exactly like the public
    count*len/len(doc) implementations; filters compare > threshold."""
    from parsel_spark.operators.dedup import top_ngram_stats

    return top_ngram_stats(_read(spark, sf_dir, "documents", spread=True), n=2)


def q_doc_dup_ngram_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITHIN-DOC duplicate-5-gram coverage (Gopher-style): fraction of
    tokens covered by 5-grams occurring >= 2 times in the SAME doc —
    internal repetition cross-document dedup never sees.  Same
    gaps-and-islands span merge as the substring dedup, grouped per
    (doc, gram)."""
    from parsel_spark.operators.dedup import dup_ngram_coverage

    return dup_ngram_coverage(_read(spark, sf_dir, "documents", spread=True), n=5)


def q_doc_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COMPOSED Gopher-style quality GATE: the map-only document gates
    (word count / mean word length / stopword floor / symbol ceiling)
    joined with the top-2-gram repetition gate — the full keep/drop
    decision a production corpus filter makes, with every rule value-
    replayed by the oracle.  Thresholds are the public Gopher-paper
    bands except min_words=10 (the synthetic docs are short)."""
    from parsel_spark.functions.textstats import gopher_quality_flags
    from parsel_spark.operators.dedup import top_ngram_stats

    docs = _read(spark, sf_dir, "documents", spread=True)
    flags = docs.select("doc_id", *gopher_quality_flags())
    rep = top_ngram_stats(docs, n=2).select(
        "doc_id", (F.col("top_ngram_frac") <= 0.2).alias("ok_repetition")
    )
    return flags.join(rep, "doc_id").select(
        "doc_id",
        "ok_word_count",
        "ok_mean_word_len",
        "ok_stopwords",
        "ok_symbol_ratio",
        "ok_repetition",
        (F.col("keep") & F.col("ok_repetition")).alias("keep"),
    )


def q_doc_corpus_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE TEXT-AXIS CAPSTONE — quality gate → exact dedup → per-host
    cap → token manifest in ONE chained plan: the composed Gopher+
    repetition gate keeps clean docs, the md5(text) winner window drops
    exact copies, `cap_per_group` (cap=40, unit-hash winners, seed=9)
    bounds each host's contribution, and the output is the corpus-build
    manifest (doc_id, host, n_bpe_tokens) a packing stage consumes.
    The oracle EMBEDS the doc_quality_filter oracle verbatim as its
    gate CTE (single source of truth) and chains dedup window + cap
    predicate + BPE count — the full pipeline is the checked value."""
    from pyspark.sql import Window

    from parsel_spark.functions.sampling import cap_per_group
    from parsel_spark.functions.textstats import bpe_token_count

    docs = _read(spark, sf_dir, "documents", spread=True)
    gate = q_doc_quality_filter(spark, sf_dir).where("keep").select("doc_id")
    host = F.concat(
        F.lit("docs-"), F.pmod(F.col("doc_id"), F.lit(N_DOC_HOSTS)),
        F.lit(".test"),
    )
    kept = docs.join(gate, "doc_id").select(
        "doc_id", host.alias("host"), "text"
    )
    # winner-per-md5 as a hash aggregate (min over struct with the
    # unique doc_id leading — EXACTLY the row_number(orderBy doc_id)==1
    # pick) instead of a window: map-side partial aggregation combines
    # duplicates before the exchange and no per-group sort of the text
    # column happens (guide §2.3 "aggregate before you shuffle")
    reps = (
        kept.groupBy(F.md5("text").alias("__md5"))
        .agg(
            F.min(
                F.struct(
                    F.col("doc_id").alias("doc_id"),
                    F.col("host").alias("host"),
                    F.col("text").alias("text"),
                )
            ).alias("__w")
        )
        .select("__w.doc_id", "__w.host", "__w.text")
    )
    capped = cap_per_group(reps, "host", cap=40, id_col="doc_id", seed=9)
    return capped.select(
        "doc_id",
        "host",
        bpe_token_count().cast("long").alias("n_bpe_tokens"),
    )


def q_crawl_host_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl ← corpus-quality FEEDBACK composition
    (frontier.host_quality_priority): every document's Gopher keep
    verdict (the doc_quality_filter gate verbatim) rolls up per host
    into (n_docs, n_keep, keep_rate) and a deterministic priority rank
    (keep_rate DESC, host ASC) — the host-reputation table the frontier
    consumes as a broadcast priority source.  The oracle reuses the
    SAME gate CTEs as doc_quality_filter (single source of truth) and
    replays rollup + rank() in ANSI SQL."""
    from parsel_spark.functions.textstats import gopher_quality_flags
    from parsel_spark.operators.dedup import top_ngram_stats
    from parsel_spark.operators.frontier import host_quality_priority

    docs = _read(spark, sf_dir, "documents", spread=True)
    host = F.concat(
        F.lit("docs-"), F.pmod(F.col("doc_id"), F.lit(N_DOC_HOSTS)), F.lit(".test")
    )
    flags = docs.select("doc_id", host.alias("host"), *gopher_quality_flags())
    rep = top_ngram_stats(docs, n=2).select(
        "doc_id", (F.col("top_ngram_frac") <= 0.2).alias("ok_repetition")
    )
    verdicts = flags.join(rep, "doc_id").select(
        "host", (F.col("keep") & F.col("ok_repetition")).alias("keep")
    )
    return host_quality_priority(verdicts)


def q_doc_source_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus rollup (the "dataset card" numbers mixture
    planning starts from): docs + BPE-token totals + token share per
    source — one map-side-combined groupBy, total joined back as a
    broadcast 1-row aggregate."""
    from parsel_spark.functions.sampling import source_mixture

    return source_mixture(_read(spark, sf_dir, "documents"))


def q_doc_mixture_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MIXTURE PLANNING: target weights {src0:0.1, src1:0.2, src2:0.7}
    over a 20k-token budget compile to per-source deterministic
    sampling rates; src2's target deliberately exceeds its corpus so
    the clamp-at-1.0 + REPORTED shortfall path is value-checked (no
    silent redistribution)."""
    from parsel_spark.functions.sampling import (
        mixture_sampling_rates,
        source_mixture,
    )

    mix = source_mixture(_read(spark, sf_dir, "documents"))
    return mixture_sampling_rates(
        mix, {"src0": 1.0, "src1": 2.0, "src2": 7.0}, token_budget=20_000
    )


def q_doc_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GRAND MIXING COMPOSITION: rollup → rate compilation → the actual
    stratified map-side sample.  The computed per-source rates (a
    3-row collect — the one acceptable driver hop, same as robots
    rules) drive hash_sample_strata; the oracle recomputes the rates
    in SQL and replays the exact unit-hash filter, so the SAMPLED SET
    itself — not a count — is the checked value."""
    from parsel_spark.functions.sampling import (
        hash_sample_strata,
        mixture_sampling_rates,
        source_mixture,
    )

    docs = _read(spark, sf_dir, "documents")
    plan = mixture_sampling_rates(
        source_mixture(docs),
        {"src0": 1.0, "src1": 2.0, "src2": 7.0},
        token_budget=20_000,
    )
    rates = {r["source"]: float(r["rate"]) for r in plan.collect()}
    return hash_sample_strata(
        docs, "doc_id", "source", rates, default_rate=0.0, seed=0
    ).select("doc_id", "source")


def q_doc_clean_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COMPOSED training-data pipeline row: substring-level dedup
    (repeated-5-gram spans removed in place) feeding BPE-ish token
    counting on the CLEANED text — the budget a packing stage would
    actually see after boilerplate stripping.  The oracle composes the
    full doc_ngram_dedup replay with the identical token regex."""
    from parsel_spark.functions.textstats import bpe_token_count
    from parsel_spark.operators.dedup import remove_repeated_ngrams

    cleaned = remove_repeated_ngrams(
        _read(spark, sf_dir, "documents", spread=True), n=5, min_docs=2
    )
    return cleaned.select(
        "doc_id",
        "removed_tokens",
        bpe_token_count("clean_text").cast("long").alias(
            "n_clean_bpe_tokens"
        ),
    )


def q_doc_main_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAIN-TEXT EXTRACTION (boilerplate removal): each doc is wrapped
    in a page with planted boilerplate — script/style head, a nav link
    cluster, a footer — around two real content units (the caption h1
    and a closed-form body paragraph).  The rule-based extractor
    (DROP_TAGS + link-density <= 0.5 per paragraph unit, via the
    engine's own recovering parser) must strip ALL the boilerplate and
    keep exactly the content, which the oracle states in closed form."""
    from parsel_spark.functions.maintext import main_text

    docs = _read(spark, sf_dir, "documents", spread=True)
    page = F.concat(
        F.lit(
            "<html><head><script>var x=1;</script><style>.b{}</style>"
            '</head><body><nav><a href="/">home</a> <a href="/about">'
            'about</a></nav><h1 class="t">'
        ),
        _clean_caption(),
        F.lit("</h1><p>document "),
        F.col("doc_id"),
        F.lit(
            " body text</p><footer>copyright docs corp</footer>"
            "</body></html>"
        ),
    )
    return docs.select("doc_id", main_text(page).alias("main_text"))


def q_emb_near_dup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB-path embedding near-dup: hyperplane-LSH buckets as the
    join key, exact cosine verify of candidates."""
    from parsel_spark.operators.similarity import embedding_near_dup_pairs

    return embedding_near_dup_pairs(
        _read(spark, sf_dir, "embeddings", spread=True),
        threshold=0.30,
        block_col=None,
        round_to=4,
        n_planes=6,
    )


def q_emb_knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    from parsel_spark.operators.similarity import knn_bruteforce

    return knn_bruteforce(_read(spark, sf_dir, "embeddings"), query_id=0, k=10)


def q_emb_knn_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from parsel_spark.operators.similarity import knn_lsh

    return knn_lsh(_read(spark, sf_dir, "embeddings"), query_id=0, k=10)


#  sf_dir → (assigned, centroids) read back from a catalog-persisted
#  index: built ONCE per process (build_ivf_index → snapshot catalog),
#  probed on every query — the 100 TB shape, where the coarse quantizer
#  is built at ingest cadence and queries only pay the probe.  The
#  oracle replays build+probe in closed form, so correctness covers the
#  whole pipeline while the bench's repeat runs measure the probe.
_IVF_INDEX_CACHE: dict[str, tuple[DataFrame, DataFrame]] = {}


def _ivf_index_for(spark: SparkSession, sf_dir: str):
    if sf_dir not in _IVF_INDEX_CACHE:
        import tempfile

        from parsel_spark.operators.similarity import (
            build_ivf_index,
            load_ivf_index,
        )
        from parsel_spark.sources.snapshots import SnapshotCatalog

        catalog = SnapshotCatalog(tempfile.mkdtemp(prefix="parsel_spark_ivf_"))
        build_ivf_index(catalog, _read(spark, sf_dir, "embeddings"))
        _IVF_INDEX_CACHE[sf_dir] = load_ivf_index(spark, catalog)
    return _IVF_INDEX_CACHE[sf_dir]


def q_emb_knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN over a PERSISTED index: deterministic k-means coarse
    quantizer (decimal-exact centroid updates, fixed Lloyd iterations)
    built once through the snapshot catalog, then probe the 4 nearest
    of 16 clusters and exact-cosine top-k the scanned candidates.  The
    persisted (assigned, centroids) tables are bit-identical to an
    inline rebuild (pytest-pinned), so the full-replay oracle stays
    value-exact."""
    from parsel_spark.operators.similarity import knn_ivf

    return knn_ivf(
        _read(spark, sf_dir, "embeddings"),
        query_id=0,
        k=10,
        index=_ivf_index_for(spark, sf_dir),
    )


def q_emb_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from parsel_spark.operators.similarity import embedding_near_dup_pairs

    # COMPAT ORACLE, NOT THE SCALE PATH (hence the *_blocked_compat
    # query name): blocked-mode opt-in, deliberately quadratic within
    # the 'label' block, kept only to oracle-check blocked semantics
    # (the operator DEFAULT is LSH — see q_emb_near_dup_lsh); low
    # threshold so the synthetic embeddings yield non-trivial output;
    # force=True acknowledges the extreme-ratio guard
    return embedding_near_dup_pairs(
        _read(spark, sf_dir, "embeddings"),
        threshold=0.30,
        block_col="label",
        round_to=4,
        force=True,
    )


def q_emb_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric per-vector int8 quantization
    (similarity.quantize_embeddings): scale = max|x|/127 and
    floor-quantized codes, float→double cast before every arithmetic
    step so the integer codes are engine-exact.  The oracle replays
    max-abs, scale and the floor quantizer element-for-element in ANSI
    SQL — the whole code array is value-checked, not a summary."""
    from parsel_spark.operators.similarity import quantize_embeddings

    embeddings = _read(spark, sf_dir, "embeddings")
    return quantize_embeddings(embeddings.select("vec_id", "embedding"))


def q_emb_knn_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 neighbors of vec 0 by QUANTIZED dot product
    (similarity.knn_quantized): integer dots are exactly representable
    in doubles (64 products of |q| ≤ 127), so summation order cannot
    perturb the score and the ranking replays exactly; ties break on
    vec_id.  The oracle re-quantizes everything and walks the same
    integer dot + rescale in SQL."""
    from parsel_spark.operators.similarity import knn_quantized

    embeddings = _read(spark, sf_dir, "embeddings")
    return knn_quantized(embeddings.select("vec_id", "embedding"), query_id=0)


def q_emb_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from parsel_spark.operators.similarity import norm

    embeddings = _read(spark, sf_dir, "embeddings")
    return embeddings.select(
        "vec_id", "label", F.round(norm(F.col("embedding"), 64), 4).alias("l2_norm")
    )


def q_emb_label_centroid_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    embeddings = _read(spark, sf_dir, "embeddings")
    return (
        embeddings.select(
            "label", F.posexplode("embedding").alias("dim", "value")
        )
        .groupBy("label", F.col("dim").cast("long").alias("dim"))
        .agg(
            (F.round(F.avg("value"), 4) + F.lit(0.0)).alias("mean_value")
        )  # -0.0 → +0.0: cross-engine value parity
    )


def q_crawl_extract_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    """css-extract + canonicalize the planted links; output must equal
    the closed-form target set.  Uses the FUSED parse+select+resolve+
    canonicalize UDF (one ArrowEvalPython hop — the loop's hot path;
    round 2 paid two Python hops here: css_getall, explode, then a
    second canonicalize pass)."""
    from parsel_spark.functions.udfs import extract_canonical_links

    docs = _read(spark, sf_dir, "documents", spread=True)
    pages = _doc_pages(docs)
    return pages.select(
        "doc_id",
        F.explode(extract_canonical_links("html", "url")).alias("url"),
    )


def q_crawl_frontier_wave1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wave-1 frontier: links of the seed docs, deduped, minus the
    already-seen seed URLs (bloom-style prefilter + exact anti-join)."""
    from parsel_spark.functions.udfs import extract_canonical_links

    docs = _read(spark, sf_dir, "documents", spread=True)
    seeds = docs.filter(F.col("doc_id") < N_SEED_DOCS)
    pages = _doc_pages(seeds, corpus=docs)
    links = (
        pages.select(
            F.explode(extract_canonical_links("html", "url")).alias("url")
        )
        .dropDuplicates(["url"])
    )
    seed_urls = seeds.select(_doc_url(F.col("doc_id")).alias("url"))
    return links.join(seed_urls, "url", "left_anti")


def q_selector_caption_xpath(spark: SparkSession, sf_dir: str) -> DataFrame:
    from parsel_spark.functions.udfs import xpath_getall

    docs = _read(spark, sf_dir, "documents", spread=True)
    pages = _doc_pages(docs)
    return pages.select(
        "doc_id",
        F.element_at(
            xpath_getall("html", "//h1[@class='t']/text()"), 1
        ).alias("caption"),
    )


def q_selector_re_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    from parsel_spark.functions.udfs import re_extract

    docs = _read(spark, sf_dir, "documents", spread=True)
    return docs.select(
        "doc_id", F.explode(re_extract("text", r"\b(s\w+)")).alias("match")
    )


def q_selector_drop_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document mutation: drop the middle anchor (``a.l1``) from each
    page, then extract + canonicalize — output must be exactly the
    planted links for j ∈ {0, 2} (tests drop + reselection E2E).  The
    drop+select+resolve+canonicalize pipeline is FUSED into one pandas
    UDF pass (one ArrowEvalPython hop; round 2 paid three: drop UDF,
    css_getall UDF, canonicalize UDF)."""
    from parsel_spark.functions.udfs import extract_canonical_links

    docs = _read(spark, sf_dir, "documents", spread=True)
    pages = _doc_pages(docs)
    return pages.select(
        "doc_id",
        F.explode(
            extract_canonical_links("html", "url", drop_css="a.l1")
        ).alias("url"),
    )


def q_selector_jmespath(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JMESPath over a JSON payload column built from the documents."""
    from parsel_spark.functions.udfs import jmespath_getall

    docs = _read(spark, sf_dir, "documents", spread=True)
    payload = F.to_json(
        F.struct(
            F.struct(F.col("doc_id").alias("id"), F.col("lang").alias("lang")).alias(
                "meta"
            ),
            F.col("source").alias("src"),
        )
    )
    return docs.select(
        "doc_id",
        F.element_at(jmespath_getall(payload, "meta.lang"), 1).alias("pred"),
    )


def q_stream_extract_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured-Streaming variant of crawl_extract_links: the SAME
    planted-link corpus flows readStream → fused extract/canonicalize
    UDF → watermarked streaming dedup → parquet sink (availableNow
    micro-batch); the materialized sink must equal the closed-form
    DISTINCT planted-target set — a full value-level oracle for the
    streaming pipeline, not a rows-only check."""
    import tempfile

    from parsel_spark.streaming.stream_crawl import (
        extract_link_stream,
        read_page_stream,
    )

    docs = _read(spark, sf_dir, "documents")
    pages = _doc_pages(docs).select(
        "url",
        F.parse_url("url", F.lit("HOST")).alias("host"),
        "html",
        F.lit("2026-01-01 00:00:00").cast("timestamp").alias("fetched_at"),
    )
    tmp = tempfile.mkdtemp(prefix="parsel_spark_stream_q_")
    in_dir = os.path.join(tmp, "in")
    out_dir = os.path.join(tmp, "out")
    pages.write.mode("overwrite").parquet(in_dir)
    stream = extract_link_stream(read_page_stream(spark, in_dir))
    query = (
        stream.select("url")
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", os.path.join(tmp, "chk"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return spark.read.parquet(out_dir)


def q_stream_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING variant of the composed quality gate: the documents
    table flows readStream → map-only gopher gates + top-2gram
    repetition gate → parquet sink (availableNow).  The repetition gate
    is a per-row HOF recount here (streams cannot reuse the batch
    groupBy shape without state), which is exactly why the gate exists
    as a pure column: batch and stream must agree value-for-value, and
    the oracle is the SAME SQL as doc_quality_filter's keep columns."""
    import tempfile

    from parsel_spark.functions.textstats import gopher_quality_flags
    from parsel_spark.operators.dedup import seq_tokens_col

    docs = _read(spark, sf_dir, "documents")
    tmp = tempfile.mkdtemp(prefix="parsel_spark_stream_qf_")
    in_dir = os.path.join(tmp, "in")
    out_dir = os.path.join(tmp, "out")
    docs.select("doc_id", "text").write.mode("overwrite").parquet(in_dir)
    stream = spark.readStream.schema("doc_id long, text string").parquet(
        in_dir
    )
    # per-row top-2gram recount with higher-order functions (no state,
    # no shuffle): max over the distinct grams of their occurrence
    # counts — small per-doc arrays, identical values to the batch plan
    toks = seq_tokens_col("text")
    grams = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - 2),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, 2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    # max 2-gram multiplicity per row.  The original recount —
    # aggregate over the DISTINCT grams of a filter-count against the
    # full gram array — is O(|distinct| × |grams|) of interpreted
    # lambda steps per row (~330k for a 600-token doc; measured 174 s
    # for the whole stream at sf0.1).  Sorting the grams groups equal
    # values adjacently, so ONE O(n) fold tracking (previous value,
    # current run length, best run) computes the IDENTICAL maximum
    # multiplicity; empty arrays still yield 0 (the fold returns the
    # initial best).  Same values, ~500× less per-row work.
    top_cnt = F.aggregate(
        F.sort_array(grams),
        F.struct(
            F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
        ),
        lambda acc, g: F.struct(
            g.alias("prev"),
            F.when(g == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                acc["best"],
                F.when(g == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    ok_rep = (top_cnt * 2 / F.size(toks)) <= 0.2
    flagged = stream.select(
        "doc_id", *gopher_quality_flags(), ok_rep.alias("ok_repetition")
    ).select(
        "doc_id",
        "ok_word_count",
        "ok_mean_word_len",
        "ok_stopwords",
        "ok_symbol_ratio",
        "ok_repetition",
        (F.col("keep") & F.col("ok_repetition")).alias("keep"),
    )
    query = (
        flagged.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", os.path.join(tmp, "chk"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return spark.read.parquet(out_dir)


def q_stream_url_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STATIC join coverage: the RefinedWeb URL gate running on
    a STREAMING corpus against the STATIC broadcast blocklist — the
    shape a continuous-ingest crawler uses (url_filter_flags is plan
    algebra, so the same function serves both execution models
    unchanged).  Oracle: the SAME SQL as crawl_url_filter — one oracle,
    two execution models, like stream_quality_filter."""
    import tempfile

    from parsel_spark.functions.urlfilter import url_filter_flags

    urls = _synth_messy_urls(spark, sf_dir)
    tmp = tempfile.mkdtemp(prefix="parsel_spark_stream_uf_")
    in_dir = os.path.join(tmp, "in")
    out_dir = os.path.join(tmp, "out")
    urls.write.mode("overwrite").parquet(in_dir)
    stream = spark.readStream.schema("doc_id long, url string").parquet(in_dir)
    block = spark.createDataFrame(
        [(d,) for d in _URLFILTER_BLOCKLIST], "domain string"
    )
    flagged = url_filter_flags(
        stream, block, _URLFILTER_WEIGHTS, _URLFILTER_THRESHOLD
    ).select("doc_id", "url", "host_blocked", "word_score", "scheme_ok", "keep")
    query = (
        flagged.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", os.path.join(tmp, "chk"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return spark.read.parquet(out_dir)


def q_crawl_nofollow_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REP page-level layer (extract_canonical_links
    respect_nofollow=True): per doc, four planted anchors — one
    absolute canonical (kept), one rel="nofollow" (dropped), one
    rel="NOFOLLOW external" (case + multi-token, dropped), one
    rel="author me" relative link (kept and base-resolved) — and every
    5th doc carries <meta name="ROBOTS" content="noindex, NOFOLLOW">
    which suppresses ALL its links.  One fused ArrowEvalPython hop, no
    second pass; the oracle states the survivor URL set in closed
    form."""
    from parsel_spark.functions.udfs import extract_canonical_links

    docs = _read(spark, sf_dir, "documents", spread=True)
    doc_id = F.col("doc_id")
    hostbase = F.concat(
        F.lit("http://docs-"), F.pmod(doc_id, F.lit(N_DOC_HOSTS)), F.lit(".test")
    )
    meta = F.when(
        F.pmod(doc_id, F.lit(5)) == 0,
        F.lit('<meta name="ROBOTS" content="noindex, NOFOLLOW">'),
    ).otherwise(F.lit(""))
    html = F.concat(
        F.lit("<html><head>"), meta, F.lit("</head><body>"),
        F.lit('<a href="'), hostbase, F.lit("/a/"), doc_id, F.lit('">A</a>'),
        F.lit('<a rel="nofollow" href="/b/'), doc_id, F.lit('">B</a>'),
        F.lit('<a rel="NOFOLLOW external" href="/c/'), doc_id,
        F.lit('">C</a>'),
        F.lit('<a rel="author me" href="/d/'), doc_id, F.lit('">D</a>'),
        F.lit("</body></html>"),
    )
    pages = docs.select(
        "doc_id",
        F.concat(hostbase, F.lit("/page/"), doc_id).alias("url"),
        html.alias("html"),
    )
    return pages.select(
        "doc_id",
        F.explode(
            extract_canonical_links("html", "url", respect_nofollow=True)
        ).alias("url"),
    )


def q_crawl_recrawl_due(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adaptive revisit scheduling (frontier.recrawl_due, Cho &
    Garcia-Molina revisit-policy shape): synthesized catalog states
    exercise every branch — never-fetched (doc_id%7==0),
    changed-after-fetch (doc_id%3==0 among the dated), exponential
    backoff with the overflow-safe clamp (unchanged_count 0..11 against
    min=100s/max=10000s), elapsed spanning both sides of the interval.
    now_ts is a pinned literal (the operator takes it as an argument —
    never wall clock), so the oracle replays the integer algebra
    exactly."""
    from parsel_spark.operators.frontier import recrawl_due

    docs = _read(spark, sf_dir, "documents")
    doc_id = F.col("doc_id")
    lf = F.when(
        F.pmod(doc_id, F.lit(7)) != 0,
        (F.lit(900000) + F.pmod(doc_id * 37, F.lit(59900))).cast("long"),
    )
    lc = F.when(
        F.pmod(doc_id, F.lit(5)) != 0,
        F.when(F.pmod(doc_id, F.lit(3)) == 0, lf + 50).otherwise(lf - 50),
    )
    state = docs.select(
        F.concat(
            F.lit("http://docs-"), F.pmod(doc_id, F.lit(N_DOC_HOSTS)),
            F.lit(".test/p/"), doc_id,
        ).alias("url"),
        lf.alias("last_fetch_ts"),
        lc.alias("last_change_ts"),
        F.pmod(doc_id, F.lit(12)).cast("int").alias("unchanged_count"),
    )
    return recrawl_due(
        state, now_ts=960000, min_interval_s=100, max_interval_s=10000
    )


def q_crawl_pagerank_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed centrality feedback path: REAL link extraction
    (the fused parse+select+resolve+canonicalize UDF over the planted
    corpus — same pipeline as crawl_extract_links) → host-level edge
    rollup → 3-round PageRank → frontier priority (dense ordering by
    rounded rank DESC, host ASC — ordering on the ROUNDED value keeps
    the cross-engine sort deterministic).  The oracle composes the
    closed-form target set (_oracle_doc_targets — link extraction's
    own ground truth) with the unrolled power-method replay.  At scale
    the final row_number is one sort of the |hosts| priority table —
    ingest-cadence work, same shape as host_quality_priority."""
    from pyspark.sql import Window

    from parsel_spark.functions.udfs import extract_canonical_links
    from parsel_spark.operators.linkgraph import pagerank

    docs = _read(spark, sf_dir, "documents")
    pages = _doc_pages(docs)
    links = pages.select(
        F.parse_url("url", F.lit("HOST")).alias("src"),
        F.explode(extract_canonical_links("html", "url")).alias("target"),
    )
    edges = links.select(
        "src", F.parse_url("target", F.lit("HOST")).alias("dst")
    ).distinct()
    ranks = pagerank(edges, iters=3, damping=0.85)
    rank_r = F.round("rank", 7)
    w = Window.orderBy(rank_r.desc(), F.col("node").asc())
    return ranks.select(
        F.col("node").alias("host"),
        rank_r.alias("pagerank"),
        F.row_number().over(w).alias("priority"),
    )


def q_crawl_sitemap_lastmod(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sitemap change-signal composition: per-host urlset XML with
    <lastmod> (day = doc_id%28+1) → extract_sitemap_entries (real XML
    parse through the vectorized UDF) → epoch conversion by pure
    string algebra (substring of the ISO date — no timezone anywhere)
    → recrawl_due with last_fetch pinned at day 15: entries modified
    AFTER the fetch force due (change-after-fetch branch), earlier ones
    fall to the exponential backoff (count = doc_id%10 against
    min=1d/max=32d at now=40d — due-by-elapsed iff 2^count ≤ 25 days).
    unchanged_count is re-derived from the EXTRACTED loc (regexp on the
    trailing id), so the whole row proves the XML roundtrip carries
    identity through.  The oracle replays the closed-form loc/lastmod
    values and the full integer revisit algebra."""
    from parsel_spark.functions.udfs import extract_sitemap_entries
    from parsel_spark.operators.frontier import recrawl_due

    docs = _read(spark, sf_dir, "documents", spread=True)
    doc_id = F.col("doc_id")
    host = F.concat(
        F.lit("docs-"), F.pmod(doc_id, F.lit(N_DOC_HOSTS)), F.lit(".test")
    )
    day = F.lpad((F.pmod(doc_id, F.lit(28)) + 1).cast("string"), 2, "0")
    entry = F.concat(
        F.lit("<url><loc>http://"), host, F.lit("/p/"), doc_id,
        F.lit("</loc><lastmod>2024-01-"), day,
        F.lit("</lastmod></url>"),
    )
    per_host = (
        docs.select(host.alias("host"), F.struct(doc_id, entry.alias("e")).alias("s"))
        .groupBy("host")
        .agg(F.array_sort(F.collect_list("s")).alias("p"))
        .select(
            "host",
            F.concat(
                F.lit('<urlset xmlns="http://www.sitemaps.org/schemas/'
                      'sitemap/0.9">'),
                F.array_join(F.transform("p", lambda s: s["e"]), ""),
                F.lit("</urlset>"),
            ).alias("xml"),
        )
    )
    entries = per_host.select(
        F.explode(extract_sitemap_entries("xml")).alias("e")
    )
    state = entries.select(
        F.col("e.loc").alias("url"),
        F.lit(15 * 86400).cast("long").alias("last_fetch_ts"),
        (F.substring("e.lastmod", 9, 2).cast("long") * 86400).alias(
            "last_change_ts"
        ),
        F.pmod(
            F.regexp_extract(F.col("e.loc"), "([0-9]+)$", 1).cast("long"),
            F.lit(10),
        ).cast("int").alias("unchanged_count"),
    )
    return recrawl_due(
        state,
        now_ts=40 * 86400,
        min_interval_s=86400,
        max_interval_s=32 * 86400,
    )


def q_crawl_snapshot_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-crawl CDC (frontier.snapshot_delta): snapshot v1 =
    docs except every 17th (those become 'new' in v2), snapshot v2 =
    docs except every 13th ('gone'), with every 7th doc's text suffixed
    'v2' before digesting ('changed'); everything else 'unchanged' with
    the revisit counter (doc_id%6) incremented.  Digest = md5(text) in
    both engines; the oracle replays the FULL OUTER JOIN + status/
    counter algebra verbatim.  All four statuses provably occur."""
    from parsel_spark.operators.frontier import snapshot_delta

    docs = _read(spark, sf_dir, "documents")
    doc_id = F.col("doc_id")
    url = F.concat(
        F.lit("http://docs-"), F.pmod(doc_id, F.lit(N_DOC_HOSTS)),
        F.lit(".test/p/"), doc_id,
    )
    old = docs.where(F.pmod(doc_id, F.lit(17)) != 0).select(
        url.alias("url"),
        F.md5(F.col("text")).alias("digest"),
        F.pmod(doc_id, F.lit(6)).cast("int").alias("unchanged_count"),
    )
    new = docs.where(F.pmod(doc_id, F.lit(13)) != 0).select(
        url.alias("url"),
        F.md5(
            F.when(
                F.pmod(doc_id, F.lit(7)) == 0,
                F.concat(F.col("text"), F.lit("v2")),
            ).otherwise(F.col("text"))
        ).alias("digest"),
    )
    return snapshot_delta(old, new)


def q_crawl_robots_wildcard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFC 9309 §2.2.3 wildcard rules through the relational
    robots_filter: deny ['/*.php$' (anchored), '/private*', '/d/4*'],
    allow ['/private/ok*'] (longest-match override).  Five synthesized
    path families exercise every rule: anchored-.php hits, /private
    blocks, /private/ok overrides, /public passes, and /d/{doc_id}
    pages are denied exactly when the id starts with '4' — a genuinely
    wildcard-dependent outcome.  The oracle replays the LIKE
    translation (robots.robots_pattern_like) with raw-rule-length
    specificity in ANSI SQL."""
    from parsel_spark.operators.frontier import robots_filter

    docs = _read(spark, sf_dir, "documents")
    doc_id = F.col("doc_id")
    m = F.pmod(doc_id, F.lit(5))
    path = (
        F.when(m == 0, F.concat(F.lit("/index"), doc_id, F.lit(".php")))
        .when(m == 1, F.concat(F.lit("/private/x"), doc_id))
        .when(m == 2, F.concat(F.lit("/private/ok"), doc_id))
        .when(m == 3, F.concat(F.lit("/public/"), doc_id))
        .otherwise(F.concat(F.lit("/d/"), doc_id))
    )
    links = docs.select(
        F.concat(F.lit("http://rules.test"), path).alias("url"),
        doc_id.alias("url_hash"),
    )
    rules = spark.createDataFrame(
        [
            (
                "rules.test",
                ["/private/ok*"],
                ["/*.php$", "/private*", "/d/4*"],
                1.0,
                8,
            )
        ],
        "host string, allow_prefixes array<string>, "
        "deny_prefixes array<string>, crawl_delay double, "
        "max_fetch_per_wave int",
    )
    return robots_filter(links, rules)


def q_crawl_canonical_collapse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rel=canonical capture collapsing (udfs.extract_rel_canonical →
    urlfilter.canonical_collapse, RFC 6596): docs form groups of 5
    whose members declare the group leader as canonical — planted in a
    TRAP form (upper-case host/scheme) so the row proves resolve +
    RFC-3986 canonicalization runs inside the extractor; leaders and
    every 13th doc carry no canonical link (self-identity).  kept_url
    must be the authoritative capture where one exists.  The oracle
    states group identity, capture counts and the keep rule in closed
    form."""
    from parsel_spark.functions.udfs import extract_rel_canonical
    from parsel_spark.functions.urlfilter import canonical_collapse

    docs = _read(spark, sf_dir, "documents")
    doc_id = F.col("doc_id")
    leader = doc_id - F.pmod(doc_id, F.lit(5))
    url = F.concat(
        F.lit("http://docs-"), F.pmod(doc_id, F.lit(N_DOC_HOSTS)),
        F.lit(".test/p/"), doc_id,
    )
    link = F.when(
        (F.pmod(doc_id, F.lit(5)) != 0) & (F.pmod(doc_id, F.lit(13)) != 0),
        F.concat(
            F.lit('<link rel="canonical" href="HTTP://DOCS-'),
            F.pmod(leader, F.lit(N_DOC_HOSTS)),
            F.lit(".TEST/p/"), leader, F.lit('">'),
        ),
    ).otherwise(F.lit(""))
    html = F.concat(
        F.lit("<html><head>"), link,
        F.lit("</head><body>x</body></html>"),
    )
    pages = docs.select(url.alias("url"), html.alias("html"))
    extracted = pages.select(
        "url", extract_rel_canonical("html", "url").alias("canonical")
    )
    return canonical_collapse(extracted)


def q_stream_snapshot_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-ingest CDC (frontier.snapshot_delta_stream): the SAME
    v1/v2 snapshot synthesis as crawl_snapshot_delta, but fresh
    captures arrive as a STREAM and classify against the static
    previous snapshot via a stream-static left join — new / changed /
    unchanged with the same revisit-counter update ('gone' stays with
    the batch full-outer op by design: a stream cannot observe
    absence).  One oracle (the batch algebra restricted to the
    new-capture side), two execution models."""
    import tempfile

    from parsel_spark.operators.frontier import snapshot_delta_stream

    docs = _read(spark, sf_dir, "documents")
    doc_id = F.col("doc_id")
    url = F.concat(
        F.lit("http://docs-"), F.pmod(doc_id, F.lit(N_DOC_HOSTS)),
        F.lit(".test/p/"), doc_id,
    )
    old = docs.where(F.pmod(doc_id, F.lit(17)) != 0).select(
        url.alias("url"),
        F.md5(F.col("text")).alias("digest"),
        F.pmod(doc_id, F.lit(6)).cast("int").alias("unchanged_count"),
    )
    new = docs.where(F.pmod(doc_id, F.lit(13)) != 0).select(
        url.alias("url"),
        F.md5(
            F.when(
                F.pmod(doc_id, F.lit(7)) == 0,
                F.concat(F.col("text"), F.lit("v2")),
            ).otherwise(F.col("text"))
        ).alias("digest"),
    )
    tmp = tempfile.mkdtemp(prefix="parsel_spark_stream_cdc_")
    in_dir = os.path.join(tmp, "in")
    out_dir = os.path.join(tmp, "out")
    new.write.mode("overwrite").parquet(in_dir)
    stream = spark.readStream.schema("url string, digest string").parquet(
        in_dir
    )
    delta = snapshot_delta_stream(stream, old)
    query = (
        delta.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", os.path.join(tmp, "chk"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return spark.read.parquet(out_dir)


def q_crawl_url_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog frontier-cardinality sketch (sketches.hll_cardinality,
    b=10): URLs synthesized with heavy duplication (url = doc_url(doc_id
    % 300) — 300 true distincts across the corpus rows) so the sketch
    provably collapses duplicates.  The oracle replays the ENTIRE
    sketch — 60-bit md5, bucket split, integer bit-length rho,
    register max, the EXACT integer harmonic sum and the small-range
    correction — via the same shared algebra string the unit tests pin
    (`hll_oracle_sql`)."""
    from parsel_spark.operators.sketches import hll_cardinality

    docs = _read(spark, sf_dir, "documents")
    target = F.pmod(F.col("doc_id"), F.lit(300))
    urls = docs.select(
        F.concat(
            F.lit("http://docs-"), F.pmod(target, F.lit(N_DOC_HOSTS)),
            F.lit(".test/p/"), target,
        ).alias("url")
    )
    return hll_cardinality(urls, "url", b=10)


def q_crawl_host_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min heavy-hitter monitor (sketches.cm_sketch/cm_estimate,
    d=4 w=256): host visits synthesized Zipf-ish (50% 'big-a', 30%
    'big-b', the rest spread over 50 cold hosts) — the per-host
    frequency surveillance a frontier runs without a full host
    shuffle.  Output joins the sketch estimate against the EXACT
    count; ``one_sided`` (est >= exact, the count-min guarantee) must
    hold for every host and the oracle replays hashes, counters, the
    min-query and the exact counts."""
    from parsel_spark.operators.sketches import cm_estimate, cm_sketch

    docs = _read(spark, sf_dir, "documents")
    m10 = F.pmod(F.col("doc_id"), F.lit(10))
    host = (
        F.when(m10 < 5, F.lit("big-a"))
        .when(m10 < 8, F.lit("big-b"))
        .otherwise(F.concat(F.lit("h"), F.pmod(F.col("doc_id"), F.lit(50))))
    )
    visits = docs.select(host.alias("host"))
    state = cm_sketch(visits, "host", d=4, w=256)
    keys = visits.distinct()
    est = cm_estimate(state, keys, "host", d=4, w=256)
    exact = visits.groupBy("host").agg(
        F.count(F.lit(1)).alias("exact_count")
    )
    return exact.join(est, "host").select(
        "host",
        "exact_count",
        "est_count",
        (F.col("est_count") >= F.col("exact_count")).alias("one_sided"),
    )


def q_stream_url_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING HyperLogLog: the same duplicated-URL synthesis as
    crawl_url_cardinality arrives as a stream; the register table is a
    streaming groupBy(bucket).max aggregation (complete mode into a
    memory sink — registers are tiny sketch state, ≤ 2^b rows), and the
    batch estimator finishes the final register snapshot.  One oracle
    (the full batch sketch replay), two execution models — the
    continuous frontier-size monitor."""
    import tempfile

    from parsel_spark.operators.sketches import hll_estimate_from_registers

    docs = _read(spark, sf_dir, "documents")
    target = F.pmod(F.col("doc_id"), F.lit(300))
    urls = docs.select(
        F.concat(
            F.lit("http://docs-"), F.pmod(target, F.lit(N_DOC_HOSTS)),
            F.lit(".test/p/"), target,
        ).alias("url")
    )
    tmp = tempfile.mkdtemp(prefix="parsel_spark_stream_hll_")
    in_dir = os.path.join(tmp, "in")
    urls.write.mode("overwrite").parquet(in_dir)
    stream = spark.readStream.schema("url string").parquet(in_dir)
    # hll_registers is pure select/groupBy column algebra — the SAME
    # operator runs on the stream (one implementation, two engines)
    from parsel_spark.operators.sketches import hll_registers

    regs_stream = hll_registers(stream, "url", b=10)
    name = f"hll_regs_{abs(hash(tmp)) % 10**9}"
    query = (
        regs_stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return hll_estimate_from_registers(spark.table(name), b=10)


def q_stream_host_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING count-min: the same Zipf-ish host synthesis as
    crawl_host_frequency arrives as a stream; the counter matrix is a
    streaming groupBy(r, slot).count (complete mode into a memory sink
    — sketch state is ≤ d·w rows), finished by the batch point-query +
    exact-count join.  One oracle, two execution models — the
    continuous heavy-hitter monitor."""
    import tempfile

    from parsel_spark.operators.sketches import cm_estimate, cm_sketch

    docs = _read(spark, sf_dir, "documents")
    m10 = F.pmod(F.col("doc_id"), F.lit(10))
    host = (
        F.when(m10 < 5, F.lit("big-a"))
        .when(m10 < 8, F.lit("big-b"))
        .otherwise(F.concat(F.lit("h"), F.pmod(F.col("doc_id"), F.lit(50))))
    )
    visits = docs.select(host.alias("host"))
    tmp = tempfile.mkdtemp(prefix="parsel_spark_stream_cm_")
    in_dir = os.path.join(tmp, "in")
    visits.write.mode("overwrite").parquet(in_dir)
    stream = spark.readStream.schema("host string").parquet(in_dir)
    # cm_sketch is pure explode/groupBy column algebra — the SAME
    # operator runs on the stream
    state_stream = cm_sketch(stream, "host", d=4, w=256)
    name = f"cm_state_{abs(hash(tmp)) % 10**9}"
    query = (
        state_stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    state = spark.table(name)
    keys = visits.distinct()
    est = cm_estimate(state, keys, "host", d=4, w=256)
    exact = visits.groupBy("host").agg(
        F.count(F.lit(1)).alias("exact_count")
    )
    return exact.join(est, "host").select(
        "host",
        "exact_count",
        "est_count",
        (F.col("est_count") >= F.col("exact_count")).alias("one_sided"),
    )


def q_crawl_idn_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IDN host canonicalization through the vectorized UDF
    (canonical.canonicalize_udf): unicode hosts ('münchen'/'büro'/
    'тест' families, upper-cased every 2nd doc to stack case folding on
    top) map to their RFC 3490 punycode — one crawl identity per
    logical host; plain-ASCII doc urls pass through byte-identical.
    The oracle states the expected punycode literals in closed form
    (the stdlib idna codec implements the same public ToASCII every
    crawler uses)."""
    from parsel_spark.functions.canonical import canonicalize_udf

    docs = _read(spark, sf_dir, "documents", spread=True)
    doc_id = F.col("doc_id")
    m = F.pmod(doc_id, F.lit(4))
    host = (
        F.when(m == 0, F.lit("münchen"))
        .when(m == 1, F.lit("büro"))
        .when(m == 2, F.lit("тест"))
        .otherwise(F.lit("plain"))
    )
    host = F.when(
        F.pmod(doc_id, F.lit(2)) == 0, F.upper(host)
    ).otherwise(host)
    url = F.concat(
        F.lit("http://"), host, F.lit(".example/p/"), doc_id
    )
    return docs.select(
        "doc_id", canonicalize_udf(url).alias("canonical_url")
    )


def q_crawl_host_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Host-level PageRank (linkgraph.pagerank, 3 power-method rounds,
    d=0.85) over a deterministic host graph synthesized from documents:
    each doc emits 3 out-links 'h{doc_id%40}' -> 'h{(7*doc_id +
    doc_id div 7 + 11k) % 40}' (k=0..2; the div term varies dst WITHIN
    a src so hosts get real fan-out), every 11th doc also links to
    'sink' which has NO out-edges — the dangling-mass branch is
    provably exercised.  Edges are distinct (simple graph).  The oracle
    replays the ENTIRE power method via ``pagerank_oracle_cte`` — the
    same unrolled algebra string the unit tests pin against DuckDB —
    so N, out-degrees, dangling mass and all 3 rounds are value-checked.
    Ranks rounded to 7 dp in both engines (summation-order ulps only).
    At 100 TB this composes with extract_links -> host(url) edge
    rollup; see linkgraph.py's scale-shape notes."""
    from parsel_spark.operators.linkgraph import pagerank

    docs = _read(spark, sf_dir, "documents")
    doc_id = F.col("doc_id")
    src = F.concat(F.lit("h"), F.pmod(doc_id, F.lit(40)))
    dsts = F.array(
        *[
            F.concat(
                F.lit("h"),
                F.pmod(
                    doc_id * 7 + F.expr("doc_id div 7") + 11 * k, F.lit(40)
                ),
            )
            for k in (0, 1, 2)
        ]
    )
    fanout = docs.select(
        src.alias("src"), F.explode(dsts).alias("dst")
    )
    sink = docs.where(F.pmod(doc_id, F.lit(11)) == 0).select(
        src.alias("src"), F.lit("sink").alias("dst")
    )
    edges = fanout.unionByName(sink).distinct()
    ranks = pagerank(edges, iters=3, damping=0.85)
    return ranks.select(
        F.col("node").alias("host"), F.round("rank", 7).alias("pagerank")
    )


def q_doc_char_gram_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-trained rare-gram gibberish signal
    (textstats.char_gram_coverage, n=3, min_df=2): every 10th doc gets
    a PLANTED deterministic gibberish suffix (doc-unique trigrams —
    df=1 by construction, so those occurrences provably drag coverage
    below the clean docs').  The oracle replays the ENTIRE computation
    — trigram explode, document-frequency table, threshold, left join,
    per-doc integer fraction — in ANSI SQL."""
    from parsel_spark.functions.textstats import char_gram_coverage

    docs = _read(spark, sf_dir, "documents", spread=True)
    doc_id = F.col("doc_id")
    gib = F.when(
        F.pmod(doc_id, F.lit(10)) == 0,
        F.concat(F.lit(" qz"), doc_id, F.lit("xj"), doc_id, F.lit("vq")),
    ).otherwise(F.lit(""))
    prepared = docs.select(
        "doc_id", F.concat(F.col("text"), gib).alias("text")
    )
    return char_gram_coverage(prepared, "text", "doc_id", n=3, min_df=2)


def q_crawl_strip_tracking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tracking-parameter strip (urlfilter.strip_tracking_params):
    four planted URL shapes per doc — no query / only-tracking /
    tracking-mixed-with-real / real-plus-trailing-tracking — and the
    oracle REPLAYS the split→filter→rejoin algebra with DuckDB's
    independent list_filter + regexp lambda over the same pattern."""
    from parsel_spark.functions.urlfilter import strip_tracking_params

    docs = _read(spark, sf_dir, "documents")
    doc_id = F.col("doc_id")
    base = F.concat(
        F.lit("http://docs-"), F.pmod(doc_id, F.lit(N_DOC_HOSTS)),
        F.lit(".test/p/"), doc_id,
    )
    v = F.pmod(doc_id, F.lit(4))
    url = (
        F.when(v == 0, base)
        .when(v == 1, F.concat(base, F.lit("?utm_source=s"), doc_id))
        .when(v == 2, F.concat(
            base, F.lit("?utm_campaign=c&id="), doc_id, F.lit("&fbclid=f&b=2")
        ))
        .otherwise(F.concat(base, F.lit("?id="), doc_id, F.lit("&gclid=g")))
    )
    return docs.select(
        "doc_id",
        url.alias("url"),
        strip_tracking_params(url).alias("clean_url"),
    )


def q_warc_cdx_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDX capture-index composition (warc.cdx_index): simple
    closed-form pages → WARC records → file-parallel scanner → CDX
    rows.  The md5 digest is a BYTE-FIDELITY witness: it only matches
    if the payload survives the WARC envelope + Content-Length unwrap
    exactly, and DuckDB recomputes it over the independently
    reconstructed html string.  (warc_file, record_offset) are the
    re-fetch address — partition-layout-dependent, so they are checked
    by the offset-addressing pytest, not the SQL oracle."""
    import tempfile

    from parsel_spark.sources.warc import cdx_index, read_warc, warc_record_col

    docs = _read(spark, sf_dir, "documents")
    doc_id = F.col("doc_id")
    hostbase = F.concat(
        F.lit("http://docs-"), F.pmod(doc_id, F.lit(N_DOC_HOSTS)), F.lit(".test")
    )
    html = F.concat(
        F.lit('<html><body><a href="'), hostbase, F.lit("/a/"), doc_id,
        F.lit('">A</a></body></html>'),
    )
    pages = docs.select(
        F.concat(hostbase, F.lit("/page/"), doc_id).alias("url"),
        html.alias("html"),
    )
    tmp = tempfile.mkdtemp(prefix="parsel_spark_cdx_q_")
    warc_dir = os.path.join(tmp, "warc")
    pages.select(warc_record_col().alias("value")).write.mode(
        "overwrite"
    ).text(warc_dir)
    return cdx_index(read_warc(spark, warc_dir)).select(
        "urlkey", "url", "digest", "length"
    )


def q_warc_revisit_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Payload-digest revisit dedup (warc.revisit_dedup, the Heritrix/
    Common-Crawl identical-payload-digest convention) over a
    closed-form CDX: every 5th doc's payload is the SAME boilerplate
    page (one shared digest ⇒ 1 response + the rest revisits), the
    others unique.  warc_file/record_offset are synthesized
    deterministically ('part-{doc_id%8}', doc_id*1000) so the
    smallest-(file,offset) original and every refers_to address are
    exactly replayable — the real-file path (layout-dependent offsets)
    is pinned by the seek-and-read pytest instead."""
    from parsel_spark.sources.warc import revisit_dedup

    docs = _read(spark, sf_dir, "documents")
    doc_id = F.col("doc_id")
    payload = F.when(
        F.pmod(doc_id, F.lit(5)) == 0,
        F.lit("<html><body>boilerplate</body></html>"),
    ).otherwise(F.concat(F.lit("<html><body>page-"), doc_id,
                         F.lit("</body></html>")))
    cdx = docs.select(
        F.concat(F.lit("test,docs-"), F.pmod(doc_id, F.lit(N_DOC_HOSTS)),
                 F.lit(")/page/"), doc_id).alias("urlkey"),
        F.concat(F.lit("http://docs-"), F.pmod(doc_id, F.lit(N_DOC_HOSTS)),
                 F.lit(".test/page/"), doc_id).alias("url"),
        F.md5(payload).alias("digest"),
        F.length(payload).cast("long").alias("length"),
        F.concat(F.lit("part-"), F.pmod(doc_id, F.lit(8))).alias("warc_file"),
        (doc_id * 1000).cast("long").alias("record_offset"),
    )
    return revisit_dedup(cdx)


def q_doc_host_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4/FineWeb-style per-host contribution cap
    (sampling.cap_per_group): at most 10 docs per synthesized host
    (doc_id % 7 → ~71 docs/host at sf0.01, so EVERY host provably
    exceeds the cap and the predicate does real work), winners chosen
    by the deterministic md5 unit hash (seed 5) with doc_id tiebreak —
    the unbiased rerun-stable subset a 100 TB corpus needs, ONE window
    exchange, no driver data.  The oracle replays the exact
    row_number()-over-unit-hash predicate in ANSI SQL."""
    from parsel_spark.functions.sampling import cap_per_group

    docs = _read(spark, sf_dir, "documents")
    host = F.concat(
        F.lit("docs-"), F.pmod(F.col("doc_id"), F.lit(N_DOC_HOSTS)), F.lit(".test")
    )
    capped = cap_per_group(
        docs.select("doc_id", host.alias("host")),
        "host", cap=10, id_col="doc_id", seed=5,
    )
    return capped.select("doc_id", "host")


def q_doc_nfc_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode NFC normalization (unicodenorm.normalize_text): every
    3rd doc gets a PLANTED DECOMPOSED suffix (e + U+0301 combining
    acute — provably changed, one code point shorter after
    composition), every 3rd+1 the PRECOMPOSED é spelling (provably
    unchanged).  Spark runs CPython's unicodedata through an
    Arrow-batched pandas UDF; the oracle runs DuckDB's utf8proc
    ``nfc_normalize`` — two independent UAX #15 implementations
    agreeing on bytes, flags and code-point counts."""
    from parsel_spark.functions.unicodenorm import normalize_text

    docs = _read(spark, sf_dir, "documents")
    doc_id = F.col("doc_id")
    text = F.col("text")
    planted = (
        F.when(
            F.pmod(doc_id, F.lit(3)) == 0,
            F.concat(text, F.lit(" cafe"), F.lit("e\u0301")),  # decomposed
        )
        .when(
            F.pmod(doc_id, F.lit(3)) == 1,
            F.concat(text, F.lit(" caf"), F.lit("\u00e9")),  # precomposed
        )
        .otherwise(text)
    )
    return normalize_text(docs.select("doc_id", planted.alias("text")))


def q_stream_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING stateful exact dedup (stream_crawl.dedup_stream):
    documents flow readStream → md5-keyed GroupState first-sighting
    gate → parquet sink.  Input is ONE parquet file so the whole corpus
    is exactly one trigger, where first-wins semantics coincide with
    batch ``exact_dedup`` — the oracle is the SAME GROUP BY md5(text)
    SQL as doc_exact_dedup plus the hash column, so the custom stateful
    operator sits under the hard value gate rather than the weaker
    rows-only check.  Cross-trigger suppression is pinned separately by
    a two-trigger unit test."""
    import tempfile

    from parsel_spark.streaming.stream_crawl import dedup_stream

    docs = _read(spark, sf_dir, "documents")
    tmp = tempfile.mkdtemp(prefix="parsel_spark_stream_dd_")
    in_dir = os.path.join(tmp, "in")
    out_dir = os.path.join(tmp, "out")
    docs.select("doc_id", "text").coalesce(1).write.mode("overwrite").parquet(
        in_dir
    )
    stream = dedup_stream(
        spark.readStream.schema("doc_id long, text string").parquet(in_dir)
    )
    query = (
        stream.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", os.path.join(tmp, "chk"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return spark.read.parquet(out_dir).select("text_md5", "doc_id", "dup_count")


def q_crawl_forget_seen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END CrawlRun + cuckoo ``forget()`` under the hard oracle
    gate: initialize from the first N_SEED_DOCS doc urls (politeness
    non-binding by construction: ≤2 seeds/host < k), run ONE wave over
    the planted-link corpus, then forget every seed url with
    doc_id % 3 == 0 (the recrawl-TTL shape — requires the deletable
    cuckoo backend).  The committed seen table then has a CLOSED FORM:
    (seed urls ∪ wave-1 planted targets) minus the forgotten urls —
    the same ground truth crawl_frontier_wave1's oracle states, so
    snapshot commit / append-delta / forget-rewrite machinery is
    value-checked, not just pytest-checked."""
    import tempfile

    from parsel_spark.plans.crawl import CrawlRun
    from parsel_spark.sources.snapshots import SnapshotCatalog

    docs = _read(spark, sf_dir, "documents")
    seeds = docs.filter(F.col("doc_id") < N_SEED_DOCS).select(
        _doc_url(F.col("doc_id")).alias("url"),
        (F.lit(1.0) + F.col("doc_id").cast("double") / 100).alias("priority"),
        F.col("doc_id").cast("long").alias("seq"),
    )
    pages = _doc_pages(docs)
    hosts = [f"docs-{i}.test" for i in range(N_DOC_HOSTS)]
    robots = spark.createDataFrame(
        [(h, [], [], 1.0, 8) for h in hosts],
        "host string, deny_prefixes array<string>, "
        "allow_prefixes array<string>, crawl_delay double, "
        "max_fetch_per_wave int",
    )
    tmp = tempfile.mkdtemp(prefix="parsel_spark_forget_q_")
    run = CrawlRun(
        spark,
        SnapshotCatalog(tmp),
        pages.select("url", "html"),
        robots,
        num_shards=16,
        filter_kind="cuckoo",
    )
    run.initialize(seeds)
    run.run(1)
    victims = docs.filter(
        (F.col("doc_id") < N_SEED_DOCS) & (F.pmod("doc_id", F.lit(3)) == 0)
    ).select(_doc_url(F.col("doc_id")).alias("url"))
    run.forget(victims)
    return run.catalog.read_table(spark, "seen").select("url")


def q_stream_politeness_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming token-bucket politeness as a VALUE-LEVEL oracle row:
    deterministic per-host frontier candidates (closed-form priority /
    crawl_delay / max_fetch derived from doc_id) flow through ONE
    availableNow trigger of ``politeness_stream``
    (applyInPandasWithState GroupState token bucket); the DuckDB oracle
    replays the admit math in closed form — rank by (priority DESC,
    seq), admit k = min(floor(min(CAP, init + 1/delay)), max_fetch,
    |candidates|, MAX_FETCH_CAP).  Input is written as ONE parquet file
    so the whole corpus is exactly one trigger (one refill)."""
    import tempfile

    from parsel_spark.streaming.stream_crawl import politeness_stream

    docs = _read(spark, sf_dir, "documents")
    doc_id = F.col("doc_id")
    pages = docs.select(
        F.concat(F.lit("docs-"), F.pmod(doc_id, F.lit(N_DOC_HOSTS)), F.lit(".test"))
        .alias("host"),
        _doc_url(doc_id).alias("url"),
        (doc_id * 13 % 5).cast("double").alias("priority"),
        doc_id.alias("seq"),
        (F.pmod(F.pmod(doc_id, F.lit(N_DOC_HOSTS)), F.lit(3)) + 1)
        .cast("double")
        .alias("crawl_delay"),
        (F.pmod(F.pmod(doc_id, F.lit(N_DOC_HOSTS)), F.lit(4)) + 1)
        .cast("int")
        .alias("max_fetch_per_wave"),
    )
    tmp = tempfile.mkdtemp(prefix="parsel_spark_polite_q_")
    in_dir = os.path.join(tmp, "in")
    out_dir = os.path.join(tmp, "out")
    pages.coalesce(1).write.mode("overwrite").parquet(in_dir)
    stream = politeness_stream(
        spark.readStream.schema(
            "host string, url string, priority double, seq long, "
            "crawl_delay double, max_fetch_per_wave int"
        ).parquet(in_dir)
    )
    query = (
        stream.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", os.path.join(tmp, "chk"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return spark.read.parquet(out_dir)


def q_warc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SOURCE-FORMAT roundtrip under the hard gate: the planted-link
    corpus serializes into spec-shaped WARC/1.0 response records
    (JVM-side ``warc_record_col``), lands as .warc text files, comes
    back through the file-parallel ``read_warc`` scanner
    (Content-Length-delimited — payloads containing WARC-looking text
    cannot break records), and the fused extract UDF must recover
    exactly the closed-form planted targets (doc_id re-derived from
    each record's WARC-Target-URI)."""
    import tempfile

    from parsel_spark.functions.udfs import extract_canonical_links
    from parsel_spark.sources.warc import read_warc, warc_record_col

    docs = _read(spark, sf_dir, "documents")
    pages = _doc_pages(docs)
    tmp = tempfile.mkdtemp(prefix="parsel_spark_warc_q_")
    warc_dir = os.path.join(tmp, "warc")
    pages.select(warc_record_col().alias("value")).write.mode(
        "overwrite"
    ).text(warc_dir)
    recovered = read_warc(spark, warc_dir)
    return recovered.select(
        F.element_at(F.split("url", "/d/"), -1).cast("long").alias("doc_id"),
        F.explode(extract_canonical_links("html", "url")).alias("url"),
    )


def q_warc_main_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full crawl→LLM-corpus data path in ONE row: corpus → WARC
    files (mandatory-header records) → file-parallel scanner →
    main-text extraction (the planted 3-link nav cluster must drop, the
    caption unit must survive) → BPE-ish token counting.  The oracle
    states the surviving text and its token count in closed form."""
    import tempfile

    from parsel_spark.functions.maintext import main_text
    from parsel_spark.functions.textstats import bpe_token_count
    from parsel_spark.sources.warc import read_warc, warc_record_col

    docs = _read(spark, sf_dir, "documents", spread=True)
    pages = _doc_pages(docs)
    tmp = tempfile.mkdtemp(prefix="parsel_spark_warc_mt_")
    warc_dir = os.path.join(tmp, "warc")
    pages.select(warc_record_col().alias("value")).write.mode(
        "overwrite"
    ).text(warc_dir)
    recovered = read_warc(spark, warc_dir)
    with_text = recovered.select(
        F.element_at(F.split("url", "/d/"), -1).cast("long").alias("doc_id"),
        main_text("html").alias("main_text"),
    )
    return with_text.select(
        "doc_id",
        "main_text",
        bpe_token_count("main_text").cast("long").alias("n_tokens"),
    )


def q_stream_crawl_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed STREAMING crawl pipeline across a micro-run handoff:
    stage 1 streams the planted-link corpus through the fused
    extract/canonicalize UDF + watermarked dedup into a parquet sink;
    stage 2 streams that sink (coalesced to one file = one trigger ⇒
    one refill) through the applyInPandasWithState politeness gate.
    The oracle states the full composition in closed form: the DISTINCT
    planted targets per host, ranked by url, admitted while
    rank ≤ floor(min(CAP, 1 + 1/delay)) = 2.

    SCALE NOTE: the coalesce(1) exists ONLY to pin the trigger count so
    the refill arithmetic is closed-form — the batch crawl loop
    (plans/crawl.py) is the scale path; do not imitate the single-file
    handoff at production volume."""
    import tempfile

    from parsel_spark.streaming.stream_crawl import (
        extract_link_stream,
        politeness_stream,
        read_page_stream,
    )

    docs = _read(spark, sf_dir, "documents")
    pages = _doc_pages(docs).select(
        "url",
        F.parse_url("url", F.lit("HOST")).alias("host"),
        "html",
        F.lit("2026-01-01 00:00:00").cast("timestamp").alias("fetched_at"),
    )
    tmp = tempfile.mkdtemp(prefix="parsel_spark_stream_pipe_")
    in_dir = os.path.join(tmp, "in")
    links_dir = os.path.join(tmp, "links")
    gate_in = os.path.join(tmp, "gate_in")
    out_dir = os.path.join(tmp, "out")
    pages.write.mode("overwrite").parquet(in_dir)

    stage1 = (
        extract_link_stream(read_page_stream(spark, in_dir))
        .select("url")
        .writeStream.format("parquet")
        .option("path", links_dir)
        .option("checkpointLocation", os.path.join(tmp, "chk1"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    stage1.awaitTermination()
    # micro-run handoff: batch-compact the links sink to ONE file so the
    # gate sees exactly one trigger (the batch loop's wave semantics)
    spark.read.parquet(links_dir).select(
        F.parse_url("url", F.lit("HOST")).alias("host"), "url"
    ).coalesce(1).write.mode("overwrite").parquet(gate_in)
    stage2 = (
        politeness_stream(
            spark.readStream.schema("host string, url string").parquet(gate_in)
        )
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", os.path.join(tmp, "chk2"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    stage2.awaitTermination()
    return spark.read.parquet(out_dir)


def q_crawl_url_hash_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """murmur3 sharding + xxhash64 keying of canonical URLs (the
    seen-set key path); oracle checks shard balance via counts."""
    docs = _read(spark, sf_dir, "documents")
    urls = docs.select(_doc_url(F.col("doc_id")).alias("url"))
    return (
        urls.select(F.pmod(F.hash("url"), F.lit(32)).cast("long").alias("shard_id"))
        .groupBy("shard_id")
        .agg(F.count(F.lit(1)).alias("n_urls"))
    )


def _synth_messy_urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic URL corpus with planted curation cases, one per
    doc: ad-network hosts on blocked domains (incl. a deep subdomain of
    a mid-level blocklist entry), a high-score word-bearing query
    string, an under-threshold word hit, a non-http scheme, and the
    plain corpus URL.  CASE order resolves modulus overlaps identically
    in Spark and the SQL oracle."""
    docs = _read(spark, sf_dir, "documents")
    doc_id = F.col("doc_id")
    base_host = F.concat(F.lit("docs-"), F.pmod(doc_id, F.lit(N_DOC_HOSTS)))
    tail = F.concat(F.lit("/d/"), doc_id)
    url = (
        F.when(
            F.pmod(doc_id, F.lit(7)) == 0,
            F.concat(
                F.lit("http://ads.tracker"),
                F.pmod(doc_id, F.lit(3)),
                F.lit(".test"),
                tail,
            ),
        )
        .when(
            F.pmod(doc_id, F.lit(13)) == 0,
            F.concat(F.lit("http://deep.sub.tracker1.test"), tail),
        )
        .when(
            F.pmod(doc_id, F.lit(5)) == 0,
            F.concat(
                F.lit("http://"),
                base_host,
                F.lit(".test"),
                tail,
                F.lit("?ref=casino-poker-night"),
            ),
        )
        .when(
            F.pmod(doc_id, F.lit(11)) == 0,
            F.concat(F.lit("ftp://"), base_host, F.lit(".test"), tail),
        )
        .when(
            F.pmod(doc_id, F.lit(17)) == 0,
            F.concat(
                F.lit("http://"), base_host, F.lit(".test"), tail, F.lit("?q=casino")
            ),
        )
        .otherwise(F.concat(F.lit("http://"), base_host, F.lit(".test"), tail))
    )
    return docs.select("doc_id", url.alias("url"))


_URLFILTER_BLOCKLIST = ["tracker0.test", "tracker2.test", "sub.tracker1.test"]
_URLFILTER_WEIGHTS = {"casino": 2, "poker": 2, "night": 1}
_URLFILTER_THRESHOLD = 4


def q_crawl_url_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RefinedWeb-style URL curation (urlfilter.url_filter_flags):
    domain-blocklist verdicts via ≤4 map-side suffix keys probed
    through broadcast joins (ads.tracker0.test blocks as a SUBDOMAIN of
    a blocked domain; deep.sub.tracker1.test via a mid-level entry;
    ads.tracker1.test provably passes), a weighted URL-word score
    (casino-poker-night = 5 blocks at threshold 4, lone casino = 2
    keeps), and an http/https scheme gate.  The oracle replays suffix
    generation, list-intersection blocking and the word CASE-sum in
    ANSI SQL."""
    from parsel_spark.functions.urlfilter import url_filter_flags

    urls = _synth_messy_urls(spark, sf_dir)
    block = spark.createDataFrame(
        [(d,) for d in _URLFILTER_BLOCKLIST], "domain string"
    )
    return url_filter_flags(
        urls, block, _URLFILTER_WEIGHTS, _URLFILTER_THRESHOLD
    ).select(
        "doc_id", "url", "host_blocked", "word_score", "scheme_ok", "keep"
    )


def q_crawl_surt_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURT sort keys (urlfilter.surt_key) over URLs with planted
    messiness — uppercase www hosts, explicit ports, query strings:
    the CDX-convention key (reversed comma-joined host labels + ')' +
    lowercased path + '?query'; scheme/port dropped, leading www
    stripped) that range-partitions a 100 TB URL index by registered
    domain.  The oracle rebuilds the key with regex host/path/query
    extraction + list_reverse in ANSI SQL — two independent
    implementations of the transform."""
    from parsel_spark.functions.urlfilter import surt_key

    docs = _read(spark, sf_dir, "documents")
    doc_id = F.col("doc_id")
    m = F.pmod(doc_id, F.lit(N_DOC_HOSTS))
    tail = F.concat(F.lit("/D/"), doc_id)
    url = (
        F.when(
            F.pmod(doc_id, F.lit(4)) == 0,
            F.concat(F.lit("http://WWW.Docs-"), m, F.lit(".Test"), tail),
        )
        .when(
            F.pmod(doc_id, F.lit(9)) == 0,
            F.concat(
                F.lit("http://docs-"),
                m,
                F.lit(".test:8080"),
                tail,
                F.lit("?x=1&y=2"),
            ),
        )
        .otherwise(F.concat(F.lit("http://docs-"), m, F.lit(".test"), tail))
    )
    urls = docs.select("doc_id", url.alias("url"))
    return urls.select("doc_id", "url", surt_key("url").alias("surt"))


def _synth_image_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic image table in the BASELINE input_hint shape
    (image_id, phash — the metadata columns the dedup path touches),
    derived from ``documents`` with the phash as a closed-form 62-bit
    mix of doc_id, plus a planted 2-bit-flipped twin for every 10th
    doc.  The same arithmetic is stated in ANSI SQL for the oracle."""
    docs = _read(spark, sf_dir, "documents")
    doc_id = F.col("doc_id")
    h1 = (doc_id * F.lit(2654435761) + F.lit(1013904223)) % F.lit(2147483648)
    h2 = (doc_id * F.lit(2246822519) + F.lit(374761393)) % F.lit(2147483648)
    phash = (h1 * F.lit(2147483648) + h2).cast("long")
    base = docs.select(
        F.concat(F.lit("img-"), doc_id).alias("image_id"),
        phash.alias("phash"),
        doc_id,
    )
    twins = base.filter(F.pmod(F.col("doc_id"), F.lit(10)) == 0).select(
        F.concat(F.col("image_id"), F.lit("-dup")).alias("image_id"),
        F.col("phash").bitwiseXOR(F.lit(3)).alias("phash"),
        F.col("doc_id"),
    )
    return base.unionByName(twins).select("image_id", "phash")


def q_img_phash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash near-dup pairs over the image table via banded
    LSH blocking (multimodal.phash_near_dup_pairs); the planted 2-bit
    twins are the guaranteed recall set."""
    from parsel_spark.operators.multimodal import phash_near_dup_pairs

    return phash_near_dup_pairs(_synth_image_table(spark, sf_dir), max_hamming=3)


def _synth_image_caption_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic image+caption table in the BASELINE input_hint
    metadata shape (image_id, w, h, fmt, caption), derived from
    ``documents``: dimensions are closed-form integer mixes of doc_id
    spanning 16..2063 px (so undersized and extreme-aspect rows occur
    naturally), the caption is the document's first 180 chars, with
    planted failures — every 19th doc a too-short caption, every 23rd a
    one-word caption.  The same arithmetic is stated in ANSI SQL for
    the oracle.  Payload ``bytes`` is omitted here by design: the
    curation gate touches only metadata columns, which is exactly the
    100 TB point (the binary column never leaves the scan)."""
    docs = _read(spark, sf_dir, "documents")
    doc_id = F.col("doc_id")
    w = F.pmod(doc_id * F.lit(40503) + F.lit(17), F.lit(2048)) + F.lit(16)
    h = F.pmod(doc_id * F.lit(69069) + F.lit(5), F.lit(2048)) + F.lit(16)
    caption = (
        F.when(F.pmod(doc_id, F.lit(19)) == 0, F.lit(" img "))
        .when(F.pmod(doc_id, F.lit(23)) == 0, F.lit("photograph"))
        .otherwise(F.substring(F.col("text"), 1, 180))
    )
    fmt = F.element_at(
        F.array(F.lit("png"), F.lit("bmp"), F.lit("jpeg")),
        (F.pmod(doc_id, F.lit(3)) + F.lit(1)).cast("int"),
    )
    return docs.select(
        F.concat(F.lit("img-"), doc_id).alias("image_id"),
        w.cast("long").alias("w"),
        h.cast("long").alias("h"),
        fmt.alias("fmt"),
        caption.alias("caption"),
    )


def q_emb_semantic_decontam(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEMANTIC decontamination (decontam.semantic_decontaminate, LSH
    scale path): eval set = every 25th embedding, so those rows are
    guaranteed planted positives (self-similarity 1.0 in their own
    bucket) while the rest are flagged only if a genuine
    above-threshold neighbor shares their bucket.  Same deterministic
    hyperplane family as the kNN/near-dup rows; the oracle embeds the
    planes as literals and replays bucket → candidate join → rounded
    max-cosine → threshold in full."""
    from parsel_spark.operators.decontam import semantic_decontaminate

    emb = _read(spark, sf_dir, "embeddings", spread=True)
    eval_set = emb.filter(F.pmod(F.col("vec_id"), F.lit(25)) == 0)
    return semantic_decontaminate(
        emb, eval_set, threshold=0.30, method="lsh",
        n_planes=6, dim=64, seed=42, round_to=4,
    )


def q_emb_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (similarity.semantic_dedup, Abbas et al. 2023 lineage):
    within-cluster semantic near-duplicate pruning over the SAME
    catalog-persisted IVF coarse quantizer the ANN probe path uses
    (one ingest-time index, two consumers).  A vector is dropped when
    any lower-id vector in its k-means cell has rounded cosine >= 0.4
    (16 of 500 at sf0.01 — the synthetic corpus genuinely exercises
    the drop branch).  The oracle replays the ENTIRE computation:
    both Lloyd iterations (decimal-exact centroid sums), the final
    argmin assignment, the within-cell pair join, and the
    dominated-by-lower-id rule."""
    from parsel_spark.operators.similarity import semantic_dedup

    emb = _read(spark, sf_dir, "embeddings", spread=True)
    assigned, _ = _ivf_index_for(spark, sf_dir)
    return semantic_dedup(emb, assigned, threshold=0.4, round_to=4)


def q_emb_top_component(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leading principal direction (similarity.top_component, 3 power
    rounds): the PCA-for-ANN preprocessing primitive.  Determinism
    machinery: sequential-fold projections, DECIMAL(30,15)
    order-independent accumulation (the ivf_index trick), per-round
    renormalize+round.  The oracle unrolls all 3 rounds in ANSI SQL —
    projections, Gram-vector products, norms and roundings all
    value-checked."""
    from parsel_spark.operators.similarity import top_component

    return top_component(_read(spark, sf_dir, "embeddings"), iters=3)


def q_emb_knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN graph construction (similarity.knn_graph, k=3): every
    vector's ranked top-3 among its hyperplane-LSH bucket candidates —
    the batch primitive graph-ANN builds start from, bucketed, never
    all-pairs.  Same deterministic plane family as the other LSH rows;
    the oracle embeds the plane literals and replays bucket → pair
    join → rounded cosine → per-vector ranked cut."""
    from parsel_spark.operators.similarity import knn_graph

    return knn_graph(_read(spark, sf_dir, "embeddings", spread=True), k=3)


def q_emb_pca_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composition: power-iteration component → per-vector projection
    coordinate (the dimension-reduction step an ANN index runs before
    quantization — project once at ingest, bucket/sort by the coord).
    The learned direction is broadcast-cross-joined (1 row) and the
    projection is the SAME sequential fold as everywhere else; the
    oracle chains the full 3-round power replay into the per-vector
    dot.  Coordinates rounded to 6."""
    from parsel_spark.operators.similarity import top_component

    emb = _read(spark, sf_dir, "embeddings")
    comp = (
        top_component(emb, iters=3)
        .groupBy()
        .agg(F.array_sort(F.collect_list(F.struct("dim", "component"))).alias("p"))
        .select(F.transform("p", lambda s: s["component"]).alias("c"))
    )
    projected = emb.crossJoin(F.broadcast(comp)).select(
        "vec_id",
        F.round(
            F.aggregate(
                F.zip_with(
                    "embedding", "c", lambda e, w: e.cast("double") * w
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ),
            6,
        ).alias("coord"),
    )
    return projected


def q_img_pair_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image–caption pair MINING (udfs.extract_image_pairs — the LAION
    og:/alt recipe): planted pages carry og:image + og:title (every
    13th doc drops the title, exercising the og:description fallback)
    and an <img> whose src is a TRAP form (upper-case host — proves
    canonicalization runs) with alt text; every 7th doc's alt is blank
    and provably yields no alt pair.  The oracle states the mined
    (doc_id, image_url, caption, source) rows in closed form."""
    from parsel_spark.functions.udfs import extract_image_pairs

    docs = _read(spark, sf_dir, "documents")
    doc_id = F.col("doc_id")
    hostn = F.pmod(doc_id, F.lit(N_DOC_HOSTS))
    og_title = F.when(
        F.pmod(doc_id, F.lit(13)) != 0,
        F.concat(
            F.lit('<meta property="og:title" content="Caption '),
            doc_id, F.lit('">'),
        ),
    ).otherwise(F.lit(""))
    alt = F.when(
        F.pmod(doc_id, F.lit(7)) != 0, F.concat(F.lit("Alt "), doc_id)
    ).otherwise(F.lit(" "))
    html = F.concat(
        F.lit('<html><head><meta property="og:image" content="/img/'),
        doc_id, F.lit('.jpg">'), og_title,
        F.lit('<meta property="og:description" content="Desc '),
        doc_id, F.lit('"></head><body><img src="HTTP://DOCS-'),
        hostn, F.lit(".TEST/t/"), doc_id, F.lit('" alt="'), alt,
        F.lit('"></body></html>'),
    )
    pages = docs.select(
        "doc_id", _doc_url(doc_id).alias("url"), html.alias("html")
    )
    return pages.select(
        "doc_id", F.explode(extract_image_pairs("html", "url")).alias("p")
    ).select(
        "doc_id",
        F.col("p.image_url").alias("image_url"),
        F.col("p.caption").alias("caption"),
        F.col("p.source").alias("source"),
    )


def q_img_caption_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Caption-level image dedup (multimodal.caption_dedup): the
    planted repeated captions (every 19th doc ' img ', every 23rd
    'photograph' — note the normalization merges ' img ' with any
    'IMG'-cased variant) form large groups whose best-resolution
    member (integer-area argmax, image_id ASC tiebreak) is the kept
    rep; unique captions are their own reps.  The oracle replays key,
    group count and the row_number argmax in ANSI SQL."""
    from parsel_spark.operators.multimodal import caption_dedup

    imgs = _synth_image_caption_table(spark, sf_dir)
    return caption_dedup(imgs).select(
        "image_id", "caption_key", "group_n", "is_rep"
    )


def q_img_aspect_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aspect-ratio bucketing (multimodal.aspect_bucket): every image
    snaps to the nearest ladder aspect via the INTEGER-EXACT argmin
    (|w/h - bw/bh| compared through cross-multiplication — no float
    ratios anywhere), ties to the earliest ladder entry.  Per-image
    assignment over the input_hint-shaped table; the oracle replays the
    same least()+CASE integer algebra in ANSI SQL."""
    from parsel_spark.operators.multimodal import aspect_bucket

    imgs = _synth_image_caption_table(spark, sf_dir)
    return imgs.select(
        "image_id", "w", "h", aspect_bucket("w", "h").alias("bucket")
    )


def q_img_bucket_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch assembly after aspect bucketing (multimodal.bucket_batches,
    batch_size=8, seed=3): each batch comes from ONE aspect bucket,
    members ordered by the md5 unit hash (deterministic shuffle),
    trailing partial batches dropped — the SDXL-lineage step that turns
    the bucketed corpus into uniform training batches.  The oracle
    replays the integer-exact ladder argmin AND the per-bucket
    row_number/count window cut."""
    from parsel_spark.operators.multimodal import aspect_bucket, bucket_batches

    imgs = _synth_image_caption_table(spark, sf_dir)
    bucketed = imgs.select(
        "image_id", aspect_bucket("w", "h").alias("bucket")
    )
    return bucket_batches(bucketed, batch_size=8, seed=3)


def q_img_caption_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAION-lineage image-text pair curation gate
    (multimodal.caption_pair_quality_flags) over the input_hint-shaped
    table: dimension floor, integer aspect-ratio ceiling, caption
    char-length band, caption word floor — MAP-ONLY, every rule value
    replayed by the oracle.  The planted short/one-word captions and
    the naturally-occurring tiny/elongated dimensions exercise each
    gate's failure path at every SF."""
    from parsel_spark.operators.multimodal import caption_pair_quality_flags

    imgs = _synth_image_caption_table(spark, sf_dir)
    return imgs.select("image_id", "w", "h", *caption_pair_quality_flags())


def q_img_training_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE IMAGE-AXIS CAPSTONE — the full input_hint→training-batches
    pipeline in ONE chained plan: curation gate (dimension floor /
    aspect ceiling / caption band) → caption-level dedup (keep the
    best-resolution rep per normalized caption) → aspect-ratio ladder
    assignment → uniform batch assembly (unit-hash order, partial
    batches dropped).  Every stage is an independently-proven operator;
    here the COMPOSITION is the checked value: the oracle chains gate
    CTEs → dedup window → ladder argmin → batch cut and must agree on
    the final (image_id, bucket, batch_id, slot) set exactly.  All
    metadata-column algebra — at 10^10 pairs the bytes column never
    leaves the scan until batch addresses exist."""
    from parsel_spark.operators.multimodal import (
        aspect_bucket,
        bucket_batches,
        caption_dedup,
        caption_pair_quality_flags,
    )

    imgs = _synth_image_caption_table(spark, sf_dir)
    gated = imgs.select(
        "image_id", "w", "h", "caption", *caption_pair_quality_flags()
    ).where("keep")
    deduped = caption_dedup(gated).where("is_rep")
    bucketed = deduped.select(
        "image_id", aspect_bucket("w", "h").alias("bucket")
    )
    return bucket_batches(bucketed, batch_size=8, seed=11)


def q_img_phash_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The IMAGE dedup pipeline end-to-end: phash near-dup pairs
    (banded-LSH blocking) → connected components (dup_clusters) →
    best-RESOLUTION representative per cluster (the public
    image-corpus recipe: among perceptual duplicates keep the largest
    copy).  Resolution is recomputed closed-form from the digits in
    image_id — the planted ``-dup`` twins get +64 px width so the twin,
    not the original, is provably the kept representative.  Integer
    area argmax via row_number(area DESC, image_id ASC); the oracle
    replays the pair graph, closes it with a recursive CTE, and picks
    with the same window."""
    from pyspark.sql import Window

    from parsel_spark.operators.dedup import dup_clusters
    from parsel_spark.operators.multimodal import phash_near_dup_pairs

    imgs = _synth_image_table(spark, sf_dir)
    pairs = phash_near_dup_pairs(imgs, max_hamming=3).select(
        F.col("img_a").alias("doc_a"), F.col("img_b").alias("doc_b")
    )
    clusters = dup_clusters(pairs, imgs, id_col="image_id")
    n = F.regexp_extract("image_id", "([0-9]+)", 1).cast("long")
    is_dup = F.col("image_id").endswith("-dup")
    w = (
        F.pmod(n * F.lit(40503) + F.lit(17), F.lit(2048))
        + F.lit(16)
        + F.when(is_dup, F.lit(64)).otherwise(F.lit(0))
    )
    h = F.pmod(n * F.lit(69069) + F.lit(5), F.lit(2048)) + F.lit(16)
    sized = clusters.select(
        "image_id", "cluster_id", (w * h).cast("long").alias("area")
    )
    win = Window.partitionBy("cluster_id").orderBy(
        F.col("area").desc(), F.col("image_id").asc()
    )
    return sized.select(
        "image_id",
        "cluster_id",
        "area",
        (F.row_number().over(win) == 1).alias("is_rep"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "q_pricing_summary": q_pricing_summary,
        "q_top_orders_per_customer": q_top_orders_per_customer,
        "q_customers_without_orders": q_customers_without_orders,
        "q_revenue_by_nation": q_revenue_by_nation,
        "q_event_type_stats": q_event_type_stats,
        "q_event_sessionize": q_event_sessionize,
        "doc_exact_dedup": q_doc_exact_dedup,
        "doc_jaccard_pairs_blocked_compat": q_doc_jaccard_pairs,
        "doc_token_stats": q_doc_token_stats,
        "doc_bpe_token_stats": q_doc_bpe_token_stats,
        "doc_quality": q_doc_quality,
        "doc_lang_id": q_doc_lang_id,
        "doc_fingerprint": q_doc_fingerprint,
        "doc_minhash_pairs": q_doc_minhash_pairs,
        "doc_dup_clusters": q_doc_dup_clusters,
        "doc_cluster_representatives": q_doc_cluster_representatives,
        "doc_sample_hash": q_doc_sample_hash,
        "doc_sample_strata": q_doc_sample_strata,
        "doc_train_split": q_doc_train_split,
        "doc_pack_sequences": q_doc_pack_sequences,
        "doc_pack_greedy": q_doc_pack_greedy,
        "doc_redact_pii": q_doc_redact_pii,
        "doc_simhash_pairs": q_doc_simhash_pairs,
        "doc_jaccard_lsh_pairs": q_doc_jaccard_lsh_pairs,
        "doc_repeated_ngram_spans": q_doc_repeated_ngram_spans,
        "doc_ngram_dedup": q_doc_ngram_dedup,
        "doc_line_dedup": q_doc_line_dedup,
        "doc_decontaminate": q_doc_decontaminate,
        "doc_main_text": q_doc_main_text,
        "doc_clean_token_stats": q_doc_clean_token_stats,
        "doc_top_ngram_stats": q_doc_top_ngram_stats,
        "doc_dup_ngram_coverage": q_doc_dup_ngram_coverage,
        "crawl_sitemap_extract": q_crawl_sitemap_extract,
        "crawl_anchor_text": q_crawl_anchor_text,
        "selector_exslt_dates": q_selector_exslt_dates,
        "doc_quality_filter": q_doc_quality_filter,
        "crawl_host_priority": q_crawl_host_priority,
        "img_aspect_buckets": q_img_aspect_buckets,
        "stream_quality_filter": q_stream_quality_filter,
        "doc_source_mixture": q_doc_source_mixture,
        "doc_mixture_rates": q_doc_mixture_rates,
        "doc_mixture_sample": q_doc_mixture_sample,
        "emb_near_dup_lsh": q_emb_near_dup_lsh,
        "emb_knn_bruteforce": q_emb_knn_bruteforce,
        "emb_knn_lsh": q_emb_knn_lsh,
        "emb_knn_ivf": q_emb_knn_ivf,
        "emb_near_dup_pairs_blocked_compat": q_emb_near_dup_pairs,
        "emb_norms": q_emb_norms,
        "emb_quantize_int8": q_emb_quantize_int8,
        "emb_knn_int8": q_emb_knn_int8,
        "emb_label_centroid_dims": q_emb_label_centroid_dims,
        "crawl_extract_links": q_crawl_extract_links,
        "crawl_frontier_wave1": q_crawl_frontier_wave1,
        "selector_caption_xpath": q_selector_caption_xpath,
        "selector_re_extract": q_selector_re_extract,
        "selector_drop_rewrite": q_selector_drop_rewrite,
        "selector_jmespath": q_selector_jmespath,
        "crawl_url_hash_shards": q_crawl_url_hash_shards,
        "crawl_url_filter": q_crawl_url_filter,
        "crawl_surt_keys": q_crawl_surt_keys,
        "crawl_forget_seen": q_crawl_forget_seen,
        "warc_roundtrip": q_warc_roundtrip,
        "warc_main_text": q_warc_main_text,
        "img_phash_near_dup": q_img_phash_near_dup,
        "img_caption_filter": q_img_caption_filter,
        "img_phash_clusters": q_img_phash_clusters,
        "stream_extract_links": q_stream_extract_links,
        "stream_politeness_gate": q_stream_politeness_gate,
        "stream_crawl_pipeline": q_stream_crawl_pipeline,
        "stream_exact_dedup": q_stream_exact_dedup,
        "doc_nfc_normalize": q_doc_nfc_normalize,
        "stream_url_filter": q_stream_url_filter,
        "doc_host_cap": q_doc_host_cap,
        "crawl_nofollow_links": q_crawl_nofollow_links,
        "warc_cdx_index": q_warc_cdx_index,
        "crawl_strip_tracking": q_crawl_strip_tracking,
        "doc_char_gram_coverage": q_doc_char_gram_coverage,
        "crawl_recrawl_due": q_crawl_recrawl_due,
        "img_caption_dedup": q_img_caption_dedup,
        "emb_semantic_decontam": q_emb_semantic_decontam,
        "crawl_host_pagerank": q_crawl_host_pagerank,
        "crawl_snapshot_delta": q_crawl_snapshot_delta,
        "emb_semantic_dedup": q_emb_semantic_dedup,
        "doc_chunk_windows": q_doc_chunk_windows,
        "doc_c4_filter": q_doc_c4_filter,
        "warc_revisit_dedup": q_warc_revisit_dedup,
        "crawl_robots_wildcard": q_crawl_robots_wildcard,
        "crawl_pagerank_priority": q_crawl_pagerank_priority,
        "doc_vocab_topk": q_doc_vocab_topk,
        "img_bucket_batches": q_img_bucket_batches,
        "crawl_canonical_collapse": q_crawl_canonical_collapse,
        "doc_lang_mixture": q_doc_lang_mixture,
        "stream_snapshot_delta": q_stream_snapshot_delta,
        "doc_length_stats": q_doc_length_stats,
        "emb_top_component": q_emb_top_component,
        "crawl_sitemap_lastmod": q_crawl_sitemap_lastmod,
        "crawl_anchor_rollup": q_crawl_anchor_rollup,
        "emb_pca_project": q_emb_pca_project,
        "doc_fingerprint_clusters": q_doc_fingerprint_clusters,
        "crawl_url_cardinality": q_crawl_url_cardinality,
        "crawl_host_frequency": q_crawl_host_frequency,
        "doc_html_markdown": q_doc_html_markdown,
        "stream_url_cardinality": q_stream_url_cardinality,
        "img_training_batches": q_img_training_batches,
        "doc_corpus_build": q_doc_corpus_build,
        "doc_tfidf_keywords": q_doc_tfidf_keywords,
        "doc_bigram_logprob": q_doc_bigram_logprob,
        "img_pair_mining": q_img_pair_mining,
        "crawl_idn_canonical": q_crawl_idn_canonical,
        "stream_host_frequency": q_stream_host_frequency,
        "emb_knn_graph": q_emb_knn_graph,
        "selector_exslt_date_math": q_selector_exslt_date_math,
    }


# ---------------------------------------------------------------------------
# DuckDB oracles
# ---------------------------------------------------------------------------


def oracle_sql() -> dict[str, str]:
    sql: dict[str, str] = {}

    sql["q_pricing_summary"] = """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               round(sum(l_extendedprice), 2) AS sum_base_price,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               round(avg(l_quantity), 6) AS avg_qty,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """

    sql["q_top_orders_per_customer"] = """
        SELECT o_custkey, o_orderkey, rnk FROM (
            SELECT o_custkey, o_orderkey,
                   row_number() OVER (
                       PARTITION BY o_custkey
                       ORDER BY o_totalprice DESC, o_orderkey ASC
                   ) AS rnk
            FROM orders
        ) WHERE rnk <= 3
    """

    sql["q_customers_without_orders"] = """
        SELECT c_custkey, c_mktsegment
        FROM customer
        WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    """

    sql["q_revenue_by_nation"] = """
        SELECT n_name,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               count(*) AS n_items
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
    """

    sql["q_event_type_stats"] = """
        SELECT event_type,
               count(*) AS n_events,
               round(sum(value), 6) AS sum_value,
               count(DISTINCT user_id) AS exact_users
        FROM events
        GROUP BY event_type
    """

    sql["q_event_sessionize"] = """
        WITH g AS (
            SELECT user_id, ts, event_id,
                   CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800 * 1000000
                        THEN 1 ELSE 0 END AS new_session
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), s AS (
            SELECT user_id, ts,
                   sum(new_session) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING
                   ) AS session_id
            FROM g
        )
        SELECT user_id, session_id::BIGINT AS session_id,
               count(*) AS n_events,
               ((max(epoch_us(ts)) - min(epoch_us(ts))) // 1000000)::BIGINT AS duration_s
        FROM s
        GROUP BY user_id, session_id
    """

    sql["doc_exact_dedup"] = """
        SELECT min(doc_id) AS doc_id, count(*) AS dup_count
        FROM documents
        GROUP BY md5(text)
    """

    sql["doc_jaccard_pairs_blocked_compat"] = """
        WITH t AS (
            SELECT doc_id, source,
                   list_distinct(string_split_regex(lower(trim(text)), ' +')) AS toks
            FROM documents
        )
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               round(
                 len(list_intersect(a.toks, b.toks))::DOUBLE /
                 len(list_distinct(list_concat(a.toks, b.toks)))::DOUBLE, 6
               ) AS jac
        FROM t a JOIN t b
          ON a.source = b.source AND a.doc_id < b.doc_id
        WHERE len(list_intersect(a.toks, b.toks))::DOUBLE /
              len(list_distinct(list_concat(a.toks, b.toks)))::DOUBLE >= 0.5
    """

    sql["doc_token_stats"] = """
        WITH t AS (
            SELECT doc_id, text,
                   string_split_regex(lower(trim(text)), ' +') AS toks
            FROM documents
        )
        SELECT doc_id,
               len(toks) AS n_tokens,
               length(text) AS n_chars_measured,
               round(
                 list_sum(list_transform(toks, x -> length(x)))::DOUBLE
                 / len(toks)::DOUBLE, 6) AS mean_word_len
        FROM t
    """

    from parsel_spark.functions.textstats import BPE_SPLIT_REGEX

    bpe_pat = BPE_SPLIT_REGEX.replace("'", "''")
    sql["doc_bpe_token_stats"] = f"""
        SELECT doc_id,
               len(regexp_extract_all(text, '{bpe_pat}'))::BIGINT
                   AS n_bpe_tokens
        FROM documents
    """

    sql["doc_quality"] = """
        WITH t AS (
            SELECT doc_id, text,
                   string_split_regex(lower(trim(text)), ' +') AS toks
            FROM documents
        ), m AS (
            SELECT doc_id, text, toks,
                   len(list_filter(toks,
                       x -> x IN ('the','a','of','and','to','in','is','it')
                   ))::DOUBLE / len(toks)::DOUBLE AS swr,
                   list_sum(list_transform(toks, x -> length(x)))::DOUBLE
                     / len(toks)::DOUBLE AS mwl
            FROM t
        )
        SELECT doc_id,
               round(swr, 6) AS stopword_ratio,
               round(
                 (CASE WHEN length(text) BETWEEN 50 AND 2000 THEN 0.4 ELSE 0.0 END)
                 + least(swr * 2, 0.3)
                 + (CASE WHEN mwl BETWEEN 2.0 AND 12.0 THEN 0.3 ELSE 0.0 END), 6
               ) AS quality
        FROM m
    """

    lang_hits = {
        "en": "('the','and','of','to','is')",
        "de": "('der','die','und','ist','nicht')",
        "fr": "('le','la','et','est','les')",
        "es": "('el','la','y','es','los')",
    }
    hit_cols = ", ".join(
        f"len(list_filter(toks, x -> x IN {markers})) AS h_{lang}"
        for lang, markers in lang_hits.items()
    )
    sql["doc_lang_id"] = f"""
        WITH t AS (
            SELECT doc_id,
                   string_split_regex(lower(trim(text)), ' +') AS toks
            FROM documents
        ), h AS (
            SELECT doc_id, {hit_cols},
                   greatest(
                       len(list_filter(toks, x -> x IN {lang_hits['en']})),
                       len(list_filter(toks, x -> x IN {lang_hits['de']})),
                       len(list_filter(toks, x -> x IN {lang_hits['fr']})),
                       len(list_filter(toks, x -> x IN {lang_hits['es']}))
                   ) AS best
            FROM t
        )
        SELECT doc_id,
               CASE
                 WHEN h_de > 0 AND h_de = best THEN 'de'
                 WHEN h_en > 0 AND h_en = best THEN 'en'
                 WHEN h_es > 0 AND h_es = best THEN 'es'
                 WHEN h_fr > 0 AND h_fr = best THEN 'fr'
                 ELSE 'und'
               END AS pred_lang
        FROM h
    """

    sql["doc_fingerprint"] = """
        WITH t AS (
            SELECT doc_id,
                   string_split_regex(lower(trim(text)), ' +') AS toks
            FROM documents
        )
        SELECT doc_id,
               CASE WHEN len(toks) >= 8 THEN
                   list_min([md5(array_to_string(toks[i+1:i+8], ' '))
                             FOR i IN generate_series(0, len(toks)-8)])
               ELSE md5(array_to_string(toks, ' ')) END AS fingerprint
        FROM t
    """

    # Substring-level cross-document dedup: full value replay of the
    # shingle-hash -> dup-count -> rejoin -> gaps-and-islands pipeline
    # (same 60-bit md5 base hash, same positional tokenization).
    _NGRAM_SPAN_CTE = """
        WITH t AS (
            SELECT doc_id, string_split_regex(trim(text), ' +') AS toks
            FROM documents
        ),
        g AS (
            SELECT doc_id,
                   unnest(CASE WHEN len(toks) >= 5 THEN
                       [i FOR i IN generate_series(0, len(toks) - 5)]
                       ELSE []::BIGINT[] END) AS start,
                   unnest(CASE WHEN len(toks) >= 5 THEN
                       [('0x' || substr(md5(array_to_string(
                            toks[i+1:i+5], ' ')), 1, 15))::BIGINT
                        FOR i IN generate_series(0, len(toks) - 5)]
                       ELSE []::BIGINT[] END) AS gram_hash
            FROM t
        ),
        d AS (
            SELECT gram_hash FROM g
            GROUP BY gram_hash HAVING count(DISTINCT doc_id) >= 2
        ),
        h AS (SELECT g.doc_id, g.start FROM g JOIN d USING (gram_hash)),
        i1 AS (
            SELECT doc_id, start,
                   CASE WHEN lag(start) OVER w IS NULL
                          OR start > lag(start) OVER w + 5
                        THEN 1 ELSE 0 END AS ni
            FROM h
            WINDOW w AS (PARTITION BY doc_id ORDER BY start)
        ),
        i2 AS (
            SELECT doc_id, start,
                   sum(ni) OVER (PARTITION BY doc_id ORDER BY start
                                 ROWS UNBOUNDED PRECEDING) AS island
            FROM i1
        ),
        sp AS (
            SELECT doc_id, min(start) AS span_start,
                   max(start) + 4 AS span_end,
                   max(start) - min(start) + 5 AS span_tokens
            FROM i2 GROUP BY doc_id, island
        )
    """

    sql["doc_repeated_ngram_spans"] = (
        _NGRAM_SPAN_CTE
        + """
        SELECT doc_id, span_start, span_end, span_tokens FROM sp
    """
    )

    sql["doc_ngram_dedup"] = (
        _NGRAM_SPAN_CTE
        + """
        , cov AS (
            SELECT doc_id, unnest(generate_series(span_start, span_end)) AS pos
            FROM sp
        ),
        tok AS (
            SELECT doc_id, unnest(toks) AS tok,
                   unnest([i FOR i IN generate_series(0, len(toks) - 1)]) AS pos
            FROM t
        ),
        kept AS (
            SELECT tok.doc_id, tok.tok, tok.pos
            FROM tok ANTI JOIN cov USING (doc_id, pos)
        ),
        agg AS (
            SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS clean_text
            FROM kept GROUP BY doc_id
        ),
        c AS (SELECT doc_id, count(*) AS removed FROM cov GROUP BY doc_id)
        SELECT t.doc_id,
               coalesce(agg.clean_text, '') AS clean_text,
               coalesce(c.removed, 0)::BIGINT AS removed_tokens
        FROM t
        LEFT JOIN agg USING (doc_id)
        LEFT JOIN c USING (doc_id)
    """
    )

    sql["doc_line_dedup"] = """
        WITH src AS (
            SELECT doc_id,
                   concat_ws(chr(10),
                       'Copyright ACME Corp -- All Rights Reserved.',
                       substring(text, 1, 120),
                       CASE WHEN doc_id % 3 = 0
                            THEN 'Subscribe to our newsletter today!' END,
                       substring(text, 121, 140)) AS text
            FROM documents
        ), split_t AS (
            SELECT doc_id, string_split(text, chr(10)) AS ls FROM src
        ), lines AS (
            SELECT doc_id,
                   unnest([i FOR i IN generate_series(0, len(ls) - 1)]) AS line_no,
                   unnest(ls) AS line
            FROM split_t
        ), keyed AS (
            SELECT doc_id, line_no, line,
                   trim(regexp_replace(regexp_replace(
                       lower(line), '[^a-z ]', '', 'g'), ' +', ' ', 'g')) AS key
            FROM lines
        ), dup AS (
            SELECT key FROM keyed WHERE key <> ''
            GROUP BY key HAVING count(DISTINCT doc_id) >= 2
        ), keptl AS (
            SELECT k.doc_id, k.line_no, k.line
            FROM keyed k ANTI JOIN dup USING (key)
        ), agg AS (
            SELECT doc_id,
                   string_agg(line, chr(10) ORDER BY line_no) AS clean_text,
                   count(*) AS kept_n
            FROM keptl GROUP BY doc_id
        ), tot AS (
            SELECT doc_id, count(*) AS total_lines FROM keyed GROUP BY doc_id
        )
        SELECT s.doc_id,
               coalesce(agg.clean_text, '') AS clean_text,
               (tot.total_lines - coalesce(agg.kept_n, 0))::BIGINT
                   AS removed_lines,
               tot.total_lines::BIGINT AS total_lines
        FROM src s
        LEFT JOIN agg USING (doc_id)
        JOIN tot USING (doc_id)
    """

    sql["doc_decontaminate"] = """
        WITH t AS (
            SELECT doc_id, string_split_regex(trim(text), ' +') AS toks
            FROM documents
        ),
        g AS (
            SELECT doc_id,
                   list_distinct(CASE WHEN len(toks) >= 5 THEN
                       [('0x' || substr(md5(array_to_string(
                            toks[i+1:i+5], ' ')), 1, 15))::BIGINT
                        FOR i IN generate_series(0, len(toks) - 5)]
                       ELSE []::BIGINT[] END) AS gh
            FROM t
        ),
        e AS (
            SELECT DISTINCT unnest(gh) AS h FROM g WHERE doc_id % 97 = 0
        ),
        ex AS (
            SELECT doc_id, unnest(gh) AS h FROM g WHERE len(gh) > 0
        ),
        ov AS (
            SELECT ex.doc_id, count(e.h) AS overlap
            FROM ex LEFT JOIN e USING (h)
            GROUP BY ex.doc_id
        )
        SELECT g.doc_id,
               len(gh)::BIGINT AS total_ngrams,
               coalesce(ov.overlap, 0)::BIGINT AS overlap_ngrams,
               round(CASE WHEN len(gh) = 0 THEN 0.0
                     ELSE coalesce(ov.overlap, 0)::DOUBLE / len(gh) END,
                     6) + 0.0 AS overlap_frac,
               CASE WHEN len(gh) = 0 THEN FALSE
                    ELSE coalesce(ov.overlap, 0)::DOUBLE / len(gh) >= 0.3
               END AS contaminated
        FROM g LEFT JOIN ov USING (doc_id)
    """

    # main-text extraction: the planted boilerplate (script/style head,
    # nav link cluster, footer) must vanish; what remains is exactly the
    # caption unit + the closed-form paragraph, whitespace-normalized
    sql["doc_main_text"] = """
        SELECT doc_id,
               trim(regexp_replace(
                   substr(regexp_replace(lower(text), '[^a-z0-9 ]', ' ',
                                         'g'), 1, 40)
                   || ' document ' || doc_id || ' body text',
                   ' +', ' ', 'g')) AS main_text
        FROM documents
    """

    # sitemap ingestion: the synthesized per-host urlset must parse back
    # to exactly the closed-form (host, doc url) pairs
    sql["crawl_sitemap_extract"] = f"""
        SELECT (doc_id % {N_DOC_HOSTS})::BIGINT AS host,
               'http://docs-' || (doc_id % {N_DOC_HOSTS})
                 || '.test/d/' || doc_id AS url
        FROM documents
    """

    # EXSLT date: via the UDF layer vs native SQL date functions — two
    # independent date implementations must agree
    sql["selector_exslt_dates"] = """
        WITH d AS (
            SELECT doc_id,
                   2000 + (doc_id % 30) AS y,
                   1 + (doc_id % 12) AS m,
                   1 + (doc_id % 28) AS dd
            FROM documents
        )
        SELECT doc_id,
               y::VARCHAR AS pub_year,
               m::VARCHAR AS pub_month,
               CASE WHEN y % 4 = 0 AND (y % 100 != 0 OR y % 400 = 0)
                    THEN '1' ELSE '0' END AS is_leap,
               dayofyear(make_date(y, m, dd))::VARCHAR AS day_in_year
        FROM d
    """

    # anchor-text pairs: closed-form (doc, target href, anchor text)
    sql["crawl_anchor_text"] = f"""
        WITH n AS (SELECT count(*) AS n FROM documents),
             js(j) AS (VALUES (0),(1),(2))
        SELECT d.doc_id AS doc_id,
               'http://docs-' ||
                 (((d.doc_id*7 + js.j*11 + 1) % n.n) % {N_DOC_HOSTS})
                 || '.test/d/' || ((d.doc_id*7 + js.j*11 + 1) % n.n)
                 AS href,
               'anchor ' || js.j || ' of ' || d.doc_id AS anchor_text
        FROM documents d, js, n
    """

    # within-doc repetition signals (Gopher-style quality rules)
    sql["doc_top_ngram_stats"] = """
        WITH t AS (
            SELECT doc_id, string_split_regex(trim(text), ' +') AS toks
            FROM documents
        ),
        g AS (
            SELECT doc_id,
                   unnest(CASE WHEN len(toks) >= 2 THEN
                       [('0x' || substr(md5(array_to_string(
                            toks[i+1:i+2], ' ')), 1, 15))::BIGINT
                        FOR i IN generate_series(0, len(toks) - 2)]
                       ELSE []::BIGINT[] END) AS gh
            FROM t
        ),
        pg AS (
            SELECT doc_id, gh, count(*) AS cnt FROM g GROUP BY doc_id, gh
        ),
        top AS (SELECT doc_id, max(cnt) AS top_cnt FROM pg GROUP BY doc_id)
        SELECT t.doc_id,
               len(toks)::BIGINT AS total_tokens,
               coalesce(top.top_cnt, 0)::BIGINT AS top_ngram_count,
               round(coalesce(top.top_cnt, 0) * 2.0 / len(toks), 6)
                   AS top_ngram_frac
        FROM t LEFT JOIN top USING (doc_id)
    """

    sql["doc_dup_ngram_coverage"] = """
        WITH t AS (
            SELECT doc_id, string_split_regex(trim(text), ' +') AS toks
            FROM documents
        ),
        g AS (
            SELECT doc_id,
                   unnest(CASE WHEN len(toks) >= 5 THEN
                       [i FOR i IN generate_series(0, len(toks) - 5)]
                       ELSE []::BIGINT[] END) AS start,
                   unnest(CASE WHEN len(toks) >= 5 THEN
                       [('0x' || substr(md5(array_to_string(
                            toks[i+1:i+5], ' ')), 1, 15))::BIGINT
                        FOR i IN generate_series(0, len(toks) - 5)]
                       ELSE []::BIGINT[] END) AS gh
            FROM t
        ),
        c AS (
            SELECT doc_id, gh FROM g
            GROUP BY doc_id, gh HAVING count(*) >= 2
        ),
        h AS (
            SELECT g.doc_id, g.start
            FROM g JOIN c ON g.doc_id = c.doc_id AND g.gh = c.gh
        ),
        i1 AS (
            SELECT doc_id, start,
                   CASE WHEN lag(start) OVER w IS NULL
                          OR start > lag(start) OVER w + 5
                        THEN 1 ELSE 0 END AS ni
            FROM h
            WINDOW w AS (PARTITION BY doc_id ORDER BY start)
        ),
        i2 AS (
            SELECT doc_id, start,
                   sum(ni) OVER (PARTITION BY doc_id ORDER BY start
                                 ROWS UNBOUNDED PRECEDING) AS island
            FROM i1
        ),
        sp AS (
            SELECT doc_id, max(start) - min(start) + 5 AS span_tokens
            FROM i2 GROUP BY doc_id, island
        ),
        cov AS (
            SELECT doc_id, sum(span_tokens) AS covered FROM sp
            GROUP BY doc_id
        )
        SELECT t.doc_id,
               len(toks)::BIGINT AS total_tokens,
               coalesce(cov.covered, 0)::BIGINT AS covered_tokens,
               round(coalesce(cov.covered, 0) * 1.0 / len(toks), 6)
                   AS dup_coverage_frac
        FROM t LEFT JOIN cov USING (doc_id)
    """

    # composed Gopher-style quality gate: every rule value-replayed
    sql["doc_quality_filter"] = """
        WITH t AS (
            SELECT doc_id, text,
                   string_split_regex(lower(trim(text)), ' +') AS toks,
                   trim(text) = '' AS empty
            FROM documents
        ),
        m AS (
            SELECT doc_id, text, toks, empty,
                   len(toks) AS n_words,
                   length(text) AS n_chars,
                   list_sum(list_transform(toks, x -> length(x)))::DOUBLE
                     / len(toks) AS mwl,
                   len(list_filter(toks,
                       x -> x IN ('the','a','of','and','to','in','is','it')
                   ))::DOUBLE / len(toks) AS swr,
                   length(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g'))
                     ::DOUBLE AS n_sym
            FROM t
        ),
        flags AS (
            SELECT doc_id,
                   CASE WHEN empty THEN FALSE
                        ELSE n_words BETWEEN 10 AND 100000 END
                       AS ok_word_count,
                   CASE WHEN empty THEN FALSE
                        ELSE mwl >= 3.0 AND mwl <= 10.0 END
                       AS ok_mean_word_len,
                   CASE WHEN empty THEN FALSE ELSE swr >= 0.0 END
                       AS ok_stopwords,
                   CASE WHEN empty OR n_chars = 0 THEN FALSE
                        ELSE n_sym / n_chars <= 0.1 END
                       AS ok_symbol_ratio
            FROM m
        ),
        g AS (
            SELECT doc_id,
                   unnest(CASE WHEN len(toks2) >= 2 THEN
                       [('0x' || substr(md5(array_to_string(
                            toks2[i+1:i+2], ' ')), 1, 15))::BIGINT
                        FOR i IN generate_series(0, len(toks2) - 2)]
                       ELSE []::BIGINT[] END) AS gh
            FROM (SELECT doc_id,
                         string_split_regex(trim(text), ' +') AS toks2
                  FROM documents)
        ),
        pg AS (
            SELECT doc_id, gh, count(*) AS cnt FROM g GROUP BY doc_id, gh
        ),
        top AS (SELECT doc_id, max(cnt) AS top_cnt FROM pg GROUP BY doc_id),
        rep AS (
            SELECT t.doc_id,
                   coalesce(top.top_cnt, 0) * 2.0
                     / len(string_split_regex(trim(t.text), ' +')) <= 0.2
                       AS ok_repetition
            FROM t LEFT JOIN top ON t.doc_id = top.doc_id
        )
        SELECT flags.doc_id, ok_word_count, ok_mean_word_len,
               ok_stopwords, ok_symbol_ratio, ok_repetition,
               (ok_word_count AND ok_mean_word_len AND ok_stopwords
                AND ok_symbol_ratio AND ok_repetition) AS keep
        FROM flags JOIN rep ON flags.doc_id = rep.doc_id
    """

    # crawl -> LLM-corpus composition: WARC roundtrip + boilerplate
    # strip + token count, stated in closed form
    sql["warc_main_text"] = f"""
        WITH m AS (
            SELECT doc_id,
                   trim(regexp_replace(
                       substr(regexp_replace(lower(text), '[^a-z0-9 ]',
                                             ' ', 'g'), 1, 40),
                       ' +', ' ', 'g')) AS main_text
            FROM documents
        )
        SELECT doc_id, main_text,
               len(regexp_extract_all(main_text, '{bpe_pat}'))::BIGINT
                   AS n_tokens
        FROM m
    """

    # the streaming gate must produce the SAME rows as the batch gate —
    # one oracle, two execution models
    sql["stream_quality_filter"] = sql["doc_quality_filter"]

    # host-reputation rollup: reuse the quality gate's CTEs verbatim
    # (single source of truth for the keep rule), swap the final SELECT
    # for the per-host aggregation + rank
    _gate_ctes = sql["doc_quality_filter"].rsplit("SELECT flags.doc_id", 1)[0]
    sql["crawl_host_priority"] = _gate_ctes + f""", kv AS (
            SELECT 'docs-' || (flags.doc_id % {N_DOC_HOSTS}) || '.test'
                       AS host,
                   (ok_word_count AND ok_mean_word_len AND ok_stopwords
                    AND ok_symbol_ratio AND ok_repetition) AS keep
            FROM flags JOIN rep ON flags.doc_id = rep.doc_id
        )
        SELECT host,
               count(*) AS n_docs,
               sum(CASE WHEN keep THEN 1 ELSE 0 END)::BIGINT AS n_keep,
               sum(CASE WHEN keep THEN 1 ELSE 0 END)::DOUBLE / count(*)
                   AS keep_rate,
               rank() OVER (
                   ORDER BY sum(CASE WHEN keep THEN 1 ELSE 0 END)::DOUBLE
                                / count(*) DESC,
                            host
               ) AS priority_rank
        FROM kv GROUP BY host
    """

    # mixture planning: per-source token rollup + rate compilation
    sql["doc_source_mixture"] = f"""
        WITH t AS (
            SELECT source, count(*) AS n_docs,
                   sum(len(regexp_extract_all(text, '{bpe_pat}')))::BIGINT
                       AS total_tokens
            FROM documents GROUP BY source
        ),
        a AS (SELECT sum(total_tokens) AS all_tokens FROM t)
        SELECT source, n_docs, total_tokens,
               round(total_tokens / a.all_tokens::DOUBLE, 6) AS token_share
        FROM t, a
    """

    sql["doc_mixture_rates"] = f"""
        WITH t AS (
            SELECT source,
                   sum(len(regexp_extract_all(text, '{bpe_pat}')))::BIGINT
                       AS total_tokens
            FROM documents GROUP BY source
        ),
        w(source, weight) AS (
            VALUES ('src0', 0.1), ('src1', 0.2), ('src2', 0.7)
        )
        SELECT t.source, w.weight,
               round(w.weight * 20000)::BIGINT AS target_tokens,
               round(least(1.0,
                     round(w.weight * 20000) / t.total_tokens::DOUBLE),
                     6) AS rate,
               least(round(w.weight * 20000)::BIGINT, t.total_tokens)
                   AS expected_tokens,
               greatest(0, round(w.weight * 20000)::BIGINT - t.total_tokens)
                   AS shortfall
        FROM t JOIN w ON t.source = w.source
    """

    # composed pipeline: substring-dedup clean text -> BPE-ish counting
    sql["doc_clean_token_stats"] = (
        "WITH base AS ("
        + sql["doc_ngram_dedup"]
        + f""")
        SELECT doc_id, removed_tokens,
               len(regexp_extract_all(clean_text, '{bpe_pat}'))::BIGINT
                   AS n_clean_bpe_tokens
        FROM base
    """
    )

    sql["emb_knn_bruteforce"] = """
        WITH q AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id = 0)
        SELECT vec_id,
               round(list_cosine_similarity(embedding::DOUBLE[], q.qe), 4)
                 + 0.0 AS sim
        FROM embeddings, q
        WHERE vec_id != 0
        ORDER BY sim DESC, vec_id ASC
        LIMIT 10
    """

    sql["emb_near_dup_pairs_blocked_compat"] = """
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
               round(list_cosine_similarity(
                   a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4) + 0.0 AS sim
        FROM embeddings a JOIN embeddings b
          ON a.label = b.label AND a.vec_id < b.vec_id
        WHERE round(list_cosine_similarity(
                  a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4) >= 0.30
    """

    sql["emb_quantize_int8"] = """
        SELECT vec_id,
               list_max(list_transform(embedding, x -> abs(x::DOUBLE)))
                   / 127.0 AS scale,
               CASE WHEN list_max(list_transform(embedding,
                        x -> abs(x::DOUBLE))) = 0
                    THEN list_transform(embedding, x -> 0)
                    ELSE list_transform(embedding,
                        x -> floor(x::DOUBLE * 127.0
                             / list_max(list_transform(embedding,
                                   y -> abs(y::DOUBLE))))::INT)
               END AS qvec
        FROM embeddings
    """

    sql["emb_knn_int8"] = """
        WITH q AS (
            SELECT vec_id,
                   list_max(list_transform(embedding, x -> abs(x::DOUBLE)))
                       / 127.0 AS scale,
                   CASE WHEN list_max(list_transform(embedding,
                            x -> abs(x::DOUBLE))) = 0
                        THEN list_transform(embedding, x -> 0)
                        ELSE list_transform(embedding,
                            x -> floor(x::DOUBLE * 127.0
                                 / list_max(list_transform(embedding,
                                       y -> abs(y::DOUBLE))))::INT)
                   END AS qvec
            FROM embeddings
        ), qq AS (
            SELECT scale AS q_scale, qvec AS q_qvec FROM q WHERE vec_id = 0
        )
        SELECT q.vec_id,
               list_sum(list_transform(
                   range(1, len(q.qvec) + 1),
                   i -> q.qvec[i] * qq.q_qvec[i]))::DOUBLE
                 * q.scale * qq.q_scale AS qscore
        FROM q, qq
        WHERE q.vec_id <> 0
        ORDER BY qscore DESC, q.vec_id
        LIMIT 10
    """

    sql["emb_norms"] = """
        SELECT vec_id, label,
               round(sqrt(list_sum(
                   list_transform(embedding, x -> x::DOUBLE * x::DOUBLE))), 4
               ) AS l2_norm
        FROM embeddings
    """

    sql["emb_label_centroid_dims"] = """
        SELECT label, u.i - 1 AS dim,
               round(avg(u.x), 4) + 0.0 AS mean_value
        FROM embeddings,
             LATERAL (SELECT generate_subscripts(embedding, 1) AS i,
                             unnest(embedding) AS x) AS u
        GROUP BY label, dim
    """

    sql["crawl_extract_links"] = _oracle_doc_targets()

    # streaming variant: watermarked dedup ⇒ the DISTINCT target set
    sql["stream_extract_links"] = (
        f"SELECT DISTINCT url FROM ({_oracle_doc_targets()})"
    )

    # WARC roundtrip: identical ground truth to crawl_extract_links —
    # the format layer must be lossless
    sql["warc_roundtrip"] = _oracle_doc_targets()

    # composed streaming pipeline: distinct planted targets per host,
    # ranked by url (the gate's order when no priority/seq columns
    # exist), admitted while rank <= floor(min(3, 1 + 1/1)) = 2
    sql["doc_nfc_normalize"] = """
        WITH t AS (
            SELECT doc_id,
                   CASE WHEN doc_id % 3 = 0
                        THEN text || ' cafe' || chr(101) || chr(769)
                        WHEN doc_id % 3 = 1
                        THEN text || ' caf' || chr(233)
                        ELSE text
                   END AS text
            FROM documents
        )
        SELECT doc_id,
               nfc_normalize(text) AS text,
               nfc_normalize(text) <> text AS changed,
               length(text)::BIGINT AS len_before,
               length(nfc_normalize(text))::BIGINT AS len_after
        FROM t
    """

    sql["stream_exact_dedup"] = """
        SELECT md5(text) AS text_md5,
               min(doc_id) AS doc_id,
               count(*) AS dup_count
        FROM documents
        GROUP BY md5(text)
    """

    sql["stream_crawl_pipeline"] = f"""
        WITH n AS (SELECT count(*) AS n FROM documents),
             js(j) AS (VALUES (0),(1),(2)),
             targets AS (
                SELECT DISTINCT ((d.doc_id*7 + js.j*11 + 1) % n.n) AS t
                FROM documents d, js, n
             ),
             links AS (
                SELECT 'docs-' || (t % {N_DOC_HOSTS}) || '.test' AS host,
                       'http://docs-' || (t % {N_DOC_HOSTS})
                         || '.test/d/' || t AS url
                FROM targets
             ),
             ranked AS (
                SELECT host, url,
                       row_number() OVER (
                           PARTITION BY host ORDER BY url ASC
                       ) AS rn
                FROM links
             )
        SELECT host, url, rn <= 2 AS allowed FROM ranked
    """

    # crawl + forget: the committed seen table in closed form — seeds ∪
    # wave-1 planted targets minus the forgotten seed urls (politeness
    # non-binding: ≤2 seeds/host < k=2; robots allow-all)
    sql["crawl_forget_seen"] = f"""
        WITH n AS (SELECT count(*) AS n FROM documents),
             js(j) AS (VALUES (0),(1),(2)),
             seeds AS (SELECT doc_id FROM documents WHERE doc_id < {N_SEED_DOCS}),
             seed_urls AS (
                SELECT doc_id,
                       'http://docs-' || (doc_id % {N_DOC_HOSTS})
                         || '.test/d/' || doc_id AS url
                FROM seeds
             ),
             links AS (
                SELECT DISTINCT
                  'http://docs-' || (((s.doc_id*7 + js.j*11 + 1) % n.n) % {N_DOC_HOSTS})
                    || '.test/d/' || ((s.doc_id*7 + js.j*11 + 1) % n.n) AS url
                FROM seeds s, js, n
             ),
             all_seen AS (
                SELECT url FROM seed_urls UNION SELECT url FROM links
             ),
             victims AS (
                SELECT url FROM seed_urls WHERE doc_id % 3 = 0
             )
        SELECT url FROM all_seen
        WHERE url NOT IN (SELECT url FROM victims)
    """

    # streaming politeness gate: closed-form replay of the GroupState
    # token bucket for ONE trigger — rank per host by (priority DESC,
    # seq), admit k = min(floor(min(TOKEN_CAP=3, INITIAL=1 + 1/delay)),
    # max_fetch, |candidates|, MAX_FETCH_CAP=8); the candidate-count
    # term is enforced by row_number itself
    sql["stream_politeness_gate"] = f"""
        WITH f AS (
            SELECT 'docs-' || (doc_id % {N_DOC_HOSTS}) || '.test' AS host,
                   'http://docs-' || (doc_id % {N_DOC_HOSTS})
                     || '.test/d/' || doc_id AS url,
                   ((doc_id * 13) % 5)::DOUBLE AS priority,
                   doc_id AS seq,
                   ((doc_id % {N_DOC_HOSTS}) % 3 + 1)::DOUBLE AS delay,
                   ((doc_id % {N_DOC_HOSTS}) % 4 + 1) AS max_fetch
            FROM documents
        ), r AS (
            SELECT host, url, delay, max_fetch,
                   row_number() OVER (
                       PARTITION BY host ORDER BY priority DESC, seq ASC
                   ) AS rn
            FROM f
        )
        SELECT host, url,
               rn <= least(floor(least(3.0, 1.0 + 1.0/delay))::BIGINT,
                           max_fetch, 8) AS allowed
        FROM r
    """

    sql["selector_drop_rewrite"] = _oracle_doc_targets("(0),(2)")

    sql["selector_jmespath"] = """
        SELECT doc_id, lang AS pred FROM documents
    """

    sql["crawl_frontier_wave1"] = f"""
        WITH n AS (SELECT count(*) AS n FROM documents),
             js(j) AS (VALUES (0),(1),(2)),
             seeds AS (SELECT doc_id FROM documents WHERE doc_id < {N_SEED_DOCS}),
             links AS (
                SELECT DISTINCT
                  'http://docs-' || (((s.doc_id*7 + js.j*11 + 1) % n.n) % {N_DOC_HOSTS})
                    || '.test/d/' || ((s.doc_id*7 + js.j*11 + 1) % n.n) AS url
                FROM seeds s, js, n
             ),
             seed_urls AS (
                SELECT 'http://docs-' || (doc_id % {N_DOC_HOSTS})
                         || '.test/d/' || doc_id AS url
                FROM seeds
             )
        SELECT url FROM links WHERE url NOT IN (SELECT url FROM seed_urls)
    """

    sql["selector_caption_xpath"] = """
        SELECT doc_id,
               substring(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), 1, 40)
                 AS caption
        FROM documents
    """

    sql["selector_re_extract"] = r"""
        SELECT doc_id, unnest(regexp_extract_all(text, '\b(s\w+)', 1)) AS match
        FROM documents
    """

    # -- simhash: DuckDB recomputes the exact 120-bit simhashes (two
    # independent 60-bit md5-segment vote lanes, same bit votes as
    # operators/dedup.simhash_expr(seg=0/1)) and states the ALL-PAIRS
    # ground truth — the banded-LSH Spark plan must recall every pair
    # (pigeonhole guarantee, bands = max_hamming+1)
    def _simhash_lane(hex_start: int) -> str:
        return f"""
                   list_sum(list_transform(range(60), b ->
                       CASE WHEN list_sum(list_transform(
                                 list_transform(
                                     string_split_regex(lower(trim(text)), ' +'),
                                     w -> ('0x' || substr(md5(w), {hex_start}, 15))::BIGINT),
                                 h -> 2 * ((h >> b) & 1) - 1)) >= 0
                            THEN (1::BIGINT << b) ELSE 0::BIGINT END
                   ))::BIGINT"""

    sql["doc_simhash_pairs"] = f"""
        WITH s AS (
            SELECT doc_id,
                   {_simhash_lane(1)} AS sh1,
                   {_simhash_lane(16)} AS sh2
            FROM documents
        )
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(bit_count(xor(a.sh1, b.sh1))
                    + bit_count(xor(a.sh2, b.sh2)) AS BIGINT) AS hamming
        FROM s a JOIN s b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.sh1, b.sh1)) + bit_count(xor(a.sh2, b.sh2)) <= 6
    """

    # -- minhash-LSH: DuckDB recomputes the exact signatures (md5 base
    # hash + Mersenne-lane mixing, operators/dedup._minhash_mix), bands
    # on the comma-joined signature slices (the band identity Spark
    # xxhash64-compresses), and verifies candidates with the same exact
    # shingle-Jaccard — value-level parity for the whole pipeline
    mix = (
        "((((2654435761*(k+1)) % 2147483647) * (h >> 30)"
        "  + ((40503*(k+7)) % 2147483647)) % 2147483647) * 2147483648"
        " + ((((2246822519*(k+1)) % 2147483647) * (h & 1073741823)"
        "  + ((374761393*(k+3)) % 2147483647)) % 2147483647)"
    )
    sql["doc_minhash_pairs"] = f"""
        WITH t AS (
            SELECT doc_id,
                   string_split_regex(lower(trim(text)), ' +') AS toks
            FROM documents
        ), sh AS (
            SELECT doc_id,
                   CASE WHEN len(toks) >= 3
                        THEN list_transform(range(len(toks) - 2),
                                 i -> array_to_string(toks[i+1:i+3], ' '))
                        ELSE [array_to_string(toks, ' ')] END AS shingles
            FROM t
        ), hs AS (
            SELECT doc_id, shingles,
                   list_transform(shingles,
                       s -> ('0x' || substr(md5(s), 1, 15))::BIGINT) AS hh
            FROM sh
        ), sig AS (
            SELECT doc_id, shingles,
                   list_transform(range(32),
                       k -> list_min(list_transform(hh, h -> {mix}))) AS sig
            FROM hs
        ), banded AS (
            SELECT doc_id, shingles, g.b AS band_idx,
                   array_to_string(sig[g.b*4+1 : g.b*4+4], ',') AS band_key
            FROM sig CROSS JOIN generate_series(0, 7) AS g(b)
        ), cand AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   a.shingles AS sh_a, b.shingles AS sh_b
            FROM banded a JOIN banded b
              ON a.band_idx = b.band_idx AND a.band_key = b.band_key
             AND a.doc_id < b.doc_id
        )
        SELECT doc_a, doc_b,
               round(len(list_intersect(list_distinct(sh_a),
                                        list_distinct(sh_b)))::DOUBLE
                     / len(list_distinct(list_concat(sh_a, sh_b)))::DOUBLE,
                     6) AS jac
        FROM cand
        WHERE round(len(list_intersect(list_distinct(sh_a),
                                       list_distinct(sh_b)))::DOUBLE
                    / len(list_distinct(list_concat(sh_a, sh_b)))::DOUBLE,
                    6) >= 0.35
    """

    # -- cluster representatives: clusters (recursive CTE over the
    # minhash pair graph) × rounded quality, best-per-cluster via
    # row_number (quality DESC, doc_id ASC)
    sql["doc_cluster_representatives"] = f"""
        WITH RECURSIVE pairs AS (
            {sql["doc_minhash_pairs"]}
        ), edges AS (
            SELECT doc_a AS a, doc_b AS b FROM pairs
            UNION ALL
            SELECT doc_b AS a, doc_a AS b FROM pairs
        ), reach(node, anc) AS (
            SELECT doc_id, doc_id FROM documents
            UNION
            SELECT e.b, r.anc FROM reach r JOIN edges e ON e.a = r.node
        ), clusters AS (
            SELECT node AS doc_id, min(anc) AS cluster_id
            FROM reach GROUP BY node
        ), quality AS (
            {sql["doc_quality"]}
        ), ranked AS (
            SELECT c.cluster_id, c.doc_id, q.quality,
                   row_number() OVER (
                       PARTITION BY c.cluster_id
                       ORDER BY q.quality DESC, c.doc_id ASC
                   ) AS rn,
                   count(*) OVER (PARTITION BY c.cluster_id) AS cluster_size
            FROM clusters c JOIN quality q USING (doc_id)
        )
        SELECT cluster_id, doc_id AS kept_doc_id,
               round(quality, 6) AS kept_quality, cluster_size
        FROM ranked WHERE rn = 1
    """

    # -- deterministic sampling/splitting: the unit hash is the SAME
    # md5-60-bit expression in both engines (pure function of the key,
    # so membership AND value replay exactly); split thresholds are the
    # IEEE-accumulated python floats embedded verbatim
    unit = (
        "(('0x' || substr(md5(doc_id::VARCHAR || '#{seed}'), 1, 15))::BIGINT"
        "::DOUBLE / 1152921504606846976.0)"
    )
    sql["doc_sample_hash"] = f"""
        SELECT doc_id, round({unit.format(seed=7)}, 9) AS u
        FROM documents
        WHERE {unit.format(seed=7)} < 0.1
    """
    sql["doc_train_split"] = f"""
        SELECT doc_id,
               CASE WHEN {unit.format(seed=3)} < 0.8::DOUBLE THEN 'train'
                    WHEN {unit.format(seed=3)} < 0.9::DOUBLE THEN 'val'
                    ELSE 'test' END AS split
        FROM documents
    """

    # -- stratified mixing + packing: same unit hash; the rate table
    # and the running-sum window replay verbatim
    sql["doc_sample_strata"] = f"""
        SELECT doc_id, source, round({unit.format(seed=11)}, 9) AS u
        FROM documents
        WHERE {unit.format(seed=11)} <
              CASE WHEN source = 'src0' THEN 1.0::DOUBLE
                   WHEN source = 'src1' THEN 0.5::DOUBLE
                   ELSE 0.1::DOUBLE END
    """
    # grand mixing composition: recompute the rates in SQL, replay the
    # exact unit-hash filter — the sampled SET is the checked value
    sql["doc_mixture_sample"] = f"""
        WITH t AS (
            SELECT source,
                   sum(len(regexp_extract_all(text, '{bpe_pat}')))::BIGINT
                       AS total_tokens
            FROM documents GROUP BY source
        ),
        w(source, weight) AS (
            VALUES ('src0', 0.1), ('src1', 0.2), ('src2', 0.7)
        ),
        r AS (
            SELECT t.source,
                   round(least(1.0,
                         round(w.weight * 20000) / t.total_tokens::DOUBLE),
                         6) AS rate
            FROM t JOIN w ON t.source = w.source
        )
        SELECT d.doc_id, d.source
        FROM documents d JOIN r ON d.source = r.source
        WHERE {unit.format(seed=0)} < r.rate
    """

    sql["doc_pack_sequences"] = f"""
        WITH t AS (
            SELECT doc_id,
                   floor({unit.format(seed=5)} * 16)::INT AS shard,
                   len(string_split_regex(lower(trim(text)), ' +'))::BIGINT
                       AS n_tokens
            FROM documents
        ), c AS (
            SELECT doc_id, shard, n_tokens,
                   sum(n_tokens) OVER (
                       PARTITION BY shard ORDER BY doc_id ASC
                       ROWS UNBOUNDED PRECEDING
                   ) - n_tokens AS start
            FROM t
        )
        SELECT doc_id, shard, n_tokens,
               (start // 256)::BIGINT AS seq_id,
               (start % 256)::BIGINT AS offset
        FROM c
    """

    # greedy next-fit packing: the sequential fold replayed as a
    # recursive CTE walking each shard's id-ordered docs
    sql["doc_pack_greedy"] = f"""
        WITH RECURSIVE base AS (
            SELECT doc_id,
                   floor({unit.format(seed=5)} * 16)::INT AS shard,
                   len(string_split_regex(lower(trim(text)), ' +'))::BIGINT
                       AS n_tokens
            FROM documents
        ), t AS (
            SELECT doc_id, shard, n_tokens,
                   row_number() OVER (
                       PARTITION BY shard ORDER BY doc_id ASC
                   ) AS rn
            FROM base
        ), walk(shard, rn, doc_id, n_tokens, seq_id, "offset", used) AS (
            SELECT shard, rn, doc_id, n_tokens,
                   0::BIGINT, 0::BIGINT, n_tokens
            FROM t WHERE rn = 1
            UNION ALL
            SELECT t.shard, t.rn, t.doc_id, t.n_tokens,
                   CASE WHEN w.used > 0 AND w.used + t.n_tokens > 256
                        THEN w.seq_id + 1 ELSE w.seq_id END,
                   CASE WHEN w.used > 0 AND w.used + t.n_tokens > 256
                        THEN 0::BIGINT ELSE w.used END,
                   CASE WHEN w.used > 0 AND w.used + t.n_tokens > 256
                        THEN t.n_tokens ELSE w.used + t.n_tokens END
            FROM walk w JOIN t ON t.shard = w.shard AND t.rn = w.rn + 1
        )
        SELECT doc_id, shard, n_tokens, seq_id, "offset" AS offset
        FROM walk
    """

    # -- PII redaction: same planted input, same ordered regex chain
    # (patterns chosen for Java-regex / RE2 parity), 'g' = Spark's
    # replace-all default
    from parsel_spark.functions.textstats import PII_PATTERNS

    redacted = "text || ' contact: user' || doc_id::VARCHAR || '@example.com or 10.0.0.' || (doc_id % 256)::VARCHAR"
    for _name, pattern, repl in PII_PATTERNS:
        escaped = pattern.replace("'", "''")
        redacted = f"regexp_replace({redacted}, '{escaped}', '{repl}', 'g')"
    sql["doc_redact_pii"] = f"""
        SELECT doc_id, {redacted} AS clean_text FROM documents
    """

    # -- dup clustering: the SAME minhash pair graph, transitively
    # closed with a recursive CTE (min reachable doc_id per node;
    # singletons from the full documents table label themselves) —
    # replays the Spark side's iterative min-label fixpoint in closed
    # form
    sql["doc_dup_clusters"] = f"""
        WITH RECURSIVE pairs AS (
            {sql["doc_minhash_pairs"]}
        ), edges AS (
            SELECT doc_a AS a, doc_b AS b FROM pairs
            UNION ALL
            SELECT doc_b AS a, doc_a AS b FROM pairs
        ), reach(node, anc) AS (
            SELECT doc_id, doc_id FROM documents
            UNION
            SELECT e.b, r.anc FROM reach r JOIN edges e ON e.a = r.node
        )
        SELECT node AS doc_id, min(anc) AS cluster_id
        FROM reach GROUP BY node
    """

    # -- hyperplane-LSH kNN: the planes are deterministic constants
    # (similarity.hyperplanes, splitmix of (seed,p,d)) — embed them as
    # literals and replay the same bucket/score/top-k.  Dot products are
    # stated as the SAME left-to-right IEEE fold Spark's aggregate runs.
    from parsel_spark.operators.similarity import hyperplanes

    planes = hyperplanes(dim=64, n_planes=6, seed=42)
    plane_rows = ",\n                 ".join(
        f"({p}, [{', '.join(str(v) for v in vec)}]::DOUBLE[])"
        for p, vec in enumerate(planes)
    )

    def _dot(a: str, b: str) -> str:
        return (
            f"list_reduce(list_concat([0.0], list_transform(range(64), "
            f"i -> {a}[i+1]::DOUBLE * {b}[i+1]::DOUBLE)), (acc, x) -> acc + x)"
        )

    def _norm(a: str) -> str:
        return (
            f"sqrt(list_reduce(list_concat([0.0], list_transform({a}, "
            f"x -> x::DOUBLE * x::DOUBLE)), (acc, x) -> acc + x))"
        )

    # multi-probe: the query bucket plus its hamming-1 neighbors (one
    # bucket-bit away = just across one hyperplane) — replays the Spark
    # plan's bit_count(xor) <= 1 probe-set predicate
    # semantic decontam: bucket both sides, candidates per bucket,
    # rounded max-cosine vs the eval subset (vec_id % 25)
    sql["emb_semantic_decontam"] = f"""
        WITH planes(p, vec) AS (
            VALUES {plane_rows}
        ), b AS (
            SELECT e.vec_id, e.embedding,
                   sum(CASE WHEN {_dot("e.embedding", "p.vec")} > 0
                            THEN (1 << p.p) ELSE 0 END) AS bucket
            FROM embeddings e CROSS JOIN planes p
            GROUP BY e.vec_id, e.embedding
        ), ev AS (
            SELECT * FROM b WHERE vec_id % 25 = 0
        ), cand AS (
            SELECT t.vec_id,
                   max(round({_dot("t.embedding", "e.embedding")}
                             / ({_norm("t.embedding")}
                                * {_norm("e.embedding")}), 4) + 0.0)
                       AS max_sim
            FROM b t JOIN ev e ON t.bucket = e.bucket
            GROUP BY t.vec_id
        )
        SELECT em.vec_id, c.max_sim,
               coalesce(c.max_sim >= 0.30, false) AS contaminated
        FROM embeddings em LEFT JOIN cand c ON em.vec_id = c.vec_id
    """

    sql["emb_knn_lsh"] = f"""
        WITH planes(p, vec) AS (
            VALUES {plane_rows}
        ), b AS (
            SELECT e.vec_id, e.embedding,
                   sum(CASE WHEN {_dot("e.embedding", "p.vec")} > 0
                            THEN (1 << p.p) ELSE 0 END) AS bucket
            FROM embeddings e CROSS JOIN planes p
            GROUP BY e.vec_id, e.embedding
        ), q AS (
            SELECT embedding AS qe, bucket AS qb FROM b WHERE vec_id = 0
        )
        SELECT b.vec_id,
               round({_dot("b.embedding", "q.qe")}
                     / ({_norm("b.embedding")} * {_norm("q.qe")}), 4)
                 + 0.0 AS sim
        FROM b, q
        WHERE bit_count(xor(b.bucket::BIGINT, q.qb::BIGINT)) <= 1
          AND b.vec_id != 0
        ORDER BY sim DESC, vec_id ASC
        LIMIT 10
    """

    # -- IVF ANN: full k-means replay — decimal-exact centroid sums are
    # order-independent, so DuckDB recomputes identical centroids,
    # assignments (row_number argmin, cid tie-break), probes, and top-k
    def _d2(a: str, b: str) -> str:
        return (
            f"list_reduce(list_concat([0.0], list_transform(range(64), "
            f"i -> ({a}[i+1]::DOUBLE - {b}[i+1]::DOUBLE)"
            f" * ({a}[i+1]::DOUBLE - {b}[i+1]::DOUBLE))), (acc, x) -> acc + x)"
        )

    def _ivf_iteration(i: int) -> str:
        prev = f"c{i}v" if i else "c0"
        return f"""
        a{i} AS (
            SELECT vec_id, cid FROM (
                SELECT e.vec_id, c.cid,
                       row_number() OVER (
                           PARTITION BY e.vec_id
                           ORDER BY {_d2("e.embedding", "c.centroid")} ASC,
                                    c.cid ASC
                       ) AS rn
                FROM e CROSS JOIN {prev} c
            ) WHERE rn = 1
        ), m{i} AS (
            SELECT a{i}.cid, u.dim,
                   round(sum(u.x::DOUBLE::DECIMAL(30,12))::DOUBLE
                         / count(*), 6) AS m
            FROM e JOIN a{i} USING (vec_id),
                 LATERAL (SELECT generate_subscripts(e.embedding, 1) - 1 AS dim,
                                 unnest(e.embedding) AS x) u
            GROUP BY a{i}.cid, u.dim
        ), c{i + 1}v AS (
            SELECT cid, list(m ORDER BY dim) AS centroid FROM m{i} GROUP BY cid
        )"""

    sql["emb_knn_ivf"] = f"""
        WITH e AS (SELECT vec_id, embedding FROM embeddings),
        c0 AS (
            SELECT vec_id AS cid,
                   list_transform(embedding, x -> round(x::DOUBLE, 6))
                       AS centroid
            FROM e WHERE vec_id < 16
        ),{_ivf_iteration(0)},{_ivf_iteration(1)},
        afinal AS (
            SELECT vec_id, cid FROM (
                SELECT e.vec_id, c.cid,
                       row_number() OVER (
                           PARTITION BY e.vec_id
                           ORDER BY {_d2("e.embedding", "c.centroid")} ASC,
                                    c.cid ASC
                       ) AS rn
                FROM e CROSS JOIN c2v c
            ) WHERE rn = 1
        ), q AS (
            SELECT embedding AS qe FROM e WHERE vec_id = 0
        ), probe AS (
            SELECT c.cid FROM c2v c, q
            ORDER BY {_d2("c.centroid", "q.qe")} ASC, c.cid ASC
            LIMIT 4
        )
        SELECT e.vec_id,
               round({_dot("e.embedding", "q.qe")}
                     / ({_norm("e.embedding")} * {_norm("q.qe")}), 4)
                 + 0.0 AS sim
        FROM e JOIN afinal USING (vec_id) JOIN probe USING (cid), q
        WHERE e.vec_id != 0
        ORDER BY sim DESC, vec_id ASC
        LIMIT 10
    """

    # -- hyperplane-LSH embedding near-dup: same plane literals; pairs
    # share a bucket, cosine verified exactly (SAME fold order)
    sql["emb_near_dup_lsh"] = f"""
        WITH planes(p, vec) AS (
            VALUES {plane_rows}
        ), b AS (
            SELECT e.vec_id, e.embedding,
                   sum(CASE WHEN {_dot("e.embedding", "p.vec")} > 0
                            THEN (1 << p.p) ELSE 0 END) AS bucket
            FROM embeddings e CROSS JOIN planes p
            GROUP BY e.vec_id, e.embedding
        )
        SELECT x.vec_id AS vec_a, y.vec_id AS vec_b,
               round({_dot("x.embedding", "y.embedding")}
                     / ({_norm("x.embedding")} * {_norm("y.embedding")}),
                     4) + 0.0 AS sim
        FROM b x JOIN b y
          ON x.bucket = y.bucket AND x.vec_id < y.vec_id
        WHERE round({_dot("x.embedding", "y.embedding")}
                    / ({_norm("x.embedding")} * {_norm("y.embedding")}),
                    4) >= 0.30
    """

    # -- LSH-mode Jaccard: the minhash pipeline with shingle_n=1 (the
    # shingles ARE the tokens), threshold 0.5 — full replay in SQL
    sql["doc_jaccard_lsh_pairs"] = f"""
        WITH t AS (
            SELECT doc_id,
                   string_split_regex(lower(trim(text)), ' +') AS shingles
            FROM documents
        ), hs AS (
            SELECT doc_id, shingles,
                   list_transform(shingles,
                       s -> ('0x' || substr(md5(s), 1, 15))::BIGINT) AS hh
            FROM t
        ), sig AS (
            SELECT doc_id, shingles,
                   list_transform(range(32),
                       k -> list_min(list_transform(hh, h -> {mix}))) AS sig
            FROM hs
        ), banded AS (
            SELECT doc_id, shingles, g.b AS band_idx,
                   array_to_string(sig[g.b*4+1 : g.b*4+4], ',') AS band_key
            FROM sig CROSS JOIN generate_series(0, 7) AS g(b)
        ), cand AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   a.shingles AS sh_a, b.shingles AS sh_b
            FROM banded a JOIN banded b
              ON a.band_idx = b.band_idx AND a.band_key = b.band_key
             AND a.doc_id < b.doc_id
        )
        SELECT doc_a, doc_b,
               round(len(list_intersect(list_distinct(sh_a),
                                        list_distinct(sh_b)))::DOUBLE
                     / len(list_distinct(list_concat(sh_a, sh_b)))::DOUBLE,
                     6) AS jac
        FROM cand
        WHERE round(len(list_intersect(list_distinct(sh_a),
                                       list_distinct(sh_b)))::DOUBLE
                    / len(list_distinct(list_concat(sh_a, sh_b)))::DOUBLE,
                    6) >= 0.8
    """

    # -- murmur3 URL sharding: Spark's hash() is Murmur3_x86_32 seed 42
    # with per-byte tail mixing (functions/hashing.murmur3_32 is the
    # python twin); this states the SAME function in DuckDB SQL — exact
    # for these ASCII URLs (ascii() reads code points, == bytes here).
    m32 = "4294967296"

    def _mul32(expr: str, const: int) -> str:
        return f"(({expr})::HUGEINT * {const} % {m32})::BIGINT"

    def _rotl32(expr: str, r: int) -> str:
        return f"((({expr}) << {r}) % {m32} + (({expr}) >> {32 - r}))"

    # mixK1: k1 = rotl32(k*0xcc9e2d51, 15) * 0x1b873593  (all mod 2^32)
    mixk1 = _mul32(_rotl32(_mul32("k", 0xCC9E2D51), 15), 0x1B873593)
    # mixH1: h = rotl32(h ^ k1, 13) * 5 + 0xe6546b64  (mod 2^32)
    mixh1 = f"({_rotl32(f'xor(h, {mixk1})', 13)} * 5 + {0xE6546B64}) % {m32}"
    fmix = f"xor(f2, f2 >> 16)"
    sql["crawl_url_filter"] = f"""
        WITH u AS (
            SELECT doc_id,
                   CASE WHEN doc_id % 7 = 0
                        THEN 'http://ads.tracker' || (doc_id % 3)
                             || '.test/d/' || doc_id
                        WHEN doc_id % 13 = 0
                        THEN 'http://deep.sub.tracker1.test/d/' || doc_id
                        WHEN doc_id % 5 = 0
                        THEN 'http://docs-' || (doc_id % {N_DOC_HOSTS})
                             || '.test/d/' || doc_id
                             || '?ref=casino-poker-night'
                        WHEN doc_id % 11 = 0
                        THEN 'ftp://docs-' || (doc_id % {N_DOC_HOSTS})
                             || '.test/d/' || doc_id
                        WHEN doc_id % 17 = 0
                        THEN 'http://docs-' || (doc_id % {N_DOC_HOSTS})
                             || '.test/d/' || doc_id || '?q=casino'
                        ELSE 'http://docs-' || (doc_id % {N_DOC_HOSTS})
                             || '.test/d/' || doc_id
                   END AS url
            FROM documents
        ), p AS (
            SELECT doc_id, url,
                   lower(regexp_extract(url, '^([A-Za-z]+)://', 1)) AS scheme,
                   string_split(
                       lower(regexp_extract(url,
                           '^[A-Za-z]+://([^/?#:@]+)', 1)), '.') AS labels
            FROM u
        ), v AS (
            SELECT doc_id, url, scheme,
                   len(list_intersect(
                       [array_to_string(labels[len(labels)-k+1:], '.')
                        FOR k IN generate_series(2, least(len(labels), 5))],
                       ['tracker0.test', 'tracker2.test', 'sub.tracker1.test']
                   )) > 0 AS host_blocked,
                   (CASE WHEN lower(url) LIKE '%casino%' THEN 2 ELSE 0 END
                    + CASE WHEN lower(url) LIKE '%night%' THEN 1 ELSE 0 END
                    + CASE WHEN lower(url) LIKE '%poker%' THEN 2 ELSE 0 END
                   )::BIGINT AS word_score
            FROM p
        )
        SELECT doc_id, url, host_blocked, word_score,
               scheme IN ('http', 'https') AS scheme_ok,
               (scheme IN ('http', 'https') AND NOT host_blocked
                AND word_score < 4) AS keep
        FROM v
    """

    # the streaming URL gate must produce the SAME rows as the batch
    # gate — one oracle, two execution models
    sql["stream_url_filter"] = sql["crawl_url_filter"]

    # REP nofollow: survivors stated in closed form — the absolute
    # canonical anchor and the base-resolved rel="author me" anchor of
    # every doc WITHOUT the meta-robots nofollow (doc_id % 5 != 0)
    sql["crawl_nofollow_links"] = f"""
        WITH k AS (
            SELECT doc_id,
                   'http://docs-' || (doc_id % {N_DOC_HOSTS}) || '.test'
                       AS hb
            FROM documents
            WHERE doc_id % 5 <> 0
        )
        SELECT doc_id, hb || '/a/' || doc_id AS url FROM k
        UNION ALL
        SELECT doc_id, hb || '/d/' || doc_id AS url FROM k
    """

    # caption dedup: key, group count and the area argmax replayed
    sql["img_caption_dedup"] = """
        WITH img AS (
            SELECT 'img-' || doc_id AS image_id,
                   (doc_id*40503 + 17) % 2048 + 16 AS w,
                   (doc_id*69069 + 5) % 2048 + 16 AS h,
                   CASE WHEN doc_id % 19 = 0 THEN ' img '
                        WHEN doc_id % 23 = 0 THEN 'photograph'
                        ELSE substring(text, 1, 180) END AS caption
            FROM documents
        ), k AS (
            SELECT image_id, w, h,
                   md5(trim(lower(caption))) AS caption_key
            FROM img
        )
        SELECT image_id, caption_key,
               count(*) OVER (PARTITION BY caption_key) AS group_n,
               (row_number() OVER (PARTITION BY caption_key
                                   ORDER BY w*h DESC, image_id ASC) = 1)
                   AS is_rep
        FROM k
    """

    # adaptive revisit: the exact integer backoff algebra replayed
    # (shift-left clamp exponent = bit_length(max/min) = 7 here)
    sql["crawl_recrawl_due"] = f"""
        WITH s AS (
            SELECT 'http://docs-' || (doc_id % {N_DOC_HOSTS})
                       || '.test/p/' || doc_id AS url,
                   CASE WHEN doc_id % 7 <> 0
                        THEN 900000 + (doc_id * 37) % 59900 END
                       AS last_fetch_ts,
                   doc_id
            FROM documents
        ), t AS (
            SELECT url, last_fetch_ts,
                   CASE WHEN doc_id % 5 <> 0 THEN
                       CASE WHEN doc_id % 3 = 0 THEN last_fetch_ts + 50
                            ELSE last_fetch_ts - 50 END
                   END AS last_change_ts,
                   (doc_id % 12)::INT AS unchanged_count
            FROM s
        ), u AS (
            SELECT *,
                   least(100 * (1::BIGINT
                       << least(unchanged_count, 7)), 10000)
                       AS interval_s
            FROM t
        )
        SELECT url, last_fetch_ts, last_change_ts, unchanged_count,
               interval_s,
               (last_fetch_ts IS NULL
                OR (last_change_ts IS NOT NULL
                    AND last_change_ts > last_fetch_ts)
                OR (960000 - last_fetch_ts >= interval_s)) AS due,
               CASE WHEN NOT (last_fetch_ts IS NULL
                        OR (last_change_ts IS NOT NULL
                            AND last_change_ts > last_fetch_ts)
                        OR (960000 - last_fetch_ts >= interval_s))
                    THEN 0
                    WHEN last_fetch_ts IS NULL THEN 960000
                    ELSE greatest(960000 - last_fetch_ts - interval_s, 0)
               END AS overdue_s
        FROM u
    """

    # rare-gram coverage: the full train+score computation replayed —
    # trigram explode, df table, threshold, join, integer fraction
    sql["doc_char_gram_coverage"] = f"""
        WITH p AS (
            SELECT doc_id,
                   text || CASE WHEN doc_id % 10 = 0
                                THEN ' qz' || doc_id || 'xj' || doc_id
                                     || 'vq'
                                ELSE '' END AS text
            FROM documents
        ), g AS (
            SELECT p.doc_id, substr(p.text, gs.i, 3) AS gram
            FROM p, LATERAL (
                SELECT unnest(generate_series(1, length(p.text) - 2)) AS i
            ) gs
        ), dfx AS (
            SELECT gram
            FROM (SELECT gram, count(DISTINCT doc_id) AS df
                  FROM g GROUP BY gram)
            WHERE df >= 2
        ), scored AS (
            SELECT g.doc_id,
                   count(*) AS n_grams,
                   sum(CASE WHEN d.gram IS NOT NULL THEN 1 ELSE 0 END)
                       AS n_common
            FROM g LEFT JOIN dfx d ON g.gram = d.gram
            GROUP BY g.doc_id
        )
        SELECT doc.doc_id,
               coalesce(s.n_grams, 0) AS n_grams,
               coalesce(s.n_common, 0) AS n_common,
               round(s.n_common::DOUBLE / s.n_grams, 9) AS coverage
        FROM documents doc LEFT JOIN scored s ON doc.doc_id = s.doc_id
    """

    # tracking-param strip: DuckDB's list_filter lambda replays the
    # split -> filter -> rejoin algebra over the SAME anchored pattern
    sql["crawl_strip_tracking"] = f"""
        WITH u AS (
            SELECT doc_id,
                   'http://docs-' || (doc_id % {N_DOC_HOSTS})
                       || '.test/p/' || doc_id AS base,
                   doc_id % 4 AS v
            FROM documents
        ), w AS (
            SELECT doc_id,
                   CASE v
                       WHEN 0 THEN base
                       WHEN 1 THEN base || '?utm_source=s' || doc_id
                       WHEN 2 THEN base || '?utm_campaign=c&id=' || doc_id
                                        || '&fbclid=f&b=2'
                       ELSE base || '?id=' || doc_id || '&gclid=g'
                   END AS url,
                   base
            FROM u
        ), s AS (
            SELECT doc_id, url, base,
                   -- duckdb's array_to_string([]) is NULL, not '' —
                   -- coalesce INSIDE the branch so no-query urls keep
                   -- their NULL marker
                   CASE WHEN contains(url, '?') THEN coalesce(
                       array_to_string(
                           list_filter(
                               str_split(split_part(url, '?', 2), '&'),
                               p -> NOT regexp_matches(
                                   split_part(p, '=', 1),
                                   '^(utm_[a-z]+|fbclid|gclid|msclkid|mc_eid)$')
                           ), '&'), '')
                   END AS q
            FROM w
        )
        SELECT doc_id, url,
               CASE WHEN q IS NULL THEN url
                    WHEN q = '' THEN base
                    ELSE base || '?' || q END AS clean_url
        FROM s
    """

    # CDX index: urlkey/digest/length reconstructed INDEPENDENTLY —
    # DuckDB rebuilds the exact html string and re-hashes it, so a
    # digest match proves byte-fidelity through the WARC envelope
    sql["warc_cdx_index"] = f"""
        WITH p AS (
            SELECT doc_id,
                   'docs-' || (doc_id % {N_DOC_HOSTS}) || '.test' AS host,
                   '<html><body><a href="http://docs-'
                       || (doc_id % {N_DOC_HOSTS}) || '.test/a/' || doc_id
                       || '">A</a></body></html>' AS html
            FROM documents
        )
        SELECT 'test,docs-' || (doc_id % {N_DOC_HOSTS}) || ')/page/'
                   || doc_id AS urlkey,
               'http://' || host || '/page/' || doc_id AS url,
               md5(html) AS digest,
               strlen(html)::BIGINT AS length
        FROM p
    """

    # per-host cap: the EXACT row_number-over-unit-hash predicate
    sql["doc_host_cap"] = f"""
        WITH h AS (
            SELECT doc_id,
                   'docs-' || (doc_id % {N_DOC_HOSTS}) || '.test' AS host,
                   {unit.format(seed=5)} AS u
            FROM documents
        ), r AS (
            SELECT doc_id, host,
                   row_number() OVER (PARTITION BY host
                                      ORDER BY u, doc_id) AS rn
            FROM h
        )
        SELECT doc_id, host FROM r WHERE rn <= 10
    """

    sql["crawl_surt_keys"] = f"""
        WITH u AS (
            SELECT doc_id,
                   CASE WHEN doc_id % 4 = 0
                        THEN 'http://WWW.Docs-' || (doc_id % {N_DOC_HOSTS})
                             || '.Test/D/' || doc_id
                        WHEN doc_id % 9 = 0
                        THEN 'http://docs-' || (doc_id % {N_DOC_HOSTS})
                             || '.test:8080/D/' || doc_id || '?x=1&y=2'
                        ELSE 'http://docs-' || (doc_id % {N_DOC_HOSTS})
                             || '.test/D/' || doc_id
                   END AS url
            FROM documents
        ), p AS (
            SELECT doc_id, url,
                   regexp_replace(
                       lower(regexp_extract(url,
                           '^[A-Za-z]+://(?:[^/?#@]*@)?([^/?#:]+)', 1)),
                       '^www\\.', '') AS host,
                   lower(coalesce(nullif(regexp_extract(url,
                       '^[A-Za-z]+://[^/?#]*([^?#]*)', 1), ''), '/')) AS path,
                   CASE WHEN url LIKE '%?%'
                        THEN '?' || lower(regexp_extract(url,
                                 '\\?([^#]*)', 1))
                        ELSE '' END AS q
            FROM u
        )
        SELECT doc_id, url,
               array_to_string(list_reverse(string_split(host, '.')), ',')
                   || ')' || path || q AS surt
        FROM p
    """

    sql["crawl_url_hash_shards"] = f"""
        WITH urls AS (
            SELECT 'http://docs-' || (doc_id % {N_DOC_HOSTS})
                   || '.test/d/' || doc_id AS url
            FROM documents
        ), ks AS (
            SELECT url, length(url) AS len,
                   list_concat(
                       list_transform(range(length(url) // 4), j ->
                           ascii(url[4*j+1]) + ascii(url[4*j+2])*256
                           + ascii(url[4*j+3])*65536
                           + ascii(url[4*j+4])*16777216),
                       list_transform(range(length(url) % 4), t ->
                           ascii(url[(length(url)//4)*4 + t + 1]))
                   ) AS blocks
            FROM urls
        ), mixed AS (
            SELECT len,
                   list_reduce(list_concat([42::BIGINT], blocks),
                               (h, k) -> {mixh1}) AS hm
            FROM ks
        ), fm1 AS (
            SELECT {_mul32("xor(xor(hm, len), xor(hm, len) >> 16)",
                           0x85EBCA6B)} AS f1 FROM mixed
        ), fm2 AS (
            SELECT {_mul32("xor(f1, f1 >> 13)", 0xC2B2AE35)} AS f2 FROM fm1
        ), fin AS (
            SELECT CASE WHEN {fmix} >= 2147483648
                        THEN {fmix} - {m32} ELSE {fmix} END AS s
            FROM fm2
        )
        SELECT ((s % 32) + 32) % 32 AS shard_id, count(*) AS n_urls
        FROM fin GROUP BY shard_id
    """

    # image table (BASELINE input_hint shape): brute-force oracle for the
    # banded-LSH phash near-dup query — exact at sf<=0.01 scale
    sql["img_phash_near_dup"] = """
        WITH base AS (
            SELECT 'img-' || doc_id AS image_id,
                   ((doc_id*2654435761 + 1013904223) % 2147483648) * 2147483648
                   + ((doc_id*2246822519 + 374761393) % 2147483648) AS phash,
                   doc_id
            FROM documents
        ), images AS (
            SELECT image_id, phash FROM base
            UNION ALL
            SELECT image_id || '-dup', xor(phash, 3) FROM base
            WHERE doc_id % 10 = 0
        )
        SELECT a.image_id AS img_a, b.image_id AS img_b,
               CAST(bit_count(xor(a.phash, b.phash)) AS BIGINT) AS hamming
        FROM images a, images b
        WHERE a.image_id < b.image_id
          AND bit_count(xor(a.phash, b.phash)) <= 3
    """

    sql["img_phash_clusters"] = """
        WITH RECURSIVE base AS (
            SELECT 'img-' || doc_id AS image_id,
                   ((doc_id*2654435761 + 1013904223) % 2147483648) * 2147483648
                   + ((doc_id*2246822519 + 374761393) % 2147483648) AS phash,
                   doc_id
            FROM documents
        ), images AS (
            SELECT image_id, phash FROM base
            UNION ALL
            SELECT image_id || '-dup', xor(phash, 3) FROM base
            WHERE doc_id % 10 = 0
        ), pairs AS (
            SELECT a.image_id AS img_a, b.image_id AS img_b
            FROM images a, images b
            WHERE a.image_id < b.image_id
              AND bit_count(xor(a.phash, b.phash)) <= 3
        ), edges AS (
            SELECT img_a AS a, img_b AS b FROM pairs
            UNION ALL
            SELECT img_b AS a, img_a AS b FROM pairs
        ), reach(node, anc) AS (
            SELECT image_id, image_id FROM images
            UNION
            SELECT e.b, r.anc FROM reach r JOIN edges e ON e.a = r.node
        ), clusters AS (
            SELECT node AS image_id, min(anc) AS cluster_id
            FROM reach GROUP BY node
        ), sized AS (
            SELECT image_id, cluster_id,
                   CAST((CAST(regexp_extract(image_id, '([0-9]+)', 1) AS BIGINT)
                         * 40503 + 17) % 2048 + 16
                        + CASE WHEN image_id LIKE '%-dup' THEN 64 ELSE 0 END
                        AS BIGINT)
                   * CAST((CAST(regexp_extract(image_id, '([0-9]+)', 1) AS BIGINT)
                           * 69069 + 5) % 2048 + 16 AS BIGINT) AS area
            FROM clusters
        )
        SELECT image_id, cluster_id, area,
               row_number() OVER (
                   PARTITION BY cluster_id
                   ORDER BY area DESC, image_id ASC
               ) = 1 AS is_rep
        FROM sized
    """

    sql["img_aspect_buckets"] = """
        WITH img AS (
            SELECT 'img-' || doc_id AS image_id,
                   (doc_id*40503 + 17) % 2048 + 16 AS w,
                   (doc_id*69069 + 5) % 2048 + 16 AS h
            FROM documents
        ), d AS (
            SELECT image_id, w, h,
                   abs(w*1  - h*1 ) * 144 AS d_sq,
                   abs(w*3  - h*4 ) * 48  AS d_l43,
                   abs(w*4  - h*3 ) * 36  AS d_p34,
                   abs(w*9  - h*16) * 16  AS d_w169,
                   abs(w*16 - h*9 ) * 9   AS d_t916,
                   abs(w*2  - h*3 ) * 72  AS d_l32,
                   abs(w*3  - h*2 ) * 48  AS d_p23
            FROM img
        )
        SELECT image_id, w, h,
               CASE WHEN d_sq = m THEN 'square_1_1'
                    WHEN d_l43 = m THEN 'landscape_4_3'
                    WHEN d_p34 = m THEN 'portrait_3_4'
                    WHEN d_w169 = m THEN 'wide_16_9'
                    WHEN d_t916 = m THEN 'tall_9_16'
                    WHEN d_l32 = m THEN 'landscape_3_2'
                    ELSE 'portrait_2_3' END AS bucket
        FROM (SELECT *, least(d_sq, d_l43, d_p34, d_w169, d_t916,
                              d_l32, d_p23) AS m
              FROM d)
    """

    sql["img_caption_filter"] = """
        WITH img AS (
            SELECT 'img-' || doc_id AS image_id,
                   (doc_id*40503 + 17) % 2048 + 16 AS w,
                   (doc_id*69069 + 5) % 2048 + 16 AS h,
                   CASE WHEN doc_id % 19 = 0 THEN ' img '
                        WHEN doc_id % 23 = 0 THEN 'photograph'
                        ELSE substring(text, 1, 180) END AS caption
            FROM documents
        ), gated AS (
            SELECT image_id, w, h,
                   length(trim(caption)) AS caption_len,
                   CASE WHEN trim(caption) = '' THEN 0
                        ELSE length(regexp_split_to_array(trim(caption), '\\s+'))
                   END AS caption_words,
                   (w >= 64 AND h >= 64) AS ok_dims,
                   greatest(w, h) <= 4 * least(w, h) AS ok_aspect,
                   CASE WHEN trim(caption) = '' THEN FALSE
                        ELSE length(trim(caption)) BETWEEN 5 AND 512
                   END AS ok_caption_len
            FROM img
        )
        SELECT image_id, w, h, caption_len, caption_words,
               ok_dims, ok_aspect, ok_caption_len,
               caption_words >= 2 AS ok_caption_words,
               (ok_dims AND ok_aspect AND ok_caption_len
                AND caption_words >= 2) AS keep
        FROM gated
    """

    # host-level PageRank: the ENTIRE power method (N, out-degrees,
    # dangling mass, 3 unrolled rounds) replayed via the same algebra
    # string the unit tests pin (linkgraph.pagerank_oracle_cte)
    from parsel_spark.operators.linkgraph import pagerank_oracle_cte

    _pr_edges = """
        SELECT DISTINCT src, dst FROM (
            SELECT 'h' || (doc_id % 40) AS src,
                   'h' || ((doc_id * 7 + doc_id // 7 + 11 * js.j) % 40)
                       AS dst
            FROM documents, (VALUES (0), (1), (2)) js(j)
            UNION ALL
            SELECT 'h' || (doc_id % 40) AS src, 'sink' AS dst
            FROM documents WHERE doc_id % 11 = 0
        )
    """
    sql["crawl_host_pagerank"] = f"""
        SELECT node AS host, round(rank, 7) AS pagerank
        FROM ({pagerank_oracle_cte(_pr_edges, iters=3, damping=0.85)})
    """

    # RFC 9309 wildcard robots: the LIKE translation with raw-rule
    # octet-length specificity, allow-wins ties, replayed per rule
    sql["crawl_robots_wildcard"] = """
        WITH p AS (
            SELECT doc_id,
                   CASE doc_id % 5
                       WHEN 0 THEN '/index' || doc_id || '.php'
                       WHEN 1 THEN '/private/x' || doc_id
                       WHEN 2 THEN '/private/ok' || doc_id
                       WHEN 3 THEN '/public/' || doc_id
                       ELSE '/d/' || doc_id END AS path
            FROM documents
        ), g AS (
            SELECT doc_id, path,
                   greatest(
                       CASE WHEN path LIKE '/%.php' ESCAPE '\\'
                            THEN 7 ELSE 0 END,
                       CASE WHEN path LIKE '/private%' ESCAPE '\\'
                            THEN 9 ELSE 0 END,
                       CASE WHEN path LIKE '/d/4%' ESCAPE '\\'
                            THEN 5 ELSE 0 END) AS deny_len,
                   CASE WHEN path LIKE '/private/ok%' ESCAPE '\\'
                        THEN 12 ELSE 0 END AS allow_len
            FROM p
        )
        SELECT 'http://rules.test' || path AS url,
               doc_id AS url_hash,
               'rules.test' AS host
        FROM g
        WHERE deny_len = 0 OR allow_len >= deny_len
    """

    # revisit dedup: same synthesized CDX, same digest-window algebra
    sql["warc_revisit_dedup"] = f"""
        WITH cdx AS (
            SELECT 'test,docs-' || (doc_id % {N_DOC_HOSTS}) || ')/page/'
                       || doc_id AS urlkey,
                   'http://docs-' || (doc_id % {N_DOC_HOSTS})
                       || '.test/page/' || doc_id AS url,
                   md5(CASE WHEN doc_id % 5 = 0
                            THEN '<html><body>boilerplate</body></html>'
                            ELSE '<html><body>page-' || doc_id
                                 || '</body></html>' END) AS digest,
                   strlen(CASE WHEN doc_id % 5 = 0
                               THEN '<html><body>boilerplate</body></html>'
                               ELSE '<html><body>page-' || doc_id
                                    || '</body></html>' END)::BIGINT
                       AS length,
                   'part-' || (doc_id % 8) AS warc_file,
                   (doc_id * 1000)::BIGINT AS record_offset
            FROM documents
        ), r AS (
            SELECT *,
                   row_number() OVER (
                       PARTITION BY digest
                       ORDER BY warc_file, record_offset, urlkey
                   ) AS rn,
                   first_value(warc_file) OVER (
                       PARTITION BY digest
                       ORDER BY warc_file, record_offset, urlkey
                   ) AS orig_file,
                   first_value(record_offset) OVER (
                       PARTITION BY digest
                       ORDER BY warc_file, record_offset, urlkey
                   ) AS orig_offset
            FROM cdx
        )
        SELECT urlkey, url, digest, length, warc_file, record_offset,
               CASE WHEN rn = 1 THEN 'response' ELSE 'revisit' END
                   AS record_type,
               CASE WHEN rn > 1 THEN orig_file END AS refers_to_file,
               CASE WHEN rn > 1 THEN orig_offset END AS refers_to_offset,
               CASE WHEN rn = 1 THEN length ELSE 0 END AS stored_length
        FROM r
    """

    # HLL cardinality: the full sketch replay via the shared algebra
    from parsel_spark.operators.sketches import hll_oracle_sql

    sql["crawl_url_cardinality"] = hll_oracle_sql(
        f"""SELECT 'http://docs-' || ((doc_id % 300) % {N_DOC_HOSTS})
                || '.test/p/' || (doc_id % 300) AS url
            FROM documents""",
        "url",
        b=10,
    )
    # streaming variant: identical sketch, streaming register agg
    sql["stream_url_cardinality"] = sql["crawl_url_cardinality"]

    # date arithmetic: the engine's calendar vs DuckDB's native one
    sql["selector_exslt_date_math"] = """
        WITH d AS (
            SELECT doc_id,
                   make_date(2000 + (doc_id % 30),
                             1 + (doc_id % 12),
                             1 + (doc_id % 28)) AS pub,
                   doc_id % 45 AS n
            FROM documents
        ), x AS (
            SELECT doc_id,
                   strftime(pub + to_days(n::INT), '%Y-%m-%d') AS due_date,
                   date_diff('day', pub, DATE '2015-06-15') AS dd
            FROM d
        )
        SELECT doc_id, due_date,
               CASE WHEN dd = 0 THEN 'PT0S'
                    WHEN dd > 0 THEN 'P' || dd || 'D'
                    ELSE '-P' || (-dd) || 'D' END AS diff_to_anchor
        FROM x
    """

    # kNN graph: plane literals + bucket join + per-vector ranked cut
    sql["emb_knn_graph"] = f"""
        WITH planes(p, vec) AS (
            VALUES {plane_rows}
        ), b AS (
            SELECT e.vec_id, e.embedding,
                   sum(CASE WHEN {_dot("e.embedding", "p.vec")} > 0
                            THEN (1 << p.p) ELSE 0 END) AS bucket
            FROM embeddings e CROSS JOIN planes p
            GROUP BY e.vec_id, e.embedding
        ), pr AS (
            SELECT a.vec_id AS vec_id, bb.vec_id AS neighbor,
                   round({_dot("a.embedding", "bb.embedding")}
                         / ({_norm("a.embedding")}
                            * {_norm("bb.embedding")}), 4) + 0.0 AS sim
            FROM b a JOIN b bb
              ON a.bucket = bb.bucket AND a.vec_id <> bb.vec_id
        )
        SELECT vec_id, neighbor, sim, rank FROM (
            SELECT *, row_number() OVER (
                PARTITION BY vec_id ORDER BY sim DESC, neighbor ASC
            ) AS rank
            FROM pr
        ) WHERE rank <= 3
    """

    # IDN canonicalization: expected punycode stated as literals
    sql["crawl_idn_canonical"] = """
        SELECT doc_id,
               'http://' || CASE doc_id % 4
                   WHEN 0 THEN 'xn--mnchen-3ya'
                   WHEN 1 THEN 'xn--bro-hoa'
                   WHEN 2 THEN 'xn--e1aybc'
                   ELSE 'plain' END
               || '.example/p/' || doc_id AS canonical_url
        FROM documents
    """

    # pair mining: mined og/alt rows stated in closed form
    sql["img_pair_mining"] = f"""
        SELECT doc_id,
               'http://docs-' || (doc_id % {N_DOC_HOSTS}) || '.test/img/'
                   || doc_id || '.jpg' AS image_url,
               CASE WHEN doc_id % 13 <> 0 THEN 'Caption ' || doc_id
                    ELSE 'Desc ' || doc_id END AS caption,
               'og' AS source
        FROM documents
        UNION ALL
        SELECT doc_id,
               'http://docs-' || (doc_id % {N_DOC_HOSTS}) || '.test/t/'
                   || doc_id AS image_url,
               'Alt ' || doc_id AS caption,
               'alt' AS source
        FROM documents WHERE doc_id % 7 <> 0
    """

    # bigram LM: counts, V, smoothing, ln and the decimal-exact
    # per-doc sum all replayed
    sql["doc_bigram_logprob"] = """
        WITH p AS (
            SELECT doc_id,
                   text || CASE WHEN doc_id % 10 = 0
                                THEN ' qq' || doc_id || ' ww' || doc_id
                                ELSE '' END AS text
            FROM documents
        ), t AS (
            SELECT doc_id,
                   string_split_regex(lower(trim(text)), ' +') AS toks
            FROM p
        ), occ AS (
            SELECT t.doc_id, t.toks[i.i + 1] AS a, t.toks[i.i + 2] AS b
            FROM t, LATERAL (
                SELECT unnest(range(len(t.toks) - 1)) AS i
            ) i
        ), uni AS (
            SELECT u.x AS a, count(*) AS c_a
            FROM t, LATERAL (SELECT unnest(t.toks) AS x) u
            GROUP BY u.x
        ), bi AS (
            SELECT a, b, count(*) AS c_ab FROM occ GROUP BY a, b
        ), v AS (SELECT count(*)::DOUBLE AS v FROM uni),
        s AS (
            SELECT occ.doc_id,
                   ln((bi.c_ab + 1)::DOUBLE
                      / (uni.c_a::DOUBLE + v.v))::DECIMAL(30,15) AS lp
            FROM occ JOIN bi USING (a, b) JOIN uni USING (a), v
        )
        SELECT t.doc_id,
               coalesce(g.n, 0)::BIGINT AS n_bigrams,
               g.avg_logprob
        FROM t LEFT JOIN (
            SELECT doc_id, count(*) AS n,
                   round(sum(lp)::DOUBLE / count(*), 9) AS avg_logprob
            FROM s GROUP BY doc_id
        ) g USING (doc_id)
    """

    # tf-idf keywords: tf/df/ln score + ranked window replayed
    sql["doc_tfidf_keywords"] = """
        WITH w AS (
            SELECT doc_id,
                   unnest(string_split_regex(lower(trim(text)), ' +'))
                       AS word
            FROM documents
        ), tf AS (
            SELECT doc_id, word, count(*) AS tf
            FROM w GROUP BY doc_id, word
        ), df AS (
            SELECT word, count(DISTINCT doc_id) AS df FROM w GROUP BY word
        ), n AS (SELECT count(*)::DOUBLE AS n FROM documents),
        s AS (
            SELECT tf.doc_id, tf.word, tf.tf, df.df,
                   round(tf.tf * ln(n.n / df.df::DOUBLE), 9) AS score
            FROM tf JOIN df USING (word), n
        )
        SELECT doc_id, word, tf, df, score, rank FROM (
            SELECT *, row_number() OVER (
                PARTITION BY doc_id ORDER BY score DESC, word ASC
            ) AS rank
            FROM s
        ) WHERE rank <= 3
    """

    # text capstone: the doc_quality_filter oracle embedded verbatim as
    # the gate CTE, then dedup window + cap predicate + BPE manifest
    sql["doc_corpus_build"] = f"""
        WITH gate AS ({sql["doc_quality_filter"]}),
        kept AS (
            SELECT d.doc_id,
                   'docs-' || (d.doc_id % {N_DOC_HOSTS}) || '.test' AS host,
                   d.text
            FROM documents d JOIN gate g ON d.doc_id = g.doc_id
            WHERE g.keep
        ), reps AS (
            SELECT doc_id, host, text FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY md5(text) ORDER BY doc_id) AS rn
                FROM kept
            ) WHERE rn = 1
        ), capped AS (
            SELECT doc_id, host, text FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY host
                    ORDER BY {unit.format(seed=9)}, doc_id) AS rn
                FROM reps
            ) WHERE rn <= 40
        )
        SELECT doc_id, host,
               len(regexp_extract_all(text, '{bpe_pat}'))::BIGINT
                   AS n_bpe_tokens
        FROM capped
    """

    # image capstone: gate -> caption dedup -> ladder -> batch cut,
    # every stage's proven algebra chained into one replay
    sql["img_training_batches"] = """
        WITH img AS (
            SELECT 'img-' || doc_id AS image_id,
                   (doc_id*40503 + 17) % 2048 + 16 AS w,
                   (doc_id*69069 + 5) % 2048 + 16 AS h,
                   CASE WHEN doc_id % 19 = 0 THEN ' img '
                        WHEN doc_id % 23 = 0 THEN 'photograph'
                        ELSE substring(text, 1, 180) END AS caption
            FROM documents
        ), kept AS (
            SELECT image_id, w, h, caption FROM img
            WHERE (w >= 64 AND h >= 64)
              AND greatest(w, h) <= 4 * least(w, h)
              AND trim(caption) <> ''
              AND length(trim(caption)) BETWEEN 5 AND 512
              AND length(regexp_split_to_array(trim(caption), '\\s+')) >= 2
        ), reps AS (
            SELECT image_id, w, h FROM (
                SELECT image_id, w, h,
                       row_number() OVER (
                           PARTITION BY md5(trim(lower(caption)))
                           ORDER BY w*h DESC, image_id ASC
                       ) AS rn
                FROM kept
            ) WHERE rn = 1
        ), d AS (
            SELECT image_id,
                   abs(w*1  - h*1 ) * 144 AS d_sq,
                   abs(w*3  - h*4 ) * 48  AS d_l43,
                   abs(w*4  - h*3 ) * 36  AS d_p34,
                   abs(w*9  - h*16) * 16  AS d_w169,
                   abs(w*16 - h*9 ) * 9   AS d_t916,
                   abs(w*2  - h*3 ) * 72  AS d_l32,
                   abs(w*3  - h*2 ) * 48  AS d_p23
            FROM reps
        ), b AS (
            SELECT image_id,
                   CASE WHEN d_sq = m THEN 'square_1_1'
                        WHEN d_l43 = m THEN 'landscape_4_3'
                        WHEN d_p34 = m THEN 'portrait_3_4'
                        WHEN d_w169 = m THEN 'wide_16_9'
                        WHEN d_t916 = m THEN 'tall_9_16'
                        WHEN d_l32 = m THEN 'landscape_3_2'
                        ELSE 'portrait_2_3' END AS bucket
            FROM (SELECT *, least(d_sq, d_l43, d_p34, d_w169, d_t916,
                                  d_l32, d_p23) AS m
                  FROM d)
        ), r AS (
            SELECT image_id, bucket,
                   row_number() OVER (
                       PARTITION BY bucket
                       ORDER BY ('0x' || substr(md5(image_id || '#11'),
                                 1, 15))::BIGINT::DOUBLE
                                / 1152921504606846976.0,
                                image_id
                   ) - 1 AS pos,
                   count(*) OVER (PARTITION BY bucket) AS n
            FROM b
        )
        SELECT image_id, bucket,
               (pos // 8)::BIGINT AS batch_id,
               (pos % 8)::INT AS slot
        FROM r WHERE pos < n - n % 8
    """

    # html->markdown: the exact rendered string stated in closed form
    sql["doc_html_markdown"] = f"""
        WITH n AS (SELECT count(*) AS n FROM documents)
        SELECT doc_id,
               '# Doc ' || doc_id || chr(10) || chr(10)
               || 'Intro **bold' || doc_id
               || '** and [link text](http://docs-'
               || (((doc_id * 7 + 1) % n.n) % {N_DOC_HOSTS})
               || '.test/d/' || ((doc_id * 7 + 1) % n.n)
               || ') .' || chr(10) || chr(10)
               || '- alpha ' || doc_id || chr(10) || '- beta' AS markdown
        FROM documents, n
    """

    # count-min: hashes, counters, min-query and exact counts replayed
    sql["crawl_host_frequency"] = """
        WITH v AS (
            SELECT CASE WHEN doc_id % 10 < 5 THEN 'big-a'
                        WHEN doc_id % 10 < 8 THEN 'big-b'
                        ELSE 'h' || (doc_id % 50) END AS host
            FROM documents
        ), rs(r) AS (VALUES (0), (1), (2), (3)),
        st AS (
            SELECT rs.r,
                   ('0x' || substr(md5(v.host || '#cm' || rs.r), 1, 15))
                       ::BIGINT % 256 AS slot,
                   count(*) AS cnt
            FROM v, rs GROUP BY 1, 2
        ), k AS (SELECT DISTINCT host FROM v),
        kh AS (
            SELECT k.host, rs.r,
                   ('0x' || substr(md5(k.host || '#cm' || rs.r), 1, 15))
                       ::BIGINT % 256 AS slot
            FROM k, rs
        ), est AS (
            SELECT kh.host,
                   min(coalesce(st.cnt, 0))::BIGINT AS est_count
            FROM kh LEFT JOIN st ON kh.r = st.r AND kh.slot = st.slot
            GROUP BY kh.host
        ), ex AS (
            SELECT host, count(*) AS exact_count FROM v GROUP BY host
        )
        SELECT ex.host, ex.exact_count, est.est_count,
               est.est_count >= ex.exact_count AS one_sided
        FROM ex JOIN est USING (host)
    """
    # streaming count-min: identical sketch, streaming counter agg
    sql["stream_host_frequency"] = sql["crawl_host_frequency"]

    # winnowing clusters: planted near-copies, full min-gram recompute
    # + one fingerprint window
    sql["doc_fingerprint_clusters"] = """
        WITH p AS (
            SELECT d.doc_id,
                   CASE WHEN d.doc_id % 2 = 1 AND prev.text IS NOT NULL
                        THEN prev.text || ' zz tail zz'
                        ELSE d.text END AS text
            FROM documents d
            LEFT JOIN documents prev ON prev.doc_id = d.doc_id - 1
        ), t AS (
            SELECT doc_id,
                   string_split_regex(lower(trim(text)), ' +') AS toks
            FROM p
        ), f AS (
            SELECT doc_id,
                   CASE WHEN len(toks) >= 8 THEN
                       list_min([md5(array_to_string(toks[i+1:i+8], ' '))
                                 FOR i IN generate_series(0, len(toks)-8)])
                   ELSE md5(array_to_string(toks, ' ')) END AS fingerprint
            FROM t
        )
        SELECT doc_id, fingerprint,
               min(doc_id) OVER (PARTITION BY fingerprint) AS fp_cluster,
               count(*) OVER (PARTITION BY fingerprint) AS n_group
        FROM f
    """

    # anchor rollup: planted anchors restated closed-form; aggregates
    # + deterministic-mode window replayed
    sql["crawl_anchor_rollup"] = f"""
        WITH a AS (
            SELECT d.doc_id AS src,
                   'http://docs-'
                       || (((d.doc_id * 7 + js.j * 11 + 1) % n.n)
                           % {N_DOC_HOSTS})
                       || '.test/d/'
                       || ((d.doc_id * 7 + js.j * 11 + 1) % n.n) AS href,
                   'anchor ' || js.j || ' of ' || d.doc_id AS anchor_text
            FROM documents d, (VALUES (0), (1), (2)) js(j),
                 (SELECT count(*) AS n FROM documents) n
        ), g AS (
            SELECT href, anchor_text, count(*) AS c
            FROM a GROUP BY href, anchor_text
        ), t AS (
            SELECT href, anchor_text,
                   row_number() OVER (
                       PARTITION BY href
                       ORDER BY c DESC, anchor_text ASC
                   ) AS rn
            FROM g
        ), s AS (
            SELECT href, count(*) AS n_inlinks,
                   count(DISTINCT src) AS n_sources
            FROM a GROUP BY href
        )
        SELECT s.href, s.n_inlinks, s.n_sources,
               t.anchor_text AS top_anchor_text
        FROM s JOIN t ON s.href = t.href AND t.rn = 1
    """

    # sitemap lastmod -> revisit: closed-form loc/lastmod + the exact
    # integer revisit algebra (max_exp = bit_length(32) = 6)
    sql["crawl_sitemap_lastmod"] = f"""
        WITH s AS (
            SELECT 'http://docs-' || (doc_id % {N_DOC_HOSTS})
                       || '.test/p/' || doc_id AS url,
                   (15 * 86400)::BIGINT AS last_fetch_ts,
                   (((doc_id % 28) + 1) * 86400)::BIGINT AS last_change_ts,
                   (doc_id % 10)::INT AS unchanged_count
            FROM documents
        ), u AS (
            SELECT *,
                   least(86400 * (1::BIGINT
                       << least(unchanged_count, 6)), 32 * 86400)
                       AS interval_s
            FROM s
        )
        SELECT url, last_fetch_ts, last_change_ts, unchanged_count,
               interval_s,
               (last_change_ts > last_fetch_ts
                OR (40 * 86400 - last_fetch_ts >= interval_s)) AS due,
               CASE WHEN NOT (last_change_ts > last_fetch_ts
                        OR (40 * 86400 - last_fetch_ts >= interval_s))
                    THEN 0
                    ELSE greatest(40 * 86400 - last_fetch_ts - interval_s,
                                  0)
               END AS overdue_s
        FROM u
    """

    # power iteration: 3 unrolled rounds — sequential-fold projections,
    # DECIMAL(30,15) order-independent sums, per-round round+normalize
    _x0 = "[" + ", ".join(
        "1.0" if i == 0 else "0.0" for i in range(64)
    ) + "]"
    _pw_parts = [f"x0 AS (SELECT {_x0}::DOUBLE[] AS x)"]
    for _k in range(1, 4):
        _pw_parts.append(f"""p{_k} AS (
            SELECT e.embedding,
                   list_reduce(list_concat([0.0], list_transform(range(64),
                       i -> e.embedding[i+1]::DOUBLE * x.x[i+1])),
                       (acc, v) -> acc + v) AS proj
            FROM embeddings e, x{_k - 1} x)""")
        _pw_parts.append(f"""s{_k} AS (
            SELECT u.dim, sum((u.v * p.proj)::DECIMAL(30,15))::DOUBLE AS m
            FROM p{_k} p, LATERAL (
                SELECT generate_subscripts(p.embedding, 1) - 1 AS dim,
                       unnest(p.embedding)::DOUBLE AS v) u
            GROUP BY u.dim)""")
        _pw_parts.append(
            f"g{_k} AS (SELECT list(m ORDER BY dim) AS y FROM s{_k})"
        )
        _pw_parts.append(f"""x{_k} AS (
            SELECT list_transform(y, v -> round(v / sqrt(
                list_reduce(list_concat([0.0],
                    list_transform(y, w -> w * w)),
                    (acc, v2) -> acc + v2)), 9)) AS x
            FROM g{_k})""")
    sql["emb_top_component"] = (
        "WITH " + ",\n".join(_pw_parts)
        + """
        SELECT u.dim, u.c AS component
        FROM x3, LATERAL (
            SELECT generate_subscripts(x3.x, 1) - 1 AS dim,
                   unnest(x3.x) AS c) u
    """
    )

    # projection composition: the same 3-round chain + per-vector dot
    sql["emb_pca_project"] = (
        "WITH " + ",\n".join(_pw_parts)
        + """
        SELECT e.vec_id,
               round(list_reduce(list_concat([0.0], list_transform(
                   range(64),
                   i -> e.embedding[i+1]::DOUBLE * x3.x[i+1])),
                   (acc, v) -> acc + v), 6) AS coord
        FROM embeddings e, x3
    """
    )

    # length distribution: exact interpolated quantiles + stddev —
    # two engines, one closed-form definition
    sql["doc_length_stats"] = f"""
        WITH t AS (
            SELECT len(regexp_extract_all(text, '{bpe_pat}'))::BIGINT AS t
            FROM documents
        ), q AS (
            SELECT count(*) AS n_docs, min(t) AS min_tokens,
                   max(t) AS max_tokens,
                   round(avg(t), 6) AS mean_tokens,
                   round(stddev_samp(t), 6) AS std_tokens,
                   quantile_cont(t, [0.5, 0.9, 0.99]) AS p
            FROM t
        )
        SELECT n_docs, min_tokens, max_tokens, mean_tokens, std_tokens,
               round(p[1], 6) AS p50_tokens,
               round(p[2], 6) AS p90_tokens,
               round(p[3], 6) AS p99_tokens
        FROM q
    """

    # streaming CDC: the batch snapshot algebra restricted to the
    # new-capture side (stream-static left join — no 'gone')
    sql["stream_snapshot_delta"] = f"""
        WITH o AS (
            SELECT 'http://docs-' || (doc_id % {N_DOC_HOSTS})
                       || '.test/p/' || doc_id AS url,
                   md5(text) AS digest,
                   (doc_id % 6)::INT AS unchanged_count
            FROM documents WHERE doc_id % 17 <> 0
        ), nw AS (
            SELECT 'http://docs-' || (doc_id % {N_DOC_HOSTS})
                       || '.test/p/' || doc_id AS url,
                   md5(CASE WHEN doc_id % 7 = 0 THEN text || 'v2'
                            ELSE text END) AS digest
            FROM documents WHERE doc_id % 13 <> 0
        )
        SELECT nw.url, o.digest AS old_digest, nw.digest AS new_digest,
               CASE WHEN o.url IS NULL THEN 'new'
                    WHEN o.digest <> nw.digest THEN 'changed'
                    ELSE 'unchanged' END AS status,
               (CASE WHEN o.url IS NULL THEN 0
                     WHEN o.digest <> nw.digest THEN 0
                     ELSE o.unchanged_count + 1 END)::INT
                   AS next_unchanged_count
        FROM nw LEFT JOIN o ON nw.url = o.url
    """

    # language mixture: the full lang-ID CTE chained into the rollup
    sql["doc_lang_mixture"] = f"""
        WITH t AS (
            SELECT doc_id, text,
                   string_split_regex(lower(trim(text)), ' +') AS toks
            FROM documents
        ), h AS (
            SELECT doc_id, text, {hit_cols},
                   greatest(
                       len(list_filter(toks, x -> x IN {lang_hits['en']})),
                       len(list_filter(toks, x -> x IN {lang_hits['de']})),
                       len(list_filter(toks, x -> x IN {lang_hits['fr']})),
                       len(list_filter(toks, x -> x IN {lang_hits['es']}))
                   ) AS best
            FROM t
        ), l AS (
            SELECT text,
                   CASE
                     WHEN h_de > 0 AND h_de = best THEN 'de'
                     WHEN h_en > 0 AND h_en = best THEN 'en'
                     WHEN h_es > 0 AND h_es = best THEN 'es'
                     WHEN h_fr > 0 AND h_fr = best THEN 'fr'
                     ELSE 'und'
                   END AS source
            FROM h
        ), g AS (
            SELECT source, count(*) AS n_docs,
                   sum(len(regexp_extract_all(text, '{bpe_pat}')))::BIGINT
                       AS total_tokens
            FROM l GROUP BY source
        ),
        a AS (SELECT sum(total_tokens) AS all_tokens FROM g)
        SELECT source, n_docs, total_tokens,
               round(total_tokens / a.all_tokens::DOUBLE, 6) AS token_share
        FROM g, a
    """

    # rel=canonical collapse: closed-form group identity + keep rule
    sql["crawl_canonical_collapse"] = f"""
        WITH base AS (
            SELECT doc_id,
                   'http://docs-' || (doc_id % {N_DOC_HOSTS})
                       || '.test/p/' || doc_id AS url,
                   doc_id - doc_id % 5 AS leader
            FROM documents
        ), c AS (
            SELECT url,
                   CASE WHEN doc_id % 5 = 0 OR doc_id % 13 = 0 THEN url
                        ELSE 'http://docs-' || (leader % {N_DOC_HOSTS})
                             || '.test/p/' || leader END AS canonical_url
            FROM base
        )
        SELECT canonical_url, count(*) AS n_captures,
               coalesce(
                   min(CASE WHEN url = canonical_url THEN url END),
                   min(url)
               ) AS kept_url
        FROM c GROUP BY canonical_url
    """

    # batch assembly: ladder argmin + unit-hash-ordered window cut
    sql["img_bucket_batches"] = """
        WITH img AS (
            SELECT 'img-' || doc_id AS image_id,
                   (doc_id*40503 + 17) % 2048 + 16 AS w,
                   (doc_id*69069 + 5) % 2048 + 16 AS h
            FROM documents
        ), d AS (
            SELECT image_id, w, h,
                   abs(w*1  - h*1 ) * 144 AS d_sq,
                   abs(w*3  - h*4 ) * 48  AS d_l43,
                   abs(w*4  - h*3 ) * 36  AS d_p34,
                   abs(w*9  - h*16) * 16  AS d_w169,
                   abs(w*16 - h*9 ) * 9   AS d_t916,
                   abs(w*2  - h*3 ) * 72  AS d_l32,
                   abs(w*3  - h*2 ) * 48  AS d_p23
            FROM img
        ), b AS (
            SELECT image_id,
                   CASE WHEN d_sq = m THEN 'square_1_1'
                        WHEN d_l43 = m THEN 'landscape_4_3'
                        WHEN d_p34 = m THEN 'portrait_3_4'
                        WHEN d_w169 = m THEN 'wide_16_9'
                        WHEN d_t916 = m THEN 'tall_9_16'
                        WHEN d_l32 = m THEN 'landscape_3_2'
                        ELSE 'portrait_2_3' END AS bucket
            FROM (SELECT *, least(d_sq, d_l43, d_p34, d_w169, d_t916,
                                  d_l32, d_p23) AS m
                  FROM d)
        ), r AS (
            SELECT image_id, bucket,
                   row_number() OVER (
                       PARTITION BY bucket
                       ORDER BY ('0x' || substr(md5(image_id || '#3'),
                                 1, 15))::BIGINT::DOUBLE
                                / 1152921504606846976.0,
                                image_id
                   ) - 1 AS pos,
                   count(*) OVER (PARTITION BY bucket) AS n
            FROM b
        )
        SELECT image_id, bucket,
               (pos // 8)::BIGINT AS batch_id,
               (pos % 8)::INT AS slot
        FROM r WHERE pos < n - n % 8
    """

    # vocab induction: explode + two aggregates + ranked cut
    sql["doc_vocab_topk"] = """
        WITH w AS (
            SELECT doc_id,
                   unnest(string_split_regex(lower(trim(text)), ' +'))
                       AS word
            FROM documents
        ), c AS (
            SELECT word, count(*) AS n_occurrences,
                   count(DISTINCT doc_id) AS n_docs
            FROM w GROUP BY word
        ), r AS (
            SELECT word, n_occurrences, n_docs,
                   row_number() OVER (
                       ORDER BY n_occurrences DESC, word ASC
                   ) AS rank
            FROM c
        )
        SELECT word, n_occurrences, n_docs, rank FROM r WHERE rank <= 100
    """

    # C4 cleaning rules: line filter lambda, rejoin, sentence count and
    # the three page gates replayed over the same planted pages
    sql["doc_c4_filter"] = """
        WITH p AS (
            SELECT doc_id,
                   concat_ws(chr(10),
                       substr(text, 1, 100) || '.',
                       'Home About Contact',
                       CASE WHEN doc_id % 4 = 0 THEN
                           'Please enable JavaScript in your browser.' END,
                       CASE WHEN doc_id % 31 <> 0 THEN
                           substr(text, 101, 80) || '?' END,
                       CASE WHEN doc_id % 23 = 0 THEN
                           'function f() { return 1; }' END,
                       CASE WHEN doc_id % 29 = 0 THEN
                           'Lorem ipsum dolor sit amet.' END
                   ) AS text
            FROM documents
        ), k AS (
            SELECT doc_id, text,
                   list_filter(
                       string_split(text, chr(10)),
                       l -> regexp_matches(trim(l), '[.!?"]$')
                            AND NOT contains(lower(l), 'javascript')
                   ) AS kept
            FROM p
        ), c AS (
            SELECT doc_id, text, kept,
                   array_to_string(kept, chr(10)) AS clean_text,
                   len(regexp_extract_all(
                       array_to_string(kept, chr(10)), '[.!?]'))::INT
                       AS n_sentences
            FROM k
        )
        SELECT doc_id, clean_text,
               len(kept)::INT AS n_lines_kept,
               n_sentences,
               contains(text, '{') AS has_brace,
               contains(lower(text), 'lorem ipsum') AS has_lorem,
               (n_sentences >= 2
                AND NOT contains(text, '{')
                AND NOT contains(lower(text), 'lorem ipsum')) AS keep
        FROM c
    """

    # sliding-window chunking: tokenization, stride lattice, bounds and
    # reconstructed window text replayed (list_slice is 1-based
    # inclusive-inclusive, hence start_tok+1 .. end_tok)
    sql["doc_chunk_windows"] = """
        WITH t AS (
            SELECT doc_id,
                   string_split_regex(trim(text), ' +') AS toks,
                   len(string_split_regex(trim(text), ' +')) AS n_tokens
            FROM documents
        ), w AS (
            SELECT doc_id, toks, n_tokens, s.start_tok,
                   (s.start_tok / 16)::INT AS window_id,
                   least(s.start_tok + 24, n_tokens) AS end_tok
            FROM t, LATERAL (
                SELECT unnest(generate_series(
                    0, greatest(n_tokens - 1, 0), 16)) AS start_tok
            ) s
        )
        SELECT doc_id, window_id, start_tok, end_tok,
               end_tok - start_tok AS n_window_tokens,
               array_to_string(
                   list_slice(toks, start_tok + 1, end_tok), ' '
               ) AS window_text
        FROM w
    """

    # SemDeDup: full IVF replay (the emb_knn_ivf CTE chain) + the
    # within-cell dominated-by-lower-id rule — every step value-checked
    sql["emb_semantic_dedup"] = f"""
        WITH e AS (SELECT vec_id, embedding FROM embeddings),
        c0 AS (
            SELECT vec_id AS cid,
                   list_transform(embedding, x -> round(x::DOUBLE, 6))
                       AS centroid
            FROM e WHERE vec_id < 16
        ),{_ivf_iteration(0)},{_ivf_iteration(1)},
        afinal AS (
            SELECT vec_id, cid FROM (
                SELECT e.vec_id, c.cid,
                       row_number() OVER (
                           PARTITION BY e.vec_id
                           ORDER BY {_d2("e.embedding", "c.centroid")} ASC,
                                    c.cid ASC
                       ) AS rn
                FROM e CROSS JOIN c2v c
            ) WHERE rn = 1
        ), dom AS (
            SELECT b.vec_id AS id_b, min(a.vec_id) AS dup_of
            FROM e a JOIN afinal aa ON a.vec_id = aa.vec_id
                 JOIN afinal ab ON aa.cid = ab.cid
                 JOIN e b ON b.vec_id = ab.vec_id
            WHERE a.vec_id < b.vec_id
              AND round({_dot("a.embedding", "b.embedding")}
                        / ({_norm("a.embedding")}
                           * {_norm("b.embedding")}), 4)
                  + 0.0 >= 0.4
            GROUP BY b.vec_id
        )
        SELECT e.vec_id, afinal.cid, dom.dup_of,
               dom.dup_of IS NULL AS keep
        FROM e JOIN afinal ON e.vec_id = afinal.vec_id
             LEFT JOIN dom ON e.vec_id = dom.id_b
    """

    # composed centrality feedback: link extraction's own ground truth
    # (the planted target set) -> host edges -> unrolled power method
    # -> priority ordering on the rounded rank
    _prio_edges = f"""
        SELECT DISTINCT 'docs-' || (d.doc_id % {N_DOC_HOSTS}) || '.test'
                   AS src,
               'docs-' || (((d.doc_id * 7 + js.j * 11 + 1) % n.n)
                   % {N_DOC_HOSTS}) || '.test' AS dst
        FROM documents d, (VALUES (0), (1), (2)) js(j),
             (SELECT count(*) AS n FROM documents) n
    """
    sql["crawl_pagerank_priority"] = f"""
        SELECT node AS host, round(rank, 7) AS pagerank,
               row_number() OVER (
                   ORDER BY round(rank, 7) DESC, node ASC
               ) AS priority
        FROM ({pagerank_oracle_cte(_prio_edges, iters=3, damping=0.85)})
    """

    # incremental-crawl CDC: full-outer-join + status/counter algebra
    # replayed verbatim over the same two synthesized snapshots
    sql["crawl_snapshot_delta"] = f"""
        WITH o AS (
            SELECT 'http://docs-' || (doc_id % {N_DOC_HOSTS})
                       || '.test/p/' || doc_id AS url,
                   md5(text) AS digest,
                   (doc_id % 6)::INT AS unchanged_count
            FROM documents WHERE doc_id % 17 <> 0
        ), nw AS (
            SELECT 'http://docs-' || (doc_id % {N_DOC_HOSTS})
                       || '.test/p/' || doc_id AS url,
                   md5(CASE WHEN doc_id % 7 = 0 THEN text || 'v2'
                            ELSE text END) AS digest
            FROM documents WHERE doc_id % 13 <> 0
        ), j AS (
            SELECT o.url AS ourl, o.digest AS old_digest,
                   o.unchanged_count, nw.url AS nurl,
                   nw.digest AS new_digest
            FROM o FULL OUTER JOIN nw ON o.url = nw.url
        )
        SELECT coalesce(ourl, nurl) AS url, old_digest, new_digest,
               CASE WHEN ourl IS NULL THEN 'new'
                    WHEN nurl IS NULL THEN 'gone'
                    WHEN old_digest <> new_digest THEN 'changed'
                    ELSE 'unchanged' END AS status,
               (CASE WHEN ourl IS NULL THEN 0
                     WHEN nurl IS NULL THEN NULL
                     WHEN old_digest <> new_digest THEN 0
                     ELSE unchanged_count + 1 END)::INT
                   AS next_unchanged_count
        FROM j
    """

    return sql


# ---------------------------------------------------------------------------
# flagship entry
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: synthesize the crawl corpus from sf0.001 documents,
    css-extract + canonicalize the planted links, and aggregate the
    in-degree per target host — parse, select, canonicalize, explode,
    aggregate in one plan."""
    sf_dir = "/root/testdata/sf0.001"
    links = q_crawl_extract_links(spark, sf_dir)
    return (
        links.withColumn("host", F.parse_url("url", F.lit("HOST")))
        .groupBy("host")
        .agg(
            F.count(F.lit(1)).alias("n_links"),
            F.count_distinct("url").alias("n_distinct_targets"),
        )
        .orderBy("host")
    )
