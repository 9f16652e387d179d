"""Ingest-time corpus bucketing — the disk layout a 100 TB fetch corpus
actually ships with.

``CrawlRun.prepare_pages`` repartitions + CACHES the corpus per run —
right for benches and for corpora that fit cluster memory, impossible
at 100 TB.  The production pattern is to pay the hash(url) shuffle ONCE
at ingest by writing a BUCKETED parquet table: every later run scans it
with bucket-aware planning and the fetch join's corpus side reports
``hashpartitioning(url, n_buckets)`` straight off the scan — no
exchange of the html column, ever, in any number of crawl runs.

This is plain public Spark bucketing (``DataFrameWriter.bucketBy`` +
``saveAsTable``; Hive-style bucket files, murmur3 on the bucket
column), wrapped so the contract — sorted-by-url buckets, the column
subset the crawl loop needs, bucket-pruning-friendly layout — lives in
one place.  The tests pin the plan property that matters: a join
against the bucketed table leaves the corpus side Exchange-free.

Reference counterpart: none — parsel never persists a corpus; this is
part of the distributed layer the graft adds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed_corpus(
    pages: DataFrame,
    table: str,
    n_buckets: int = 256,
    mode: str = "overwrite",
) -> None:
    """Persist (url, html, ...) as a parquet table bucketed AND sorted
    by url — the once-at-ingest shuffle that every later crawl run's
    fetch join rides for free.  ``n_buckets`` is the corpus's permanent
    join parallelism: size it so one bucket's html fits an executor
    core's working memory at full scale (256 buckets × ~400 GB/bucket
    at 100 TB; raise for bigger corpora)."""
    (
        pages.write.mode(mode)
        .format("parquet")
        .bucketBy(n_buckets, "url")
        .sortBy("url")
        .saveAsTable(table)
    )


def read_bucketed_corpus(spark: SparkSession, table: str) -> DataFrame:
    """Scan the bucketed corpus table (bucket-aware: the scan itself
    reports hash(url) partitioning to the planner, so joins keyed on
    url need no corpus-side exchange)."""
    return spark.table(table)
