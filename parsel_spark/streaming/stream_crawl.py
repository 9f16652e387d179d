"""Structured Streaming variants of the crawl operators.

The batch crawl is wave-synchronous (exact-parity requirement); this
module provides the streaming shape for continuous ingest: a stream of
fetched pages → vectorized link extraction → canonicalization →
watermarked streaming dedup → frontier-delta sink.  The same pandas
UDFs run unchanged on streaming DataFrames.

Politeness in streaming mode uses ``applyInPandasWithState`` with a
per-host token-bucket GroupState — same arithmetic as the batch gate.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..functions.canonical import resolve_udf
from ..functions.udfs import css_getall
from ..operators.frontier import TOKEN_CAP


def read_page_stream(
    spark: SparkSession, input_path: str, schema: str | None = None
) -> DataFrame:
    """File-source stream of page rows (one parquet batch per micro-run)."""
    schema = schema or (
        "url string, host string, html string, fetched_at timestamp"
    )
    return spark.readStream.schema(schema).parquet(input_path)


def extract_link_stream(pages: DataFrame) -> DataFrame:
    """Streaming link extraction + canonicalization + per-watermark
    dedup.  ``dropDuplicatesWithinWatermark`` bounds the dedup state —
    the global exact seen-set still lives in the snapshot tables and is
    applied by the batch join of each micro-run's output."""
    links = pages.withWatermark("fetched_at", "10 minutes").select(
        F.col("url").alias("src_url"),
        "fetched_at",
        F.explode(css_getall("html", "a::attr(href)")).alias("href"),
    )
    resolved = links.select(
        resolve_udf("src_url", "href").alias("url"), "fetched_at"
    ).filter(F.col("url").isNotNull())
    return resolved.withColumn(
        "url_hash", F.xxhash64("url")
    ).dropDuplicatesWithinWatermark(["url"])


def politeness_stream(pages: DataFrame, crawl_delay_s: float = 1.0) -> DataFrame:
    """Stateful per-host token bucket over a page-request stream
    (``applyInPandasWithState``): emits the requests each host may fetch
    now; carries the token balance as GroupState."""

    out_schema = "host string, url string, allowed boolean"
    state_schema = "tokens double"

    def gate(
        key: tuple,
        batches: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        (host,) = key
        tokens = state.get[0] if state.exists else 1.0
        tokens = min(TOKEN_CAP, tokens + 1.0 / crawl_delay_s)
        out = []
        for pdf in batches:
            allowed = []
            for _ in range(len(pdf)):
                if tokens >= 1.0:
                    tokens -= 1.0
                    allowed.append(True)
                else:
                    allowed.append(False)
            out.append(
                pd.DataFrame(
                    {"host": host, "url": pdf["url"], "allowed": allowed}
                )
            )
        state.update((tokens,))
        yield from out

    return pages.groupBy("host").applyInPandasWithState(
        gate,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_stream_to_frontier(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint: str,
    available_now: bool = True,
):
    """Wire the streaming pipeline to a parquet frontier-delta sink."""
    stream = extract_link_stream(read_page_stream(spark, input_path))
    writer = (
        stream.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
