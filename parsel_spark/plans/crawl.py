"""Crawl-wave planner: the driver-side iterative loop composing the
frontier operators into waves, checkpointing each wave to the snapshot
catalog (SURVEY.md §3.4).

Each wave:

    frontier(t) ── politeness dequeue (salted window + token bucket)
       │                 │
       │                 ├─► "fetch" (join on pages table) ─► extract links
       │                 │        (vectorized css UDF; html never shuffles)
       │                 ▼
       │          crawl_log(t) append
       ▼
    remaining + robots-allowed, bloom-prefiltered, exactly-deduped new
    links  ─►  frontier(t+1);  seen/bloom/host-state updated;  snapshot
    committed with per-shard lineage.

Materializing state per wave through the snapshot (parquet write + read
back) both truncates the logical-plan lineage (essential for iterative
DataFrame loops) and IS the resumability mechanism.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.canonical import canonicalize_udf
from ..operators import frontier as fr
from ..sources.snapshots import SnapshotCatalog

DEFAULT_NUM_SHARDS = 32


class CrawlRun:
    """Wave-synchronous crawl over a pages corpus with snapshot resume."""

    def __init__(
        self,
        spark: SparkSession,
        catalog: SnapshotCatalog,
        pages: DataFrame,
        robots: DataFrame,
        num_shards: int = DEFAULT_NUM_SHARDS,
        frontier_partitions: int | None = None,
    ) -> None:
        self.spark = spark
        self.catalog = catalog
        self.pages = pages
        self.robots = robots
        self.num_shards = num_shards
        self.frontier_partitions = (
            frontier_partitions or spark.sparkContext.defaultParallelism
        )

    # -- initialization --------------------------------------------------
    def initialize(self, seeds: DataFrame) -> None:
        """Wave-0 state from the seed list; commits snapshot v1."""
        spark = self.spark
        canonical_seeds = seeds.select(
            canonicalize_udf("url").alias("url"), "priority", "seq"
        )
        frontier0 = canonical_seeds.select(
            "url",
            F.xxhash64("url").alias("url_hash"),
            F.parse_url("url", F.lit("HOST")).alias("host"),
            "priority",
            "seq",
            F.lit(0).alias("discovered_wave"),
        ).repartition(self.frontier_partitions, "url")

        host_state = self.robots.select(
            "host",
            F.lit(fr.INITIAL_TOKENS).alias("tokens"),
            "crawl_delay",
            "max_fetch_per_wave",
        )
        seen = frontier0.select("url", "url_hash")
        empty_bloom = spark.createDataFrame([], fr.BLOOM_SCHEMA)
        bloom = fr.bloom_update(seen, empty_bloom, self.num_shards)
        crawl_log = spark.createDataFrame(
            [],
            "wave int, url string, url_hash long, host string, priority double, "
            "seq long",
        )
        self._commit(
            wave=0,
            frontier=frontier0,
            host_state=host_state,
            seen=seen,
            bloom=bloom,
            crawl_log=crawl_log,
            metrics={"dequeued": 0, "new_urls": int(seen.count()), "fetched": 0},
        )

    # -- one wave --------------------------------------------------------
    def run_wave(self) -> dict[str, Any]:
        spark = self.spark
        snapshot = self.catalog.load_snapshot()
        assert snapshot is not None, "initialize() first"
        wave = snapshot.wave
        frontier = self.catalog.read_table(spark, "frontier")
        host_state = self.catalog.read_table(spark, "host_state")
        seen = self.catalog.read_table(spark, "seen")
        bloom = self.catalog.read_table(spark, "bloom")
        crawl_log = self.catalog.read_table(spark, "crawl_log")

        dequeued, new_host_state = fr.politeness_dequeue(frontier, host_state)
        dequeued = dequeued.cache()
        n_dequeued = dequeued.count()

        remaining = frontier.join(dequeued.select("url"), "url", "left_anti")

        fetched = dequeued.join(
            self.pages.select("url", "html"), "url", "left"
        )
        links = fr.extract_wave_links(
            fetched.filter(F.col("html").isNotNull())
        ).dropDuplicates(["url"])
        allowed = fr.robots_filter(links, self.robots)
        probed = fr.bloom_prefilter(allowed, bloom, self.num_shards)
        new_urls = fr.exact_new_filter(probed, seen).cache()
        n_new = new_urls.count()

        new_frontier = remaining.unionByName(
            fr.new_frontier_rows(new_urls, wave)
        ).repartition(self.frontier_partitions, "url")
        new_seen = seen.unionByName(new_urls.select("url", "url_hash"))
        new_bloom = fr.bloom_update(new_urls, bloom, self.num_shards)
        new_log = crawl_log.unionByName(
            dequeued.select(
                F.lit(wave + 1).alias("wave"),
                "url",
                "url_hash",
                "host",
                "priority",
                "seq",
            )
        )
        metrics = {"dequeued": int(n_dequeued), "new_urls": int(n_new)}
        self._commit(
            wave=wave + 1,
            frontier=new_frontier,
            host_state=new_host_state,
            seen=new_seen,
            bloom=new_bloom,
            crawl_log=new_log,
            metrics=metrics,
        )
        dequeued.unpersist()
        new_urls.unpersist()
        return metrics

    def run(self, waves: int) -> list[dict[str, Any]]:
        out = []
        for _ in range(waves):
            metrics = self.run_wave()
            out.append(metrics)
            if metrics["dequeued"] == 0:
                break
        return out

    # -- snapshot plumbing ----------------------------------------------
    def _commit(
        self,
        wave: int,
        frontier: DataFrame,
        host_state: DataFrame,
        seen: DataFrame,
        bloom: DataFrame,
        crawl_log: DataFrame,
        metrics: dict[str, Any],
    ) -> None:
        # per-partition lineage: shard id + bitmap content hash + counters
        bloom = bloom.cache()
        lineage = [
            {
                "partition_id": int(row["shard_id"]),
                "bloom_shard_hash": int(row["shard_hash"]),
                "n_items": int(row["n_items"]),
            }
            for row in bloom.select("shard_id", "shard_hash", "n_items").collect()
        ]
        metrics = dict(metrics)
        metrics["urls_emitted"] = metrics.get("new_urls", 0)
        metrics["urls_dequeued"] = metrics.get("dequeued", 0)
        self.catalog.commit(
            wave=wave,
            tables={
                "frontier": frontier,
                "host_state": host_state,
                "seen": seen,
                "bloom": bloom,
                "crawl_log": crawl_log,
            },
            lineage=lineage,
            metrics=metrics,
        )
        bloom.unpersist()

    # -- results ---------------------------------------------------------
    def crawl_order(self) -> list[tuple[int, str]]:
        """Deterministic global crawl order: (wave, rank-within-wave)."""
        log = self.catalog.read_table(self.spark, "crawl_log")
        rows = log.orderBy(
            "wave", F.desc("priority"), "seq", "url_hash", "url"
        ).collect()
        return [(int(r["wave"]), r["url"]) for r in rows]

    def seen_set(self) -> set[str]:
        seen = self.catalog.read_table(self.spark, "seen")
        return {r["url"] for r in seen.select("url").collect()}
