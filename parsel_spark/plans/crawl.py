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
        filter_kind: str = "bloom",
    ) -> None:
        self.spark = spark
        self.catalog = catalog
        self.pages = pages
        self.robots = robots
        self.num_shards = num_shards
        # "bloom" (default) or "cuckoo" — cuckoo supports forget()
        self.filter_kind = filter_kind
        self.frontier_partitions = (
            frontier_partitions or spark.sparkContext.defaultParallelism
        )
        # broadcast the dequeued url set into the fetch join (html never
        # shuffles); disable when waves exceed broadcast-safe sizes
        self.broadcast_fetch = True

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
        bloom = fr.bloom_update(seen, empty_bloom, self.num_shards, kind=self.filter_kind)
        crawl_log = spark.createDataFrame(
            [],
            "wave int, url string, url_hash long, host string, priority double, "
            "seq long",
        )
        self._commit(
            wave=0,
            frontier=frontier0,
            host_state=host_state,
            seen_delta=seen,
            bloom=bloom,
            crawl_log_delta=crawl_log,
            metrics={"dequeued": 0, "new_urls": int(seen.count()), "fetched": 0},
        )

    # -- one wave --------------------------------------------------------
    def run_wave(self) -> dict[str, Any]:
        spark = self.spark
        snapshot = self.catalog.load_snapshot()
        assert snapshot is not None, "initialize() first"
        wave = snapshot.wave
        frontier = self.catalog.read_table(spark, "frontier").cache()
        host_state = self.catalog.read_table(spark, "host_state")
        seen = self.catalog.read_table(spark, "seen")
        bloom = self.catalog.read_table(spark, "bloom")

        from pyspark.sql import Observation

        dequeued, new_host_state = fr.politeness_dequeue(frontier, host_state)
        dequeued = dequeued.cache()

        # broadcast anti-join: the (small) dequeued set streams past the
        # frontier map-side — no frontier shuffle
        remaining = frontier.join(
            F.broadcast(dequeued.select("url")), "url", "left_anti"
        )

        # "fetch": filter the corpus down to the dequeued urls.  The
        # dequeued set is broadcast (left_semi) so the html payload column
        # never shuffles; disable for waves beyond broadcast size.
        wanted = dequeued.select("url")
        if self.broadcast_fetch:
            wanted = F.broadcast(wanted)
        page_hits = self.pages.select("url", "html").join(wanted, "url", "left_semi")
        obs_links = Observation(f"links_w{wave}")
        links = (
            fr.extract_wave_links(page_hits)
            .dropDuplicates(["url"])
            .observe(obs_links, F.count(F.lit(1)).alias("n"))
        )
        allowed = fr.robots_filter(links, self.robots)
        probed = fr.bloom_prefilter(allowed, bloom, self.num_shards, kind=self.filter_kind)
        new_urls = fr.exact_new_filter(probed, seen).cache()

        # union is map-only: remaining is a filtered re-read of the prior
        # frontier files; no repartition shuffle — partition count stays
        # bounded at (prior files + shuffle partitions of the new rows)
        new_frontier = remaining.unionByName(fr.new_frontier_rows(new_urls, wave))
        new_bloom = fr.bloom_update(new_urls, bloom, self.num_shards, kind=self.filter_kind)

        # wave metrics ride the snapshot writes via observe() — no extra
        # count jobs
        obs_deq = Observation(f"deq_w{wave}")
        log_delta = dequeued.select(
            F.lit(wave + 1).alias("wave"),
            "url",
            "url_hash",
            "host",
            "priority",
            "seq",
        ).observe(obs_deq, F.count(F.lit(1)).alias("n"))
        obs_new = Observation(f"new_w{wave}")
        seen_delta = new_urls.select("url", "url_hash").observe(
            obs_new, F.count(F.lit(1)).alias("n")
        )
        self._commit(
            wave=wave + 1,
            frontier=new_frontier,
            host_state=new_host_state,
            seen_delta=seen_delta,
            bloom=new_bloom,
            crawl_log_delta=log_delta,
            metrics=None,
        )
        metrics = {
            "dequeued": int(obs_deq.get["n"]),
            "new_urls": int(obs_new.get["n"]),
            "links_extracted": int(obs_links.get["n"]),
        }
        self._amend_metrics(metrics)
        frontier.unpersist()
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

    # -- deletions (recrawl policies) -------------------------------------
    def forget(self, urls: DataFrame) -> int:
        """Remove URLs from the seen-set so they can be re-discovered and
        re-crawled (e.g. recrawl-after-TTL policies).  Requires the
        cuckoo filter backend — bloom filters cannot delete.  Commits a
        new snapshot; returns the number of URLs forgotten."""
        if self.filter_kind != "cuckoo":
            raise ValueError(
                "forget() requires CrawlRun(filter_kind='cuckoo'); the "
                "bloom backend cannot delete"
            )
        spark = self.spark
        snapshot = self.catalog.load_snapshot()
        assert snapshot is not None, "initialize() first"
        seen = self.catalog.read_table(spark, "seen")
        bloom = self.catalog.read_table(spark, "bloom")
        targets = seen.join(
            F.broadcast(urls.select("url")), "url", "left_semi"
        ).cache()
        n_forgotten = targets.count()
        new_seen = seen.join(F.broadcast(urls.select("url")), "url", "left_anti")
        new_bloom = fr.bloom_update(
            targets, bloom, self.num_shards, kind=self.filter_kind, delete=True
        )
        # deletions rewrite the cumulative seen table (a full rewrite is
        # the cost of forgetting; it happens at recrawl cadence, not
        # per-wave)
        self.catalog.commit(
            wave=snapshot.wave,
            tables={
                "frontier": self.catalog.read_table(spark, "frontier"),
                "host_state": self.catalog.read_table(spark, "host_state"),
                "bloom": new_bloom,
                "seen": new_seen,
                "crawl_log": self.catalog.read_table(spark, "crawl_log"),
            },
            metrics={"forgotten": int(n_forgotten)},
        )
        targets.unpersist()
        return int(n_forgotten)

    # -- snapshot plumbing ----------------------------------------------
    def _commit(
        self,
        wave: int,
        frontier: DataFrame,
        host_state: DataFrame,
        seen_delta: DataFrame,
        bloom: DataFrame,
        crawl_log_delta: DataFrame,
        metrics: dict[str, Any] | None,
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
        metrics = dict(metrics) if metrics else {}
        if metrics:
            metrics["urls_emitted"] = metrics.get("new_urls", 0)
            metrics["urls_dequeued"] = metrics.get("dequeued", 0)
        self.catalog.commit(
            wave=wave,
            tables={
                "frontier": frontier,
                "host_state": host_state,
                "bloom": bloom,
            },
            appends={
                "seen": seen_delta,  # cumulative: O(Δ) write per wave
                "crawl_log": crawl_log_delta,
            },
            lineage=lineage,
            metrics=metrics,
        )
        bloom.unpersist()

    def _amend_metrics(self, metrics: dict[str, Any]) -> None:
        """Fill wave counters (observed during the data-file writes) into
        the just-committed snapshot's metadata."""
        import json
        import os

        snapshot_id = self.catalog.current_snapshot_id()
        if snapshot_id is None:
            return
        meta_path = os.path.join(
            self.catalog.metadata_dir, f"v{snapshot_id:04d}.json"
        )
        with open(meta_path) as fh:
            raw = json.load(fh)
        raw["metrics"] = {
            **metrics,
            "urls_emitted": metrics.get("new_urls", 0),
            "urls_dequeued": metrics.get("dequeued", 0),
        }
        with open(meta_path, "w") as fh:
            json.dump(raw, fh, indent=1)

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
