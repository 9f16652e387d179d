"""Benchmark harness.

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line::

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The headline ``frontier_throughput`` entry reports URLs
dequeued+extracted per second for a crawl over a synthetic corpus scaled
to the sf's document count (the north-rule metric); the other entries
time the operator families end-to-end (noop sink — no driver collect).

Set ``SPARK_GRAFT_BENCH_MODE=crawl-only`` to run just the crawl bench
(used by the N-vs-4N scaling-efficiency measurement in
``tools/scaling.py``).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
MODE = os.environ.get("SPARK_GRAFT_BENCH_MODE", "full")
CRAWL_WAVES = int(os.environ.get("SPARK_GRAFT_BENCH_WAVES", "3"))


def build_spark(cpus: int):
    from pyspark.sql import SparkSession

    # SPARK_GRAFT_MASTER overrides the master (e.g. the multi-JVM
    # scaling A/B runs the same job under local-cluster[4,8,m] —
    # separate executor heaps — vs local[32]'s single heap)
    master = os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    builder = (
        SparkSession.builder.master(master)
        .appName(f"parsel_spark-bench-{cpus}")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_MEM", "48g"))
        .config("spark.sql.session.timeZone", "UTC")
    )
    exec_mem = os.environ.get("SPARK_GRAFT_EXEC_MEM")
    if exec_mem:
        builder = builder.config("spark.executor.memory", exec_mem)
    # SPARK_GRAFT_EVENTLOG=<dir>: per-stage event-log capture for the
    # stage-profile artifact (tools/stage_profile.py)
    eventlog_dir = os.environ.get("SPARK_GRAFT_EVENTLOG")
    if eventlog_dir:
        os.makedirs(eventlog_dir, exist_ok=True)
        builder = (
            builder.config("spark.eventLog.enabled", "true")
            .config("spark.eventLog.dir", eventlog_dir)
            # plain single-file JSON so tools/stage_profile.py can read
            # it without a zstd codec
            .config("spark.eventLog.compress", "false")
            .config("spark.eventLog.rolling.enabled", "false")
        )
    return builder.getOrCreate()


def run_noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def crawl_bench(spark, n_pages: int, waves: int) -> dict:
    """Throughput of the full crawl loop (politeness dequeue + fetch +
    vectorized extraction + canonicalization + bloom/exact dedup +
    snapshot commit) in URLs dequeued+extracted/sec."""
    from parsel_spark.plans.crawl import CrawlRun
    from parsel_spark.sources.snapshots import SnapshotCatalog
    from parsel_spark.sources.synth import (
        SynthConfig,
        synth_pages,
        synth_robots,
        synth_seeds,
    )

    # untimed warmup: spawns python workers, JITs codegen paths
    warm_cfg = SynthConfig(
        n_pages=2000, n_hosts=100, out_degree=8, seed=7, with_images=False
    )
    warm_pages = synth_pages(spark, warm_cfg).cache()
    with tempfile.TemporaryDirectory() as warm_tmp:
        warm = CrawlRun(
            spark, SnapshotCatalog(warm_tmp), warm_pages,
            synth_robots(spark, warm_cfg, fast=True), num_shards=16,
        )
        warm.initialize(synth_seeds(spark, warm_cfg, n_seeds=200))
        warm.run(1)
    warm_pages.unpersist()

    # production-frontier shape (matches tools/scaling.py): broad host
    # coverage so the politeness budget admits O(hosts) pages per wave
    # and the measurement exercises the data plane, not just per-wave
    # fixed costs
    cfg = SynthConfig(
        n_pages=n_pages,
        n_hosts=max(64, n_pages // 4),
        out_degree=12,
        seed=42,
        with_images=False,
        zipf_s=0.5,
    )
    # corpus prepared in the fetch join's bucketed layout (on a real
    # cluster: the table's at-ingest bucketing) — generation AND
    # bucketing excluded from the timed window
    n_partitions = spark.sparkContext.defaultParallelism
    pages = CrawlRun.prepare_pages(synth_pages(spark, cfg), n_partitions)
    robots = synth_robots(spark, cfg, fast=True)
    from parsel_spark.sources.synth import robots_rows

    rules = {
        r["host"]: (tuple(r["deny_prefixes"]), tuple(r["allow_prefixes"]))
        for r in robots_rows(cfg, fast=True)
    }
    seeds = synth_seeds(spark, cfg, n_seeds=n_pages // 2, spread=True)

    # best-of-3: the sandbox box is shared and co-tenant BURSTS last
    # ~30-60s (see BENCH/BASELINE.md round-5 window log) — two runs of a
    # ~10s loop can both land inside one burst, three rarely do; results
    # stay deterministic (identical totals asserted)
    elapsed = float("inf")
    totals: dict[str, int] = {}
    for _attempt in range(3):
        with tempfile.TemporaryDirectory() as tmp:
            run = CrawlRun(
                spark, SnapshotCatalog(tmp), pages, robots,
                # 32 shards: at sf0.1's tiny waves the gate's per-wave
                # bloom-bitmap shipping scales with num_shards (128 KiB
                # per shard) and dominates; the shards>>partitions
                # anti-skew sizing (tools/scaling.py) pays only when
                # waves carry millions of rows (measured: 256 shards =
                # 2x wall at sf0.1, -12% at 3.2M pages)
                num_shards=32,
                checkpoint_interval=waves,
                frontier_partitions=n_partitions,
                pages_prepared=True,
                robots_rules=rules,
            )
            start = time.perf_counter()
            run.initialize(seeds)
            attempt_totals = {"dequeued": 0, "new_urls": 0, "links_extracted": 0}
            for metrics in run.run(waves):
                for key in attempt_totals:
                    attempt_totals[key] += metrics.get(key, 0)
            attempt_elapsed = time.perf_counter() - start
        assert not totals or totals == attempt_totals, "nondeterministic crawl!"
        totals = attempt_totals
        elapsed = min(elapsed, attempt_elapsed)
    pages.unpersist()
    processed = totals["dequeued"] + totals["links_extracted"]
    return {
        "sec": elapsed,
        "urls_processed": processed,
        "urls_per_sec": processed / elapsed if elapsed > 0 else 0.0,
        **totals,
    }


def main() -> None:
    import __spark_entry__ as entrymod

    spark = build_spark(CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    try:
        # parquet footer metadata (pyarrow) — no Spark job for a plain
        # driver-side sizing constant
        import pyarrow.dataset as pads

        n_docs = pads.dataset(
            os.path.join(SF_DIR, "documents.parquet")
        ).count_rows()
    except Exception:
        n_docs = 5000

    timings: dict[str, float] = {}
    extras: dict[str, float] = {}

    # headline: crawl-loop throughput over a corpus sized to the sf
    crawl = crawl_bench(spark, n_pages=max(2000, n_docs * 4), waves=CRAWL_WAVES)
    timings["crawl_loop"] = round(crawl["sec"], 3)
    extras["frontier_urls_per_sec"] = round(crawl["urls_per_sec"], 2)
    extras["frontier_urls_processed"] = crawl["urls_processed"]

    if MODE != "crawl-only":
        queries = entrymod.queries()
        # untimed: build + persist the IVF index once (ingest cadence,
        # same footing as prepare_pages for the crawl) — the timed
        # emb_knn_ivf call then measures the PROBE, which is what runs
        # at query cadence against a 100 TB corpus
        entrymod._ivf_index_for(spark, SF_DIR)
        bench_set = [
            "crawl_extract_links",
            "selector_caption_xpath",
            "doc_exact_dedup",
            "doc_minhash_pairs",
            "doc_simhash_pairs",
            "emb_near_dup_lsh",
            "img_phash_near_dup",
            "doc_token_stats",
            "doc_lang_id",
            "emb_knn_bruteforce",
            "emb_knn_lsh",
            "emb_knn_ivf",
            "doc_ngram_dedup",
            "doc_decontaminate",
            "doc_main_text",
            "doc_quality_filter",
            "crawl_host_pagerank",
            "emb_semantic_dedup",
            "img_training_batches",
            "doc_corpus_build",
            "q_pricing_summary",
            "q_revenue_by_nation",
            "q_top_orders_per_customer",
        ]
        # min-of-N within the window (N=3; see crawl_bench's burst
        # note): a co-tenant spike during one run must not print as a
        # fake per-query regression; ALL raw runs ship in the artifact
        query_runs: dict[str, list[float]] = {}
        for name in bench_set:
            fn = queries[name]
            runs = []
            # min-of-3 (was 2): see the crawl_bench burst note
            for _ in range(3):
                start = time.perf_counter()
                run_noop(fn(spark, SF_DIR))
                runs.append(round(time.perf_counter() - start, 3))
            query_runs[name] = runs
            timings[name] = min(runs)

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "frontier throughput + operator suite wall time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR.rstrip("/").split("sf")[-1],
        "cpus": CPUS,
        "extras": extras,
    }
    if MODE != "crawl-only":
        out["query_runs"] = query_runs  # all raw runs; queries = min
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
