"""Distributed-crawl correctness: exact crawl order + URL-seen set vs
the single-process oracle, and bit-identical resume from a snapshot
(north rule; BASELINE.md rows "crawl ordering", "final URL-seen set",
"resumability")."""

from __future__ import annotations

import pytest

from parsel_spark.plans.crawl import CrawlRun
from parsel_spark.plans.oracle import OracleCrawler
from parsel_spark.sources.snapshots import SnapshotCatalog
from parsel_spark.sources.synth import (
    SynthConfig,
    seed_rows,
    synth_pages,
    synth_robots,
    synth_seeds,
)

CFG = SynthConfig(n_pages=200, n_hosts=8, out_degree=5, seed=42, with_images=False)
N_SEEDS = 8
WAVES = 3
SHARDS = 16


@pytest.fixture(scope="module")
def corpus(spark):
    pages = synth_pages(spark, CFG).cache()
    pages.count()
    robots = synth_robots(spark, CFG)
    seeds = synth_seeds(spark, CFG, n_seeds=N_SEEDS)
    return pages, robots, seeds


@pytest.fixture(scope="module")
def oracle_result():
    oracle = OracleCrawler(CFG, num_shards=SHARDS)
    oracle.initialize(seed_rows(CFG, n_seeds=N_SEEDS))
    metrics = oracle.run(WAVES)
    return oracle, metrics


def test_crawl_exact_parity(spark, corpus, oracle_result, tmp_path) -> None:
    pages, robots, seeds = corpus
    oracle, oracle_metrics = oracle_result

    run = CrawlRun(spark, SnapshotCatalog(str(tmp_path)), pages, robots, num_shards=SHARDS)
    run.initialize(seeds)
    metrics = run.run(WAVES)

    assert metrics == oracle_metrics
    assert run.crawl_order() == oracle.crawl_order()
    assert run.seen_set() == oracle.seen_set()


def test_micro_batched_commits_exact_parity(
    spark, corpus, oracle_result, tmp_path
) -> None:
    """checkpoint_interval=2 over 3 waves (one full batch + one partial
    final batch): bloom folds lazily once per commit and state stays
    in memory between commits — crawl order, seen set and bloom shard
    hashes must still match the oracle exactly."""
    pages, robots, seeds = corpus
    oracle, oracle_metrics = oracle_result

    catalog = SnapshotCatalog(str(tmp_path / "batched"))
    run = CrawlRun(
        spark, catalog, pages, robots, num_shards=SHARDS, checkpoint_interval=2
    )
    run.initialize(seeds)
    metrics = run.run(WAVES)

    assert metrics == oracle_metrics
    assert run.crawl_order() == oracle.crawl_order()
    assert run.seen_set() == oracle.seen_set()
    snapshot = catalog.load_snapshot()
    engine_hashes = {
        row["partition_id"]: row["bloom_shard_hash"] for row in snapshot.lineage
    }
    assert engine_hashes == oracle.bloom_shard_hashes()
    # 3 waves at interval 2 → snapshots at wave 0, 2, 3
    assert [s.wave for s in catalog.history()] == [0, 2, 3]


def test_resume_bit_identical(spark, corpus, oracle_result, tmp_path) -> None:
    """Kill after 2 waves; a NEW CrawlRun resumes from the snapshot and
    the final state matches a never-killed run exactly — including the
    bloom shard content hashes recorded in lineage."""
    pages, robots, seeds = corpus
    oracle, _ = oracle_result

    catalog = SnapshotCatalog(str(tmp_path / "resumed"))
    first = CrawlRun(spark, catalog, pages, robots, num_shards=SHARDS)
    first.initialize(seeds)
    first.run(2)
    del first  # "kill"

    resumed = CrawlRun(
        spark, SnapshotCatalog(str(tmp_path / "resumed")), pages, robots,
        num_shards=SHARDS,
    )
    resumed.run(WAVES - 2)

    assert resumed.crawl_order() == oracle.crawl_order()
    assert resumed.seen_set() == oracle.seen_set()

    # lineage: bloom shard hashes must match the oracle's bit-for-bit
    snapshot = catalog.load_snapshot()
    engine_hashes = {
        row["partition_id"]: row["bloom_shard_hash"] for row in snapshot.lineage
    }
    oracle_hashes = oracle.bloom_shard_hashes()
    assert engine_hashes == oracle_hashes

    # snapshot history chain is intact (parent pointers + waves)
    history = catalog.history()
    assert [s.wave for s in history] == list(range(WAVES + 1))
    assert all(
        s.parent_id == (None if i == 0 else history[i - 1].snapshot_id)
        for i, s in enumerate(history)
    )


def test_robots_mode_and_partitioning_equivalence(
    spark, corpus, oracle_result, tmp_path
) -> None:
    """Physical choices are never semantic ones: the per-wave JVM
    broadcast-join robots path (robots_mode='join') and an arbitrary
    frontier_partitions count must both produce the exact oracle crawl
    order / seen set / metrics / bloom lineage that the default
    (python-broadcast robots inside the cogroup, parallelism-sized
    partitioning) produces."""
    pages, robots, seeds = corpus
    oracle, oracle_metrics = oracle_result

    for name, kwargs in (
        ("jvm-robots", {"robots_mode": "join"}),
        ("odd-partitions", {"frontier_partitions": 3}),
    ):
        catalog = SnapshotCatalog(str(tmp_path / name))
        run = CrawlRun(
            spark, catalog, pages, robots, num_shards=SHARDS,
            checkpoint_interval=2, **kwargs,
        )
        run.initialize(seeds)
        metrics = run.run(WAVES)

        assert metrics == oracle_metrics, name
        assert run.crawl_order() == oracle.crawl_order(), name
        assert run.seen_set() == oracle.seen_set(), name
        snapshot = catalog.load_snapshot()
        engine_hashes = {
            row["partition_id"]: row["bloom_shard_hash"]
            for row in snapshot.lineage
        }
        assert engine_hashes == oracle.bloom_shard_hashes(), name


def test_reliable_checkpoint_equivalence(
    spark, corpus, oracle_result, tmp_path
) -> None:
    """reliable ``checkpoint()`` lineage truncation (the cluster-FS mode
    for surviving executor loss between commits) must be byte-equivalent
    to the default executor-local ``localCheckpoint``."""
    pages, robots, seeds = corpus
    oracle, oracle_metrics = oracle_result

    catalog = SnapshotCatalog(str(tmp_path / "reliable"))
    run = CrawlRun(
        spark, catalog, pages, robots, num_shards=SHARDS,
        checkpoint_interval=2, reliable_checkpoints=True,
    )
    run.initialize(seeds)
    metrics = run.run(WAVES)

    assert metrics == oracle_metrics
    assert run.crawl_order() == oracle.crawl_order()
    assert run.seen_set() == oracle.seen_set()


def test_skew_prune_equivalence(spark, corpus, oracle_result, tmp_path) -> None:
    """Forced salted pre-pruning and forced single-window dequeue must
    produce identical crawl order / seen set / metrics — the salt pass
    is a physical skew guard, never a semantic choice."""
    pages, robots, seeds = corpus
    oracle, oracle_metrics = oracle_result

    for mode, name in ((True, "salted"), (False, "plain")):
        catalog = SnapshotCatalog(str(tmp_path / name))
        run = CrawlRun(
            spark, catalog, pages, robots, num_shards=SHARDS,
            checkpoint_interval=2, skew_prune=mode,
        )
        run.initialize(seeds)
        metrics = run.run(WAVES)
        assert metrics == oracle_metrics, name
        assert run.crawl_order() == oracle.crawl_order(), name
        assert run.seen_set() == oracle.seen_set(), name
