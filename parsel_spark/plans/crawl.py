"""Crawl-wave planner: the driver-side iterative loop composing the
frontier operators into waves, checkpointing to the snapshot catalog
(SURVEY.md §3.4).

Each wave:

    frontier(t) ── politeness dequeue (salted window + token bucket)
       │                 │
       │                 ├─► "fetch" (join on pages table) ─► extract links
       │                 │        (vectorized css UDF; html never shuffles)
       │                 ▼
       │          crawl_log(t) append
       ▼
    remaining + robots-allowed, bloom-prefiltered, exactly-deduped new
    links  ─►  frontier(t+1);  seen/bloom/host-state updated.

**Micro-batched commits** (``checkpoint_interval=k``): per-wave fixed
costs (snapshot parquet write + read-back, bloom fold cogroup, lineage
collect) are the scaling bottleneck at small wave sizes, so the loop
keeps state in memory between commits and snapshots every ``k`` waves:

* frontier/host-state are carried as checkpoint-truncated DataFrames
  (lineage cannot grow across waves — essential for iterative DataFrame
  loops).  ``CrawlRun(reliable_checkpoints=True)`` uses reliable
  ``checkpoint()`` to the cluster checkpoint dir (survives executor
  loss); the default ``localCheckpoint`` is executor-local and faster —
  a lost executor between commits replays from the committed snapshot;
* bloom shards fold the batch's new URLs ONCE per commit instead of
  once per wave (lazy fold).  Correctness is preserved because the
  bloom filter is only ever a pre-filter: URLs discovered since the
  last fold are caught by a broadcast anti-join against the (small,
  ≤k-waves) pending delta, applied to *all* candidates;
* seen / crawl_log write one delta file-set per commit (O(Δ)).

A kill mid-batch resumes from the last committed snapshot and
deterministically recomputes the lost ≤k-1 waves — final state is
bit-identical (resume test), so the interval trades recovery time for
throughput, never correctness.
"""

from __future__ import annotations

from contextlib import contextmanager
from functools import reduce
from typing import Any

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from ..functions.canonical import canonicalize_udf
from ..operators import frontier as fr
from ..sources.snapshots import SnapshotCatalog

DEFAULT_NUM_SHARDS = 32

SEEN_SCHEMA = "url string, url_hash long"
CRAWL_LOG_SCHEMA = (
    "wave int, url string, url_hash long, host string, priority double, "
    "seq long"
)

#: Commit write sizing (guide §6: aim for 128 MB-1 GB output files).
#: Snapshot url tables are narrow (~100 B/row), so ~1M rows ≈ 100 MB
#: per file; bloom shards carry a 128 KiB bitmap each, so ~1k shards ≈
#: 128 MB.  File counts derive from the EXACT per-commit row counts the
#: loop already tracks (wave observations / the robots rules dict), so
#: the sizing is scale-adaptive rather than a local[32] constant: a
#: tiny bench commit writes 1 file per table instead of one per plan
#: partition, a production commit keeps ~100 MB files, and an unknown
#: count leaves the plan's own partitioning untouched.
COMMIT_ROWS_PER_FILE = 1_000_000
COMMIT_SHARDS_PER_FILE = 1_024


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
        checkpoint_interval: int = 1,
        skew_prune: bool | str = "auto",
        skew_prune_ratio: int = 64,
        reliable_checkpoints: bool = False,
        robots_mode: str = "udf",
        pages_prepared: bool = False,
        robots_rules: dict | None = None,
        seen_check: str = "cogroup",
        respect_nofollow: bool = False,
        host_priority: DataFrame | None = None,
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
        # robots enforcement: "udf" (default) ships the rules dict ONCE
        # per crawl as a python sc.broadcast and evaluates the RFC 9309
        # longest-match inside the bloom cogroup (zero per-wave driver
        # work); "join" uses the per-wave JVM broadcast join
        # (robots_filter) — results identical (test_robots_mode_equivalence)
        if robots_mode not in ("udf", "join"):
            raise ValueError(f"robots_mode must be 'udf' or 'join', got {robots_mode}")
        self.robots_mode = robots_mode
        # exact seen-set enforcement: "cogroup" (default) fuses the
        # exact check into the bloom cogroup's state side (the seen rows
        # ride the per-commit shard-partitioned state cache — one fewer
        # exchange + join stage per wave; fixed stage overhead is the
        # measured scaling residual); "join" keeps the two-phase shape
        # (bloom_prefilter → JVM anti-join against the url-partitioned
        # seen cache).  Results identical (test_seen_check_mode_equivalence).
        if seen_check not in ("cogroup", "join"):
            raise ValueError(
                f"seen_check must be 'cogroup' or 'join', got {seen_check}"
            )
        self.seen_check = seen_check
        # REP page-level layer in the wave's extract stage (meta robots
        # nofollow + rel=nofollow tokens) — same fused UDF, off by
        # default so the reference-ordering parity corpus is unchanged
        self.respect_nofollow = respect_nofollow
        # optional (host, priority_rank) dim table — quality/centrality
        # feedback (host_quality_priority / the PageRank rollup) boosts
        # better-ranked hosts WITHIN each discovery wave via one
        # broadcast join in new_frontier_rows; None (default) keeps the
        # reference-ordering parity plan byte-identical
        self.host_priority = host_priority
        # pages_prepared=True: caller already bucketed the corpus
        # hash(url, frontier_partitions) (CrawlRun.prepare_pages) and
        # cached it — on a real cluster this is the corpus table's
        # bucketing, done once at ingest, so benches prepare outside
        # their timed window.  False: prepared lazily on first wave.
        self._pages_ready: DataFrame | None = (
            pages if pages_prepared else None
        )
        # optional pre-built {host: (deny, allow)} dict — skips the
        # one-time robots-table collect when the caller already has the
        # rules driver-side
        self._robots_rules = robots_rules
        self._robots_bc = None
        # commit a snapshot every k waves (k=1: classic wave-per-commit)
        self.checkpoint_interval = max(1, int(checkpoint_interval))
        # salted skew pre-pruning for the politeness windows: "auto"
        # enables it only when the exact frontier-rows/host ratio says
        # hosts are deep (> skew_prune_ratio rows/host on average) — on
        # a broad production frontier the salt pass re-shuffles the
        # whole frontier for nothing, and without it both windows share
        # ONE hash(host) exchange.  Results are identical either way
        # (test_skew_prune_equivalence).
        self.skew_prune: bool | str = skew_prune
        self.skew_prune_ratio = int(skew_prune_ratio)
        # skew-prune heuristic denominator: robots-table host count, an
        # approximation of frontier host cardinality.  Computed LAZILY on
        # first _step (memoized) so construction never triggers a Spark
        # job (forget-only / never-dequeue usages pay nothing); results
        # are identical either way (test_skew_prune_equivalence).
        self._n_hosts_memo: int | None = None
        # lineage truncation between waves: ``localCheckpoint`` keeps the
        # truncation point on executors (fast; an executor loss replays
        # from the last COMMITTED snapshot).  ``reliable_checkpoints=True``
        # swaps in reliable ``checkpoint()`` to the cluster checkpoint dir
        # (spark.sparkContext.setCheckpointDir — on a real cluster point
        # it at the cluster FS) so lineage survives executor loss between
        # commits too.
        self.reliable_checkpoints = bool(reliable_checkpoints)
        if reliable_checkpoints and spark.sparkContext.getCheckpointDir() is None:
            import tempfile

            spark.sparkContext.setCheckpointDir(
                tempfile.mkdtemp(prefix="parsel_spark_ckpt_")
            )

    @property
    def _n_hosts(self) -> int | None:
        if self.skew_prune != "auto":
            return None
        if self._n_hosts_memo is None:
            if self._robots_rules is not None:
                # caller already holds the rules driver-side: the host
                # count is its length — no Spark job for the heuristic
                self._n_hosts_memo = len(self._robots_rules)
            else:
                self._n_hosts_memo = self.robots.count()
        return self._n_hosts_memo

    def _host_rows_hint(self) -> int | None:
        """Host-state row count for commit write sizing: exact when the
        robots rules are driver-side, the memoized robots count when the
        skew heuristic already paid for it, else unknown (no Spark job
        is ever run just for file sizing)."""
        if self._robots_rules is not None:
            return len(self._robots_rules)
        return self._n_hosts_memo

    def _sized_for_write(
        self,
        df: DataFrame,
        rows: int | None,
        per_file: int = COMMIT_ROWS_PER_FILE,
        exchange: bool = False,
    ) -> DataFrame:
        """Size a commit write to ~128 MB files from a KNOWN row count
        (``None``: leave the plan's partitioning alone).

        ``exchange=False`` (default) uses ``coalesce`` — a narrow merge,
        right for the already-pinned wave outputs (LogicalRDD leaves:
        nothing upstream to starve).  ``exchange=True`` uses
        ``repartition`` — for a frame whose UNmaterialized upstream
        must keep its parallelism (the bloom fold cogroup: coalesce(1)
        would propagate up and run the whole python fold on one core);
        the exchange moves the same bytes the narrow merge would have
        pulled cross-executor anyway.  Wraps only the write-side frame;
        the carried state frames never see it."""
        if rows is None:
            return df
        n_files = max(1, -(-int(rows) // per_file))
        # always wrap: sizing to >= the frame's partition count is a
        # no-op for coalesce, and the frame may carry MORE than
        # frontier_partitions partitions (multi-wave delta unions are k
        # pinned outputs wide)
        if exchange:
            return df.repartition(n_files)
        return df.coalesce(n_files)

    def _truncate(self, df: DataFrame) -> DataFrame:
        """Cut lineage so iterative plans cannot grow across waves."""
        if self.reliable_checkpoints:
            return df.checkpoint(eager=False)
        return df.localCheckpoint(eager=False)

    def _pin(self, df: DataFrame) -> DataFrame:
        """EAGER checkpoint of a wave output (see _step's pin comment).
        Honors ``reliable_checkpoints``: the pending seen/log deltas and
        the carried frontier/host-state all derive from these pins, so
        with the reliable mode they must live on the cluster FS too —
        an executor loss between commits would otherwise lose the
        executor-local blocks the option promises to survive."""
        if self.reliable_checkpoints:
            return df.checkpoint(eager=True)
        return df.localCheckpoint(eager=True)

    @contextmanager
    def _static_planning(self):
        """Pin the loop's physical planning:

        * AQE OFF — the wave DAG is a handful of DEPENDENT stages over
          known row counts with explicit partitioning, and AQE's
          per-stage shuffle materialization + driver replanning
          serializes it — measured 1.8× wall-clock at local[32] on the
          1.6M-page scaling workload (A/B in one session, byte-identical
          wave outputs).  AQE's wins (runtime coalescing, skew joins)
          target unknown sizes; windows cannot be AQE-split anyway;
        * ``spark.sql.shuffle.partitions`` = ``frontier_partitions`` —
          every implicit exchange (politeness window, fetch-key and
          survivor shuffles) then lands on the SAME hash layout as the
          carried state tables (host_state by host, seen/pages by url),
          which is what lets the politeness join, host-state update and
          fetch join run CO-PARTITIONED with zero extra exchanges.

        Restores both settings on exit so surrounding queries keep
        their configuration."""
        conf = self.spark.conf
        prev_aqe = conf.get("spark.sql.adaptive.enabled", "true")
        prev_parts = conf.get("spark.sql.shuffle.partitions", "200")
        conf.set("spark.sql.adaptive.enabled", "false")
        conf.set("spark.sql.shuffle.partitions", str(self.frontier_partitions))
        try:
            yield
        finally:
            conf.set("spark.sql.adaptive.enabled", prev_aqe)
            conf.set("spark.sql.shuffle.partitions", prev_parts)

    # -- static inputs, prepared once per crawl ---------------------------
    @staticmethod
    def prepare_pages(pages: DataFrame, partitions: int) -> DataFrame:
        """Bucket the fetch corpus hash(url, partitions), cache and
        materialize it — the layout the per-wave fetch join consumes
        without moving the html column ever again.  On a real cluster
        this is the corpus table's bucketing/clustering at ingest;
        benches run it once outside the timed window and pass
        ``pages_prepared=True``.

        The cache is registered with AQE disabled: an InMemoryRelation
        whose cached plan is an (unfinalized) AdaptiveSparkPlan reports
        UNKNOWN output partitioning, which would make the AQE-off loop
        re-exchange the whole corpus (html included) at every wave's
        fetch join — silently defeating the bucketing."""
        spark = pages.sparkSession
        conf = spark.conf
        prev = conf.get("spark.sql.adaptive.enabled", "true")
        conf.set("spark.sql.adaptive.enabled", "false")
        try:
            prepared = (
                pages.select("url", "html")
                .repartition(partitions, "url")
                .cache()
            )
            prepared.count()
        finally:
            conf.set("spark.sql.adaptive.enabled", prev)
        return prepared

    def _prepared_pages(self) -> DataFrame:
        if self._pages_ready is None:
            self._pages_ready = self.prepare_pages(
                self.pages, self.frontier_partitions
            )
        return self._pages_ready

    def _robots_broadcast(self):
        """{host: (deny_prefixes, allow_prefixes)} as a python
        sc.broadcast — shipped to executors ONCE per crawl and reused by
        every wave's cogroup probe (a JVM broadcast-join table re-ships
        every job, i.e. every wave)."""
        if self._robots_bc is None:
            rules = self._robots_rules
            if rules is None:
                rules = {
                    row["host"]: (
                        tuple(row["deny_prefixes"] or ()),
                        tuple(row["allow_prefixes"] or ()),
                    )
                    for row in self.robots.select(
                        "host", "deny_prefixes", "allow_prefixes"
                    ).collect()
                }
            self._robots_bc = self.spark.sparkContext.broadcast(rules)
        return self._robots_bc

    # -- initialization --------------------------------------------------
    def initialize(self, seeds: DataFrame) -> None:
        """Wave-0 state from the seed list; commits snapshot v1."""
        with self._static_planning():
            self._initialize(seeds)

    def _initialize(self, seeds: DataFrame) -> None:
        spark = self.spark
        canonical_seeds = seeds.select(
            canonicalize_udf("url").alias("url"), "priority", "seq"
        )
        # hash(host): wave 1's politeness window then reuses this layout
        # directly (subsequent frontiers re-establish it at their window
        # exchange — the wave's ONE full-frontier shuffle)
        frontier0 = canonical_seeds.select(
            "url",
            F.xxhash64("url").alias("url_hash"),
            F.parse_url("url", F.lit("HOST")).alias("host"),
            "priority",
            "seq",
            F.lit(0).alias("discovered_wave"),
        ).repartition(self.frontier_partitions, "host")
        # pin ONCE (same discipline as _step's wave pins): the commit
        # derives frontier table + seen delta + bloom fold from this
        # frame, and an unpinned plan re-runs seed generation + the
        # canonicalize UDF once PER derived write (3-4 python passes per
        # initialize — measured ~2s of the bench loop's fixed cost);
        # the LogicalRDD leaf keeps the hash(host) layout for wave 1.
        # The seed counter rides the pin's action (the pin is eager, so
        # the metric is available immediately after) — which also makes
        # the exact row count available BEFORE the commit, for sizing
        # the commit's output files.
        obs_seeds = Observation("init_seeds")
        frontier0 = frontier0.observe(
            obs_seeds, F.count(F.lit(1)).alias("n")
        )
        frontier0 = self._pin(frontier0)
        n_seeds = int(obs_seeds.get["n"])

        # hash(host): carried across waves so the politeness join and the
        # host-state update run co-partitioned (zero exchanges per wave)
        host_state = self.robots.select(
            "host",
            F.lit(fr.INITIAL_TOKENS).alias("tokens"),
            "crawl_delay",
            "max_fetch_per_wave",
        ).repartition(self.frontier_partitions, "host")
        seen = frontier0.select("url", "url_hash")
        empty_bloom = spark.createDataFrame([], fr.BLOOM_SCHEMA)
        bloom = fr.bloom_update(seen, empty_bloom, self.num_shards, kind=self.filter_kind)
        crawl_log = spark.createDataFrame([], CRAWL_LOG_SCHEMA)
        self._commit(
            wave=0,
            frontier=frontier0,
            host_state=host_state,
            seen_delta=seen,
            bloom=bloom,
            crawl_log_delta=crawl_log,
            metrics=None,
            row_hints={
                "frontier": n_seeds,
                "host_state": self._host_rows_hint(),
                "seen": n_seeds,
            },
        )
        self._amend_metrics(
            {
                "dequeued": 0,
                "new_urls": n_seeds,
                "fetched": 0,
                "frontier_rows": n_seeds,
            }
        )

    def _prepared_seen(self, spark: SparkSession) -> DataFrame:
        """(seen_check='join') The committed seen table, hash-partitioned
        by url and cached: the per-wave exact anti-join then shuffles
        ONLY the (few, bloom-positive) survivors — round 1 re-shuffled
        the ever-growing seen table every wave.  One partitioning pass
        per COMMIT, amortized over ``checkpoint_interval`` waves."""
        return (
            self.catalog.read_table(spark, "seen")
            .repartition(self.frontier_partitions, "url")
            .cache()
        )

    def _refresh_committed(self, state: dict[str, Any]) -> None:
        """(Re)build the per-commit caches from the committed tables."""
        spark = self.spark
        state["bloom"] = self.catalog.read_table(spark, "bloom")
        if self.seen_check == "cogroup":
            # bloom shards + exact seen rows in ONE shard-partitioned
            # cache: the per-wave gate cogroup's state side then needs
            # no exchange, and the exact check rides the same stage
            state["gate_state"] = fr.seen_state_table(
                self.catalog.read_table(spark, "seen"),
                state["bloom"],
                self.num_shards,
                self.frontier_partitions,
            ).cache()
            state["seen"] = None
            state["seen_cache"] = state["gate_state"]
        else:
            seen = self._prepared_seen(spark)
            state["gate_state"] = None
            state["seen"] = seen
            state["seen_cache"] = seen

    # -- in-memory state between commits ----------------------------------
    def _load_state(self) -> dict[str, Any]:
        spark = self.spark
        snapshot = self.catalog.load_snapshot()
        assert snapshot is not None, "initialize() first"
        state: dict[str, Any] = {
            "wave": snapshot.wave,
            "frontier": self.catalog.read_table(spark, "frontier"),
            # re-establish the carried hash(host) layout after a resume
            # (parquet reads come back unpartitioned); one exchange per
            # RESUME, not per wave
            "host_state": self.catalog.read_table(spark, "host_state")
            .repartition(self.frontier_partitions, "host"),
            # exact frontier row count committed with the snapshot (for
            # the skew-prune heuristic); None on legacy snapshots
            "frontier_rows": snapshot.metrics.get("frontier_rows"),
            "pending_rows": 0,    # new-url rows since last commit
            "pending_seen": [],   # new-url deltas since last commit
            "pending_log": [],    # crawl-log deltas since last commit
            "batch_metrics": [],  # per-wave metric dicts since last commit
            "to_unpersist": [],   # cached frames released after commit
        }
        self._refresh_committed(state)
        return state

    def _step(self, state: dict[str, Any]) -> dict[str, Any]:
        """Run one wave against the in-memory state; no snapshot IO.

        Exactly TWO driver actions run per wave — the eager checkpoint
        pins of the wave's two outputs (``flagged`` and ``new_urls``) —
        and every counter rides them as ``Observation`` metrics; there
        is no separate ``count()`` job and ZERO per-wave driver
        broadcasts.  The politeness join, host-state update and fetch
        join run co-partitioned against state carried hash-partitioned
        across waves (host_state by host, corpus by url, gate state by
        shard), robots rules ship once per crawl as a python broadcast,
        and dedup + bloom probe + EXACT seen check + pending-delta match
        all ride ONE cogroup shuffle (``shard_gate``; the seen rows live
        on its state side, pre-partitioned per commit).  Per wave the
        only full-frontier movement is the politeness window's exchange;
        everything else shuffles wave-sized keys.

        Pinning the wave outputs as eager checkpoints (and deriving ALL
        carried state from the LogicalRDD leaves) is a correctness-of-
        cost guard, not a style choice: a plan that embeds the wave
        pipeline NEXT TO LogicalRDD leaves misses Spark's relation-dedup
        cache and silently recomputes the whole wave — fetch, extract
        UDF, cogroup — at materialization time (measured: 51s of a 74s
        wave at 3.2M pages).  LogicalRDD-derived plans have nothing to
        recompute, and the eager pin doubles as the wave's action."""
        wave = int(state["wave"])
        frontier = state["frontier"]
        if self.skew_prune == "auto":
            rows = state.get("frontier_rows")
            prune = (
                rows is None
                or not self._n_hosts
                or rows / self._n_hosts > self.skew_prune_ratio
            )
        else:
            prune = bool(self.skew_prune)
        # -- job 1: ONE flagged pass (dequeued + remaining + the source
        # of the host-state update), pinned eagerly; the dequeue counter
        # rides the pin's action as an Observation
        obs_deq = Observation(f"deq_w{wave}")
        flagged = fr.politeness_split(
            frontier, state["host_state"], skew_prune=prune
        ).observe(
            obs_deq,
            F.coalesce(F.sum(F.col("dequeued").cast("long")), F.lit(0)).alias(
                "n"
            ),
        )
        flagged_rdd = self._pin(flagged)
        dequeued = flagged_rdd.filter(F.col("dequeued")).select(*fr.FRONTIER_COLS)
        remaining = flagged_rdd.filter(~F.col("dequeued")).select(
            *fr.FRONTIER_COLS
        )

        # -- job 2: fetch → extract → fused gate → pin.  "fetch" is a
        # co-partitioned left-semi against the url-bucketed corpus —
        # only the wave's url keys shuffle; the html payload column
        # NEVER moves (neither shuffle nor driver broadcast)
        page_hits = self._prepared_pages().join(
            dequeued.select("url").hint("SHUFFLE_HASH"), "url", "left_semi"
        )
        links = fr.extract_wave_links(
            page_hits, respect_nofollow=self.respect_nofollow
        ).withColumn(
            "host", F.parse_url("url", F.lit("HOST"))
        )
        pending = None
        if state["pending_seen"]:
            pending = reduce(
                DataFrame.unionByName,
                [p.select("url") for p in state["pending_seen"]],
            )
        robots_bc = (
            self._robots_broadcast() if self.robots_mode == "udf" else None
        )
        obs_links = Observation(f"links_w{wave}")
        obs_new = Observation(f"new_w{wave}")
        if self.seen_check == "cogroup":
            # dedup + bloom + exact seen + pending (+ robots) in ONE
            # cogroup stage; everything after is map-side flag filtering
            probed = fr.shard_gate(
                links,
                state["gate_state"],
                self.num_shards,
                kind=self.filter_kind,
                pending=pending,
                robots_bc=robots_bc,
            ).observe(obs_links, F.count(F.lit(1)).alias("n"))
            candidates = probed.filter(~F.col("is_seen")).drop("is_seen")
            if robots_bc is not None:
                new_urls = candidates.filter(F.col("robots_allowed")).drop(
                    "robots_allowed"
                )
            else:
                new_urls = fr.robots_filter(candidates, self.robots)
        else:
            # two-phase compat shape: cogroup probe, then the one-pass
            # exact anti-join against the url-partitioned seen cache
            # (bloom-negative rows ride bypass keys) — one more exchange
            # + join stage per wave than the fused gate
            probed = fr.bloom_prefilter(
                links,
                state["bloom"],
                self.num_shards,
                kind=self.filter_kind,
                dedup=True,
                pending=pending,
                robots_bc=robots_bc,
            ).observe(obs_links, F.count(F.lit(1)).alias("n"))
            candidates = probed
            if pending is not None:
                candidates = candidates.filter(~F.col("in_pending")).drop(
                    "in_pending"
                )
            if robots_bc is not None:
                allowed = candidates.filter(F.col("robots_allowed")).drop(
                    "robots_allowed"
                )
            else:
                allowed = fr.robots_filter(
                    candidates, self.robots, keep=("maybe_seen",)
                )
            new_urls = fr.exact_new_filter(allowed, state["seen"])
        new_urls = new_urls.observe(obs_new, F.count(F.lit(1)).alias("n"))
        new_urls_rdd = self._pin(new_urls)
        n_new = int(obs_new.get["n"])
        n_dequeued = int(obs_deq.get["n"])

        new_host_state = fr.host_state_update(state["host_state"], dequeued)

        # union is map-only over the two checkpoint scans; no repartition
        # shuffle, and NO further checkpoint: both inputs already ARE
        # this wave's LogicalRDD leaves, so the next frontier's lineage
        # depth is constant by construction — truncating the union again
        # would just re-write the full frontier a second time per wave
        new_frontier = remaining.unionByName(
            fr.new_frontier_rows(
                new_urls_rdd, wave, host_priority=self.host_priority
            )
        )
        # one small explicit exchange re-asserts hash(host) (a full-outer
        # join's output partitioning is not propagated), so next wave's
        # politeness + update joins stay exchange-free; host_state DOES
        # need the lineage truncation — it chains through every wave
        new_host_state = self._truncate(
            new_host_state.repartition(self.frontier_partitions, "host")
        )

        log_delta = dequeued.select(
            F.lit(wave + 1).alias("wave"),
            "url",
            "url_hash",
            "host",
            "priority",
            "seq",
        )
        metrics = {
            "dequeued": int(n_dequeued),
            "new_urls": int(n_new),
            "links_extracted": int(obs_links.get["n"]),
        }
        state["wave"] = wave + 1
        state["frontier"] = new_frontier
        state["host_state"] = new_host_state
        # exact bookkeeping feeding next wave's skew-prune heuristic
        if state.get("frontier_rows") is not None:
            state["frontier_rows"] = (
                int(state["frontier_rows"]) - int(n_dequeued) + int(n_new)
            )
        state["pending_rows"] = int(state.get("pending_rows") or 0) + int(n_new)
        # pending handle derives from the checkpointed RDD: the delta
        # feeds the next wave's cogroup state side, and a raw plan there
        # would nest every prior wave's plan 2× per wave (2^N
        # logical-plan blowup — seconds of driver-side plan compilation
        # per action); a LogicalRDD leaf keeps every wave's plan
        # O(wave-size).
        state["pending_seen"].append(new_urls_rdd.select("url", "url_hash"))
        state["pending_log"].append(log_delta)
        state["batch_metrics"].append(metrics)
        return metrics

    def _commit_state(self, state: dict[str, Any]) -> None:
        """Fold the batch's pending deltas and commit one snapshot."""
        spark = self.spark
        if state["pending_seen"]:
            seen_delta = reduce(DataFrame.unionByName, state["pending_seen"])
        else:
            seen_delta = spark.createDataFrame([], SEEN_SCHEMA)
        if state["pending_log"]:
            log_delta = reduce(DataFrame.unionByName, state["pending_log"])
        else:
            log_delta = spark.createDataFrame([], CRAWL_LOG_SCHEMA)
        # lazy fold: ONE cogroup per commit, not one per wave
        new_bloom = fr.bloom_update(
            seen_delta, state["bloom"], self.num_shards, kind=self.filter_kind
        )
        totals: dict[str, int] = {}
        for m in state["batch_metrics"]:
            for key, val in m.items():
                totals[key] = totals.get(key, 0) + int(val)
        if state.get("frontier_rows") is not None:
            totals["frontier_rows"] = int(state["frontier_rows"])
        self._commit(
            wave=state["wave"],
            frontier=state["frontier"],
            host_state=state["host_state"],
            seen_delta=seen_delta,
            bloom=new_bloom,
            crawl_log_delta=log_delta,
            metrics=totals,
            row_hints={
                # exact counts from the wave observations (None: legacy
                # snapshot without frontier bookkeeping — leave as-is)
                "frontier": state.get("frontier_rows"),
                "host_state": self._host_rows_hint(),
                "seen": int(state.get("pending_rows") or 0),
                "crawl_log": totals.get("dequeued"),
            },
        )
        # refresh committed views; keep frontier/host_state in memory
        if state.get("seen_cache") is not None:
            state["seen_cache"].unpersist()
        self._refresh_committed(state)
        state["pending_rows"] = 0
        state["pending_seen"] = []
        state["pending_log"] = []
        state["batch_metrics"] = []
        for df in state["to_unpersist"]:
            df.unpersist()
        state["to_unpersist"] = []

    # -- one wave (classic commit-per-wave API) ----------------------------
    def run_wave(self) -> dict[str, Any]:
        with self._static_planning():
            state = self._load_state()
            metrics = self._step(state)
            self._commit_state(state)
            return metrics

    def run(self, waves: int) -> list[dict[str, Any]]:
        """Run up to ``waves`` waves, committing a snapshot every
        ``checkpoint_interval`` waves (and always at loop exit)."""
        with self._static_planning():
            state = self._load_state()
            out: list[dict[str, Any]] = []
            for i in range(waves):
                metrics = self._step(state)
                out.append(metrics)
                if (i + 1) % self.checkpoint_interval == 0:
                    self._commit_state(state)
                if metrics["dequeued"] == 0:
                    break
            if state["batch_metrics"]:
                self._commit_state(state)
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
        with self._static_planning():
            return self._forget(urls)

    def _forget(self, urls: DataFrame) -> int:
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
        forget_metrics: dict[str, Any] = {"forgotten": int(n_forgotten)}
        if snapshot.metrics.get("frontier_rows") is not None:
            # carry the frontier bookkeeping across the rewrite
            forget_metrics["frontier_rows"] = snapshot.metrics["frontier_rows"]
        self.catalog.commit(
            wave=snapshot.wave,
            tables={
                "frontier": self.catalog.read_table(spark, "frontier"),
                "host_state": self.catalog.read_table(spark, "host_state"),
                "bloom": new_bloom,
                "seen": new_seen,
                "crawl_log": self.catalog.read_table(spark, "crawl_log"),
            },
            metrics=forget_metrics,
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
        row_hints: dict[str, int | None] | None = None,
    ) -> None:
        # per-partition lineage (shard id + bitmap content hash +
        # counters) rides the bloom WRITE as an Observation instead of a
        # separate collect job: the fold cogroup then runs exactly once,
        # inside the commit's parallel write phase, with no cache.
        # sort_array pins a deterministic order (Observation merge order
        # is task-completion order); consumers key by partition_id.
        obs_lineage = Observation(f"bloom_lineage_w{wave}")
        bloom = bloom.observe(
            obs_lineage,
            F.sort_array(
                F.collect_list(
                    F.struct("shard_id", "shard_hash", "n_items")
                )
            ).alias("rows"),
        )

        def lineage_rows():
            return [
                {
                    "partition_id": int(row["shard_id"]),
                    "bloom_shard_hash": int(row["shard_hash"]),
                    "n_items": int(row["n_items"]),
                }
                for row in obs_lineage.get["rows"]
            ]

        metrics = dict(metrics) if metrics else {}
        if metrics:
            metrics["urls_emitted"] = metrics.get("new_urls", 0)
            metrics["urls_dequeued"] = metrics.get("dequeued", 0)
        hints = row_hints or {}
        self.catalog.commit(
            wave=wave,
            tables={
                "frontier": self._sized_for_write(
                    frontier, hints.get("frontier")
                ),
                "host_state": self._sized_for_write(
                    host_state, hints.get("host_state")
                ),
                # shard count is always known; exchange=True keeps the
                # fold cogroup upstream at full parallelism
                "bloom": self._sized_for_write(
                    bloom, self.num_shards, COMMIT_SHARDS_PER_FILE,
                    exchange=True,
                ),
            },
            appends={
                # cumulative: O(Δ) write per wave
                "seen": self._sized_for_write(seen_delta, hints.get("seen")),
                "crawl_log": self._sized_for_write(
                    crawl_log_delta, hints.get("crawl_log")
                ),
            },
            lineage=lineage_rows,
            metrics=metrics,
        )

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


def seeds_from_sitemaps(sitemaps: DataFrame, xml_col: str = "xml") -> DataFrame:
    """Seed list (url, priority, seq) for ``CrawlRun.initialize`` from a
    table of sitemap XML documents (sitemaps.org protocol): page locs
    exploded and deduplicated, uniform priority, ``seq=0`` — crawl
    order then falls deterministically to the engine's (priority DESC,
    seq ASC, url_hash, url) tiebreak, so no global window / single
    partition sequencing is needed at any scale.

    ``sitemapindex`` entries are NOT fetched here (the engine has no
    network layer): route ``extract_sitemap(...).sitemap_urls`` through
    your fetch stage and call again with the nested documents."""
    from ..functions.udfs import extract_sitemap

    return (
        sitemaps.select(
            F.explode(extract_sitemap(xml_col).getField("page_urls")).alias(
                "url"
            )
        )
        .distinct()
        .select(
            "url",
            F.lit(0.0).alias("priority"),
            F.lit(0).cast("long").alias("seq"),
        )
    )
