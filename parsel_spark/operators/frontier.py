"""Distributed URL frontier: politeness-gated dequeue, link extraction,
sharded-bloom + exact dedup, deterministic ordering.

Determinism contract (north rule: exact crawl order + seen set vs the
single-process oracle): every choice is a pure function of
``(priority DESC, seq ASC, url_hash ASC, url ASC)`` total order and
wave-synchronous token-bucket state — never of partitioning, timing or
wall-clock.  Any parallelism level yields identical results.

Scale shape (10^10-URL frontier):

* dequeue is two-phase: a SALTED per-(host, salt) window prunes each
  host's candidates to ≤ 16×cap rows before the per-host shuffle, so a
  Zipf-skewed host cannot create a straggler task (AQE skew-join stays
  on as a backstop);
* the html payload column stays in the map stage that extracts links;
  only (url, host, hash, priority) tuples shuffle;
* seen-set: bloom shards pre-filter; the exact ``left_anti`` join runs
  in one pass against the url-partitioned seen cache, with
  bloom-negative rows riding through on never-matching bypass keys
  (probing the seen hash map only for bloom-positive rows).
"""

from __future__ import annotations

import math
from typing import Iterable
from urllib.parse import urlsplit

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.robots import robots_pattern_matches
from .bloom import (
    DEFAULT_BITS_PER_SHARD,
    DEFAULT_NUM_HASHES,
    BloomShard,
    CuckooShard,
)

# politeness constants (shared with the oracle — plans/oracle.py)
TOKEN_CAP = 3.0
INITIAL_TOKENS = 1.0
NEW_PRIORITY_BASE = 1.0  # new links get priority 1/(wave+2) < any seed priority
DEQUEUE_SALT_BUCKETS = 16
MAX_FETCH_CAP = 8  # global upper bound on per-host per-wave fetches

FRONTIER_SCHEMA = (
    "url string, url_hash long, host string, priority double, seq long, "
    "discovered_wave int"
)
HOST_STATE_SCHEMA = (
    "host string, tokens double, crawl_delay double, max_fetch_per_wave int"
)
BLOOM_SCHEMA = "shard_id int, bitmap binary, n_items long, shard_hash long"


def refill_tokens(tokens: float, crawl_delay: float) -> float:
    return min(TOKEN_CAP, tokens + 1.0 / crawl_delay)


def allowed_fetches(tokens: float, max_fetch_per_wave: int, available: int) -> int:
    return min(int(math.floor(tokens)), int(max_fetch_per_wave), available, MAX_FETCH_CAP)


FRONTIER_COLS = ("url", "url_hash", "host", "priority", "seq", "discovered_wave")


def politeness_split(
    frontier: DataFrame, host_state: DataFrame, skew_prune: bool = False
) -> DataFrame:
    """Per-host priority-queue dequeue under token-bucket politeness,
    as ONE flagged pass: every frontier row comes back with a
    ``dequeued`` boolean, so the wave needs NO separate remaining
    anti-join (round 2 broadcast the dequeued url set back at the
    frontier every wave) and the output keeps the window's hash(host)
    partitioning for the host-state update that follows.

    Entirely JVM-side and broadcast-free:

    1. per-host refill as column expressions (same IEEE double sequence
       the oracle runs — results bit-identical);
    2. with ``skew_prune`` a SALTED pre-window bounds any Zipf-skewed
       host to ≤16×cap rows before the per-host ranking window; the
       extra full-frontier shuffle only pays off when hosts are deep —
       ``CrawlRun`` auto-disables it on broad frontiers.  Rows the salt
       pass prunes are provably never dequeuable (``prn > CAP`` within a
       (host, salt) bucket ⇒ ≥ CAP same-host rows rank above them, and
       the admit count k ≤ MAX_FETCH_CAP = CAP), so they rejoin the
       output as ``dequeued = false`` WITHOUT passing through the
       per-host window — every frontier row appears in the result
       exactly once, pruned or not (results identical either way:
       test_skew_prune_equivalence + the deep-host tests);
    3. the budget join is CO-PARTITIONED (``SHUFFLE_HASH`` on the
       host-state side, which the loop carries hash(host)-partitioned
       across waves) — no per-wave driver collect+broadcast of the
       O(hosts) state table;
    4. ``dequeued`` = ``row_number() <= k`` with the oracle's
       k = min(floor(refill), max_fetch, |candidates|, CAP) (the
       candidate-count term is enforced by row_number itself).

    A per-host ``applyInPandas`` gate would create one pandas frame per
    host (~1 ms each — minutes at 10^6 hosts); this shape is pure
    codegen'd window + co-partitioned-join work.
    """
    from pyspark.sql import Window

    refill_expr = F.least(
        F.lit(TOKEN_CAP), F.col("tokens") + F.lit(1.0) / F.col("crawl_delay")
    )
    prepared = host_state.select(
        "host",
        refill_expr.alias("refilled"),
        F.col("max_fetch_per_wave").alias("mf"),
    )

    candidates = frontier
    pruned_out = None
    if skew_prune:
        pre_window = Window.partitionBy("host", "salt").orderBy(
            F.desc("priority"), F.asc("seq"), F.asc("url_hash"), F.asc("url")
        )
        salted = frontier.withColumn(
            "salt", F.pmod(F.hash("url"), F.lit(DEQUEUE_SALT_BUCKETS))
        ).withColumn("prn", F.row_number().over(pre_window))
        candidates = salted.filter(F.col("prn") <= MAX_FETCH_CAP).drop(
            "prn", "salt"
        )
        # pigeonhole: prn > CAP ⇒ rn-over-host > CAP ≥ k ⇒ never dequeued.
        # These rows MUST still flow through (the loop derives the next
        # frontier from this output); both branches read the SAME salted
        # exchange (ReuseExchange), so the frontier shuffles once.
        pruned_out = salted.filter(F.col("prn") > MAX_FETCH_CAP).drop(
            "prn", "salt"
        )
    host_window = Window.partitionBy("host").orderBy(
        F.desc("priority"), F.asc("seq"), F.asc("url_hash"), F.asc("url")
    )
    # defaults for hosts without registered state: tokens=INITIAL, delay 1
    default_refilled = min(TOKEN_CAP, INITIAL_TOKENS + 1.0)
    flagged = (
        candidates.withColumn("rn", F.row_number().over(host_window))
        .join(prepared.hint("SHUFFLE_HASH"), "host", "left")
        .withColumn(
            "k",
            F.least(
                F.floor(F.coalesce("refilled", F.lit(default_refilled))).cast("int"),
                F.coalesce("mf", F.lit(1)),
                F.lit(MAX_FETCH_CAP),
            ),
        )
        .withColumn("dequeued", F.col("rn") <= F.col("k"))
        .drop("rn", "k", "refilled", "mf")
    )
    if pruned_out is not None:
        flagged = flagged.unionByName(
            pruned_out.withColumn("dequeued", F.lit(False))
        )
    return flagged


def host_state_update(host_state: DataFrame, dequeued: DataFrame) -> DataFrame:
    """Token-state update from what was ACTUALLY dequeued (== k clipped
    by availability — exactly what the oracle consumes).  Both the
    ``groupBy`` and the full-outer join run co-partitioned when
    ``dequeued`` comes out of ``politeness_split`` (hash(host)) and
    ``host_state`` is carried hash(host)-partitioned — zero exchanges
    in the loop's steady state."""
    used = dequeued.groupBy("host").agg(F.count(F.lit(1)).alias("used"))
    return host_state.join(used.hint("SHUFFLE_HASH"), "host", "full_outer").select(
        "host",
        (
            F.least(
                F.lit(TOKEN_CAP),
                F.coalesce(F.col("tokens"), F.lit(INITIAL_TOKENS))
                + F.lit(1.0) / F.coalesce(F.col("crawl_delay"), F.lit(1.0)),
            )
            - F.coalesce(F.col("used"), F.lit(0)).cast("double")
        ).alias("tokens"),
        F.coalesce(F.col("crawl_delay"), F.lit(1.0)).alias("crawl_delay"),
        F.coalesce(F.col("max_fetch_per_wave"), F.lit(1)).alias(
            "max_fetch_per_wave"
        ),
    )


def politeness_dequeue(
    frontier: DataFrame, host_state: DataFrame, skew_prune: bool = True
) -> tuple[DataFrame, DataFrame]:
    """Classic two-output API over ``politeness_split`` +
    ``host_state_update``: (dequeued frontier rows, updated host_state).
    The loop uses the flagged split directly (one pass feeds dequeued,
    remaining AND the state update); this wrapper serves tests and
    standalone callers."""
    flagged = politeness_split(frontier, host_state, skew_prune=skew_prune)
    dequeued = flagged.filter(F.col("dequeued")).select(*FRONTIER_COLS)
    return dequeued, host_state_update(host_state, dequeued)


def extract_wave_links(
    fetched: DataFrame, respect_nofollow: bool = False
) -> DataFrame:
    """html → canonical link URLs (+xxhash64), via the FUSED
    parse/select/resolve/canonicalize pandas UDF — one Python pass per
    page, only the canonical url array crosses the JVM↔Python boundary
    (a mapInArrow variant with python-side explode measured ~15% slower:
    arrow→pylist marshalling beats pandas only for numeric payloads).
    Runs map-side against the fetch join output; the html column is
    projected away before any shuffle.

    ``respect_nofollow=True`` applies the REP page-level layer (meta
    robots nofollow + ``<a rel=nofollow>`` token) inside the SAME fused
    UDF — no extra pass, no plan change."""
    from ..functions.udfs import extract_canonical_links

    return (
        fetched.select(
            F.explode(
                extract_canonical_links(
                    "html", "url", respect_nofollow=respect_nofollow
                )
            ).alias("url")
        )
        .select("url", F.xxhash64("url").alias("url_hash"))
    )


def robots_filter(
    links: DataFrame, robots: DataFrame, keep: tuple[str, ...] = ()
) -> DataFrame:
    """Drop robots-denied URLs (broadcast dim join + JVM-side prefix
    checks via higher-order functions).  ``keep`` passes extra input
    columns through (e.g. ``maybe_seen`` when the bloom probe ran
    first).  Entirely map-side — safe at any point in the wave pipeline.

    RFC 9309 longest-match semantics: the longest matching rule wins
    (specificity = octets of the raw rule, ``*``/``$`` included), so a
    more specific ``Allow`` overrides a broader ``Disallow``; rule
    paths support the §2.2.3 ``*`` wildcard and trailing ``$`` anchor
    via the LIKE translation (``robots.robots_pattern_like`` — the udf
    and cogroup modes run the python twin; a parity test pins them)
    (oracle twin: ``plans/oracle.py _robots_allowed``)."""
    from ..functions.robots import robots_pattern_like

    def longest_match(col: str):
        return F.aggregate(
            F.filter(
                col, lambda p: robots_pattern_like(F.col("path"), p)
            ),
            F.lit(0),
            lambda acc, p: F.greatest(acc, F.length(p)),
        )

    with_host = links
    if "host" not in links.columns:
        with_host = with_host.withColumn("host", F.parse_url("url", F.lit("HOST")))
    # path-less URLs ('http://host') default to '/' — the oracle and the
    # udf mode both use ``urlsplit(url).path or '/'``; parse_url returns
    # an empty path there, which would make every deny prefix miss.
    # RFC 9309/Google semantics match against path + '?' + query (so
    # 'Disallow: /*?sessionid=' works and '/*.php$' does NOT match
    # '/x.php?a=1') — the query rides the match target when present
    with_host = with_host.withColumn(
        "path",
        F.concat(
            F.coalesce(
                F.nullif(F.parse_url("url", F.lit("PATH")), F.lit("")),
                F.lit("/"),
            ),
            F.coalesce(
                F.concat(
                    F.lit("?"), F.parse_url("url", F.lit("QUERY"))
                ),
                F.lit(""),
            ),
        ),
    )
    joined = with_host.join(F.broadcast(robots), "host", "left")
    deny_len = longest_match("deny_prefixes")
    allow_len = longest_match("allow_prefixes")
    allowed = joined.filter(
        F.col("deny_prefixes").isNull()
        | (deny_len == 0)
        | (F.coalesce(allow_len, F.lit(0)) >= deny_len)
    )
    return allowed.select("url", "url_hash", "host", *keep)


def _load_shard(
    kind: str, state_pdf: pd.DataFrame, m_bits: int, k: int
) -> "BloomShard | CuckooShard":
    if kind == "cuckoo":
        if len(state_pdf):
            return CuckooShard(
                table=bytes(state_pdf["bitmap"].iloc[0]),
                n_items=int(state_pdf["n_items"].iloc[0]),
            )
        return CuckooShard()
    if len(state_pdf):
        return BloomShard(
            m_bits, k,
            bitmap=bytes(state_pdf["bitmap"].iloc[0]),
            n_items=int(state_pdf["n_items"].iloc[0]),
        )
    return BloomShard(m_bits, k)


def _robots_match_target(url: str) -> str:
    """path + '?' + query (query included per the RFC 9309/Google
    convention) with the path-less default '/' — the python twin of the
    relational mode's match-target column."""
    parts = urlsplit(url)
    target = parts.path or "/"
    if parts.query:
        target += "?" + parts.query
    return target


def robots_allowed_py(
    host: str, path: str, rules_map: dict
) -> bool:
    """Python twin of ``robots_filter``'s RFC 9309 longest-match (and of
    the oracle's ``_robots_allowed``): the longest matching rule wins,
    so a more specific ``Allow`` overrides a broader ``Disallow``.
    Rule paths support the §2.2.3 ``*``/trailing-``$`` metacharacters
    (``robots.robots_pattern_matches``; imported at module level — this
    runs per candidate URL inside the wave cogroup)."""
    rules = rules_map.get(host)
    if rules is None:
        return True
    deny, allow = rules
    deny_len = max(
        (len(p) for p in deny if robots_pattern_matches(p, path)), default=0
    )
    if deny_len == 0:
        return True
    allow_len = max(
        (len(p) for p in allow if robots_pattern_matches(p, path)), default=0
    )
    return allow_len >= deny_len


def bloom_prefilter(
    candidates: DataFrame,
    bloom_state: DataFrame,
    num_shards: int,
    m_bits: int = DEFAULT_BITS_PER_SHARD,
    k: int = DEFAULT_NUM_HASHES,
    kind: str = "bloom",
    dedup: bool = False,
    pending: DataFrame | None = None,
    robots_bc=None,
) -> DataFrame:
    """Adds ``maybe_seen`` to candidates via the sharded approximate
    seen-set (bloom, or cuckoo when deletions are required).

    Cogrouped by shard_id: one task touches one bitmap; filter-negative
    rows are definitely new.  ``dedup=True`` also drops duplicate URLs
    inside the probe — EXACT, because the shard id is a pure function
    of the url so every duplicate lands in the same cogroup; this lets
    the wave pipeline skip a separate ``dropDuplicates`` shuffle of the
    full link set (duplicate rows carry identical values, so which one
    survives is immaterial).

    Two more wave stages can ride the SAME cogroup shuffle instead of
    costing a per-wave driver broadcast each (the round-2 plan
    broadcast both every wave):

    * ``pending`` — (url,) rows discovered since the last bloom fold;
      they union into the state side (their shard id is the same pure
      function of url) and the probe flags EXACT string matches in an
      ``in_pending`` column.  Exactness is preserved: a pending match
      is definitely-seen; everything else still flows through the
      bloom + exact-join path;
    * ``robots_bc`` — a ``sc.broadcast`` python dict
      ``{host: (deny_prefixes, allow_prefixes)}`` shipped ONCE per
      crawl (Spark re-ships a JVM broadcast join table every job ⇒
      every wave); the probe emits a ``robots_allowed`` column via the
      same longest-match the JVM filter computes.

    Flag columns appear only when the corresponding input is given;
    FILTERING on them is the caller's (map-side) job, so observation
    counters keep their meaning."""
    with_shard = candidates.withColumn(
        "shard_id", F.pmod(F.hash("url"), F.lit(num_shards))
    )

    state = bloom_state
    if pending is not None:
        state = bloom_state.withColumn(
            "pending_url", F.lit(None).cast("string")
        ).unionByName(
            pending.select(
                F.pmod(F.hash("url"), F.lit(num_shards)).alias("shard_id"),
                F.lit(None).cast("binary").alias("bitmap"),
                F.lit(None).cast("long").alias("n_items"),
                F.lit(None).cast("long").alias("shard_hash"),
                F.col("url").alias("pending_url"),
            )
        )

    has_pending = pending is not None
    check_robots = robots_bc is not None
    out_cols = ["url", "url_hash", "host", "maybe_seen"]
    out_schema = "url string, url_hash long, host string, maybe_seen boolean"
    if check_robots:
        out_cols.append("robots_allowed")
        out_schema += ", robots_allowed boolean"
    if has_pending:
        out_cols.append("in_pending")
        out_schema += ", in_pending boolean"

    def probe(key, cand_pdf: pd.DataFrame, state_pdf: pd.DataFrame) -> pd.DataFrame:
        if not len(cand_pdf):
            return pd.DataFrame(columns=out_cols)
        if dedup:
            cand_pdf = cand_pdf.drop_duplicates(subset=["url"])
        bitmap_pdf = state_pdf
        pending_set: set | None = None
        if "pending_url" in state_pdf.columns:
            mask = state_pdf["bitmap"].notna()
            bitmap_pdf = state_pdf[mask]
            pending_set = set(state_pdf["pending_url"][~mask])
        if len(bitmap_pdf):
            shard = _load_shard(kind, bitmap_pdf, m_bits, k)
            if isinstance(shard, CuckooShard):
                maybe = np.fromiter(
                    (shard.contains(int(h)) for h in cand_pdf["url_hash"]),
                    dtype=bool,
                    count=len(cand_pdf),
                )
            else:
                maybe = shard.maybe_contains(cand_pdf["url_hash"].to_numpy())
        else:
            maybe = np.zeros(len(cand_pdf), dtype=bool)
        out = {
            "url": cand_pdf["url"].to_numpy(),
            "url_hash": cand_pdf["url_hash"].to_numpy(),
            "host": cand_pdf["host"].to_numpy(),
            "maybe_seen": maybe,
        }
        if check_robots:
            from urllib.parse import urlsplit

            rules_map = robots_bc.value
            out["robots_allowed"] = np.fromiter(
                (
                    robots_allowed_py(
                        h, _robots_match_target(u), rules_map
                    )
                    for u, h in zip(cand_pdf["url"], cand_pdf["host"])
                ),
                dtype=bool,
                count=len(cand_pdf),
            )
        if pending_set is not None:
            out["in_pending"] = np.fromiter(
                (u in pending_set for u in cand_pdf["url"]),
                dtype=bool,
                count=len(cand_pdf),
            )
        elif has_pending:
            out["in_pending"] = np.zeros(len(cand_pdf), dtype=bool)
        return pd.DataFrame(out)

    return (
        with_shard.groupBy("shard_id")
        .cogroup(state.groupBy("shard_id"))
        .applyInPandas(probe, schema=out_schema)
    )


def bloom_update(
    added: DataFrame,
    bloom_state: DataFrame,
    num_shards: int,
    m_bits: int = DEFAULT_BITS_PER_SHARD,
    k: int = DEFAULT_NUM_HASHES,
    kind: str = "bloom",
    delete: bool = False,
) -> DataFrame:
    """Fold newly-seen url hashes into the shard filters; returns the new
    state (shard_id, bitmap, n_items, shard_hash) — the shard_hash
    doubles as per-partition lineage.  ``delete=True`` removes hashes
    instead (cuckoo only — bloom filters cannot forget)."""
    if delete and kind != "cuckoo":
        raise ValueError("deletion requires the cuckoo filter backend")
    with_shard = added.select(
        F.pmod(F.hash("url"), F.lit(num_shards)).alias("shard_id"), "url_hash"
    )

    def fold(key, new_pdf: pd.DataFrame, state_pdf: pd.DataFrame) -> pd.DataFrame:
        shard_id = int(key[0])
        shard = _load_shard(kind, state_pdf, m_bits, k)
        if len(new_pdf):
            if isinstance(shard, CuckooShard):
                for h in new_pdf["url_hash"]:
                    if delete:
                        shard.delete(int(h))
                    else:
                        shard.add(int(h))
            else:
                shard.add_hashes(new_pdf["url_hash"].to_numpy())
        return pd.DataFrame(
            [
                {
                    "shard_id": shard_id,
                    "bitmap": shard.to_bytes(),
                    "n_items": shard.n_items,
                    "shard_hash": shard.content_hash(),
                }
            ]
        )

    return (
        with_shard.groupBy("shard_id")
        .cogroup(bloom_state.groupBy("shard_id"))
        .applyInPandas(fold, schema=BLOOM_SCHEMA)
    )


GATE_STATE_SCHEMA = (
    "shard_id int, bitmap binary, n_items long, shard_hash long, "
    "seen_url string"
)


def seen_state_table(
    seen: DataFrame,
    bloom_state: DataFrame,
    num_shards: int,
    partitions: int,
) -> DataFrame:
    """Combined per-shard gate state: the bloom/cuckoo shard rows
    (``bitmap`` non-null) unioned with the exact seen rows reshaped into
    the same schema (``seen_url`` non-null), repartitioned
    hash(shard_id) — the layout ``shard_gate``'s cogroup consumes with
    ZERO state-side exchange.  Built once per COMMIT (the seen set and
    the folded bloom only change at commits) and cached; per wave only
    the wave's candidate keys shuffle."""
    bloom_rows = bloom_state.withColumn("seen_url", F.lit(None).cast("string"))
    seen_rows = seen.select(
        F.pmod(F.hash("url"), F.lit(num_shards)).alias("shard_id"),
        F.lit(None).cast("binary").alias("bitmap"),
        F.lit(None).cast("long").alias("n_items"),
        F.lit(None).cast("long").alias("shard_hash"),
        F.col("url").alias("seen_url"),
    )
    return bloom_rows.unionByName(seen_rows).repartition(
        partitions, "shard_id"
    )


def shard_gate(
    candidates: DataFrame,
    gate_state: DataFrame,
    num_shards: int,
    m_bits: int = DEFAULT_BITS_PER_SHARD,
    k: int = DEFAULT_NUM_HASHES,
    kind: str = "bloom",
    pending: DataFrame | None = None,
    robots_bc=None,
) -> DataFrame:
    """The wave's FUSED seen-set gate: dedup + bloom probe + EXACT seen
    check + pending-delta match (+ robots when ``robots_bc`` is given),
    all riding ONE cogroup shuffle of wave-sized keys.

    vs the two-phase shape (``bloom_prefilter`` → JVM anti-join): the
    cogroup's python output has UNKNOWN partitioning to Catalyst, so the
    exact anti-join ALWAYS forced one more full exchange + join stage
    per wave — fixed stage overhead that does not shrink with executors
    (the measured scaling residual).  Here the exact check happens where
    the physical layout is KNOWN: the seen rows ride the state side of
    the SAME cogroup (``seen_state_table`` pre-partitions them
    hash(shard_id) once per commit), and same-url rows always share a
    shard (shard id is a pure function of the url), so set membership in
    the python gate is exactly the anti-join's semantics.  The bloom
    filter remains the first-line probe (north-rule architecture): the
    exact set is consulted only for bloom-positive rows.

    ``pending`` (urls discovered since the last commit) rides the
    CANDIDATE side as tagged rows — the state cache cannot be unioned
    per wave without destroying its partitioning — and pending tags are
    never emitted.

    Output: deduped candidate rows with ``is_seen`` (bloom ∧ exact ∨
    pending) and optional ``robots_allowed`` flags; filtering stays
    map-side with the caller so observation counters keep their
    meaning."""
    with_shard = candidates.select(
        "url", "url_hash", "host", F.lit(False).alias("is_pending")
    )
    if pending is not None:
        # NOTE: non-null fillers, not nulls — a null in the long column
        # would arrive in pandas as float64 and silently corrupt the
        # real rows' 64-bit hashes above 2^53 (pending rows are never
        # emitted, so the filler VALUES are immaterial; the dtype is not)
        with_shard = with_shard.unionByName(
            pending.select(
                "url",
                F.xxhash64("url").alias("url_hash"),
                F.lit("").alias("host"),
                F.lit(True).alias("is_pending"),
            )
        )
    with_shard = with_shard.withColumn(
        "shard_id", F.pmod(F.hash("url"), F.lit(num_shards))
    )

    check_robots = robots_bc is not None
    out_cols = ["url", "url_hash", "host", "is_seen"]
    out_schema = "url string, url_hash long, host string, is_seen boolean"
    if check_robots:
        out_cols.append("robots_allowed")
        out_schema += ", robots_allowed boolean"

    def gate(key, cand_pdf: pd.DataFrame, state_pdf: pd.DataFrame) -> pd.DataFrame:
        pending_mask = cand_pdf["is_pending"].to_numpy(dtype=bool)
        pending_set = set(cand_pdf["url"][pending_mask])
        cand_pdf = cand_pdf[~pending_mask]
        if not len(cand_pdf):
            return pd.DataFrame(columns=out_cols)
        cand_pdf = cand_pdf.drop_duplicates(subset=["url"])
        bitmap_mask = state_pdf["bitmap"].notna()
        bitmap_pdf = state_pdf[bitmap_mask]
        seen_set = set(state_pdf["seen_url"][~bitmap_mask])
        urls = cand_pdf["url"].to_numpy()
        if len(bitmap_pdf):
            shard = _load_shard(kind, bitmap_pdf, m_bits, k)
            if isinstance(shard, CuckooShard):
                maybe = np.fromiter(
                    (shard.contains(int(h)) for h in cand_pdf["url_hash"]),
                    dtype=bool,
                    count=len(cand_pdf),
                )
            else:
                maybe = shard.maybe_contains(cand_pdf["url_hash"].to_numpy())
        else:
            maybe = np.zeros(len(cand_pdf), dtype=bool)
        # exact membership consulted ONLY where the bloom says maybe
        # (no false negatives ⇒ bloom-negative rows are definitely new);
        # pending matches are exact string equality, same as the seen set
        is_seen = np.fromiter(
            (
                (m and u in seen_set) or u in pending_set
                for u, m in zip(urls, maybe)
            ),
            dtype=bool,
            count=len(cand_pdf),
        )
        out = {
            "url": urls,
            "url_hash": cand_pdf["url_hash"].to_numpy(),
            "host": cand_pdf["host"].to_numpy(),
            "is_seen": is_seen,
        }
        if check_robots:
            from urllib.parse import urlsplit

            rules_map = robots_bc.value
            out["robots_allowed"] = np.fromiter(
                (
                    robots_allowed_py(h, _robots_match_target(u), rules_map)
                    for u, h in zip(urls, cand_pdf["host"])
                ),
                dtype=bool,
                count=len(cand_pdf),
            )
        return pd.DataFrame(out)

    return (
        with_shard.groupBy("shard_id")
        .cogroup(gate_state.groupBy("shard_id"))
        .applyInPandas(gate, schema=out_schema)
    )


def exact_new_filter(candidates: DataFrame, seen: DataFrame) -> DataFrame:
    """Exact seen-set anti-join in ONE pass: bloom-positive rows join on
    their url; bloom-negative rows (definitely new — bloom filters have
    no false negatives) get a private ``\\x00``-prefixed join key that
    can never match a canonical URL, so they flow through the same
    anti-join untouched instead of forking a second plan branch.

    The earlier filter-split-union shape (definite-new bypasses the
    join entirely) referenced the candidate pipeline TWICE in one
    query; Spark re-analyzes the second branch with fresh attribute ids
    and the python cogroup probe — the wave's most expensive stage —
    ran twice, cache or not.  The bypass key keeps one plan instance
    and one probe pass; the join stays co-partitioned with the
    url-partitioned seen cache (aliasing preserves hash partitioning),
    and bypass keys hash-spread evenly (no null-key skew)."""
    keyed = candidates.withColumn(
        "__jk",
        F.when(F.col("maybe_seen"), F.col("url")).otherwise(
            F.concat(F.lit("\x00"), F.col("url"))
        ),
    )
    return (
        keyed.join(
            seen.select(F.col("url").alias("__jk")), "__jk", "left_anti"
        )
        .select("url", "url_hash", "host")
    )


def new_frontier_rows(
    new_urls: DataFrame, wave: int, host_priority: DataFrame | None = None
) -> DataFrame:
    """Frontier rows for wave ``wave+1``: priority = 1/(wave+2); seq =
    url_hash — a pure function of the URL, so no global ranking shuffle
    is needed for deterministic ordering.

    ``host_priority`` (optional): a ``(host, priority_rank)`` dim table
    — ``host_quality_priority`` or the PageRank priority rollup, rank 1
    = best — broadcast-joined in so better-ranked hosts' links carry a
    monotone boost ``1 / (2·(wave+2)·rank)``.  Dequeue order is (wave,
    priority DESC, ...), and every new row of a wave shares the same
    base, so the boost reorders ONLY within the discovery wave (the
    deterministic tiebreak chain below priority is untouched); hosts
    absent from the table keep the plain base.  Default None: plan and
    ordering byte-identical to the reference parity corpus."""
    priority: Column = F.lit(NEW_PRIORITY_BASE / float(wave + 2))
    rows = new_urls
    if host_priority is not None:
        hp = host_priority.select(
            F.col("host").alias("__hp_host"),
            F.col("priority_rank").cast("double").alias("__hp_rank"),
        )
        rows = rows.join(
            F.broadcast(hp), rows["host"] == hp["__hp_host"], "left"
        )
        boost = F.lit(NEW_PRIORITY_BASE / (2.0 * float(wave + 2))) / F.col(
            "__hp_rank"
        )
        priority = priority + F.coalesce(boost, F.lit(0.0))
    return rows.select(
        "url",
        "url_hash",
        "host",
        priority.alias("priority"),
        F.col("url_hash").alias("seq"),
        F.lit(wave + 1).alias("discovered_wave"),
    )


def host_quality_priority(
    flagged: DataFrame,
    host_col: str = "host",
    keep_col: str = "keep",
) -> DataFrame:
    """Per-host quality rollup → crawl priority: the feedback loop
    production crawlers close between the corpus filter and the
    frontier (hosts whose fetched pages keep passing the quality gate
    earn budget; boilerplate farms lose it).  Input is one boolean
    quality verdict per fetched page; output one row per host:
    ``(host, n_docs, n_keep, keep_rate, priority_rank)`` with rank 1 =
    best (``keep_rate`` DESC, host ASC tiebreak — total order, so the
    ranking is deterministic and engine-replayable).

    Scale shape: ONE map-side-combined groupBy(host); the result is
    dim-table-sized (hosts ≪ pages), so the global rank window —
    a single-partition sort — is over thousands-to-millions of rows,
    not the corpus, and the table re-enters the crawl loop as a
    BROADCAST join against frontier candidates (`prepare_seeds` /
    `new_frontier_rows` consume it as a priority source).

    Reference counterpart: none — parsel stops at extraction; this is
    the scheduling layer above it."""
    agg = flagged.groupBy(host_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col(keep_col).cast("long")).alias("n_keep"),
    )
    from pyspark.sql import Window

    rated = agg.select(
        host_col,
        "n_docs",
        "n_keep",
        (F.col("n_keep") / F.col("n_docs")).alias("keep_rate"),
    )
    rank_w = Window.orderBy(F.col("keep_rate").desc(), F.col(host_col))
    return rated.withColumn(
        "priority_rank", F.rank().over(rank_w).cast("long")
    )


def recrawl_due(
    state: DataFrame,
    now_ts: int,
    min_interval_s: int = 86400,
    max_interval_s: int = 30 * 86400,
    url_col: str = "url",
) -> DataFrame:
    """Adaptive revisit scheduling (the public Cho & Garcia-Molina
    revisit-policy shape: frequently-changing pages revisit often,
    static pages back off exponentially).  Input: one row per known URL
    with ``last_fetch_ts`` (epoch seconds, NULL = never fetched),
    ``last_change_ts`` (last observed content change, NULL = unknown)
    and ``unchanged_count`` (consecutive unchanged revisits).  Output
    adds:

    * ``interval_s`` — ``clamp(min_interval_s * 2^unchanged_count,
      min, max)``, integer-exact (shifts, no floats);
    * ``due`` — never fetched, OR a change was observed after the last
      fetch (sitemap ``lastmod`` / ETag feeds ``last_change_ts``), OR
      the backoff interval has elapsed;
    * ``overdue_s`` — seconds past due (0 when not due): the natural
      priority column for :func:`politeness_window`'s ordering.

    Pure map-side column algebra over the catalog table — no shuffle;
    at 10^10 URLs the due-set filter pushes down to the scan and only
    due rows enter the wave.  ``now_ts`` is an explicit argument (never
    wall clock) so runs are deterministic and resumable."""
    if min_interval_s < 1 or max_interval_s < min_interval_s:
        raise ValueError(
            f"need 1 <= min_interval_s <= max_interval_s, got "
            f"{min_interval_s}, {max_interval_s}"
        )
    last_fetch = F.col("last_fetch_ts")
    last_change = F.col("last_change_ts")
    # 2^unchanged_count via shiftleft, capped BEFORE the multiply so a
    # deep backoff cannot overflow: counts beyond the cap's exponent
    # all clamp to max_interval_s
    max_exp = int(max(0, (max_interval_s // min_interval_s))).bit_length()
    # SQL shiftleft accepts a column bit count (the python DSL wrapper
    # does not) — both engines replay this exact integer expression
    interval = F.least(
        F.lit(min_interval_s).cast("long")
        * F.expr(
            f"shiftleft(CAST(1 AS BIGINT), "
            f"least(unchanged_count, {max_exp}))"
        ),
        F.lit(max_interval_s).cast("long"),
    )
    elapsed = F.lit(now_ts).cast("long") - last_fetch
    due = (
        last_fetch.isNull()
        | (last_change.isNotNull() & (last_change > last_fetch))
        | (elapsed >= interval)
    )
    overdue = F.when(
        last_fetch.isNull(), F.lit(now_ts).cast("long")
    ).otherwise(F.greatest(elapsed - interval, F.lit(0).cast("long")))
    return state.select(
        url_col,
        "last_fetch_ts",
        "last_change_ts",
        "unchanged_count",
        interval.alias("interval_s"),
        due.alias("due"),
        F.when(due, overdue).otherwise(F.lit(0).cast("long")).alias(
            "overdue_s"
        ),
    )


def snapshot_delta(
    old: DataFrame,
    new: DataFrame,
    url_col: str = "url",
    digest_col: str = "digest",
) -> DataFrame:
    """Incremental-crawl CDC between two corpus snapshots: classify
    every URL as ``new`` / ``changed`` / ``unchanged`` / ``gone`` by
    full-outer-joining the previous snapshot's ``(url, digest)`` view
    against the fresh capture's (digest = any stable content hash; the
    WARC/CDX layer's payload md5 — ``warc.cdx_index`` — is the natural
    feed).  Output per URL: ``old_digest``, ``new_digest``, ``status``,
    and ``next_unchanged_count`` — the revisit-state update that plugs
    STRAIGHT into :func:`recrawl_due` (changed/new reset the backoff
    to 0, unchanged increments, gone yields NULL for purge) when the
    old side carries ``unchanged_count`` (absent ⇒ treated as 0).

    Scale shape: ONE equi-join on the URL key — with both snapshots
    stored as url-bucketed tables (``sources/ingest.py``) the join is
    exchange-free; otherwise it is the single unavoidable hash
    exchange.  Pure column algebra after the join, no Python, no
    driver data.  This is the standard incremental-ingest delta
    (Iceberg/Hudi-style CDC reduced to engine-portable algebra)."""
    have_count = "unchanged_count" in old.columns
    o = old.select(
        F.col(url_col).alias("url"),
        F.col(digest_col).alias("old_digest"),
        (
            F.col("unchanged_count") if have_count else F.lit(0)
        ).cast("int").alias("__old_count"),
    )
    n = new.select(
        F.col(url_col).alias("__new_url"),
        F.col(digest_col).alias("new_digest"),
    )
    joined = o.join(n, o["url"] == n["__new_url"], "full_outer")
    status = (
        F.when(F.col("url").isNull(), F.lit("new"))
        .when(F.col("__new_url").isNull(), F.lit("gone"))
        .when(F.col("old_digest") != F.col("new_digest"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    next_count = (
        F.when(status == "unchanged", F.col("__old_count") + 1)
        .when(status.isin("new", "changed"), F.lit(0))
        .cast("int")
    )
    return joined.select(
        F.coalesce("url", "__new_url").alias(url_col),
        "old_digest",
        "new_digest",
        status.alias("status"),
        next_count.alias("next_unchanged_count"),
    )


def snapshot_delta_stream(
    new_stream: DataFrame,
    old: DataFrame,
    url_col: str = "url",
    digest_col: str = "digest",
) -> DataFrame:
    """The STREAMING half of :func:`snapshot_delta` — continuous-ingest
    CDC: fresh captures arrive as a stream and classify against the
    static previous snapshot via a stream-static LEFT join (``new`` /
    ``changed`` / ``unchanged`` + the same ``next_unchanged_count``
    revisit update).  ``gone`` is intentionally absent: a stream cannot
    observe absence — tombstoning stays with the batch full-outer op
    (run it at compaction cadence).  Same status algebra as the batch
    twin; the driver row pins the two to one oracle."""
    have_count = "unchanged_count" in old.columns
    o = old.select(
        F.col(url_col).alias("__old_url"),
        F.col(digest_col).alias("old_digest"),
        (
            F.col("unchanged_count") if have_count else F.lit(0)
        ).cast("int").alias("__old_count"),
    )
    n = new_stream.select(
        F.col(url_col).alias("url"),
        F.col(digest_col).alias("new_digest"),
    )
    joined = n.join(o, n["url"] == o["__old_url"], "left")
    status = (
        F.when(F.col("__old_url").isNull(), F.lit("new"))
        .when(F.col("old_digest") != F.col("new_digest"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    next_count = (
        F.when(status == "unchanged", F.col("__old_count") + 1)
        .otherwise(F.lit(0))
        .cast("int")
    )
    return joined.select(
        "url",
        "old_digest",
        "new_digest",
        status.alias("status"),
        next_count.alias("next_unchanged_count"),
    )
