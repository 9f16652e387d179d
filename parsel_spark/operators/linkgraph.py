"""Link-graph analytics for crawl prioritization.

A production frontier ranks hosts (and pages) by link-graph centrality —
PageRank is the canonical signal (Page, Brin, Motwani, Winograd, "The
PageRank Citation Ranking", Stanford InfoLab 1999; Malewicz et al.,
"Pregel", SIGMOD 2010 for the distributed iteration shape).  The
reference (scrapy/parsel) extracts the links; this module turns the
extracted edge list into the priority signal the frontier consumes
(compose with ``frontier.host_quality_priority`` — quality feedback and
centrality are the two public prioritization inputs).

Scale shape (10^10 URLs ⇒ ~10^8 hosts at the host level): the edge
list is hash-partitioned on ``src`` ONCE and cached; every iteration is
one co-partitioned SHUFFLE_HASH join (edges never move again) plus one
map-side-combined groupBy(dst) — the transpose exchange that is the
irreducible cost of a power-method round.  Rank state is pinned with an
eager ``localCheckpoint`` per round (iterative DataFrames must truncate
lineage — same discipline as ``dedup.dup_clusters``).  The graph-size
scalar N and the per-round dangling mass stay DISTRIBUTED: 1-row
aggregates broadcast-cross-joined in, never ``.collect()``-ed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def pagerank(
    edges: DataFrame,
    iters: int = 3,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Fixed-iteration power-method PageRank over a directed edge list.

    Returns ``(node, rank)`` for EVERY node appearing as a source or a
    destination.  Semantics per round (the classic formulation with
    uniform dangling-mass redistribution)::

        rank'(v) = (1-d)/N + d * ( sum_{u->v} rank(u)/outdeg(u)
                                   + dangling_mass/N )

    where ``dangling_mass`` is the summed rank of nodes with no
    out-edges.  Total rank mass stays 1 every round (the invariant the
    unit tests pin).  Parallel edges count once per occurrence — pass a
    ``.distinct()`` edge list for simple-graph semantics.

    ``iters`` is FIXED, not convergence-driven: crawl prioritization
    needs a stable, replayable ordering signal, and a fixed round count
    makes the op a pure function of the graph (oracle-replayable by
    unrolling the rounds in SQL).  3–5 rounds separate head from tail
    hosts; ranking positions stabilize long before the values do
    (public PageRank practice).

    Determinism: pure function of (edges, iters, damping) — summation
    order affects only the last float ulps; round the output before
    cross-engine comparison.
    """
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    if not (0.0 < damping < 1.0):
        raise ValueError(f"damping must be in (0, 1), got {damping}")
    from ..functions.planning import static_planning

    spark = edges.sparkSession
    partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    d = float(damping)

    with static_planning(spark):
        return _pagerank_rounds(edges, iters, d, src_col, dst_col, partitions)


def _pagerank_rounds(
    edges: DataFrame,
    iters: int,
    d: float,
    src_col: str,
    dst_col: str,
    partitions: int,
) -> DataFrame:
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .repartition(partitions, "src")
        .cache()
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .repartition(partitions, "node")
        .cache()
    )
    # per-source out-degree; carried hash(src) so the per-round join
    # against edges is exchange-free on both sides
    outdeg = (
        e.groupBy("src")
        .agg(F.count(F.lit(1)).cast("double").alias("outdeg"))
        .repartition(partitions, "src")
        .cache()
    )
    # N as a DISTRIBUTED 1-row scalar (broadcast cross join, no action)
    n_df = nodes.agg(F.count(F.lit(1)).cast("double").alias("n"))

    # Intermediate rounds pin LAZILY (eager=False): the RDD is still
    # marked for local checkpointing — so lineage stays truncated and
    # every round's plan is O(round-size), exactly as before — but no
    # per-round driver job runs.  Only the LAST round pins eagerly; its
    # materialization cascades through the pending checkpoints (each
    # round's RDD computes exactly once — shared RDD node in the DAG,
    # checkpointed on first computation), collapsing the loop from
    # ~3 jobs/round (pin + re-broadcast n_df + dang_df) to one final
    # job plus the per-round broadcast builds.  Values are untouched:
    # same exchanges, same partitioning, same per-partition arithmetic
    # order (pinned vs the unrolled oracle CTE either way).
    ranks = (
        nodes.crossJoin(F.broadcast(n_df))
        .select("node", (F.lit(1.0) / F.col("n")).alias("rank"))
        .repartition(partitions, "node")
        .localCheckpoint(eager=False)
    )

    for _round in range(iters):
        # rank share per source = rank/outdeg; nodes absent from outdeg
        # are dangling and contribute to the uniform mass instead
        with_deg = ranks.join(
            outdeg.hint("SHUFFLE_HASH"),
            ranks["node"] == outdeg["src"],
            "left",
        )
        dang_df = with_deg.where(F.col("outdeg").isNull()).agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dang")
        )
        shares = with_deg.where(F.col("outdeg").isNotNull()).select(
            F.col("src").alias("share_src"),
            (F.col("rank") / F.col("outdeg")).alias("share"),
        )
        contribs = (
            e.join(
                shares.hint("SHUFFLE_HASH"),
                e["src"] == shares["share_src"],
            )
            .groupBy("dst")
            .agg(F.sum("share").alias("contrib"))
        )
        stepped = (
            nodes.join(
                contribs.hint("SHUFFLE_HASH"),
                nodes["node"] == contribs["dst"],
                "left",
            )
            .crossJoin(F.broadcast(n_df))
            .crossJoin(F.broadcast(dang_df))
            .select(
                "node",
                (
                    (1.0 - d) / F.col("n")
                    + d
                    * (
                        F.coalesce("contrib", F.lit(0.0))
                        + F.col("dang") / F.col("n")
                    )
                ).alias("rank"),
            )
            .repartition(partitions, "node")
        )
        # last round eager: materializes the whole cascade while the
        # e/nodes/outdeg caches are still live (unpersist follows)
        ranks = stepped.localCheckpoint(eager=(_round == iters - 1))
    e.unpersist()
    nodes.unpersist()
    outdeg.unpersist()
    return ranks


def pagerank_oracle_cte(
    edges_cte: str, iters: int = 3, damping: float = 0.85
) -> str:
    """The ANSI-SQL replay of :func:`pagerank` with the rounds UNROLLED
    as chained CTEs — shared by the driver oracle and the unit tests so
    Spark and DuckDB always state the same algebra.  ``edges_cte`` must
    be a SELECT yielding ``(src, dst)``."""
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    d = repr(float(damping))
    parts = [
        f"WITH e AS ({edges_cte})",
        "nodes AS (SELECT DISTINCT node FROM ("
        "SELECT src AS node FROM e UNION ALL SELECT dst FROM e))",
        "nn AS (SELECT count(*)::DOUBLE AS n FROM nodes)",
        "deg AS (SELECT src, count(*)::DOUBLE AS outdeg FROM e GROUP BY src)",
        "r0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS rank FROM nodes)",
    ]
    for k in range(1, iters + 1):
        p = f"r{k - 1}"
        parts.append(
            f"d{k} AS (SELECT coalesce(sum(rank), 0.0) AS dang "
            f"FROM {p} LEFT JOIN deg ON {p}.node = deg.src "
            "WHERE deg.outdeg IS NULL)"
        )
        parts.append(
            f"c{k} AS (SELECT e.dst AS node, "
            f"sum(r.rank / deg.outdeg) AS contrib "
            f"FROM e JOIN {p} r ON e.src = r.node "
            "JOIN deg ON e.src = deg.src GROUP BY e.dst)"
        )
        parts.append(
            f"r{k} AS (SELECT nodes.node, "
            f"(1.0 - {d}) / (SELECT n FROM nn) + {d} * ("
            f"coalesce(c.contrib, 0.0) "
            f"+ (SELECT dang FROM d{k}) / (SELECT n FROM nn)) AS rank "
            f"FROM nodes LEFT JOIN c{k} c ON nodes.node = c.node)"
        )
    return ",\n".join(parts) + f"\nSELECT node, rank FROM r{iters}"


def anchor_rollup(
    anchors: DataFrame,
    href_col: str = "href",
    text_col: str = "anchor_text",
    src_col: str = "doc_id",
) -> DataFrame:
    """Inbound anchor-text aggregation per link target — the classic
    link-graph text signal (anchor corpora describe the TARGET page
    better than its own content; public lineage: search-engine anchor
    indexing, link-text retrieval corpora).  Input: one row per anchor
    occurrence (source doc, target href, anchor text — the
    ``extract_anchors`` output exploded).  Output per target:
    ``(href, n_inlinks, n_sources, top_anchor_text)`` where the top
    text is the most frequent (count DESC, text ASC tiebreak —
    deterministic mode).

    Scale shape: ONE hash(href, text) aggregate (map-side combined)
    feeds the per-href window; the totals rollup reuses the same
    hash(href) partitioning AQE derives from it.  Anchor text never
    shuffles more than once."""
    from pyspark.sql import Window

    per_text = anchors.groupBy(
        F.col(href_col).alias("href"), F.col(text_col).alias("text")
    ).agg(F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy("href").orderBy(
        F.col("c").desc(), F.col("text").asc()
    )
    top = per_text.select(
        "href", "text", F.row_number().over(w).alias("rn")
    ).where(F.col("rn") == 1)
    totals = anchors.groupBy(F.col(href_col).alias("href")).agg(
        F.count(F.lit(1)).alias("n_inlinks"),
        F.countDistinct(F.col(src_col)).alias("n_sources"),
    )
    return totals.join(top, "href").select(
        "href",
        "n_inlinks",
        "n_sources",
        F.col("text").alias("top_anchor_text"),
    )
