"""URL-level corpus curation: blocklist + word-score filtering and SURT
canonical sort keys.

Two public-recipe surfaces the crawl→LLM pipelines run between frontier
and fetch (reference counterpart: none — parsel stops at extraction;
this is the curation layer over its link output):

* RefinedWeb-lineage URL filtering (Penedo et al., NeurIPS 2023
  datasets track): a domain blocklist (UT1-style) plus a weighted
  URL-word score.  Both are map-only / broadcast shapes — the corpus
  side never shuffles.
* SURT keys (Sort-friendly URI Reordering Transform — the public
  OpenWayback/Common-Crawl CDX convention): host labels reversed and
  comma-joined so one lexicographic sort range-partitions a 100 TB URL
  index by registered domain, with every subdomain of a site adjacent.

Everything here is pure `pyspark.sql.functions` column algebra (JVM,
whole-stage codegen) — no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def url_host(url_col: Column | str) -> Column:
    """Lowercased authority host of a URL (JVM ``parse_url``)."""
    col = F.col(url_col) if isinstance(url_col, str) else url_col
    return F.lower(F.parse_url(col, F.lit("HOST")))


def host_suffixes(host_col: Column, max_labels: int = 5) -> Column:
    """Array of dot-suffixes of a host with 2..max_labels labels —
    ``a.b.c.d`` → ``['c.d', 'b.c.d', 'a.b.c.d']``.

    This is the bounded map-side explode that turns "host is the
    blocked domain OR any subdomain of it" into an EQUI-join: a UT1
    blocklist entry ``tracker.test`` must also block
    ``ads.tracker.test``, and a suffix-match non-equi join would be a
    cartesian disaster at 10^10 URLs; ≤ (max_labels-1) candidate keys
    per URL joined hash-to-hash is the scale shape.  Single-label hosts
    (``localhost``) yield just themselves — blocklists don't list bare
    TLDs, so 1-label suffixes of multi-label hosts are never candidates.
    """
    labels = F.split(host_col, "\\.")
    n = F.size(labels)
    multi = F.transform(
        F.sequence(F.lit(2), F.least(n, F.lit(max_labels))),
        lambda k: F.array_join(F.slice(labels, n - k + 1, k), "."),
    )
    return F.when(n >= 2, multi).otherwise(F.array(host_col))


def url_word_score(url_col: Column | str, weights: dict[str, int]) -> Column:
    """Weighted sum of blocklist words CONTAINED in the lowercased URL
    (substring semantics, the public soft-filter recipe: ``casino`` in
    host, path or query all count once).  Compiles to one chained
    CASE-WHEN expression — codegen-friendly, zero shuffle; intended for
    word lists of tens-to-hundreds of entries (the public lists' size).

    Words must be non-empty and lowercase; raises otherwise so a
    miscased list cannot silently never match."""
    if not weights:
        raise ValueError("url_word_score needs a non-empty weight table")
    for word in weights:
        if not word or word != word.lower():
            raise ValueError(f"blocklist words must be non-empty lowercase: {word!r}")
    col = F.col(url_col) if isinstance(url_col, str) else url_col
    low = F.lower(col)
    score = F.lit(0)
    for word, weight in sorted(weights.items()):
        score = score + F.when(low.contains(word), F.lit(int(weight))).otherwise(
            F.lit(0)
        )
    return score.cast("long")


def url_filter_flags(
    urls: DataFrame,
    blocked_domains: DataFrame,
    word_weights: dict[str, int],
    word_threshold: int,
    url_col: str = "url",
) -> DataFrame:
    """RefinedWeb-style URL curation verdict per input row.

    Output columns (input columns preserved): ``host_blocked`` (host is
    a blocked domain or a subdomain of one), ``word_score`` (weighted
    URL-word sum), ``scheme_ok`` (http/https), and
    ``keep = scheme_ok AND NOT host_blocked AND word_score < threshold``.

    ``blocked_domains`` is a 1-column (``domain``) DataFrame.  Scale
    shape: the corpus side computes ≤``max_labels-1`` suffix keys
    map-side and probes the (deduplicated, lowercased) blocklist
    through one BROADCAST LEFT hash join PER SUFFIX POSITION — UT1-size
    lists (a few million short strings) fit executors comfortably, and
    because every join is broadcast the corpus never exchanges at all;
    exploding suffixes into rows instead would force a re-aggregation
    shuffle of the whole corpus just to get back to one row per URL.
    The word score is pure map-side column algebra."""
    max_labels = 5
    host = url_host(F.col(url_col))
    scheme = F.lower(F.parse_url(F.col(url_col), F.lit("PROTOCOL")))
    # distinct() so a duplicated blocklist entry cannot fan corpus rows out
    block = blocked_domains.select(F.lower("domain").alias("domain")).distinct()
    flagged = urls.withColumn("__suffixes", host_suffixes(host, max_labels))
    markers = []
    for i in range(max_labels - 1):
        sfx, mark = f"__sfx{i}", f"__hit{i}"
        flagged = (
            # F.get (0-based) is null-safe past the array end even under
            # ANSI mode, where element_at would raise INVALID_ARRAY_INDEX
            flagged.withColumn(sfx, F.get("__suffixes", i))
            .join(
                F.broadcast(
                    block.select(
                        F.col("domain").alias(sfx), F.lit(True).alias(mark)
                    )
                ),
                sfx,
                "left",
            )
            .drop(sfx)
        )
        markers.append(mark)
    score = url_word_score(F.col(url_col), word_weights)
    keep_blocked = F.coalesce(F.col(markers[0]), F.lit(False))
    for mark in markers[1:]:
        keep_blocked = keep_blocked | F.coalesce(F.col(mark), F.lit(False))
    return flagged.select(
        *urls.columns,
        keep_blocked.alias("host_blocked"),
        score.alias("word_score"),
        scheme.isin("http", "https").alias("scheme_ok"),
        (
            scheme.isin("http", "https")
            & ~keep_blocked
            & (score < F.lit(int(word_threshold)))
        ).alias("keep"),
    )


def surt_key(url_col: Column | str, strip_www: bool = True) -> Column:
    """SURT (Sort-friendly URI Reordering Transform) key of a URL, the
    public CDX-index convention: lowercase, drop the scheme, reverse
    the host labels joined by commas, then ``)`` + path (+ ``?query``).

    ``http://www.Example.com/A/b?q=1`` → ``com,example)/a/b?q=1``.

    A leading ``www.`` label is dropped by default (the CDX
    canonicalizer's rule — ``www.example.com`` and ``example.com`` are
    one crawl identity).  Port, userinfo and fragment are dropped.
    Empty paths normalize to ``/`` so a bare host still sorts before
    all its pages.

    Why it matters at 100 TB: range-partitioning or sorting by this key
    clusters every page of a registered domain (and all its subdomains)
    into adjacent partitions — per-host scheduling, politeness lookups
    and index seeks become partition-local instead of scatter-gather.
    Pure JVM column algebra."""
    col = F.col(url_col) if isinstance(url_col, str) else url_col
    host = F.lower(F.parse_url(col, F.lit("HOST")))
    if strip_www:
        host = F.regexp_replace(host, "^www\\.", "")
    rev = F.array_join(F.reverse(F.split(host, "\\.")), ",")
    path = F.lower(
        F.coalesce(F.nullif(F.parse_url(col, F.lit("PATH")), F.lit("")), F.lit("/"))
    )
    query = F.lower(F.parse_url(col, F.lit("QUERY")))
    return F.concat(
        rev,
        F.lit(")"),
        path,
        F.coalesce(F.concat(F.lit("?"), query), F.lit("")),
    )


#: the public tracking-parameter families every crawler's canonicalizer
#: strips (Google Analytics utm_*, Facebook fbclid, Google Ads gclid,
#: Microsoft msclkid, Mailchimp mc_eid) — key-exact, case-sensitive
#: (the trackers emit them lowercase; unknown cases are left alone)
TRACKING_PARAM_PATTERN = r"^(utm_[a-z]+|fbclid|gclid|msclkid|mc_eid)$"


def strip_tracking_params(url_col: Column | str) -> Column:
    """URL with tracking query parameters removed — the crawl-identity
    normalization that stops ``?utm_source=…`` variants from inflating
    a 10^10-URL frontier with duplicate crawl targets.  Non-tracking
    parameters keep their original order and encoding; a query that
    becomes empty drops its ``?``; URLs without a query pass through
    unchanged.  Pure JVM higher-order-function algebra (split → filter
    → rejoin), map-only, whole-stage-codegen friendly — composes
    before :func:`parsel_spark.functions.canonical.canonicalize_url`
    (which then sorts/re-encodes the survivors)."""
    col = F.col(url_col) if isinstance(url_col, str) else url_col
    base = F.substring_index(col, "?", 1)
    query = F.parse_url(col, F.lit("QUERY"))
    kept = F.filter(
        F.split(query, "&"),
        lambda p: ~F.element_at(F.split(p, "="), 1).rlike(
            TRACKING_PARAM_PATTERN
        ),
    )
    newq = F.array_join(kept, "&")
    return (
        F.when(query.isNull(), col)
        .when(newq == "", base)
        .otherwise(F.concat(base, F.lit("?"), newq))
    )


def canonical_collapse(
    pages: DataFrame,
    url_col: str = "url",
    canonical_col: str = "canonical",
) -> DataFrame:
    """Collapse crawled captures by CONTENT-level URL identity — the
    rel-canonical convention (RFC 6596): parameterized/mirrored
    captures that declare the same ``<link rel=canonical>`` target are
    one logical page.  Input carries the page URL and the extracted
    canonical target (``udfs.extract_rel_canonical``; NULL ⇒ the page
    is its own canonical).  Output one row per logical page:
    ``(canonical_url, n_captures, kept_url)`` — ``kept_url`` prefers
    the capture that IS the canonical target (the authoritative
    version), else the smallest capture URL (deterministic).

    Scale shape: ONE map-side-combined groupBy on the canonical key;
    composes before ``snapshot_delta``/``revisit_dedup`` so storage
    and recrawl run on logical pages, not capture variants."""
    tgt = F.coalesce(F.col(canonical_col), F.col(url_col))
    g = pages.select(
        tgt.alias("canonical_url"), F.col(url_col).alias("__u")
    )
    return (
        g.groupBy("canonical_url")
        .agg(
            F.count(F.lit(1)).alias("n_captures"),
            F.min(
                F.when(F.col("__u") == F.col("canonical_url"), F.col("__u"))
            ).alias("__self"),
            F.min("__u").alias("__min"),
        )
        .select(
            "canonical_url",
            "n_captures",
            F.coalesce("__self", "__min").alias("kept_url"),
        )
    )
