"""Vectorized selector UDFs — the Spark face of the selector core.

Design (SURVEY.md §3.3, §4.2):

* all row processing flows through Arrow-batched ``pandas_udf`` — never
  row-at-a-time Python UDFs (driver mandate: "no per-row Python" at the
  API boundary);
* CSS→XPath translation and XPath compilation happen **once** per worker
  process (module-level ``lru_cache`` in the selector core) and the
  query *string* is what ships in the UDF closure — compile errors
  surface on the driver before any job is submitted;
* chained queries (``css().xpath().re()``) are composed on the driver
  into a single pipeline spec executed in one UDF pass, so each document
  is parsed exactly once per stage (the reference re-uses one lxml tree
  per ``Selector`` the same way, parsel/selector.py:562-623).

At 100 TB scale the html payload column never shuffles: these UDFs run
map-side against the parquet scan and only their (much smaller) string
array results flow downstream.
"""

from __future__ import annotations

from typing import Any, Iterable

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from ..selector import Selector
from ..selector.css import translator_for

# ---------------------------------------------------------------------------
# pipeline spec: a tuple of ops, each ("xpath"|"css"|"jmespath"|"re", arg)
# terminated implicitly by the extraction mode of the calling helper.
# ---------------------------------------------------------------------------


def compile_css(query: str, type_: str = "html") -> str:
    """Driver-side CSS→XPath translation (fails fast on bad queries)."""
    return translator_for(type_).css_to_xpath(query)


def _run_pipeline(
    sel: Selector, ops: tuple, namespaces: dict | None = None
) -> Any:
    result: Any = sel
    for kind, arg in ops:
        if kind == "xpath":
            result = result.xpath(arg, namespaces=namespaces)
        elif kind == "css":
            result = result.css(arg)
        elif kind == "jmespath":
            result = result.jmespath(arg)
        elif kind == "re":
            return result.re(arg)
        else:  # pragma: no cover
            raise ValueError(f"unknown pipeline op {kind}")
    return result


def _make_selector(payload: Any, type_: str | None) -> Selector | None:
    if payload is None:
        return None
    try:
        return Selector(text=payload, type=type_)
    except Exception:
        return None


def select_getall(
    column: Column | str,
    *ops: tuple,
    type: str | None = None,
    namespaces: dict | None = None,
) -> Column:
    """``ARRAY<STRING>`` of ``getall()`` results after running the op
    pipeline against each document; one parse per row.  ``namespaces``
    maps extra prefixes for the xpath ops (e.g. the EXSLT ``str:`` /
    ``math:`` namespaces, which are opt-in — reference parity)."""
    # validate driver-side so bad queries fail before job submit
    for kind, arg in ops:
        if kind == "css":
            compile_css(arg, type or "html")
        elif kind == "xpath":
            from ..selector.xpath.parser import compile_xpath

            compile_xpath(arg)

    @pandas_udf(T.ArrayType(T.StringType()))
    def _udf(payloads: pd.Series) -> pd.Series:
        out = []
        for payload in payloads:
            sel = _make_selector(payload, type)
            if sel is None:
                out.append([])
                continue
            try:
                result = _run_pipeline(sel, ops, namespaces=namespaces)
                if isinstance(result, list):  # .re() terminal
                    out.append([str(v) for v in result])
                else:
                    out.append([str(v) for v in result.getall()])
            except Exception:
                out.append([])
        return pd.Series(out)

    return _udf(column)


def xpath_getall(
    column: Column | str,
    query: str,
    type: str | None = None,
    namespaces: dict | None = None,
) -> Column:
    """Vectorized ``Selector(html).xpath(query).getall()``."""
    return select_getall(column, ("xpath", query), type=type, namespaces=namespaces)


def css_getall(column: Column | str, query: str, type: str | None = None) -> Column:
    """Vectorized ``Selector(html).css(query).getall()``."""
    return select_getall(column, ("css", query), type=type)


def re_extract(
    column: Column | str, pattern: str, replace_entities: bool = True
) -> Column:
    """Vectorized ``Selector(html).re(pattern)`` (full policy: named
    ``extract`` group, entity replacement except ``&amp;``/``&lt;``)."""

    @pandas_udf(T.ArrayType(T.StringType()))
    def _udf(payloads: pd.Series) -> pd.Series:
        out = []
        for payload in payloads:
            sel = _make_selector(payload, None)
            if sel is None:
                out.append([])
                continue
            try:
                out.append(sel.re(pattern, replace_entities=replace_entities))
            except Exception:
                out.append([])
        return pd.Series(out)

    return _udf(column)


def attrib_map(column: Column | str, query: str, type: str | None = None) -> Column:
    """``MAP<STRING,STRING>`` of the first matched element's attributes
    (SelectorList.attrib semantics, parsel/selector.py:277-284)."""
    compile_css(query, type or "html")

    @pandas_udf(T.MapType(T.StringType(), T.StringType()))
    def _udf(payloads: pd.Series) -> pd.Series:
        out = []
        for payload in payloads:
            sel = _make_selector(payload, type)
            if sel is None:
                out.append({})
                continue
            try:
                out.append(dict(sel.css(query).attrib))
            except Exception:
                out.append({})
        return pd.Series(out)

    return _udf(column)


def jmespath_getall(column: Column | str, query: str) -> Column:
    """Vectorized JMESPath over a JSON string column; results stringified
    like ``getall()`` does."""

    @pandas_udf(T.ArrayType(T.StringType()))
    def _udf(payloads: pd.Series) -> pd.Series:
        out = []
        for payload in payloads:
            sel = _make_selector(payload, "json")
            if sel is None:
                out.append([])
                continue
            try:
                out.append([str(v) for v in sel.jmespath(query).getall()])
            except Exception:
                out.append([])
        return pd.Series(out)

    return _udf(column)


def extract_struct(
    column: Column | str,
    fields: dict[str, tuple],
    type: str | None = None,
) -> Column:
    """Run several pipelines against ONE parse of each document and return
    ``STRUCT<name: ARRAY<STRING>, ...>`` — the vectorized analog of
    chaining many queries off one ``Selector`` (parse amortization)."""
    for ops in fields.values():
        for kind, arg in ops:
            if kind == "css":
                compile_css(arg, type or "html")

    names = list(fields)
    schema = T.StructType(
        [T.StructField(n, T.ArrayType(T.StringType())) for n in names]
    )

    @pandas_udf(schema)
    def _udf(payloads: pd.Series) -> pd.DataFrame:
        rows: dict[str, list] = {n: [] for n in names}
        for payload in payloads:
            sel = _make_selector(payload, type)
            for name in names:
                if sel is None:
                    rows[name].append([])
                    continue
                try:
                    result = _run_pipeline(sel, fields[name])
                    if isinstance(result, list):
                        rows[name].append([str(v) for v in result])
                    else:
                        rows[name].append([str(v) for v in result.getall()])
                except Exception:
                    rows[name].append([])
        return pd.DataFrame(rows)

    return _udf(column)


def drop_matching(
    column: Column | str, query: str, type: str | None = None
) -> Column:
    """Document-rewrite UDF: ``html -> html'`` with all nodes matching the
    CSS ``query`` dropped (SelectorList.drop semantics — html drops keep
    tail text, reference parsel/selector.py:757-784).  DataFrames are
    immutable, so per-document mutation becomes a new column."""
    compile_css(query, type or "html")

    @pandas_udf(T.StringType())
    def _udf(payloads: pd.Series) -> pd.Series:
        out = []
        for payload in payloads:
            sel = _make_selector(payload, type)
            if sel is None:
                out.append(payload)
                continue
            try:
                sel.css(query).drop()
                out.append(sel.get())
            except Exception:
                out.append(payload)
        return pd.Series(out)

    return _udf(column)


def remove_namespaces_udf(column: Column | str) -> Column:
    """Document-rewrite UDF: strip namespaces from an XML payload so
    namespace-less XPaths work (reference parsel/selector.py:738-755)."""

    @pandas_udf(T.StringType())
    def _udf(payloads: pd.Series) -> pd.Series:
        out = []
        for payload in payloads:
            sel = _make_selector(payload, "xml")
            if sel is None:
                out.append(payload)
                continue
            try:
                sel.remove_namespaces()
                out.append(sel.get())
            except Exception:
                out.append(payload)
        return pd.Series(out)

    return _udf(column)


def extract_links(column: Column | str) -> Column:
    """Anchor hrefs (``a::attr(href)``) — the crawl engine's hot path."""
    return css_getall(column, "a::attr(href)")


def _rel_tokens(value: str) -> set[str]:
    """Lowercased token set of a ``rel`` / robots-directive attribute
    (HTML rel is space-separated; robots meta content is
    comma-separated — both tokenizations are accepted everywhere)."""
    return set(value.lower().replace(",", " ").split())


def extract_canonical_links(
    html_column: Column | str,
    base_url_column: Column | str,
    drop_css: str | None = None,
    respect_nofollow: bool = False,
) -> Column:
    """FUSED hot path: parse + [optional ``drop_css`` node removal] +
    ``a::attr(href)`` + resolve-against-base + RFC-3986 canonicalization
    in ONE pandas UDF pass, returning ``ARRAY<STRING>`` of canonical
    URLs.

    ``respect_nofollow=True`` applies the Robots Exclusion Protocol's
    page-level layer (the public robots-meta/rel-nofollow convention
    every polite crawler honors): a ``<meta name="robots">`` whose
    content contains the ``nofollow`` directive suppresses ALL links of
    that page, and any ``<a rel>`` containing the ``nofollow`` token
    (case-insensitive, multi-token rel supported) is skipped.  Off by
    default: the hot path stays the single compiled-CSS pass.

    Fusion matters at scale: the unfused plan round-trips every exploded
    href JVM→Python→JVM for the resolve UDF — at ~12 links/page that is
    an order of magnitude more Arrow traffic than the pages themselves.
    Here only the final canonical array crosses the boundary once, and
    the explained plan shows a single ArrowEvalPython node.
    """
    from .canonical import resolve_url

    compile_css("a::attr(href)", "html")
    if drop_css is not None:
        compile_css(drop_css, "html")

    @pandas_udf(T.ArrayType(T.StringType()))
    def _udf(payloads: pd.Series, bases: pd.Series) -> pd.Series:
        out = []
        for payload, base in zip(payloads, bases):
            sel = _make_selector(payload, None)
            if sel is None:
                out.append([])
                continue
            try:
                if drop_css is not None:
                    # drop, then round-trip through the serializer and
                    # re-parse (still ONE Python hop): keeps the driver
                    # query an E2E check of drop + serialization +
                    # reparse, not just in-tree mutation
                    sel.css(drop_css).drop()
                    sel = _make_selector(sel.get(), None)
                    if sel is None:
                        out.append([])
                        continue
                if respect_nofollow:
                    page_nofollow = False
                    for m in sel.xpath("//meta[@content]"):
                        name = (m.attrib.get("name") or "").strip().lower()
                        if name == "robots" and "nofollow" in _rel_tokens(
                            m.attrib.get("content") or ""
                        ):
                            page_nofollow = True
                            break
                    if page_nofollow:
                        out.append([])
                        continue
                    hrefs = [
                        a.attrib["href"]
                        for a in sel.xpath("//a[@href]")
                        if "nofollow"
                        not in _rel_tokens(a.attrib.get("rel") or "")
                    ]
                else:
                    hrefs = sel.css("a::attr(href)").getall()
                resolved = []
                for href in hrefs:
                    url = resolve_url(base, href)
                    if url is not None:
                        resolved.append(url)
                out.append(resolved)
            except Exception:
                out.append([])
        return pd.Series(out)

    return _udf(html_column, base_url_column)


def extract_images(column: Column | str) -> Column:
    """``img`` src + alt pairs as a struct of arrays (single parse)."""
    return extract_struct(
        column,
        {
            "src": (("css", "img::attr(src)"),),
            "alt": (("css", "img::attr(alt)"),),
        },
    )


def extract_sitemap(column: Column | str) -> Column:
    """Sitemap ingestion (public sitemaps.org protocol — the OTHER way
    crawlers discover URLs besides anchors): ``STRUCT(page_urls,
    sitemap_urls)`` from ONE XML parse per row — ``urlset/url/loc``
    page entries and ``sitemapindex/sitemap/loc`` nested-index entries.
    ``local-name()`` matching tolerates the 0.9 namespace being
    present, absent or re-prefixed (all three occur in the wild).
    Feed ``sitemap_urls`` back into the fetch frontier to walk nested
    indexes; ``page_urls`` go through canonicalization and the
    seen-set gate like any extracted link."""
    return extract_struct(
        column,
        {
            "page_urls": (
                (
                    "xpath",
                    "//*[local-name()='urlset']/*[local-name()='url']"
                    "/*[local-name()='loc']/text()",
                ),
            ),
            "sitemap_urls": (
                (
                    "xpath",
                    "//*[local-name()='sitemapindex']"
                    "/*[local-name()='sitemap']/*[local-name()='loc']/text()",
                ),
            ),
        },
        type="xml",
    )


def extract_anchors(column: Column | str) -> Column:
    """``ARRAY<STRUCT<href, text>>`` — every anchor's href PAIRED with
    its whitespace-normalized subtree text, in document order.  Anchor
    text is the classic link-graph signal (crawl prioritization,
    target-page description for training corpora) that the plain
    ``a::attr(href)`` hot path throws away; this keeps the same
    one-parse-per-row Arrow shape.  Anchors without an href keep a null
    href (callers filter); nested markup inside the anchor flattens to
    its text."""

    schema = T.ArrayType(
        T.StructType(
            [
                T.StructField("href", T.StringType()),
                T.StructField("text", T.StringType()),
            ]
        )
    )

    @pandas_udf(schema)
    def _udf(payloads: pd.Series) -> pd.Series:
        out = []
        for payload in payloads:
            sel = _make_selector(payload, None)
            if sel is None:
                out.append([])
                continue
            try:
                anchors = []
                for a in sel.css("a"):
                    href = a.attrib.get("href")
                    text = " ".join(
                        "".join(a.css("::text").getall()).split()
                    )
                    anchors.append((href, text))
                out.append(anchors)
            except Exception:
                out.append([])
        return pd.Series(out)

    return _udf(column)


def extract_rel_canonical(
    html_column: Column | str, base_url_column: Column | str
) -> Column:
    """``<link rel="canonical" href=...>`` target per page (the public
    rel-canonical convention, RFC 6596): the content-level URL identity
    signal crawlers use to collapse parameterized / mirrored captures
    of the same logical page.  FIRST such link wins (the convention on
    malformed multi-canonical pages); the href resolves against the
    page URL and runs RFC-3986 canonicalization — same fused
    one-Python-hop shape as the link extractor.  NULL when absent or
    unresolvable; multi-token ``rel`` values match per-token,
    case-insensitively (``rel="Canonical alternate"`` counts)."""
    from .canonical import resolve_url

    @pandas_udf(T.StringType())
    def _udf(payloads: pd.Series, bases: pd.Series) -> pd.Series:
        out = []
        for payload, base in zip(payloads, bases):
            sel = _make_selector(payload, None)
            target = None
            if sel is not None:
                try:
                    for link in sel.xpath("//link[@href]"):
                        if "canonical" in _rel_tokens(
                            link.attrib.get("rel") or ""
                        ):
                            target = resolve_url(
                                base, link.attrib["href"]
                            )
                            break
                except Exception:
                    target = None
            out.append(target)
        return pd.Series(out, dtype=object)

    return _udf(html_column, base_url_column)


def extract_sitemap_entries(column: Column | str) -> Column:
    """Full sitemaps.org ``<url>`` entries — ``ARRAY<STRUCT<loc,
    lastmod, changefreq, priority>>`` per sitemap document, document
    order, one XXE-safe XML parse per row (same namespace tolerance as
    :func:`extract_sitemap`).  ``lastmod`` is the protocol's change
    signal: parse it to epoch seconds and feed
    ``frontier.recrawl_due``'s ``last_change_ts`` so changed pages jump
    the backoff queue; ``changefreq``/``priority`` are advisory
    ordering hints.  Missing children yield NULL fields; entries
    without a ``<loc>`` are skipped (spec-invalid)."""

    schema = T.ArrayType(
        T.StructType(
            [
                T.StructField("loc", T.StringType()),
                T.StructField("lastmod", T.StringType()),
                T.StructField("changefreq", T.StringType()),
                T.StructField("priority", T.DoubleType()),
            ]
        )
    )

    @pandas_udf(schema)
    def _udf(payloads: pd.Series) -> pd.Series:
        out = []
        for payload in payloads:
            sel = _make_selector(payload, "xml")
            entries = []
            if sel is not None:
                try:
                    for node in sel.xpath(
                        "//*[local-name()='urlset']/*[local-name()='url']"
                    ):
                        def child(name: str):
                            vals = node.xpath(
                                f"./*[local-name()='{name}']/text()"
                            ).getall()
                            return vals[0].strip() if vals else None

                        loc = child("loc")
                        if not loc:
                            continue
                        prio = child("priority")
                        try:
                            prio_f = (
                                float(prio) if prio is not None else None
                            )
                        except ValueError:
                            prio_f = None
                        entries.append(
                            {
                                "loc": loc,
                                "lastmod": child("lastmod"),
                                "changefreq": child("changefreq"),
                                "priority": prio_f,
                            }
                        )
                except Exception:
                    entries = []
            out.append(entries)
        return pd.Series(out, dtype=object)

    return _udf(column)


def extract_image_pairs(
    html_column: Column | str, base_url_column: Column | str
) -> Column:
    """Image–caption candidate pair MINING from page markup — the step
    that turns a crawled page into input_hint-shaped training rows
    (the public LAION recipe: Open Graph metadata and ``alt`` text are
    the caption sources):

    * ``og:image`` + (``og:title`` else ``og:description``) → one pair
      with ``source='og'`` (the page's declared representative image);
    * every ``<img src alt>`` with non-empty trimmed ``alt`` → a pair
      with ``source='alt'``.

    Image URLs resolve against the page URL and run RFC-3986
    canonicalization; captions are whitespace-trimmed.  Returns
    ``ARRAY<STRUCT<image_url, caption, source>>`` in document order
    (og first) — same fused one-Python-hop shape as the link
    extractor; explode + join against the fetch layer downstream."""
    from .canonical import resolve_url

    schema = T.ArrayType(
        T.StructType(
            [
                T.StructField("image_url", T.StringType()),
                T.StructField("caption", T.StringType()),
                T.StructField("source", T.StringType()),
            ]
        )
    )

    @pandas_udf(schema)
    def _udf(payloads: pd.Series, bases: pd.Series) -> pd.Series:
        out = []
        for payload, base in zip(payloads, bases):
            sel = _make_selector(payload, None)
            pairs: list[dict] = []
            if sel is not None:
                try:
                    metas: dict[str, str] = {}
                    for m in sel.xpath("//meta[@property and @content]"):
                        prop = (m.attrib.get("property") or "").strip().lower()
                        if prop in ("og:image", "og:title", "og:description"):
                            metas.setdefault(prop, m.attrib["content"])
                    og_img = metas.get("og:image")
                    if og_img:
                        caption = (
                            metas.get("og:title")
                            or metas.get("og:description")
                            or ""
                        ).strip()
                        url = resolve_url(base, og_img)
                        if url is not None and caption:
                            pairs.append(
                                {
                                    "image_url": url,
                                    "caption": caption,
                                    "source": "og",
                                }
                            )
                    for img in sel.xpath("//img[@src and @alt]"):
                        alt = (img.attrib.get("alt") or "").strip()
                        if not alt:
                            continue
                        url = resolve_url(base, img.attrib["src"])
                        if url is not None:
                            pairs.append(
                                {
                                    "image_url": url,
                                    "caption": alt,
                                    "source": "alt",
                                }
                            )
                except Exception:
                    pairs = []
            out.append(pairs)
        return pd.Series(out, dtype=object)

    return _udf(html_column, base_url_column)
