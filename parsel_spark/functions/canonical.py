"""RFC-3986 URL canonicalization (driver north rule: the URL-seen set is
keyed on canonicalized + hashed URLs).

Normalizations applied (RFC 3986 §6.2.2 syntax-based + the crawl
conventions documented in FIXTURES.md §1 "canonicalization traps"):

* scheme and host lowercased; default ports (http:80, https:443) dropped;
* fragment removed;
* path dot-segments removed (§5.2.4); empty path → "/";
* percent-encoding normalized: unreserved chars decoded, other escapes
  uppercased; spaces in query become ``+``-free ``%20`` form;
* query parameters stably sorted by (key, value) and re-encoded.

The scalar function is pure Python (shared with the single-process
oracle crawler); Spark exposure is an Arrow-batched pandas UDF.
"""

from __future__ import annotations

import re
from urllib.parse import quote, unquote, urljoin, urlsplit

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

_DEFAULT_PORTS = {"http": "80", "https": "443", "ftp": "21"}

_SAFE_PATH = "/!$&'()*+,;=:@~-._"
_SAFE_QUERY = "!$&'()*+,;=:@/?~-._"

# fast-path recognizer: URLs that are ALREADY canonical under every rule
# below (lowercase scheme+host, no port/userinfo/query/fragment/escapes,
# no dot-segments or empty segments, only chars quote() leaves alone).
# The slow path is the source of truth; test_canonical_fastpath pins
# fast(url) == slow(url) over trap corpora.
_FAST_RE = re.compile(
    r"^(https?)://"
    r"[a-z0-9]([a-z0-9.-]*[a-z0-9])?"
    r"(/(?:[a-zA-Z0-9!$&'()*+,;=:@~\-._]+/)*[a-zA-Z0-9!$&'()*+,;=:@~\-._]*)?$"
)
_DOT_SEGMENT_RE = re.compile(r"/\.\.?(?:/|$)")


def _normalize_percent(component: str, safe: str) -> str:
    # decode then re-encode: unreserved chars come out bare, everything
    # else re-encodes uppercase
    return quote(unquote(component), safe=safe)


def _remove_dot_segments(path: str) -> str:
    output: list[str] = []
    for segment in path.split("/"):
        if segment == ".":
            continue
        if segment == "..":
            if output and output[-1] != "":
                output.pop()
                if not output:
                    output = [""]
        else:
            output.append(segment)
    normalized = "/".join(output)
    if path.startswith("/") and not normalized.startswith("/"):
        normalized = "/" + normalized
    if path.endswith(("/.", "/..")) and not normalized.endswith("/"):
        normalized += "/"
    return normalized


def canonicalize_url(url: str | None) -> str | None:
    """Return the canonical form of ``url`` (None-safe)."""
    if url is None:
        return None
    url = url.strip()
    if not url:
        return url
    # fast path: already-canonical URLs pass through untouched — at crawl
    # steady state most URLs were canonicalized when first discovered
    match = _FAST_RE.match(url)
    if match is not None:
        path = match.group(3)
        if path is None:
            return url + "/"
        if not _DOT_SEGMENT_RE.search(path):
            return url
    try:
        parts = urlsplit(url)
    except ValueError:
        return url
    scheme = parts.scheme.lower()
    host = (parts.hostname or "").lower()
    # IDN hosts: keep as-is (synthetic corpus is ASCII); strip trailing dot
    host = host.rstrip(".")
    port = parts.port
    netloc = host
    if port is not None and str(port) != _DEFAULT_PORTS.get(scheme):
        netloc = f"{host}:{port}"
    if parts.username:
        auth = parts.username
        if parts.password:
            auth += f":{parts.password}"
        netloc = f"{auth}@{netloc}"

    path = _normalize_percent(parts.path, _SAFE_PATH)
    path = _remove_dot_segments(path)
    if not path:
        path = "/"

    query = ""
    if parts.query:
        pairs = []
        for chunk in parts.query.split("&"):
            if not chunk:
                continue
            key, _, value = chunk.partition("=")
            pairs.append(
                (
                    _normalize_percent(key, _SAFE_QUERY.replace("&", "").replace("=", "")),
                    _normalize_percent(value, _SAFE_QUERY.replace("&", "").replace("=", "")),
                )
            )
        pairs.sort()
        # always emit k=v (bare "?flag" normalizes to "flag=") — the
        # uniform form is what makes canonicalization idempotent
        query = "&".join(f"{k}={v}" for k, v in pairs)

    out = f"{scheme}://{netloc}{path}" if scheme else f"{netloc}{path}"
    if query:
        out += f"?{query}"
    return out


def resolve_url(base: str | None, href: str | None) -> str | None:
    """Resolve ``href`` against ``base`` and canonicalize (link-extraction
    helper; mirrors what a crawler does with ``<a href>`` values)."""
    if href is None:
        return None
    if base:
        # fast paths for the two dominant shapes; urljoin is ~15µs
        if href.startswith(("http://", "https://", "HTTP://", "HTTPS://")):
            pass  # already absolute
        elif (
            href.startswith("/")
            and not href.startswith("//")
            and base.startswith(("http://", "https://"))
        ):
            scheme_end = base.index("://") + 3
            host_end = base.find("/", scheme_end)
            prefix = base if host_end < 0 else base[:host_end]
            href = prefix + href
        else:
            try:
                href = urljoin(base, href)
            except ValueError:
                return None
    return canonicalize_url(href)


def canonicalize_udf(column: Column | str) -> Column:
    @pandas_udf(T.StringType())
    def _udf(urls: pd.Series) -> pd.Series:
        return urls.map(canonicalize_url)

    return _udf(column)


def resolve_udf(base_column: Column | str, href_column: Column | str) -> Column:
    @pandas_udf(T.StringType())
    def _udf(bases: pd.Series, hrefs: pd.Series) -> pd.Series:
        return pd.Series(
            [resolve_url(b, h) for b, h in zip(bases, hrefs)]
        )

    return _udf(base_column, href_column)
