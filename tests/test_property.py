"""Property-based robustness tests (hypothesis): the recovering parsers
must never raise on arbitrary input, serialization must round-trip
through a reparse stably, and URL canonicalization is idempotent."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from parsel_spark import Selector
from parsel_spark.functions.canonical import canonicalize_url
from parsel_spark.functions.hashing import murmur3_32, xxhash64

html_ish = st.text(
    alphabet=st.sampled_from(list("<>/=\"' abcdefgABC&;#!-?[]{}()\n\t\x00é😀")),
    max_size=300,
)


@settings(max_examples=300, deadline=None)
@given(html_ish)
def test_html_parser_never_raises(text: str) -> None:
    sel = Selector(text=text)
    if sel.type == "json":  # JSON-sniffed input: xpath correctly refuses
        return
    sel.xpath("//text()").getall()
    sel.css("a::attr(href)").getall()
    assert isinstance(sel.get(), str)


@settings(max_examples=300, deadline=None)
@given(html_ish)
def test_xml_parser_never_raises(text: str) -> None:
    sel = Selector(text=text or "<r/>", type="xml")
    # reference parity: JSON-sniffable text becomes a json selector even
    # with an explicit type="xml" (parsel/selector.py:331-347 sniffs
    # BEFORE the html/xml dispatch), and json selectors reject xpath
    # (parsel/selector.py:585-586) — e.g. text='""'
    if sel.type == "json":
        with pytest.raises(ValueError, match="Cannot use xpath"):
            sel.xpath("//*")
        return
    sel.xpath("//*").getall()
    sel.get()


@settings(max_examples=200, deadline=None)
@given(html_ish)
def test_serialize_reparse_fixpoint(text: str) -> None:
    """parse → serialize → parse → serialize must be a fixpoint (the
    serializer emits markup our parser maps to the same tree)."""
    sel = Selector(text=text)
    if sel.type != "html":
        return
    once = sel.get()
    twice = Selector(text=once).get() if once.strip() else once
    assert twice == once


url_ish = st.text(
    alphabet=st.sampled_from(list("abcXYZ09:/?#[]@!$&'()*+,;=%.-_~ é")),
    max_size=100,
)


@settings(max_examples=300, deadline=None)
@given(url_ish)
def test_canonicalize_idempotent(url: str) -> None:
    once = canonicalize_url("http://example.com/" + url)
    assert once is not None
    assert canonicalize_url(once) == once


@settings(max_examples=400, deadline=None)
@given(url_ish)
def test_canonicalize_fastpath_equals_slowpath(url: str) -> None:
    """The already-canonical fast path must agree with the full RFC-3986
    slow path byte-for-byte."""
    import re as _re

    from parsel_spark.functions import canonical as C

    full = "http://example.com/" + url
    fast_result = C.canonicalize_url(full)
    never = _re.compile(r"(?!x)x")  # matches nothing → force slow path
    original = C._FAST_RE
    C._FAST_RE = never
    try:
        slow_result = C.canonicalize_url(full)
    finally:
        C._FAST_RE = original
    assert fast_result == slow_result


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=200))
def test_hashes_stable(data: bytes) -> None:
    assert xxhash64(data) == xxhash64(data)
    assert murmur3_32(data) == murmur3_32(data)
    assert -(1 << 63) <= xxhash64(data) < (1 << 63)
    assert -(1 << 31) <= murmur3_32(data) < (1 << 31)


class TestSamplingProperties:
    def test_unit_hash_range_and_determinism(self) -> None:
        """Pure-python replay of the unit hash: in [0, 1), deterministic,
        and equal to the Spark/DuckDB expression's arithmetic."""
        import hashlib

        from hypothesis import given, settings
        from hypothesis import strategies as st

        @settings(max_examples=200, deadline=None)
        @given(st.integers(min_value=0, max_value=2**62), st.integers(0, 99))
        def check(key: int, seed: int) -> None:
            h = int(hashlib.md5(f"{key}#{seed}".encode()).hexdigest()[:15], 16)
            u = float(h) / float(1 << 60)
            assert 0.0 <= u < 1.0
            h2 = int(hashlib.md5(f"{key}#{seed}".encode()).hexdigest()[:15], 16)
            assert h == h2

        check()

    def test_redact_idempotent_property(self, spark) -> None:
        """Redaction placeholders contain nothing redactable, so
        redact(redact(x)) == redact(x) for arbitrary text."""
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from parsel_spark.functions.textstats import redact_pii
        from pyspark.sql import functions as F

        texts = st.lists(
            st.text(
                alphabet=st.characters(
                    blacklist_categories=("Cs",), max_codepoint=0x2FF
                ),
                max_size=80,
            ),
            min_size=1,
            max_size=8,
        )

        @settings(max_examples=10, deadline=None)
        @given(texts)
        def check(batch: list[str]) -> None:
            df = spark.createDataFrame(
                [(i, t) for i, t in enumerate(batch)], "doc_id long, text string"
            )
            once = df.select(
                "doc_id", redact_pii("text").alias("r1")
            )
            twice = once.select(
                "doc_id", F.col("r1"), redact_pii(F.col("r1")).alias("r2")
            )
            for row in twice.collect():
                assert row["r1"] == row["r2"]

        check()

    def test_packing_invariants(self, spark) -> None:
        """offset < budget always; within a shard, (seq_id, offset) is
        strictly increasing in doc order; token totals are conserved."""
        from parsel_spark.operators.packing import pack_sequences

        rows = [(i, "t " * (1 + (i * 7) % 23)) for i in range(400)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = pack_sequences(df, token_budget=50, n_shards=8).collect()
        assert all(0 <= r["offset"] < 50 for r in out)
        by_shard: dict[int, list] = {}
        for r in sorted(out, key=lambda r: (r["shard"], r["doc_id"])):
            by_shard.setdefault(r["shard"], []).append(r)
        for shard_rows in by_shard.values():
            keys = [(r["seq_id"], r["offset"]) for r in shard_rows]
            assert keys == sorted(keys)
            # conservation: global position = seq_id*budget + offset is
            # exactly the running token total
            run = 0
            for r in shard_rows:
                assert r["seq_id"] * 50 + r["offset"] == run
                run += r["n_tokens"]


# -- robots pattern twins: python regex matcher vs the LIKE translation --

_robots_chars = st.text(
    alphabet="ab/*.$?%_\\", min_size=0, max_size=12
)


@settings(max_examples=300, deadline=None)
@given(pattern=_robots_chars, path=_robots_chars)
def test_robots_pattern_python_equals_like_translation(pattern, path):
    """The RFC 9309 matcher's two implementations — the python regex
    twin (udf/cogroup/oracle modes) and the LIKE translation (the
    relational mode, evaluated here by DuckDB exactly as Spark's
    `F.like` does) — must agree on EVERY (pattern, path), including
    LIKE metacharacters (%/_), backslashes, mid-pattern '$' and
    adjacent wildcards."""
    import duckdb

    from parsel_spark.functions.robots import robots_pattern_matches

    anchored = pattern.endswith("$")
    core = pattern[:-1] if anchored else pattern
    esc = (
        core.replace("\\", "\\\\")
        .replace("%", "\\%")
        .replace("_", "\\_")
        .replace("*", "%")
    )
    like_pat = esc if anchored else esc + "%"
    (got,) = duckdb.sql(
        "SELECT ? LIKE ? ESCAPE '\\'", params=[path, like_pat]
    ).fetchone()
    assert got is robots_pattern_matches(pattern, path), (pattern, path)
