"""Spark-layer function tests: vectorized selector UDFs vs the local
oracle (row-for-row), hash parity with the JVM, canonicalization, and
image payload invariants (PSNR / caption equality)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from parsel_spark import Selector
from parsel_spark.functions.canonical import canonicalize_udf, canonicalize_url
from parsel_spark.functions.hashing import murmur3_32, xxhash64
from parsel_spark.functions.udfs import (
    attrib_map,
    css_getall,
    extract_struct,
    jmespath_getall,
    re_extract,
    xpath_getall,
)
from parsel_spark.sources.images import decode_image, psnr
from parsel_spark.sources.synth import SynthConfig, image_pixels, synth_pages

CFG = SynthConfig(n_pages=60, n_hosts=6, out_degree=4, seed=7, with_images=True)


@pytest.fixture(scope="module")
def pages(spark):
    df = synth_pages(spark, CFG).cache()
    df.count()
    return df


def test_css_udf_matches_local_oracle(spark, pages) -> None:
    rows = pages.select(
        "html", css_getall("html", "a::attr(href)").alias("hrefs")
    ).collect()
    assert len(rows) == CFG.n_pages
    for row in rows:
        expected = Selector(text=row["html"]).css("a::attr(href)").getall()
        assert list(row["hrefs"]) == expected


def test_xpath_udf_matches_local_oracle(spark, pages) -> None:
    query = "//p[@class='caption']/text()"
    rows = pages.select("html", xpath_getall("html", query).alias("out")).collect()
    for row in rows:
        assert list(row["out"]) == Selector(text=row["html"]).xpath(query).getall()


def test_re_and_attrib_and_jmespath_udfs(spark, pages) -> None:
    rows = pages.select(
        "html",
        re_extract("html", r'alt="([^"]+)"').alias("alts"),
        attrib_map("html", "img").alias("img_attrs"),
        css_getall("html", "script::text").alias("json_payload"),
    ).collect()
    for row in rows:
        sel = Selector(text=row["html"])
        assert list(row["alts"]) == sel.re(r'alt="([^"]+)"')
        assert dict(row["img_attrs"]) == dict(sel.css("img").attrib)

    json_df = pages.select(
        F.element_at(css_getall("html", "script::text"), 1).alias("payload")
    )
    out = json_df.select(
        jmespath_getall("payload", "image_id").alias("ids")
    ).collect()
    assert all(r["ids"] and r["ids"][0].startswith("img-") for r in out)


def test_extract_struct_single_parse(spark, pages) -> None:
    result = pages.select(
        "html",
        extract_struct(
            "html",
            {
                "links": (("css", "a::attr(href)"),),
                "caption": (("css", "p.caption::text"),),
            },
        ).alias("ex"),
    ).collect()
    for row in result:
        sel = Selector(text=row["html"])
        assert list(row["ex"]["links"]) == sel.css("a::attr(href)").getall()
        assert list(row["ex"]["caption"]) == sel.css("p.caption::text").getall()


def test_hash_parity_with_jvm(spark) -> None:
    samples = ["", "a", "ab", "abc", "abcd", "http://example.com/x?a=1",
               "héllo wörld ünïcode", "x" * 100, "y" * 37]
    df = spark.createDataFrame([(s,) for s in samples], ["s"])
    rows = df.select("s", F.hash("s").alias("mm"), F.xxhash64("s").alias("xx")).collect()
    for row in rows:
        assert murmur3_32(row["s"]) == row["mm"]
        assert xxhash64(row["s"]) == row["xx"]


@pytest.mark.parametrize(
    ("raw", "canonical"),
    [
        ("HTTP://Example.COM:80/a/b/../c?b=2&a=1#frag", "http://example.com/a/c?a=1&b=2"),
        ("http://example.com", "http://example.com/"),
        ("http://example.com/p%61th", "http://example.com/path"),
        ("https://example.com:443/", "https://example.com/"),
        ("http://example.com/a/./b//c", "http://example.com/a/b//c"),
        ("http://example.com/%7Euser", "http://example.com/~user"),
        # RFC 3986 §6.2.2.2: only UNRESERVED escapes decode — %2F must
        # never become a literal path '/' (distinct URLs would conflate)
        ("http://example.com/a%2Fb", "http://example.com/a%2Fb"),
        ("http://example.com/a%2fb", "http://example.com/a%2Fb"),
        # %2E-encoded dots must not become path STRUCTURE: this URL is
        # NOT the same resource as http://example.com/secret
        ("http://example.com/a/%2e%2e/secret", "http://example.com/a/%2E%2E/secret"),
        ("http://example.com/a/%2e/b", "http://example.com/a/%2E/b"),
        ("http://example.com/a/.%2e/b", "http://example.com/a/.%2E/b"),
        # ...but a dot INSIDE a segment is plain unreserved data
        ("http://example.com/file%2etxt", "http://example.com/file.txt"),
        ("http://example.com/?a=%2F&b=%61", "http://example.com/?a=%2F&b=a"),
    ],
)
def test_canonicalize_scalar(raw: str, canonical: str) -> None:
    assert canonicalize_url(raw) == canonical
    # idempotent
    assert canonicalize_url(canonical) == canonical


def test_canonicalize_udf_matches_scalar(spark) -> None:
    urls = [
        "HTTP://HOST-001.TEST/page/5",
        "http://host-001.test:80/page/5",
        "http://host-001.test/page/x/../5",
        "http://host-001.test/p%61ge/5#z",
        None,
    ]
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    rows = df.select("url", canonicalize_udf("url").alias("c")).collect()
    for row in rows:
        assert row["c"] == canonicalize_url(row["url"])


def test_image_payload_invariants(spark, pages) -> None:
    """Input-hint invariant: decoded pixels PSNR ≥ 40 dB vs ground truth
    (lossless formats exact), captions byte-equal after extraction."""
    rows = pages.select(
        "image_id", "bytes", "w", "h", "fmt", "caption", "html",
        F.element_at(css_getall("html", "img::attr(alt)"), 1).alias("alt"),
    ).collect()
    for row in rows:
        i = int(row["image_id"].split("-")[1])
        truth = image_pixels(i, row["w"], row["h"], CFG)
        decoded = decode_image(bytes(row["bytes"]), row["fmt"])
        assert decoded.shape == truth.shape
        value = psnr(truth, decoded)
        if row["fmt"] in ("png", "bmp"):
            assert np.isinf(value)  # lossless: exact
        else:
            assert value >= 40.0
        assert row["alt"] == row["caption"]  # caption byte-equality


def test_fused_extract_drop_css_single_python_hop(spark, pages) -> None:
    """extract_canonical_links(drop_css=...) must (a) equal the unfused
    drop → serialize → reparse → select → canonicalize pipeline
    row-for-row and (b) compile to ONE ArrowEvalPython node (the fusion
    is the point: one JVM→Python round-trip per page, not three)."""
    from parsel_spark.functions.canonical import resolve_url
    from parsel_spark.functions.udfs import extract_canonical_links

    fused = pages.select(
        "url",
        extract_canonical_links("html", "url", drop_css="a:first-child").alias(
            "links"
        ),
    )
    plan = fused._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ArrowEvalPython") == 1

    got = {r["url"]: list(r["links"]) for r in fused.collect()}
    for row in pages.select("url", "html").collect():
        sel = Selector(text=row["html"])
        sel.css("a:first-child").drop()
        reparsed = Selector(text=sel.get())
        expected = [
            u
            for u in (
                resolve_url(row["url"], h)
                for h in reparsed.css("a::attr(href)").getall()
            )
            if u is not None
        ]
        assert got[row["url"]] == expected
