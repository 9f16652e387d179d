"""Distributed equivalence (SURVEY.md §5.2): parity-suite fixtures also
run as DataFrame jobs and must match the local oracle row-for-row."""

from __future__ import annotations

import pytest

from parsel_spark import Selector
from parsel_spark.functions.udfs import css_getall, re_extract, xpath_getall

FIXTURES: list[tuple[str, str, str]] = [
    # (kind, query, document) — documents from the reference test corpus
    ("xpath", "//input[@name='a']/@name",
     "<p><input name='a'value='1'/><input name='b'value='2'/></p>"),
    ("xpath", "concat(//input[@name='a']/@value, //input[@name='b']/@value)",
     "<p><input name='a'value='1'/><input name='b'value='2'/></p>"),
    ("xpath", "//ul/li[position()>1]/text()",
     '<ul><li id="1">1</li><li id="2">2</li><li id="3">3</li></ul>'),
    ("xpath", "//text()", '<div>fff: <a href="#">zzz</a></div>'),
    ("xpath", '//p[has-class("foo")]/text()',
     '<p class="foo bar-baz">First</p><p class="foo">Second</p><p class="bar">Third</p>'),
    ("xpath", r'//a[re:test(@href, "\.html$")]/text()',
     '<div><a href="/first.html">first link</a><a href="/x.xml">x</a></div>'),
    ("css", "#p-b2::text", '<p><b id="p-b">hi</b><b id="p-b2">guy</b></p>'),
    ("css", "p ::text", '<p>lorem <b>hi</b> <em>there</em></p>'),
    ("css", "a::attr(href)", '<a href="u1">1</a><div><a href="u2">2</a></div>'),
    ("css", "div > b", "<div><a>a<br>b</a>c</div><div><a>d</a>e<b>f</b></div>"),
    ("css", "area:last-child",
     '<map><area shape="circle" id="a1"><area shape="default" id="a2"></map>'),
    ("re", r"Name: (\w+)", "<ul><li>Name: John</li><li>Age: 10</li><li>Name: Paul</li></ul>"),
    ("re", '{"foo":(.*)}', '<script>{"foo":"bar &amp; &quot;baz&quot;"}</script>'),
]


def test_udfs_equal_local_oracle(spark) -> None:
    rows = [(i, kind, query, doc) for i, (kind, query, doc) in enumerate(FIXTURES)]
    df = spark.createDataFrame(rows, "case_id int, kind string, query string, doc string")

    for case_id, kind, query, doc in rows:
        sel = Selector(text=doc)
        case_df = df.filter(f"case_id = {case_id}")
        if kind == "xpath":
            expected = sel.xpath(query).getall()
            got = case_df.select(xpath_getall("doc", query).alias("out")).first()["out"]
        elif kind == "css":
            expected = sel.css(query).getall()
            got = case_df.select(css_getall("doc", query).alias("out")).first()["out"]
        else:
            expected = sel.re(query)
            got = case_df.select(re_extract("doc", query).alias("out")).first()["out"]
        assert list(got) == expected, (kind, query)
