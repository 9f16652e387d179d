"""CSS → XPath translation parity.

Golden translation pairs and error cases derive from
/root/reference/tests/test_selector_csstranslator.py:64-153; functional
queries from :172-215 over the same fixture page.
"""

from __future__ import annotations

from typing import Any

import pytest

from parsel_spark import Selector, css2xpath
from parsel_spark.selector import ExpressionError, SelectorSyntaxError
from parsel_spark.selector.css import GenericTranslator, HTMLTranslator

HTMLBODY = """
<html>
<body>
<div>
 <a id="name-anchor" name="foo"></a>
 <a id="tag-anchor" rel="tag" href="http://localhost/foo">link</a>
 <a id="nofollow-anchor" rel="nofollow" href="https://example.org"> link</a>
 <p id="paragraph">
   lorem ipsum text
   <b id="p-b">hi</b> <em id="p-em">there</em>
   <b id="p-b2">guy</b>
   <input type="checkbox" id="checkbox-unchecked" />
   <input type="checkbox" id="checkbox-disabled" disabled="" />
   <input type="text" id="text-checked" checked="checked" />
   <input type="hidden" />
   <input type="hidden" disabled="disabled" />
   <input type="checkbox" id="checkbox-checked" checked="checked" />
   <input type="checkbox" id="checkbox-disabled-checked"
          disabled="disabled" checked="checked" />
   <fieldset id="fieldset" disabled="disabled">
     <input type="checkbox" id="checkbox-fieldset-disabled" />
     <input type="hidden" />
   </fieldset>
 </p>
 <map name="dummymap">
   <area shape="circle" coords="200,250,25" href="foo.html" id="area-href" />
   <area shape="default" id="area-nohref" />
 </map>
</div>
<div class="cool-footer" id="foobar-div" foobar="ab bc cde">
    <span id="foobar-span">foo ter</span>
</div>
</body></html>
"""


@pytest.fixture(params=[HTMLTranslator, GenericTranslator], ids=["html", "generic"])
def translator(request):
    return request.param()


GOLDEN_PAIRS = [
    # ref tests/test_selector_csstranslator.py:64-77
    ("::attr(name)", "descendant-or-self::*/@name"),
    ("a::attr(href)", "descendant-or-self::a/@href"),
    ("a ::attr(img)", "descendant-or-self::a/descendant-or-self::*/@img"),
    ("a > ::attr(class)", "descendant-or-self::a/*/@class"),
    # ref tests/test_selector_csstranslator.py:91-117
    ("::text", "descendant-or-self::text()"),
    ("p::text", "descendant-or-self::p/text()"),
    ("p ::text", "descendant-or-self::p/descendant-or-self::text()"),
    ("#id::text", "descendant-or-self::*[@id = 'id']/text()"),
    ("p#id::text", "descendant-or-self::p[@id = 'id']/text()"),
    (
        "p#id ::text",
        "descendant-or-self::p[@id = 'id']/descendant-or-self::text()",
    ),
    ("p#id > ::text", "descendant-or-self::p[@id = 'id']/*/text()"),
    (
        "p#id ~ ::text",
        "descendant-or-self::p[@id = 'id']/following-sibling::*/text()",
    ),
    ("a[href]::text", "descendant-or-self::a[@href]/text()"),
    (
        "a[href] ::text",
        "descendant-or-self::a[@href]/descendant-or-self::text()",
    ),
    (
        "p::text, a::text",
        "descendant-or-self::p/text() | descendant-or-self::a/text()",
    ),
]


@pytest.mark.parametrize(("css", "xpath"), GOLDEN_PAIRS)
def test_translation_goldens(translator, css: str, xpath: str) -> None:
    assert translator.css_to_xpath(css) == xpath, css


ERROR_CASES = [
    # ref tests/test_selector_csstranslator.py:79-153
    ("::attr(12)", ExpressionError),
    ("::attr(34test)", ExpressionError),
    ("::attr(@href)", SelectorSyntaxError),
    ("::attribute(12)", ExpressionError),
    ("::text()", ExpressionError),
    ("::text-node", ExpressionError),
    (":text", ExpressionError),
    (":attribute(name)", ExpressionError),
]


@pytest.mark.parametrize(("css", "exc"), ERROR_CASES)
def test_translation_errors(translator, css: str, exc: type[Exception]) -> None:
    with pytest.raises(exc):
        translator.css_to_xpath(css)


def test_css2xpath_module_helper() -> None:
    # ref tests/test_selector_csstranslator.py:164-169
    expected_xpath = (
        "descendant-or-self::*[@class and contains("
        "concat(' ', normalize-space(@class), ' '), ' some-class ')]"
    )
    assert css2xpath(".some-class") == expected_xpath


@pytest.fixture(
    params=[
        lambda: Selector(text=HTMLBODY),
        lambda: Selector(body=bytes(HTMLBODY, encoding="utf-8")),
    ],
    ids=["text", "bytes"],
)
def page(request):
    return request.param()


class TestCSSFunctional:
    # ref tests/test_selector_csstranslator.py:172-215

    def x(self, page, *a: Any, **kw: Any) -> list[str]:
        return [v.strip() for v in page.css(*a, **kw).extract() if v.strip()]

    def test_selector_simple(self, page) -> None:
        for x in page.css("input"):
            assert isinstance(x, type(page)), x
        assert page.css("input").extract() == [x.extract() for x in page.css("input")]

    def test_text_pseudo_element(self, page) -> None:
        assert self.x(page, "#p-b2") == ['<b id="p-b2">guy</b>']
        assert self.x(page, "#p-b2::text") == ["guy"]
        assert self.x(page, "#p-b2 ::text") == ["guy"]
        assert self.x(page, "#paragraph::text") == ["lorem ipsum text"]
        assert self.x(page, "#paragraph ::text") == [
            "lorem ipsum text",
            "hi",
            "there",
            "guy",
        ]
        assert self.x(page, "p::text") == ["lorem ipsum text"]
        assert self.x(page, "p ::text") == ["lorem ipsum text", "hi", "there", "guy"]

    def test_attribute_function(self, page) -> None:
        assert self.x(page, "#p-b2::attr(id)") == ["p-b2"]
        assert self.x(page, ".cool-footer::attr(class)") == ["cool-footer"]
        assert self.x(page, ".cool-footer ::attr(id)") == ["foobar-div", "foobar-span"]
        assert self.x(page, 'map[name="dummymap"] ::attr(shape)') == [
            "circle",
            "default",
        ]

    def test_nested_selector(self, page) -> None:
        assert page.css("p").css("b::text").extract() == ["hi", "guy"]
        assert page.css("div").css("area:last-child").extract() == [
            '<area shape="default" id="area-nohref">'
        ]

    def test_pseudoclass_has(self, page) -> None:
        assert self.x(page, "p:has(b)::text") == ["lorem ipsum text"]


NTH_GOLDENS = [
    ("p:nth-child(3)", "descendant-or-self::p[count(preceding-sibling::*) = 2]"),
    ("p:nth-child(odd)", "descendant-or-self::p[count(preceding-sibling::*) mod 2 = 0]"),
    (
        "p:nth-child(even)",
        "descendant-or-self::p[(count(preceding-sibling::*) + 1) mod 2 = 0]",
    ),
    (
        "p:nth-child(2n+1)",
        "descendant-or-self::p[count(preceding-sibling::*) mod 2 = 0]",
    ),
    (
        "p:nth-child(2n+3)",
        "descendant-or-self::p[count(preceding-sibling::*) >= 2 "
        "and count(preceding-sibling::*) mod 2 = 0]",
    ),
    (
        "p:nth-child(-n+3)",
        "descendant-or-self::p[count(preceding-sibling::*) <= 2]",
    ),
    ("p:nth-child(n)", "descendant-or-self::p[true()]"),
    ("p:nth-child(-2n)", "descendant-or-self::p[1 = 0]"),
    (
        "p:nth-last-child(2)",
        "descendant-or-self::p[count(following-sibling::*) = 1]",
    ),
    (
        "p:nth-of-type(2)",
        "descendant-or-self::p[count(preceding-sibling::p) = 1]",
    ),
    (
        "p:nth-of-type(2n)",
        "descendant-or-self::p[(count(preceding-sibling::p) + 1) mod 2 = 0]",
    ),
    (
        "p:nth-last-of-type(1)",
        "descendant-or-self::p[count(following-sibling::p) = 0]",
    ),
    (
        "p:first-of-type",
        "descendant-or-self::p[count(preceding-sibling::p) = 0]",
    ),
    (
        "p:last-of-type",
        "descendant-or-self::p[count(following-sibling::p) = 0]",
    ),
    (
        "p:only-of-type",
        "descendant-or-self::p[count(preceding-sibling::p) = 0 "
        "and count(following-sibling::p) = 0]",
    ),
]


@pytest.mark.parametrize(("css", "xpath"), NTH_GOLDENS)
def test_nth_family_goldens(translator, css: str, xpath: str) -> None:
    assert translator.css_to_xpath(css) == xpath, css


@pytest.mark.parametrize(
    "css",
    [
        "*:nth-of-type(2)",        # of-type needs an element name
        ":first-of-type",
        "p:nth-child(2.5)",
        "p:nth-child(2n+)",
        "p:nth-child(foo)",
    ],
)
def test_nth_family_errors(translator, css: str) -> None:
    with pytest.raises(ExpressionError):
        translator.css_to_xpath(css)


NTH_DOC = """
<html><body>
  <div id="mixed">
    <h1>t</h1>
    <p>p1</p>
    <span>s1</span>
    <p>p2</p>
    <p>p3</p>
    <span>s2</span>
    <p>p4</p>
  </div>
  <div id="solo"><em>only</em></div>
</body></html>
"""


class TestNthFunctional:
    def x(self, css: str) -> list[str]:
        sel = Selector(text=NTH_DOC)
        return [v.strip() for v in sel.css(css + "::text").getall() if v.strip()]

    def test_nth_child(self) -> None:
        # children: h1(1) p1(2) s1(3) p2(4) p3(5) s2(6) p4(7)
        assert self.x("#mixed p:nth-child(2)") == ["p1"]
        assert self.x("#mixed p:nth-child(odd)") == ["p3", "p4"]
        assert self.x("#mixed p:nth-child(even)") == ["p1", "p2"]
        assert self.x("#mixed p:nth-child(2n+4)") == ["p2"]
        assert self.x("#mixed p:nth-child(-n+4)") == ["p1", "p2"]
        assert self.x("#mixed p:nth-child(n)") == ["p1", "p2", "p3", "p4"]

    def test_nth_last_child(self) -> None:
        assert self.x("#mixed p:nth-last-child(1)") == ["p4"]
        assert self.x("#mixed p:nth-last-child(2n+1)") == ["p3", "p4"]

    def test_nth_of_type(self) -> None:
        assert self.x("#mixed p:nth-of-type(2)") == ["p2"]
        assert self.x("#mixed p:nth-of-type(odd)") == ["p1", "p3"]
        assert self.x("#mixed p:nth-of-type(even)") == ["p2", "p4"]
        assert self.x("#mixed span:nth-of-type(2)") == ["s2"]
        assert self.x("#mixed p:nth-of-type(2n+1)") == ["p1", "p3"]

    def test_nth_last_of_type(self) -> None:
        assert self.x("#mixed p:nth-last-of-type(1)") == ["p4"]
        assert self.x("#mixed p:nth-last-of-type(2)") == ["p3"]
        assert self.x("#mixed span:nth-last-of-type(2)") == ["s1"]

    def test_first_last_only_of_type(self) -> None:
        assert self.x("#mixed p:first-of-type") == ["p1"]
        assert self.x("#mixed p:last-of-type") == ["p4"]
        assert self.x("#mixed h1:only-of-type") == ["t"]
        assert self.x("#mixed p:only-of-type") == []
        assert self.x("#solo em:only-of-type") == ["only"]
