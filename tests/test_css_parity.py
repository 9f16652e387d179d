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
