"""Deeper XPath 1.0 engine coverage beyond the reference's surface:
axes, core function library, coercions, document order, errors.
Goldens are hand-computed from the XPath 1.0 recommendation."""

from __future__ import annotations

import pytest

from parsel_spark import Selector

DOC = """
<root>
  <a id="1"><b>one</b><b>two</b></a>
  <a id="2"><b>three</b></a>
  <c id="3">four<d>five</d>tail</c>
  <!-- note -->
  <e id="4" class="x y"/>
</root>
"""


@pytest.fixture(scope="module")
def sel():
    return Selector(text=DOC, type="xml")


class TestAxes:
    def test_following(self, sel) -> None:
        assert sel.xpath("//a[@id='2']/following::d/text()").getall() == ["five"]
        tags = [
            s.root.tag for s in sel.xpath("//a[@id='1']/following::*")
        ]
        assert tags == ["a", "b", "c", "d", "e"]

    def test_preceding(self, sel) -> None:
        tags = [s.root.tag for s in sel.xpath("//c/preceding::*")]
        assert tags == ["a", "b", "b", "a", "b"]
        # position on reverse axes counts in reverse document order
        assert sel.xpath("//c/preceding::b[1]/text()").getall() == ["three"]
        assert sel.xpath("//c/preceding::b[last()]/text()").getall() == ["one"]

    def test_ancestor_or_self(self, sel) -> None:
        tags = [s.root.tag for s in sel.xpath("//d/ancestor-or-self::*")]
        assert tags == ["root", "c", "d"]
        assert sel.xpath("//d/ancestor::c/@id").getall() == ["3"]

    def test_following_preceding_sibling_positions(self, sel) -> None:
        assert sel.xpath("//a[@id='1']/b[2]/preceding-sibling::b[1]/text()").getall() == [
            "one"
        ]
        assert sel.xpath("//a[1]/following-sibling::*[2]/@id").getall() == ["3"]

    def test_comment_node_test(self, sel) -> None:
        assert sel.xpath("//comment()").getall() == ["<!-- note -->"]

    def test_union_document_order(self, sel) -> None:
        texts = sel.xpath("//c/text() | //b/text() | //d/text()").getall()
        assert texts == ["one", "two", "three", "four", "five", "tail"]

    def test_attribute_wildcard(self, sel) -> None:
        assert sel.xpath("//e/@*").getall() == ["4", "x y"]


class TestFunctions:
    def test_string_functions(self, sel) -> None:
        x = lambda q: sel.xpath(q).get()
        assert x("substring('12345', 2, 3)") == "234"
        assert x("substring('12345', 1.5, 2.6)") == "234"
        assert x("substring('12345', 2)") == "2345"
        assert x("substring-before('1999/04/01', '/')") == "1999"
        assert x("substring-after('1999/04/01', '/')") == "04/01"
        assert x("translate('--aaa--', 'abc-', 'ABC')") == "AAA"
        assert x("normalize-space('  a   b  ')") == "a b"
        assert x("string-length('abc')") == "3.0"
        assert x("concat('a', 'b', 'c')") == "abc"
        assert x("starts-with('abc', 'ab')") == "1"
        assert x("contains('abc', 'z')") == "0"

    def test_number_functions(self, sel) -> None:
        x = lambda q: sel.xpath(q).get()
        assert x("floor(2.6)") == "2.0"
        assert x("ceiling(2.2)") == "3.0"
        assert x("round(2.5)") == "3.0"
        assert x("round(-2.5)") == "-2.0"  # XPath rounds toward +inf
        assert x("1 div 2") == "0.5"
        assert x("5 mod 2") == "1.0"
        assert x("-3 + 1") == "-2.0"
        assert x("number('  12 ')") == "12.0"
        assert x("string(number('abc'))") == "NaN"
        assert x("string(1 div 0)") == "Infinity"
        assert x("string(12.0)") == "12"

    def test_nodeset_functions(self, sel) -> None:
        x = lambda q: sel.xpath(q).get()
        assert x("count(//b)") == "3.0"
        assert x("sum(//a/@id)") == "3.0"
        assert x("string(//b)") == "one"  # first node in document order
        assert x("name(//*[@id='3'])") == "c"
        assert x("local-name(//e)") == "e"
        assert x("count(//a/b) + count(//c)") == "4.0"

    def test_boolean_coercions(self, sel) -> None:
        x = lambda q: sel.xpath(q).get()
        assert x("boolean(//nothing)") == "0"
        assert x("boolean(//b)") == "1"
        assert x("not(0)") == "1"
        assert x("boolean('')") == "0"
        assert x("true() and false()") == "0"
        assert x("1 < 2") == "1"
        assert x("'3' > '12'") == "0"  # relational compares as numbers
        assert x("//a/@id = 2") == "1"  # nodeset vs number: any match
        assert x("//a/@id != 1") == "1"  # exists a node differing

    def test_position_last(self, sel) -> None:
        assert sel.xpath("//b[position() = last()]/text()").getall() == [
            "two",
            "three",
        ]
        assert sel.xpath("//b[last()]/text()").getall() == ["two", "three"]

    def test_filter_expression_with_path(self, sel) -> None:
        assert sel.xpath("(//b)[2]/text()").getall() == ["two"]
        assert sel.xpath("(//a/b)[last()]/text()").getall() == ["three"]
        assert sel.xpath("(//a)[1]/b/text()").getall() == ["one", "two"]


class TestErrors:
    def test_invalid_expression(self, sel) -> None:
        with pytest.raises(ValueError, match="Invalid predicate"):
            sel.xpath("//a[")  # truncated inside a predicate
        with pytest.raises(ValueError, match="Invalid expression"):
            sel.xpath("//a/ /b")
        with pytest.raises(ValueError, match="XPath error"):
            sel.xpath("//a]]")

    def test_unknown_function(self, sel) -> None:
        with pytest.raises(ValueError, match="Unregistered function"):
            sel.xpath("frobnicate(//a)")

    def test_has_class_on_xml_elements(self) -> None:
        sel = Selector(text='<r><p class="x">t</p></r>', type="xml")
        assert sel.xpath('//p[has-class("x")]/text()').getall() == ["t"]


class TestHtmlSpecifics:
    def test_void_and_rawtext_serialization(self) -> None:
        sel = Selector(text="<div><br><script>if (a < b) {}</script></div>")
        assert sel.css("div").get() == "<div><br><script>if (a < b) {}</script></div>"

    def test_entity_decoding_in_text_and_attrs(self) -> None:
        sel = Selector(text='<p title="a&amp;b">x &lt; y &gt; z &amp; w</p>')
        assert sel.css("p::attr(title)").get() == "a&b"
        assert sel.css("p::text").get() == "x < y > z & w"
        # serialization re-escapes
        assert sel.css("p").get() == '<p title="a&amp;b">x &lt; y &gt; z &amp; w</p>'

    def test_nested_list_recovery(self) -> None:
        sel = Selector(text="<ul><li>a<li>b<li>c</ul>")
        assert sel.css("li::text").getall() == ["a", "b", "c"]

    def test_table_structure(self) -> None:
        sel = Selector(text="<table><tr><td>1</td><td>2<tr><td>3</table>")
        assert sel.css("td::text").getall() == ["1", "2", "3"]
        assert len(sel.css("tr")) == 2


class TestExsltSets:
    """The full EXSLT-sets surface the reference pre-registers
    (reference parsel/selector.py:418-427: difference, has-same-node,
    intersection, leading, trailing via libxslt)."""

    DOC = (
        "<html><body>"
        '<ul><li class="a">1</li><li class="a b">2</li>'
        '<li class="b">3</li><li class="a">4</li></ul>'
        "</body></html>"
    )

    def sel(self):
        from parsel_spark.selector import Selector

        return Selector(text=self.DOC)

    def test_intersection(self) -> None:
        got = self.sel().xpath(
            'set:intersection(//li[contains(@class,"a")]/text(), '
            '//li[contains(@class,"b")]/text())'
        ).getall()
        assert got == ["2"]

    def test_has_same_node(self) -> None:
        sel = self.sel()
        assert sel.xpath(
            'set:has-same-node(//li[contains(@class,"a")], '
            '//li[contains(@class,"b")])'
        ).get() == "1"
        assert sel.xpath(
            'set:has-same-node(//li[@class="a"], //li[@class="b"])'
        ).get() == "0"

    def test_leading_trailing(self) -> None:
        sel = self.sel()
        assert sel.xpath(
            'set:leading(//li/text(), //li[@class="b"]/text())'
        ).getall() == ["1", "2"]
        assert sel.xpath(
            'set:trailing(//li/text(), //li[@class="b"]/text())'
        ).getall() == ["4"]

    def test_leading_pivot_not_contained_yields_empty(self) -> None:
        # libxslt xmlXPathNodeLeadingSorted containment guard: when the
        # pivot (first node of the second set) is not IN the first set,
        # the result is empty — not the doc-order preceding subset.
        sel = self.sel()
        assert sel.xpath(
            'set:leading(//li[@class="a"], //li[@class="b"])'
        ).getall() == []
        assert sel.xpath(
            'set:trailing(//li[@class="a"], //li[@class="b"])'
        ).getall() == []

    def test_leading_empty_second_set_keeps_first(self) -> None:
        got = self.sel().xpath(
            'set:leading(//li/text(), //nope)'
        ).getall()
        assert got == ["1", "2", "3", "4"]

    def test_unknown_exslt_function_names_itself(self) -> None:
        import pytest

        with pytest.raises(ValueError, match="set:nonexistent"):
            self.sel().xpath("set:nonexistent(//li, //li)")


class TestNodeSetVariables:
    """lxml parity: Selector / SelectorList values bind as node-set
    variables (scalars: reference tests/test_selector.py:85-141; lxml
    accepts element lists for $vars the same way)."""

    DOC = (
        "<html><body>"
        '<div id="x"><p>one</p><p>two</p></div>'
        '<div id="y"><p>three</p></div>'
        "</body></html>"
    )

    def test_selectorlist_binds_as_nodeset(self) -> None:
        from parsel_spark.selector import Selector

        sel = Selector(text=self.DOC)
        divs = sel.xpath("//div")
        assert sel.xpath("count($d)", d=divs).get() == "2.0"
        assert sel.xpath("$d/p/text()", d=divs).getall() == [
            "one", "two", "three",
        ]

    def test_single_selector_binds_as_nodeset(self) -> None:
        from parsel_spark.selector import Selector

        sel = Selector(text=self.DOC)
        x = sel.xpath('//div[@id="x"]')[0]
        assert sel.xpath("$d/p/text()", d=x).getall() == ["one", "two"]

    def test_nodeset_var_with_set_functions(self) -> None:
        from parsel_spark.selector import Selector

        sel = Selector(text=self.DOC)
        all_p = sel.xpath("//p")
        first_div_p = sel.xpath('//div[@id="x"]/p')
        got = sel.xpath(
            "set:difference($a, $b)/text()", a=all_p, b=first_div_p
        ).getall()
        assert got == ["three"]

    def test_scalar_vars_still_work(self) -> None:
        from parsel_spark.selector import Selector

        sel = Selector(text=self.DOC)
        assert sel.xpath("//div[@id=$val]/p/text()", val="y").getall() == [
            "three"
        ]
        assert sel.xpath("count(//p) = $n", n=3).get() == "1"


class TestIdFunction:
    DOC = (
        "<html><body>"
        '<div id="top">T</div>'
        '<p id="a">A</p><p id="b">B</p>'
        '<span class="ref">a b</span>'
        "</body></html>"
    )

    def sel(self):
        from parsel_spark.selector import Selector

        return Selector(text=self.DOC)

    def test_id_string(self) -> None:
        assert self.sel().xpath('id("a")/text()').getall() == ["A"]

    def test_id_whitespace_tokens(self) -> None:
        assert self.sel().xpath('id("a b")/text()').getall() == ["A", "B"]

    def test_id_nodeset_arg_uses_string_values(self) -> None:
        got = self.sel().xpath('id(//span[@class="ref"])/text()').getall()
        assert got == ["A", "B"]

    def test_id_no_match(self) -> None:
        assert self.sel().xpath('id("nope")').getall() == []

    def test_id_in_path_context(self) -> None:
        assert self.sel().xpath('id("top")/following-sibling::p/@id').getall() == [
            "a", "b",
        ]


class TestExsltStringsAndMath:
    """EXSLT str:/math: (public exslt.org specs).  Deliberately NOT
    pre-registered as prefixes (the reference pre-registers only
    re:/set: — parsel/selector.py:418-427): the implementations resolve
    once the namespace is registered, so reference prefix behavior is
    unchanged (an unregistered str: prefix still errors)."""

    NS = {
        "str": "http://exslt.org/strings",
        "math": "http://exslt.org/math",
    }
    DOC = (
        "<root><n>3</n><n>7</n><n>-2</n>"
        "<w>foo</w><w>bar</w></root>"
    )

    def sel(self):
        from parsel_spark.selector import Selector

        return Selector(text=self.DOC)

    def x(self, query):
        return self.sel().xpath(query, namespaces=self.NS)

    def test_unregistered_prefix_still_errors(self) -> None:
        import pytest as _pytest

        with _pytest.raises(ValueError):
            self.sel().xpath("str:tokenize('a b')")

    def test_str_tokenize_default_and_custom_delims(self) -> None:
        assert self.x("str:tokenize('a b\tc')/text()").getall() == ["a", "b", "c"]
        assert self.x("str:tokenize('2001-06-03T11:40', '-T:')/text()").getall() == [
            "2001", "06", "03", "11", "40"
        ]
        # empty delimiters -> per character
        assert self.x("str:tokenize('abc', '')/text()").getall() == ["a", "b", "c"]

    def test_str_split_whole_pattern_keeps_empty_fields(self) -> None:
        assert self.x("str:split('a, simple, list', ', ')/text()").getall() == [
            "a", "simple", "list"
        ]
        got = self.x("count(str:split('a,,b', ','))")
        assert got.get() == "3.0"  # empty middle field kept

    def test_str_concat_and_replace(self) -> None:
        assert self.x("str:concat(//w/text())").get() == "foobar"
        assert self.x("str:replace('a-b-c', '-', '+')").get() == "a+b+c"

    def test_str_padding_and_align(self) -> None:
        assert self.x("str:padding(5, 'ab')").get() == "ababa"
        assert self.x("str:padding(3)").get() == "   "
        assert self.x("str:align('x', '-----', 'center')").get() == "--x--"
        assert self.x("str:align('x', '---', 'right')").get() == "--x"
        assert self.x("str:align('toolong', '---')").get() == "too"

    def test_str_uri_roundtrip(self) -> None:
        assert (
            self.x("str:encode-uri('a b/c', false())").get() == "a%20b/c"
        )
        assert (
            self.x("str:encode-uri('a b/c', true())").get() == "a%20b%2Fc"
        )
        assert self.x("str:decode-uri('a%20b')").get() == "a b"

    def test_math_min_max_highest_lowest(self) -> None:
        assert self.x("math:min(//n)").get() == "-2.0"
        assert self.x("math:max(//n)").get() == "7.0"
        assert self.x("math:highest(//n)/text()").getall() == ["7"]
        assert self.x("math:lowest(//n)/text()").getall() == ["-2"]
        # non-numeric member -> NaN / empty set (floats surface through
        # Selector.get() via str(), reference-parity: str(nan) == 'nan')
        assert self.x("math:min(//w)").get() == "nan"
        assert self.x("math:highest(//w)").getall() == []

    def test_math_scalars(self) -> None:
        assert self.x("math:abs(-3)").get() == "3.0"
        assert self.x("math:sqrt(9)").get() == "3.0"
        assert self.x("math:sqrt(-1)").get() == "nan"
        assert self.x("math:power(2, 10)").get() == "1024.0"
        assert self.x("math:constant('PI', 4)").get() == "3.1416"
        assert self.x("math:exp(0)").get() == "1.0"
        assert self.x("math:cos(0)").get() == "1.0"


class TestExsltDates:
    """EXSLT date: (public exslt.org dates-and-times spec), same opt-in
    pattern as str:/math: — NOT pre-registered (reference pre-registers
    only re:/set: — parsel/selector.py:418-427), resolving once the
    canonical namespace is registered."""

    NS = {"date": "http://exslt.org/dates-and-times"}

    def sel(self):
        from parsel_spark.selector import Selector

        return Selector(text="<root/>")

    def x(self, query):
        return self.sel().xpath(query, namespaces=self.NS)

    def test_unregistered_prefix_still_errors(self) -> None:
        import pytest as _pytest

        with _pytest.raises(ValueError):
            self.sel().xpath("date:year('2001-06-03')")

    def test_date_portion_keeps_timezone(self) -> None:
        assert self.x("date:date('2000-01-12T12:13:14Z')").get() == "2000-01-12Z"
        assert (
            self.x("date:date('2001-06-03T11:30:00-05:00')").get()
            == "2001-06-03-05:00"
        )
        assert self.x("date:date('2001-06-03')").get() == "2001-06-03"
        assert self.x("date:date('not-a-date')").get() == ""

    def test_time_portion(self) -> None:
        assert self.x("date:time('2000-01-12T12:13:14Z')").get() == "12:13:14Z"
        # a date-only argument has no time portion → ''
        assert self.x("date:time('2001-06-03')").get() == ""

    def test_year_accepts_gyear_forms(self) -> None:
        assert self.x("date:year('2001-06-03T11:30:00')").get() == "2001.0"
        assert self.x("date:year('2001-06')").get() == "2001.0"
        assert self.x("date:year('2001')").get() == "2001.0"
        assert self.x("date:year('junk')").get() == "nan"

    def test_month_and_day_accessors(self) -> None:
        assert self.x("date:month-in-year('2001-06-03')").get() == "6.0"
        assert self.x("date:month-in-year('--06-03')").get() == "6.0"
        assert self.x("date:month-in-year('--06--')").get() == "6.0"
        assert self.x("date:day-in-month('2001-06-03')").get() == "3.0"
        assert self.x("date:day-in-month('---31')").get() == "31.0"
        assert self.x("date:day-in-month('--06-21')").get() == "21.0"

    def test_day_of_week_in_month(self) -> None:
        # 2001-06-21 was the THIRD Thursday of June 2001 (spec example)
        assert self.x("date:day-of-week-in-month('2001-06-21')").get() == "3.0"
        assert self.x("date:day-of-week-in-month('2001-06-01')").get() == "1.0"
        assert self.x("date:day-of-week-in-month('bad')").get() == "nan"

    def test_day_in_week_sunday_is_one(self) -> None:
        # 2000-01-12 was a Wednesday → 4 in the spec's 1=Sunday scheme
        assert self.x("date:day-in-week('2000-01-12')").get() == "4.0"
        # 2026-08-16 was a Sunday → 1
        assert self.x("date:day-in-week('2026-08-16')").get() == "1.0"

    def test_day_and_week_in_year(self) -> None:
        assert self.x("date:day-in-year('2001-01-01')").get() == "1.0"
        assert self.x("date:day-in-year('2000-12-31')").get() == "366.0"
        assert self.x("date:week-in-year('2004-01-01')").get() == "1.0"

    def test_leap_year_century_rule(self) -> None:
        # XPath booleans render like the reference's lxml results: the
        # engine's get() gives '1'/'0' (same as `true()`)
        assert self.x("date:leap-year('2000')").get() == "1"
        assert self.x("date:leap-year('1900')").get() == "0"
        assert self.x("date:leap-year('2004-02-29T00:00:00Z')").get() == "1"
        assert self.x("date:leap-year('nonsense')").get() == "0"

    def test_invalid_calendar_date_is_nan(self) -> None:
        # well-formed lexically, but Feb 30 does not exist
        assert self.x("date:day-in-week('2001-02-30')").get() == "nan"
        assert self.x("date:day-in-year('2001-02-30')").get() == "nan"

    def test_noarg_date_time_is_current_iso(self) -> None:
        import re as _re2

        got = self.x("date:date-time()").get()
        assert _re2.match(
            r"^\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}[+-]\d{2}:\d{2}$", got
        ), got


class TestExsltDateArithmetic:
    """The date: arithmetic half (seconds/duration/add/difference/
    add-duration/sum) — spec examples from exslt.org."""

    NS = {"date": "http://exslt.org/dates-and-times"}

    def x(self, query):
        from parsel_spark.selector import Selector

        return Selector(text="<root/>").xpath(query, namespaces=self.NS)

    def test_seconds_of_dates_and_durations(self) -> None:
        # floats surface through Selector.get() via str() —
        # reference-parity convention (see the math:/count tests)
        assert self.x("date:seconds('1970-01-01T00:00:30Z')").get() == "30.0"
        assert self.x("date:seconds('1970-01-02')").get() == "86400.0"
        # timezone applies
        assert (
            self.x("date:seconds('1970-01-01T01:00:00+01:00')").get() == "0.0"
        )
        assert self.x("date:seconds('PT1M30S')").get() == "90.0"
        assert self.x("date:seconds('-P1D')").get() == "-86400.0"
        # months are not convertible -> NaN
        assert self.x("date:seconds('P1M')").get() == "nan"
        assert self.x("date:seconds('junk')").get() == "nan"

    def test_duration_from_seconds(self) -> None:
        assert self.x("date:duration(86400)").get() == "P1D"
        assert self.x("date:duration(90061)").get() == "P1DT1H1M1S"
        assert self.x("date:duration(0)").get() == "PT0S"
        assert self.x("date:duration(-3600)").get() == "-PT1H"

    def test_add(self) -> None:
        assert (
            self.x("date:add('2000-01-12T12:13:14Z', 'P1D3')").get() == ""
        )  # malformed duration
        assert (
            self.x("date:add('2000-01-12T12:13:14Z', 'PT33H')").get()
            == "2000-01-13T21:13:14Z"
        )
        assert self.x("date:add('2000-01-12', 'P3D')").get() == "2000-01-15"
        # end-of-month clamp (spec/XML Schema appendix E)
        assert self.x("date:add('2000-01-31', 'P1M')").get() == "2000-02-29"
        assert self.x("date:add('2001-01-31', 'P1M')").get() == "2001-02-28"
        assert self.x("date:add('2000', 'P2Y')").get() == "2002"
        assert self.x("date:add('2000-04', 'P11M')").get() == "2001-03"
        # negative duration
        assert self.x("date:add('2000-01-12', '-P2D')").get() == "2000-01-10"

    def test_difference(self) -> None:
        assert (
            self.x("date:difference('2000-01-12', '2000-01-15')").get()
            == "P3D"
        )
        assert (
            self.x("date:difference('2000-01-15', '2000-01-12')").get()
            == "-P3D"
        )
        assert (
            self.x(
                "date:difference('2000-01-12T10:00:00Z',"
                " '2000-01-12T11:30:00Z')"
            ).get()
            == "PT1H30M"
        )
        # year/month precision pair -> PnYnM form
        assert self.x("date:difference('1999', '2002')").get() == "P3Y"
        assert (
            self.x("date:difference('2000-03', '2001-05')").get() == "P1Y2M"
        )
        assert self.x("date:difference('x', '2000-01-01')").get() == ""

    def test_add_duration_and_sum(self) -> None:
        assert (
            self.x("date:add-duration('P1DT12H', 'PT12H')").get() == "P2D"
        )
        assert self.x("date:add-duration('P1Y', 'P3M')").get() == "P1Y3M"
        assert self.x("date:add-duration('P1D', 'junk')").get() == ""
        # mixed-sign result has no canonical form
        assert self.x("date:add-duration('P1M', '-P1D')").get() == ""
        sel_xml = "<r><d>P1D</d><d>PT6H</d><d>PT18H</d></r>"
        from parsel_spark.selector import Selector

        sel = Selector(text=sel_xml, type="xml")
        assert (
            sel.xpath("date:sum(//d)", namespaces=self.NS).get() == "P2D"
        )
        bad = Selector(text="<r><d>P1D</d><d>zz</d></r>", type="xml")
        assert bad.xpath("date:sum(//d)", namespaces=self.NS).get() == ""


def test_duration_fractional_seconds_canonical() -> None:
    from parsel_spark.selector.xpath.functions import _format_duration

    assert _format_duration(0, 0.1 + 0.2) == "PT0.3S"
    assert _format_duration(0, 1.5) == "PT1.5S"
    assert _format_duration(0, 90.25) == "PT1M30.25S"
