"""Selector-parity suite.

Asserts the engine reproduces the reference's observable behavior; golden
strings and scenarios derive from /root/reference/tests/test_selector.py
(cited per test).  Tests asserting lxml *internals* (smart strings,
``make_links_absolute``, huge_tree warnings) are adapted and marked.

Each test class runs twice: once with str input and once with bytes
input (reference: TestSelectorBytes, tests/test_selector.py:1219-1266).
"""

from __future__ import annotations

import pickle
import re
import weakref
from typing import Any, Mapping

import pytest

from parsel_spark import Selector, SelectorList
from parsel_spark.selector import (
    CannotRemoveElementWithoutParent,
    CannotRemoveElementWithoutRoot,
    _NOT_SET,
)


class BytesInputSelector(Selector):
    """Re-routes text input through the bytes/encoding path."""

    def __init__(self, text=None, type=None, body=b"", encoding="utf-8", **kw):
        if text:
            body = bytes(text, encoding=encoding)
            text = None
        super().__init__(text=text, type=type, body=body, encoding=encoding, **kw)


@pytest.fixture(params=[Selector, BytesInputSelector], ids=["text", "bytes"])
def sscls(request):
    return request.param


class TestSelection:
    def test_pickle_refused(self, sscls) -> None:
        # ref tests/test_selector.py:37-53
        sel = sscls(text="<html><body><p>some text</p></body></html>")
        with pytest.raises(TypeError):
            pickle.dumps(sel, protocol=2)
        with pytest.raises(TypeError):
            pickle.dumps(sel.css("p"), protocol=2)
        with pytest.raises(TypeError):
            pickle.dumps(sel.css("q"), protocol=2)

    def test_simple_selection(self, sscls) -> None:
        # ref tests/test_selector.py:55-83
        body = "<p><input name='a'value='1'/><input name='b'value='2'/></p>"
        sel = sscls(text=body)
        xl = sel.xpath("//input")
        assert len(xl) == 2
        for x in xl:
            assert isinstance(x, sscls)
        assert sel.xpath("//input").extract() == [
            x.extract() for x in sel.xpath("//input")
        ]
        assert [x.extract() for x in sel.xpath("//input[@name='a']/@name")] == ["a"]
        assert [
            x.extract()
            for x in sel.xpath(
                "number(concat(//input[@name='a']/@value, //input[@name='b']/@value))"
            )
        ] == ["12.0"]
        assert sel.xpath("concat('xpath', 'rules')").extract() == ["xpathrules"]
        assert [
            x.extract()
            for x in sel.xpath(
                "concat(//input[@name='a']/@value, //input[@name='b']/@value)"
            )
        ] == ["12"]

    def test_variables(self, sscls) -> None:
        # ref tests/test_selector.py:85-115
        body = "<p><input name='a' value='1'/><input name='b' value='2'/></p>"
        sel = sscls(text=body)
        assert [
            x.extract() for x in sel.xpath("//input[@value=$number]/@name", number=1)
        ] == ["a"]
        assert [
            x.extract() for x in sel.xpath("//input[@name=$letter]/@value", letter="b")
        ] == ["2"]
        assert sel.xpath(
            "count(//input[@value=$number or @name=$letter])", number=2, letter="a"
        ).extract() == ["2.0"]
        assert sel.xpath(
            "boolean(count(//input)=$cnt)=$test", cnt=2, test=True
        ).extract() == ["1"]
        assert sel.xpath(
            "boolean(count(//input)=$cnt)=$test", cnt=4, test=True
        ).extract() == ["0"]
        assert sel.xpath(
            "boolean(count(//input)=$cnt)=$test", cnt=4, test=False
        ).extract() == ["1"]
        assert sel.xpath(
            "boolean(count(//*[name()=$tag])=$cnt)=$test", tag="input", cnt=2, test=True
        ).extract() == ["1"]

    def test_variables_escape_friendly(self, sscls) -> None:
        # ref tests/test_selector.py:117-141
        body = """<p>I'm mixing single and <input name='a' value='I say "Yeah!"'/>
        "double quotes" and I don't care :)</p>"""
        sel = sscls(text=body)
        t = 'I say "Yeah!"'
        with pytest.raises(ValueError, match="Invalid predicate in"):
            sel.xpath(f'//input[@value="{t}"]/@name')
        assert [
            x.extract() for x in sel.xpath("//input[@value=$text]/@name", text=t)
        ] == ["a"]
        lt = """I'm mixing single and "double quotes" and I don't care :)"""
        with pytest.raises(ValueError, match="Invalid predicate in"):
            sel.xpath(f"//p[normalize-space()='{lt}']//@name")
        assert [
            x.extract() for x in sel.xpath("//p[normalize-space()=$lng]//@name", lng=lt)
        ] == ["a"]

    def test_accessing_attributes(self, sscls) -> None:
        # ref tests/test_selector.py:143-169
        body = """
<html lang="en" version="1.0">
    <body>
        <ul id="some-list" class="list-cls" class="list-cls">
            <li class="item-cls" id="list-item-1">
            <li class="item-cls active" id="list-item-2">
            <li class="item-cls" id="list-item-3">
        </ul>
    </body>
</html>
        """
        sel = sscls(text=body)
        assert sel.attrib == {"lang": "en", "version": "1.0"}
        assert sel.css("ul")[0].attrib == {"id": "some-list", "class": "list-cls"}
        assert sel.css("ul").attrib == {"id": "some-list", "class": "list-cls"}
        assert sel.css("li").attrib == {"class": "item-cls", "id": "list-item-1"}
        assert sel.css("body").attrib == {}
        assert sel.css("non-existing-element").attrib == {}
        assert [e.attrib for e in sel.css("li")] == [
            {"class": "item-cls", "id": "list-item-1"},
            {"class": "item-cls active", "id": "list-item-2"},
            {"class": "item-cls", "id": "list-item-3"},
        ]

    def test_representation(self) -> None:
        # ref tests/test_selector.py:171-187 (str input only, as in reference)
        body = f"<p><input name='{50 * 'b'}' value='\xa9'/></p>"
        sel = Selector(text=body)
        representation = f"<Selector query='//input/@name' data='{37 * 'b'}...'>"
        assert [repr(it) for it in sel.xpath("//input/@name")] == [representation]
        representation = "<Selector query='//input[@value=\"©\"]/@value' data='©'>"
        assert [repr(it) for it in sel.xpath('//input[@value="©"]/@value')] == [
            representation
        ]

    def test_check_text_argument_type(self, sscls) -> None:
        # ref tests/test_selector.py:189-191, 1260-1262
        if sscls is BytesInputSelector:
            with pytest.raises(TypeError, match="body argument should be of type"):
                sscls(body="<html/>")
        else:
            with pytest.raises(TypeError, match="text argument should be of type"):
                sscls(b"<html/>")

    def test_extract_first(self, sscls) -> None:
        # ref tests/test_selector.py:193-220
        body = '<ul><li id="1">1</li><li id="2">2</li></ul>'
        sel = sscls(text=body)
        assert (
            sel.xpath("//ul/li/text()").extract_first()
            == sel.xpath("//ul/li/text()").extract()[0]
        )
        assert (
            sel.xpath('//ul/li[@id="1"]/text()').extract_first()
            == sel.xpath('//ul/li[@id="1"]/text()').extract()[0]
        )
        assert (
            sel.xpath("//ul/li[2]/text()").extract_first()
            == sel.xpath("//ul/li/text()").extract()[1]
        )
        assert sel.xpath('/ul/li[@id="doesnt-exist"]/text()').extract_first() is None
        assert sel.xpath("//div/text()").extract_first(default="missing") == "missing"

    def test_get_getall_aliases(self, sscls) -> None:
        # ref tests/test_selector.py:222-244
        body = '<ul><li id="1">1</li><li id="2">2</li><li id="3">3</li></ul>'
        sel = sscls(text=body)
        assert sel.xpath("//ul/li[position()>1]")[0].get() == '<li id="2">2</li>'
        assert sel.xpath("//ul/li[position()>1]/text()")[0].get() == "2"
        assert sel.xpath("//ul/li[position()>1]")[0].getall() == ['<li id="2">2</li>']
        assert sel.xpath("//ul/li[position()>1]/text()")[0].getall() == ["2"]
        assert sel.xpath("//ul/li").get() == '<li id="1">1</li>'
        assert sel.xpath("//ul/li/text()").get() == "1"

    def test_re_first(self, sscls) -> None:
        # ref tests/test_selector.py:246-283
        body = '<ul><li id="1">1</li><li id="2">2</li></ul>'
        sel = sscls(text=body)
        assert (
            sel.xpath("//ul/li/text()").re_first(r"\d")
            == sel.xpath("//ul/li/text()").re(r"\d")[0]
        )
        assert (
            sel.xpath("//ul/li[2]/text()").re_first(r"\d")
            == sel.xpath("//ul/li/text()").re(r"\d")[1]
        )
        assert sel.xpath("/ul/li/text()").re_first(r"\w+") is None
        assert sel.re_first(r'id="(\d+)') == "1"
        assert sel.re_first(r"foo") is None
        assert sel.re_first(r"foo", default="bar") == "bar"
        assert sel.xpath("//div/text()").re_first(r"\w+", default="missing") == "missing"

    def test_select_unicode_query(self, sscls) -> None:
        # ref tests/test_selector.py:285-288
        body = "<p><input name='\xa9' value='1'/></p>"
        sel = sscls(text=body)
        assert sel.xpath('//input[@name="©"]/@value').extract() == ["1"]

    def test_list_elements_type(self, sscls) -> None:
        # ref tests/test_selector.py:290-296
        text = "<p>test<p>"
        assert type(sscls(text=text).xpath("//p")[0]) is type(sscls(text=text))
        assert type(sscls(text=text).css("p")[0]) is type(sscls(text=text))

    def test_boolean_result(self, sscls) -> None:
        # ref tests/test_selector.py:298-302
        body = "<p><input name='a'value='1'/><input name='b'value='2'/></p>"
        xs = sscls(text=body)
        assert xs.xpath("//input[@name='a']/@name='a'").extract() == ["1"]
        assert xs.xpath("//input[@name='a']/@name='n'").extract() == ["0"]

    def test_differences_parsing_xml_vs_html(self, sscls) -> None:
        # ref tests/test_selector.py:304-316
        text = '<div><img src="a.jpg"><p>Hello</div>'
        hs = sscls(text=text, type="html")
        assert hs.xpath("//div").extract() == [
            '<div><img src="a.jpg"><p>Hello</p></div>'
        ]
        xs = sscls(text=text, type="xml")
        assert xs.xpath("//div").extract() == [
            '<div><img src="a.jpg"><p>Hello</p></img></div>'
        ]

    def test_error_for_unknown_selector_type(self, sscls) -> None:
        # ref tests/test_selector.py:318-326, 1011-1013
        with pytest.raises(ValueError, match="Invalid type: _na_"):
            sscls(text="", type="_na_")
        with pytest.raises(ValueError, match="Invalid type: xhtml"):
            sscls(text="", type="xhtml")
        with pytest.raises(
            ValueError, match="Selector needs text, body, or root arguments"
        ):
            Selector()

    def test_bool(self, sscls) -> None:
        # ref tests/test_selector.py:328-336
        text = '<a href="" >false</a><a href="nonempty">true</a>'
        hs = sscls(text=text, type="html")
        falsish = hs.xpath("//a/@href")[0]
        assert falsish.extract() == ""
        assert not falsish
        trueish = hs.xpath("//a/@href")[1]
        assert trueish.extract() == "nonempty"
        assert trueish

    def test_slicing(self, sscls) -> None:
        # ref tests/test_selector.py:338-345
        text = "<div><p>1</p><p>2</p><p>3</p></div>"
        hs = sscls(text=text, type="html")
        assert isinstance(hs.css("p")[2], sscls)
        assert isinstance(hs.css("p")[2:3], SelectorList)
        assert isinstance(hs.css("p")[:2], SelectorList)
        assert hs.css("p")[2:3].extract() == ["<p>3</p>"]
        assert hs.css("p")[1:3].extract() == ["<p>2</p>", "<p>3</p>"]

    def test_nested_selectors(self, sscls) -> None:
        # ref tests/test_selector.py:347-417
        body = """<body>
                    <div class='one'>
                      <ul>
                        <li>one</li><li>two</li>
                      </ul>
                    </div>
                    <div class='two'>
                      <ul>
                        <li>four</li><li>five</li><li>six</li>
                      </ul>
                    </div>
                  </body>"""
        x = sscls(text=body)
        divtwo = x.xpath('//div[@class="two"]')
        assert divtwo.xpath("//li").getall() == [
            "<li>one</li>",
            "<li>two</li>",
            "<li>four</li>",
            "<li>five</li>",
            "<li>six</li>",
        ]
        assert divtwo.xpath("./ul/li").getall() == [
            "<li>four</li>",
            "<li>five</li>",
            "<li>six</li>",
        ]
        assert divtwo.xpath(".//li").getall() == [
            "<li>four</li>",
            "<li>five</li>",
            "<li>six</li>",
        ]
        assert divtwo.xpath("./li").getall() == []

    def test_mixed_nested_selectors(self, sscls) -> None:
        # ref tests/test_selector.py:419-426
        body = """<body>
                    <div id=1>not<span>me</span></div>
                    <div class="dos"><p>text</p><a href='#'>foo</a></div>
               </body>"""
        sel = sscls(text=body)
        assert sel.xpath('//div[@id="1"]').css("span::text").extract() == ["me"]
        assert sel.css("#1").xpath("./span/text()").extract() == ["me"]

    def test_dont_strip(self, sscls) -> None:
        # ref tests/test_selector.py:428-430
        sel = sscls(text='<div>fff: <a href="#">zzz</a></div>')
        assert sel.xpath("//text()").extract() == ["fff: ", "zzz"]

    def test_re(self, sscls) -> None:
        # ref tests/test_selector.py:595-618
        body = """<div>Name: Mary
                    <ul>
                      <li>Name: John</li>
                      <li>Age: 10</li>
                      <li>Name: Paul</li>
                      <li>Age: 20</li>
                    </ul>
                    Age: 20
                  </div>"""
        x = sscls(text=body)
        name_re = re.compile(r"Name: (\w+)")
        assert x.xpath("//ul/li").re(name_re) == ["John", "Paul"]
        assert x.xpath("//ul/li").re(r"Age: (\d+)") == ["10", "20"]
        x = sscls(text="foobar")
        assert x.re("(?P<extract>foo)") == ["foo"]
        assert x.re("(?P<extract>baz)") == []
        x = sscls(text="baz")
        assert x.re("(?P<extract>foo)|(?P<bar>baz)") == []

    def test_re_replace_entities(self, sscls) -> None:
        # ref tests/test_selector.py:620-651
        body = """<script>{"foo":"bar &amp; &quot;baz&quot;"}</script>"""
        x = sscls(text=body)
        name_re = re.compile('{"foo":(.*)}')
        expected = '"bar &amp; "baz""'
        assert x.xpath("//script/text()").re(name_re) == [expected]
        assert x.xpath("//script").re(name_re) == [expected]
        assert x.xpath("//script/text()")[0].re(name_re) == [expected]
        assert x.xpath("//script")[0].re(name_re) == [expected]
        assert x.xpath("//script").re_first(name_re) == expected
        assert x.xpath("//script")[0].re_first(name_re) == expected
        expected = '"bar &amp; &quot;baz&quot;"'
        assert x.xpath("//script/text()").re(name_re, replace_entities=False) == [
            expected
        ]
        assert x.xpath("//script")[0].re(name_re, replace_entities=False) == [expected]
        assert (
            x.xpath("//script/text()").re_first(name_re, replace_entities=False)
            == expected
        )

    def test_re_intl(self, sscls) -> None:
        # ref tests/test_selector.py:653-656
        body = "<div>Evento: cumplea\xf1os</div>"
        x = sscls(text=body)
        assert x.xpath("//div").re(r"Evento: (\w+)") == ["cumpleaños"]

    def test_selector_over_text(self, sscls) -> None:
        # ref tests/test_selector.py:658-663
        hs = sscls(text="<root>lala</root>")
        assert hs.extract() == "<html><body><root>lala</root></body></html>"
        xs = sscls(text="<root>lala</root>", type="xml")
        assert xs.extract() == "<root>lala</root>"
        assert xs.xpath(".").extract() == ["<root>lala</root>"]

    def test_invalid_xpath(self, sscls) -> None:
        # ref tests/test_selector.py:665-677
        x = sscls(text="<html></html>")
        xpath = "//test[@foo='bar]"
        with pytest.raises(ValueError, match=re.escape(xpath)):
            x.xpath(xpath)
        xpath = "//test[@foo='\\u0431ar]"
        with pytest.raises(ValueError, match=re.escape(xpath)):
            x.xpath(xpath)

    def test_header_encoding_roundtrip(self, sscls) -> None:
        # ref tests/test_selector.py:679-688
        text = """<html>
        <head><meta http-equiv="Content-Type" content="text/html; charset=iso-8859-1"></head>
        <body><span id="blank">\xa3</span></body></html>"""
        x = sscls(text=text)
        assert x.xpath("//span[@id='blank']/text()").extract() == ["£"]

    def test_hostile_bodies(self, sscls) -> None:
        # ref tests/test_selector.py:690-704, 876-878
        sscls(text="").xpath("//text()").extract()  # empty body: no error
        sscls(text="<root>pre\x00post</root>").xpath("//text()").extract()
        text = "<html><p>an Jos\\ufffd de</p><html>"
        assert sscls(text=text).xpath("//text()").extract() == ["an Jos\\ufffd de"]
        text = "<html>\x00<body><p>Grainy</p></body></html>"
        assert sscls(text=text).extract() == "<html><body><p>Grainy</p></body></html>"

    def test_bodies_with_comments_only(self, sscls) -> None:
        # ref tests/test_selector.py:693-695
        sel = sscls(text="<!-- hello world -->", base_url="http://example.com")
        assert sel.root.base == "http://example.com"

    def test_configure_base_url(self, sscls) -> None:
        # ref tests/test_selector.py:854-856
        sel = sscls(text="nothing", base_url="http://example.com")
        assert sel.root.base == "http://example.com"

    def test_select_on_unevaluable_nodes(self, sscls) -> None:
        # ref tests/test_selector.py:706-715
        r = sscls(text='<span class="big">some text</span>')
        x1 = r.xpath("//text()")
        assert x1.extract() == ["some text"]
        assert x1.xpath(".//b").extract() == []
        x1 = r.xpath("//span/@class")
        assert x1.extract() == ["big"]
        assert x1.xpath(".//text()").extract() == []

    def test_select_on_text_nodes(self, sscls) -> None:
        # ref tests/test_selector.py:717-727
        r = sscls(text="<div><b>Options:</b>opt1</div><div><b>Other</b>opt2</div>")
        x1 = r.xpath(
            "//div/descendant::text()[preceding-sibling::b[contains(text(), 'Options')]]"
        )
        assert x1.extract() == ["opt1"]
        x1 = r.xpath(
            "//div/descendant::text()/preceding-sibling::b[contains(text(), 'Options')]"
        )
        assert x1.extract() == ["<b>Options:</b>"]

    def test_weakref_slots(self) -> None:
        # ref tests/test_selector.py:737-743
        x = Selector(text="")
        weakref.ref(x)
        assert not hasattr(x, "__dict__")

    def test_smart_strings_always_off(self, sscls) -> None:
        # adapted from ref tests/test_selector.py:810-841: our engine always
        # returns plain strings for text/attr results (smart_strings=False)
        body = "<body><div class='one'><ul><li>one</li><li>two</li></ul></div></body>"
        x = sscls(text=body)
        for e in x.xpath("//li/text()"):
            assert not hasattr(e.root, "getparent")
            assert isinstance(e.root, str)
        for e in x.xpath("//div/@class"):
            assert not hasattr(e.root, "getparent")

    def test_deep_nesting(self, sscls) -> None:
        # ref tests/test_selector.py:940-1009 — FULL parity: the default
        # (huge_tree=True) lifts the limit; huge_tree=False enforces the
        # libxml2 256-node depth limit, truncates the rest of the input
        # (the trailing <td> is lost) and warns mentioning huge_tree
        import warnings as _warnings

        lvl = 282
        content = "<html><body>" + "<span>" * lvl + "hello world" + "</span>" * lvl
        content += "<table><tr><td>some test</td></tr></table></body></html>"

        with _warnings.catch_warnings(record=True) as w:
            _warnings.simplefilter("always")
            sel = sscls(text=content, huge_tree=False)
            assert any("huge_tree" in str(m.message) for m in w)
        assert len(sel.css("span")) <= 256
        assert len(sel.css("td")) == 0

        sel = sscls(text=content)
        assert len(sel.css("span")) == lvl
        assert len(sel.css("td")) == 1

    def test_deep_nesting_xml(self, sscls) -> None:
        # same limit through the XML parser
        import warnings as _warnings

        lvl = 300
        content = "<r>" + "<a>" * lvl + "x" + "</a>" * lvl + "<tail/></r>"
        with _warnings.catch_warnings(record=True) as w:
            _warnings.simplefilter("always")
            sel = sscls(text=content, type="xml", huge_tree=False)
            assert any("huge_tree" in str(m.message) for m in w)
        assert len(sel.xpath("//a")) <= 256
        assert len(sel.xpath("//tail")) == 0
        # and the dropped input must not LEAK as text content either
        assert "tail" not in (sel.xpath("string(/)").get() or "")
        sel = sscls(text=content, type="xml")
        assert len(sel.xpath("//a")) == lvl
        assert len(sel.xpath("//tail")) == 1

    def test_extending_selector(self) -> None:
        # ref tests/test_selector.py:858-874
        class MySelectorList(SelectorList["MySelector"]):
            pass

        class MySelector(Selector):
            selectorlist_cls = MySelectorList

            def extra_method(self) -> str:
                return "extra" + self.get()

        sel = MySelector(text="<html><div>foo</div></html>")
        assert isinstance(sel.xpath("//div"), MySelectorList)
        assert isinstance(sel.xpath("//div")[0], MySelector)
        assert isinstance(sel.css("div"), MySelectorList)
        assert isinstance(sel.css("div")[0], MySelector)
        assert sel.css("div")[0].extra_method() == "extra<div>foo</div>"


class TestNamespaces:
    def test_namespaces_simple(self, sscls) -> None:
        # ref tests/test_selector.py:432-457
        body = """
        <test xmlns:somens="http://scrapy.org">
           <somens:a id="foo">take this</a>
           <a id="bar">found</a>
        </test>
        """
        x = sscls(text=body, type="xml")
        x.register_namespace("somens", "http://scrapy.org")
        assert x.xpath("//somens:a/text()").extract() == ["take this"]
        y = sscls(text=body, type="xml")
        assert y.xpath(
            "//somens:a/text()", namespaces={"somens": "http://scrapy.org"}
        ).extract() == ["take this"]

    def test_namespaces_adhoc_variables(self, sscls) -> None:
        # ref tests/test_selector.py:459-473
        body = """
        <test xmlns:somens="http://scrapy.org">
           <somens:a id="foo">take this</a>
           <a id="bar">found</a>
        </test>
        """
        x = sscls(text=body, type="xml")
        assert x.xpath(
            "//somens:a/following-sibling::a[@id=$identifier]/text()",
            namespaces={"somens": "http://scrapy.org"},
            identifier="bar",
        ).extract() == ["found"]

    _AMAZON = """<?xml version="1.0" encoding="UTF-8"?>
<BrowseNode xmlns="http://webservices.amazon.com/AWSECommerceService/2005-10-05"
            xmlns:b="http://somens.com"
            xmlns:p="http://www.scrapy.org/product" >
    <b:Operation>hello</b:Operation>
    <TestTag b:att="value"><Other>value</Other></TestTag>
    <p:SecondTestTag><material>iron</material><price>90</price><p:name>Dried Rose</p:name></p:SecondTestTag>
</BrowseNode>
"""

    def test_namespaces_multiple(self, sscls) -> None:
        # ref tests/test_selector.py:475-500
        x = sscls(text=self._AMAZON, type="xml")
        x.register_namespace(
            "xmlns", "http://webservices.amazon.com/AWSECommerceService/2005-10-05"
        )
        x.register_namespace("p", "http://www.scrapy.org/product")
        x.register_namespace("b", "http://somens.com")
        assert len(x.xpath("//xmlns:TestTag")) == 1
        assert x.xpath("//b:Operation/text()").extract()[0] == "hello"
        assert x.xpath("//xmlns:TestTag/@b:att").extract()[0] == "value"
        assert x.xpath("//p:SecondTestTag/xmlns:price/text()").extract()[0] == "90"
        assert (
            x.xpath("//p:SecondTestTag").xpath("./xmlns:price/text()")[0].extract()
            == "90"
        )
        assert x.xpath("//p:SecondTestTag/xmlns:material/text()").extract()[0] == "iron"

    def test_namespaces_multiple_adhoc(self, sscls) -> None:
        # ref tests/test_selector.py:502-587
        x = sscls(text=self._AMAZON, type="xml")
        x.register_namespace(
            "xmlns", "http://webservices.amazon.com/AWSECommerceService/2005-10-05"
        )
        assert len(x.xpath("//xmlns:TestTag")) == 1
        with pytest.raises(ValueError, match="Undefined namespace prefix"):
            x.xpath("//xmlns:TestTag/@b:att")
        assert (
            x.xpath(
                "//b:Operation/text()", namespaces={"b": "http://somens.com"}
            ).extract()[0]
            == "hello"
        )
        # ad-hoc declarations are not cached
        with pytest.raises(ValueError, match="Undefined namespace prefix"):
            x.xpath("//xmlns:TestTag/@b:att")
        assert (
            x.xpath(
                "//xmlns:TestTag/@b:att", namespaces={"b": "http://somens.com"}
            ).extract()[0]
            == "value"
        )
        # chained selectors keep register_namespace() state…
        assert (
            x.xpath(
                "//p:SecondTestTag", namespaces={"p": "http://www.scrapy.org/product"}
            )
            .xpath("./xmlns:price/text()")[0]
            .extract()
            == "90"
        )
        # …but not parent ad-hoc declarations
        with pytest.raises(ValueError, match="Undefined namespace prefix"):
            x.xpath(
                "//p:SecondTestTag",
                namespaces={"p": "http://www.scrapy.org/product"},
            ).xpath("p:name/text()")
        assert (
            x.xpath(
                "//p:SecondTestTag", namespaces={"p": "http://www.scrapy.org/product"}
            )
            .xpath("p:name/text()", namespaces={"p": "http://www.scrapy.org/product"})
            .extract_first()
            == "Dried Rose"
        )
        assert (
            x.xpath(
                "string(//b:Operation/following-sibling::xmlns:TestTag"
                "/following-sibling::*//p:name)",
                namespaces={
                    "b": "http://somens.com",
                    "p": "http://www.scrapy.org/product",
                },
            ).extract_first()
            == "Dried Rose"
        )
        with pytest.raises(ValueError, match="Undefined namespace prefix"):
            x.xpath("//p:SecondTestTag/xmlns:price/text()")
        x.register_namespace("p", "http://www.scrapy.org/product")
        assert x.xpath("//p:SecondTestTag/xmlns:material/text()").extract()[0] == "iron"

    def test_remove_namespaces(self, sscls) -> None:
        # ref tests/test_selector.py:745-760
        xml = """<?xml version="1.0" encoding="UTF-8"?>
<feed xmlns="http://www.w3.org/2005/Atom" xml:lang="en-US" xmlns:media="http://search.yahoo.com/mrss/">
  <link type="text/html"/>
  <entry>
    <link type="text/html"/>
  </entry>
  <link type="application/atom+xml"/>
</feed>
"""
        sel = sscls(text=xml, type="xml")
        assert len(sel.xpath("//link")) == 0
        assert len(sel.xpath("./namespace::*")) == 3
        sel.remove_namespaces()
        assert len(sel.xpath("//link")) == 3
        assert len(sel.xpath("./namespace::*")) == 1

    def test_remove_namespaces_embedded(self, sscls) -> None:
        # ref tests/test_selector.py:762-793
        xml = """
        <feed xmlns="http://www.w3.org/2005/Atom">
          <link type="text/html"/>
          <entry>
            <link type="text/html"/>
          </entry>
          <svg xmlns="http://www.w3.org/2000/svg" version="1.1" viewBox="0 0 100 100">
            <linearGradient id="gradient">
              <stop class="begin" offset="0%" style="stop-color:yellow;"/>
              <stop class="end" offset="80%" style="stop-color:green;"/>
            </linearGradient>
            <circle cx="50" cy="50" r="30" style="fill:url(#gradient)" />
          </svg>
        </feed>
        """
        sel = sscls(text=xml, type="xml")
        assert len(sel.xpath("//link")) == 0
        assert len(sel.xpath("//stop")) == 0
        assert len(sel.xpath("./namespace::*")) == 2
        assert (
            len(sel.xpath("//f:link", namespaces={"f": "http://www.w3.org/2005/Atom"}))
            == 2
        )
        assert (
            len(sel.xpath("//s:stop", namespaces={"s": "http://www.w3.org/2000/svg"}))
            == 2
        )
        sel.remove_namespaces()
        assert len(sel.xpath("//link")) == 2
        assert len(sel.xpath("//stop")) == 2
        assert len(sel.xpath("./namespace::*")) == 1

    def test_remove_attributes_namespaces(self, sscls) -> None:
        # ref tests/test_selector.py:795-808
        xml = """<?xml version="1.0" encoding="UTF-8"?>
<feed xmlns:atom="http://www.w3.org/2005/Atom" xml:lang="en-US" xmlns:media="http://search.yahoo.com/mrss/">
  <link atom:type="text/html"/>
  <entry>
    <link atom:type="text/html"/>
  </entry>
  <link atom:type="application/atom+xml"/>
</feed>
"""
        sel = sscls(text=xml, type="xml")
        assert len(sel.xpath("//link/@type")) == 0
        sel.remove_namespaces()
        assert len(sel.xpath("//link/@type")) == 3

    def test_xml_entity_expansion(self, sscls) -> None:
        # ref tests/test_selector.py:843-852 (XXE stays literal)
        malicious_xml = (
            '<?xml version="1.0" encoding="ISO-8859-1"?>'
            "<!DOCTYPE foo [ <!ELEMENT foo ANY > <!ENTITY xxe SYSTEM "
            '"file:///etc/passwd" >]><foo>&xxe;</foo>'
        )
        sel = sscls(text=malicious_xml, type="xml")
        assert sel.extract() == "<foo>&xxe;</foo>"


class TestMutation:
    def test_drop_selector_list(self, sscls) -> None:
        # ref tests/test_selector.py:880-896
        sel = sscls(
            text="<html><body><ul><li>1</li><li>2</li><li>3</li></ul></body></html>"
        )
        sel.css("li").drop()
        assert sel.css("li") == []
        sel = sscls(
            text="<html><body><ul><li>1</li><li>2</li><li>3</li></ul></body></html>"
        )
        sel.css("li")[0].drop()
        assert sel.css("li::text").getall() == ["2", "3"]

    def test_drop_pseudo_element_raises(self, sscls) -> None:
        # ref tests/test_selector.py:898-920
        sel = sscls(
            text="<html><body><ul><li>1</li><li>2</li><li>3</li></ul></body></html>"
        )
        sel_list = sel.css("li::text")
        assert sel_list.getall() == ["1", "2", "3"]
        with pytest.raises(CannotRemoveElementWithoutRoot):
            sel_list.drop()
        with pytest.raises(CannotRemoveElementWithoutRoot):
            sel_list[0].drop()
        assert sel.css("li::text").getall() == ["1", "2", "3"]

    def test_drop_root_raises(self, sscls) -> None:
        # ref tests/test_selector.py:922-938
        sel = sscls(
            text="<html><body><ul><li>1</li><li>2</li><li>3</li></ul></body></html>"
        )
        with pytest.raises(CannotRemoveElementWithoutParent):
            sel.drop()
        with pytest.raises(CannotRemoveElementWithoutParent):
            sel.css("html").drop()
        sel.css("body").drop()
        assert sel.get() == "<html></html>"

    def test_drop_keeps_tail_html(self, sscls) -> None:
        # ref tests/test_selector.py:1204-1209
        sel = sscls(
            text="<html><body>Text before.<span>Text in.</span> Text after.</body></html>"
        )
        sel.css("span").drop()
        assert sel.get() == "<html><body>Text before. Text after.</body></html>"

    def test_drop_removes_tail_xml(self, sscls) -> None:
        # ref tests/test_selector.py:1211-1216
        sel = sscls(text="<a><b></b><c/></a>", type="xml")
        el = sel.xpath("//b")[0]
        assert el.root.getparent() is not None
        el.drop()
        assert sel.get() == "<a><c/></a>"


class TestJsonType:
    def test_json_types(self, sscls) -> None:
        # ref tests/test_selector_jmespath.py:148-169, tests/test_selector.py:1015-1078
        for text, root in (
            ("{}", {}),
            ('{"a": "b"}', {"a": "b"}),
            ("[]", []),
            ('["a"]', ["a"]),
            ('""', ""),
            ("0", 0),
            ("1", 1),
            ("true", True),
            ("false", False),
            ("null", None),
        ):
            selector = Selector(text=text, root=_NOT_SET)
            assert selector.type == "json"
            assert selector._text == text
            assert selector.root == root
            selector = Selector(text=None, root=root)
            assert selector.type == "json"
            assert selector.root == root

    def test_default_and_explicit_types(self, sscls) -> None:
        assert sscls(text="foo").type == "html"
        sel = Selector("1", type="json")
        assert sel.root == 1 and sel.type == "json"
        sel = Selector("<html/>", type="json")
        assert sel.root is None and sel.type == "json"
        obj = 1
        sel = Selector(root=obj)
        assert sel.root == obj and sel.type == "json"

    def test_json_query_guards(self, sscls) -> None:
        # ref tests/test_selector.py:1038-1052
        selector = Selector(root=1)
        with pytest.raises(
            ValueError, match="Cannot use xpath on a Selector of type 'json'"
        ):
            selector.xpath("//*")
        with pytest.raises(
            ValueError, match="Cannot use css on a Selector of type 'json'"
        ):
            selector.css("*")

    def test_html_root_node(self) -> None:
        # ref tests/test_selector.py:1026-1030, 1065-1070
        root = Selector(text="<html/>").root
        selector = Selector(root=root)
        assert selector.type == "html"
        with pytest.raises(ValueError, match="object as root"):
            Selector(root=root, type="text")
        with pytest.raises(ValueError, match="object as root"):
            Selector(root=root, type="json")

    def test_text_and_root_warning(self) -> None:
        # ref tests/test_selector.py:1060-1063
        import warnings

        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            Selector(text="a", root="b")
            assert "both text and root" in str(w[0].message)

    def test_json_selector_representation(self) -> None:
        # ref tests/test_selector.py:1072-1078
        selector = Selector(text="true")
        assert repr(selector) == "<Selector query=None data='True'>"
        assert str(selector) == "True"
        selector = Selector(text="1")
        assert repr(selector) == "<Selector query=None data='1'>"
        assert str(selector) == "1"

    def test_body_bytearray_support(self) -> None:
        # ref tests/test_selector.py:1080-1082
        selector = Selector(body=bytearray("<h1>Hello World</h1>", "utf-8"))
        assert selector.xpath("//h1/text()").get() == "Hello World"

    def test_remove_namespace_and_attrib_json(self, sscls) -> None:
        # ref tests/test_selector.py:1084-1090
        sel = sscls(text='{"key": "value"}', type="json")
        sel.remove_namespaces()
        assert sel.attrib == {}


class TestExslt:
    def test_regexp(self, sscls) -> None:
        # ref tests/test_selector.py:1096-1143
        body = """
        <p><input name='a' value='1'/><input name='b' value='2'/></p>
        <div class="links">
        <a href="/first.html">first link</a>
        <a href="/second.html">second link</a>
        <a href="http://www.bayes.co.uk/xml/index.xml?/xml/utils/rechecker.xml">EXSLT match example</a>
        </div>
        """
        sel = sscls(text=body)
        assert sel.xpath('//input[re:test(@name, "[A-Z]+", "i")]').extract() == [
            x.extract() for x in sel.xpath('//input[re:test(@name, "[A-Z]+", "i")]')
        ]
        assert [
            x.extract() for x in sel.xpath(r'//a[re:test(@href, "\.html$")]/text()')
        ] == ["first link", "second link"]
        assert [
            x.extract() for x in sel.xpath('//a[re:test(@href, "first")]/text()')
        ] == ["first link"]
        assert [
            x.extract() for x in sel.xpath('//a[re:test(@href, "second")]/text()')
        ] == ["second link"]
        assert sel.xpath(
            r're:match(//a[re:test(@href, "\.xml$")]/@href,'
            r'"(\w+):\/\/([^/:]+)(:\d*)?([^# ]*)")/text()'
        ).extract() == [
            "http://www.bayes.co.uk/xml/index.xml?/xml/utils/rechecker.xml",
            "http",
            "www.bayes.co.uk",
            "",
            "/xml/index.xml?/xml/utils/rechecker.xml",
        ]
        assert sel.xpath(
            r're:replace(//a[re:test(@href, "\.xml$")]/@href,'
            r'"(\w+)://(.+)(\.xml)", "","https://\2.html")'
        ).extract() == [
            "https://www.bayes.co.uk/xml/index.xml?/xml/utils/rechecker.html"
        ]

    def test_set_difference(self, sscls) -> None:
        # ref tests/test_selector.py:1145-1202
        body = """
        <div itemscope itemtype="http://schema.org/Event">
          <a itemprop="url" href="nba-miami-philidelphia-game3.html">
          NBA Eastern Conference First Round Playoff Tickets:
          <span itemprop="name"> Miami Heat at Philadelphia 76ers - Game 3 (Home Game 1) </span>
          </a>

          <meta itemprop="startDate" content="2016-04-21T20:00">
            Thu, 04/21/16
            8:00 p.m.

          <div itemprop="location" itemscope itemtype="http://schema.org/Place">
            <a itemprop="url" href="wells-fargo-center.html">
            Wells Fargo Center
            </a>
            <div itemprop="address" itemscope itemtype="http://schema.org/PostalAddress">
              <span itemprop="addressLocality">Philadelphia</span>,
              <span itemprop="addressRegion">PA</span>
            </div>
          </div>

          <div itemprop="offers" itemscope itemtype="http://schema.org/AggregateOffer">
            Priced from: <span itemprop="lowPrice">$35</span>
            <span itemprop="offerCount">1938</span> tickets left
          </div>
        </div>
        """
        sel = sscls(text=body)
        assert sel.xpath(
            '//div[@itemtype="http://schema.org/Event"]//@itemprop'
        ).extract() == [
            "url",
            "name",
            "startDate",
            "location",
            "url",
            "address",
            "addressLocality",
            "addressRegion",
            "offers",
            "lowPrice",
            "offerCount",
        ]
        assert sel.xpath("""set:difference(
            //div[@itemtype="http://schema.org/Event"]//@itemprop,
            //div[@itemtype="http://schema.org/Event"]//*[@itemscope]/*/@itemprop
            )""").extract() == ["url", "name", "startDate", "location", "offers"]


class TestTableCellRecovery:
    """Unclosed-cell recovery must match libxml2: a td/th/tr start tag
    implicitly closes an open td/th (round-1 advice bug: boundary
    checking vetoed the pop, nesting '<td>a<td>b')."""

    def test_sibling_cells_from_unclosed_td(self) -> None:
        from parsel_spark.selector import Selector

        sel = Selector(text="<table><tr><td>a<td>b<td>c</tr></table>")
        assert sel.css("td::text").getall() == ["a", "b", "c"]
        # cells are siblings: no td has a td descendant
        assert sel.xpath("//td[.//td]") == []

    def test_tr_closes_open_cell(self) -> None:
        from parsel_spark.selector import Selector

        sel = Selector(text="<table><tr><td>a<tr><td>b</table>")
        assert sel.xpath("//tr[td]").xpath("string(.)").getall() == ["a", "b"]
        assert sel.xpath("//tr[.//tr]") == []

    def test_th_and_td_mix(self) -> None:
        from parsel_spark.selector import Selector

        sel = Selector(text="<table><tr><th>h1<th>h2<td>v</tr></table>")
        assert sel.css("th::text").getall() == ["h1", "h2"]
        assert sel.css("td::text").getall() == ["v"]

    def test_nested_table_still_bounded(self) -> None:
        from parsel_spark.selector import Selector

        # the inner <table> bounds implicit closing: the outer td stays
        # open around the whole inner table
        sel = Selector(
            text="<table><tr><td>o<table><tr><td>i1<td>i2</table></td></tr></table>"
        )
        inner = sel.xpath("//td[table]")
        assert len(inner) == 1
        assert sel.xpath("//table//table//td/text()").getall() == ["i1", "i2"]
