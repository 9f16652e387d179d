"""XPath extension-function parity (has-class, registry).

Scenarios derive from /root/reference/tests/test_xpathfuncs.py.
"""

from __future__ import annotations

from typing import Any

import pytest

from parsel_spark import Selector, set_xpathfunc


def extract(sel, query):
    return [x.extract() for x in sel.xpath(query)]


def test_has_class_simple() -> None:
    # ref tests/test_xpathfuncs.py:11-27
    body = """
    <p class="foo bar-baz">First</p>
    <p class="foo">Second</p>
    <p class="bar">Third</p>
    <p>Fourth</p>
    """
    sel = Selector(text=body)
    assert extract(sel, '//p[has-class("foo")]/text()') == ["First", "Second"]
    assert extract(sel, '//p[has-class("bar")]/text()') == ["Third"]
    assert extract(sel, '//p[has-class("foo","bar")]/text()') == []
    assert extract(sel, '//p[has-class("foo","bar-baz")]/text()') == ["First"]


def test_has_class_error_no_args() -> None:
    # ref tests/test_xpathfuncs.py:30-36
    sel = Selector(text='<p CLASS="foo">First</p>')
    with pytest.raises(ValueError, match="has-class must have at least 1 argument"):
        sel.xpath("has-class()")


def test_has_class_error_invalid_arg_type() -> None:
    # ref tests/test_xpathfuncs.py:39-45
    sel = Selector(text='<p CLASS="foo">First</p>')
    with pytest.raises(ValueError, match="has-class arguments must be strings"):
        sel.xpath("has-class(.)")


def test_has_class_error_invalid_unicode() -> None:
    # ref tests/test_xpathfuncs.py:48-54 (bytes query with non-ASCII chars)
    sel = Selector(text='<p CLASS="foo">First</p>')
    with pytest.raises(ValueError, match="All strings must be XML compatible"):
        sel.xpath('has-class("héllö")'.encode())


@pytest.mark.parametrize(
    ("body", "cls"),
    [
        ('<p CLASS="fóó">First</p>', "fóó"),  # unicode, ref :57-62
        ('<p CLASS="foo">First</p>', "foo"),  # uppercase attr, ref :65-70
        ('<p CLASS="foo\nbar">First</p>', "foo"),  # newline ws, ref :73-79
        ('<p CLASS="foo\tbar">First</p>', "foo"),  # tab ws, ref :82-87
    ],
)
def test_has_class_whitespace_and_case(body: str, cls: str) -> None:
    sel = Selector(text=body)
    assert extract(sel, f'//p[has-class("{cls}")]/text()') == ["First"]


def test_set_xpathfunc_registry() -> None:
    # ref tests/test_xpathfuncs.py:90-109
    def myfunc(ctx: Any) -> None:
        myfunc.call_count += 1

    myfunc.call_count = 0

    sel = Selector(text='<p CLASS="foo">First</p>')
    with pytest.raises(ValueError, match=r"Unregistered function(: myfunc)? in myfunc"):
        sel.xpath("myfunc()")

    set_xpathfunc("myfunc", myfunc)
    sel.xpath("myfunc()")
    assert myfunc.call_count == 1

    set_xpathfunc("myfunc", None)
    with pytest.raises(ValueError, match=r"Unregistered function(: myfunc)? in myfunc"):
        sel.xpath("myfunc()")
