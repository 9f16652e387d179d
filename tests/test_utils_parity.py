"""Utility-function parity (shorten, extract_regex, flatten).

Parametrized cases derive from /root/reference/tests/test_utils.py and
the doctest examples in /root/reference/parsel/utils.py:12-41.
"""

from __future__ import annotations

import pytest

from parsel_spark.selector import extract_regex, flatten, iflatten, shorten


@pytest.mark.parametrize(
    ("text", "width", "suffix", "expected"),
    [
        ("foobar", -1, "...", ValueError),
        ("foobar", 0, "...", ""),
        ("foobar", 1, "...", "."),
        ("foobar", 2, "...", ".."),
        ("foobar", 3, "...", "..."),
        ("foobar", 4, "...", "f..."),
        ("foobar", 5, "...", "fo..."),
        ("foobar", 6, "...", "foobar"),
        ("foobar", 7, "...", "foobar"),
        ("hello", 3, "…", "he…"),
        ("hello", 4, "…", "hel…"),
        ("test", 2, "->", "->"),
        ("test", 3, "->", "t->"),
        ("test", 4, "->", "test"),
        ("", 0, "...", ""),
        ("", 3, "...", ""),
    ],
)
def test_shorten(text, width, suffix, expected) -> None:
    if isinstance(expected, str):
        assert shorten(text, width, suffix=suffix) == expected
    else:
        with pytest.raises(expected):
            shorten(text, width, suffix=suffix)


@pytest.mark.parametrize(
    ("regex", "text", "replace_entities", "expected"),
    [
        (
            r"(?P<month>\w+)\s*(?P<day>\d+)\s*\,?\s*(?P<year>\d+)",
            "October  25, 2019",
            True,
            ["October", "25", "2019"],
        ),
        (
            r"(?P<month>\w+)\s*(?P<day>\d+)\s*\,?\s*(?P<year>\d+)",
            "October  25 2019",
            True,
            ["October", "25", "2019"],
        ),
        (
            r"(?P<extract>\w+)\s*(?P<day>\d+)\s*\,?\s*(?P<year>\d+)",
            "October  25 2019",
            True,
            ["October"],
        ),
        (r"\w+\s*\d+\s*\,?\s*\d+", "October  25 2019", True, ["October  25 2019"]),
        (
            r"^.*$",
            "&quot;sometext&quot; &amp; &quot;moretext&quot;",
            True,
            ['"sometext" &amp; "moretext"'],
        ),
        (
            r"^.*$",
            "&quot;sometext&quot; &amp; &quot;moretext&quot;",
            False,
            ["&quot;sometext&quot; &amp; &quot;moretext&quot;"],
        ),
        (r"(?P<extract>\d+)", "no digits here", True, []),
    ],
)
def test_extract_regex(regex, text, replace_entities, expected) -> None:
    assert extract_regex(regex, text, replace_entities) == expected


def test_flatten() -> None:
    assert flatten([[[1, 2, 3], (42, None)], [4, 5], [6], 7, (8, 9, 10)]) == [
        1, 2, 3, 42, None, 4, 5, 6, 7, 8, 9, 10,
    ]
    assert flatten(["foo", "bar"]) == ["foo", "bar"]
    assert flatten(["foo", ["baz", 42], "bar"]) == ["foo", "baz", 42, "bar"]
    assert list(iflatten([[1, 2], (3, 4)])) == [1, 2, 3, 4]
    assert flatten([b"foo", [b"bar"]]) == [b"foo", b"bar"]
