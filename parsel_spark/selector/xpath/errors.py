"""XPath error types.

The Selector layer catches :class:`XPathError` and re-raises it as
``ValueError(f"XPath error: {exc} in {query}")`` exactly like the
reference does with ``etree.XPathError`` (parsel/selector.py:608-609).
Message texts mirror libxml2's so the reference suite's ``pytest.raises``
match patterns hold (tests/test_selector.py:126,520, tests/test_xpathfuncs.py:100).
"""

from __future__ import annotations


class XPathError(Exception):
    """Base class for all XPath compile/runtime errors."""


class XPathSyntaxError(XPathError):
    """Raised for unparsable expressions ("Invalid expression" /
    "Invalid predicate")."""


class XPathEvalError(XPathError):
    """Raised for runtime failures (unknown function, undefined prefix)."""
