"""XML attack robustness (entity non-expansion).

Derives from /root/reference/tests/test_xml_attacks.py:20-29: parsing a
billion-laughs document must not expand entities (O(1) memory) and the
entity references must stay literal.
"""

from __future__ import annotations

import resource

from parsel_spark import Selector

_BILLION_LAUGHS = (
    '<?xml version="1.0"?>\n'
    "<!DOCTYPE lolz [\n"
    ' <!ENTITY lol "lol">\n'
    " <!ELEMENT lolz (#PCDATA)>\n"
    + "".join(
        f' <!ENTITY lol{i} "'
        + "&lol{};".format(i - 1 if i > 1 else "") * 10
        + '">\n'
        for i in range(1, 10)
    )
    + "]>\n<lolz>&lol9;</lolz>"
)


def test_billion_laughs_no_expansion() -> None:
    usage_before = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    sel = Selector(text=_BILLION_LAUGHS, type="xml")
    out = sel.extract()
    assert out == "<lolz>&lol9;</lolz>"
    usage_after = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    # memory growth stays bounded (reference asserts the same, ~1 MiB)
    assert usage_after - usage_before < 2 * 1024  # KiB on Linux


def test_xxe_literal() -> None:
    malicious = (
        '<?xml version="1.0" encoding="ISO-8859-1"?>'
        "<!DOCTYPE foo [ <!ELEMENT foo ANY > <!ENTITY xxe SYSTEM "
        '"file:///etc/passwd" >]><foo>&xxe;</foo>'
    )
    sel = Selector(text=malicious, type="xml")
    assert sel.extract() == "<foo>&xxe;</foo>"
    assert "/etc/passwd" not in sel.extract()
