"""Doctest-parity layer: execute the reference documentation's example
corpus (reference docs/usage.rst, read at test time — nothing copied)
against THIS selector engine via a ``parsel``-shaped module shim.

Mirrors the reference's sybil setup (reference docs/conftest.py):
``.. skip: start/end`` regions are honored (they fence live-HTTP
examples), ``.. invisible-code-block: python`` blocks execute (they
(re)bind ``selector``/``sel`` via ``load_selector`` over the fixture
documents in reference docs/_static/), and every doctest example runs
in ONE shared namespace in document order with ELLIPSIS +
NORMALIZE_WHITESPACE — exactly how the reference runs its own docs.

The usage examples pin behaviors the unit suites under-cover — notably
node-set→string coercion (``string(//a[1]//text())`` is the FIRST
node's text; ``contains(.//text(), ...)`` vs ``contains(., ...)``),
``//node[1]`` vs ``(//node)[1]``, multi-root documents, and the
namespaced-XML workflows over python-insider.xml.
"""

from __future__ import annotations

import doctest
import re
import sys
import types
from pathlib import Path

import pytest

DOCS = Path("/root/reference/docs")
USAGE_RST = DOCS / "usage.rst"

_SKIP_START = re.compile(r"^\.\. skip: start\s*$")
_SKIP_END = re.compile(r"^\.\. skip: end\s*$")
_INVISIBLE = re.compile(r"^\.\. invisible-code-block: python\s*$")


def _install_parsel_shim(monkeypatch) -> None:
    from parsel_spark.selector import Selector, SelectorList
    from parsel_spark.selector.css import css2xpath
    from parsel_spark.selector.xpath.functions import set_xpathfunc

    shim = types.ModuleType("parsel")
    shim.Selector = Selector
    shim.SelectorList = SelectorList
    shim.css2xpath = css2xpath
    shim.set_xpathfunc = set_xpathfunc
    monkeypatch.setitem(sys.modules, "parsel", shim)


def _load_selector(filename, **kwargs):
    from parsel_spark.selector import Selector

    text = (DOCS / "_static" / filename).read_text(encoding="utf-8")
    return Selector(text=text, **kwargs)


def _parse_document():
    """(events) = ordered list of ('exec', lineno, source) for invisible
    code blocks and ('example', doctest.Example) for live examples."""
    text = USAGE_RST.read_text(encoding="utf-8")
    lines = text.splitlines()

    # skip-fenced line ranges (1-based, inclusive)
    skip_ranges: list[tuple[int, int]] = []
    start = None
    for i, line in enumerate(lines, start=1):
        if _SKIP_START.match(line):
            start = i
        elif _SKIP_END.match(line) and start is not None:
            skip_ranges.append((start, i))
            start = None

    def skipped(lineno: int) -> bool:
        return any(a <= lineno <= b for a, b in skip_ranges)

    # invisible code blocks: indented block following the directive
    exec_events = []
    for i, line in enumerate(lines, start=1):
        if not _INVISIBLE.match(line):
            continue
        body: list[str] = []
        j = i  # directive line index (0-based j == i)
        while j < len(lines):
            nxt = lines[j]
            if nxt.strip() == "" and not body:
                j += 1
                continue
            if nxt.startswith((" ", "\t")) or nxt.strip() == "":
                body.append(nxt)
                j += 1
                if nxt.strip() == "" and j < len(lines) and not lines[j].startswith((" ", "\t")) and lines[j].strip():
                    break
            else:
                break
        source = "\n".join(body)
        exec_events.append(("exec", i, source))

    examples = doctest.DocTestParser().get_examples(text)
    events = exec_events + [
        ("example", ex.lineno + 1, ex)
        for ex in examples
        if not skipped(ex.lineno + 1)
    ]
    events.sort(key=lambda e: e[1])
    return events


def test_usage_rst_doctest_corpus(monkeypatch) -> None:
    import textwrap

    _install_parsel_shim(monkeypatch)
    events = _parse_document()
    assert sum(1 for e in events if e[0] == "example") > 80

    globs: dict = {"load_selector": _load_selector}
    flags = doctest.ELLIPSIS | doctest.NORMALIZE_WHITESPACE
    checker = doctest.OutputChecker()
    failures: list[str] = []

    for kind, lineno, payload in events:
        if kind == "exec":
            exec(textwrap.dedent(payload), globs)  # noqa: S102
            continue
        example: doctest.Example = payload
        try:
            compiled = compile(
                example.source, f"usage.rst:L{lineno}", "single"
            )
            import contextlib
            import io

            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                exec(compiled, globs)  # noqa: S102
            got = buf.getvalue()
        except Exception as exc:  # noqa: BLE001
            failures.append(
                f"L{lineno}: {example.source.strip()}\n  raised: {exc!r}"
            )
            continue
        if example.want and not checker.check_output(
            example.want, got, flags
        ):
            failures.append(
                f"L{lineno}: {example.source.strip()}\n"
                f"  expected: {example.want.strip()!r}\n"
                f"  got: {got.strip()!r}"
            )

    assert not failures, (
        f"{len(failures)} usage.rst example(s) diverge:\n" + "\n".join(failures)
    )
