"""Tolerant HTML parser producing the engine DOM.

From-scratch equivalent of the recovering libxml2 HTML parse the
reference relies on (parsel/selector.py:90-119, ``recover=True``): never
raises on bad markup, implies ``<html>``/``<head>``/``<body>``, auto-closes
``<p>``/``<li>``-style elements, treats void elements as childless and
keeps all whitespace inside the body (golden: tests/test_selector.py:428-430).

Built on the stdlib ``html.parser`` tokenizer (entity decoding, script/
style CDATA modes) with our own tree construction on top.
"""

from __future__ import annotations

import re
from html import unescape
from html.parser import HTMLParser

from .dom import Comment, Document, Element, TextNode

# -- tokenizer fast paths ---------------------------------------------------
# One compiled match for the overwhelmingly common WELL-FORMED start tag,
# replacing the stdlib's whole-tag scan + tag match + per-attribute match
# loop (3+N regex operations per tag).  The grammar here is STRICTLY
# NARROWER than html.parser's tolerant one — conservative name charsets,
# plain-whitespace separators, a single '=' with no surrounding spaces,
# values fully quoted or bare without [>"'=`] — so any input the fast
# pattern matches is parsed to the SAME (tag, attrs, end) the stdlib
# path produces (each fast character class is a subset of the stdlib
# class in the same position, and the chunk boundaries coincide); every
# other input falls back to ``HTMLParser.parse_starttag`` unchanged.
#  NOTE the separator class is the ASCII [ \t\n\r\f], NOT ``\s``: the
#  stdlib's tag-name class only excludes those five characters, so a
#  \v or unicode space would join the stdlib's tag name — inputs
#  containing them must fall back, not fast-parse.  The bare-value
#  class keeps the full ``\s`` exclusion (a superset exclusion only
#  narrows the fast grammar, which is always safe).
_FAST_START = re.compile(
    r"([a-zA-Z][a-zA-Z0-9.:_-]*)"
    r"((?:[ \t\n\r\f]+[a-zA-Z_:][a-zA-Z0-9.:_-]*"
    r"(?:=(?:'[^']*'|\"[^\"]*\"|[^\s>\"'=`]+))?)*)"
    r"[ \t\n\r\f]*(/?)>"
)
_FAST_ATTR = re.compile(
    r"[ \t\n\r\f]+([a-zA-Z_:][a-zA-Z0-9.:_-]*)"
    r"(?:=(?:'([^']*)'|\"([^\"]*)\"|([^\s>\"'=`]+)))?"
)
#: same pattern as the stdlib's ``endtagfind`` (anchored use only).
_FAST_ENDTAG = re.compile(r"</\s*([a-zA-Z][-.a-zA-Z0-9:_]*)\s*>")

#: ``set_cdata_mode`` compiles its raw-text-mode pattern on EVERY
#: <script>/<style> open (one ``re.compile`` cache probe per element).
#: The two possible patterns are fixed per interpreter, so capture them
#: once — by RUNNING the stdlib's own ``set_cdata_mode`` on a probe
#: parser rather than hardcoding its current regex, so a stdlib whose
#: pattern differs (e.g. a security-patched html.parser) is mirrored
#: exactly instead of pinned to this version's behavior.
def _stdlib_cdata_interesting(elem: str) -> re.Pattern:
    probe = HTMLParser()
    HTMLParser.set_cdata_mode(probe, elem)
    return probe.interesting


_CDATA_INTERESTING = {
    elem: _stdlib_cdata_interesting(elem)
    for elem in HTMLParser.CDATA_CONTENT_ELEMENTS
}

VOID_ELEMENTS = frozenset(
    """area base basefont br col embed frame hr img input isindex keygen
    link meta param source track wbr""".split()
)

RAW_TEXT_ELEMENTS = frozenset({"script", "style"})

HEAD_ELEMENTS = frozenset({"title", "base", "link", "meta", "style", "script", "isindex"})

# start tag -> set of open elements it implicitly closes (innermost-first).
_P_CLOSERS = frozenset(
    """address article aside blockquote center dir div dl fieldset? figure
    footer form h1 h2 h3 h4 h5 h6 header hr listing main menu nav ol p pre
    section table ul xmp""".replace("fieldset?", "").split()
)

AUTO_CLOSE: dict[str, frozenset[str]] = {}
for _t in _P_CLOSERS:
    AUTO_CLOSE.setdefault(_t, frozenset({"p"}))
AUTO_CLOSE["li"] = frozenset({"li", "p"})
AUTO_CLOSE["dt"] = frozenset({"dt", "dd", "p"})
AUTO_CLOSE["dd"] = frozenset({"dt", "dd", "p"})
AUTO_CLOSE["option"] = frozenset({"option"})
AUTO_CLOSE["optgroup"] = frozenset({"option", "optgroup"})
AUTO_CLOSE["tr"] = frozenset({"tr", "td", "th"})
AUTO_CLOSE["td"] = frozenset({"td", "th"})
AUTO_CLOSE["th"] = frozenset({"td", "th"})
AUTO_CLOSE["thead"] = frozenset({"tr", "td", "th", "tbody", "tfoot"})
AUTO_CLOSE["tbody"] = frozenset({"tr", "td", "th", "thead", "tfoot"})
AUTO_CLOSE["tfoot"] = frozenset({"tr", "td", "th", "thead", "tbody"})
AUTO_CLOSE["a"] = frozenset({"a"})
AUTO_CLOSE["hr"] = frozenset({"p"})

# Elements whose implicit closing must not punch through these containers.
# NOTE: implicit-close popping (handle_starttag) stops at the first
# stack top NOT in the new tag's closer set — <table> etc. bound the
# search naturally, so no separate boundary set is needed (a boundary
# set that vetoed pops kept td/th from ever closing: '<td>a<td>b'
# nested instead of forming sibling cells, diverging from libxml2).


class _TreeBuilder(HTMLParser):
    def __init__(self, max_depth: int | None = None) -> None:
        super().__init__(convert_charrefs=True)
        self.document = Document()
        self.html: Element | None = None
        self.head: Element | None = None
        self.body: Element | None = None
        self.body_closed = False
        self.html_closed = False
        self.stack: list[Element] = []
        # libxml2-parity depth limit (huge_tree=False): once
        # exceeded, parsing ABORTS — the rest of the input is
        # dropped, like libxml2's recovery after its depth error
        self.max_depth = max_depth
        self.depth_limited = False

    def updatepos(self, i: int, j: int) -> int:
        """Skip the base tokenizer's line/column bookkeeping: it scans
        every consumed chunk for newlines purely to serve ``getpos()``,
        which this tree builder never calls — the DOM carries its own
        document-order positions (measured ~5% of the parse)."""
        return j

    # -- tokenizer fast paths (see module-level pattern notes) -----------
    def parse_starttag(self, i: int) -> int:
        """Common-shape start tags in ONE compiled match; anything the
        narrow grammar rejects falls back to the stdlib tolerant path,
        so results are identical by construction (pinned against the
        stdlib parser on every tag of the fuzz + parity corpora)."""
        m = _FAST_START.match(self.rawdata, i + 1)
        if m is None:
            return super().parse_starttag(i)
        tag, raw_attrs, slash = m.group(1, 2, 3)
        self.lasttag = tag = tag.lower()
        attrs: list[tuple[str, str | None]] = []
        if raw_attrs:
            for am in _FAST_ATTR.finditer(raw_attrs):
                name, v1, v2, v3 = am.group(1, 2, 3, 4)
                value = v1 if v1 is not None else v2 if v2 is not None else v3
                # mirror the stdlib exactly: missing value -> None,
                # empty quoted value -> '', entity refs unescaped only
                # in non-empty values
                if value:
                    value = unescape(value)
                attrs.append((name.lower(), value))
        if slash:
            # XHTML-style empty tag: <span attr="value" />
            self.handle_startendtag(tag, attrs)
        else:
            self.handle_starttag(tag, attrs)
            if tag in self.CDATA_CONTENT_ELEMENTS:
                self.set_cdata_mode(tag)
        return m.end()

    def parse_endtag(self, i: int) -> int:
        """Well-formed ``</tag>`` in one anchored match (the stdlib
        additionally searches for the next ``>`` first); bogus shapes
        fall back.  Mirrors the stdlib's CDATA handling: inside
        <script>/<style> a non-matching end tag is literal text, the
        matching one also clears raw-text mode."""
        m = _FAST_ENDTAG.match(self.rawdata, i)
        if m is None:
            return super().parse_endtag(i)
        elem = m.group(1).lower()
        if self.cdata_elem is not None and elem != self.cdata_elem:
            self.handle_data(m.group(0))
            return m.end()
        self.handle_endtag(elem)
        self.clear_cdata_mode()
        return m.end()

    def set_cdata_mode(self, elem: str) -> None:
        pattern = _CDATA_INTERESTING.get(elem.lower())
        if pattern is None:  # pragma: no cover - fixed stdlib tag set
            super().set_cdata_mode(elem)
            return
        self.cdata_elem = elem.lower()
        self.interesting = pattern

    # -- insertion helpers -----------------------------------------------
    def _ensure_html(self) -> Element:
        if self.html is None:
            self.html = Element("html")
            self.document.append(self.html)
            self.stack = [self.html]
        return self.html

    def _ensure_head(self) -> Element:
        self._ensure_html()
        if self.head is None:
            self.head = Element("head")
            assert self.html is not None
            self.html.append(self.head)
        return self.head

    def _ensure_body(self) -> Element:
        self._ensure_html()
        if self.body is None:
            self.body = Element("body")
            assert self.html is not None
            self.html.append(self.body)
            self.stack = [self.html, self.body]
        elif self.body_closed:
            self.body_closed = False
            self.stack = [self.html, self.body]  # type: ignore[list-item]
        return self.body

    def _insertion_point(self) -> Element:
        if self.stack:
            return self.stack[-1]
        return self._ensure_html()

    def _in_body(self) -> bool:
        return self.body is not None and not self.body_closed and any(
            el is self.body for el in self.stack
        )

    def _append_text(self, data: str) -> None:
        parent = self._insertion_point()
        children = parent.children
        if children and isinstance(children[-1], TextNode):
            children[-1].data += data
        else:
            parent.append(TextNode(data))

    # -- token handlers ----------------------------------------------------
    def handle_starttag(self, tag: str, attrs: list[tuple[str, str | None]]) -> None:
        if self.depth_limited:
            return
        if self.max_depth is not None and len(self.stack) >= self.max_depth:
            self.depth_limited = True
            return
        if tag == "html":
            if self.html is None:
                self._ensure_html()
                for name, value in attrs:
                    self.html.attrib.setdefault(name, value if value is not None else "")  # type: ignore[union-attr]
            elif self.html_closed:
                # multi-root recovery (libxml2 parity, reference
                # docs/usage.rst "multi-root documents"): a new <html>
                # AFTER the first one closed becomes a sibling document
                # root; subsequent content builds inside it
                new_root = Element("html")
                for name, value in attrs:
                    new_root.attrib.setdefault(
                        name, value if value is not None else ""
                    )
                self.document.append(new_root)
                self.html = new_root
                self.head = None
                self.body = None
                self.body_closed = False
                self.html_closed = False
                self.stack = [new_root]
            return
        if tag == "head":
            if self.head is None:
                head = self._ensure_head()
                for name, value in attrs:
                    head.attrib.setdefault(name, value if value is not None else "")
                self.stack = [self.html, head]  # type: ignore[list-item]
            return
        if tag == "body":
            if self.body is None:
                body = self._ensure_body()
                for name, value in attrs:
                    body.attrib.setdefault(name, value if value is not None else "")
            else:
                self._ensure_body()
            return

        # route head-only elements into an implied <head> before the body
        if self.body is None and tag in HEAD_ELEMENTS:
            head = self._ensure_head()
            if not self.stack or self.stack[-1] is self.html:
                self.stack = [self.html, head]  # type: ignore[list-item]
        elif self.body is None or not self.stack or self.stack[-1] in (self.html, self.head):
            self._ensure_body()

        closers = AUTO_CLOSE.get(tag)
        if closers:
            # pop every implicitly-closed element at the top of the stack;
            # the loop stops at the first non-closer (which includes every
            # scope boundary like <table>), so boundaries LIMIT the search
            # without vetoing pops — td/th must be poppable by a following
            # td/th/tr even though they bound paragraph-style auto-closing
            while self.stack and self.stack[-1].tag in closers:
                if self.stack[-1] in (self.html, self.head, self.body):
                    break
                self.stack.pop()

        attrib: dict[str, str] = {}
        for name, value in attrs:
            if name not in attrib:
                attrib[name] = value if value is not None else ""
        element = Element(tag, attrib)
        self._insertion_point().append(element)
        if tag not in VOID_ELEMENTS:
            self.stack.append(element)

    def handle_endtag(self, tag: str) -> None:
        if self.depth_limited:
            return
        if tag == "html":
            self.html_closed = True
            return
        if tag == "body":
            if self.body is not None:
                self.body_closed = True
                self.stack = [self.html]  # type: ignore[list-item]
            return
        if tag == "head":
            if self.head is not None and self.stack and self.stack[-1] is not self.body:
                self.stack = [self.html]  # type: ignore[list-item]
            return
        if tag in VOID_ELEMENTS:
            return
        for i in range(len(self.stack) - 1, -1, -1):
            el = self.stack[i]
            if el.tag == tag:
                del self.stack[i:]
                return
            if el.tag in ("html", "body", "head"):
                return
        # unmatched end tag: ignored (recovery)

    def handle_data(self, data: str) -> None:
        if self.depth_limited:
            return
        if not data:
            return
        point = self.stack[-1] if self.stack else None
        if point is None or point is self.html or (
            self.head is not None and point is self.head and data.strip() == ""
        ):
            if data.strip() == "":
                return
            # bare text at document level: implied <body><p> (libxml2 style)
            self._ensure_body()
            if self.stack and self.stack[-1] is self.body:
                p = Element("p")
                self.body.append(p)  # type: ignore[union-attr]
                self.stack.append(p)
            self._append_text(data)
            return
        if point is self.head:
            if data.strip() == "":
                return
            self._ensure_body()
            self._append_text(data)
            return
        self._append_text(data)

    def handle_comment(self, data: str) -> None:
        if self.depth_limited:
            return
        parent = self.stack[-1] if self.stack else self._ensure_html()
        parent.append(Comment(data))

    def handle_decl(self, decl: str) -> None:  # <!DOCTYPE ...>
        if self.depth_limited:
            return
        return

    def unknown_decl(self, data: str) -> None:
        if self.depth_limited:
            return
        return

    def handle_pi(self, data: str) -> None:
        if self.depth_limited:
            return
        return


def parse_html(
    text: str, base_url: str | None = None, max_depth: int | None = None
) -> Document:
    """Parse ``text`` into a Document; never raises on bad markup.
    ``max_depth`` (huge_tree=False parity): abort at the libxml2 depth
    limit — content past the offending tag is dropped, like libxml2's
    recovery after its depth error."""
    text = text.replace("\x00", "")
    builder = _TreeBuilder(max_depth=max_depth)
    if text.strip():
        try:
            builder.feed(text)
            builder.close()
        except Exception:
            # recovery guarantee: whatever was built so far is the result
            pass
    builder._ensure_html()
    doc = builder.document
    doc.depth_limited = builder.depth_limited
    doc.base = base_url
    root = doc.root_element
    if root is not None:
        root.base = base_url
    return doc
