"""Recovering, XXE-safe XML parser producing the engine DOM.

From-scratch equivalent of the reference's ``SafeXMLParser``
(parsel/selector.py:60-63, ``resolve_entities=False`` + ``recover=True``):

* never resolves external or DTD-declared entities — ``&xxe;`` stays a
  literal entity reference (golden: tests/test_selector.py:843-852 and
  tests/test_xml_attacks.py), which also makes billion-laughs inputs O(1);
* recovers from unclosed elements by implicitly closing them when an
  ancestor's end tag arrives (golden: tests/test_selector.py:304-316);
* expands namespaced names to lxml-style ``{uri}local`` and records
  per-element declarations for the ``namespace::`` axis
  (tests/test_selector.py:745-793).
"""

from __future__ import annotations

import re

from .dom import (
    XML_NAMESPACE,
    Comment,
    Document,
    Element,
    EntityRef,
    ProcessingInstruction,
    TextNode,
)

_TOKEN_RE = re.compile(
    r"""
      <!--(?P<comment>.*?)-->
    | <!\[CDATA\[(?P<cdata>.*?)\]\]>
    | <!DOCTYPE(?P<doctype>[^\[>]*(\[[^\]]*\])?[^>]*)>
    | <\?(?P<pi>.*?)\?>
    | </\s*(?P<endtag>[^\s>]+)\s*>
    | <(?P<starttag>[^\s/>][^\s/>]*)(?P<attrs>(?:[^>"']|"[^"]*"|'[^']*')*?)(?P<selfclose>/?)>
    """,
    re.DOTALL | re.VERBOSE,
)

_ATTR_RE = re.compile(
    r"""([^\s=/]+)\s*(?:=\s*("[^"]*"|'[^']*'|[^\s>]*))?""",
)

_STD_ENTITIES = {"amp": "&", "lt": "<", "gt": ">", "quot": '"', "apos": "'"}

_ENTITY_RE = re.compile(r"&(#\d+|#[xX][0-9a-fA-F]+|[^\s;&]+);")


def _decode_attr_entities(value: str) -> str:
    def conv(match: re.Match[str]) -> str:
        body = match.group(1)
        if body.startswith("#"):
            try:
                code = int(body[2:], 16) if body[1] in "xX" else int(body[1:])
                return chr(code)
            except (ValueError, OverflowError):
                return match.group(0)
        return _STD_ENTITIES.get(body, match.group(0))

    return _ENTITY_RE.sub(conv, value)


def _split_name(name: str) -> tuple[str | None, str]:
    if ":" in name:
        prefix, local = name.split(":", 1)
        return prefix, local
    return None, name


class _XMLBuilder:
    def __init__(self, max_depth: int | None = None) -> None:
        self.document = Document()
        self.stack: list[Element] = []
        # libxml2-parity depth limit (huge_tree=False)
        self.max_depth = max_depth
        self.depth_limited = False
        self.scope_stack: list[dict[str | None, str]] = [{"xml": XML_NAMESPACE}]
        self.root_done = False

    def _parent(self) -> Element | Document:
        return self.stack[-1] if self.stack else self.document

    def _append_text_parts(self, raw: str) -> None:
        """Append text, preserving unknown entity refs as EntityRef nodes."""
        if not self.stack:
            return  # text outside the root element: dropped (recovery)
        parent = self.stack[-1]
        pos = 0
        for match in _ENTITY_RE.finditer(raw):
            before = raw[pos : match.start()]
            body = match.group(1)
            resolved: str | None
            if body.startswith("#"):
                try:
                    code = int(body[2:], 16) if body[1] in "xX" else int(body[1:])
                    resolved = chr(code)
                except (ValueError, OverflowError):
                    resolved = None
            else:
                resolved = _STD_ENTITIES.get(body)
            if resolved is not None:
                # decoded entities merge into the text flow
                self._push_text(parent, before + resolved)
            else:
                self._push_text(parent, before)
                parent.append(EntityRef(body))
            pos = match.end()
        self._push_text(parent, raw[pos:])

    @staticmethod
    def _push_text(parent: Element, data: str) -> None:
        if not data:
            return
        children = parent.children
        if children and isinstance(children[-1], TextNode):
            children[-1].data += data
        else:
            parent.append(TextNode(data))

    def start(self, name: str, attrs: list[tuple[str, str]], selfclose: bool) -> None:
        if self.depth_limited:
            return
        if self.max_depth is not None and len(self.stack) >= self.max_depth:
            self.depth_limited = True
            return
        if self.root_done and not self.stack:
            return  # extra content after the root element: dropped
        declarations: dict[str | None, str] = {}
        plain_attrs: list[tuple[str, str]] = []
        for aname, avalue in attrs:
            if aname == "xmlns":
                declarations[None] = avalue
            elif aname.startswith("xmlns:"):
                declarations[aname[6:]] = avalue
            else:
                plain_attrs.append((aname, avalue))
        scope = self.scope_stack[-1]
        if declarations:
            scope = dict(scope)
            scope.update(declarations)

        prefix, local = _split_name(name)
        uri = scope.get(prefix) if (prefix is not None or None in scope) else None
        if prefix is not None and prefix not in scope:
            tag = name  # unbound prefix: kept literal (recovery)
            prefix = None
        elif uri:
            tag = f"{{{uri}}}{local}"
        else:
            tag = local

        attrib: dict[str, str] = {}
        for aname, avalue in plain_attrs:
            aprefix, alocal = _split_name(aname)
            if aprefix is None:
                key = alocal
            elif aprefix == "xml":
                key = f"{{{XML_NAMESPACE}}}{alocal}"
            elif aprefix in scope:
                key = f"{{{scope[aprefix]}}}{alocal}"
            else:
                key = aname
            if key not in attrib:
                attrib[key] = avalue

        element = Element(tag, attrib, nsmap=declarations, prefix=prefix)
        self._parent().append(element)
        if not selfclose:
            self.stack.append(element)
            self.scope_stack.append(scope)
        elif not self.stack:
            self.root_done = True

    def end(self, name: str) -> None:
        for i in range(len(self.stack) - 1, -1, -1):
            el = self.stack[i]
            raw = el.qname() if el.prefix else el.local_name
            if raw == name or el.tag == name:
                del self.stack[i:]
                del self.scope_stack[i + 1 :]
                if not self.stack:
                    self.root_done = True
                return
        # libxml2-style recovery: a mismatched end tag still closes the
        # innermost open element (tests/test_selector.py:433-443 pins this:
        # "<somens:a>take this</a>" closes at "</a>")
        if self.stack:
            self.stack.pop()
            self.scope_stack.pop()
            if not self.stack:
                self.root_done = True

    def finish(self) -> Document:
        self.stack.clear()
        self.document.depth_limited = self.depth_limited
        return self.document


def parse_xml(
    text: str, base_url: str | None = None, max_depth: int | None = None
) -> Document:
    """Parse ``text`` into a Document; recovers from malformed markup.
    ``max_depth`` (huge_tree=False parity): abort at the libxml2 depth
    limit — the rest of the input is dropped."""
    text = text.replace("\x00", "")
    builder = _XMLBuilder(max_depth=max_depth)
    pos = 0
    for match in _TOKEN_RE.finditer(text):
        if builder.depth_limited:
            break
        if match.start() > pos:
            builder._append_text_parts(text[pos : match.start()])
        pos = match.end()
        kind = match.lastgroup
        if match.group("comment") is not None:
            parent = builder._parent()
            if isinstance(parent, Element) or not builder.root_done:
                parent.append(Comment(match.group("comment")))
        elif match.group("cdata") is not None:
            if builder.stack:
                builder._push_text(builder.stack[-1], match.group("cdata"))
        elif match.group("doctype") is not None:
            continue  # internal subset ignored; entities never resolved
        elif match.group("pi") is not None:
            body = match.group("pi")
            parts = body.split(None, 1)
            if parts and not parts[0].lower().startswith("xml"):
                target = parts[0]
                content = parts[1] if len(parts) > 1 else ""
                builder._parent().append(ProcessingInstruction(target, content))
        elif match.group("endtag") is not None:
            builder.end(match.group("endtag"))
        elif match.group("starttag") is not None:
            raw_attrs = match.group("attrs") or ""
            attrs: list[tuple[str, str]] = []
            for amatch in _ATTR_RE.finditer(raw_attrs):
                aname = amatch.group(1)
                avalue = amatch.group(2)
                if avalue is None:
                    avalue = ""
                elif avalue[:1] in "\"'":
                    avalue = avalue[1:-1]
                attrs.append((aname, _decode_attr_entities(avalue)))
            builder.start(
                match.group("starttag"), attrs, match.group("selfclose") == "/"
            )
    if pos < len(text) and not builder.depth_limited:
        # trailing text; when the depth limit aborted the loop the rest
        # of the input is DROPPED (libxml2-parity), not leaked as text
        builder._append_text_parts(text[pos:])
    doc = builder.finish()
    doc.base = base_url
    root = doc.root_element
    if root is not None:
        root.base = base_url
    return doc
