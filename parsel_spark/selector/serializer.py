"""HTML/XML serialization matching the reference's ``etree.tostring``
goldens (parsel/selector.py:699-721: ``method="html"|"xml"``,
``encoding="unicode"``, ``with_tail=False``).

Pinned behaviors:

* html: void elements unclosed (``<area shape="default" id="area-nohref">``,
  tests/test_selector_csstranslator.py:202-204); raw text inside
  ``<script>``/``<style>`` is not escaped (tests/test_selector.py:620-651);
* xml: childless elements self-close (``<c/>``,
  tests/test_selector.py:1211-1216); unresolved entity refs serialize
  literally (``<foo>&xxe;</foo>``, tests/test_selector.py:843-852).
"""

from __future__ import annotations

from .dom import (
    Comment,
    Document,
    Element,
    EntityRef,
    Node,
    ProcessingInstruction,
    TextNode,
)
from .htmlparser import RAW_TEXT_ELEMENTS, VOID_ELEMENTS


def _escape_text(text: str) -> str:
    if "&" in text:
        text = text.replace("&", "&amp;")
    if "<" in text:
        text = text.replace("<", "&lt;")
    if ">" in text:
        text = text.replace(">", "&gt;")
    return text


def _escape_attr(value: str) -> str:
    if "&" in value:
        value = value.replace("&", "&amp;")
    if "<" in value:
        value = value.replace("<", "&lt;")
    if ">" in value:
        value = value.replace(">", "&gt;")
    if '"' in value:
        value = value.replace('"', "&quot;")
    return value


def _attr_display_name(element_or_none: Element | None, name: str) -> str:
    """Map an expanded ``{uri}local`` attribute name back to ``prefix:local``."""
    if not name.startswith("{") or "}" not in name:
        return name
    uri, local = name[1:].split("}", 1)
    if element_or_none is not None:
        for prefix, nuri in element_or_none.in_scope_namespaces().items():
            if nuri == uri and prefix is not None:
                return f"{prefix}:{local}"
    return local


def _tag_display_name(el: Element) -> str:
    tag = el.tag
    if not tag.startswith("{") or "}" not in tag:
        return tag
    local = el.local_name
    if el.prefix:
        return f"{el.prefix}:{local}"
    return local


def _open_tag(
    el: Element,
    xml: bool,
    with_ns_decls: bool,
    extra_ns: dict[str | None, str] | None = None,
) -> str:
    parts = ["<", _tag_display_name(el)]
    if xml and with_ns_decls:
        # inherited (re-declared) namespaces first, default-ns leading;
        # the element's own declarations keep their source order
        inherited = sorted(
            (extra_ns or {}).items(),
            key=lambda kv: (kv[0] is not None, kv[0] or ""),
        )
        for prefix, uri in [*inherited, *el.nsmap.items()]:
            if prefix is None:
                parts.append(f' xmlns="{_escape_attr(uri)}"')
            else:
                parts.append(f' xmlns:{prefix}="{_escape_attr(uri)}"')
    for name, value in el.attrib.items():
        display = _attr_display_name(el if xml else None, name)
        parts.append(f' {display}="{_escape_attr(value)}"')
    return "".join(parts)


def _inherited_used_namespaces(root: Element) -> dict[str | None, str]:
    """Namespace declarations the serialized fragment needs but does not
    itself declare — lxml parity: ``etree.tostring`` on a subtree
    re-declares ancestor namespaces USED within the subtree on the
    fragment root (reference docs/usage.rst atom-feed examples show
    ``<link xmlns="http://www.w3.org/2005/Atom" ...`` for a subtree
    whose default namespace lives on the feed element)."""
    in_scope = root.in_scope_namespaces()
    inherited = {
        prefix: uri
        for prefix, uri in in_scope.items()
        if prefix not in root.nsmap
    }
    if not inherited:
        return {}
    used: set[str] = set()
    stack: list[Node] = [root]
    while stack:
        node = stack.pop()
        if not isinstance(node, Element):
            continue
        if node.tag.startswith("{"):
            used.add(node.tag[1:].split("}", 1)[0])
        for name in node.attrib:
            if name.startswith("{"):
                used.add(name[1:].split("}", 1)[0])
        stack.extend(node.children)
    return {p: u for p, u in inherited.items() if u in used}


def serialize(node: Node, method: str = "html") -> str:
    """Serialize ``node`` (without tail) using ``html`` or ``xml`` rules."""
    xml = method == "xml"
    out: list[str] = []
    # iterative serializer: (node, is_close_marker)
    stack: list[tuple[object, bool]] = [(node, False)]
    while stack:
        current, closing = stack.pop()
        if closing:
            assert isinstance(current, Element)
            out.append(f"</{_tag_display_name(current)}>")
            continue
        if isinstance(current, Document):
            for child in reversed(current.children):
                stack.append((child, False))
        elif isinstance(current, Element):
            extra_ns = None
            if xml and current is node:
                extra_ns = _inherited_used_namespaces(current)
            open_tag = _open_tag(current, xml, True, extra_ns)
            if xml:
                if not current.children:
                    out.append(open_tag + "/>")
                else:
                    out.append(open_tag + ">")
                    stack.append((current, True))
                    for child in reversed(current.children):
                        stack.append((child, False))
            else:
                out.append(open_tag + ">")
                if current.tag in VOID_ELEMENTS:
                    continue
                stack.append((current, True))
                if current.tag in RAW_TEXT_ELEMENTS:
                    for child in reversed(current.children):
                        if isinstance(child, TextNode):
                            stack.append((_Raw(child.data), False))
                else:
                    for child in reversed(current.children):
                        stack.append((child, False))
        elif isinstance(current, _Raw):
            out.append(current.data)
        elif isinstance(current, TextNode):
            out.append(_escape_text(current.data))
        elif isinstance(current, Comment):
            out.append(f"<!--{current.text}-->")
        elif isinstance(current, EntityRef):
            out.append(f"&{current.name};")
        elif isinstance(current, ProcessingInstruction):
            out.append(f"<?{current.target} {current.text}?>")
    return "".join(out)


class _Raw:
    __slots__ = ("data",)

    def __init__(self, data: str) -> None:
        self.data = data
