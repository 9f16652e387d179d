"""``Selector`` / ``SelectorList`` — the reference-compatible query API
over the from-scratch DOM + XPath engine.

Reimplements the observable semantics of the reference
(parsel/selector.py:380-812): content-based type inference (JSON sniff →
html/xml/text dispatch, parsel/selector.py:301-360), sticky vs ad-hoc
namespaces (tests/test_selector.py:502-587), scalar result wrapping
(``True``→"1", parsel/selector.py:715-720), tail-preserving html drops
vs tail-dropping xml drops (tests/test_selector.py:1204-1216), and the
error surface (``ValueError("XPath error: ... in <query>")``).
"""

from __future__ import annotations

import json
import re
import typing
import warnings
from typing import Any, Mapping, Pattern, SupportsIndex, TypeVar

from .css import translator_for
from .dom import AttributeNode, Comment, Document, Element, Node, TextNode
from .htmlparser import parse_html
from .serializer import serialize
from .utils import extract_regex, flatten, iflatten, shorten
from .xmlparser import parse_xml
from .xpath import DEFAULT_EXTENSIONS, XPathError
from .xpath.evaluator import evaluate

try:
    import jmespath as _jmespath
except ImportError:  # pragma: no cover - jmespath is available in-sandbox
    _jmespath = None

_SelectorType = TypeVar("_SelectorType", bound="Selector")

# our parser has no depth limit; flag kept for reference API parity
SUPPORTS_HUGE_TREE = True
LXML_SUPPORTS_HUGE_TREE = SUPPORTS_HUGE_TREE


class CannotRemoveElementWithoutRoot(Exception):
    pass


class CannotRemoveElementWithoutParent(Exception):
    pass


class CannotDropElementWithoutParent(CannotRemoveElementWithoutParent):
    pass


_NOT_SET = object()

#: every text ``json.loads`` can ACCEPT starts — after the four JSON
#: whitespace chars — with one of these (object, array, string, number,
#: true/false/null, plus the stdlib's NaN/Infinity/-Infinity extras).
_JSON_LEAD_CHARS = frozenset('{["-0123456789tfnNI')
_JSON_WS = " \t\n\r"


def _maybe_json_text(text: str) -> bool:
    """False only when ``json.loads(text)`` is GUARANTEED to raise.
    Skipping the doomed parse matters on the sniffing hot path: a
    failed ``json.loads`` constructs a ``JSONDecodeError`` whose
    position bookkeeping scans the input — paid once per sniffed HTML
    document and once per extracted attribute/text string before this
    guard (measured ~6% of the fused extract UDF)."""
    i, n = 0, len(text)
    while i < n and text[i] in _JSON_WS:
        i += 1
    return i < n and text[i] in _JSON_LEAD_CHARS


def _is_valid_json(text: Any) -> bool:
    if isinstance(text, str) and not _maybe_json_text(text):
        return False
    try:
        json.loads(text)
    except (TypeError, ValueError):
        return False
    return True


def _load_json_or_none(text: Any) -> Any:
    if isinstance(text, (str, bytes, bytearray)):
        if isinstance(text, str) and not _maybe_json_text(text):
            return None
        try:
            return json.loads(text)
        except ValueError:
            return None
    return None


def _xml_or_html(type_: str | None) -> str:
    return "xml" if type_ == "xml" else "html"


def create_root_node(
    text: str,
    type_: str = "html",
    base_url: str | None = None,
    huge_tree: bool = True,
    body: bytes = b"",
    encoding: str = "utf-8",
) -> Element:
    """Parse text/body into a root element; never raises on bad markup
    (reference: parsel/selector.py:90-119).

    ``huge_tree=False`` enforces the libxml2 256-node depth limit the
    reference inherits (parsel/selector.py:103-115 + the deep-nesting
    test, reference tests/test_selector.py:940-1009): parsing ABORTS at
    the offending tag (content after it is lost — libxml2's recovery
    behavior) and a warning mentioning ``huge_tree`` is emitted.  The
    default ``True`` lifts the limit, like lxml >= 4.2."""
    if not text:
        text = body.replace(b"\x00", b"").strip().decode(encoding, errors="replace")
    text = text.strip().replace("\x00", "") or "<html/>"
    max_depth = None if huge_tree else 256
    if type_ == "xml":
        document = parse_xml(text, base_url=base_url, max_depth=max_depth)
    else:
        document = parse_html(text, base_url=base_url, max_depth=max_depth)
    if getattr(document, "depth_limited", False):
        import warnings

        warnings.warn(
            "Input data exceeds the depth limit; parsed content was "
            "truncated. Pass huge_tree=True (the default) to lift the "
            "limit (huge_tree support).",
            stacklevel=2,
        )
    root = document.root_element
    if root is None:
        fallback = Element("html")
        fallback.base = base_url
        document.append(fallback)
        root = fallback
    return root


def _get_root_and_type_from_text(
    text: str, *, input_type: str | None, base_url: str | None, huge_tree: bool
) -> tuple[Any, str]:
    if input_type == "text":
        return text, "text"
    sniffed = False
    data = None
    if _maybe_json_text(text):  # guard: see _maybe_json_text
        try:
            data = json.loads(text)
            sniffed = True
        except ValueError:
            data, sniffed = None, False
    if sniffed:
        return data, "json"
    if input_type == "json":
        return None, "json"
    type_ = _xml_or_html(input_type)
    root = create_root_node(text, type_=type_, base_url=base_url, huge_tree=huge_tree)
    return root, type_


def _get_root_and_type_from_bytes(
    body: bytes,
    encoding: str,
    *,
    input_type: str | None,
    base_url: str | None,
    huge_tree: bool,
) -> tuple[Any, str]:
    if input_type == "text":
        return body.decode(encoding), "text"
    if encoding == "utf-8":
        try:
            data = json.loads(body)
            sniffed = True
        except ValueError:
            data, sniffed = None, False
        if sniffed:
            return data, "json"
    if input_type == "json":
        return None, "json"
    type_ = _xml_or_html(input_type)
    root = create_root_node(
        "", type_=type_, base_url=base_url, huge_tree=huge_tree,
        body=body, encoding=encoding,
    )
    return root, type_


def _get_root_type(root: Any, *, input_type: str | None) -> str:
    if isinstance(root, Node):
        if input_type in ("json", "text"):
            raise ValueError(
                f"Selector got a document Node object as root, "
                f"and {input_type!r} as type."
            )
        return _xml_or_html(input_type)
    if isinstance(root, (dict, list)) or _is_valid_json(root):
        return "json"
    return input_type or "json"


class SelectorList(list[_SelectorType]):
    """An ordered node-set with flattening query methods (reference:
    parsel/selector.py:122-291)."""

    @typing.overload
    def __getitem__(self, pos: SupportsIndex) -> _SelectorType: ...

    @typing.overload
    def __getitem__(self, pos: slice) -> "SelectorList[_SelectorType]": ...

    def __getitem__(self, pos):  # type: ignore[override]
        item = super().__getitem__(pos)
        if isinstance(pos, slice):
            return self.__class__(item)
        return item

    def __getstate__(self) -> None:
        raise TypeError("can't pickle SelectorList objects")

    def jmespath(self, query: str, **kwargs: Any) -> "SelectorList[_SelectorType]":
        return self.__class__(flatten([x.jmespath(query, **kwargs) for x in self]))

    def xpath(
        self,
        xpath: str,
        namespaces: Mapping[str, str] | None = None,
        **kwargs: Any,
    ) -> "SelectorList[_SelectorType]":
        return self.__class__(
            flatten([x.xpath(xpath, namespaces=namespaces, **kwargs) for x in self])
        )

    def css(self, query: str) -> "SelectorList[_SelectorType]":
        return self.__class__(flatten([x.css(query) for x in self]))

    def re(
        self, regex: str | Pattern[str], replace_entities: bool = True
    ) -> list[str]:
        return flatten([x.re(regex, replace_entities=replace_entities) for x in self])

    def re_first(
        self,
        regex: str | Pattern[str],
        default: str | None = None,
        replace_entities: bool = True,
    ) -> str | None:
        for result in iflatten(
            x.re(regex, replace_entities=replace_entities) for x in self
        ):
            return result
        return default

    def getall(self) -> list[str]:
        return [x.get() for x in self]

    extract = getall

    def get(self, default: str | None = None) -> Any:
        for x in self:
            return x.get()
        return default

    extract_first = get

    @property
    def attrib(self) -> Mapping[str, str]:
        for x in self:
            return x.attrib
        return {}

    def drop(self) -> None:
        for x in self:
            x.drop()


class Selector:
    """Wrapper for one HTML/XML/JSON/text document or node allowing CSS,
    XPath and JMESPath selection (reference: parsel/selector.py:380-812)."""

    __slots__ = [
        "__weakref__",
        "_expr",
        "_huge_tree",
        "_text",
        "_text_lazy_root",
        "body",
        "namespaces",
        "root",
        "type",
    ]

    _default_namespaces = {
        "re": "http://exslt.org/regular-expressions",
        "set": "http://exslt.org/sets",
    }
    selectorlist_cls = SelectorList["Selector"]

    def __init__(
        self,
        text: str | None = None,
        type: str | None = None,  # noqa: A002 - reference API name
        body: bytes | bytearray = b"",
        encoding: str = "utf-8",
        namespaces: Mapping[str, str] | None = None,
        root: Any | None = _NOT_SET,
        base_url: str | None = None,
        _expr: str | None = None,
        huge_tree: bool = True,
    ) -> None:
        if type not in ("html", "json", "text", "xml", None):
            raise ValueError(f"Invalid type: {type}")

        if text is None and not body and root is _NOT_SET:
            raise ValueError("Selector needs text, body, or root arguments")

        if text is not None and not isinstance(text, str):
            raise TypeError(
                f"text argument should be of type str, got {text.__class__}"
            )

        if text is not None:
            if root is not _NOT_SET:
                warnings.warn(
                    "Selector got both text and root, root is being ignored.",
                    stacklevel=2,
                )
            self.root, self.type = _get_root_and_type_from_text(
                text, input_type=type, base_url=base_url, huge_tree=huge_tree
            )
        elif body:
            if not isinstance(body, (bytes, bytearray)):
                raise TypeError(
                    f"body argument should be of type bytes or bytearray, "
                    f"got {body.__class__}"
                )
            self.root, self.type = _get_root_and_type_from_bytes(
                body=bytes(body),
                encoding=encoding,
                input_type=type,
                base_url=base_url,
                huge_tree=huge_tree,
            )
        elif root is _NOT_SET:
            raise ValueError("Selector needs text, body, or root arguments")
        else:
            self.root = root
            self.type = _get_root_type(root, input_type=type)

        self.namespaces = dict(self._default_namespaces)
        if namespaces is not None:
            self.namespaces.update(namespaces)
        self._expr = _expr
        self._huge_tree = huge_tree
        self._text = text
        self._text_lazy_root: Any = None

    def __getstate__(self) -> Any:
        raise TypeError("can't pickle Selector objects")

    # -- queries ---------------------------------------------------------
    def jmespath(self, query: str, **kwargs: Any) -> SelectorList["Selector"]:
        if _jmespath is None:  # pragma: no cover
            raise RuntimeError("jmespath is not available")
        if self.type == "json":
            if isinstance(self.root, str):
                data = _load_json_or_none(self.root)
            else:
                data = self.root
        else:
            data = _load_json_or_none(self.root.text if hasattr(self.root, "text") else None)

        result = _jmespath.search(query, data, **kwargs)
        if result is None:
            result = []
        elif not isinstance(result, list):
            result = [result]

        def make_selector(value: Any) -> "Selector":
            if isinstance(value, str):
                return self.__class__(text=value, _expr=query, type="text")
            return self.__class__(root=value, _expr=query)

        return self.selectorlist_cls([make_selector(x) for x in result])

    def xpath(
        self,
        query: str,
        namespaces: Mapping[str, str] | None = None,
        **kwargs: Any,
    ) -> SelectorList["Selector"]:
        if self.type not in ("html", "xml", "text"):
            raise ValueError(f"Cannot use xpath on a Selector of type {self.type!r}")
        if isinstance(query, (bytes, bytearray)):
            try:
                query = bytes(query).decode("ascii")
            except UnicodeDecodeError:
                raise ValueError(
                    "All strings must be XML compatible: Unicode or ASCII, "
                    "no NULL bytes or control characters"
                )
        if self.type in ("html", "xml"):
            context = self.root
            if not isinstance(context, Node):
                return self.selectorlist_cls([])
        else:
            if self._text_lazy_root is None:
                self._text_lazy_root = create_root_node(self._text or "", type_="html")
            context = self._text_lazy_root

        nsp = dict(self.namespaces)
        if namespaces is not None:
            nsp.update(namespaces)
        # node-set variable bindings (lxml parity: a Selector /
        # SelectorList / list of Selectors binds as an XPath node-set,
        # so $var composes with axes/predicates/set: functions)
        variables: dict[str, Any] = {}
        for name, value in kwargs.items():
            if isinstance(value, Selector):
                variables[name] = [value.root] if isinstance(value.root, Node) else []
            elif isinstance(value, (SelectorList, list, tuple)) and all(
                isinstance(v, Selector) for v in value
            ):
                variables[name] = [
                    v.root for v in value if isinstance(v.root, Node)
                ]
            else:
                variables[name] = value
        try:
            result = evaluate(
                query,
                context,
                namespaces=nsp,
                variables=variables,
                extensions=DEFAULT_EXTENSIONS,
            )
        except XPathError as exc:
            raise ValueError(f"XPath error: {exc} in {query}")

        if not isinstance(result, list):
            result = [result]

        wrapped = []
        for item in result:
            if isinstance(item, TextNode):
                item = item.data
            elif isinstance(item, AttributeNode):
                item = item.value
            elif hasattr(item, "uri") and hasattr(item, "prefix"):  # NamespaceNode
                item = item.uri
            wrapped.append(
                self.__class__(
                    root=item,
                    _expr=query,
                    namespaces=self.namespaces,
                    type=_xml_or_html(self.type),
                )
            )
        return self.selectorlist_cls(wrapped)

    def css(self, query: str) -> SelectorList["Selector"]:
        if self.type not in ("html", "xml", "text"):
            raise ValueError(f"Cannot use css on a Selector of type {self.type!r}")
        return self.xpath(self._css2xpath(query))

    def _css2xpath(self, query: str) -> str:
        return translator_for(_xml_or_html(self.type)).css_to_xpath(query)

    def re(
        self, regex: str | Pattern[str], replace_entities: bool = True
    ) -> list[str]:
        return extract_regex(regex, self.get(), replace_entities=replace_entities)

    def re_first(
        self,
        regex: str | Pattern[str],
        default: str | None = None,
        replace_entities: bool = True,
    ) -> str | None:
        return next(
            iflatten(self.re(regex, replace_entities=replace_entities)), default
        )

    # -- extraction ------------------------------------------------------
    def get(self) -> Any:
        if self.type in ("text", "json"):
            return self.root
        root = self.root
        if isinstance(root, (Element, Document, Comment)):
            if isinstance(root, Comment):
                return f"<!--{root.text}-->"
            return serialize(root, method="xml" if self.type == "xml" else "html")
        if root is True:
            return "1"
        if root is False:
            return "0"
        return str(root)

    extract = get

    def getall(self) -> list[str]:
        return [self.get()]

    # -- namespaces ------------------------------------------------------
    def register_namespace(self, prefix: str, uri: str) -> None:
        self.namespaces[prefix] = uri

    def remove_namespaces(self) -> None:
        if self.type == "json":
            return
        root = self.root
        if not isinstance(root, (Element, Document)):
            return
        for el in root.iter("*"):
            if el.tag.startswith("{"):
                el.tag = el.tag.split("}", 1)[1]
                el.prefix = None
            for name in list(el.attrib):
                if name.startswith("{"):
                    el.attrib[name.split("}", 1)[1]] = el.attrib.pop(name)
            el.nsmap = {}
            el._attr_nodes = None
            el._ns_nodes = None

    # -- mutation --------------------------------------------------------
    def drop(self) -> None:
        root = self.root
        if not isinstance(root, Node):
            raise CannotRemoveElementWithoutRoot(
                "The node you're trying to drop has no root, "
                "are you trying to drop a pseudo-element? "
                "Try to use 'li' as a selector instead of 'li::text' or "
                "'//li' instead of '//li/text()', for example."
            )
        parent = root.parent
        if parent is None or isinstance(parent, Document):
            raise CannotDropElementWithoutParent(
                "The node you're trying to remove has no parent, "
                "are you trying to remove a root element?"
            )
        if self.type == "xml":
            # xml semantics: the element's tail goes with it
            index = next(
                (i for i, c in enumerate(parent.children) if c is root), None
            )
            if index is not None:
                tail = (
                    parent.children[index + 1]
                    if index + 1 < len(parent.children)
                    else None
                )
                parent.remove(root)
                if isinstance(tail, TextNode):
                    parent.remove(tail)
        else:
            # html semantics: drop_tree() preserves the tail text
            parent.remove(root)

    # -- attributes / dunder --------------------------------------------
    @property
    def attrib(self) -> dict[str, str]:
        if self.type == "json":
            return {}
        return dict(getattr(self.root, "attrib", {}) or {})

    def __bool__(self) -> bool:
        return bool(self.get())

    __nonzero__ = __bool__

    def __str__(self) -> str:
        return str(self.get())

    def __repr__(self) -> str:
        data = repr(shorten(str(self.get()), width=40))
        return f"<{type(self).__name__} query={self._expr!r} data={data}>"
