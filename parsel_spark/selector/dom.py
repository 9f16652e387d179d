"""Pure-Python document object model for the from-scratch selector engine.

Replicates the *observable* semantics of the lxml element trees the
reference builds (parsel/selector.py:90-119 ``create_root_node``) without
depending on lxml: document order, namespace scoping, tail-preserving
drops and ``{uri}local`` tag expansion.

Design differences from lxml (intentional, simpler for XPath):

* text is stored as explicit :class:`TextNode` children rather than
  ``.text``/``.tail`` attributes.  ``.text`` is provided as a computed
  property for API compatibility (used by ``Selector.jmespath``).
* attribute and namespace nodes are materialized lazily but *cached* per
  element so that XPath node-identity semantics (EXSLT ``set:difference``,
  reference behavior at parsel/selector.py:425-426) hold.
"""

from __future__ import annotations

from typing import Any, Iterator

XML_NAMESPACE = "http://www.w3.org/XML/1998/namespace"


class Node:
    """Base class for all tree nodes."""

    __slots__ = ("parent", "_pos")

    def __init__(self) -> None:
        self.parent: Node | None = None
        self._pos: int = 0

    # -- tree navigation -------------------------------------------------
    def getparent(self) -> Node | None:
        parent = self.parent
        if isinstance(parent, Document):
            return None
        return parent

    def getroottree(self) -> Document | None:
        node: Node | None = self
        while node is not None:
            if isinstance(node, Document):
                return node
            node = node.parent
        return None

    def iter_ancestors(self) -> Iterator[Node]:
        node = self.parent
        while node is not None and not isinstance(node, Document):
            yield node
            node = node.parent

    def string_value(self) -> str:
        return ""


class _Parent(Node):
    """A node that can hold children."""

    __slots__ = ("children",)

    def __init__(self) -> None:
        super().__init__()
        self.children: list[Node] = []

    def append(self, child: Node) -> None:
        child.parent = self
        self.children.append(child)

    def remove(self, child: Node) -> None:
        self.children.remove(child)
        child.parent = None
        doc = self.getroottree()
        if doc is not None:
            doc.order_dirty = True

    def iter(self, tag: str | None = None) -> Iterator[Element]:
        """Depth-first iteration over descendant-or-self elements."""
        stack: list[Node] = [self]
        while stack:
            node = stack.pop()
            if isinstance(node, Element) and (
                tag is None or tag == "*" or node.tag == tag
            ):
                yield node
            if isinstance(node, _Parent):
                stack.extend(reversed(node.children))

    def itertext(self) -> Iterator[str]:
        stack: list[Node] = list(reversed(self.children))
        while stack:
            node = stack.pop()
            if isinstance(node, TextNode):
                yield node.data
            elif isinstance(node, Element):
                stack.extend(reversed(node.children))

    def string_value(self) -> str:
        return "".join(self.itertext())


class Document(_Parent):
    """The document root (XPath ``/``)."""

    __slots__ = ("base", "order_dirty", "_counter", "depth_limited")

    def __init__(self, base: str | None = None) -> None:
        super().__init__()
        self.base = base
        self.order_dirty = True
        self._counter = 0
        # set by the parsers when a huge_tree=False depth limit
        # truncated the input (libxml2-parity; Selector warns on it)
        self.depth_limited = False

    @property
    def root_element(self) -> Element | None:
        for child in self.children:
            if isinstance(child, Element):
                return child
        return None

    def renumber(self) -> None:
        """(Re)assign document-order positions after a mutation."""
        counter = 0
        stack: list[Node] = [self]
        while stack:
            node = stack.pop()
            node._pos = counter
            counter += 1
            if isinstance(node, _Parent):
                stack.extend(reversed(node.children))
        self._counter = counter
        self.order_dirty = False


class Element(_Parent):
    """An element node.

    ``tag`` uses lxml-style ``{uri}local`` expansion when namespaced.
    ``nsmap`` holds the namespace *declarations on this element only*
    (prefix -> uri, ``None`` key for the default namespace); in-scope
    namespaces are computed by walking ancestors.
    """

    __slots__ = ("tag", "attrib", "nsmap", "prefix", "base", "_attr_nodes", "_ns_nodes")

    def __init__(
        self,
        tag: str,
        attrib: dict[str, str] | None = None,
        nsmap: dict[str | None, str] | None = None,
        prefix: str | None = None,
    ) -> None:
        super().__init__()
        self.tag = tag
        self.attrib: dict[str, str] = attrib if attrib is not None else {}
        self.nsmap: dict[str | None, str] = nsmap if nsmap is not None else {}
        self.prefix = prefix
        self.base: str | None = None
        self._attr_nodes: dict[str, AttributeNode] | None = None
        self._ns_nodes: dict[str | None, NamespaceNode] | None = None

    # -- lxml-compatible conveniences ------------------------------------
    def get(self, key: str, default: str | None = None) -> str | None:
        return self.attrib.get(key, default)

    def set(self, key: str, value: str) -> None:
        self.attrib[key] = value

    @property
    def text(self) -> str | None:
        """Leading text before the first element child (lxml ``.text``)."""
        parts: list[str] = []
        for child in self.children:
            if isinstance(child, TextNode):
                parts.append(child.data)
            elif isinstance(child, Element):
                break
            # comments/PIs terminate lxml .text as well
            elif isinstance(child, (Comment, ProcessingInstruction)):
                break
        if not parts:
            return None
        return "".join(parts)

    @property
    def local_name(self) -> str:
        tag = self.tag
        if tag.startswith("{") and "}" in tag:
            return tag.split("}", 1)[1]
        return tag

    @property
    def namespace_uri(self) -> str | None:
        tag = self.tag
        if tag.startswith("{") and "}" in tag:
            return tag[1:].split("}", 1)[0]
        return None

    def qname(self) -> str:
        if self.prefix:
            return f"{self.prefix}:{self.local_name}"
        return self.local_name

    # -- XPath node caches -----------------------------------------------
    def attribute_nodes(self) -> list[AttributeNode]:
        if self._attr_nodes is None:
            self._attr_nodes = {}
        cache = self._attr_nodes
        out = []
        for index, (name, value) in enumerate(self.attrib.items()):
            node = cache.get(name)
            if node is None or node.value != value:
                node = AttributeNode(self, name, value, index)
                cache[name] = node
            else:
                node.index = index
            out.append(node)
        return out

    def in_scope_namespaces(self) -> dict[str | None, str]:
        scope: dict[str | None, str] = {"xml": XML_NAMESPACE}
        chain: list[Element] = [self]
        for anc in self.iter_ancestors():
            if isinstance(anc, Element):
                chain.append(anc)
        for el in reversed(chain):
            scope.update(el.nsmap)
        # an empty-string / None default declaration undeclares
        if scope.get(None) in (None, ""):
            scope.pop(None, None)
        return scope

    def namespace_nodes(self) -> list[NamespaceNode]:
        if self._ns_nodes is None:
            self._ns_nodes = {}
        cache = self._ns_nodes
        out = []
        for index, (prefix, uri) in enumerate(sorted(
            self.in_scope_namespaces().items(), key=lambda kv: (kv[0] is not None, kv[0] or "")
        )):
            node = cache.get(prefix)
            if node is None or node.uri != uri:
                node = NamespaceNode(self, prefix, uri, index)
                cache[prefix] = node
            out.append(node)
        return out

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        return f"<Element {self.tag} at 0x{id(self):x}>"


class TextNode(Node):
    __slots__ = ("data",)

    def __init__(self, data: str) -> None:
        super().__init__()
        self.data = data

    def string_value(self) -> str:
        return self.data

    def __repr__(self) -> str:  # pragma: no cover
        return f"<TextNode {self.data!r}>"


class Comment(Node):
    __slots__ = ("text",)

    def __init__(self, text: str) -> None:
        super().__init__()
        self.text = text

    def string_value(self) -> str:
        return self.text


class ProcessingInstruction(Node):
    __slots__ = ("target", "text")

    def __init__(self, target: str, text: str) -> None:
        super().__init__()
        self.target = target
        self.text = text

    def string_value(self) -> str:
        return self.text


class EntityRef(Node):
    """An unresolved entity reference kept literal (XXE-safe parsing,
    reference behavior at parsel/selector.py:60-63 — ``&xxe;`` stays
    ``&xxe;``; golden: tests/test_selector.py:843-852)."""

    __slots__ = ("name",)

    def __init__(self, name: str) -> None:
        super().__init__()
        self.name = name

    def string_value(self) -> str:
        return ""


class AttributeNode:
    """XPath attribute node; cached per element for identity semantics."""

    __slots__ = ("owner", "name", "value", "index")

    def __init__(self, owner: Element, name: str, value: str, index: int) -> None:
        self.owner = owner
        self.name = name
        self.value = value
        self.index = index

    @property
    def parent(self) -> Element:
        return self.owner

    def getparent(self) -> Element:
        return self.owner

    def getroottree(self) -> Document | None:
        return self.owner.getroottree()

    @property
    def local_name(self) -> str:
        if self.name.startswith("{"):
            return self.name.split("}", 1)[1]
        return self.name

    @property
    def namespace_uri(self) -> str | None:
        if self.name.startswith("{"):
            return self.name[1:].split("}", 1)[0]
        return None

    def string_value(self) -> str:
        return self.value

    def __repr__(self) -> str:  # pragma: no cover
        return f"<AttributeNode {self.name}={self.value!r}>"


class NamespaceNode:
    """XPath namespace node."""

    __slots__ = ("owner", "prefix", "uri", "index")

    def __init__(self, owner: Element, prefix: str | None, uri: str, index: int) -> None:
        self.owner = owner
        self.prefix = prefix
        self.uri = uri
        self.index = index

    @property
    def parent(self) -> Element:
        return self.owner

    def getparent(self) -> Element:
        return self.owner

    def getroottree(self) -> Document | None:
        return self.owner.getroottree()

    def string_value(self) -> str:
        return self.uri


def doc_order_key(node: Any) -> tuple[int, int, int]:
    """Sort key producing XPath document order within one tree.

    Elements/text/comments sort by their DFS position; namespace nodes of
    an element come right after it, then its attribute nodes, then its
    children (matching the XPath 1.0 data model).
    """
    if isinstance(node, NamespaceNode):
        return (node.owner._pos, 1, node.index)
    if isinstance(node, AttributeNode):
        return (node.owner._pos, 2, node.index)
    return (node._pos, 0, 0)


def ensure_order(nodes: list[Any]) -> None:
    """Renumber any dirty trees the given nodes belong to."""
    seen: set[int] = set()
    for node in nodes:
        tree = node.getroottree() if hasattr(node, "getroottree") else None
        if tree is not None and id(tree) not in seen:
            seen.add(id(tree))
            if tree.order_dirty:
                tree.renumber()


def sort_document_order(nodes: list[Any]) -> list[Any]:
    """Stable document-order sort handling nodes from multiple trees.

    Trees are ordered by first appearance (relevant for synthetic
    node-sets such as EXSLT ``re:match`` results, reference behavior at
    tests/test_selector.py:1122-1136)."""
    if len(nodes) <= 1:
        return list(nodes)
    ensure_order(nodes)
    tree_order: dict[int, int] = {}
    detached_order: dict[int, int] = {}

    def key(node: Any) -> tuple[int, tuple[int, int, int]]:
        tree = node.getroottree() if hasattr(node, "getroottree") else None
        if tree is None:
            tid = detached_order.setdefault(id(node), len(detached_order))
            return (10_000_000 + tid, (0, 0, 0))
        tid = tree_order.setdefault(id(tree), len(tree_order))
        return (tid, doc_order_key(node))

    # Decorate-sort-undecorate: each key() walks to the tree root, so
    # compute it once per node (the pre-seed pass already needed one
    # full traversal to fix tree order by first appearance).
    decorated = [(key(node), index, node) for index, node in enumerate(nodes)]
    decorated.sort(key=lambda item: (item[0], item[1]))
    return [node for _, _, node in decorated]
