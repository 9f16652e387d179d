"""XPath 1.0 evaluator over the engine DOM.

Implements the full value model (node-set / string / number / boolean)
with XPath 1.0 coercion rules, all 13 axes, position semantics on
reverse axes, variable bindings (reference behavior:
tests/test_selector.py:85-141) and namespace-aware name tests
(tests/test_selector.py:432-587).

Scalar top-level results are returned as Python ``bool``/``float``/``str``
and wrapped by the Selector layer exactly like the reference wraps lxml's
(parsel/selector.py:611-620, 715-720).
"""

from __future__ import annotations

import math
from typing import Any, Callable, Iterator

from ..dom import (
    AttributeNode,
    Comment,
    Document,
    Element,
    EntityRef,
    NamespaceNode,
    Node,
    ProcessingInstruction,
    TextNode,
    sort_document_order,
)
from .errors import XPathEvalError
from .parser import compile_xpath

NAN = float("nan")


class EvalContext:
    """Mutable evaluation context threaded through the AST walk."""

    __slots__ = (
        "node",
        "position",
        "size",
        "variables",
        "namespaces",
        "document",
        "eval_context",
        "extensions",
    )

    def __init__(
        self,
        node: Any,
        variables: dict[str, Any],
        namespaces: dict[str, str],
        document: Any,
        extensions: dict[tuple[str | None, str], Callable[..., Any]],
        eval_context: dict[str, Any] | None = None,
    ) -> None:
        self.node = node
        self.position = 1
        self.size = 1
        self.variables = variables
        self.namespaces = namespaces
        self.document = document
        self.extensions = extensions
        self.eval_context: dict[str, Any] = (
            eval_context if eval_context is not None else {}
        )

    def sub(self, node: Any, position: int, size: int) -> "EvalContext":
        ctx = EvalContext.__new__(EvalContext)
        ctx.node = node
        ctx.position = position
        ctx.size = size
        ctx.variables = self.variables
        ctx.namespaces = self.namespaces
        ctx.document = self.document
        ctx.extensions = self.extensions
        ctx.eval_context = self.eval_context
        return ctx


# ---------------------------------------------------------------------------
# value coercions (XPath 1.0 §3.4, §4.2-4.4)
# ---------------------------------------------------------------------------


def string_value(node: Any) -> str:
    return node.string_value()


def to_string(value: Any) -> str:
    if isinstance(value, list):
        if not value:
            return ""
        ordered = sort_document_order(value)
        return string_value(ordered[0])
    if isinstance(value, bool):
        return "true" if value else "false"
    if isinstance(value, float):
        return format_number(value)
    if isinstance(value, str):
        return value
    return str(value)


def format_number(value: float) -> str:
    if math.isnan(value):
        return "NaN"
    if math.isinf(value):
        return "Infinity" if value > 0 else "-Infinity"
    if value == int(value) and abs(value) < 1e17:
        return str(int(value))
    return repr(value)


def to_number(value: Any) -> float:
    if isinstance(value, list):
        return to_number(to_string(value))
    if isinstance(value, bool):
        return 1.0 if value else 0.0
    if isinstance(value, float):
        return value
    if isinstance(value, str):
        stripped = value.strip(" \t\n\r")
        if not stripped:
            return NAN
        try:
            if stripped.startswith("-"):
                body = stripped[1:]
            else:
                body = stripped
            if not body or not all(c.isdigit() or c == "." for c in body):
                return NAN
            if body.count(".") > 1 or body == ".":
                return NAN
            return float(stripped)
        except ValueError:
            return NAN
    return NAN


def to_boolean(value: Any) -> bool:
    if isinstance(value, list):
        return len(value) > 0
    if isinstance(value, bool):
        return value
    if isinstance(value, float):
        return not (value == 0.0 or math.isnan(value))
    if isinstance(value, str):
        return len(value) > 0
    return bool(value)


# ---------------------------------------------------------------------------
# axes
# ---------------------------------------------------------------------------

_SKIP = (EntityRef,)


def _children(node: Any) -> list[Any]:
    if isinstance(node, (Element, Document)):
        return [c for c in node.children if not isinstance(c, _SKIP)]
    return []


def _iter_descendants(node: Any) -> Iterator[Any]:
    stack = list(reversed(_children(node)))
    while stack:
        current = stack.pop()
        yield current
        if isinstance(current, (Element, Document)):
            stack.extend(reversed(_children(current)))


def _parent_of(node: Any) -> Any:
    if isinstance(node, (AttributeNode, NamespaceNode)):
        return node.owner
    return node.parent


def _siblings(node: Any, following: bool) -> list[Any]:
    if isinstance(node, (AttributeNode, NamespaceNode)):
        return []
    parent = node.parent
    if parent is None or not isinstance(parent, (Element, Document)):
        return []
    children = [c for c in parent.children if not isinstance(c, _SKIP)]
    filtered_index = -1
    for i, c in enumerate(children):
        if c is node:
            filtered_index = i
            break
    if filtered_index < 0:
        return []
    if following:
        return children[filtered_index + 1 :]
    return list(reversed(children[:filtered_index]))


def axis_nodes(axis: str, node: Any) -> list[Any]:
    """Nodes on ``axis`` from ``node`` in *axis order* (reverse axes yield
    reverse document order, giving XPath position semantics)."""
    if axis == "child":
        return _children(node)
    if axis == "descendant":
        return list(_iter_descendants(node))
    if axis == "descendant-or-self":
        return [node, *_iter_descendants(node)]
    if axis == "self":
        return [node]
    if axis == "parent":
        parent = _parent_of(node)
        return [parent] if parent is not None else []
    if axis == "ancestor":
        out = []
        current = _parent_of(node)
        while current is not None:
            out.append(current)
            current = current.parent
        return out
    if axis == "ancestor-or-self":
        out = [node]
        current = _parent_of(node)
        while current is not None:
            out.append(current)
            current = current.parent
        return out
    if axis == "following-sibling":
        return _siblings(node, following=True)
    if axis == "preceding-sibling":
        return _siblings(node, following=False)
    if axis == "attribute":
        if isinstance(node, Element):
            return list(node.attribute_nodes())
        return []
    if axis == "namespace":
        if isinstance(node, Element):
            return list(node.namespace_nodes())
        return []
    if axis == "following":
        out = []
        current = node
        while current is not None and not isinstance(current, Document):
            for sibling in _siblings(current, following=True):
                out.append(sibling)
                if isinstance(sibling, (Element, Document)):
                    out.extend(_iter_descendants(sibling))
            current = _parent_of(current)
        return out
    if axis == "preceding":
        # reverse document order, excluding ancestors
        out = []
        current = node
        while current is not None and not isinstance(current, Document):
            for sibling in _siblings(current, following=False):
                subtree = [sibling]
                if isinstance(sibling, (Element, Document)):
                    subtree.extend(_iter_descendants(sibling))
                out.extend(reversed(subtree))
            current = _parent_of(current)
        return out
    raise XPathEvalError(f"Unknown axis {axis}")


_REVERSE_AXES = frozenset(
    {"ancestor", "ancestor-or-self", "preceding", "preceding-sibling"}
)


# ---------------------------------------------------------------------------
# node tests
# ---------------------------------------------------------------------------


def _expand_name(prefix: str | None, local: str, namespaces: dict[str, str]) -> str:
    if prefix is None:
        return local
    uri = namespaces.get(prefix)
    if uri is None:
        raise XPathEvalError("Undefined namespace prefix")
    return f"{{{uri}}}{local}"


def make_node_test(
    axis: str, nodetest: tuple, namespaces: dict[str, str]
) -> Callable[[Any], bool]:
    kind = nodetest[0]
    principal_attr = axis == "attribute"
    principal_ns = axis == "namespace"

    if kind == "wild":
        if principal_attr:
            return lambda n: isinstance(n, AttributeNode)
        if principal_ns:
            return lambda n: isinstance(n, NamespaceNode)
        return lambda n: isinstance(n, Element)

    if kind == "name":
        expanded = _expand_name(nodetest[1], nodetest[2], namespaces)
        if principal_attr:
            return lambda n: isinstance(n, AttributeNode) and n.name == expanded
        if principal_ns:
            local = nodetest[2]
            return lambda n: isinstance(n, NamespaceNode) and n.prefix == local
        return lambda n: isinstance(n, Element) and n.tag == expanded

    if kind == "nswild":
        prefix = nodetest[1]
        uri = namespaces.get(prefix)
        if uri is None:
            raise XPathEvalError("Undefined namespace prefix")
        marker = "{" + uri + "}"
        if principal_attr:
            return lambda n: isinstance(n, AttributeNode) and n.name.startswith(marker)
        return lambda n: isinstance(n, Element) and n.tag.startswith(marker)

    # node type tests
    type_name = nodetest[1]
    if type_name == "node":
        return lambda n: True
    if type_name == "text":
        return lambda n: isinstance(n, TextNode)
    if type_name == "comment":
        return lambda n: isinstance(n, Comment)
    if type_name == "processing-instruction":
        target = nodetest[2]
        if target is None:
            return lambda n: isinstance(n, ProcessingInstruction)
        return lambda n: isinstance(n, ProcessingInstruction) and n.target == target

    raise XPathEvalError(f"Unknown node test {type_name}")


# ---------------------------------------------------------------------------
# evaluation
# ---------------------------------------------------------------------------


def evaluate_ast(ast: Any, ctx: EvalContext) -> Any:
    kind = ast[0]
    if kind == "path":
        return _eval_path(ast, ctx)
    if kind == "filter":
        return _eval_filter(ast, ctx)
    if kind == "union":
        merged: list[Any] = []
        seen: set[int] = set()
        for sub in ast[1]:
            value = evaluate_ast(sub, ctx)
            if not isinstance(value, list):
                raise XPathEvalError("Invalid expression")
            for node in value:
                if id(node) not in seen:
                    seen.add(id(node))
                    merged.append(node)
        return sort_document_order(merged)
    if kind == "literal":
        return ast[1]
    if kind == "number":
        return ast[1]
    if kind == "var":
        name = ast[1]
        if name not in ctx.variables:
            raise XPathEvalError(f"Undefined variable {name}")
        return ctx.variables[name]
    if kind == "or":
        return to_boolean(evaluate_ast(ast[1], ctx)) or to_boolean(
            evaluate_ast(ast[2], ctx)
        )
    if kind == "and":
        return to_boolean(evaluate_ast(ast[1], ctx)) and to_boolean(
            evaluate_ast(ast[2], ctx)
        )
    if kind == "cmp":
        return _eval_compare(ast[1], evaluate_ast(ast[2], ctx), evaluate_ast(ast[3], ctx))
    if kind == "arith":
        left = to_number(evaluate_ast(ast[2], ctx))
        right = to_number(evaluate_ast(ast[3], ctx))
        op = ast[1]
        if op == "+":
            return left + right
        if op == "-":
            return left - right
        if op == "*":
            return left * right
        if op == "div":
            if right == 0.0:
                if left == 0.0 or math.isnan(left):
                    return NAN
                return math.inf if left > 0 else -math.inf
            return left / right
        if op == "mod":
            if right == 0.0 or math.isnan(left) or math.isinf(left):
                return NAN
            return math.fmod(left, right)
    if kind == "neg":
        return -to_number(evaluate_ast(ast[1], ctx))
    if kind == "call":
        return _eval_call(ast, ctx)
    raise XPathEvalError(f"Unknown AST node {kind}")


def _eval_path(ast: Any, ctx: EvalContext) -> list[Any]:
    _, absolute, steps = ast
    if absolute:
        start: list[Any] = [ctx.document] if ctx.document is not None else []
    else:
        start = [ctx.node]
    return _eval_steps(steps, start, ctx)


def _eval_filter(ast: Any, ctx: EvalContext) -> Any:
    _, primary, predicates, steps = ast
    value = evaluate_ast(primary, ctx)
    if predicates:
        if not isinstance(value, list):
            raise XPathEvalError("Invalid predicate")
        nodes = sort_document_order(value)
        for predicate in predicates:
            nodes = _apply_predicate(predicate, nodes, ctx)
        value = nodes
    if steps:
        if not isinstance(value, list):
            raise XPathEvalError("Invalid expression")
        value = _eval_steps(steps, sort_document_order(value), ctx)
    return value


def _eval_steps(steps: list[Any], start: list[Any], ctx: EvalContext) -> list[Any]:
    nodes = start
    for step in steps:
        _, axis, nodetest, predicates = step
        test = make_node_test(axis, nodetest, ctx.namespaces)
        reverse = axis in _REVERSE_AXES
        gathered: list[Any] = []
        multi = len(nodes) > 1
        for context_node in nodes:
            candidates = [n for n in axis_nodes(axis, context_node) if test(n)]
            for predicate in predicates:
                candidates = _apply_predicate(predicate, candidates, ctx)
            gathered.extend(candidates)
        # attribute/self axes cannot produce duplicates or out-of-order
        # results from doc-ordered contexts (attributes of distinct
        # elements never interleave) — skip the sort on the hot
        # ``…/@attr`` tail step
        if axis in ("attribute", "self") and not reverse:
            nodes = gathered
            continue
        if multi or reverse:
            seen: set[int] = set()
            deduped = []
            for node in gathered:
                if id(node) not in seen:
                    seen.add(id(node))
                    deduped.append(node)
            nodes = sort_document_order(deduped)
        else:
            nodes = gathered
    return nodes


def _apply_predicate(predicate: Any, candidates: list[Any], ctx: EvalContext) -> list[Any]:
    if not candidates:
        return candidates
    size = len(candidates)
    kept = []
    # fast path: bare-number predicate ([2])
    if predicate[0] == "number":
        wanted = predicate[1]
        index = int(wanted)
        if wanted == index and 1 <= index <= size:
            return [candidates[index - 1]]
        return []
    for position, node in enumerate(candidates, start=1):
        sub = ctx.sub(node, position, size)
        value = evaluate_ast(predicate, sub)
        if isinstance(value, float) and not isinstance(value, bool):
            if value == position:
                kept.append(node)
        elif to_boolean(value):
            kept.append(node)
    return kept


def _eval_compare(op: str, left: Any, right: Any) -> bool:
    left_ns = isinstance(left, list)
    right_ns = isinstance(right, list)
    if op in ("=", "!="):
        if left_ns and right_ns:
            right_values = {string_value(n) for n in right}
            left_values = {string_value(n) for n in left}
            if op == "=":
                return bool(left_values & right_values)
            # exists a pair of differing string-values
            if not left_values or not right_values:
                return False
            if len(left_values) > 1 or len(right_values) > 1:
                return True
            return left_values != right_values
        if left_ns or right_ns:
            nodes, other = (left, right) if left_ns else (right, left)
            if isinstance(other, bool):
                result = to_boolean(nodes) == other
                return result if op == "=" else not result
            if isinstance(other, float):
                for node in nodes:
                    value = to_number(string_value(node))
                    if (value == other) if op == "=" else (value != other):
                        return True
                return False
            other_str = to_string(other)
            for node in nodes:
                sv = string_value(node)
                if (sv == other_str) if op == "=" else (sv != other_str):
                    return True
            return False
        if isinstance(left, bool) or isinstance(right, bool):
            result = to_boolean(left) == to_boolean(right)
        elif isinstance(left, float) or isinstance(right, float):
            result = to_number(left) == to_number(right)
        else:
            result = to_string(left) == to_string(right)
        return result if op == "=" else not result

    # relational: < <= > >=
    def num_cmp(a: float, b: float) -> bool:
        if op == "<":
            return a < b
        if op == "<=":
            return a <= b
        if op == ">":
            return a > b
        return a >= b

    if left_ns and right_ns:
        return any(
            num_cmp(to_number(string_value(l)), to_number(string_value(r)))
            for l in left
            for r in right
        )
    if left_ns:
        rv = to_number(right)
        return any(num_cmp(to_number(string_value(l)), rv) for l in left)
    if right_ns:
        lv = to_number(left)
        return any(num_cmp(lv, to_number(string_value(r))) for r in right)
    return num_cmp(to_number(left), to_number(right))


def _eval_call(ast: Any, ctx: EvalContext) -> Any:
    from . import functions  # late import to avoid a cycle

    _, prefix, name, arg_asts = ast
    if prefix is not None:
        uri = ctx.namespaces.get(prefix)
        if uri is None:
            raise XPathEvalError("Undefined namespace prefix")
        key: tuple[str | None, str] = (uri, name)
    else:
        key = (None, name)

    args = [evaluate_ast(a, ctx) for a in arg_asts]

    if prefix is None:
        core = functions.CORE_FUNCTIONS.get(name)
        if core is not None:
            return core(ctx, *args)

    ext = ctx.extensions.get(key)
    if ext is None:
        ext = functions.DEFAULT_EXTENSIONS.get(key)
    if ext is None:
        shown = f"{prefix}:{name}" if prefix else name
        raise XPathEvalError(f"Unregistered function: {shown}")
    wrapper = functions.ExtensionContext(ctx)
    result = ext(wrapper, *args)
    if result is None:
        return []
    if isinstance(result, (bool, float, str, list)):
        return result
    if isinstance(result, int):
        return float(result)
    if isinstance(result, Node):
        return [result]
    return result


# ---------------------------------------------------------------------------
# public entry point
# ---------------------------------------------------------------------------


def evaluate(
    query: str,
    context_node: Any,
    namespaces: dict[str, str] | None = None,
    variables: dict[str, Any] | None = None,
    extensions: dict[tuple[str | None, str], Callable[..., Any]] | None = None,
) -> Any:
    """Compile (memoized) and evaluate ``query`` from ``context_node``.

    Variable values follow the reference's binding semantics
    (tests/test_selector.py:85-141): ``bool`` stays boolean, ``int``/
    ``float`` become numbers, ``str`` stays a string.
    """
    ast = compile_xpath(query)
    document = (
        context_node.getroottree() if hasattr(context_node, "getroottree") else None
    )
    converted: dict[str, Any] = {}
    if variables:
        for name, value in variables.items():
            if isinstance(value, bool):
                converted[name] = value
            elif isinstance(value, (int, float)):
                converted[name] = float(value)
            else:
                converted[name] = value
    ctx = EvalContext(
        node=context_node,
        variables=converted,
        namespaces=dict(namespaces or {}),
        document=document if document is not None else context_node,
        extensions=dict(extensions or {}),
    )
    result = evaluate_ast(ast, ctx)
    if isinstance(result, list):
        # ('path', …) results are ALREADY document-ordered by
        # construction: _eval_steps sorts (and dedupes) after every
        # step that can disturb order — multi-context gathers and
        # reverse axes — and the remaining single-context forward-axis
        # traversals yield DFS order directly, as do attribute tails
        # over ordered owners (their sort keys are (owner_pos, 2,
        # attr_index)).  Re-sorting would walk to the root per node
        # just to rebuild keys for a no-op sort — the hot ``//a/@href``
        # family pays it once per query.  Every other expression kind
        # (unions, function results, variables) keeps the sort.
        if ast[0] == "path":
            return result
        return sort_document_order(result)
    return result
