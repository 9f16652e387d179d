"""XPath 1.0 core function library, EXSLT extensions and the custom
extension-function registry.

Mirrors the reference surface: the core set exercised by its suite
(tests/test_selector.py:55-141,571-580,717-727), ``has-class``
(parsel/xpathfuncs.py:41-60), EXSLT ``re:test``/``re:match``/``re:replace``
and ``set:difference`` (parsel/selector.py:418-427, behaviors pinned at
tests/test_selector.py:1096-1202), and ``set_xpathfunc``
(parsel/xpathfuncs.py:16-34).
"""

from __future__ import annotations

import math
import re as _re
from typing import Any, Callable

from ..dom import (
    AttributeNode,
    Document,
    Element,
    NamespaceNode,
    TextNode,
    sort_document_order,
)
from .errors import XPathEvalError
from . import evaluator as _ev

RE_NAMESPACE = "http://exslt.org/regular-expressions"
SET_NAMESPACE = "http://exslt.org/sets"
STR_NAMESPACE = "http://exslt.org/strings"
MATH_NAMESPACE = "http://exslt.org/math"
DATE_NAMESPACE = "http://exslt.org/dates-and-times"

HTML5_WHITESPACE = " \t\n\x0c\r"
_WS_RE = _re.compile(f"[{HTML5_WHITESPACE}]+")


class ExtensionContext:
    """The ``context`` object passed to extension functions — exposes the
    same attributes lxml's does (``context_node``, ``eval_context``),
    which the reference's ``has_class`` relies on
    (parsel/xpathfuncs.py:47-55)."""

    __slots__ = ("_ctx",)

    def __init__(self, ctx: "_ev.EvalContext") -> None:
        self._ctx = ctx

    @property
    def context_node(self) -> Any:
        return self._ctx.node

    @property
    def eval_context(self) -> dict[str, Any]:
        return self._ctx.eval_context


# ---------------------------------------------------------------------------
# core functions  (ctx is the evaluator's EvalContext)
# ---------------------------------------------------------------------------


def _arg_string(ctx: "_ev.EvalContext", args: tuple, index: int = 0) -> str:
    if len(args) > index:
        return _ev.to_string(args[index])
    return _ev.string_value(ctx.node)


def _fn_last(ctx, *args):
    return float(ctx.size)


def _fn_position(ctx, *args):
    return float(ctx.position)


def _fn_count(ctx, *args):
    if len(args) != 1 or not isinstance(args[0], list):
        raise XPathEvalError("Invalid number of arguments for count()")
    return float(len(args[0]))


def _node_name(node: Any) -> str:
    if isinstance(node, Element):
        return node.qname()
    if isinstance(node, AttributeNode):
        name = node.name
        if name.startswith("{"):
            return node.local_name
        return name
    if isinstance(node, NamespaceNode):
        return node.prefix or ""
    return ""


def _first_in_doc_order(value: list) -> Any:
    if not value:
        return None
    return sort_document_order(value)[0]


def _fn_name(ctx, *args):
    if args:
        node = _first_in_doc_order(args[0]) if isinstance(args[0], list) else None
        return _node_name(node) if node is not None else ""
    return _node_name(ctx.node)


def _fn_local_name(ctx, *args):
    if args:
        node = _first_in_doc_order(args[0]) if isinstance(args[0], list) else None
    else:
        node = ctx.node
    if node is None:
        return ""
    if isinstance(node, (Element, AttributeNode)):
        return node.local_name
    if isinstance(node, NamespaceNode):
        return node.prefix or ""
    return ""


def _fn_namespace_uri(ctx, *args):
    if args:
        node = _first_in_doc_order(args[0]) if isinstance(args[0], list) else None
    else:
        node = ctx.node
    if node is None:
        return ""
    if isinstance(node, (Element, AttributeNode)):
        return node.namespace_uri or ""
    return ""


def _fn_string(ctx, *args):
    if args:
        return _ev.to_string(args[0])
    return _ev.string_value(ctx.node)


def _fn_concat(ctx, *args):
    if len(args) < 2:
        raise XPathEvalError("Invalid number of arguments for concat()")
    return "".join(_ev.to_string(a) for a in args)


def _fn_starts_with(ctx, *args):
    return _ev.to_string(args[0]).startswith(_ev.to_string(args[1]))


def _fn_contains(ctx, *args):
    return _ev.to_string(args[1]) in _ev.to_string(args[0])


def _fn_substring_before(ctx, *args):
    haystack = _ev.to_string(args[0])
    needle = _ev.to_string(args[1])
    index = haystack.find(needle)
    return haystack[:index] if index >= 0 else ""


def _fn_substring_after(ctx, *args):
    haystack = _ev.to_string(args[0])
    needle = _ev.to_string(args[1])
    index = haystack.find(needle)
    return haystack[index + len(needle) :] if index >= 0 else ""


def _xpath_round(value: float) -> float:
    if math.isnan(value) or math.isinf(value):
        return value
    return math.floor(value + 0.5)


def _fn_substring(ctx, *args):
    source = _ev.to_string(args[0])
    start = _xpath_round(_ev.to_number(args[1]))
    if math.isnan(start):
        return ""
    if len(args) > 2:
        length = _xpath_round(_ev.to_number(args[2]))
        if math.isnan(length):
            return ""
        end = start + length
    else:
        end = math.inf
    out = []
    for position, char in enumerate(source, start=1):
        if position >= start and position < end:
            out.append(char)
    return "".join(out)


def _fn_string_length(ctx, *args):
    return float(len(_arg_string(ctx, args)))


def _fn_normalize_space(ctx, *args):
    return " ".join(_arg_string(ctx, args).split())


def _fn_translate(ctx, *args):
    source = _ev.to_string(args[0])
    from_chars = _ev.to_string(args[1])
    to_chars = _ev.to_string(args[2])
    table: dict[int, int | None] = {}
    for index, char in enumerate(from_chars):
        if ord(char) in table:
            continue
        table[ord(char)] = ord(to_chars[index]) if index < len(to_chars) else None
    return source.translate(table)


def _fn_boolean(ctx, *args):
    return _ev.to_boolean(args[0])


def _fn_not(ctx, *args):
    return not _ev.to_boolean(args[0])


def _fn_true(ctx, *args):
    return True


def _fn_false(ctx, *args):
    return False


def _fn_number(ctx, *args):
    if args:
        return _ev.to_number(args[0])
    return _ev.to_number(_ev.string_value(ctx.node))


def _fn_sum(ctx, *args):
    if not isinstance(args[0], list):
        raise XPathEvalError("sum() requires a node-set")
    return float(sum(_ev.to_number(_ev.string_value(n)) for n in args[0]))


def _fn_floor(ctx, *args):
    value = _ev.to_number(args[0])
    if math.isnan(value) or math.isinf(value):
        return value
    return float(math.floor(value))


def _fn_ceiling(ctx, *args):
    value = _ev.to_number(args[0])
    if math.isnan(value) or math.isinf(value):
        return value
    return float(math.ceil(value))


def _fn_round(ctx, *args):
    return float(_xpath_round(_ev.to_number(args[0])))


def _fn_lang(ctx, *args):
    wanted = _ev.to_string(args[0]).lower()
    node = ctx.node
    while node is not None:
        if isinstance(node, Element):
            lang = node.attrib.get("{http://www.w3.org/XML/1998/namespace}lang") or (
                node.attrib.get("lang")
            )
            if lang:
                lang = lang.lower()
                return lang == wanted or lang.startswith(wanted + "-")
        node = getattr(node, "parent", None)
    return False


def _fn_id(ctx, *args):
    """XPath 1.0 ``id()``.  IDs come from the ``id`` attribute — the
    libxml2 behavior for HTML documents (its DTD declares ``id`` as an
    ID attribute).  For DTD-less XML libxml2 returns an empty set; this
    engine pragmatically matches ``@id`` there too (documents with DTDs
    are out of scope — the XXE-safe parser keeps DTD internals inert)."""
    if len(args) != 1:
        raise XPathEvalError("id() takes exactly one argument")
    value = args[0]
    if isinstance(value, list):
        tokens: set[str] = set()
        for node in value:
            tokens.update(_ev.string_value(node).split())
    else:
        tokens = set(_ev.to_string(value).split())
    if not tokens:
        return []
    root = ctx.document
    out: list[Any] = []
    stack = [root]
    while stack:
        node = stack.pop()
        children = getattr(node, "children", None)
        if children:
            stack.extend(reversed(children))
        if isinstance(node, Element) and node.attrib.get("id") in tokens:
            out.append(node)
    return out


CORE_FUNCTIONS: dict[str, Callable[..., Any]] = {
    "id": _fn_id,
    "last": _fn_last,
    "position": _fn_position,
    "count": _fn_count,
    "local-name": _fn_local_name,
    "namespace-uri": _fn_namespace_uri,
    "name": _fn_name,
    "string": _fn_string,
    "concat": _fn_concat,
    "starts-with": _fn_starts_with,
    "contains": _fn_contains,
    "substring-before": _fn_substring_before,
    "substring-after": _fn_substring_after,
    "substring": _fn_substring,
    "string-length": _fn_string_length,
    "normalize-space": _fn_normalize_space,
    "translate": _fn_translate,
    "boolean": _fn_boolean,
    "not": _fn_not,
    "true": _fn_true,
    "false": _fn_false,
    "number": _fn_number,
    "sum": _fn_sum,
    "floor": _fn_floor,
    "ceiling": _fn_ceiling,
    "round": _fn_round,
    "lang": _fn_lang,
}


# ---------------------------------------------------------------------------
# has-class + user extension registry
# ---------------------------------------------------------------------------


def has_class(context: ExtensionContext, *classes: Any) -> bool:
    """Return True when every given class is present in the context
    element's ``class`` attribute (HTML5 whitespace rules)."""
    if not context.eval_context.get("args_checked"):
        if not classes:
            raise ValueError("XPath error: has-class must have at least 1 argument")
        for cls in classes:
            if not isinstance(cls, str):
                raise ValueError("XPath error: has-class arguments must be strings")
        context.eval_context["args_checked"] = True

    node = context.context_node
    node_cls = node.get("class") if isinstance(node, Element) else None
    if node_cls is None:
        return False
    padded = _WS_RE.sub(" ", f" {node_cls} ")
    return all(f" {cls} " in padded for cls in classes)


# ---------------------------------------------------------------------------
# EXSLT regular expressions / sets
# ---------------------------------------------------------------------------


def _re_flags(flags: str) -> int:
    value = 0
    if "i" in flags:
        value |= _re.IGNORECASE
    return value


def _exslt_input_string(value: Any) -> str:
    return _ev.to_string(value)


def _re_test(context: ExtensionContext, value: Any, pattern: Any, flags: Any = "") -> bool:
    text = _exslt_input_string(value)
    compiled = _re.compile(_ev.to_string(pattern), _re_flags(_ev.to_string(flags)))
    return compiled.search(text) is not None


def _re_match(context: ExtensionContext, value: Any, pattern: Any, flags: Any = "") -> list:
    text = _exslt_input_string(value)
    flag_str = _ev.to_string(flags)
    compiled = _re.compile(_ev.to_string(pattern), _re_flags(flag_str))
    document = Document()  # synthetic tree keeps document-order stable
    out: list[Any] = []

    def emit(match: _re.Match[str]) -> None:
        groups = [match.group(0), *match.groups()]
        for value_ in groups:
            element = Element("match")
            # non-participating/empty groups still carry an (empty) text
            # node so a trailing /text() yields "" (ref golden:
            # tests/test_selector.py:1128-1136)
            element.append(TextNode(value_ or ""))
            document.append(element)
            out.append(element)

    if "g" in flag_str:
        for match in compiled.finditer(text):
            emit(match)
    else:
        match = compiled.search(text)
        if match is not None:
            emit(match)
    return out


def _re_replace(
    context: ExtensionContext, value: Any, pattern: Any, flags: Any = "", repl: Any = ""
) -> str:
    text = _exslt_input_string(value)
    flag_str = _ev.to_string(flags)
    compiled = _re.compile(_ev.to_string(pattern), _re_flags(flag_str))
    count = 0 if "g" in flag_str else 1
    return compiled.sub(_ev.to_string(repl), text, count=count)


def _require_nodesets(fname: str, *values: Any) -> None:
    if not all(isinstance(v, list) for v in values):
        raise XPathEvalError(f"set:{fname} requires node-sets")


def _set_difference(context: ExtensionContext, left: Any, right: Any) -> list:
    _require_nodesets("difference", left, right)
    excluded = {id(node) for node in right}
    return [node for node in left if id(node) not in excluded]


def _set_intersection(context: ExtensionContext, left: Any, right: Any) -> list:
    _require_nodesets("intersection", left, right)
    included = {id(node) for node in right}
    return [node for node in left if id(node) in included]


def _set_has_same_node(context: ExtensionContext, left: Any, right: Any) -> bool:
    _require_nodesets("has-same-node", left, right)
    included = {id(node) for node in right}
    return any(id(node) in included for node in left)


def _split_around(left: list, right: list, fname: str) -> tuple[list, list]:
    """(nodes before ref, nodes after ref) where ref is the first node of
    ``right`` in document order — the EXSLT set:leading/set:trailing
    pivot.  Empty ``right`` keeps the whole first set (libxslt); a pivot
    NOT contained in ``left`` yields the empty set, matching libxslt's
    xmlXPathNodeLeadingSorted/TrailingSorted containment guard."""
    from ..dom import sort_document_order

    if not right:
        return list(left), list(left)
    ref = sort_document_order(list(right))[0]
    left_ids = {id(n) for n in left}
    if id(ref) not in left_ids:
        return [], []
    merged = sort_document_order(list(left))
    ref_index = next(i for i, n in enumerate(merged) if n is ref)
    before = merged[:ref_index]
    after = merged[ref_index + 1 :]
    return before, after


def _set_leading(context: ExtensionContext, left: Any, right: Any) -> list:
    _require_nodesets("leading", left, right)
    return _split_around(left, right, "leading")[0]


def _set_trailing(context: ExtensionContext, left: Any, right: Any) -> list:
    _require_nodesets("trailing", left, right)
    return _split_around(left, right, "trailing")[1]


# ---------------------------------------------------------------------------
# EXSLT strings (http://exslt.org/strings) — implemented per the public
# exslt.org specs.  NOT pre-registered as a prefix (the reference
# pre-registers only re:/set: — parsel/selector.py:418-427), but the
# implementations resolve as soon as a user registers the canonical
# namespace (``register_namespace("str", STR_NAMESPACE)``), closing the
# documented EXSLT boundary without diverging from reference prefix
# behavior.
# ---------------------------------------------------------------------------

_STR_DEFAULT_DELIMS = " \t\n\r"


def _token_nodeset(values: list[str]) -> list:
    document = Document()  # synthetic tree keeps document-order stable
    out: list[Any] = []
    for value in values:
        element = Element("token")
        element.append(TextNode(value))
        document.append(element)
        out.append(element)
    return out


def _str_tokenize(context: ExtensionContext, value: Any, delims: Any = None) -> list:
    """str:tokenize(string, delimiters?) — every CHARACTER of the
    delimiter string splits; default delimiters are XML whitespace;
    empty delimiter string → one token per character."""
    text = _ev.to_string(value)
    delim_str = _STR_DEFAULT_DELIMS if delims is None else _ev.to_string(delims)
    if not text:
        return _token_nodeset([])
    if not delim_str:
        return _token_nodeset(list(text))
    tokens = [
        t for t in _re.split("[" + _re.escape(delim_str) + "]+", text) if t
    ]
    return _token_nodeset(tokens)


def _str_split(context: ExtensionContext, value: Any, pattern: Any = None) -> list:
    """str:split(string, pattern?) — the WHOLE pattern string is the
    separator (default single space); empty pattern → per character;
    empty fields between adjacent separators are kept (spec examples:
    split('a, simple, list', ', ') → a|simple|list)."""
    text = _ev.to_string(value)
    sep = " " if pattern is None else _ev.to_string(pattern)
    if not text:
        return _token_nodeset([])
    if not sep:
        return _token_nodeset(list(text))
    return _token_nodeset(text.split(sep))


def _str_concat(context: ExtensionContext, values: Any) -> str:
    """str:concat(node-set) — concatenation of the string values in
    document order."""
    if not isinstance(values, list):
        raise XPathEvalError("str:concat requires a node-set")
    return "".join(_ev.string_value(node) for node in values)


def _str_replace_simple(
    context: ExtensionContext, value: Any, search: Any, repl: Any
) -> str:
    """str:replace with STRING search/replace arguments (the common
    form; the full node-set-parallel form is not implemented — libxslt
    itself ships str:replace unimplemented)."""
    return _ev.to_string(value).replace(
        _ev.to_string(search), _ev.to_string(repl)
    )


def _str_padding(context: ExtensionContext, length: Any, chars: Any = None) -> str:
    """str:padding(length, chars?) — a string of exactly ``length``
    characters built by repeating ``chars`` (default space)."""
    n = int(_ev.to_number(length)) if _ev.to_number(length) == _ev.to_number(length) else 0
    if n <= 0:
        return ""
    fill = " " if chars is None else _ev.to_string(chars)
    if not fill:
        return ""
    return (fill * (n // len(fill) + 1))[:n]


def _str_align(
    context: ExtensionContext, target: Any, padding: Any, alignment: Any = "left"
) -> str:
    """str:align(target, padding, alignment?) — lay ``target`` over
    ``padding`` aligned left/right/center; a target longer than the
    padding is truncated to the padding's length."""
    tgt = _ev.to_string(target)
    pad = _ev.to_string(padding)
    align = _ev.to_string(alignment) if alignment is not None else "left"
    width = len(pad)
    if len(tgt) > width:
        return tgt[:width]
    if align == "right":
        return pad[: width - len(tgt)] + tgt
    if align == "center":
        left = (width - len(tgt)) // 2
        return pad[:left] + tgt + pad[left + len(tgt):]
    return tgt + pad[len(tgt):]


def _str_encode_uri(
    context: ExtensionContext, uri: Any, encode_reserved: Any, encoding: Any = "UTF-8"
) -> str:
    """str:encode-uri(uri, encode-reserved, encoding?) — percent-encode;
    with encode-reserved=true() reserved URI characters are escaped too
    (unreserved RFC 2396 marks never are)."""
    from urllib.parse import quote

    text = _ev.to_string(uri)
    unreserved_marks = "-_.!~*'()"
    reserved = ";/?:@&=+$,[]#%"
    safe = unreserved_marks if _ev.to_boolean(encode_reserved) else (
        unreserved_marks + reserved
    )
    try:
        return quote(text, safe=safe, encoding=_ev.to_string(encoding) or "UTF-8")
    except LookupError:
        return ""  # spec: empty string for unsupported encodings


def _str_decode_uri(
    context: ExtensionContext, uri: Any, encoding: Any = "UTF-8"
) -> str:
    from urllib.parse import unquote

    try:
        return unquote(
            _ev.to_string(uri), encoding=_ev.to_string(encoding) or "UTF-8"
        )
    except LookupError:
        return ""


# ---------------------------------------------------------------------------
# EXSLT math (http://exslt.org/math) — same opt-in registration story.
# ---------------------------------------------------------------------------


def _nodeset_numbers(fname: str, values: Any) -> list[float]:
    if not isinstance(values, list):
        raise XPathEvalError(f"math:{fname} requires a node-set")
    # numbers come from each node's STRING-VALUE (a bare node is not an
    # XPath value; to_number would NaN it)
    return [_ev.to_number(_ev.string_value(node)) for node in values]


def _math_min(context: ExtensionContext, values: Any) -> float:
    nums = _nodeset_numbers("min", values)
    if not nums or any(n != n for n in nums):
        return float("nan")
    return min(nums)


def _math_max(context: ExtensionContext, values: Any) -> float:
    nums = _nodeset_numbers("max", values)
    if not nums or any(n != n for n in nums):
        return float("nan")
    return max(nums)


def _math_lowest(context: ExtensionContext, values: Any) -> list:
    nums = _nodeset_numbers("lowest", values)
    if not nums or any(n != n for n in nums):
        return []
    low = min(nums)
    return [node for node, n in zip(values, nums) if n == low]


def _math_highest(context: ExtensionContext, values: Any) -> list:
    nums = _nodeset_numbers("highest", values)
    if not nums or any(n != n for n in nums):
        return []
    high = max(nums)
    return [node for node, n in zip(values, nums) if n == high]


def _math_abs(context: ExtensionContext, value: Any) -> float:
    return abs(_ev.to_number(value))


def _math_sqrt(context: ExtensionContext, value: Any) -> float:
    number = _ev.to_number(value)
    if number < 0:
        return float("nan")
    return math.sqrt(number)


def _math_power(context: ExtensionContext, base: Any, exponent: Any) -> float:
    try:
        return math.pow(_ev.to_number(base), _ev.to_number(exponent))
    except (OverflowError, ValueError):
        return float("nan")


def _math_log(context: ExtensionContext, value: Any) -> float:
    number = _ev.to_number(value)
    if number <= 0:
        return float("nan") if number < 0 or number != number else float("-inf")
    return math.log(number)


def _math_exp(context: ExtensionContext, value: Any) -> float:
    try:
        return math.exp(_ev.to_number(value))
    except OverflowError:
        return float("inf")


_MATH_CONSTANTS = {
    "PI": math.pi,
    "E": math.e,
    "SQRRT2": math.sqrt(2.0),  # spec spells it SQRRT2
    "LN2": math.log(2.0),
    "LN10": math.log(10.0),
    "LOG2E": 1.0 / math.log(2.0),
    "SQRT1_2": math.sqrt(0.5),
}


def _math_constant(context: ExtensionContext, name: Any, precision: Any) -> float:
    value = _MATH_CONSTANTS.get(_ev.to_string(name))
    if value is None:
        return float("nan")
    digits = _ev.to_number(precision)
    if digits != digits:
        return float("nan")
    return float(f"%.{max(0, int(digits))}f" % value)


def _math_trig(fn: Callable[[float], float]) -> Callable[..., float]:
    def impl(context: ExtensionContext, value: Any) -> float:
        try:
            return fn(_ev.to_number(value))
        except ValueError:
            return float("nan")

    return impl


# ---------------------------------------------------------------------------
# EXSLT dates-and-times (http://exslt.org/dates-and-times) — implemented
# per the public exslt.org specs, same opt-in pattern as str:/math:
# above (prefix deliberately NOT pre-registered — reference parity;
# register_namespace("date", DATE_NAMESPACE) resolves them).
#
# Input forms per spec: each accessor accepts the right subset of
# xs:dateTime / xs:date / xs:gYearMonth / xs:gYear / xs:gMonthDay /
# xs:gMonth / xs:gDay (optionally timezoned); a malformed argument
# yields NaN (numbers), '' (strings) or false (leap-year), matching
# libxslt's behavior.  The no-argument form uses the current local
# date-time (spec behavior; tests always pass explicit arguments).
# ---------------------------------------------------------------------------

_TZ_PAT = r"(?:Z|[+-]\d{2}:\d{2})?"
_DATE_TIME_RE = _re.compile(
    r"^(-?\d{4,})-(\d{2})-(\d{2})T(\d{2}):(\d{2}):(\d{2}(?:\.\d+)?)"
    r"(" + _TZ_PAT + r")$"
)
_DATE_RE = _re.compile(r"^(-?\d{4,})-(\d{2})-(\d{2})(" + _TZ_PAT + r")$")
_GYM_RE = _re.compile(r"^(-?\d{4,})-(\d{2})(" + _TZ_PAT + r")$")
_GYEAR_RE = _re.compile(r"^(-?\d{4,})(" + _TZ_PAT + r")$")
_GMD_RE = _re.compile(r"^--(\d{2})-(\d{2})(" + _TZ_PAT + r")$")
_GMONTH_RE = _re.compile(r"^--(\d{2})(?:--)?(" + _TZ_PAT + r")$")
_GDAY_RE = _re.compile(r"^---(\d{2})(" + _TZ_PAT + r")$")


def _date_now_string() -> str:
    import datetime as _dt

    return _dt.datetime.now().astimezone().isoformat(timespec="seconds")


def _date_arg(value: Any) -> str:
    if value is None:
        return _date_now_string()
    return _ev.to_string(value)


def _parse_ymd(text: str) -> tuple[int, int, int] | None:
    """(year, month, day) from a dateTime or date string, else None."""
    match = _DATE_TIME_RE.match(text) or _DATE_RE.match(text)
    if not match:
        return None
    return int(match.group(1)), int(match.group(2)), int(match.group(3))


def _valid_date(y: int, m: int, d: int):
    import datetime as _dt

    try:
        return _dt.date(y, m, d)
    except ValueError:
        return None


def _date_date_time(context: ExtensionContext) -> str:
    """date:date-time() — the current date-time as an ISO 8601 string
    with timezone (no-argument per spec)."""
    return _date_now_string()


def _date_date(context: ExtensionContext, value: Any = None) -> str:
    """date:date(string?) — the date portion (CCYY-MM-DD), keeping any
    timezone; '' for malformed input."""
    text = _date_arg(value)
    match = _DATE_TIME_RE.match(text)
    if match:
        return "%s-%s-%s%s" % (
            match.group(1), match.group(2), match.group(3), match.group(7)
        )
    if _DATE_RE.match(text):
        return text
    return ""


def _date_time(context: ExtensionContext, value: Any = None) -> str:
    """date:time(string?) — the time portion (hh:mm:ss with any
    fraction/timezone); '' when the argument carries no time."""
    text = _date_arg(value)
    match = _DATE_TIME_RE.match(text)
    if not match:
        return ""
    return "%s:%s:%s%s" % (
        match.group(4), match.group(5), match.group(6), match.group(7)
    )


def _date_year(context: ExtensionContext, value: Any = None) -> float:
    """date:year(string?) — accepts dateTime/date/gYearMonth/gYear."""
    text = _date_arg(value)
    for pattern in (_DATE_TIME_RE, _DATE_RE, _GYM_RE, _GYEAR_RE):
        match = pattern.match(text)
        if match:
            return float(int(match.group(1)))
    return float("nan")


def _date_month_in_year(context: ExtensionContext, value: Any = None) -> float:
    """date:month-in-year(string?) — 1..12; accepts
    dateTime/date/gYearMonth/gMonthDay/gMonth."""
    text = _date_arg(value)
    for pattern, group in (
        (_DATE_TIME_RE, 2), (_DATE_RE, 2), (_GYM_RE, 2),
        (_GMD_RE, 1), (_GMONTH_RE, 1),
    ):
        match = pattern.match(text)
        if match:
            month = int(match.group(group))
            if 1 <= month <= 12:
                return float(month)
            return float("nan")
    return float("nan")


def _date_day_in_month(context: ExtensionContext, value: Any = None) -> float:
    """date:day-in-month(string?) — 1..31; accepts
    dateTime/date/gMonthDay/gDay."""
    text = _date_arg(value)
    for pattern, group in (
        (_DATE_TIME_RE, 3), (_DATE_RE, 3), (_GMD_RE, 2), (_GDAY_RE, 1),
    ):
        match = pattern.match(text)
        if match:
            day = int(match.group(group))
            if 1 <= day <= 31:
                return float(day)
            return float("nan")
    return float("nan")


def _date_day_of_week_in_month(
    context: ExtensionContext, value: Any = None
) -> float:
    """date:day-of-week-in-month(string?) — which occurrence of its
    weekday the day is (the 21st is the 3rd of its weekday)."""
    ymd = _parse_ymd(_date_arg(value))
    if ymd is None or _valid_date(*ymd) is None:
        return float("nan")
    return float((ymd[2] - 1) // 7 + 1)


def _date_day_in_week(context: ExtensionContext, value: Any = None) -> float:
    """date:day-in-week(string?) — 1=Sunday .. 7=Saturday."""
    ymd = _parse_ymd(_date_arg(value))
    if ymd is None:
        return float("nan")
    date_obj = _valid_date(*ymd)
    if date_obj is None:
        return float("nan")
    return float((date_obj.weekday() + 1) % 7 + 1)


def _date_day_in_year(context: ExtensionContext, value: Any = None) -> float:
    """date:day-in-year(string?) — 1..366."""
    ymd = _parse_ymd(_date_arg(value))
    if ymd is None:
        return float("nan")
    date_obj = _valid_date(*ymd)
    if date_obj is None:
        return float("nan")
    return float(date_obj.timetuple().tm_yday)


def _date_week_in_year(context: ExtensionContext, value: Any = None) -> float:
    """date:week-in-year(string?) — ISO 8601 week number."""
    ymd = _parse_ymd(_date_arg(value))
    if ymd is None:
        return float("nan")
    date_obj = _valid_date(*ymd)
    if date_obj is None:
        return float("nan")
    return float(date_obj.isocalendar()[1])


def _date_leap_year(context: ExtensionContext, value: Any = None) -> bool:
    """date:leap-year(string?) — accepts dateTime/date/gYearMonth/gYear;
    false for malformed input (libxslt behavior)."""
    text = _date_arg(value)
    for pattern in (_DATE_TIME_RE, _DATE_RE, _GYM_RE, _GYEAR_RE):
        match = pattern.match(text)
        if match:
            year = int(match.group(1))
            return year % 4 == 0 and (year % 100 != 0 or year % 400 == 0)
    return False


_DURATION_RE = _re.compile(
    r"^(-)?P(?:(\d+)Y)?(?:(\d+)M)?(?:(\d+)D)?"
    r"(?:T(?:(\d+)H)?(?:(\d+)M)?(?:(\d+(?:\.\d+)?)S)?)?$"
)


def _parse_duration(text: str) -> tuple[int, float] | None:
    """xs:duration → (months, seconds); None on malformed input (a bare
    'P'/'PT' with no components is malformed per XML Schema)."""
    match = _DURATION_RE.match(text.strip())
    if not match:
        return None
    sign, y, mo, d, h, mi, s = match.groups()
    if all(g is None for g in (y, mo, d, h, mi, s)):
        return None
    months = int(y or 0) * 12 + int(mo or 0)
    seconds = (
        int(d or 0) * 86400.0
        + int(h or 0) * 3600.0
        + int(mi or 0) * 60.0
        + float(s or 0)
    )
    if sign:
        months, seconds = -months, -seconds
    return months, seconds


def _format_duration(months: int, seconds: float) -> str:
    """Canonical duration string; '' when signs are mixed (no canonical
    form exists — libxslt's add-duration fails there too)."""
    if months == 0 and seconds == 0:
        return "PT0S"
    if (months > 0 and seconds < 0) or (months < 0 and seconds > 0):
        return ""
    neg = months < 0 or seconds < 0
    months, seconds = abs(months), abs(seconds)
    years, months = divmod(months, 12)
    days, rem = divmod(seconds, 86400.0)
    hours, rem = divmod(rem, 3600.0)
    minutes, secs = divmod(rem, 60.0)
    out = "P"
    if years:
        out += f"{int(years)}Y"
    if months:
        out += f"{int(months)}M"
    if days:
        out += f"{int(days)}D"
    time_part = ""
    if hours:
        time_part += f"{int(hours)}H"
    if minutes:
        time_part += f"{int(minutes)}M"
    if secs:
        if secs == int(secs):
            time_part += f"{int(secs)}S"
        else:
            # canonical decimal form, not float repr: 0.1+0.2 must print
            # PT0.3S, never PT0.30000000000000004S; 9 fractional digits
            # then trailing zeros stripped (sub-nanosecond residue
            # canonicalizes away)
            dec = f"{secs:.9f}".rstrip("0").rstrip(".")
            if dec not in ("0", ""):
                time_part += f"{dec}S"
    if time_part:
        out += "T" + time_part
    return ("-" if neg else "") + out


def _tz_offset_seconds(tz: str) -> int:
    if not tz or tz == "Z":
        return 0
    sign = 1 if tz[0] == "+" else -1
    hh, mm = tz[1:].split(":")
    return sign * (int(hh) * 3600 + int(mm) * 60)


def _parse_datetime_full(text: str):
    """(datetime, had_time) in UTC for dateTime/date input, else None."""
    import datetime as _dt

    match = _DATE_TIME_RE.match(text)
    if match:
        y, mo, d = int(match.group(1)), int(match.group(2)), int(match.group(3))
        h, mi = int(match.group(4)), int(match.group(5))
        sec = float(match.group(6))
        try:
            base = _dt.datetime(y, mo, d, h, mi) + _dt.timedelta(seconds=sec)
        except ValueError:
            return None
        return (
            base - _dt.timedelta(seconds=_tz_offset_seconds(match.group(7))),
            True,
        )
    match = _DATE_RE.match(text)
    if match:
        y, mo, d = int(match.group(1)), int(match.group(2)), int(match.group(3))
        try:
            base = _dt.datetime(y, mo, d)
        except ValueError:
            return None
        return (
            base - _dt.timedelta(seconds=_tz_offset_seconds(match.group(4))),
            False,
        )
    return None


def _date_seconds(context: ExtensionContext, value: Any = None) -> float:
    """date:seconds(string?) — seconds since 1970-01-01T00:00:00Z for a
    dateTime/date argument, or the total seconds of a duration (year/
    month components cannot be converted → NaN, per spec)."""
    import datetime as _dt

    text = _date_arg(value)
    parsed = _parse_datetime_full(text)
    if parsed is not None:
        epoch = _dt.datetime(1970, 1, 1)
        return (parsed[0] - epoch).total_seconds()
    dur = _parse_duration(text)
    if dur is not None:
        months, seconds = dur
        if months:
            return float("nan")
        return seconds
    return float("nan")


def _date_duration(context: ExtensionContext, value: Any = None) -> str:
    """date:duration(number?) — canonical duration for a second count
    (default: date:seconds() of now, spec; tests pass explicit
    values)."""
    if value is None:
        return ""
    try:
        seconds = _ev.to_number(value)
    except Exception:
        return ""
    if seconds != seconds:  # NaN
        return ""
    return _format_duration(0, float(seconds))


def _add_months_clamped(y: int, mo: int, d: int, months: int):
    import calendar as _cal

    total = (y * 12 + (mo - 1)) + months
    ny, nmo = divmod(total, 12)
    nmo += 1
    return ny, nmo, min(d, _cal.monthrange(ny, nmo)[1])


def _date_add(context: ExtensionContext, date_value: Any, dur_value: Any) -> str:
    """date:add(date, duration) — XML Schema addition order (years/
    months first with end-of-month clamping, then days/seconds);
    result keeps the argument's precision."""
    import datetime as _dt

    text = _ev.to_string(date_value)
    dur = _parse_duration(_ev.to_string(dur_value))
    if dur is None:
        return ""
    months, seconds = dur
    match = _GYEAR_RE.match(text)
    if match and not _DATE_RE.match(text) and not _DATE_TIME_RE.match(text):
        y = int(match.group(1))
        ny, _, _ = _add_months_clamped(y, 1, 1, months)
        if seconds:
            return ""
        return f"{ny:04d}"
    match = _GYM_RE.match(text)
    if match and not _DATE_RE.match(text):
        y, mo = int(match.group(1)), int(match.group(2))
        ny, nmo, _ = _add_months_clamped(y, mo, 1, months)
        if seconds:
            return ""
        return f"{ny:04d}-{nmo:02d}"
    for pattern, had_time in ((_DATE_TIME_RE, True), (_DATE_RE, False)):
        match = pattern.match(text)
        if not match:
            continue
        y, mo, d = int(match.group(1)), int(match.group(2)), int(match.group(3))
        ny, nmo, nd = _add_months_clamped(y, mo, d, months)
        try:
            if had_time:
                h, mi = int(match.group(4)), int(match.group(5))
                sec = float(match.group(6))
                base = _dt.datetime(ny, nmo, nd, h, mi) + _dt.timedelta(
                    seconds=sec
                )
                tz = match.group(7)
            else:
                base = _dt.datetime(ny, nmo, nd)
                tz = match.group(4)
        except ValueError:
            return ""
        shifted = base + _dt.timedelta(seconds=seconds)
        if had_time or seconds % 86400 != 0:
            out = shifted.strftime("%Y-%m-%dT%H:%M:%S")
            frac = shifted.microsecond
            if frac:
                out += f".{frac:06d}".rstrip("0")
            return out + (tz or "")
        return shifted.strftime("%Y-%m-%d") + (tz or "")
    return ""


def _date_difference(context: ExtensionContext, start: Any, end: Any) -> str:
    """date:difference(start, end) — duration from start to end.  Both
    at year/month precision → PnYnM form; otherwise exact day/time
    duration from dateTime subtraction."""
    s_text = _ev.to_string(start)
    e_text = _ev.to_string(end)

    def ym_only(text: str):
        if _DATE_TIME_RE.match(text) or _DATE_RE.match(text):
            return None
        match = _GYM_RE.match(text)
        if match:
            return int(match.group(1)) * 12 + int(match.group(2)) - 1
        match = _GYEAR_RE.match(text)
        if match:
            return int(match.group(1)) * 12
        return None

    s_months, e_months = ym_only(s_text), ym_only(e_text)
    if s_months is not None and e_months is not None:
        return _format_duration(e_months - s_months, 0)
    s_parsed = _parse_datetime_full(s_text)
    e_parsed = _parse_datetime_full(e_text)
    if s_parsed is None or e_parsed is None:
        return ""
    delta = (e_parsed[0] - s_parsed[0]).total_seconds()
    return _format_duration(0, delta)


def _date_add_duration(context: ExtensionContext, d1: Any, d2: Any) -> str:
    """date:add-duration(d1, d2) — componentwise sum; '' when either is
    malformed or the sum has no canonical form (mixed signs)."""
    a = _parse_duration(_ev.to_string(d1))
    b = _parse_duration(_ev.to_string(d2))
    if a is None or b is None:
        return ""
    return _format_duration(a[0] + b[0], a[1] + b[1])


def _date_sum(context: ExtensionContext, nodes: Any) -> str:
    """date:sum(node-set) — fold of add-duration over the node-set's
    string values; '' if any element is malformed."""
    if not isinstance(nodes, list):
        return ""
    months, seconds = 0, 0.0
    for node in nodes:
        dur = _parse_duration(_ev.string_value(node))
        if dur is None:
            return ""
        months += dur[0]
        seconds += dur[1]
    return _format_duration(months, seconds)


DEFAULT_EXTENSIONS: dict[tuple[str | None, str], Callable[..., Any]] = {
    (None, "has-class"): has_class,
    (RE_NAMESPACE, "test"): _re_test,
    (RE_NAMESPACE, "match"): _re_match,
    (RE_NAMESPACE, "replace"): _re_replace,
    # the full libxslt EXSLT-sets surface the reference pre-registers
    # (reference parsel/selector.py:418-427 comment block)
    (SET_NAMESPACE, "difference"): _set_difference,
    (SET_NAMESPACE, "intersection"): _set_intersection,
    (SET_NAMESPACE, "has-same-node"): _set_has_same_node,
    (SET_NAMESPACE, "leading"): _set_leading,
    (SET_NAMESPACE, "trailing"): _set_trailing,
    # EXSLT strings/math: resolvable once the user registers the
    # canonical namespace (prefixes deliberately NOT pre-registered —
    # reference parity; see the section comment above)
    (STR_NAMESPACE, "tokenize"): _str_tokenize,
    (STR_NAMESPACE, "split"): _str_split,
    (STR_NAMESPACE, "concat"): _str_concat,
    (STR_NAMESPACE, "replace"): _str_replace_simple,
    (STR_NAMESPACE, "padding"): _str_padding,
    (STR_NAMESPACE, "align"): _str_align,
    (STR_NAMESPACE, "encode-uri"): _str_encode_uri,
    (STR_NAMESPACE, "decode-uri"): _str_decode_uri,
    (MATH_NAMESPACE, "min"): _math_min,
    (MATH_NAMESPACE, "max"): _math_max,
    (MATH_NAMESPACE, "lowest"): _math_lowest,
    (MATH_NAMESPACE, "highest"): _math_highest,
    (MATH_NAMESPACE, "abs"): _math_abs,
    (MATH_NAMESPACE, "sqrt"): _math_sqrt,
    (MATH_NAMESPACE, "power"): _math_power,
    (MATH_NAMESPACE, "log"): _math_log,
    (MATH_NAMESPACE, "exp"): _math_exp,
    (MATH_NAMESPACE, "constant"): _math_constant,
    (MATH_NAMESPACE, "sin"): _math_trig(math.sin),
    (MATH_NAMESPACE, "cos"): _math_trig(math.cos),
    (MATH_NAMESPACE, "tan"): _math_trig(math.tan),
    # EXSLT dates-and-times: same opt-in pattern (see section comment)
    (DATE_NAMESPACE, "date-time"): _date_date_time,
    (DATE_NAMESPACE, "date"): _date_date,
    (DATE_NAMESPACE, "time"): _date_time,
    (DATE_NAMESPACE, "year"): _date_year,
    (DATE_NAMESPACE, "month-in-year"): _date_month_in_year,
    (DATE_NAMESPACE, "day-in-month"): _date_day_in_month,
    (DATE_NAMESPACE, "day-of-week-in-month"): _date_day_of_week_in_month,
    (DATE_NAMESPACE, "day-in-week"): _date_day_in_week,
    (DATE_NAMESPACE, "day-in-year"): _date_day_in_year,
    (DATE_NAMESPACE, "week-in-year"): _date_week_in_year,
    (DATE_NAMESPACE, "leap-year"): _date_leap_year,
    (DATE_NAMESPACE, "seconds"): _date_seconds,
    (DATE_NAMESPACE, "duration"): _date_duration,
    (DATE_NAMESPACE, "add"): _date_add,
    (DATE_NAMESPACE, "difference"): _date_difference,
    (DATE_NAMESPACE, "add-duration"): _date_add_duration,
    (DATE_NAMESPACE, "sum"): _date_sum,
}

_USER_EXTENSIONS: dict[tuple[str | None, str], Callable[..., Any]] = {}


def set_xpathfunc(fname: str, func: Callable[..., Any] | None) -> None:
    """Register (or with ``func=None`` unregister) a global extension
    function, mirroring the reference API (parsel/xpathfuncs.py:16-34)."""
    key = (None, fname)
    if func is not None:
        DEFAULT_EXTENSIONS[key] = func
        _USER_EXTENSIONS[key] = func
    else:
        if key not in _USER_EXTENSIONS and key not in DEFAULT_EXTENSIONS:
            raise KeyError(fname)
        DEFAULT_EXTENSIONS.pop(key, None)
        _USER_EXTENSIONS.pop(key, None)
        if fname == "has-class":
            DEFAULT_EXTENSIONS[key] = has_class


def setup() -> None:
    """Kept for API parity with ``parsel.xpathfuncs.setup`` — the default
    extensions are always registered."""
    DEFAULT_EXTENSIONS[(None, "has-class")] = has_class
