"""CSS selector → XPath translation (query compiler front-end).

From-scratch replacement for cssselect + the reference's pseudo-element
extension (parsel/csstranslator.py): supports the grammar subset the
reference exercises (type/`*`, `#id`, `.class`, `[attr]`/`[attr op v]`,
descendant/`>`/`+`/`~` combinators, `,` groups, structural pseudo-classes,
`:has()`, `:not()`) plus parsel's `::text` and `::attr(name)`
pseudo-elements with their exact translation goldens
(tests/test_selector_csstranslator.py:64-117).

Translation runs entirely on the driver; only the resulting XPath string
ships to executors.
"""

from __future__ import annotations

import re
from functools import lru_cache
from typing import Any


class SelectorSyntaxError(Exception):
    """Unparsable CSS selector (tokenizer/grammar level)."""


class ExpressionError(Exception):
    """Parsable CSS that cannot be translated (unknown pseudo, bad args)."""


# ---------------------------------------------------------------------------
# tokenizer
# ---------------------------------------------------------------------------

_TOKEN_RE = re.compile(
    r"""
      (?P<ws>\s+)
    | (?P<string>"[^"]*"|'[^']*')
    | (?P<number>[-+]?\d+(\.\d+)?)
    | (?P<ident>-?[^\W\d][\w-]*)
    | (?P<hash>\#[\w-]+)
    | (?P<op2>::|[~^$*|]=)
    | (?P<op1>[.*>+~,\[\]()=:|])
    """,
    re.UNICODE | re.VERBOSE,
)


def _tokenize(css: str) -> list[tuple[str, str]]:
    tokens: list[tuple[str, str]] = []
    pos = 0
    while pos < len(css):
        match = _TOKEN_RE.match(css, pos)
        if match is None or match.end() == pos:
            raise SelectorSyntaxError(f"Unexpected character at {pos}: {css!r}")
        pos = match.end()
        kind = match.lastgroup
        value = match.group(kind)  # type: ignore[arg-type]
        if kind == "string":
            value = value[1:-1]
        elif kind == "hash":
            value = value[1:]
        tokens.append((kind, value))  # type: ignore[arg-type]
    tokens.append(("eof", ""))
    return tokens


_SERIES_RE = re.compile(r"^(?:(?P<a>[-+]?\d*)n(?P<b>[-+]\d+)?|(?P<b_only>[-+]?\d+))$")


def _parse_series(args: list[tuple[str, str]]) -> tuple[int, int]:
    """CSS ``an+b`` series from pseudo-function argument tokens → (a, b).

    Accepts ``odd``/``even``, bare integers, and every an+b spelling the
    tokenizer can split ("2n+1" → number/ident/number, "-n-1" → one
    ident, ...) by re-joining the tokens and matching the grammar.
    Raises ValueError on anything else (cssselect parse_series parity)."""
    text = "".join(v for k, v in args if k != "ws").strip().lower()
    if text == "odd":
        return 2, 1
    if text == "even":
        return 2, 0
    match = _SERIES_RE.match(text)
    if match is None:
        raise ValueError(f"Invalid series: {text!r}")
    if match.group("b_only") is not None:
        return 0, int(match.group("b_only"))
    a_txt = match.group("a")
    a = 1 if a_txt in ("", "+") else (-1 if a_txt == "-" else int(a_txt))
    b = int(match.group("b") or 0)
    return a, b


# ---------------------------------------------------------------------------
# parser
# ---------------------------------------------------------------------------


class Compound:
    __slots__ = ("element", "conditions", "pseudo_element")

    def __init__(self) -> None:
        self.element: str | None = None
        # conditions: ('hash', v) ('class', v) ('attrib', op, name, value)
        # ('pseudo', name) ('function', name, [tokens]) ('not', Compound)
        # ('has', combinator, ComplexSelector)
        self.conditions: list[tuple] = []
        # pseudo_element: ('simple', name) | ('function', name, [tokens])
        self.pseudo_element: tuple | None = None


class Complex:
    """First compound plus (combinator, compound) tail."""

    __slots__ = ("head", "tail")

    def __init__(self, head: Compound) -> None:
        self.head = head
        self.tail: list[tuple[str, Compound]] = []


_LEGACY_PSEUDO_ELEMENTS = frozenset({"before", "after", "first-line", "first-letter"})


class _CSSParser:
    def __init__(self, tokens: list[tuple[str, str]]) -> None:
        self.tokens = tokens
        self.index = 0

    @property
    def current(self) -> tuple[str, str]:
        return self.tokens[self.index]

    def advance(self) -> tuple[str, str]:
        token = self.tokens[self.index]
        if token[0] != "eof":
            self.index += 1
        return token

    def skip_ws(self) -> bool:
        skipped = False
        while self.current[0] == "ws":
            self.advance()
            skipped = True
        return skipped

    def at(self, kind: str, value: str | None = None) -> bool:
        token = self.current
        return token[0] == kind and (value is None or token[1] == value)

    # -- grammar ---------------------------------------------------------
    def parse_group(self) -> list[Complex]:
        out = [self.parse_complex()]
        self.skip_ws()
        while self.at("op1", ","):
            self.advance()
            self.skip_ws()
            out.append(self.parse_complex())
            self.skip_ws()
        if self.current[0] != "eof":
            raise SelectorSyntaxError(f"Unexpected token {self.current!r}")
        return out

    def parse_complex(self) -> Complex:
        self.skip_ws()
        complex_sel = Complex(self.parse_compound())
        while True:
            had_ws = self.skip_ws()
            if self.at("op1", ">") or self.at("op1", "+") or self.at("op1", "~"):
                combinator = self.advance()[1]
                self.skip_ws()
            elif had_ws and not (
                self.at("op1", ",") or self.current[0] == "eof"
            ):
                combinator = " "
            else:
                break
            if complex_sel.head.pseudo_element or (
                complex_sel.tail and complex_sel.tail[-1][1].pseudo_element
            ):
                raise SelectorSyntaxError("Pseudo-element must be at the end")
            complex_sel.tail.append((combinator, self.parse_compound()))
        return complex_sel

    def parse_compound(self) -> Compound:
        compound = Compound()
        matched = False
        if self.at("ident"):
            compound.element = self.advance()[1]
            matched = True
        elif self.at("op1", "*"):
            self.advance()
            compound.element = None
            matched = True
        while True:
            if compound.pseudo_element is not None and not (
                self.current[0] == "eof"
                or self.at("op1", ",")
                or self.current[0] == "ws"
            ):
                raise SelectorSyntaxError("Nothing may follow a pseudo-element")
            if self.at("hash"):
                compound.conditions.append(("hash", self.advance()[1]))
            elif self.at("op1", "."):
                self.advance()
                if not self.at("ident"):
                    raise SelectorSyntaxError("Expected class name after '.'")
                compound.conditions.append(("class", self.advance()[1]))
            elif self.at("op1", "["):
                self.advance()
                compound.conditions.append(self.parse_attrib())
            elif self.at("op2", "::"):
                self.advance()
                compound.pseudo_element = self.parse_pseudo_element()
            elif self.at("op1", ":"):
                self.advance()
                self.parse_pseudo_class(compound)
            else:
                break
            matched = True
        if not matched and compound.pseudo_element is None:
            raise SelectorSyntaxError(f"Expected selector, got {self.current!r}")
        return compound

    def parse_attrib(self) -> tuple:
        self.skip_ws()
        if not self.at("ident"):
            raise SelectorSyntaxError("Expected attribute name")
        name = self.advance()[1]
        self.skip_ws()
        if self.at("op1", "]"):
            self.advance()
            return ("attrib", "exists", name, "")
        if self.at("op1", "="):
            op = "="
            self.advance()
        elif self.current[0] == "op2" and self.current[1] in ("~=", "^=", "$=", "*=", "|="):
            op = self.advance()[1]
        else:
            raise SelectorSyntaxError(f"Unexpected token in attrib: {self.current!r}")
        self.skip_ws()
        if self.at("string") or self.at("ident") or self.at("number"):
            value = self.advance()[1]
        else:
            raise SelectorSyntaxError(f"Expected attribute value, got {self.current!r}")
        self.skip_ws()
        if not self.at("op1", "]"):
            raise SelectorSyntaxError("Expected ']'")
        self.advance()
        return ("attrib", op, name, value)

    def _parse_function_args(self) -> list[tuple[str, str]]:
        """Collect raw argument tokens until ')'; rejects invalid tokens
        at the tokenizer level (``::attr(@href)`` → SelectorSyntaxError)."""
        args: list[tuple[str, str]] = []
        while not self.at("op1", ")"):
            token = self.current
            if token[0] == "eof":
                raise SelectorSyntaxError("Unclosed function call")
            if token[0] in ("ident", "string", "number"):
                args.append(self.advance())
            elif token[0] == "op1" and token[1] in ("+", "-"):
                # sign/series operators are argument CONTENT (an+b series
                # "2n + 1") — keep them for the consumer's parser
                args.append(self.advance())
            elif token[0] == "ws" or (token[0] == "op1" and token[1] == ","):
                self.advance()
            else:
                raise SelectorSyntaxError(f"Invalid token in function: {token!r}")
        self.advance()  # ')'
        return args

    def parse_pseudo_element(self) -> tuple:
        if not self.at("ident"):
            raise SelectorSyntaxError("Expected pseudo-element name")
        name = self.advance()[1]
        if self.at("op1", "("):
            self.advance()
            args = self._parse_function_args()
            return ("function", name, args)
        return ("simple", name)

    def parse_pseudo_class(self, compound: Compound) -> None:
        if not self.at("ident"):
            raise SelectorSyntaxError("Expected pseudo-class name")
        name = self.advance()[1]
        if name in _LEGACY_PSEUDO_ELEMENTS:
            compound.pseudo_element = ("simple", name)
            return
        if self.at("op1", "("):
            self.advance()
            if name == "not":
                self.skip_ws()
                inner = self.parse_compound()
                self.skip_ws()
                if not self.at("op1", ")"):
                    raise SelectorSyntaxError("Expected ')' in :not()")
                self.advance()
                compound.conditions.append(("not", inner))
            elif name == "has":
                self.skip_ws()
                combinator = " "
                if self.at("op1", ">") or self.at("op1", "+") or self.at("op1", "~"):
                    combinator = self.advance()[1]
                    self.skip_ws()
                inner_complex = self.parse_complex()
                self.skip_ws()
                if not self.at("op1", ")"):
                    raise SelectorSyntaxError("Expected ')' in :has()")
                self.advance()
                compound.conditions.append(("has", combinator, inner_complex))
            else:
                args = self._parse_function_args()
                compound.conditions.append(("function", name, args))
        else:
            compound.conditions.append(("pseudo", name))


# ---------------------------------------------------------------------------
# translator
# ---------------------------------------------------------------------------


class XPathExpr:
    """Mutable XPath build state mirroring the reference's XPathExpr
    (parsel/csstranslator.py:17-65) including the ``::text``/``::attr``
    carry-through rules pinned by its goldens."""

    __slots__ = ("path", "element", "condition", "textnode", "attribute")

    def __init__(self, path: str = "", element: str = "*", condition: str = "") -> None:
        self.path = path
        self.element = element
        self.condition = condition
        self.textnode = False
        self.attribute: str | None = None

    def add_condition(self, condition: str) -> None:
        if self.condition:
            self.condition = f"{self.condition} and ({condition})"
        else:
            self.condition = condition

    def add_name_test(self) -> None:
        if self.element != "*":
            self.add_condition(f"name() = '{self.element}'")
            self.element = "*"

    def base_str(self) -> str:
        path = self.path + self.element
        if self.condition:
            path += f"[{self.condition}]"
        return path

    def __str__(self) -> str:
        path = self.base_str()
        if self.textnode:
            if path == "*":
                path = "text()"
            elif path.endswith("::*/*"):
                path = path[:-3] + "text()"
            else:
                path += "/text()"
        if self.attribute is not None:
            if path.endswith("::*/*"):
                path = path[:-2]
            path += f"/@{self.attribute}"
        return path

    def join(self, combiner: str, other: "XPathExpr") -> "XPathExpr":
        self.path = self.base_str() + combiner
        self.element = other.element
        self.condition = other.condition
        self.textnode = other.textnode
        self.attribute = other.attribute
        return self


class GenericTranslator:
    """XML-profile translator (case-sensitive names)."""

    lowercase_elements = False
    lowercase_attributes = False

    # -- public API ------------------------------------------------------
    @lru_cache(maxsize=256)
    def css_to_xpath(self, css: str, prefix: str = "descendant-or-self::") -> str:
        selectors = _CSSParser(_tokenize(css)).parse_group()
        return " | ".join(
            prefix + str(self.xpath_complex(sel)) for sel in selectors
        )

    # -- translation -----------------------------------------------------
    def xpath_complex(self, complex_sel: Complex) -> XPathExpr:
        xpath = self.xpath_compound(complex_sel.head)
        for combinator, compound in complex_sel.tail:
            right = self.xpath_compound(compound)
            if combinator == " ":
                xpath.join("/descendant-or-self::*/", right)
            elif combinator == ">":
                xpath.join("/", right)
            elif combinator == "~":
                xpath.join("/following-sibling::", right)
            elif combinator == "+":
                xpath.join("/following-sibling::", right)
                xpath.add_name_test()
                xpath.add_condition("position() = 1")
            else:  # pragma: no cover
                raise ExpressionError(f"Unknown combinator {combinator!r}")
        return xpath

    def xpath_compound(self, compound: Compound) -> XPathExpr:
        element = compound.element or "*"
        if self.lowercase_elements:
            element = element.lower()
        xpath = XPathExpr(element=element)
        for condition in compound.conditions:
            self.apply_condition(xpath, condition)
        if compound.pseudo_element is not None:
            self.apply_pseudo_element(xpath, compound.pseudo_element)
        return xpath

    def apply_condition(self, xpath: XPathExpr, condition: tuple) -> None:
        kind = condition[0]
        if kind == "hash":
            xpath.add_condition(f"@id = '{condition[1]}'")
        elif kind == "class":
            cls = condition[1]
            xpath.add_condition(
                "@class and contains("
                f"concat(' ', normalize-space(@class), ' '), ' {cls} ')"
            )
        elif kind == "attrib":
            self.apply_attrib(xpath, condition[1], condition[2], condition[3])
        elif kind == "pseudo":
            self.apply_pseudo_class(xpath, condition[1])
        elif kind == "function":
            self.apply_pseudo_function(xpath, condition[1], condition[2])
        elif kind == "not":
            inner = self.xpath_compound(condition[1])
            parts = []
            if condition[1].element is not None:
                name = condition[1].element
                if self.lowercase_elements:
                    name = name.lower()
                parts.append(f"name() = '{name}'")
            if inner.condition:
                parts.append(inner.condition)
            if not parts:
                parts.append("true()")
            xpath.add_condition(f"not({' and '.join(parts)})")
        elif kind == "has":
            combinator, inner_complex = condition[1], condition[2]
            inner = self.xpath_complex(inner_complex)
            axis = {" ": "descendant::", ">": "child::",
                    "~": "following-sibling::", "+": "following-sibling::"}[combinator]
            xpath.add_condition(axis + inner.base_str())
        else:  # pragma: no cover
            raise ExpressionError(f"Unknown condition {kind!r}")

    def apply_attrib(self, xpath: XPathExpr, op: str, name: str, value: str) -> None:
        if self.lowercase_attributes:
            name = name.lower()
        attr = f"@{name}"
        if op == "exists":
            xpath.add_condition(attr)
        elif op == "=":
            xpath.add_condition(f"{attr} = '{value}'")
        elif op == "~=":
            xpath.add_condition(
                f"{attr} and contains(concat(' ', normalize-space({attr}), ' '), ' {value} ')"
            )
        elif op == "^=":
            xpath.add_condition(f"{attr} and starts-with({attr}, '{value}')")
        elif op == "$=":
            xpath.add_condition(
                f"{attr} and substring({attr}, string-length({attr})-{len(value) - 1})"
                f" = '{value}'"
            )
        elif op == "*=":
            xpath.add_condition(f"{attr} and contains({attr}, '{value}')")
        elif op == "|=":
            xpath.add_condition(
                f"{attr} and ({attr} = '{value}' or starts-with({attr}, '{value}-'))"
            )
        else:  # pragma: no cover
            raise ExpressionError(f"Unknown attribute operator {op!r}")

    def _of_type_nodetest(self, xpath: XPathExpr, pseudo: str) -> str:
        """The sibling node test for the *-of-type family — requires a
        concrete element name (``*:nth-of-type()`` is undefined, matching
        cssselect's refusal)."""
        if xpath.element == "*":
            raise ExpressionError(f":{pseudo} requires an element name")
        return xpath.element

    def _nth_condition(
        self, siblings: str, a: int, b: int
    ) -> str:
        """XPath condition for "position = a·n + b (n ≥ 0)" stated over
        ``count(<siblings>)`` (= position - 1), the same closed form
        cssselect derives from the CSS3 structural-pseudo spec."""
        if a == 0:
            return f"count({siblings}) = {b - 1}"
        expressions = []
        if a > 0:
            if b > 1:
                expressions.append(f"count({siblings}) >= {b - 1}")
        else:
            if b < 1:
                return "1 = 0"  # a<0 with b<1 can never match
            expressions.append(f"count({siblings}) <= {b - 1}")
        if abs(a) != 1:
            offset = (1 - b) % abs(a)
            left = f"count({siblings})"
            if offset:
                left = f"(count({siblings}) + {offset})"
            expressions.append(f"{left} mod {a} = 0")
        return " and ".join(expressions) or "true()"

    def apply_pseudo_class(self, xpath: XPathExpr, name: str) -> None:
        if name == "first-child":
            xpath.add_condition("count(preceding-sibling::*) = 0")
        elif name == "last-child":
            xpath.add_condition("count(following-sibling::*) = 0")
        elif name == "only-child":
            xpath.add_condition(
                "count(preceding-sibling::*) = 0 and count(following-sibling::*) = 0"
            )
        elif name == "first-of-type":
            test = self._of_type_nodetest(xpath, name)
            xpath.add_condition(f"count(preceding-sibling::{test}) = 0")
        elif name == "last-of-type":
            test = self._of_type_nodetest(xpath, name)
            xpath.add_condition(f"count(following-sibling::{test}) = 0")
        elif name == "only-of-type":
            test = self._of_type_nodetest(xpath, name)
            xpath.add_condition(
                f"count(preceding-sibling::{test}) = 0 and "
                f"count(following-sibling::{test}) = 0"
            )
        elif name == "empty":
            xpath.add_condition("not(*) and not(string-length())")
        elif name == "root":
            xpath.add_condition("not(parent::*)")
        else:
            raise ExpressionError(f"The pseudo-class :{name} is unknown")

    def apply_pseudo_function(
        self, xpath: XPathExpr, name: str, args: list[tuple[str, str]]
    ) -> None:
        nth = {
            "nth-child": ("preceding-sibling", False),
            "nth-last-child": ("following-sibling", False),
            "nth-of-type": ("preceding-sibling", True),
            "nth-last-of-type": ("following-sibling", True),
        }
        if name in nth:
            axis, of_type = nth[name]
            try:
                a, b = _parse_series(args)
            except ValueError:
                raise ExpressionError(
                    f"Invalid :{name}() series {args!r}"
                ) from None
            test = self._of_type_nodetest(xpath, name) if of_type else "*"
            xpath.add_condition(
                self._nth_condition(f"{axis}::{test}", a, b)
            )
            return
        if name == "contains":
            if len(args) == 1 and args[0][0] in ("string", "ident"):
                xpath.add_condition(f"contains(., '{args[0][1]}')")
                return
        raise ExpressionError(f"The pseudo-class :{name}() is unknown")

    # -- pseudo-elements (parsel extension) ------------------------------
    def apply_pseudo_element(self, xpath: XPathExpr, pseudo: tuple) -> None:
        kind, name = pseudo[0], pseudo[1]
        if kind == "function":
            method = getattr(
                self, f"xpath_{name.replace('-', '_')}_functional_pseudo_element", None
            )
            if method is None:
                raise ExpressionError(
                    f"The functional pseudo-element ::{name}() is unknown"
                )
            method(xpath, pseudo[2])
        else:
            method = getattr(
                self, f"xpath_{name.replace('-', '_')}_simple_pseudo_element", None
            )
            if method is None:
                raise ExpressionError(f"The pseudo-element ::{name} is unknown")
            method(xpath)

    def xpath_text_simple_pseudo_element(self, xpath: XPathExpr) -> None:
        xpath.textnode = True

    def xpath_attr_functional_pseudo_element(
        self, xpath: XPathExpr, args: list[tuple[str, str]]
    ) -> None:
        values = [a for a in args if a[0] != "ws"]
        if len(values) != 1 or values[0][0] not in ("string", "ident"):
            raise ExpressionError(
                f"Expected a single string or ident for ::attr(), got {args!r}"
            )
        xpath.attribute = values[0][1]


class HTMLTranslator(GenericTranslator):
    """HTML-profile translator (lowercased names, form pseudo-classes)."""

    lowercase_elements = True
    lowercase_attributes = True

    def apply_pseudo_class(self, xpath: XPathExpr, name: str) -> None:
        if name == "checked":
            xpath.add_condition(
                "(@selected and name(.) = 'option') or "
                "(@checked and (name(.) = 'input' or name(.) = 'command') "
                "and (@type = 'checkbox' or @type = 'radio'))"
            )
        elif name == "disabled":
            xpath.add_condition("@disabled")
        elif name == "enabled":
            xpath.add_condition("not(@disabled)")
        elif name == "link":
            xpath.add_condition("@href and (name(.) = 'a' or name(.) = 'area')")
        else:
            super().apply_pseudo_class(xpath, name)


_html_translator = HTMLTranslator()
_generic_translator = GenericTranslator()


def css2xpath(query: str) -> str:
    """Translate a CSS query with the HTML profile (module-level helper,
    parsel/csstranslator.py:144-146)."""
    return _html_translator.css_to_xpath(query)


def translator_for(type_: str) -> GenericTranslator:
    return _generic_translator if type_ == "xml" else _html_translator
