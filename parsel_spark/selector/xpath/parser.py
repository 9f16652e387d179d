"""XPath 1.0 lexer + recursive-descent parser.

Produces a tuple-based AST consumed by :mod:`.evaluator`.  Grammar and
token disambiguation follow the XPath 1.0 recommendation (§3.7: a ``*``
or ``and``/``or``/``mod``/``div`` name is an operator when the preceding
token is not itself an operator or one of ``@ :: ( [ ,``).

AST shapes::

    ('or'|'and', left, right)
    ('cmp', op, left, right)            # = != < <= > >=
    ('arith', op, left, right)          # + - * div mod
    ('neg', expr)
    ('union', [path, ...])
    ('path', absolute, [step, ...])     # location path
    ('filter', primary, [pred, ...], [step, ...])
    ('literal', str) | ('number', float) | ('var', name)
    ('call', prefix, name, [arg, ...])
    step := ('step', axis, nodetest, [pred, ...])
    nodetest := ('wild',) | ('name', prefix, local) | ('nswild', prefix)
              | ('type', name, arg_or_None)
"""

from __future__ import annotations

import re
from functools import lru_cache
from typing import Any, NamedTuple

from .errors import XPathSyntaxError

AXES = frozenset(
    """ancestor ancestor-or-self attribute child descendant
    descendant-or-self following following-sibling namespace parent
    preceding preceding-sibling self""".split()
)

NODE_TYPES = frozenset({"comment", "text", "processing-instruction", "node"})

_NCNAME = r"[^\W\d][\w.\-]*"
_TOKEN_RE = re.compile(
    rf"""
      \s+
    | (?P<number>\d+(\.\d*)?|\.\d+)
    | (?P<literal>"[^"]*"|'[^']*')
    | \$(?P<variable>{_NCNAME}(:{_NCNAME})?)
    | (?P<name>{_NCNAME}(:(\*|{_NCNAME}))?|\*)
    | (?P<op2>//|::|!=|<=|>=|\.\.)
    | (?P<op1>[/\[\]()@,|+\-=<>.])
    """,
    re.UNICODE | re.VERBOSE,
)

_OPERATOR_NAMES = frozenset({"and", "or", "mod", "div"})


class Token(NamedTuple):
    kind: str  # 'number' | 'literal' | 'variable' | 'name' | 'op' | 'eof'
    value: str
    depth: int  # predicate-bracket depth (for error labeling)


def _lex(query: str) -> list[Token]:
    tokens: list[Token] = []
    pos = 0
    depth = 0
    prev: Token | None = None
    while pos < len(query):
        match = _TOKEN_RE.match(query, pos)
        if match is None:
            raise XPathSyntaxError("Invalid predicate" if depth else "Invalid expression")
        if match.end() == pos:  # defensive: avoid an infinite loop
            raise XPathSyntaxError("Invalid expression")
        pos = match.end()
        if match.group("number") is not None:
            token = Token("number", match.group("number"), depth)
        elif match.group("literal") is not None:
            token = Token("literal", match.group("literal")[1:-1], depth)
        elif match.group("variable") is not None:
            token = Token("variable", match.group("variable"), depth)
        elif match.group("name") is not None:
            value = match.group("name")
            # XPath 1.0 §3.7 disambiguation
            operator_context = prev is not None and not (
                prev.kind == "op" and prev.value not in (")", "]")
            )
            if value == "*":
                token = Token("op" if operator_context else "name", "*", depth)
            elif value in _OPERATOR_NAMES and operator_context:
                token = Token("op", value, depth)
            else:
                token = Token("name", value, depth)
        elif match.group("op2") is not None or match.group("op1") is not None:
            value = match.group("op2") or match.group("op1")
            if value == "[":
                depth += 1
            token_depth = depth
            if value == "]":
                depth = max(0, depth - 1)
            token = Token("op", value, token_depth)
        else:  # whitespace
            continue
        tokens.append(token)
        prev = token
    tokens.append(Token("eof", "", depth))
    return tokens


class _Parser:
    def __init__(self, tokens: list[Token]) -> None:
        self.tokens = tokens
        self.index = 0

    # -- token helpers ---------------------------------------------------
    @property
    def current(self) -> Token:
        return self.tokens[self.index]

    def advance(self) -> Token:
        token = self.tokens[self.index]
        if token.kind != "eof":
            self.index += 1
        return token

    def fail(self) -> Any:
        raise XPathSyntaxError(
            "Invalid predicate" if self.current.depth else "Invalid expression"
        )

    def expect_op(self, value: str) -> None:
        if self.current.kind == "op" and self.current.value == value:
            self.advance()
        else:
            self.fail()

    def at_op(self, *values: str) -> bool:
        return self.current.kind == "op" and self.current.value in values

    # -- grammar ---------------------------------------------------------
    def parse(self) -> Any:
        expr = self.parse_or()
        if self.current.kind != "eof":
            self.fail()
        return expr

    def parse_or(self) -> Any:
        left = self.parse_and()
        while self.at_op("or"):
            self.advance()
            left = ("or", left, self.parse_and())
        return left

    def parse_and(self) -> Any:
        left = self.parse_equality()
        while self.at_op("and"):
            self.advance()
            left = ("and", left, self.parse_equality())
        return left

    def parse_equality(self) -> Any:
        left = self.parse_relational()
        while self.at_op("=", "!="):
            op = self.advance().value
            left = ("cmp", op, left, self.parse_relational())
        return left

    def parse_relational(self) -> Any:
        left = self.parse_additive()
        while self.at_op("<", "<=", ">", ">="):
            op = self.advance().value
            left = ("cmp", op, left, self.parse_additive())
        return left

    def parse_additive(self) -> Any:
        left = self.parse_multiplicative()
        while self.at_op("+", "-"):
            op = self.advance().value
            left = ("arith", op, left, self.parse_multiplicative())
        return left

    def parse_multiplicative(self) -> Any:
        left = self.parse_unary()
        while self.at_op("*", "div", "mod"):
            op = self.advance().value
            left = ("arith", op, left, self.parse_unary())
        return left

    def parse_unary(self) -> Any:
        negations = 0
        while self.at_op("-"):
            self.advance()
            negations += 1
        expr = self.parse_union()
        for _ in range(negations):
            expr = ("neg", expr)
        return expr

    def parse_union(self) -> Any:
        paths = [self.parse_path()]
        while self.at_op("|"):
            self.advance()
            paths.append(self.parse_path())
        if len(paths) == 1:
            return paths[0]
        return ("union", paths)

    def parse_path(self) -> Any:
        token = self.current
        # primary expression start?
        if token.kind in ("variable", "literal", "number") or self.at_op("("):
            primary = self.parse_primary()
            predicates = []
            while self.at_op("["):
                predicates.append(self.parse_predicate())
            steps: list[Any] = []
            if self.at_op("/", "//"):
                steps = self.parse_steps(leading_slash=True)
            return ("filter", primary, predicates, steps)
        if token.kind == "name" and self._is_function_call():
            primary = self.parse_primary()
            predicates = []
            while self.at_op("["):
                predicates.append(self.parse_predicate())
            steps = []
            if self.at_op("/", "//"):
                steps = self.parse_steps(leading_slash=True)
            return ("filter", primary, predicates, steps)
        # location path
        if self.at_op("/"):
            self.advance()
            if self._at_step_start():
                return ("path", True, self.parse_steps(leading_slash=False))
            return ("path", True, [])
        if self.at_op("//"):
            self.advance()
            steps = [("step", "descendant-or-self", ("type", "node", None), [])]
            steps.extend(self.parse_steps(leading_slash=False))
            return ("path", True, steps)
        if self._at_step_start():
            return ("path", False, self.parse_steps(leading_slash=False))
        return self.fail()

    def _is_function_call(self) -> bool:
        token = self.current
        if token.kind != "name":
            return False
        nxt = self.tokens[self.index + 1] if self.index + 1 < len(self.tokens) else None
        if nxt is None or not (nxt.kind == "op" and nxt.value == "("):
            return False
        local = token.value.split(":")[-1]
        return local not in NODE_TYPES

    def _at_step_start(self) -> bool:
        token = self.current
        if token.kind == "name":
            return True
        return self.at_op("@", ".", "..", "*")

    def parse_steps(self, leading_slash: bool) -> list[Any]:
        steps: list[Any] = []
        if leading_slash:
            if self.at_op("//"):
                self.advance()
                steps.append(("step", "descendant-or-self", ("type", "node", None), []))
            else:
                self.expect_op("/")
        steps.append(self.parse_step())
        while self.at_op("/", "//"):
            if self.current.value == "//":
                self.advance()
                steps.append(("step", "descendant-or-self", ("type", "node", None), []))
            else:
                self.advance()
            steps.append(self.parse_step())
        return steps

    def parse_step(self) -> Any:
        if self.at_op("."):
            self.advance()
            return ("step", "self", ("type", "node", None), [])
        if self.at_op(".."):
            self.advance()
            return ("step", "parent", ("type", "node", None), [])
        axis = "child"
        if self.at_op("@"):
            self.advance()
            axis = "attribute"
        elif self.current.kind == "name":
            nxt = self.tokens[self.index + 1] if self.index + 1 < len(self.tokens) else None
            if nxt is not None and nxt.kind == "op" and nxt.value == "::":
                axis_name = self.advance().value
                if axis_name not in AXES:
                    self.fail()
                self.advance()  # '::'
                axis = axis_name
        nodetest = self.parse_nodetest()
        predicates = []
        while self.at_op("["):
            predicates.append(self.parse_predicate())
        return ("step", axis, nodetest, predicates)

    def parse_nodetest(self) -> Any:
        token = self.current
        if self.at_op("*"):
            self.advance()
            return ("wild",)
        if token.kind != "name":
            return self.fail()
        value = self.advance().value
        if value == "*":
            return ("wild",)
        if ":" in value:
            prefix, local = value.split(":", 1)
            if local == "*":
                return ("nswild", prefix)
            if (
                local in NODE_TYPES
                and self.at_op("(")
            ):
                # prefixed node types don't exist; treat as function error later
                pass
            return ("name", prefix, local)
        if value in NODE_TYPES and self.at_op("("):
            self.advance()
            arg = None
            if self.current.kind == "literal":
                arg = self.advance().value
            self.expect_op(")")
            return ("type", value, arg)
        return ("name", None, value)

    def parse_predicate(self) -> Any:
        self.expect_op("[")
        expr = self.parse_or()
        self.expect_op("]")
        return expr

    def parse_primary(self) -> Any:
        token = self.current
        if token.kind == "variable":
            self.advance()
            return ("var", token.value)
        if token.kind == "literal":
            self.advance()
            return ("literal", token.value)
        if token.kind == "number":
            self.advance()
            return ("number", float(token.value))
        if self.at_op("("):
            self.advance()
            expr = self.parse_or()
            self.expect_op(")")
            return expr
        if token.kind == "name":
            name = self.advance().value
            prefix: str | None = None
            local = name
            if ":" in name:
                prefix, local = name.split(":", 1)
            self.expect_op("(")
            args: list[Any] = []
            if not self.at_op(")"):
                args.append(self.parse_or())
                while self.at_op(","):
                    self.advance()
                    args.append(self.parse_or())
            self.expect_op(")")
            return ("call", prefix, local, args)
        return self.fail()


@lru_cache(maxsize=4096)
def compile_xpath(query: str) -> Any:
    """Compile ``query`` to an AST (memoized per worker process)."""
    if not isinstance(query, str):
        raise XPathSyntaxError("Invalid expression")
    tokens = _lex(query)
    return _Parser(tokens).parse()
