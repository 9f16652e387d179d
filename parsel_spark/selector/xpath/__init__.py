"""From-scratch XPath 1.0 engine (lexer → AST → evaluator) with EXSLT
regexp/set extensions and a user extension-function registry."""

from .errors import XPathError, XPathEvalError, XPathSyntaxError
from .evaluator import evaluate
from .functions import (
    DEFAULT_EXTENSIONS,
    RE_NAMESPACE,
    SET_NAMESPACE,
    has_class,
    set_xpathfunc,
    setup,
)
from .parser import compile_xpath

__all__ = [
    "XPathError",
    "XPathEvalError",
    "XPathSyntaxError",
    "evaluate",
    "compile_xpath",
    "set_xpathfunc",
    "setup",
    "has_class",
    "DEFAULT_EXTENSIONS",
    "RE_NAMESPACE",
    "SET_NAMESPACE",
]
