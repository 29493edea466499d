"""Scoring-expression compiler — the ``expressions`` module role
(``lucene/expressions/src/java/org/apache/lucene/expressions/js/
JavascriptCompiler.java``, consumed through
``queries/function/FunctionScoreQuery.java`` via DoubleValuesSource;
tests ``expressions/.../TestExpressionValueSource.java``,
``queries/.../TestFunctionScoreQuery.java``).

A JS-like arithmetic subset — numbers, identifiers (numeric doc-value
columns plus the reserved ``_score``), ``+ - * / %`` with standard
precedence, unary minus, parentheses, and the one-or-two-argument
functions ``ln log log10 sqrt abs min max pow`` — is parsed once by a
recursive-descent parser and compiled to a closure over numpy arrays,
so evaluation over a segment's matched docs is fully vectorized (one
numpy expression, no per-doc Python). The compiled object exposes
``variables`` so callers fetch exactly the doc-value columns the
expression references.
"""

from __future__ import annotations

import re

import numpy as np

_TOKEN_RE = re.compile(
    r"\s*(?:(?P<num>\d+\.\d*|\.\d+|\d+)|(?P<name>[A-Za-z_][A-Za-z0-9_]*)"
    r"|(?P<op>[-+*/%(),]))")

_FUNCS_1 = {
    "ln": np.log, "log": np.log, "log10": np.log10,
    "sqrt": np.sqrt, "abs": np.abs,
}
_FUNCS_2 = {
    "min": np.minimum, "max": np.maximum, "pow": np.power,
}


class ExpressionError(ValueError):
    pass


class CompiledExpression:
    """Callable (vars: dict[str, np.ndarray|float]) -> np.float64 array."""

    def __init__(self, source: str, fn, variables: frozenset):
        self.source = source
        self._fn = fn
        self.variables = variables

    def __call__(self, variables: dict) -> np.ndarray:
        missing = self.variables - set(variables)
        if missing:
            raise ExpressionError(
                f"unbound variables {sorted(missing)} in {self.source!r}")
        return np.asarray(self._fn(variables), dtype=np.float64)

    def __repr__(self):
        return f"CompiledExpression({self.source!r})"


def _tokenize(src: str):
    out, pos = [], 0
    while pos < len(src):
        m = _TOKEN_RE.match(src, pos)
        if m is None or m.end() == pos:
            if src[pos:].strip() == "":
                break
            raise ExpressionError(
                f"bad character {src[pos:]!r} at {pos} in {src!r}")
        pos = m.end()
        if m.group("num") is not None:
            out.append(("num", float(m.group("num"))))
        elif m.group("name") is not None:
            out.append(("name", m.group("name")))
        else:
            out.append(("op", m.group("op")))
    out.append(("end", None))
    return out


def compile_expression(source: str) -> CompiledExpression:
    """Parse + compile once; reuse across batches/segments."""
    toks = _tokenize(source)
    pos = [0]
    variables: set = set()

    def peek():
        return toks[pos[0]]

    def take(kind, value=None):
        k, v = toks[pos[0]]
        if k != kind or (value is not None and v != value):
            raise ExpressionError(
                f"expected {value or kind}, got {v!r} in {source!r}")
        pos[0] += 1
        return v

    # grammar: expr := term (('+'|'-') term)* ; term := unary (('*'|'/'|'%')
    # unary)* ; unary := '-' unary | atom ; atom := num | name | call | (expr)
    def parse_expr():
        node = parse_term()
        while peek() == ("op", "+") or peek() == ("op", "-"):
            op = take("op")
            rhs = parse_term()
            lhs = node
            node = ((lambda l, r: lambda v: l(v) + r(v)) if op == "+"
                    else (lambda l, r: lambda v: l(v) - r(v)))(lhs, rhs)
        return node

    def parse_term():
        node = parse_unary()
        while peek() in (("op", "*"), ("op", "/"), ("op", "%")):
            op = take("op")
            rhs = parse_unary()
            lhs = node
            if op == "*":
                node = (lambda l, r: lambda v: l(v) * r(v))(lhs, rhs)
            elif op == "/":
                node = (lambda l, r: lambda v: l(v) / r(v))(lhs, rhs)
            else:
                node = (lambda l, r: lambda v: np.mod(l(v), r(v)))(lhs, rhs)
        return node

    def parse_unary():
        if peek() == ("op", "-"):
            take("op")
            inner = parse_unary()
            return (lambda i: lambda v: -i(v))(inner)
        return parse_atom()

    def parse_atom():
        k, val = peek()
        if k == "num":
            take("num")
            return (lambda c: lambda v: c)(val)
        if k == "name":
            take("name")
            if peek() == ("op", "("):
                take("op", "(")
                args = [parse_expr()]
                while peek() == ("op", ","):
                    take("op", ",")
                    args.append(parse_expr())
                take("op", ")")
                if val in _FUNCS_1 and len(args) == 1:
                    f, a = _FUNCS_1[val], args[0]
                    return (lambda f, a: lambda v: f(a(v)))(f, a)
                if val in _FUNCS_2 and len(args) == 2:
                    f, a, b = _FUNCS_2[val], args[0], args[1]
                    return (lambda f, a, b: lambda v: f(a(v), b(v)))(f, a, b)
                raise ExpressionError(
                    f"unknown function {val}/{len(args)} in {source!r}")
            variables.add(val)
            return (lambda n: lambda v: np.asarray(v[n], dtype=np.float64)
                    )(val)
        if k == "op" and val == "(":
            take("op", "(")
            node = parse_expr()
            take("op", ")")
            return node
        raise ExpressionError(f"unexpected {val!r} in {source!r}")

    fn = parse_expr()
    take("end")
    return CompiledExpression(source, fn, frozenset(variables))
