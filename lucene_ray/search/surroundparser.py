"""Surround query language parser — the ``queryparser/surround`` module
role (``lucene/queryparser/src/java/org/apache/lucene/queryparser/
surround/parser/QueryParser.jj``; tests ``surround/query/Test02Boolean.
java``, ``Test03Distance.java``).

Grammar (the reference's, restricted to term operands inside distance
operators — our spans nest terms, not arbitrary subqueries):

    query   := orExpr
    orExpr  := andExpr (OR andExpr)*
    andExpr := notExpr (AND notExpr)*
    notExpr := distExpr (NOT distExpr)*
    distExpr:= primary ((<int>)? (W|N) primary)*      -- infix
    primary := (<int>)? (W|N) '(' term (',' term)* ')' -- prefix form
             | term[*?]                                -- truncated -> Prefix
             | term
             | '(' query ')'

``a 3W b`` matches a then b within distance 3 IN ORDER (SpanNear
slop = dist-1, ordered); ``a 3N b`` unordered. Bare ``W``/``N`` default
to distance 1 (adjacent). Operators are case-insensitive keywords, as
in the reference parser.
"""

from __future__ import annotations

import re

from .query import (
    BooleanQuery, PrefixQuery, Query, SpanNearQuery, TermQuery,
)

_TOKEN_RE = re.compile(r"\s*(?:(?P<num>\d+)(?=[WwNn])|(?P<word>[\w*?]+)"
                       r"|(?P<punct>[(),]))")


class SurroundSyntaxError(ValueError):
    pass


def _tokenize(s: str) -> list[str]:
    out, i = [], 0
    while i < len(s):
        m = _TOKEN_RE.match(s, i)
        if not m:
            if s[i:].strip() == "":
                break
            raise SurroundSyntaxError(f"bad char at {i}: {s[i]!r}")
        out.append(m.group(m.lastgroup))
        i = m.end()
    return out


class _Parser:
    def __init__(self, toks: list[str]):
        self.toks = toks
        self.i = 0

    def peek(self) -> str | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self) -> str:
        t = self.peek()
        if t is None:
            raise SurroundSyntaxError("unexpected end of query")
        self.i += 1
        return t

    def _kw(self, *names) -> str | None:
        t = self.peek()
        if t is not None and t.upper() in names:
            return self.next().upper()
        return None

    # ---- grammar ----
    def query(self) -> Query:
        q = self.or_expr()
        if self.peek() is not None:
            raise SurroundSyntaxError(f"trailing input at {self.i}")
        return q

    def or_expr(self) -> Query:
        parts = [self.and_expr()]
        while self._kw("OR"):
            parts.append(self.and_expr())
        if len(parts) == 1:
            return parts[0]
        return BooleanQuery(should=tuple(parts))

    def and_expr(self) -> Query:
        parts = [self.not_expr()]
        while self._kw("AND"):
            parts.append(self.not_expr())
        if len(parts) == 1:
            return parts[0]
        return BooleanQuery(must=tuple(parts))

    def not_expr(self) -> Query:
        first = self.dist_expr()
        nots = []
        while self._kw("NOT"):
            nots.append(self.dist_expr())
        if not nots:
            return first
        return BooleanQuery(must=(first,), must_not=tuple(nots))

    def _dist_op(self) -> tuple[int, bool] | None:
        """Returns (distance, in_order) if the next tokens are a W/N op."""
        save = self.i
        dist = 1
        t = self.peek()
        if t is not None and t.isdigit():
            dist = int(self.next())
            t = self.peek()
        if t is not None and t.upper() in ("W", "N"):
            self.next()
            return dist, t.upper() == "W"
        self.i = save
        return None

    def dist_expr(self) -> Query:
        op = self._dist_op()
        if op is not None:  # prefix form: nW(a, b, ...)
            dist, ordered = op
            if self.next() != "(":
                raise SurroundSyntaxError("expected ( after distance op")
            terms = [self._term_only()]
            while self.peek() == ",":
                self.next()
                terms.append(self._term_only())
            if self.next() != ")":
                raise SurroundSyntaxError("expected ) in distance op")
            return SpanNearQuery(tuple(terms), slop=dist - 1,
                                 in_order=ordered)
        left = self.primary()
        terms = None
        first_op = None
        while True:
            op = self._dist_op()
            if op is None:
                break
            if first_op is None:
                first_op = op
                terms = [self._as_term(left)]
            elif op != first_op:
                raise SurroundSyntaxError(
                    "mixed distance ops in one chain; use parentheses")
            terms.append(self._as_term(self.primary()))
            dist, ordered = first_op
            left = SpanNearQuery(tuple(terms), slop=dist - 1,
                                 in_order=ordered)
        return left

    def _as_term(self, q: Query) -> str:
        if isinstance(q, TermQuery):
            return q.term
        raise SurroundSyntaxError(
            "distance operators take term operands in this subset")

    def _term_only(self) -> str:
        t = self.next()
        if t in ("(", ")", ","):
            raise SurroundSyntaxError(f"expected term, got {t!r}")
        if t.endswith("*") or t.endswith("?"):
            raise SurroundSyntaxError("no truncation inside distance ops")
        return t.lower()

    def primary(self) -> Query:
        t = self.next()
        if t == "(":
            q = self.or_expr()
            if self.next() != ")":
                raise SurroundSyntaxError("unbalanced parens")
            return q
        if t in (")", ","):
            raise SurroundSyntaxError(f"unexpected {t!r}")
        if t.upper() in ("AND", "OR", "NOT", "W", "N"):
            raise SurroundSyntaxError(f"operator {t} needs operands")
        if t.endswith("*") and "*" not in t[:-1] and "?" not in t:
            return PrefixQuery(t[:-1].lower())
        return TermQuery(t.lower())


def parse_surround(s: str) -> Query:
    """Parse a surround-language query string into a Query tree."""
    return _Parser(_tokenize(s)).query()
