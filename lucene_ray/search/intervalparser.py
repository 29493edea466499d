"""``fn:`` interval-function query syntax — the flexible
StandardQueryParser's interval clauses
(``queryparser/flexible/standard/StandardQueryParser.java:204-220``,
function set ``queryparser/flexible/standard/nodes/intervalfn/*.java``).

``parse_interval_fn("fn:maxwidth(5 fn:atLeast(2 quick brown fox))")``
returns an :class:`~lucene_ray.search.intervals.IntervalsSource` that
evaluates through the intervals module's minimal-interval algebra.

Supported functions (case-insensitive, as in the reference grammar):
ordered, unordered, unorderedNoOverlaps, or, phrase, atLeast,
maxwidth, maxgaps, within, notWithin, containing, notContaining,
containedBy, notContainedBy, before, after, overlapping,
nonOverlapping, extend. Atoms are bare terms or quoted phrases
("quick brown" -> Phrase). ``wildcard`` / ``fuzzyTerm`` need the term
dictionary at rewrite time and are intentionally rejected here (the
PhraseWildcardQuery pipeline covers that role).
"""

from __future__ import annotations

import re

from .intervals import (
    After,
    Before,
    ContainedBy,
    Containing,
    Extend,
    IntervalsSource,
    MaxGaps,
    MaxWidth,
    NonOverlapping,
    NotContainedBy,
    NotContaining,
    Or,
    Ordered,
    Overlapping,
    Phrase,
    Term,
    Unordered,
    at_least,
    not_within,
    unordered_no_overlaps,
    within,
)


class IntervalParseError(ValueError):
    pass


_TOKEN = re.compile(r'''
    (?P<fn>fn:[A-Za-z]+\()   |
    (?P<close>\))            |
    (?P<quoted>"[^"]*")      |
    (?P<num>-?\d+(?![\w*?])) |
    (?P<term>[^\s()"]+)
''', re.VERBOSE)


def _tokens(expr: str):
    pos = 0
    for m in _TOKEN.finditer(expr):
        if expr[pos:m.start()].strip():
            raise IntervalParseError(
                f"unexpected input at {pos}: {expr[pos:m.start()]!r}")
        pos = m.end()
        kind = m.lastgroup
        yield kind, m.group(kind)
    if expr[pos:].strip():
        raise IntervalParseError(f"trailing input: {expr[pos:]!r}")


def parse_interval_fn(expr: str) -> IntervalsSource:
    toks = list(_tokens(expr))
    node, rest = _parse(toks, 0)
    if rest != len(toks):
        raise IntervalParseError(f"extra tokens after expression: "
                                 f"{toks[rest:]!r}")
    if not isinstance(node, IntervalsSource):
        raise IntervalParseError("top-level expression must be an "
                                 "interval function or term")
    return node


def _parse(toks, i):
    kind, val = toks[i]
    if kind == "fn":
        name = val[3:-1]
        args = []
        i += 1
        while i < len(toks) and toks[i][0] != "close":
            arg, i = _parse(toks, i)
            args.append(arg)
        if i >= len(toks):
            raise IntervalParseError(f"unclosed fn:{name}(")
        return _build(name, args), i + 1
    if kind == "close":
        raise IntervalParseError("unbalanced ')'")
    if kind == "quoted":
        words = val[1:-1].split()
        if not words:
            raise IntervalParseError("empty quoted phrase")
        src = Term(words[0]) if len(words) == 1 else Phrase(tuple(words))
        return src, i + 1
    if kind == "num":
        return int(val), i + 1
    if any(c in val for c in "*?"):
        raise IntervalParseError(
            "wildcard/fuzzy interval sources need the term dictionary; "
            "use the PhraseWildcardQuery pipeline instead")
    return Term(val), i + 1


def _src(args, name):
    for a in args:
        if not isinstance(a, IntervalsSource):
            raise IntervalParseError(
                f"fn:{name} expects interval sources, got {a!r}")
    return args


def _n_src(args, name, n_ints, n_srcs):
    ints = [a for a in args if isinstance(a, int)]
    srcs = [a for a in args if isinstance(a, IntervalsSource)]
    if len(ints) != n_ints or len(srcs) != n_srcs or \
            len(args) != n_ints + n_srcs:
        raise IntervalParseError(
            f"fn:{name} expects {n_ints} number(s) and {n_srcs} "
            f"source(s), got {args!r}")
    return ints, srcs


def _build(name, args):
    key = name.lower()
    if key == "ordered":
        return Ordered(tuple(_src(args, name)))
    if key == "unordered":
        return Unordered(tuple(_src(args, name)))
    if key == "unorderednooverlaps":
        _, (a, b) = _n_src(args, name, 0, 2)
        return unordered_no_overlaps(a, b)
    if key == "or":
        return Or(tuple(_src(args, name)))
    if key == "phrase":
        terms = []
        for a in _src(args, name):
            if not isinstance(a, Term):
                raise IntervalParseError("fn:phrase takes terms only")
            terms.append(a.term)
        return Phrase(tuple(terms))
    if key == "atleast":
        if not args or not isinstance(args[0], int):
            raise IntervalParseError("fn:atLeast(n sources...)")
        return at_least(args[0], *_src(args[1:], name))
    if key == "maxwidth":
        (n,), (s,) = _n_src(args, name, 1, 1)
        return MaxWidth(s, n)
    if key == "maxgaps":
        (n,), (s,) = _n_src(args, name, 1, 1)
        return MaxGaps(s, n)
    if key == "within":
        (n,), (s, r) = _n_src(args, name, 1, 2)
        return within(s, n, r)
    if key == "notwithin":
        (n,), (s, r) = _n_src(args, name, 1, 2)
        return not_within(s, n, r)
    if key == "containing":
        _, (b, s) = _n_src(args, name, 0, 2)
        return Containing(b, s)
    if key == "notcontaining":
        _, (b, s) = _n_src(args, name, 0, 2)
        return NotContaining(b, s)
    if key == "containedby":
        _, (s, b) = _n_src(args, name, 0, 2)
        return ContainedBy(s, b)
    if key == "notcontainedby":
        _, (s, b) = _n_src(args, name, 0, 2)
        return NotContainedBy(s, b)
    if key == "before":
        _, (s, r) = _n_src(args, name, 0, 2)
        return Before(s, r)
    if key == "after":
        _, (s, r) = _n_src(args, name, 0, 2)
        return After(s, r)
    if key == "overlapping":
        _, (s, r) = _n_src(args, name, 0, 2)
        return Overlapping(s, r)
    if key == "nonoverlapping":
        _, (s, r) = _n_src(args, name, 0, 2)
        return NonOverlapping(s, r)
    if key == "extend":
        (b, a), (s,) = _n_src(args, name, 2, 1)
        return Extend(s, b, a)
    if key in ("wildcard", "fuzzyterm"):
        raise IntervalParseError(
            f"fn:{name} needs the term dictionary; use the "
            "PhraseWildcardQuery pipeline instead")
    raise IntervalParseError(f"unknown interval function fn:{name}")
