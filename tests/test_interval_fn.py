"""Round-4 interval additions: Intervals.atLeast / maxwidth / within /
notWithin / unorderedNoOverlaps (Intervals.java:289,355,403,418,476)
and the flexible StandardQueryParser ``fn:`` clause syntax
(StandardQueryParser.java:204-220, nodes/intervalfn package)."""

import itertools

import numpy as np
import pytest

from lucene_ray.search.intervalparser import (
    IntervalParseError,
    parse_interval_fn,
)
from lucene_ray.search.intervals import (
    AtLeast,
    MaxGaps,
    MaxWidth,
    Or,
    Ordered,
    Phrase,
    Term,
    Unordered,
    at_least,
    not_within,
    unordered_no_overlaps,
    within,
)


def _pos(**kw):
    return {k: np.asarray(v, dtype=np.int64) for k, v in kw.items()}


def _brute_minimal(cands):
    out = []
    cs = sorted(set(cands))
    for s, e in cs:
        if not any((s2 >= s and e2 <= e and (s2, e2) != (s, e))
                   for s2, e2 in cs):
            out.append((s, e))
    return sorted(out)


def _brute_at_least(pos_lists, m):
    """atLeast(m, terms): union over all m-subsets of the unordered
    minimal spans, re-minimalized — the definitional form."""
    cands = []
    idx = range(len(pos_lists))
    for subset in itertools.combinations(idx, m):
        lists = [pos_lists[i] for i in subset]
        if any(len(v) == 0 for v in lists):
            continue
        for combo in itertools.product(*lists):
            cands.append((min(combo), max(combo)))
    return _brute_minimal(_brute_minimal(cands))


class TestAtLeast:
    def test_basic(self):
        src = at_least(2, Term("a"), Term("b"), Term("c"))
        iv = src.intervals(_pos(a=[0], b=[5], c=[6]))
        assert iv.tolist() == [[0, 5], [5, 6]]

    def test_degenerate_forms(self):
        assert isinstance(at_least(2, Term("a"), Term("b")), Unordered)
        none = at_least(3, Term("a"), Term("b"))
        assert len(none.intervals(_pos(a=[0], b=[1]))) == 0

    def test_randomized_vs_brute(self):
        rng = np.random.default_rng(11)
        terms = ["a", "b", "c", "d"]
        for trial in range(300):
            pos_lists = []
            pos = {}
            used = set()
            for t in terms:
                n = int(rng.integers(0, 5))
                p = sorted(rng.choice(60, size=n, replace=False).tolist())
                p = [x for x in p if x not in used]
                used.update(p)
                pos_lists.append(p)
                pos[t] = np.asarray(p, dtype=np.int64)
            m = int(rng.integers(2, 4))
            got = AtLeast(tuple(Term(t) for t in terms), m) \
                .intervals(pos)
            want = _brute_at_least(pos_lists, m)
            assert [tuple(r) for r in got.tolist()] == want, \
                (trial, pos_lists, m)


class TestFilters:
    def test_maxwidth(self):
        src = MaxWidth(Unordered((Term("a"), Term("b"))), 4)
        iv = src.intervals(_pos(a=[0, 10], b=[6, 12]))
        assert iv.tolist() == [[10, 12]]

    def test_within(self):
        # 'k' within 2 positions of ordered(a..b)
        src = within(Term("k"), 2, Ordered((Term("a"), Term("b"))))
        iv = src.intervals(_pos(a=[5], b=[7], k=[3, 4, 9, 10]))
        assert iv.tolist() == [[3, 3], [4, 4], [9, 9]]

    def test_not_within(self):
        src = not_within(Term("k"), 2, Term("x"))
        iv = src.intervals(_pos(k=[0, 5, 10], x=[4]))
        assert iv.tolist() == [[0, 0], [10, 10]]

    def test_unordered_no_overlaps(self):
        # phrase 'a b' overlapping b itself is fine — but the two
        # ORDERED directions both require disjoint occurrences
        src = unordered_no_overlaps(Term("a"), Term("b"))
        assert src.intervals(_pos(a=[3], b=[1])).tolist() == [[1, 3]]
        assert src.intervals(_pos(a=[1], b=[3])).tolist() == [[1, 3]]


class TestParser:
    def test_shapes(self):
        assert parse_interval_fn("fn:ordered(a b c)") == Ordered(
            (Term("a"), Term("b"), Term("c")))
        assert parse_interval_fn('fn:or("x y" z)') == Or(
            (Phrase(("x", "y")), Term("z")))
        assert parse_interval_fn(
            "fn:maxwidth(5 fn:atLeast(2 q b f))") == MaxWidth(
            AtLeast((Term("q"), Term("b"), Term("f")), 2), 5)
        assert parse_interval_fn("fn:maxgaps(2 fn:unordered(a b))") \
            == MaxGaps(Unordered((Term("a"), Term("b")), max_gaps=2), 2)
        assert parse_interval_fn("fn:extend(a 1 2)") \
            .intervals(_pos(a=[5])).tolist() == [[4, 7]]
        got = parse_interval_fn("fn:within(k 2 fn:ordered(a b))")
        assert got == within(Term("k"), 2, Ordered((Term("a"), Term("b"))))

    def test_nested_evaluates(self):
        src = parse_interval_fn(
            "fn:containing(fn:unordered(a b) c)")
        assert src.intervals(_pos(a=[0], b=[4], c=[2])).tolist() == [[0, 4]]

    def test_errors(self):
        for bad in ["fn:ordered(a b", "fn:bogus(a)", "fn:maxwidth(a b)",
                    "fn:ordered(a) b", ")", 'fn:phrase(fn:or(a b))',
                    "fn:wildcard(mer*)", "fn:ordered(mer*)"]:
            with pytest.raises(IntervalParseError):
                parse_interval_fn(bad)
