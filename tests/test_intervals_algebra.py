"""Minimal-interval algebra (queries/intervals module —
Intervals.java factory shapes; TestIntervals.java semantics):
combinator unit cases, a brute-force randomized oracle, and index
integration."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_ray.search.intervals import (
    ContainedBy,
    Containing,
    MaxGaps,
    NotContainedBy,
    NotContaining,
    Or,
    Ordered,
    Phrase,
    Term,
    Unordered,
    interval_freqs,
    interval_match_docs,
)


def _pos(**kw):
    return {k: np.asarray(v, dtype=np.int64) for k, v in kw.items()}


def _brute_minimal(cands):
    """Reference minimality filter over candidate (s,e) tuples."""
    out = []
    cs = sorted(set(cands))
    for s, e in cs:
        if not any((s2 >= s and e2 <= e and (s2, e2) != (s, e))
                   for s2, e2 in cs):
            out.append((s, e))
    return sorted(out)


class TestCombinators:
    def test_minimality_shadows_container(self):
        # data@{0,2}, merge@3: (0,3) contains (2,3) -> only (2,3) kept
        iv = Ordered((Term("data"), Term("merge"))).intervals(
            _pos(data=[0, 2], merge=[3]))
        assert iv.tolist() == [[2, 3]]

    def test_containing_uses_minimal_intervals(self):
        # key@1 is inside the NON-minimal (0,3) only -> no match
        src = Containing(Ordered((Term("data"), Term("merge"))), Term("key"))
        assert len(src.intervals(_pos(data=[0, 2], merge=[3], key=[1]))) == 0
        assert src.intervals(
            _pos(data=[0, 2], merge=[3], key=[2])).tolist() == [[2, 3]]

    def test_or_prunes_contained(self):
        iv = Or((Term("a"), Phrase(("a", "b")))).intervals(_pos(a=[0], b=[1]))
        assert iv.tolist() == [[0, 0]]

    def test_ordered_maxgaps(self):
        assert len(Ordered((Term("a"), Term("b")), max_gaps=1).intervals(
            _pos(a=[0], b=[4]))) == 0
        assert Ordered((Term("a"), Term("b")), max_gaps=3).intervals(
            _pos(a=[0], b=[4])).tolist() == [[0, 4]]

    def test_unordered_minimal_windows(self):
        iv = Unordered((Term("a"), Term("b"))).intervals(_pos(a=[0, 7],
                                                              b=[3, 5]))
        assert iv.tolist() == [[0, 3], [5, 7]]

    def test_not_containing_and_contained_by(self):
        ab = Ordered((Term("a"), Term("b")))
        assert len(NotContaining(ab, Term("x")).intervals(
            _pos(a=[0], b=[2], x=[1]))) == 0
        assert NotContaining(ab, Term("x")).intervals(
            _pos(a=[0], b=[2], x=[5])).tolist() == [[0, 2]]
        assert ContainedBy(Term("k"), ab).intervals(
            _pos(a=[0], b=[3], k=[2, 5])).tolist() == [[2, 2]]
        assert NotContainedBy(Term("k"), ab).intervals(
            _pos(a=[0], b=[3], k=[2, 5])).tolist() == [[5, 5]]

    def test_phrase_block(self):
        assert Phrase(("a", "b", "c")).intervals(
            _pos(a=[0, 5], b=[1, 6], c=[2, 9])).tolist() == [[0, 2]]

    def test_maxgaps_wrapper(self):
        src = MaxGaps(Unordered((Term("a"), Term("b"))), 0)
        assert src.intervals(_pos(a=[0, 9], b=[1, 4])).tolist() == [[0, 1]]


class TestRandomizedOracle:
    def test_ordered_two_terms_brute(self):
        rng = np.random.default_rng(7)
        for _ in range(200):
            n = int(rng.integers(2, 20))
            toks = rng.choice(["a", "b", "c"], size=n)
            pa_ = np.flatnonzero(toks == "a")
            pb_ = np.flatnonzero(toks == "b")
            iv = Ordered((Term("a"), Term("b"))).intervals(
                _pos(a=pa_, b=pb_))
            # brute: per-start greedy chains then minimality
            cands = []
            for s in pa_:
                nxt = pb_[pb_ > s]
                if len(nxt):
                    cands.append((int(s), int(nxt[0])))
            assert [tuple(r) for r in iv.tolist()] == _brute_minimal(cands)

    def test_unordered_two_terms_brute(self):
        rng = np.random.default_rng(11)
        for _ in range(200):
            n = int(rng.integers(2, 20))
            toks = rng.choice(["a", "b", "c"], size=n)
            pa_ = np.flatnonzero(toks == "a")
            pb_ = np.flatnonzero(toks == "b")
            if not len(pa_) or not len(pb_):
                continue
            iv = Unordered((Term("a"), Term("b"))).intervals(
                _pos(a=pa_, b=pb_))
            cands = [(min(int(x), int(y)), max(int(x), int(y)))
                     for x in pa_ for y in pb_]
            assert [tuple(r) for r in iv.tolist()] == _brute_minimal(cands)


TEXTS = [
    "data merge key end",        # ordered (0,1) contains nothing at gap
    "data key merge end",        # (0,2) contains key@1
    "data x x x merge",          # gaps 3
    "merge data key",            # wrong order
    "data merge data key merge",  # minimal (2,4) contains key@3
    "plain text",
]


@pytest.fixture(scope="module")
def idx(ray_session, tmp_path_factory):
    from lucene_ray.index import build_index
    d = tmp_path_factory.mktemp("intervals")
    path = str(d / "docs.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(TEXTS)), pa.int64()),
        "text": pa.array(TEXTS)}), path)
    out = str(d / "idx")
    build_index(path, out, batch_size=3, index_positions=True)
    return out


class TestIndexIntegration:
    def test_containing_over_index(self, idx):
        from lucene_ray.search import IndexReader, Searcher
        s = Searcher(IndexReader(idx))
        src = Containing(Ordered((Term("data"), Term("merge")), max_gaps=3),
                         Term("key"))
        t = interval_match_docs(s, src)
        assert t.column("doc_id").to_pylist() == [1, 4]

    def test_freqs_and_ordered_gaps(self, idx):
        from lucene_ray.search import IndexReader, Searcher
        s = Searcher(IndexReader(idx))
        docs, freqs = interval_freqs(
            s, Ordered((Term("data"), Term("merge")), max_gaps=0))
        got = dict(zip(docs.tolist(), freqs.tolist()))
        assert got == {0: 1, 4: 1}  # only adjacent pairs

    def test_or_over_index(self, idx):
        from lucene_ray.search import IndexReader, Searcher
        s = Searcher(IndexReader(idx))
        t = interval_match_docs(
            s, Or((Phrase(("plain", "text")), Phrase(("data", "key")))))
        # "data key" is adjacent in docs 1, 3, 4; "plain text" in 5
        assert t.column("doc_id").to_pylist() == [1, 3, 4, 5]


class TestPositionalCombinators:
    """before/after/overlapping/nonOverlapping/extend
    (Intervals.java factory methods of the same names)."""

    def test_before_after(self):
        from lucene_ray.search.intervals import After, Before
        s = Term("a")
        r = Term("x")
        p = _pos(a=[0, 5, 9], x=[4, 7])
        assert Before(s, r).intervals(p).tolist() == [[0, 0], [5, 5]]
        assert After(s, r).intervals(p).tolist() == [[5, 5], [9, 9]]
        # reference absent -> nothing
        assert len(Before(s, r).intervals(_pos(a=[1], x=[]))) == 0

    def test_overlapping(self):
        from lucene_ray.search.intervals import NonOverlapping, Overlapping
        src = Ordered((Term("a"), Term("b")))  # intervals span a..b
        p = _pos(a=[0, 10], b=[2, 12], x=[1, 20])
        ov = Overlapping(src, Term("x")).intervals(p)
        assert ov.tolist() == [[0, 2]]  # only the first span covers x@1
        nov = NonOverlapping(src, Term("x")).intervals(p)
        assert nov.tolist() == [[10, 12]]
        # absent reference: everything survives nonOverlapping
        all_ = NonOverlapping(src, Term("zz")).intervals(
            _pos(a=[0], b=[2], zz=[]))
        assert all_.tolist() == [[0, 2]]

    def test_extend(self):
        from lucene_ray.search.intervals import Extend
        iv = Extend(Term("a"), before=2, after=1).intervals(_pos(a=[1, 9]))
        assert iv.tolist() == [[0, 2], [7, 10]]

    def test_extend_then_containing(self):
        # "x within 2 positions around a" via extend+containing
        from lucene_ray.search.intervals import Extend
        src = Containing(Extend(Term("a"), 2, 2), Term("x"))
        assert len(src.intervals(_pos(a=[5], x=[4]))) == 1
        assert len(src.intervals(_pos(a=[5], x=[8]))) == 0
