"""Span / interval queries (core/.../search/spans/NearSpans{Ordered,
Unordered}.java, queries/.../intervals/Intervals.java maxgaps; tests
TestSpans.java / TestIntervals.java semantics for single-term clauses)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_ray.index import build_index
from lucene_ray.search import IndexReader, Searcher, SpanNearQuery


@pytest.fixture(scope="module")
def span_index(ray_session, tmp_path_factory):
    texts = [
        "alpha beta",            # 0: adjacent ordered
        "beta alpha",            # 1: adjacent reversed
        "alpha x y z beta",      # 2: ordered gaps=3
        "alpha x y z w beta",    # 3: ordered gaps=4
        "beta x y alpha",        # 4: reversed gaps=2
        "alpha beta alpha",      # 5: repeat material
        "alpha",                 # 6: missing beta
        "gamma delta",           # 7: neither
    ]
    t = pa.table({"doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
                  "text": pa.array(texts, pa.string())})
    d = tmp_path_factory.mktemp("spans")
    pq.write_table(t, str(d / "docs.parquet"))
    build_index(str(d / "docs.parquet"), str(d / "idx"),
                index_positions=True)
    return Searcher(IndexReader(str(d / "idx")))


def test_ordered_requires_order_and_gap(span_index):
    s = span_index
    q = SpanNearQuery(("alpha", "beta"), slop=3, in_order=True)
    assert s.match_docs(q).tolist() == [0, 2, 5]
    q0 = SpanNearQuery(("alpha", "beta"), slop=0, in_order=True)
    assert s.match_docs(q0).tolist() == [0, 5]


def test_unordered_matches_either_direction(span_index):
    s = span_index
    q = SpanNearQuery(("alpha", "beta"), slop=3)
    assert s.match_docs(q).tolist() == [0, 1, 2, 4, 5]
    q0 = SpanNearQuery(("alpha", "beta"), slop=0)
    assert s.match_docs(q0).tolist() == [0, 1, 5]


def test_unordered_repeat_needs_distinct_positions(span_index):
    s = span_index
    # "alpha alpha" within slop 1: only doc 5 has two alphas 2 apart
    q = SpanNearQuery(("alpha", "alpha"), slop=1)
    assert s.match_docs(q).tolist() == [5]
    q0 = SpanNearQuery(("alpha", "alpha"), slop=0)
    assert s.match_docs(q0).tolist() == []


def test_span_scores_rank_tighter_windows_higher(span_index):
    s = span_index
    td = s.search(SpanNearQuery(("alpha", "beta"), slop=4, in_order=True),
                  k=10)
    docs = td.doc_ids.tolist()
    # doc 0 (gaps 0) above doc 2 (gaps 3) above doc 3 (gaps 4)
    assert docs.index(0) < docs.index(2) < docs.index(3)


def test_randomized_vs_bruteforce(ray_session, tmp_path_factory):
    rng = np.random.default_rng(17)
    vocab = ["a", "b", "c", "d"]
    texts = [" ".join(rng.choice(vocab, rng.integers(1, 12)))
             for _ in range(300)]
    t = pa.table({"doc_id": pa.array(np.arange(300, dtype=np.int64)),
                  "text": pa.array(texts, pa.string())})
    d = tmp_path_factory.mktemp("spans_rand")
    pq.write_table(t, str(d / "docs.parquet"))
    build_index(str(d / "docs.parquet"), str(d / "idx"),
                index_positions=True)
    s = Searcher(IndexReader(str(d / "idx")))

    def brute(terms, slop, in_order):
        out = []
        for did, text in enumerate(texts):
            toks = text.split()
            pos = [[p for p, w in enumerate(toks) if w == t]
                   for t in terms]
            if any(not p for p in pos):
                continue
            hit = False
            from itertools import product
            for tup in product(*pos):
                if len(set(tup)) < len(tup):
                    continue
                if in_order and any(tup[i] >= tup[i + 1]
                                    for i in range(len(tup) - 1)):
                    continue
                if (max(tup) - min(tup)) - (len(tup) - 1) <= slop:
                    hit = True
                    break
            if hit:
                out.append(did)
        return out

    for _ in range(25):
        nt = int(rng.integers(2, 4))
        terms = tuple(rng.choice(vocab, nt))
        slop = int(rng.integers(0, 4))
        in_order = bool(rng.integers(0, 2))
        got = s.match_docs(SpanNearQuery(terms, slop, in_order)).tolist()
        want = brute(terms, slop, in_order)
        assert got == want, (terms, slop, in_order)


def test_ordered_span_freq_is_exact_near_spans():
    """_ordered_span_freq == NearSpansOrdered enumeration: per
    first-clause start, the MINIMAL ordered chain width (exhaustive
    check), freq = sum of 1/(1+gaps) over fitting starts."""
    from itertools import product

    import numpy as np

    from lucene_ray.search.searcher import Searcher

    rng = np.random.default_rng(123)
    for trial in range(300):
        n = int(rng.integers(2, 5))
        slots = []
        for _ in range(n):
            cnt = int(rng.integers(1, 6))
            slots.append(np.sort(rng.choice(40, cnt, replace=False))
                         .astype(np.int64))
        slop = int(rng.integers(0, 6))
        got = Searcher._ordered_span_freq(slots, slop)
        # brute: minimal strictly-increasing chain width per start
        want = 0.0
        for p0 in slots[0]:
            best = None
            for tup in product(*[a.tolist() for a in slots[1:]]):
                chain = (int(p0),) + tuple(tup)
                if all(chain[i] < chain[i + 1] for i in range(n - 1)):
                    w = (chain[-1] - chain[0]) - (n - 1)
                    if best is None or w < best:
                        best = w
            if best is not None and best <= slop:
                want += 1.0 / (1 + best)
        assert abs(got - want) < 1e-12, (slots, slop, got, want)
