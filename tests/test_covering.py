"""CoveringQuery (search/CoveringQuery.java role): at least
minMatch(doc) of the sub-queries match; score = sum of the matching
subs' scores. Brute-force equivalence over per-term complete evals."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def cov_corpus(ray_session, tmp_path_factory):
    from lucene_ray.index import build_index
    rng = np.random.default_rng(29)
    filler = [f"w{i}" for i in range(40)]
    keys = ["alpha", "beta", "gamma", "delta"]
    texts = []
    for i in range(300):
        words = list(rng.choice(filler, int(rng.integers(4, 25))))
        for j, kword in enumerate(keys):
            if rng.random() < 0.35:
                words.insert(int(rng.integers(0, len(words))), kword)
        texts.append(" ".join(words))
    n = len(texts)
    t = pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "text": pa.array(texts, pa.string()),
        # per-doc minimum number of matching clauses (1..3)
        "mm": pa.array((np.arange(n) % 3 + 1).astype(np.int64)),
    })
    d = tmp_path_factory.mktemp("covering")
    path = str(d / "documents.parquet")
    pq.write_table(t, path)
    out = str(d / "idx")
    build_index(path, out, batch_size=64, doc_value_cols=("mm",))
    return out, texts, keys


def _brute(searcher, texts, keys, min_match_fn):
    """Per-doc (count, sum-of-matching-term-scores) ground truth."""
    from lucene_ray.search import TermQuery
    n = len(texts)
    counts = np.zeros(n, dtype=np.int64)
    sums = np.zeros(n, dtype=np.float64)
    for kw in keys:
        docs, scores = searcher.eval_complete(TermQuery(kw))
        counts[docs] += 1
        sums[docs] += scores
    need = np.maximum(1, np.array([min_match_fn(i) for i in range(n)]))
    keep = counts >= need
    return np.nonzero(keep)[0], sums[keep]


def test_covering_per_doc_minimum(cov_corpus):
    from lucene_ray.search import CoveringQuery, IndexReader, Searcher, TermQuery
    out, texts, keys = cov_corpus
    s = Searcher(IndexReader(out), similarity="bm25_exact64")
    q = CoveringQuery(tuple(TermQuery(k) for k in keys), min_match="mm")
    want_docs, want_scores = _brute(s, texts, keys,
                                    lambda i: i % 3 + 1)
    got = s.match_docs(q)
    np.testing.assert_array_equal(got, want_docs)
    td = s.search(q, k=len(texts))
    order = np.lexsort((td.doc_ids, -td.scores))
    by_doc = dict(zip(td.doc_ids, td.scores))
    assert set(by_doc) == set(want_docs.tolist())
    for d, sc in zip(want_docs, want_scores):
        assert by_doc[int(d)] == pytest.approx(sc, rel=1e-12)
    assert s.count(q) == len(want_docs)


def test_covering_constant_equals_min_should_match(cov_corpus):
    from lucene_ray.search import (
        BooleanQuery, CoveringQuery, IndexReader, Searcher, TermQuery)
    out, _texts, keys = cov_corpus
    s = Searcher(IndexReader(out), similarity="bm25_exact64")
    subs = tuple(TermQuery(k) for k in keys)
    for m in (1, 2, 3, 4):
        cov = s.search(CoveringQuery(subs, min_match=str(m)), k=500)
        boolq = s.search(BooleanQuery(should=subs, min_should_match=m),
                         k=500)
        np.testing.assert_array_equal(cov.doc_ids, boolq.doc_ids)
        np.testing.assert_allclose(cov.scores, boolq.scores, rtol=1e-12)


def test_covering_min_below_one_clamps(cov_corpus):
    """minMatch <= 0 behaves as 1 — zero-match docs never match."""
    from lucene_ray.search import (
        BooleanQuery, CoveringQuery, IndexReader, Searcher, TermQuery)
    out, _texts, keys = cov_corpus
    s = Searcher(IndexReader(out))
    subs = tuple(TermQuery(k) for k in keys)
    got = s.match_docs(CoveringQuery(subs, min_match="0 - 5"))
    want = s.match_docs(BooleanQuery(should=subs, min_should_match=1))
    np.testing.assert_array_equal(got, want)


def test_covering_impossible_minimum_matches_nothing(cov_corpus):
    from lucene_ray.search import CoveringQuery, IndexReader, Searcher, TermQuery
    out, _texts, keys = cov_corpus
    s = Searcher(IndexReader(out))
    q = CoveringQuery(tuple(TermQuery(k) for k in keys),
                      min_match=str(len(keys) + 1))
    assert len(s.match_docs(q)) == 0
    assert s.count(q) == 0


def test_covering_distributed_equals_local(cov_corpus):
    """RaySearcher (QueryWorker pool) matches the local searcher for
    CoveringQuery — the new prep kind flows through the distributed
    path unchanged."""
    from lucene_ray.search import CoveringQuery, IndexReader, Searcher, TermQuery
    from lucene_ray.search.distributed import RaySearcher
    out, _texts, keys = cov_corpus
    q = CoveringQuery(tuple(TermQuery(k) for k in keys), min_match="mm")
    local = Searcher(IndexReader(out))
    dist = RaySearcher(out, num_workers=3)
    a = local.search(q, k=40)
    b = dist.search(q, k=40)
    assert a.doc_ids.tolist() == b.doc_ids.tolist()
    assert a.scores.tolist() == b.scores.tolist()
