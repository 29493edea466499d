"""JoinUtil query-time term join vs a brute-force Python oracle."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_ray.index import build_index
from lucene_ray.search import IndexReader, Searcher, TermQuery
from lucene_ray.search.join import join_util_query


@pytest.fixture(scope="module")
def two_indexes(ray_session, tmp_path_factory):
    rng = np.random.default_rng(5)
    d = tmp_path_factory.mktemp("joinutil")
    # from side: "orders" with a category column
    n_from = 250
    cats_f = [f"c{int(rng.integers(0, 8))}" for _ in range(n_from)]
    texts_f = [" ".join(rng.choice(["red", "blue", "green"],
                                   int(rng.integers(2, 7))))
               for _ in range(n_from)]
    fp = str(d / "from.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(n_from, dtype=np.int64)),
        "text": pa.array(texts_f), "cat": pa.array(cats_f)}), fp)
    fidx = str(d / "fidx")
    build_index(fp, fidx, batch_size=64, stored_cols=("cat",))
    # to side: "products" sharing the category domain (incl. some
    # categories the from side never matches)
    n_to = 300
    cats_t = [f"c{int(rng.integers(0, 10))}" for _ in range(n_to)]
    tp = str(d / "to.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(1000, 1000 + n_to, dtype=np.int64)),
        "text": pa.array(["item"] * n_to), "cat": pa.array(cats_t)}), tp)
    tidx = str(d / "tidx")
    build_index(tp, tidx, batch_size=64, stored_cols=("cat",))
    return fidx, tidx, texts_f, cats_f, cats_t


@pytest.mark.parametrize("mode", ["none", "max", "total", "avg"])
def test_join_util_modes(two_indexes, mode):
    fidx, tidx, texts_f, cats_f, cats_t = two_indexes
    fs = Searcher(IndexReader(fidx), similarity="bm25_exact64")
    ts = Searcher(IndexReader(tidx), similarity="bm25_exact64")
    q = TermQuery("red")
    docs, scores = join_util_query(fs, q, "cat", ts, "cat", mode)
    # brute: from-side matches + their scores via the engine itself
    fd, fsc = fs.eval_complete(fs.rewrite(q))
    by = {}
    for d, s in zip(fd, fsc):
        by.setdefault(cats_f[int(d)], []).append(float(s))
    agg = {v: (1.0 if mode == "none" else max(ss) if mode == "max"
               else float(np.sum(ss)) if mode == "total"
               else float(np.mean(ss)))
           for v, ss in by.items()}
    want = [(1000 + i, agg[c]) for i, c in enumerate(cats_t) if c in agg]
    assert docs.tolist() == [d for d, _ in want]
    assert np.allclose(scores, [s for _, s in want], rtol=0, atol=0)


def test_join_util_empty_from(two_indexes):
    fidx, tidx, *_ = two_indexes
    fs = Searcher(IndexReader(fidx))
    ts = Searcher(IndexReader(tidx))
    docs, scores = join_util_query(fs, TermQuery("nosuchterm"), "cat",
                                   ts, "cat", "max")
    assert len(docs) == 0 and len(scores) == 0
