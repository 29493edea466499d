"""Grouping module (TopGroups) + TermInSetQuery.

Brute-force oracle: score every doc with the searcher's own complete
eval, then group/rank in plain Python with the documented tie orders
(group: best desc, value asc; hits: score desc, doc asc).
"""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_ray.index import build_index
from lucene_ray.search import (
    BooleanQuery, IndexReader, Searcher, TermInSetQuery, TermQuery,
)
from lucene_ray.search.grouping import group_topk


@pytest.fixture(scope="module")
def grp_index(ray_session, tmp_path_factory):
    rng = np.random.default_rng(77)
    n = 400
    vocab = ["data", "merge", "spark", "window", "shard", "block"]
    texts = [" ".join(rng.choice(vocab, int(rng.integers(3, 12))))
             for _ in range(n)]
    langs = [str(rng.choice(["en", "de", "fr", "es", "it"])) for _ in range(n)]
    d = tmp_path_factory.mktemp("grouping")
    path = str(d / "docs.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string())}), path)
    out = str(d / "idx")
    build_index(path, out, batch_size=64, stored_cols=("lang",))
    return out, texts, langs


def _brute_groups(searcher, q, langs, n_groups, k):
    docs, scores = searcher.eval_complete(q)
    by = {}
    for d, s in zip(docs, scores):
        by.setdefault(langs[int(d)], []).append((float(s), int(d)))
    best = {g: max(s for s, _ in rows) for g, rows in by.items()}
    groups = sorted(best, key=lambda g: (-best[g], g))[:n_groups]
    out = []
    for gi, g in enumerate(groups, 1):
        rows = sorted(by[g], key=lambda r: (-r[0], r[1]))[:k]
        for di, (_s, d) in enumerate(rows, 1):
            out.append((g, gi, d, di))
    return out


@pytest.mark.parametrize("n_groups,k", [(3, 2), (5, 4), (100, 100)])
def test_group_topk_matches_brute(grp_index, n_groups, k):
    langs = grp_index[2]
    s = Searcher(IndexReader(grp_index[0]), similarity="bm25_exact64")
    q = BooleanQuery(should=(TermQuery("data"), TermQuery("merge")))
    got = group_topk(s, q, "lang", n_groups=n_groups, k=k).to_pylist()
    got_rows = [(r["lang"], r["group_rank"], r["doc_id"], r["doc_rank"])
                for r in got]
    assert got_rows == _brute_groups(s, q, langs, n_groups, k)


def test_group_topk_multi_segment_combine(grp_index):
    # batch_size=64 over 400 docs -> several segments; per-segment
    # partials must merge to the same global answer
    s = Searcher(IndexReader(grp_index[0]), similarity="bm25_exact64")
    assert len(s.reader.segment_infos) > 1
    q = TermQuery("spark")
    got = group_topk(s, q, "lang", n_groups=5, k=3).to_pylist()
    assert got == sorted(got, key=lambda r: (r["group_rank"], r["doc_rank"]))
    assert [(r["lang"], r["group_rank"], r["doc_id"], r["doc_rank"])
            for r in got] == _brute_groups(s, q, grp_index[2], 5, 3)


def test_term_in_set(grp_index):
    out, texts, langs = grp_index
    s = Searcher(IndexReader(out))
    terms = ("shard", "block", "nosuchterm")
    docs = np.sort(s.match_docs(TermInSetQuery(terms)))
    want = [i for i, t in enumerate(texts)
            if set(t.split()) & {"shard", "block"}]
    assert docs.tolist() == want


def test_term_in_set_no_clause_cap(grp_index):
    # 2000 terms > MAX_CLAUSE_COUNT must NOT raise (the TermInSetQuery
    # reason-to-exist); absent terms are skipped
    out, texts, _ = grp_index
    s = Searcher(IndexReader(out))
    terms = tuple(f"zz{i}" for i in range(2000)) + ("data",)
    docs = np.sort(s.match_docs(TermInSetQuery(terms)))
    want = [i for i, t in enumerate(texts) if "data" in t.split()]
    assert docs.tolist() == want


def test_term_in_set_constant_score(grp_index):
    out, _, _ = grp_index
    s = Searcher(IndexReader(out), similarity="bm25_exact64")
    td = s.search(TermInSetQuery(("data", "merge"), boost=2.5), k=5)
    assert np.allclose(td.scores, 2.5)


def test_word_breaks_and_combinations(grp_index):
    from lucene_ray.search import IndexReader
    from lucene_ray.search.suggest import word_breaks, word_combinations
    r = IndexReader(grp_index[0])
    # vocab: data merge spark window shard block
    wb = word_breaks(r, "datamerge").to_pylist()
    assert wb and wb[0]["lterm"] == "data" and wb[0]["rterm"] == "merge"
    assert word_breaks(r, "xxyyzz").to_pylist() == []
    wc = word_combinations(r, ["da", "ta", "merge"]).to_pylist()
    assert wc and wc[0]["combined"] == "data" and wc[0]["position"] == 0
