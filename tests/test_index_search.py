"""End-to-end index build + BM25 search vs a brute-force oracle.

The CheckHits pattern (SURVEY.md §5.3): a pure-Python float32 BM25
scorer over the whole fixture corpus, independent of the engine's index
structures, must equal the engine's top-k exactly (scores float32-equal,
ranks identical) — across partition counts (1 vs many segments).
"""

import math

import numpy as np
import pytest

from lucene_ray.analysis import StandardAnalyzer, int_to_byte4
from lucene_ray.analysis.smallfloat import LENGTH_TABLE
from lucene_ray.index import build_index
from lucene_ray.search import (
    BooleanQuery,
    IndexReader,
    Searcher,
    TermQuery,
    and_query,
    or_query,
)

K1, B = 1.2, 0.75


class BruteOracle:
    """Brute-force float32 BM25 over analyzed docs (CheckHits.java:101)."""

    def __init__(self, texts, doc_ids):
        analyzer = StandardAnalyzer()
        self.doc_terms = []
        self.doc_ids = doc_ids
        for t in texts:
            terms = analyzer(t)
            counts = {}
            for w in terms:
                counts[w] = counts.get(w, 0) + 1
            self.doc_terms.append((counts, len(terms)))
        self.N = sum(1 for c, l in self.doc_terms if l > 0)
        self.sum_dl = sum(l for _, l in self.doc_terms)
        self.avgdl = np.float32(self.sum_dl / float(self.N))
        self.cache = (np.float32(1) / (np.float32(K1) * (
            (np.float32(1) - np.float32(B))
            + np.float32(B) * LENGTH_TABLE / self.avgdl))).astype(np.float32)
        self.df = {}
        for counts, _ in self.doc_terms:
            for w in counts:
                self.df[w] = self.df.get(w, 0) + 1

    def weight(self, term):
        df = self.df.get(term, 0)
        if df == 0:
            return np.float32(0)
        return np.float32(math.log(1 + (self.N - df + 0.5) / (df + 0.5)))

    def term_score(self, term, counts, dl):
        tf = counts.get(term, 0)
        if tf == 0:
            return None
        w = self.weight(term)
        norm_inv = self.cache[int_to_byte4(dl)]
        return np.float32(w - w / (np.float32(1) + np.float32(tf) * norm_inv))

    def search(self, must=(), should=(), must_not=(), k=10):
        hits = []
        for i, (counts, dl) in enumerate(self.doc_terms):
            ok = True
            for t in must:
                if t not in counts:
                    ok = False
                    break
            if not ok:
                continue
            if any(t in counts for t in must_not):
                continue
            if not must and should and not any(t in counts for t in should):
                continue
            s64 = 0.0
            for t in list(must) + list(should):
                ts = self.term_score(t, counts, dl)
                if ts is not None:
                    s64 += float(ts)
            hits.append((np.float32(s64), self.doc_ids[i]))
        hits.sort(key=lambda h: (-h[0], h[1]))
        hits = hits[:k]
        return ([d for _, d in hits], [s for s, _ in hits])


@pytest.fixture(scope="module", params=[1, 8], ids=["1seg", "8seg"])
def built_index(request, ray_session, small_pages, tmp_path_factory):
    src_dir, paths = small_pages
    out = str(tmp_path_factory.mktemp(f"idx_{request.param}"))
    n_batches = request.param
    bs = (2000 + n_batches - 1) // n_batches
    m = build_index(paths, out, text_col="text", id_col="doc_id",
                    stored_cols=("url",), batch_size=bs)
    return out, m


@pytest.fixture(scope="module")
def oracle(small_pages):
    import pyarrow.parquet as pq
    src_dir, paths = small_pages
    tables = [pq.read_table(p, columns=["doc_id", "text"]) for p in paths]
    texts, ids = [], []
    for t in tables:
        texts.extend(t.column("text").to_pylist())
        ids.extend(t.column("doc_id").to_pylist())
    return BruteOracle(texts, ids)


QUERIES = [
    ("term_hot", [], ["the"], []),        # may or may not exist; zipf head
    ("term_1", [], ["data"], []),
    ("and_2", ["fast", "key"], [], []),
    ("or_2", [], ["fast", "key"], []),
    ("or_5", [], ["fast", "key", "table", "zzzz_absent", "scan"], []),
    ("and_or", ["fast"], ["key", "table"], []),
    ("not", ["fast"], [], ["key"]),
]


def _pick_terms(oracle):
    # replace placeholders with terms that actually exist in this corpus
    by_df = sorted(oracle.df.items(), key=lambda kv: -kv[1])
    hot = [w for w, _ in by_df[:5]]
    mid = [w for w, _ in by_df[len(by_df) // 4: len(by_df) // 4 + 5]]
    rare = [w for w, _ in by_df[-5:]]
    return hot, mid, rare


def test_manifest_counts(built_index, oracle):
    out, m = built_index
    assert m.num_docs == 2000
    assert m.field_doc_count == oracle.N
    assert m.sum_doc_len == oracle.sum_dl


@pytest.mark.parametrize("k", [1, 10, 100])
def test_term_query_matches_oracle(built_index, oracle, k):
    out, _ = built_index
    s = Searcher(IndexReader(out))
    hot, mid, rare = _pick_terms(oracle)
    for term in hot[:2] + mid[:2] + rare[:2] + ["zz_absent_zz"]:
        got = s.search(TermQuery(term), k=k)
        want_docs, want_scores = oracle.search(should=[term], k=k)
        assert got.doc_ids.tolist() == want_docs, term
        assert got.scores.tolist() == [float(x) for x in want_scores], term


@pytest.mark.parametrize("k", [1, 10, 100])
def test_bool_queries_match_oracle(built_index, oracle, k):
    out, _ = built_index
    s = Searcher(IndexReader(out))
    hot, mid, rare = _pick_terms(oracle)
    cases = [
        dict(must=[hot[0], mid[0]]),
        dict(must=[hot[0], hot[1], mid[1]]),
        dict(should=[hot[0], mid[0]]),
        dict(should=[hot[0], hot[1], mid[0], rare[0], "zz_absent"]),
        dict(must=[hot[0]], should=[mid[0], mid[1]]),
        dict(must=[hot[0]], must_not=[mid[0]]),
        dict(must=[rare[0]], should=[hot[0]]),
    ]
    for c in cases:
        q = BooleanQuery(
            must=tuple(TermQuery(t) for t in c.get("must", ())),
            should=tuple(TermQuery(t) for t in c.get("should", ())),
            must_not=tuple(TermQuery(t) for t in c.get("must_not", ())),
        )
        got = s.search(q, k=k)
        want_docs, want_scores = oracle.search(
            must=c.get("must", ()), should=c.get("should", ()),
            must_not=c.get("must_not", ()), k=k)
        assert got.doc_ids.tolist() == want_docs, c
        assert got.scores.tolist() == [float(x) for x in want_scores], c


def test_partition_count_invariance(ray_session, small_pages, tmp_path_factory, oracle):
    """1-segment and 8-segment builds give identical results (FIXTURES F4)."""
    src_dir, paths = small_pages
    hot, mid, rare = _pick_terms(oracle)
    results = []
    for n_batches in (1, 8):
        out = str(tmp_path_factory.mktemp(f"inv_{n_batches}"))
        build_index(paths, out, batch_size=(2000 + n_batches - 1) // n_batches)
        s = Searcher(IndexReader(out))
        r = []
        for q in [TermQuery(hot[0]), and_query([hot[0], mid[0]]),
                  or_query([hot[0], mid[0], rare[0]])]:
            td = s.search(q, k=50)
            r.append((td.doc_ids.tolist(), td.scores.tolist()))
        results.append(r)
    assert results[0] == results[1]


def test_count(built_index, oracle):
    out, _ = built_index
    s = Searcher(IndexReader(out))
    hot, mid, _ = _pick_terms(oracle)
    got = s.count(TermQuery(hot[0]))
    assert got == oracle.df[hot[0]]
    got_and = s.count(and_query([hot[0], mid[0]]))
    want = sum(1 for c, _ in oracle.doc_terms if hot[0] in c and mid[0] in c)
    assert got_and == want


def test_search_after_pages_equal_global_ranking(ray_session, built_index):
    """searchAfter paging: concatenated pages == one big top-k, across
    score ties (IndexSearcher.searchAfter semantics)."""
    from lucene_ray.search import BooleanQuery, IndexReader, Searcher, \
        TermQuery
    idx, _ = built_index
    s = Searcher(IndexReader(idx), similarity="bm25_exact64")
    vocab = sorted(s.reader.all_term_stats())[:3]
    q = BooleanQuery(should=tuple(TermQuery(t) for t in vocab))
    full = s.search(q, k=30)
    paged = []
    td = s.search(q, k=10)
    paged.extend(zip(td.doc_ids.tolist(), td.scores.tolist()))
    for _ in range(2):
        after = (td.scores[-1], int(td.doc_ids[-1]))
        td = s.search_after(q, k=10, after=after)
        paged.extend(zip(td.doc_ids.tolist(), td.scores.tolist()))
    assert [d for d, _ in paged] == full.doc_ids.tolist()


def test_term_vectors(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq
    from collections import Counter
    from lucene_ray.index import build_index
    from lucene_ray.search import IndexReader
    texts = ["data merge data window", "spark spark block", ""]
    path = str(tmp_path / "docs.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array([5, 6, 7], pa.int64()),
        "text": pa.array(texts)}), path)
    out = str(tmp_path / "idx")
    build_index(path, out, batch_size=2, term_vectors=True)
    r = IndexReader(out)
    for did, text in zip([5, 6, 7], texts):
        tv = r.term_vector(did)
        want = Counter(text.split())
        got = dict(zip(tv["term"].to_pylist(), tv["tf"].to_pylist()))
        assert got == dict(want)
        assert tv["term"].to_pylist() == sorted(want)  # term-sorted


def test_query_rescorer(ray_session, small_pages, tmp_path_factory):
    """QueryRescorer (search/QueryRescorer.java): rescored = first +
    weight*second on first-pass hits only; non-matching hits keep their
    first-pass score; re-ranked score desc / docID asc."""
    import numpy as np
    from lucene_ray.index import build_index
    from lucene_ray.search import (
        IndexReader, PhraseQuery, Searcher, TermQuery, or_query,
    )

    _, paths = small_pages
    out = str(tmp_path_factory.mktemp("rescore"))
    build_index(paths, out, batch_size=1000, index_positions=True)
    s = Searcher(IndexReader(out), similarity="bm25_exact64")
    sr = s.reader.segment(s.reader.segment_infos[0].seg_id)
    terms = sorted(sr.terms())[:3]
    first = s.search(or_query(terms), k=40)
    second_q = TermQuery(terms[0])
    td = s.rescore(first, second_q, weight=3.0, k=20)
    # brute: join complete second-pass scores onto the candidate set
    d2, s2 = s.eval_complete(second_q)
    lut = dict(zip(d2.tolist(), s2.tolist()))
    want = sorted(
        ((d, sc + 3.0 * lut.get(d, 0.0))
         for d, sc in zip(first.doc_ids.tolist(), first.scores.tolist())),
        key=lambda t: (-t[1], t[0]))[:20]
    assert td.doc_ids.tolist() == [d for d, _ in want]
    assert np.allclose(td.scores, [v for _, v in want], rtol=0, atol=0)
    # weight 0 keeps first-pass order (already sorted the same way)
    td0 = s.rescore(first, second_q, weight=0.0, k=10)
    assert td0.doc_ids.tolist() == first.doc_ids[:10].tolist()


def test_explain_matches_score(built_index, oracle):
    """IndexSearcher.explain role: root value == the doc's score; term
    explanations carry the BM25 factor breakdown."""
    from lucene_ray.search import (BooleanQuery, ConstantScoreQuery,
                                   Searcher, TermQuery)
    out, _m = built_index
    s = Searcher(IndexReader(out), similarity="bm25_exact64")
    by_df = sorted(oracle.df.items(), key=lambda kv: -kv[1])
    t1, t2 = by_df[0][0], by_df[1][0]
    q = TermQuery(t1)
    docs, scores = s.eval_complete(q)
    assert len(docs) > 0
    e = s.explain(q, int(docs[0]))
    assert e["value"] == scores[0]
    descs = [d["description"] for d in e["details"]]
    assert any("idf" in d for d in descs)
    assert any(d == "freq" for d in descs)
    non = int(np.setdiff1d(np.arange(docs.max() + 2), docs)[0])
    assert s.explain(q, non)["value"] == 0.0
    bq = BooleanQuery(should=(TermQuery(t1), TermQuery(t2)))
    bdocs, bscores = s.eval_complete(bq)
    eb = s.explain(bq, int(bdocs[0]))
    assert eb["value"] == pytest.approx(bscores[0], rel=1e-12)
    ec = s.explain(ConstantScoreQuery(TermQuery(t1), 2.5), int(docs[0]))
    assert ec["value"] == 2.5 and ec["details"]


def test_fuzzy_boost_by_similarity(built_index, oracle):
    """TopTermsBoostOnlyBooleanQueryRewrite role: with
    boost_by_similarity, closer spellings carry higher term boosts
    (1 - d/min-len) and the rewrite equals the hand-built boosted OR."""
    from lucene_ray.search import (BooleanQuery, FuzzyQuery, Searcher,
                                   TermQuery)
    from lucene_ray.search.query import _edit_distance
    out, _m = built_index
    s = Searcher(IndexReader(out), similarity="bm25_exact64")
    base = sorted(oracle.df, key=lambda w: -oracle.df[w])[0]
    q = FuzzyQuery(base, max_edits=2, boost_by_similarity=True)
    rw = s.rewrite(q)
    assert isinstance(rw, BooleanQuery) and rw.should
    for c in rw.should:
        d = _edit_distance(c.term, base, 2, True)
        assert c.boost == pytest.approx(
            1.0 - d / min(len(c.term), len(base)))
    exact = [c for c in rw.should if c.term == base]
    assert exact and exact[0].boost == 1.0
    # scoring end-to-end equals the equivalent hand-boosted OR
    want = s.search(BooleanQuery(should=rw.should), k=20)
    got = s.search(q, k=20)
    assert got.doc_ids.tolist() == want.doc_ids.tolist()
    np.testing.assert_allclose(got.scores, want.scores, rtol=0)
