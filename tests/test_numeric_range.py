"""NumericRangeQuery — PointRangeQuery / doc-values range filter analog
(``search/PointRangeQuery.java``): predicate-pushdown scan of a stored
numeric column, composed with text clauses as a FILTER."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_ray.index import build_index
from lucene_ray.search import IndexReader, Searcher, TermQuery
from lucene_ray.search.query import BooleanQuery, NumericRangeQuery


@pytest.fixture(scope="module")
def num_index(ray_session, tmp_path_factory):
    rng = np.random.default_rng(23)
    n = 400
    texts = [" ".join(rng.choice(["alpha", "beta", "gamma"], 6))
             for _ in range(n)]
    years = rng.integers(1990, 2030, n)
    t = pa.table({"doc_id": pa.array(np.arange(n, dtype=np.int64)),
                  "text": pa.array(texts, pa.string()),
                  "year": pa.array(years, pa.int64())})
    d = tmp_path_factory.mktemp("numr")
    path = str(d / "docs.parquet")
    pq.write_table(t, path)
    out = str(d / "idx")
    build_index(path, out, batch_size=100, stored_cols=("year",))
    return out, texts, years


def test_bare_range(num_index):
    out, texts, years = num_index
    s = Searcher(IndexReader(out))
    q = NumericRangeQuery("year", 2000, 2009)
    want = {i for i, y in enumerate(years) if 2000 <= y <= 2009}
    assert set(s.match_docs(q).tolist()) == want
    # open + exclusive bounds
    q2 = NumericRangeQuery("year", None, 2000, include_upper=False)
    want2 = {i for i, y in enumerate(years) if y < 2000}
    assert set(s.match_docs(q2).tolist()) == want2


def test_range_as_filter_clause(num_index):
    out, texts, years = num_index
    s = Searcher(IndexReader(out))
    q = BooleanQuery(must=(TermQuery("alpha"),),
                     filter=(NumericRangeQuery("year", 2010, None),))
    want = {i for i in range(len(texts))
            if "alpha" in texts[i].split() and years[i] >= 2010}
    assert set(s.match_docs(q).tolist()) == want
    # scored: filter does not contribute to the score
    td = s.search(q, k=5)
    td_plain = s.search(TermQuery("alpha"), k=400)
    by_doc = dict(zip(td_plain.doc_ids.tolist(), td_plain.scores.tolist()))
    for d, sc in zip(td.doc_ids.tolist(), td.scores.tolist()):
        assert sc == by_doc[d]


def test_doc_value_sidecar_pruned(ray_session, tmp_path_factory):
    """dv_<col>.parquet sidecar: value-sorted, row-group pruned, same
    results as the pushdown fallback — and survives a merge."""
    import os

    from lucene_ray.index.merge import merge_segments

    rng = np.random.default_rng(29)
    n = 2000
    texts = ["alpha beta"] * n
    years = rng.integers(0, 100000, n)
    t = pa.table({"doc_id": pa.array(np.arange(n, dtype=np.int64)),
                  "text": pa.array(texts, pa.string()),
                  "year": pa.array(years, pa.int64())})
    d = tmp_path_factory.mktemp("dv")
    path = str(d / "docs.parquet")
    pq.write_table(t, path)
    out = str(d / "idx")
    build_index(path, out, batch_size=500, doc_value_cols=("year",))
    reader = IndexReader(out)
    for sr in reader.segments():
        assert os.path.isfile(os.path.join(sr._seg_dir, "dv_year.parquet"))
    s = Searcher(reader)
    q = NumericRangeQuery("year", 10000, 20000)
    want = {int(i) for i, y in enumerate(years) if 10000 <= y <= 20000}
    assert set(s.match_docs(q).tolist()) == want
    # merged segment regenerates the sidecar
    merge_segments(out)
    reader2 = IndexReader(out)
    for sr in reader2.segments():
        assert os.path.isfile(os.path.join(sr._seg_dir, "dv_year.parquet"))
    assert set(Searcher(reader2).match_docs(q).tolist()) == want


def test_topk_by_field_early_termination(ray_session, tmp_path_factory):
    from lucene_ray.search.facets import topk_by_field

    rng = np.random.default_rng(31)
    n = 3000
    years = rng.integers(0, 50, n)  # heavy ties exercise tie order
    t = pa.table({"doc_id": pa.array(np.arange(n, dtype=np.int64)),
                  "text": pa.array(["x"] * n, pa.string()),
                  "year": pa.array(years, pa.int64())})
    d = tmp_path_factory.mktemp("topkf")
    path = str(d / "docs.parquet")
    pq.write_table(t, path)
    out = str(d / "idx")
    build_index(path, out, batch_size=1000, doc_value_cols=("year",))
    reader = IndexReader(out)
    got = topk_by_field(reader, "year", 25, ascending=True).to_pylist()
    want = sorted(zip(years.tolist(), range(n)))[:25]
    assert [(r["year"], r["doc_id"]) for r in got] == want
    got_d = topk_by_field(reader, "year", 25, ascending=False).to_pylist()
    want_d = sorted(zip(years.tolist(), range(n)),
                    key=lambda p: (-p[0], p[1]))[:25]
    assert [(r["year"], r["doc_id"]) for r in got_d] == want_d


def test_dv_terms_query_vs_brute(ray_session, tmp_path_factory):
    """DocValuesTermsQuery: set membership on a stored column, live
    masking and boolean-filter composition included."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    from lucene_ray.index import build_index
    from lucene_ray.search import (BooleanQuery, DocValuesTermsQuery,
                                   IndexReader, Searcher, TermQuery)
    rng = np.random.default_rng(101)
    n = 300
    langs = [str(rng.choice(["en", "de", "fr", "zh"])) for _ in range(n)]
    texts = [f"{'data' if i % 2 else 'merge'} w{i % 9}" for i in range(n)]
    t = pa.table({"doc_id": pa.array(np.arange(n, dtype=np.int64)),
                  "text": pa.array(texts, pa.string()),
                  "lang": pa.array(langs, pa.string())})
    d = tmp_path_factory.mktemp("dvterms")
    p = str(d / "docs.parquet")
    pq.write_table(t, p)
    out = str(d / "idx")
    build_index(p, out, batch_size=64, stored_cols=("lang",))
    s = Searcher(IndexReader(out))
    got = s.match_docs(DocValuesTermsQuery("lang", ("en", "zh")))
    want = [i for i in range(n) if langs[i] in ("en", "zh")]
    np.testing.assert_array_equal(got, want)
    # composed as a filter over a scored query
    q = BooleanQuery(must=(TermQuery("data"),),
                     filter=(DocValuesTermsQuery("lang", ("de",)),))
    got2 = s.match_docs(q)
    want2 = [i for i in range(n) if i % 2 and langs[i] == "de"]
    np.testing.assert_array_equal(got2, want2)
    assert len(s.match_docs(DocValuesTermsQuery("lang", ("xx",)))) == 0
