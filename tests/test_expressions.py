"""Expressions compiler + FunctionScoreQuery vs brute re-ranking."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_ray.search.expressions import (
    ExpressionError,
    compile_expression,
)


def test_compile_arithmetic_and_precedence():
    e = compile_expression("2 + 3 * 4 - 6 / 3")
    assert e({}) == pytest.approx(12.0)
    assert compile_expression("(2 + 3) * 4")({}) == pytest.approx(20.0)
    assert compile_expression("-3 + 5")({}) == pytest.approx(2.0)
    assert compile_expression("7 % 4")({}) == pytest.approx(3.0)


def test_compile_functions_and_variables():
    e = compile_expression("_score * ln(1 + n_chars)")
    assert e.variables == frozenset({"_score", "n_chars"})
    s = np.array([1.0, 2.0])
    n = np.array([0.0, np.e - 1])
    np.testing.assert_allclose(e({"_score": s, "n_chars": n}),
                               s * np.log(1 + n))
    e2 = compile_expression("max(a, b) + min(a, b) - pow(a, 2)")
    a, b = np.array([3.0, 1.0]), np.array([2.0, 4.0])
    np.testing.assert_allclose(e2({"a": a, "b": b}), a + b - a ** 2)
    np.testing.assert_allclose(
        compile_expression("sqrt(abs(x))")({"x": np.array([-9.0, 16.0])}),
        [3.0, 4.0])
    np.testing.assert_allclose(compile_expression("log10(100)")({}), 2.0)


def test_compile_errors():
    for bad in ["2 +", "foo(1, 2, 3)", "(1", "1 ^ 2", "ln()", ""]:
        with pytest.raises(ExpressionError):
            compile_expression(bad)
    with pytest.raises(ExpressionError):
        compile_expression("x + 1")({})  # unbound variable


@pytest.fixture(scope="module")
def fs_corpus(ray_session, tmp_path_factory):
    from lucene_ray.index import build_index
    rng = np.random.default_rng(13)
    vocab = [f"w{i}" for i in range(30)] + ["alpha", "beta"]
    texts, lens = [], []
    for i in range(200):
        n = int(rng.integers(5, 40))
        words = list(rng.choice(vocab, n))
        if i % 3 == 0:
            words.append("alpha")
        texts.append(" ".join(words))
        lens.append(len(texts[-1]))
    t = pa.table({
        "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
        "text": pa.array(texts, pa.string()),
        "n_chars": pa.array(np.asarray(lens, dtype=np.int64)),
    })
    d = tmp_path_factory.mktemp("fscore")
    path = str(d / "documents.parquet")
    pq.write_table(t, path)
    out = str(d / "idx")
    build_index(path, out, batch_size=64, doc_value_cols=("n_chars",))
    return path, out, texts, np.asarray(lens, dtype=np.float64)


def test_function_score_matches_brute_rerank(fs_corpus):
    from lucene_ray.search import (
        FunctionScoreQuery,
        IndexReader,
        Searcher,
        or_query,
    )
    _path, out, _texts, lens = fs_corpus
    s = Searcher(IndexReader(out), similarity="bm25_exact64")
    inner = or_query(["alpha", "beta"])
    docs, scores = s.eval_complete(inner)
    assert len(docs) > 0
    want = scores * np.log(1 + lens[docs])
    order = np.lexsort((docs, -want))[:15]
    td = s.search(FunctionScoreQuery(inner, "_score * ln(1 + n_chars)"),
                  k=15)
    np.testing.assert_array_equal(td.doc_ids, docs[order])
    np.testing.assert_allclose(td.scores, want[order])
    # match set is the inner query's
    np.testing.assert_array_equal(
        s.match_docs(FunctionScoreQuery(inner, "_score")),
        s.match_docs(inner))
    # constant expression: rank by docID (ties -> lower doc wins)
    td2 = s.search(FunctionScoreQuery(inner, "1"), k=5)
    np.testing.assert_array_equal(td2.doc_ids, np.sort(docs)[:5])


def test_function_score_boost_and_count(fs_corpus):
    from lucene_ray.search import (
        BoostQuery,
        FunctionScoreQuery,
        IndexReader,
        Searcher,
        TermQuery,
    )
    _path, out, _texts, _lens = fs_corpus
    s = Searcher(IndexReader(out), similarity="bm25_exact64")
    q = FunctionScoreQuery(TermQuery("alpha"), "_score + n_chars")
    td = s.search(q, k=10)
    tdb = s.search(BoostQuery(q, 2.0), k=10)
    np.testing.assert_array_equal(td.doc_ids, tdb.doc_ids)
    np.testing.assert_allclose(tdb.scores, 2.0 * td.scores)
    assert s.count(q) == s.count(TermQuery("alpha"))
