"""Extension surface (SURVEY §2.10): custom analyzer plug, similarity
plug, merge-policy knobs."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_ray.analysis import StandardAnalyzer
from lucene_ray.index import build_index
from lucene_ray.search import IndexReader, Searcher, TermQuery


def test_custom_analyzer_plugs_in(ray_session, tmp_path_factory):
    # defined locally so cloudpickle ships it by value (test modules are
    # not importable from Ray worker processes)
    class SuffixStemAnalyzer(StandardAnalyzer):
        """Toy custom chain: standard analysis + strip a trailing 's'
        (Analyzer.createComponents hook analog)."""

        def __call__(self, text):
            return [t[:-1] if t.endswith("s") and len(t) > 3 else t
                    for t in super().__call__(text)]

    texts = ["dogs chase cats", "the dog and the cat", "dogs dogs dogs"]
    t = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    d = tmp_path_factory.mktemp("customana")
    path = str(d / "docs.parquet")
    pq.write_table(t, path)

    out = str(d / "idx")
    build_index(path, out, batch_size=10, analyzer=SuffixStemAnalyzer())
    s = Searcher(IndexReader(out))
    # stemmed term matches all docs containing dogs/dog
    td = s.search(TermQuery("dog"), k=10)
    assert set(td.doc_ids.tolist()) == {0, 1, 2}
    # unstemmed form is no longer a term
    assert s.count(TermQuery("dogs")) == 0


def test_similarity_plug_changes_scores_not_matches(ray_session, small_pages,
                                                    tmp_path_factory):
    _, paths = small_pages
    out = str(tmp_path_factory.mktemp("simplug"))
    build_index(paths, out, batch_size=1000)
    lucene = Searcher(IndexReader(out))
    exact = Searcher(IndexReader(out), similarity="bm25_exact64")
    sr = lucene.reader.segment(lucene.reader.segment_infos[0].seg_id)
    term = next(iter(sr.terms()))
    a = lucene.search(TermQuery(term), k=200)
    b = exact.search(TermQuery(term), k=200)
    assert set(a.doc_ids.tolist()) == set(b.doc_ids.tolist())
    assert a.scores.dtype == np.float32
    assert b.scores.dtype == np.float64
