"""Porter stemmer conformance: the reference's full golden vocabulary
(analysis/common/src/test/.../en/porterTestData.zip, 23,531 pairs) plus
the EnglishAnalyzer preset through the index's Analyzer hook."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from lucene_ray.analysis.stemmer import EnglishAnalyzer, porter_stem

DATA = os.path.join(os.path.dirname(__file__), "data", "porter")


def test_full_golden_vocabulary():
    voc = open(os.path.join(DATA, "voc.txt")).read().split()
    out = open(os.path.join(DATA, "output.txt")).read().split()
    assert len(voc) == len(out) == 23531
    mism = [(v, porter_stem(v), o)
            for v, o in zip(voc, out) if porter_stem(v) != o]
    assert mism == []


def test_english_analyzer_hook_end_to_end(ray_session, tmp_path_factory):
    from lucene_ray.index import build_index
    from lucene_ray.search import IndexReader, Searcher, TermQuery

    texts = ["the runner was running quickly",
             "she runs daily", "connection connected connecting",
             "nothing relevant"]
    t = pa.table({"doc_id": pa.array(np.arange(4, dtype=np.int64)),
                  "text": pa.array(texts, pa.string())})
    d = tmp_path_factory.mktemp("stem")
    path = str(d / "docs.parquet")
    pq.write_table(t, path)
    out = str(d / "idx")
    build_index(path, out, batch_size=10, analyzer=EnglishAnalyzer())
    s = Searcher(IndexReader(out))
    # all morphological variants collapse onto the stem
    assert set(s.match_docs(TermQuery(porter_stem("running"))).tolist()) \
        == {0, 1}
    assert set(s.match_docs(TermQuery("connect")).tolist()) == {2}
    # unstemmed surface forms are NOT in the dictionary
    assert s.count(TermQuery("running")) == 0


def test_ngram_filter():
    from lucene_ray.analysis.stemmer import NGramFilter
    f = NGramFilter(2, 3)
    assert f(["abcd"]) == ["ab", "abc", "bc", "bcd", "cd"]
    f1 = NGramFilter(1, 1)
    assert f1(["ab"]) == ["a", "b"]
    fp = NGramFilter(2, 3, preserve_original=True)
    assert "abcde" in fp(["abcde"])


def test_synonym_filter_and_chain(ray_session, tmp_path_factory):
    from lucene_ray.analysis.stemmer import AnalyzerChain, SynonymFilter
    from lucene_ray.index import build_index
    from lucene_ray.search import IndexReader, Searcher, TermQuery

    chain = AnalyzerChain(SynonymFilter({"car": ("auto", "vehicle")}))
    assert chain("the car moves") == ["the", "car", "auto", "vehicle",
                                      "moves"]
    texts = ["a car drives", "an auto parks", "a bike rolls"]
    t = pa.table({"doc_id": pa.array(np.arange(3, dtype=np.int64)),
                  "text": pa.array(texts, pa.string())})
    d = tmp_path_factory.mktemp("syn")
    path = str(d / "docs.parquet")
    pq.write_table(t, path)
    out = str(d / "idx")
    build_index(path, out, batch_size=10, analyzer=chain)
    s = Searcher(IndexReader(out))
    # doc 0's "car" expanded at index time -> searching "auto" finds both
    assert set(s.match_docs(TermQuery("auto")).tolist()) == {0, 1}
    assert set(s.match_docs(TermQuery("vehicle")).tolist()) == {0}
