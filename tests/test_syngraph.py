"""Query-time synonym graph conformance (util/QueryBuilder.java
analyzeGraphBoolean/analyzeGraphPhrase; TestSynonymGraphFilter.java and
TestQueryParser.java synonym cases, transcribed structurally)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_ray.analysis.syngraph import SynonymGraphAnalyzer
from lucene_ray.search.query import BooleanQuery, PhraseQuery, TermQuery
from lucene_ray.search.queryparser import QueryParser


def _p(expr, syns, op="OR"):
    return QueryParser("text", SynonymGraphAnalyzer(syns), op).parse(expr)


def test_single_token_synonym_becomes_disjunction():
    # TestQueryParser: "dog" with dog->canine => Synonym(dog canine)
    q = _p("dog", {"dog": ["canine"]})
    assert isinstance(q, BooleanQuery)
    assert set(q.should) == {TermQuery("dog"), TermQuery("canine")}
    assert q.must == ()


def test_multiword_expansion_becomes_phrase_path():
    # "ny" -> "new york": (ny OR "new york")
    q = _p("ny", {"ny": ["new york"]})
    assert isinstance(q, BooleanQuery)
    assert set(q.should) == {TermQuery("ny"),
                             PhraseQuery(("new", "york"))}


def test_quoted_multiword_key_collapses():
    # TestSynonymGraphFilter: "guinea pig" -> cavy inside a phrase:
    # spanOr(spanNear(guinea pig), cavy)
    q = _p('"guinea pig"', {"guinea pig": ["cavy"]})
    assert isinstance(q, BooleanQuery)
    assert set(q.should) == {PhraseQuery(("guinea", "pig")),
                             TermQuery("cavy")}


def test_phrase_with_embedded_graph_enumerates_paths():
    q = _p('"old ny building"', {"ny": ["new york"]})
    assert isinstance(q, BooleanQuery)
    assert set(q.should) == {
        PhraseQuery(("old", "ny", "building")),
        PhraseQuery(("old", "new", "york", "building"))}


def test_greedy_longest_match_wins():
    # both "new" and "new york" map: the longer key must match first
    spans = SynonymGraphAnalyzer(
        {"new": ["fresh"], "new york": ["ny"]}).analyze_spans("new york city")
    assert spans == [[("new", "york"), ("ny",)], [("city",)]]


def test_default_operator_and_joins_atoms_not_paths():
    q = _p("fast dog", {"dog": ["canine"]}, op="AND")
    assert isinstance(q, BooleanQuery) and len(q.must) == 2
    sub = [c for c in q.must if isinstance(c, BooleanQuery)][0]
    assert set(sub.should) == {TermQuery("dog"), TermQuery("canine")}


def test_no_synonyms_is_plain_parse():
    q = _p("hello", {})
    assert q == TermQuery("hello")
    q2 = _p('"hello world"', {})
    assert q2 == PhraseQuery(("hello", "world"))


def test_path_explosion_raises():
    from lucene_ray.search.queryparser import ParseException
    syns = {c: [c + "x", c + "y", c + "z"] for c in "abcdefgh"}
    with pytest.raises(ParseException):
        _p('"a b c d e f g h"', syns)


def test_end_to_end_synonym_match(ray_session, tmp_path_factory):
    """Index without synonyms; the graph query matches docs containing
    any path: term, single-token synonym, or multi-word synonym."""
    from lucene_ray.index import build_index
    from lucene_ray.search import IndexReader, Searcher
    texts = ["the quick dog runs", "a canine barks", "visiting ny today",
             "i love new york pizza", "york new backwards", "nothing here"]
    t = pa.table({"doc_id": pa.array(np.arange(6, dtype=np.int64)),
                  "text": pa.array(texts, pa.string())})
    d = tmp_path_factory.mktemp("syn")
    src = str(d / "docs.parquet")
    pq.write_table(t, src)
    build_index(src, str(d / "idx"), index_positions=True)
    s = Searcher(IndexReader(str(d / "idx")))
    q1 = _p("dog", {"dog": ["canine"]})
    assert s.match_docs(q1).tolist() == [0, 1]
    q2 = _p("ny", {"ny": ["new york"]})
    # "york new backwards" must NOT match the phrase path
    assert s.match_docs(q2).tolist() == [2, 3]
