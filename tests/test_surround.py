"""Surround query parser (queryparser/surround role): parse shapes
transcribed from the reference's Test02Boolean/Test03Distance
semantics, plus end-to-end matching on a tiny positional index."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_ray.search import (
    BooleanQuery, IndexReader, PrefixQuery, Searcher, SpanNearQuery,
    TermQuery,
)
from lucene_ray.search.surroundparser import (
    SurroundSyntaxError, parse_surround,
)


def test_parse_boolean_shapes():
    q = parse_surround("data AND merge")
    assert isinstance(q, BooleanQuery) and len(q.must) == 2
    q = parse_surround("data OR merge OR window")
    assert isinstance(q, BooleanQuery) and len(q.should) == 3
    q = parse_surround("data NOT merge")
    assert isinstance(q, BooleanQuery) and len(q.must_not) == 1
    # keywords are case-insensitive; terms lowercase
    q = parse_surround("Data and Merge")
    assert isinstance(q, BooleanQuery)
    assert q.must[0].term == "data" and q.must[1].term == "merge"


def test_parse_distance_shapes():
    q = parse_surround("3W(data, merge)")
    assert isinstance(q, SpanNearQuery)
    assert q.terms == ("data", "merge") and q.slop == 2 and q.in_order
    q = parse_surround("data 4N merge")
    assert isinstance(q, SpanNearQuery)
    assert q.slop == 3 and not q.in_order
    # bare W = adjacent in order
    q = parse_surround("data W merge")
    assert q.slop == 0 and q.in_order
    # same-op infix chain collects operands
    q = parse_surround("data 2W merge 2W window")
    assert q.terms == ("data", "merge", "window") and q.slop == 1
    # prefix truncation outside distance ops
    q = parse_surround("merg*")
    assert isinstance(q, PrefixQuery)
    # composition
    q = parse_surround("2W(data, merge) AND (window OR spark)")
    assert isinstance(q, BooleanQuery) and len(q.must) == 2


def test_parse_errors():
    for bad in ["data 2W merge 3N window",  # mixed chain
                "AND data", "data AND", "(data", "3W(data merge)",
                "3W(dat*, merge)"]:
        with pytest.raises(SurroundSyntaxError):
            parse_surround(bad)


TEXTS = [
    "data x merge window",     # data..merge within 2 (ordered), has window
    "data merge",              # adjacent, no window
    "merge x x data window",   # wrong order, has window
    "data x x x merge window", # gap 3 > slop 2
    "window data a merge",     # in-window ordered + window
]


@pytest.fixture(scope="module")
def idx(ray_session, tmp_path_factory):
    from lucene_ray.index import build_index
    d = tmp_path_factory.mktemp("surround")
    path = str(d / "docs.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(TEXTS)), pa.int64()),
        "text": pa.array(TEXTS)}), path)
    out = str(d / "idx")
    build_index(path, out, batch_size=2, index_positions=True)
    return out


def test_end_to_end_match(idx):
    s = Searcher(IndexReader(idx))
    got = s.match_docs(parse_surround("3W(data, merge) AND window")).tolist()
    # ordered data->merge with <=2 unmatched gaps, and term window
    assert got == [0, 4]
    got = s.match_docs(parse_surround("3N(data, merge) AND window")).tolist()
    assert got == [0, 2, 4]
    got = s.match_docs(parse_surround("data W merge")).tolist()
    assert got == [1]
    got = s.match_docs(parse_surround("merg* NOT window")).tolist()
    assert got == [1]


def test_common_terms_rewrite_shapes():
    # CommonTermsQuery.buildQuery semantics (queries module)
    from lucene_ray.search.query import common_terms_query
    dfs = {"rare": 5, "mid": 40, "the": 900}
    q = common_terms_query(["rare", "mid", "the"], dfs, 1000, 0.10)
    # low group (rare, mid) is a MUST clause; high group (the) SHOULD
    assert len(q.must) == 1 and len(q.should) == 1
    assert {t.term for t in q.must[0].should} == {"rare", "mid"}
    assert {t.term for t in q.should[0].should} == {"the"}
    # all-high -> conjunction (slow-query guard)
    q2 = common_terms_query(["the", "a"], {"the": 900, "a": 950}, 1000, 0.10)
    assert len(q2.must) == 1 and not q2.should
    assert {t.term for t in q2.must[0].must} == {"the", "a"}
    # absolute threshold when max_term_frequency >= 1
    q3 = common_terms_query(["x", "y"], {"x": 10, "y": 200}, 1000, 100)
    assert {t.term for t in q3.must[0].should} == {"x"}


def test_blended_similarity_formula():
    import numpy as np
    from lucene_ray.search.similarities import BlendedBM25Similarity
    sim = BlendedBM25Similarity(df_blend=50)
    tf = np.array([1, 3], dtype=np.int64)
    dl = np.array([10, 20], dtype=np.int64)
    got = sim.term_score(tf, dl, df=5, ttf=0, boost=1.0,
                         doc_count=1000, sum_ttf=15000)
    idf = np.log(1 + (1000 - 50 + 0.5) / (50 + 0.5))  # blended df, not 5
    avgdl = 15000 / 1000
    want = idf * tf / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
    assert np.allclose(got, want, rtol=0, atol=0)
