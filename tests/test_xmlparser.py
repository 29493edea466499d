"""XML query parser (queryparser/xml CoreParser role): element set,
nesting, attributes; shapes follow TestCoreParser.java's fixtures."""

import pytest

from lucene_ray.search import (
    BooleanQuery,
    BoostQuery,
    ConstantScoreQuery,
    DisjunctionMaxQuery,
    FuzzyQuery,
    MatchAllDocsQuery,
    PhraseQuery,
    PrefixQuery,
    SpanNearQuery,
    TermInSetQuery,
    TermQuery,
    TermRangeQuery,
    WildcardQuery,
)
from lucene_ray.search.xmlparser import XMLParseError, parse_xml_query


def test_term_query():
    q = parse_xml_query("<TermQuery>Data</TermQuery>")
    assert q == TermQuery("data")


def test_term_query_field_and_boost():
    q = parse_xml_query('<TermQuery fieldName="title" boost="2.5">x</TermQuery>')
    assert isinstance(q, BoostQuery) and q.boost == 2.5
    assert q.inner == TermQuery("x", field="title")


def test_terms_query():
    q = parse_xml_query("<TermsQuery>data merge window</TermsQuery>")
    assert isinstance(q, TermInSetQuery)
    assert q.terms == ("data", "merge", "window")


def test_boolean_clauses():
    q = parse_xml_query("""
    <BooleanQuery minimumNumberShouldMatch="1">
      <Clause occurs="must"><TermQuery>a</TermQuery></Clause>
      <Clause occurs="should"><TermQuery>b</TermQuery></Clause>
      <Clause occurs="should"><TermQuery>c</TermQuery></Clause>
      <Clause occurs="mustNot"><TermQuery>d</TermQuery></Clause>
      <Clause occurs="filter"><TermQuery>e</TermQuery></Clause>
    </BooleanQuery>""")
    assert isinstance(q, BooleanQuery)
    assert q.must == (TermQuery("a"),)
    assert q.should == (TermQuery("b"), TermQuery("c"))
    assert q.must_not == (TermQuery("d"),)
    assert q.filter == (TermQuery("e"),)
    assert q.min_should_match == 1


def test_nested_boolean():
    q = parse_xml_query("""
    <BooleanQuery>
      <Clause occurs="must">
        <BooleanQuery>
          <Clause occurs="should"><TermQuery>x</TermQuery></Clause>
        </BooleanQuery>
      </Clause>
    </BooleanQuery>""")
    assert isinstance(q.must[0], BooleanQuery)


def test_phrase_and_slop():
    q = parse_xml_query('<PhraseQuery slop="2">data merge</PhraseQuery>')
    assert q == PhraseQuery(("data", "merge"), slop=2)
    # single analyzed token degrades to a TermQuery like the reference
    assert parse_xml_query("<PhraseQuery>data</PhraseQuery>") == \
        TermQuery("data")


def test_multi_term_leaves():
    assert parse_xml_query('<PrefixQuery prefix="Mer"/>') == \
        PrefixQuery("mer")
    assert parse_xml_query("<WildcardQuery>me?ge*</WildcardQuery>") == \
        WildcardQuery("me?ge*")
    fz = parse_xml_query('<FuzzyQuery maxEdits="1">merge</FuzzyQuery>')
    assert isinstance(fz, FuzzyQuery) and fz.max_edits == 1
    rg = parse_xml_query(
        '<RangeQuery lowerTerm="m" upperTerm="q" includeUpper="false"/>')
    assert rg == TermRangeQuery("m", "q", include_lower=True,
                                include_upper=False)


def test_point_range():
    from lucene_ray.search.query import NumericRangeQuery
    q = parse_xml_query(
        '<PointRangeQuery fieldName="n_chars" lowerTerm="10" '
        'upperTerm="99"/>')
    assert isinstance(q, NumericRangeQuery)
    assert (q.column, q.lower, q.upper) == ("n_chars", 10.0, 99.0)


def test_composites():
    q = parse_xml_query("""
    <DisjunctionMaxQuery tieBreaker="0.3">
      <TermQuery>a</TermQuery>
      <ConstantScoreQuery boost="4"><TermQuery>b</TermQuery></ConstantScoreQuery>
    </DisjunctionMaxQuery>""")
    assert isinstance(q, DisjunctionMaxQuery) and q.tie_breaker == 0.3
    assert isinstance(q.disjuncts[1], ConstantScoreQuery)
    assert parse_xml_query("<MatchAllDocsQuery/>") == MatchAllDocsQuery()


def test_span_near():
    q = parse_xml_query("""
    <SpanNear slop="3" inOrder="false">
      <SpanTerm>data</SpanTerm><SpanTerm>merge</SpanTerm>
    </SpanNear>""")
    assert q == SpanNearQuery(("data", "merge"), slop=3, in_order=False)


def test_errors():
    with pytest.raises(XMLParseError):
        parse_xml_query("<NoSuchQuery/>")
    with pytest.raises(XMLParseError):
        parse_xml_query("<BooleanQuery><TermQuery>a</TermQuery></BooleanQuery>")
    with pytest.raises(XMLParseError):
        parse_xml_query("not xml at all <<<")
    with pytest.raises(XMLParseError):
        parse_xml_query("<PhraseQuery>   </PhraseQuery>")


def test_stopword_clause_dropped():
    from lucene_ray.analysis import ENGLISH_STOP_WORDS, StandardAnalyzer
    an = StandardAnalyzer(stop_words=frozenset(ENGLISH_STOP_WORDS))
    q = parse_xml_query("""
    <BooleanQuery>
      <Clause occurs="should"><TermQuery>the</TermQuery></Clause>
      <Clause occurs="should"><TermQuery>data</TermQuery></Clause>
    </BooleanQuery>""", analyzer=an)
    assert q == BooleanQuery(should=(TermQuery("data"),))
