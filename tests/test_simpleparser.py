"""SimpleQueryParser conformance (lenient end-user syntax)."""

import pytest

from lucene_ray.search.query import (
    BooleanQuery, FuzzyQuery, MatchAllDocsQuery, PhraseQuery, PrefixQuery,
    TermQuery,
)
from lucene_ray.search.simpleparser import (
    ALL_OP, NOT_OP, PREFIX_OP, parse_simple_query,
)


def P(expr, **kw):
    return parse_simple_query(expr, **kw)


def test_single_term():
    assert P("Data") == TermQuery("data")


def test_default_or():
    assert P("data merge") == BooleanQuery(
        should=(TermQuery("data"), TermQuery("merge")))


def test_default_and_mode():
    assert P("data merge", default_operator="must") == BooleanQuery(
        must=(TermQuery("data"), TermQuery("merge")), must_not=())


def test_or_operator_lowest_precedence():
    q = P("data merge | spark", default_operator="must")
    assert q == BooleanQuery(should=(
        BooleanQuery(must=(TermQuery("data"), TermQuery("merge")),
                     must_not=()),
        TermQuery("spark")))


def test_not():
    q = P("data -merge")
    assert q == BooleanQuery(should=(TermQuery("data"),),
                             must_not=(TermQuery("merge"),))


def test_phrase_and_slop():
    assert P('"data merge"') == PhraseQuery(("data", "merge"))
    assert P('"data merge"~2') == PhraseQuery(("data", "merge"), slop=2)


def test_prefix_and_fuzzy():
    assert P("mer*") == PrefixQuery("mer")
    assert P("merge~1") == FuzzyQuery("merge", max_edits=1)


def test_group():
    q = P("(data | spark) merge", default_operator="must")
    assert q == BooleanQuery(must=(
        BooleanQuery(should=(TermQuery("data"), TermQuery("spark"))),
        TermQuery("merge")), must_not=())


def test_negated_group():
    q = P("data -(spark merge)")
    assert q == BooleanQuery(
        should=(TermQuery("data"),),
        must_not=(BooleanQuery(should=(TermQuery("spark"),
                                       TermQuery("merge"))),))


def test_lenient_never_raises():
    for expr in ['"unterminated', "((", "))", "-", "|", "* ~", "", "   ",
                 'a "b', "-(", "~3"]:
        P(expr)  # must not raise


def test_empty_is_match_all():
    assert P("") == MatchAllDocsQuery()
    assert P("   ") == MatchAllDocsQuery()


def test_disabled_flags_lex_literally():
    # with PREFIX disabled, 'mer*' analyzes; '*' is dropped by the
    # analyzer so it degrades to the bare term
    q = P("mer*", flags=ALL_OP & ~PREFIX_OP)
    assert q == TermQuery("mer")
    # with NOT disabled, '-merge' analyzes to the term
    q2 = P("-merge", flags=ALL_OP & ~NOT_OP)
    assert q2 == TermQuery("merge")


def test_escape():
    assert P(r"data\* ") == TermQuery("data")  # analyzer strips '*'
