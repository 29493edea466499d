"""Classic query parser conformance — cases transcribed from the
reference's ``queryparser/util/QueryParserTestBase.java`` (testSimple,
testQPA-ish structure checks, testSlop, testWildcard, testRange) with a
Lucene-style toString printer for assertions."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_ray.search.query import (
    BooleanQuery,
    BoostQuery,
    FuzzyQuery,
    MatchAllDocsQuery,
    PhraseQuery,
    PrefixQuery,
    RegexpQuery,
    TermQuery,
    TermRangeQuery,
    WildcardQuery,
)
from lucene_ray.search.queryparser import ParseException, QueryParser


def ws_analyzer(text):
    return [t.lower() for t in text.split()]


def P(s, default_field="field", op="OR"):
    return QueryParser(default_field, ws_analyzer, op).parse(s)


def qstr(q):
    """Lucene Query.toString analog for the default field."""
    if isinstance(q, TermQuery):
        p = f"{q.field}:" if q.field else ""
        return p + q.term
    if isinstance(q, PhraseQuery):
        p = f"{q.field}:" if q.field else ""
        s = p + '"' + " ".join(q.terms) + '"'
        return s + (f"~{q.slop}" if q.slop else "")
    if isinstance(q, BoostQuery):
        b = q.boost
        return f"({qstr(q.inner)})^{b:.1f}"
    if isinstance(q, PrefixQuery):
        return (f"{q.field}:" if q.field else "") + q.prefix + "*"
    if isinstance(q, WildcardQuery):
        return (f"{q.field}:" if q.field else "") + q.pattern
    if isinstance(q, RegexpQuery):
        return (f"{q.field}:" if q.field else "") + "/" + q.pattern + "/"
    if isinstance(q, FuzzyQuery):
        return (f"{q.field}:" if q.field else "") + f"{q.term}~{q.max_edits}"
    if isinstance(q, TermRangeQuery):
        lo = q.lower if q.lower is not None else "*"
        hi = q.upper if q.upper is not None else "*"
        return (("[" if q.include_lower else "{") + lo + " TO " + hi
                + ("]" if q.include_upper else "}"))
    if isinstance(q, MatchAllDocsQuery):
        return "*:*"
    if isinstance(q, BooleanQuery):
        parts = []
        for sub in q.must:
            parts.append("+" + _wrap(sub))
        for sub in q.should:
            parts.append(_wrap(sub))
        for sub in q.must_not:
            parts.append("-" + _wrap(sub))
        return " ".join(parts)
    raise TypeError(type(q))


def _wrap(q):
    s = qstr(q)
    return f"({s})" if isinstance(q, BooleanQuery) else s


# (input, expected toString) — QueryParserTestBase.testSimple etc.
CASES = [
    ("term term term", "term term term"),
    ("a AND b", "+a +b"),
    ("(a AND b)", "+a +b"),
    ("c OR (a AND b)", "c (+a +b)"),
    ("a AND NOT b", "+a -b"),
    ("a AND -b", "+a -b"),
    ("a AND !b", "+a -b"),
    ("a && b", "+a +b"),
    ("a OR b", "a b"),
    ("a || b", "a b"),
    ("a OR !b", "a -b"),
    ("a OR -b", "a -b"),
    # our BooleanQuery stores clauses grouped by occur (must, should,
    # must_not) rather than source order; semantics are identical
    ("+term -term term", "+term term -term"),
    ("foo:term AND field:anotherTerm", "+foo:term +anotherterm"),
    ('term AND "phrase phrase"', '+term +"phrase phrase"'),
    ('"hello there"', '"hello there"'),
    ("germ term^2.0", "germ (term)^2.0"),
    ("(term)^2.0", "(term)^2.0"),
    ("(germ term)^2.0", "(germ term)^2.0"),
    ("term^2.0", "(term)^2.0"),
    ("term^2", "(term)^2.0"),
    ('"germ term"^2.0', '("germ term")^2.0'),
    ('"term germ"^2', '("term germ")^2.0'),
    ("(foo OR bar) AND (baz OR boo)", "+(foo bar) +(baz boo)"),
    ("((a OR b) AND NOT c) OR d", "(+(a b) -c) d"),
    ('+(apple "steve jobs") -(foo bar baz)',
     '+(apple "steve jobs") -(foo bar baz)'),
    ('+title:(dog OR cat) -author:"bob dole"',
     '+(title:dog title:cat) -author:"bob dole"'),
    # testSlop
    ('"term germ"~2', '"term germ"~2'),
    ('"term germ"~2 flork', '"term germ"~2 flork'),
    ('"term"~2', "term"),
    ('"term germ"~2^2', '("term germ"~2)^2.0'),
    # testWildcard
    ("term*", "term*"),
    ("term*^2", "(term*)^2.0"),
    ("term~", "term~2"),
    ("term~1", "term~1"),
    ("term~0.7", "term~1"),
    ("term~^3", "(term~2)^3.0"),
    ("term*germ", "term*germ"),
    ("term*germ^3", "(term*germ)^3.0"),
    # testRange
    ("[ a TO z]", "[a TO z]"),
    ("[ a TO z}", "[a TO z}"),
    ("{ a TO z]", "{a TO z]"),
    ("[ a TO * ]", "[a TO *]"),
    ("[ * TO z ]", "[* TO z]"),
    ("[ * TO * ]", "[* TO *]"),
    ("{ a TO z }", "{a TO z}"),
]


@pytest.mark.parametrize("inp,want", CASES)
def test_transcribed_cases(inp, want):
    assert qstr(P(inp)) == want, inp


def test_structure_types():
    assert isinstance(P("a AND b"), BooleanQuery)
    assert isinstance(P("hello"), TermQuery)
    assert isinstance(P('"hello there"'), PhraseQuery)
    assert isinstance(P("term*"), PrefixQuery)
    bq = P("term*^2")
    assert isinstance(bq, BoostQuery) and isinstance(bq.inner, PrefixQuery)
    assert isinstance(P("term~"), FuzzyQuery)
    fq = P("term~0.7")
    assert fq.max_edits == 1 and fq.prefix_length == 0
    assert P("term~").max_edits == 2
    assert isinstance(P("term*germ"), WildcardQuery)
    with pytest.raises(ParseException):
        P("term~1.1")


def test_default_and_operator():
    # QueryParserTestBase.testDefaultOperator-style
    assert qstr(P("a b", op="AND")) == "+a +b"
    assert qstr(P("a OR b", op="AND")) == "a b"
    assert qstr(P("a -b", op="AND")) == "+a -b"


def test_field_queries():
    q = P("title:foo")
    assert q == TermQuery("foo", field="title")
    q = P('author:"bob dole"~3')
    assert q == PhraseQuery(("bob", "dole"), slop=3, field="author")
    q = P("field:bar")  # default field normalizes to None
    assert q == TermQuery("bar")


def test_parse_and_search_end_to_end(ray_session, tmp_path_factory):
    from lucene_ray.index import build_index
    from lucene_ray.search import IndexReader, Searcher

    texts = ["alpha beta gamma", "alpha delta", "beta delta epsilon",
             "gamma gamma alpha", "zeta eta"]
    t = pa.table({"doc_id": pa.array(np.arange(5, dtype=np.int64)),
                  "text": pa.array(texts, pa.string())})
    d = tmp_path_factory.mktemp("qp")
    path = str(d / "docs.parquet")
    pq.write_table(t, path)
    out = str(d / "idx")
    build_index(path, out, batch_size=10, index_positions=True)
    s = Searcher(IndexReader(out))

    def match(expr):
        return set(s.match_docs(P(expr, default_field="text")).tolist())

    assert match("alpha AND beta") == {0}
    assert match("alpha beta") == {0, 1, 2, 3}
    assert match("alpha AND NOT gamma") == {1}
    assert match("(alpha OR zeta) AND NOT delta") == {0, 3, 4}
    assert match('"alpha beta"') == {0}
    assert match('"alpha gamma"~2') == {0, 3}
    assert match("alp*") == {0, 1, 3}
    assert match("de?ta") == {1, 2}
    assert match("gamma~1") == {0, 3}  # only gamma itself within 1 edit
    assert match("[beta TO delta]") == {0, 1, 2}
    # absent field matches nothing
    assert match("title:alpha") == set()
    # nested boolean scoring path returns ranked results too
    td = s.search(P("(alpha AND beta) OR gamma^2", default_field="text"), k=5)
    assert len(td.doc_ids) > 0


# QueryParserTestBase.testEscaped / testEscapedVsQuestionMarkAsWildcard
ESCAPED_CASES = [
    (r"a\-b:c", "a-b:c"),
    (r"a\+b:c", "a+b:c"),
    (r"a\:b:c", "a:b:c"),
    (r"a\\b:c", "a\\b:c"),
    (r"a:b\-c", "a:b-c"),
    (r"a:b\+c", "a:b+c"),
    (r"a:b\:c", "a:b:c"),
    (r"a:b\\c", "a:b\\c"),
    (r"a:b\-c*", "a:b-c*"),
    (r"a:b\+c*", "a:b+c*"),
    (r"a:b\:c*", "a:b:c*"),
    (r"a:b\-c~", "a:b-c~2"),
    (r"a:b\+c~", "a:b+c~2"),
    (r"a:b\:c~", "a:b:c~2"),
    (r"[ a\- TO a\+ ]", "[a- TO a+]"),
    (r"[ a\: TO a\~ ]", "[a: TO a~]"),
    (r"a\\\+b", "a\\+b"),
    (r'a \"b c\" d', 'a "b c" d'),
    (r'"a \+b c d"', '"a +b c d"'),
    (r"c\:\\temp\\\~foo.txt", "c:\\temp\\~foo.txt"),
    (r"a\u0062c", "abc"),
    # escaped wildcard chars stay escaped IN the pattern
    (r"a:b\-?c", r"a:b\-?c"),
    (r"a:b\+?c", r"a:b\+?c"),
]


@pytest.mark.parametrize("inp,want", ESCAPED_CASES)
def test_escaped_cases(inp, want):
    assert qstr(P(inp)) == want, inp


def test_escape_at_end_raises():
    with pytest.raises(ParseException):
        P("XY\\")


def test_escaped_wildcard_literal_star():
    from lucene_ray.search.query import WildcardQuery, expand_terms
    # \* is a literal star, ? still a wildcard
    q = P(r"a\*?c")
    assert isinstance(q, WildcardQuery)
    assert expand_terms(q, ["a*bc", "axbc", "a*c"]) == ["a*bc"]
