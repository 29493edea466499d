"""Query model: Term / Boolean trees (search/TermQuery.java,
search/BooleanQuery.java). Occur kinds MUST / SHOULD / MUST_NOT / FILTER
with the reference's scorer-assembly semantics
(``search/Boolean2ScorerSupplier.java:97-156``):

- MUST & FILTER: conjunction (FILTER matches but doesn't score)
- SHOULD: disjunction; with MUSTs present, SHOULD only adds score
  (optional clauses), else at least one SHOULD must match
- MUST_NOT: excluded (ReqExclScorer)
- query-level boost (BoostQuery) = scalar multiply on term weight
"""

from __future__ import annotations

from dataclasses import dataclass, field


class Query:
    pass


@dataclass(frozen=True)
class TermQuery(Query):
    term: str
    boost: float = 1.0


@dataclass(frozen=True)
class BooleanQuery(Query):
    must: tuple = ()
    should: tuple = ()
    must_not: tuple = ()
    filter: tuple = ()
    min_should_match: int = 0

    def __post_init__(self):
        for name in ("must", "should", "must_not", "filter"):
            v = getattr(self, name)
            if not isinstance(v, tuple):
                object.__setattr__(self, name, tuple(v))


def term_query(t: str) -> TermQuery:
    return TermQuery(t)


def and_query(terms) -> BooleanQuery:
    return BooleanQuery(must=tuple(TermQuery(t) for t in terms))


def or_query(terms) -> BooleanQuery:
    return BooleanQuery(should=tuple(TermQuery(t) for t in terms))


def parse_simple(expr: str) -> Query:
    """Minimal parser: 'a b c' -> OR; 'a AND b' -> conjunction;
    '-a' -> MUST_NOT; '+a' -> MUST (classic QueryParser surface subset,
    queryparser/classic/QueryParserBase.java)."""
    tokens = expr.split()
    if "AND" in tokens:
        terms = [t for t in tokens if t != "AND"]
        return and_query(terms)
    must, should, must_not = [], [], []
    for t in tokens:
        if t.startswith("+"):
            must.append(TermQuery(t[1:]))
        elif t.startswith("-"):
            must_not.append(TermQuery(t[1:]))
        else:
            should.append(TermQuery(t))
    if must or must_not:
        return BooleanQuery(must=tuple(must), should=tuple(should),
                            must_not=tuple(must_not))
    if len(should) == 1:
        return should[0]
    return BooleanQuery(should=tuple(should))


def query_terms(q: Query) -> list[str]:
    """All scoring/matching terms in the tree (for stats prefetch)."""
    if isinstance(q, TermQuery):
        return [q.term]
    out = []
    for group in (q.must, q.should, q.must_not, q.filter):
        for sub in group:
            out.extend(query_terms(sub))
    return out
