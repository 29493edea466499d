"""Query side: BM25 scoring, boolean queries, top-k search."""

from .bm25 import avg_field_length, idf, norm_inverse_cache, score_freqs, score64
from .query import (
    BooleanQuery,
    BoostQuery,
    ComplexPhraseQuery,
    ConstantScoreQuery,
    DisjunctionMaxQuery,
    DocValuesTermsQuery,
    CoveringQuery,
    RangeFieldQuery,
    FunctionScoreQuery,
    FuzzyQuery,
    MatchAllDocsQuery,
    MultiPhraseQuery,
    PhraseQuery,
    SpanNearQuery,
    PrefixQuery,
    Query,
    RegexpQuery,
    TermInSetQuery,
    TermQuery,
    TermRangeQuery,
    WildcardQuery,
    and_query,
    or_query,
    parse_simple,
    query_terms,
)
from .reader import IndexReader, SegmentReader
from .searcher import Searcher, TopDocs, merge_top_docs
from .xmlparser import XMLQueryParser, parse_xml_query

__all__ = [
    "idf", "avg_field_length", "norm_inverse_cache", "score_freqs", "score64",
    "Query", "TermQuery", "BooleanQuery", "BoostQuery", "ComplexPhraseQuery",
    "ConstantScoreQuery",
    "DisjunctionMaxQuery", "MatchAllDocsQuery", "MultiPhraseQuery",
    "PhraseQuery", "SpanNearQuery", "PrefixQuery", "WildcardQuery",
    "RegexpQuery", "TermInSetQuery", "TermRangeQuery", "FuzzyQuery",
    "CoveringQuery",
    "RangeFieldQuery",
    "FunctionScoreQuery",
    "and_query", "or_query", "parse_simple", "query_terms",
    "IndexReader", "SegmentReader", "Searcher", "TopDocs", "merge_top_docs",
    "XMLQueryParser", "parse_xml_query",
]
