"""Miscellaneous token/char filters (analysis/common misc packages),
incl. end-to-end AnalyzerChain composition."""

import pyarrow as pa
import pytest

from lucene_ray.analysis.miscfilters import (
    ApostropheFilter,
    DecimalDigitFilter,
    ElisionFilter,
    KeywordRepeatStemFilter,
    LengthFilter,
    LimitTokenCountFilter,
    MappingCharFilter,
    PatternReplaceCharFilter,
    PatternReplaceFilter,
    ReverseStringFilter,
    TruncateTokenFilter,
)
from lucene_ray.analysis.stemmer import AnalyzerChain


def test_length_filter():
    f = LengthFilter(3, 5)
    assert f(["ab", "abc", "abcde", "abcdef"]) == ["abc", "abcde"]


def test_truncate():
    assert TruncateTokenFilter(3)(["abcdef", "ab"]) == ["abc", "ab"]


def test_reverse():
    assert ReverseStringFilter()(["abc", "x"]) == ["cba", "x"]


def test_decimal_digit_folds_unicode():
    # Arabic-Indic and Devanagari digits fold to ASCII
    f = DecimalDigitFilter()
    assert f(["١٢٣", "a१b", "42"]) == ["123", "a1b", "42"]


def test_apostrophe_strips_suffix():
    f = ApostropheFilter()
    assert f(["türkiye'nin", "ankara’da", "plain"]) == \
        ["türkiye", "ankara", "plain"]


def test_elision():
    f = ElisionFilter()
    assert f(["l'avion", "d'art", "qu'il", "o'neill"]) == \
        ["avion", "art", "il", "o'neill"]


def test_pattern_replace_filter():
    f = PatternReplaceFilter(r"oo+", "o")
    assert f(["foo", "foooo", "bar"]) == ["fo", "fo", "bar"]
    first = PatternReplaceFilter(r"o", "0", all_occurrences=False)
    assert first(["foo"]) == ["f0o"]


def test_limit_count():
    assert LimitTokenCountFilter(2)(["a", "b", "c"]) == ["a", "b"]


def test_keyword_repeat_stem():
    from lucene_ray.analysis.stemmer import porter_stem
    f = KeywordRepeatStemFilter(porter_stem)
    out = f(["running", "cat"])
    assert out[0] == "run" and "running" in out
    assert out.count("cat") == 1  # identical stem not duplicated


def test_mapping_char_filter_longest_first():
    cf = MappingCharFilter({"&": " and ", "&&": " andand "})
    assert cf("a && b & c") == "a  andand  b  and  c"


def test_pattern_replace_char_filter():
    cf = PatternReplaceCharFilter(r"\d{4}-\d{2}-\d{2}", "DATE")
    assert cf("on 2024-01-31 ok") == "on DATE ok"


def test_chain_composition():
    chain = AnalyzerChain(
        ElisionFilter(), LengthFilter(2),
        char_filters=(MappingCharFilter({"&": " and "}),))
    assert chain("l'avion & d'art") == ["avion", "and", "art"]


def test_chain_in_index_build(ray_session, tmp_path):
    import pyarrow.parquet as pq
    from lucene_ray.index import build_index
    from lucene_ray.search import IndexReader, Searcher, TermQuery

    chain = AnalyzerChain(ElisionFilter(),
                          char_filters=(MappingCharFilter({"©": " "}),))
    t = pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(["l'hôtel est beau ©2024", "rien ici"]),
    })
    src = str(tmp_path / "d.parquet")
    pq.write_table(t, src)
    idx = str(tmp_path / "idx")
    build_index(src, idx, batch_size=10, analyzer=chain)
    s = Searcher(IndexReader(idx))
    assert s.search(TermQuery("hôtel"), k=5).doc_ids.tolist() == [0]
    assert s.count(TermQuery("l'hôtel")) == 0


def test_fingerprint_filter():
    from lucene_ray.analysis.miscfilters import FingerprintFilter
    f = FingerprintFilter()
    assert f(["b", "a", "b", "c"]) == ["a b c"]
    assert f([]) == []
    assert FingerprintFilter(max_output_token_size=3)(["abcd", "e"]) == []


def test_nfkc_normalization():
    from lucene_ray.analysis.miscfilters import NFKCNormalizationFilter
    f = NFKCNormalizationFilter()
    # full-width latin + ligature + compatibility char
    assert f(["ﬁsh", "ＡＢＣ", "²"]) == ["fish", "ABC", "2"]
    cf = NFKCNormalizationFilter(casefold=True)
    assert cf(["ＡＢＣ", "ẞ"]) == ["abc", "ss"]


def test_common_grams():
    from lucene_ray.analysis.miscfilters import CommonGramsFilter
    f = CommonGramsFilter({"the", "of"})
    assert f(["rise", "of", "the", "machines"]) == [
        "rise", "rise_of", "of", "of_the", "the", "the_machines",
        "machines"]
    assert f(["plain", "words"]) == ["plain", "words"]
