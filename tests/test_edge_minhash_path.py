"""EdgeNGramFilter / MinHashFilter / PathHierarchyTokenizer conformance
— goldens transcribed from the reference's own tests:
TestEdgeNGramTokenFilter.java, TestMinHashFilter.java,
TestPathHierarchyTokenizer.java."""

import ctypes

import pytest

from lucene_ray.analysis.minhash import MinHashFilter, murmur3_x64_128
from lucene_ray.analysis.pathtok import PathHierarchyTokenizer
from lucene_ray.analysis.stemmer import EdgeNGramFilter, ShingleFilter


def _s64(x):
    return ctypes.c_int64(x).value


# --- EdgeNGramFilter (TestEdgeNGramTokenFilter.java) -------------------------

def test_edge_invalid_input():
    with pytest.raises(ValueError):
        EdgeNGramFilter(0, 0)
    with pytest.raises(ValueError):
        EdgeNGramFilter(2, 1)
    with pytest.raises(ValueError):
        EdgeNGramFilter(-1, 2)


def test_edge_front_unigram():
    assert EdgeNGramFilter(1, 1)(["abcde"]) == ["a"]


def test_edge_oversized():
    assert EdgeNGramFilter(6, 6)(["abcde"]) == []
    assert EdgeNGramFilter(6, 6, preserve_original=True)(["abcde"]) \
        == ["abcde"]


def test_edge_front_range():
    assert EdgeNGramFilter(1, 3)(["abcde"]) == ["a", "ab", "abc"]
    assert EdgeNGramFilter(1, 3)(["abcde", "vwxyz"]) \
        == ["a", "ab", "abc", "v", "vw", "vwx"]


def test_edge_preserve_original():
    toks = "a bcd efghi jk".split(" ")
    assert EdgeNGramFilter(2, 3)(toks) == ["bc", "bcd", "ef", "efg", "jk"]
    assert EdgeNGramFilter(2, 3, preserve_original=True)(toks) \
        == ["a", "bc", "bcd", "ef", "efg", "efghi", "jk"]


def test_edge_supplementary_codepoints():
    # Python len/slice count codepoints like Java's codePointCount
    t = "\U0001F600bc"  # emoji + 2 ASCII = 3 codepoints
    assert EdgeNGramFilter(1, 2)([t]) == ["\U0001F600", "\U0001F600b"]


# --- NGram / EdgeNGram TOKENIZERS (TestNGramTokenizer.java,
# TestEdgeNGramTokenizer.java) ------------------------------------------------

def _gfull(text, tok):
    ts = tok.tokenize(text)
    return ([t.term for t in ts], [t.start for t in ts],
            [t.end for t in ts])


def test_ngram_tokenizer_goldens():
    from lucene_ray.analysis.ngram_tokenizer import NGramTokenizer
    assert _gfull("abcde", NGramTokenizer(1, 1)) == (
        ["a", "b", "c", "d", "e"], [0, 1, 2, 3, 4], [1, 2, 3, 4, 5])
    assert _gfull("abcde", NGramTokenizer(2, 2)) == (
        ["ab", "bc", "cd", "de"], [0, 1, 2, 3], [2, 3, 4, 5])
    # testNgrams: increasing start offset, then length
    assert _gfull("abcde", NGramTokenizer(1, 3)) == (
        ["a", "ab", "abc", "b", "bc", "bcd", "c", "cd", "cde",
         "d", "de", "e"],
        [0, 0, 0, 1, 1, 1, 2, 2, 2, 3, 3, 4],
        [1, 2, 3, 2, 3, 4, 3, 4, 5, 4, 5, 5])
    assert NGramTokenizer(6, 7)("abcde") == []
    with pytest.raises(ValueError):
        NGramTokenizer(0, 1)
    with pytest.raises(ValueError):
        NGramTokenizer(2, 1)


def test_edge_ngram_tokenizer_goldens():
    from lucene_ray.analysis.ngram_tokenizer import EdgeNGramTokenizer
    assert _gfull("abcde", EdgeNGramTokenizer(1, 1)) == (
        ["a"], [0], [1])
    assert EdgeNGramTokenizer(6, 6)("abcde") == []
    assert _gfull("abcde", EdgeNGramTokenizer(1, 3)) == (
        ["a", "ab", "abc"], [0, 0, 0], [1, 2, 3])


def test_ngram_tokenizer_token_chars():
    # isTokenChar pre-tokenization: grams never cross a non-token char,
    # edges restart at each run
    from lucene_ray.analysis.ngram_tokenizer import (EdgeNGramTokenizer,
                                                     NGramTokenizer)
    assert NGramTokenizer(2, 2, str.isalpha)("ab cd") \
        == ["ab", "cd"]
    assert EdgeNGramTokenizer(1, 2, str.isalpha)("ab cd") \
        == ["a", "ab", "c", "cd"]


# --- MinHashFilter (TestMinHashFilter.java) ----------------------------------

def test_murmur_int_hash_golden():
    v1, v2 = murmur3_x64_128((0).to_bytes(4, "big"))
    assert _s64(v1) == -3485513579396041028
    assert _s64(v2) == 6383328099726337777


def test_murmur_string_hash_golden():
    v1, v2 = murmur3_x64_128("woof woof woof woof woof".encode("utf-16-le"))
    assert _s64(v1) == 7638079586852243959
    assert _s64(v2) == 4378804943379391304


_TEXT = ("woof woof woof woof woof" + " " +
         "woof woof woof woof puff").split(" ")


def _shingles():
    return ShingleFilter(5, 5, " ", output_unigrams=False)(_TEXT)


def test_minhash_token_counts():
    sh = _shingles()
    assert len(sh) == 6
    # (hashCount, bucketCount, hashSetSize, withRotation) -> n tokens,
    # from testTokenStream2..5
    assert len(MinHashFilter(100, 1, 1, False)(sh)) == 100
    assert len(MinHashFilter(10, 1, 10, False)(sh)) == 20
    assert len(MinHashFilter(10, 10, 1, False)(sh)) == 20
    assert len(MinHashFilter(10, 10, 1, True)(sh)) == 100
    assert len(MinHashFilter(1, 100, 1, False)(sh)) == 2
    rotated = MinHashFilter(1, 100, 1, True)(sh)
    assert len(rotated) == 100
    assert len(set(rotated)) == 2


def test_minhash_exact_dup_same_signature():
    sh = _shingles()
    f = MinHashFilter(1, 512, 1, True)
    assert f(sh) == f(list(sh))
    # different stream -> (almost surely) different signature
    other = ShingleFilter(5, 5, " ", output_unigrams=False)(
        "a b c d e f g h i j".split(" "))
    assert f(sh) != f(other)


def test_minhash_hex_encoding_index_safe():
    sh = _shingles()
    toks = MinHashFilter(1, 512, 1, True, encoding="hex")(sh)
    assert len(toks) == 512
    for t in set(toks):
        t.encode("utf-8")  # must be Arrow-safe
        assert len(t) == 32 and int(t, 16) >= 0


def test_minhash_empty():
    assert MinHashFilter()( []) == []


# --- PathHierarchyTokenizer (TestPathHierarchyTokenizer.java) ----------------

def _full(text, **kw):
    toks = PathHierarchyTokenizer(**kw).tokenize(text)
    return ([t.term for t in toks], [t.start for t in toks],
            [t.end for t in toks], [t.pos_inc for t in toks])


def test_path_basic():
    assert _full("/a/b/c") == (["/a", "/a/b", "/a/b/c"],
                               [0, 0, 0], [2, 4, 6], [1, 0, 0])


def test_path_end_of_delimiter():
    assert _full("/a/b/c/") == (["/a", "/a/b", "/a/b/c", "/a/b/c/"],
                                [0, 0, 0, 0], [2, 4, 6, 7], [1, 0, 0, 0])


def test_path_start_of_char():
    assert _full("a/b/c") == (["a", "a/b", "a/b/c"],
                              [0, 0, 0], [1, 3, 5], [1, 0, 0])


def test_path_start_of_char_end_of_delimiter():
    assert _full("a/b/c/") == (["a", "a/b", "a/b/c", "a/b/c/"],
                               [0, 0, 0, 0], [1, 3, 5, 6], [1, 0, 0, 0])


def test_path_only_delimiter():
    assert _full("/") == (["/"], [0], [1], [1])
    assert _full("//") == (["/", "//"], [0, 0], [1, 2], [1, 0])


def test_path_replace():
    assert _full("/a/b/c", delimiter="/", replacement="\\") == (
        ["\\a", "\\a\\b", "\\a\\b\\c"], [0, 0, 0], [2, 4, 6], [1, 0, 0])


def test_path_windows():
    assert _full("c:\\a\\b\\c", delimiter="\\") == (
        ["c:", "c:\\a", "c:\\a\\b", "c:\\a\\b\\c"],
        [0, 0, 0, 0], [2, 4, 6, 8], [1, 0, 0, 0])


def _rfull(text, **kw):
    from lucene_ray.analysis.pathtok import ReversePathHierarchyTokenizer
    toks = ReversePathHierarchyTokenizer(**kw).tokenize(text)
    return ([t.term for t in toks], [t.start for t in toks],
            [t.end for t in toks], [t.pos_inc for t in toks])


def test_reverse_path_basic():
    # TestReversePathHierarchyTokenizer.java goldens
    assert _rfull("/a/b/c") == (["/a/b/c", "a/b/c", "b/c", "c"],
                                [0, 1, 3, 5], [6, 6, 6, 6], [1, 0, 0, 0])
    assert _rfull("/a/b/c/") == (["/a/b/c/", "a/b/c/", "b/c/", "c/"],
                                 [0, 1, 3, 5], [7, 7, 7, 7], [1, 0, 0, 0])
    assert _rfull("a/b/c") == (["a/b/c", "b/c", "c"],
                               [0, 2, 4], [5, 5, 5], [1, 0, 0])
    assert _rfull("a/b/c/") == (["a/b/c/", "b/c/", "c/"],
                                [0, 2, 4], [6, 6, 6], [1, 0, 0])
    assert _rfull("/") == (["/"], [0], [1], [1])
    assert _rfull("//") == (["//", "/"], [0, 1], [2, 2], [1, 0])


def test_reverse_path_skip():
    assert _rfull("/a/b/c/", skip=1) == (["/a/b/", "a/b/", "b/"],
                                         [0, 1, 3], [5, 5, 5], [1, 0, 0])
    assert _rfull("a/b/c", skip=1) == (["a/b/", "b/"],
                                       [0, 2], [4, 4], [1, 0])
    assert _rfull("a/b/c/", skip=1) == (["a/b/", "b/"],
                                        [0, 2], [4, 4], [1, 0])
    assert _rfull("/", skip=1) == ([], [], [], [])


def test_reverse_path_domain():
    from lucene_ray.analysis.pathtok import ReversePathHierarchyTokenizer
    t = ReversePathHierarchyTokenizer(delimiter=".")
    assert t("www.site.co.uk") == ["www.site.co.uk", "site.co.uk",
                                   "co.uk", "uk"]


def test_path_skip():
    assert _full("/a/b/c", skip=1) == (["/b", "/b/c"],
                                       [2, 2], [4, 6], [1, 0])
    assert _full("/a/b/c/", skip=1) == (["/b", "/b/c", "/b/c/"],
                                        [2, 2, 2], [4, 6, 7], [1, 0, 0])
    assert _full("a/b/c", skip=1) == (["/b", "/b/c"],
                                      [1, 1], [3, 5], [1, 0])
    assert _full("a/b/c/", skip=1) == (["/b", "/b/c", "/b/c/"],
                                       [1, 1, 1], [3, 5, 6], [1, 0, 0])
    assert _full("/", skip=1) == ([], [], [], [])
    assert _full("//", skip=1) == (["/"], [1], [2], [1])
