"""Conformance tests for WordDelimiterGraphFilter and
ASCIIFoldingFilter — cases transcribed from the reference's
TestWordDelimiterGraphFilter.java and TestASCIIFoldingFilter.java
(token sequences; positions flatten per the list protocol)."""

import os

from lucene_ray.analysis.folding import ASCIIFoldingFilter, ascii_fold
from lucene_ray.analysis.worddelim import (
    CATENATE_ALL, CATENATE_NUMBERS, CATENATE_WORDS, GENERATE_NUMBER_PARTS,
    GENERATE_WORD_PARTS, PRESERVE_ORIGINAL, SPLIT_ON_CASE_CHANGE,
    SPLIT_ON_NUMERICS, STEM_ENGLISH_POSSESSIVE, WordDelimiterGraphFilter,
)

_SPLIT_FLAGS = (GENERATE_WORD_PARTS | GENERATE_NUMBER_PARTS
                | SPLIT_ON_CASE_CHANGE | SPLIT_ON_NUMERICS
                | STEM_ENGLISH_POSSESSIVE)


def _wdf(flags):
    return WordDelimiterGraphFilter(flags)


def test_splits():
    # TestWordDelimiterGraphFilter.testSplits
    f = _wdf(_SPLIT_FLAGS)
    assert f(["basic-split"]) == ["basic", "split"]
    assert f(["camelCase"]) == ["camel", "Case"]
    assert f(["บ้าน"]) == ["บ้าน"]
    assert f(["test's'"]) == ["test"]
    assert f(["Роберт"]) == ["Роберт"]
    assert f(["РобЕрт"]) == ["Роб", "Ерт"]
    assert f(["aǅungla"]) == ["aǅungla"]
    assert f(["ســـــــــــــــــلام"]) == ["ســـــــــــــــــلام"]
    assert f(["test⃝"]) == ["test⃝"]
    assert f(["हिन्दी"]) == ["हिन्दी"]
    assert f(["١٢٣٤"]) == ["١٢٣٤"]
    assert f(["𠀀𠀀"]) == ["𠀀𠀀"]


def test_possessives():
    # TestWordDelimiterGraphFilter.testPossessives
    with_stem = _wdf(GENERATE_WORD_PARTS | GENERATE_NUMBER_PARTS
                     | SPLIT_ON_CASE_CHANGE | SPLIT_ON_NUMERICS
                     | STEM_ENGLISH_POSSESSIVE)
    without = _wdf(GENERATE_WORD_PARTS | GENERATE_NUMBER_PARTS
                   | SPLIT_ON_CASE_CHANGE | SPLIT_ON_NUMERICS)
    assert with_stem(["ra's"]) == ["ra"]
    assert without(["ra's"]) == ["ra", "s"]
    assert with_stem(["O'Neil's"]) == ["O", "Neil"]


def test_catenate_all_before_parts():
    # TestWordDelimiterGraphFilter.testTokenType
    f = _wdf(GENERATE_WORD_PARTS | GENERATE_NUMBER_PARTS | CATENATE_ALL
             | SPLIT_ON_CASE_CHANGE | SPLIT_ON_NUMERICS
             | STEM_ENGLISH_POSSESSIVE)
    assert f(["foo-bar"]) == ["foobar", "foo", "bar"]


def test_lots_of_concatenating():
    # TestWordDelimiterGraphFilter.testLotsOfConcatenating
    f = _wdf(GENERATE_WORD_PARTS | GENERATE_NUMBER_PARTS | CATENATE_WORDS
             | CATENATE_NUMBERS | CATENATE_ALL | SPLIT_ON_CASE_CHANGE
             | SPLIT_ON_NUMERICS | STEM_ENGLISH_POSSESSIVE)
    assert f(["abc-def-123-456"]) == [
        "abcdef123456", "abcdef", "abc", "def", "123456", "123", "456"]
    # ...2: + PRESERVE_ORIGINAL puts the original first
    f2 = _wdf(PRESERVE_ORIGINAL | GENERATE_WORD_PARTS | GENERATE_NUMBER_PARTS
              | CATENATE_WORDS | CATENATE_NUMBERS | CATENATE_ALL
              | SPLIT_ON_CASE_CHANGE | SPLIT_ON_NUMERICS
              | STEM_ENGLISH_POSSESSIVE)
    assert f2(["abc-def-123-456"]) == [
        "abc-def-123-456", "abcdef123456", "abcdef", "abc", "def",
        "123456", "123", "456"]


def test_basic_graph_splits():
    # TestWordDelimiterGraphFilter.testBasicGraphSplits (flattened)
    assert _wdf(0)(["PowerShotPlus"]) == ["PowerShotPlus"]
    assert _wdf(GENERATE_WORD_PARTS)(["PowerShotPlus"]) == ["PowerShotPlus"]
    assert _wdf(GENERATE_WORD_PARTS | SPLIT_ON_CASE_CHANGE)(
        ["PowerShotPlus"]) == ["Power", "Shot", "Plus"]
    assert _wdf(GENERATE_WORD_PARTS | SPLIT_ON_CASE_CHANGE
                | PRESERVE_ORIGINAL)(["PowerShotPlus"]) == [
        "PowerShotPlus", "Power", "Shot", "Plus"]
    assert _wdf(GENERATE_WORD_PARTS)(["Power-Shot-Plus"]) == [
        "Power", "Shot", "Plus"]
    # case change on, numerics off: digits glue the alpha run together
    assert _wdf(GENERATE_WORD_PARTS | SPLIT_ON_CASE_CHANGE)(
        ["PowerShot1000Plus"]) == ["Power", "Shot1000Plus"]
    assert _wdf(GENERATE_WORD_PARTS | SPLIT_ON_CASE_CHANGE
                | CATENATE_WORDS)(["PowerShotPlus"]) == [
        "PowerShotPlus", "Power", "Shot", "Plus"]
    assert _wdf(GENERATE_WORD_PARTS | GENERATE_NUMBER_PARTS
                | SPLIT_ON_CASE_CHANGE | SPLIT_ON_NUMERICS | CATENATE_WORDS
                | CATENATE_NUMBERS)(["Power-Shot-1000-17-Plus"]) == [
        "PowerShot", "Power", "Shot", "100017", "1000", "17", "Plus"]


def test_delimiter_only_and_empty():
    f = _wdf(_SPLIT_FLAGS)
    assert f(["$$$"]) == []
    assert f([""]) == []
    assert _wdf(_SPLIT_FLAGS | PRESERVE_ORIGINAL)(["$$$"]) == ["$$$"]


# --- ASCII folding ------------------------------------------------------

def test_latin1_accents():
    # TestASCIIFoldingFilter.testLatin1Accents
    text = ("Des mot clés À LA CHAÎNE À Á Â Ã Ä Å Æ Ç È É Ê Ë Ì Í Î Ï Ĳ Ð Ñ"
            " Ò Ó Ô Õ Ö Ø Œ Þ Ù Ú Û Ü Ý Ÿ à á â ã ä å æ ç è é ê ë ì í î ï ĳ"
            " ð ñ ò ó ô õ ö ø œ ß þ ù ú û ü ý ÿ ﬁ ﬂ")
    expect = ("Des mot cles A LA CHAINE A A A A A A AE C E E E E I I I I IJ"
              " D N O O O O O O OE TH U U U U Y Y a a a a a a ae c e e e e"
              " i i i i ij d n o o o o o o oe ss th u u u u y y fi fl")
    folded = [ascii_fold(t) for t in text.split(" ")]
    assert folded == expect.split(" ")


def test_all_foldings_table():
    # the full vendored conformance table (testAllFoldings data)
    path = os.path.join(os.path.dirname(__file__), "..", "lucene_ray",
                        "analysis", "data", "ascii_folding.tsv")
    n = 0
    for line in open(path, encoding="utf-8"):
        cp, _, out = line.rstrip("\n").partition("\t")
        assert ascii_fold(chr(int(cp, 16))) == out
        n += 1
    assert n > 1200


def test_unmapped_pass_through():
    # Greek/CJK/combining marks pass through (TestASCIIFoldingFilter
    # testUnmodifiedLetters behavior)
    for s in ("αβγ", "中文", "é"):
        assert ascii_fold(s) == s
    assert ascii_fold("plain") == "plain"


def test_preserve_original_filter():
    f = ASCIIFoldingFilter(preserve_original=True)
    assert f(["clés", "mot"]) == ["cles", "clés", "mot"]
    f2 = ASCIIFoldingFilter()
    assert f2(["clés"]) == ["cles"]
