"""Compound-word decomposition: golden token streams transcribed from
the reference's TestCompoundWordTokenFilter.java, hyphenation patterns
read IN PLACE from the reference's own da_UTF8.xml test fixture (as
the hunspell suites do with their .aff/.dic fixtures)."""

import os

import pytest

from lucene_ray.analysis.compound import (
    DictionaryCompoundWordTokenFilter,
    HyphenationCompoundWordTokenFilter,
    HyphenationTree,
    parse_fop_xml,
)

DA_XML = ("/root/reference/lucene/analysis/common/src/test/org/apache/"
          "lucene/analysis/compound/da_UTF8.xml")

needs_fixture = pytest.mark.skipif(not os.path.exists(DA_XML),
                                   reason="reference fixture not present")


@pytest.fixture(scope="module")
def da_tree():
    if not os.path.exists(DA_XML):
        pytest.skip("reference fixture not present")
    return parse_fop_xml(DA_XML)


def test_dictionary_compound_se():
    # TestCompoundWordTokenFilter.testDumbCompoundWordsSE
    dic = ["Bil", "Dörr", "Motor", "Tak", "Borr", "Slag", "Hammar",
           "Pelar", "Glas", "Ögon", "Fodral", "Bas", "Fiol", "Makare",
           "Gesäll", "Sko", "Vind", "Rute", "Torkare", "Blad"]
    tf = DictionaryCompoundWordTokenFilter(dic)
    text = ("Bildörr Bilmotor Biltak Slagborr Hammarborr Pelarborr "
            "Glasögonfodral Basfiolsfodral Basfiolsfodralmakaregesäll "
            "Skomakare Vindrutetorkare Vindrutetorkarblad abba")
    got = tf(text.split(" "))
    assert got == [
        "Bildörr", "Bil", "dörr", "Bilmotor", "Bil", "motor",
        "Biltak", "Bil", "tak", "Slagborr", "Slag", "borr",
        "Hammarborr", "Hammar", "borr", "Pelarborr", "Pelar", "borr",
        "Glasögonfodral", "Glas", "ögon", "fodral",
        "Basfiolsfodral", "Bas", "fiol", "fodral",
        "Basfiolsfodralmakaregesäll", "Bas", "fiol", "fodral",
        "makare", "gesäll",
        "Skomakare", "Sko", "makare",
        "Vindrutetorkare", "Vind", "rute", "torkare",
        "Vindrutetorkarblad", "Vind", "rute", "blad", "abba"]


def test_dictionary_compound_longest_match():
    # testDumbCompoundWordsSELongestMatch
    dic = ["Bil", "Dörr", "Motor", "Tak", "Borr", "Slag", "Hammar",
           "Pelar", "Glas", "Ögon", "Fodral", "Bas", "Fiols", "Makare",
           "Gesäll", "Sko", "Vind", "Rute", "Torkare", "Blad",
           "Fiolsfodral"]
    tf = DictionaryCompoundWordTokenFilter(dic, only_longest_match=True)
    got = tf(["Basfiolsfodralmakaregesäll"])
    assert got == ["Basfiolsfodralmakaregesäll", "Bas", "fiolsfodral",
                   "fodral", "makare", "gesäll"]


def test_dictionary_min_subword_gate():
    # testWordComponentWithLessThanMinimumLength: 'd' < minSubwordSize
    tf = DictionaryCompoundWordTokenFilter(["abc", "d", "efg"])
    assert tf(["abcdefg"]) == ["abcdefg", "abc", "efg"]
    # testTokenEndingWithWordComponentOfMinimumLength
    tf = DictionaryCompoundWordTokenFilter(["ab", "cd", "ef"])
    assert tf(["abcdef"]) == ["abcdef", "ab", "cd", "ef"]


def test_dictionary_required():
    with pytest.raises(ValueError):
        DictionaryCompoundWordTokenFilter(None)


def test_hyphenation_tree_basic():
    # classic Liang example: 'hyphenation' with a toy pattern set
    tree = HyphenationTree(["hy3ph", "he2n", "hena4", "hen5at",
                            "ina", "n2at", "1tio", "2io", "o2n"])
    pts = tree.hyphenate("hyphenation")
    assert pts is not None and pts[0] == 0 and pts[-1] == 11
    assert 2 in pts  # hy-phenation


@needs_fixture
def test_hyphenation_compound_da(da_tree):
    # testHyphenationCompoundWordsDA: læsehest -> læse, hest
    tf = HyphenationCompoundWordTokenFilter(da_tree, ["læse", "hest"])
    got = tf("min veninde som er lidt af en læsehest".split(" "))
    assert got == ["min", "veninde", "som", "er", "lidt", "af", "en",
                   "læsehest", "læse", "hest"]


@needs_fixture
def test_hyphenation_compound_longest_match(da_tree):
    # testHyphenationCompoundWordsDELongestMatch: basket dropped
    tf = HyphenationCompoundWordTokenFilter(
        da_tree, ["basketball", "basket", "ball", "kurv"],
        max_subword_size=40, only_longest_match=True)
    assert tf(["basketballkurv"]) == \
        ["basketballkurv", "basketball", "ball", "kurv"]


@needs_fixture
def test_hyphenation_only_size_windows(da_tree):
    # testHyphenationOnly (no dictionary): min/max subword windows
    tf = HyphenationCompoundWordTokenFilter(
        da_tree, None, min_subword_size=2, max_subword_size=4)
    assert tf(["basketballkurv"]) == \
        ["basketballkurv", "ba", "sket", "ball", "bal", "kurv"]
    tf = HyphenationCompoundWordTokenFilter(
        da_tree, None, min_subword_size=4, max_subword_size=6)
    assert tf(["basketballkurv"]) == \
        ["basketballkurv", "basket", "sket", "ball", "lkurv", "kurv"]
    tf = HyphenationCompoundWordTokenFilter(
        da_tree, None, min_subword_size=4, max_subword_size=10)
    assert tf(["basketballkurv"]) == [
        "basketballkurv", "basketball", "basketbal", "basket",
        "sketball", "sketbal", "sket", "ballkurv", "ball", "lkurv",
        "kurv"]


def test_hyphenation_exceptions():
    tree = HyphenationTree([], exceptions=["as-so-ciate"])
    assert tree.hyphenate("associate") == [0, 2, 4, 9]
    assert tree.hyphenate("other") is None
