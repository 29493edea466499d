"""Production-dictionary load path for the ja/ko lattice analyzers:
a REAL-format MeCab/IPADIC fragment (13-field CSV entries, matrix.def,
char.def, unk.def — the same files DictionaryBuilder consumes in
kuromoji's own TestExternalDictionary.java) is checked into
tests/data/ipadic_fragment and drives golden segmentations through the
loader, NOT the mini lexicon."""

import os

import pytest

from lucene_ray.analysis.japanese import (JapaneseAnalyzer,
                                          JapaneseTokenizer,
                                          load_matrix_def, load_mecab_dir,
                                          parse_char_def, parse_unk_def)

FRAG = os.path.join(os.path.dirname(__file__), "data", "ipadic_fragment")


@pytest.fixture(scope="module")
def real_dict():
    return load_mecab_dir(FRAG)


def test_csv_entries_loaded(real_dict):
    # 13-field IPADIC rows parse: surface/ids/cost/POS
    ms = [m for m in real_dict.prefix_matches("すもも", 0)]
    assert [(m.surface, m.left_id, m.right_id, m.cost, m.pos)
            for m in ms if m.surface == "すもも"] \
        == [("すもも", 1285, 1285, 7546, "名詞")]


def test_matrix_def_costs(real_dict):
    assert real_dict.connection(1285, 262) == -4000
    assert real_dict.connection(368, 1313) == -2000
    assert real_dict.connection(9999, 9999) == 0  # absent pair: default


def test_matrix_def_reference_fragment():
    # the reference's own external matrix fragment
    # (TestExternalDictionary.java:56-62: "3 3", "0 1 1", "0 2 -1630";
    # testLoadExternalConnectionCosts asserts get(0, 1) == 1)
    conn = load_matrix_def(["3 3", "0 1 1", "0 2 -1630"])
    assert conn[(0, 1)] == 1
    assert conn[(0, 2)] == -1630
    with pytest.raises(ValueError):
        load_matrix_def(["not a header"])


def test_unk_def_reference_fragment(real_dict):
    # same DEFAULT/SPACE rows as TestExternalDictionary.java:43-46
    assert real_dict.unk_entries["DEFAULT"] == (5, 5, 4769, "記号")
    assert real_dict.unk_entries["SPACE"] == (9, 9, 8903, "記号")
    assert parse_unk_def(["DEFAULT,5,5,4769,記号,一般,*,*,*,*,*"]) \
        == {"DEFAULT": (5, 5, 4769, "記号")}


def test_char_def_ranges(real_dict):
    assert (0x3041, 0x309F) in real_dict.char_ranges["HIRAGANA"]
    assert (0x4E00, 0x9FFF) in real_dict.char_ranges["KANJI"]
    assert parse_char_def(["0x0030..0x0039 NUMERIC"]) \
        == {"NUMERIC": [(0x30, 0x39)]}


def test_golden_sumomo_from_real_format(real_dict):
    # the canonical IPADIC segmentation, driven by the real-format file
    t = JapaneseTokenizer(real_dict, mode="normal")
    assert [tok.surface for tok in t.tokenize("すもももももももものうち")] \
        == ["すもも", "も", "もも", "も", "もも", "の", "うち"]


def test_golden_search_mode_decomposition(real_dict):
    # kuromoji search-vs-normal: the 6-kanji compound stays whole in
    # normal mode, pays the published kanji penalty and splits in search
    normal = JapaneseTokenizer(real_dict, mode="normal")
    search = JapaneseTokenizer(real_dict, mode="search")
    assert [t.surface for t in normal.tokenize("関西国際空港")] \
        == ["関西国際空港"]
    assert [t.surface for t in search.tokenize("関西国際空港")] \
        == ["関西", "国際", "空港"]


def test_analyzer_plugs_real_dict(real_dict):
    # the Analyzer hook accepts the loaded dictionary unchanged
    a = JapaneseAnalyzer(dictionary=real_dict, mode="search")
    terms = a("関西国際空港のうち")
    assert "関西" in terms and "空港" in terms
    assert "の" not in terms  # particle dropped by the analyzer


def test_missing_dir_raises(tmp_path):
    with pytest.raises(ValueError):
        load_mecab_dir(str(tmp_path))
