"""Japanese morphological tokenizer (kuromoji role).

Goldens exercise the lattice mechanics with the in-repo mini lexicon
(the production IPADIC is pluggable but not bundled — no network):
minimal-cost segmentation beating greedy longest match (the classic
MeCab すもも sentence), search-mode compound decomposition with the
published ViterbiNBest penalties, unknown-word grouping per character
class, and the analyzer slot end-to-end through build_index.
"""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_ray.analysis.japanese import (JapaneseAnalyzer,
                                          JapaneseTokenizer, char_class,
                                          load_dictionary, KANJI,
                                          HIRAGANA, KATAKANA, ALPHA,
                                          DIGIT)


def surfaces(t, s):
    return [tok.surface for tok in t.tokenize(s)]


def test_minimal_cost_beats_greedy():
    # greedy longest-match would eat もも immediately after すもも and
    # derail; the lattice recovers the particle structure
    t = JapaneseTokenizer(mode="normal")
    assert surfaces(t, "すもももももももものうち") == \
        ["すもも", "も", "もも", "も", "もも", "の", "うち"]


def test_search_mode_splits_compounds():
    ts = JapaneseTokenizer(mode="search")
    tn = JapaneseTokenizer(mode="normal")
    assert surfaces(ts, "関西国際空港") == ["関西", "国際", "空港"]
    # normal mode keeps the lexicalized compound
    assert surfaces(tn, "関西国際空港") == ["関西国際空港"]


def test_particles_and_suffixes():
    t = JapaneseTokenizer(mode="search")
    assert surfaces(t, "私は東京都に住む") == \
        ["私", "は", "東京", "都", "に", "住む"]
    assert surfaces(t, "日本語を勉強しました") == \
        ["日本語", "を", "勉強", "し", "まし", "た"]


def test_unknown_word_grouping():
    t = JapaneseTokenizer(mode="search")
    # katakana / latin / digit runs group into one unknown token each
    assert surfaces(t, "カタカナとABC123です") == \
        ["カタカナ", "と", "ABC", "123", "です"]
    toks = t.tokenize("東京タワー")
    assert [tok.surface for tok in toks] == ["東京", "タワー"]
    assert toks[1].pos == "未知語"


def test_offsets_cover_text():
    t = JapaneseTokenizer(mode="search")
    s = "私は寿司を食べました"
    toks = t.tokenize(s)
    assert toks[0].start == 0 and toks[-1].end == len(s)
    assert all(a.end == b.start for a, b in zip(toks, toks[1:]))
    assert "".join(tok.surface for tok in toks) == s


def test_char_classes():
    assert char_class("字") == KANJI
    assert char_class("ひ") == HIRAGANA
    assert char_class("カ") == KATAKANA
    assert char_class("a") == ALPHA
    assert char_class("7") == DIGIT


def test_custom_dictionary_plugs_in():
    d = load_dictionary(["へび,0,0,100,名詞", "うさぎ,0,0,100,名詞"])
    t = JapaneseTokenizer(d, mode="normal")
    assert surfaces(t, "へびうさぎ") == ["へび", "うさぎ"]


def test_analyzer_drops_particles_and_lowercases():
    a = JapaneseAnalyzer()
    assert a("私は東京都に住む。Tokyo ABC") == \
        ["私", "東京", "都", "住む", "tokyo", "abc"]
    assert a("") == []
    kept = JapaneseAnalyzer(keep_particles=True)("私は住む")
    assert kept == ["私", "は", "住む"]


@pytest.fixture(scope="module")
def ja_corpus(tmp_path_factory):
    d = tmp_path_factory.mktemp("ja")
    sents = ["私は東京都に住む", "関西国際空港に行きました",
             "日本語を勉強しました", "今日の天気は雨です",
             "学生が寿司を食べる", "猫と犬が住む駅"]
    t = pa.table({
        "doc_id": pa.array(np.arange(len(sents), dtype=np.int64)),
        "text": pa.array(sents, pa.string()),
    })
    p = str(d / "ja.parquet")
    pq.write_table(t, p)
    return p, sents


def test_japanese_index_end_to_end(ja_corpus, ray_session, tmp_path):
    from lucene_ray.index import build_index
    from lucene_ray.search import IndexReader, Searcher, TermQuery
    p, sents = ja_corpus
    out = str(tmp_path / "jaidx")
    build_index(p, out, analyzer=JapaneseAnalyzer(), batch_size=4)
    s = Searcher(IndexReader(out))
    td = s.search(TermQuery("空港"), k=5)
    assert list(td.doc_ids) == [1]  # search-mode split made 空港 a term
    td = s.search(TermQuery("住む"), k=5)
    assert sorted(td.doc_ids.tolist()) == [0, 5]
    td = s.search(TermQuery("は"), k=5)  # particle dropped by analyzer
    assert len(td.doc_ids) == 0
