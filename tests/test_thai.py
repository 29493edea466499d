"""ThaiTokenizer/ThaiAnalyzer conformance — goldens transcribed from
the reference's TestThaiAnalyzer.java (offsets + position increments),
run through the dictionary-Viterbi segmenter."""

from lucene_ray.analysis.analyzer import ENGLISH_STOP_WORDS
from lucene_ray.analysis.thai import (MINI_LEXICON_TH, THAI_STOP_WORDS,
                                      ThaiAnalyzer, ThaiTokenizer,
                                      load_lexicon)

_SENT = "การที่ได้ต้องแสดงว่างานดี"


def test_offsets_golden():
    # TestThaiAnalyzer.testOffsets
    a = ThaiAnalyzer(stop_words=frozenset())
    toks = a.tokens_with_positions(_SENT)
    assert [t[0] for t in toks] == \
        ["การ", "ที่", "ได้", "ต้อง", "แสดง", "ว่า", "งาน", "ดี"]
    assert [t[1] for t in toks] == [0, 3, 6, 9, 13, 17, 20, 23]
    assert [t[2] for t in toks] == [3, 6, 9, 13, 17, 20, 23, 25]


def test_stopwords_golden():
    # TestThaiAnalyzer.testStopWords: default Thai stop set drops
    # การ/ที่/ได้/ต้อง/ว่า with posInc carry
    a = ThaiAnalyzer()
    toks = a.tokens_with_positions(_SENT)
    assert [(t[0], t[1], t[2], t[3]) for t in toks] == \
        [("แสดง", 13, 17, 5), ("งาน", 20, 23, 2), ("ดี", 23, 25, 1)]


def test_position_increments_golden():
    # TestThaiAnalyzer.testPositionIncrements (English stop set; "the"
    # inside the Thai text bumps the next increment)
    a = ThaiAnalyzer(stop_words=ENGLISH_STOP_WORDS)
    for text, starts, ends in [
        ("การที่ได้ต้อง the แสดงว่างานดี",
         [0, 3, 6, 9, 18, 22, 25, 28], [3, 6, 9, 13, 22, 25, 28, 30]),
        ("การที่ได้ต้องthe แสดงว่างานดี",
         [0, 3, 6, 9, 17, 21, 24, 27], [3, 6, 9, 13, 21, 24, 27, 29]),
    ]:
        toks = a.tokens_with_positions(text)
        assert [t[0] for t in toks] == \
            ["การ", "ที่", "ได้", "ต้อง", "แสดง", "ว่า", "งาน", "ดี"]
        assert [t[1] for t in toks] == starts
        assert [t[2] for t in toks] == ends
        assert [t[3] for t in toks] == [1, 1, 1, 1, 2, 1, 1, 1]


def test_mixed_script_golden():
    # TestThaiAnalyzer.testAnalyzer mixed sentence
    a = ThaiAnalyzer(stop_words=frozenset())
    assert a("") == []
    assert a("บริษัทชื่อ XY&Z - คุยกับ xyz@demo.com") == \
        ["บริษัท", "ชื่อ", "xy", "z", "คุย", "กับ", "xyz", "demo.com"]


def test_reusable_tokenstream_golden():
    a = ThaiAnalyzer(stop_words=frozenset())
    assert a("ภาษาไทย") == ["ภาษา", "ไทย"]
    assert a("ภาษาไทย") == ["ภาษา", "ไทย"]


def test_ambiguity_viterbi_not_greedy():
    # แสดงว่างานดี: greedy longest-match takes ว่าง (in lexicon) and
    # strands าน as unknown; Viterbi picks the all-known path
    t = ThaiTokenizer()
    assert "ว่าง" in MINI_LEXICON_TH
    assert t("แสดงว่างานดี") == ["แสดง", "ว่า", "งาน", "ดี"]


def test_unknown_run_grouping():
    # an out-of-lexicon Thai run becomes ONE token, neighbors intact
    t = ThaiTokenizer(lexicon=frozenset(["ดี"]))
    toks = t.tokenize("ฦๅฦๅดี")
    assert [x.term for x in toks] == ["ฦๅฦๅ", "ดี"]


def test_real_dictionary_slot(tmp_path):
    p = tmp_path / "tdict.txt"
    p.write_text("# comment\nภาษา\nไทย\n", encoding="utf-8")
    lex = load_lexicon(str(p))
    assert ThaiTokenizer(lexicon=lex)("ภาษาไทย") == ["ภาษา", "ไทย"]


def test_stop_set_is_reference_list():
    assert len(THAI_STOP_WORDS) == 115
    for w in ("การ", "ที่", "ได้", "ต้อง", "ว่า", "ที่สุด", "เป็นการ"):
        assert w in THAI_STOP_WORDS
