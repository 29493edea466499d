"""Golden-token conformance tests for the analysis chain.

Expected outputs transcribed from the reference test suite
(`lucene/core/src/test/org/apache/lucene/analysis/standard/
TestStandardAnalyzer.java`) — the CheckHits/golden-stream pattern of
SURVEY.md §5.1. No Ray needed here; pure functions.
"""

import pytest

from lucene_ray.analysis import (
    ENGLISH_STOP_WORDS,
    StandardAnalyzer,
    byte4_to_int,
    int_to_byte4,
    int_to_byte4_array,
    java_lowercase,
    tokenize,
)

A = StandardAnalyzer()  # default: empty stop set, maxTokenLength=255


def terms(text):
    return A(text)


def types(text):
    return [t.type for t in tokenize(text)]


# --- TestStandardAnalyzer golden cases -------------------------------------

def test_alphanumeric():
    assert terms("B2B") == ["b2b"]
    assert terms("2B") == ["2b"]
    assert terms("testing 1234") == ["testing", "1234"]


def test_delimiters():
    assert terms("some-dashed-phrase") == ["some", "dashed", "phrase"]
    assert terms("dogs,chase,cats") == ["dogs", "chase", "cats"]
    assert terms("ac/dc") == ["ac", "dc"]


def test_apostrophes():
    assert terms("O'Reilly") == ["o'reilly"]
    assert terms("you're") == ["you're"]
    assert terms("she's") == ["she's"]
    assert terms("Jim's") == ["jim's"]
    assert terms("don't") == ["don't"]
    assert terms("O'Reilly's") == ["o'reilly's"]


def test_numeric():
    assert terms("21.35") == ["21.35"]
    assert terms("R2D2 C3PO") == ["r2d2", "c3po"]
    assert terms("216.239.63.104") == ["216.239.63.104"]


def test_various_text():
    assert terms("C embedded developers wanted") == ["c", "embedded", "developers", "wanted"]
    assert terms("foo bar FOO BAR") == ["foo", "bar", "foo", "bar"]
    assert terms("foo      bar .  FOO <> BAR") == ["foo", "bar", "foo", "bar"]
    assert terms('"QUOTED" word') == ["quoted", "word"]
    assert terms("David has 5000 bones") == ["david", "has", "5000", "bones"]


def test_empty():
    assert terms("") == []
    assert terms(".") == []
    assert terms(" ") == []


def test_offsets_and_types():
    toks = tokenize("David has 5000 bones")
    assert [t.text for t in toks] == ["David", "has", "5000", "bones"]
    assert [t.start for t in toks] == [0, 6, 10, 15]
    assert [t.end for t in toks] == [5, 9, 14, 20]
    assert [t.type for t in toks] == ["<ALPHANUM>", "<ALPHANUM>", "<NUM>", "<ALPHANUM>"]


def test_mid_splits():
    # TestStandardAnalyzer.testMid
    assert terms("A:B") == ["a:b"]
    assert terms("A::B") == ["a", "b"]
    assert terms("1.2") == ["1.2"]
    assert terms("A.B") == ["a.b"]
    assert terms("1..2") == ["1", "2"]
    assert terms("A..B") == ["a", "b"]
    assert terms("1,2") == ["1,2"]
    assert terms("1,,2") == ["1", "2"]
    assert terms("A.:B") == ["a", "b"]
    assert terms("A:.B") == ["a", "b"]
    assert terms("1,.2") == ["1", "2"]
    assert terms("1.,2") == ["1", "2"]
    assert terms("A:B_A:B") == ["a:b_a:b"]
    assert terms("A:B_A::B") == ["a:b_a", "b"]
    assert terms("1.2_1.2") == ["1.2_1.2"]
    assert terms("A.B_A.B") == ["a.b_a.b"]
    assert terms("1.2_1..2") == ["1.2_1", "2"]
    assert terms("A.B_A..B") == ["a.b_a", "b"]
    assert terms("1,2_1,2") == ["1,2_1,2"]
    assert terms("1,2_1,,2") == ["1,2_1", "2"]
    assert terms("C_A.:B") == ["c_a", "b"]
    assert terms("C_A:.B") == ["c_a", "b"]
    assert terms("3_1,.2") == ["3_1", "2"]
    assert terms("3_1.,2") == ["3_1", "2"]


def test_armenian():
    text = ("Վիքիպեդիայի 13 միլիոն հոդվածները (4,600` հայերեն վիքիպեդիայում) "
            "գրվել են կամավորների կողմից")
    got = [t.text for t in tokenize(text)]
    assert got == ["Վիքիպեդիայի", "13", "միլիոն", "հոդվածները", "4,600",
                   "հայերեն", "վիքիպեդիայում", "գրվել", "են", "կամավորների", "կողմից"]


def test_amharic():
    got = [t.text for t in tokenize("ዊኪፔድያ የባለ ብዙ ቋንቋ የተሟላ")]
    assert got == ["ዊኪፔድያ", "የባለ", "ብዙ", "ቋንቋ", "የተሟላ"]


def test_arabic():
    text = 'الفيلم الوثائقي الأول عن ويكيبيديا يسمى "الحقيقة بالأرقام: قصة ويكيبيديا" في 2008.'
    got = [t.text for t in tokenize(text)]
    assert got == ["الفيلم", "الوثائقي", "الأول", "عن", "ويكيبيديا", "يسمى",
                   "الحقيقة", "بالأرقام", "قصة", "ويكيبيديا", "في", "2008"]


def test_aramaic_syriac_marks():
    got = [t.text for t in tokenize("ܒܠܫܢ̈ܐ ܣܓܝܐ̈ܐ܂")]
    assert got == ["ܒܠܫܢ̈ܐ", "ܣܓܝܐ̈ܐ"]


def test_bengali():
    got = [t.text for t in tokenize("এই বিশ্বকোষ পরিচালনা করে উইকিমিডিয়া ২০০টিরও")]
    assert got == ["এই", "বিশ্বকোষ", "পরিচালনা", "করে", "উইকিমিডিয়া", "২০০টিরও"]


def test_farsi():
    got = [t.text for t in tokenize("ویکی پدیای انگلیسی در تاریخ ۲۵ دی ۱۳۷۹")]
    assert got == ["ویکی", "پدیای", "انگلیسی", "در", "تاریخ", "۲۵", "دی", "۱۳۷۹"]


def test_greek():
    got = [t.text for t in tokenize("Γράφεται σε συνεργασία από εθελοντές με το λογισμικό wiki")]
    assert got == ["Γράφεται", "σε", "συνεργασία", "από", "εθελοντές", "με",
                   "το", "λογισμικό", "wiki"]


def test_thai():
    got = tokenize("การที่ได้ต้องแสดงว่างานดี. แล้วเธอจะไปไหน? ๑๒๓๔")
    assert [t.text for t in got] == ["การที่ได้ต้องแสดงว่างานดี", "แล้วเธอจะไปไหน", "๑๒๓๔"]
    assert [t.type for t in got] == ["<SOUTHEAST_ASIAN>", "<SOUTHEAST_ASIAN>", "<NUM>"]


def test_lao():
    got = [t.text for t in tokenize("ສາທາລະນະລັດ ປະຊາທິປະໄຕ ປະຊາຊົນລາວ")]
    assert got == ["ສາທາລະນະລັດ", "ປະຊາທິປະໄຕ", "ປະຊາຊົນລາວ"]


def test_tibetan():
    got = [t.text for t in tokenize("སྣོན་མཛོད་དང་ལས་འདིས་བོད་ཡིག")]
    assert got == ["སྣོན", "མཛོད", "དང", "ལས", "འདིས", "བོད", "ཡིག"]


def test_chinese():
    got = tokenize("我是中国人。 １２３４ Ｔｅｓｔｓ ")
    assert [t.text for t in got] == ["我", "是", "中", "国", "人", "１２３４", "Ｔｅｓｔｓ"]


def test_combining_mark_latin():
    # LUCENE-1545: U+0364 COMBINING LATIN SMALL LETTER E must not split
    assert [t.text for t in tokenize("moͤchte")] == ["moͤchte"]


def test_korean():
    got = tokenize("안녕하세요 한글입니다")
    assert [t.text for t in got] == ["안녕하세요", "한글입니다"]
    got = tokenize("훈민정음")
    assert [t.text for t in got] == ["훈민정음"]
    assert got[0].type == "<HANGUL>"


def test_supplementary_ideographs():
    got = tokenize("𩬅艱鍟䇹愯瀛")
    assert [t.text for t in got] == ["𩬅", "艱", "鍟", "䇹", "愯", "瀛"]
    assert all(t.type == "<IDEOGRAPHIC>" for t in got)


def test_japanese():
    got = tokenize("仮名遣い カタカナ")
    assert [t.text for t in got] == ["仮", "名", "遣", "い", "カタカナ"]
    assert [t.type for t in got] == ["<IDEOGRAPHIC>", "<IDEOGRAPHIC>",
                                     "<IDEOGRAPHIC>", "<HIRAGANA>", "<KATAKANA>"]


def test_combining_marks_cjk():
    for text in ["ざ", "ザ", "壹゙", "아゙"]:
        got = tokenize(text)
        assert [t.text for t in got] == [text], text


def test_emoji_simple():
    got = tokenize("💩 💩💩")
    assert [t.text for t in got] == ["💩", "💩", "💩"]
    assert all(t.type == "<EMOJI>" for t in got)


def test_emoji_zwj_sequence():
    got = tokenize("👩‍❤️‍👩")
    assert [t.text for t in got] == ["👩‍❤️‍👩"]
    assert got[0].type == "<EMOJI>"


def test_emoji_modifier_sequence():
    got = tokenize("👨🏼‍⚕️")
    assert [t.text for t in got] == ["👨🏼‍⚕️"]


def test_emoji_regional_indicator():
    got = tokenize("🇺🇸🇺🇸")
    assert [t.text for t in got] == ["🇺🇸", "🇺🇸"]
    assert all(t.type == "<EMOJI>" for t in got)


def test_emoji_keycap():
    got = tokenize("#️⃣")
    assert [t.text for t in got] == ["#️⃣"]
    got = tokenize("3️⃣")
    assert [t.text for t in got] == ["3️⃣"]
    assert got[0].type == "<EMOJI>"


def test_emoji_text_presentation():
    assert tokenize("#︎") == []
    got = tokenize("3︎")
    assert [t.text for t in got] == ["3︎"]
    assert got[0].type == "<NUM>"
    got = tokenize("⭕︎")
    assert [t.text for t in got] == ["⭕"]
    assert got[0].type == "<EMOJI>"
    got = tokenize("⭕︎‍⭕︎")
    assert [t.text for t in got] == ["⭕", "‍⭕"]


def test_emoji_tag_sequence():
    flag = "🏴󠁧󠁢󠁥󠁮󠁧󠁿"  # England flag: 1F3F4 + tag chars + E007F
    got = tokenize(flag)
    assert [t.text for t in got] == [flag]
    assert got[0].type == "<EMOJI>"


def test_emoji_around_text():
    got = tokenize("poo💩poo")
    assert [t.text for t in got] == ["poo", "💩", "poo"]
    assert [t.type for t in got] == ["<ALPHANUM>", "<EMOJI>", "<ALPHANUM>"]
    got = tokenize("💩中國💩")
    assert [t.text for t in got] == ["💩", "中", "國", "💩"]


def test_max_token_length_default():
    # 255-char token passes; 256-char run splits 255+1
    b255 = "b" * 255
    got = terms("x " + b255 + " " + b255 + "b")
    assert got == ["x", b255, b255, "b"]


def test_max_token_length_non_default():
    a = StandardAnalyzer(max_token_length=5)
    assert a("ab cd toolong xy z") == ["ab", "cd", "toolo", "ng", "xy", "z"]


def test_normalize_lowercase_only():
    # StandardAnalyzer.normalize: lowercase only
    assert java_lowercase('"\\À3[]()! Cz@') == '"\\à3[]()! cz@'


def test_java_lowercase_semantics():
    assert java_lowercase("İ") == "i"  # U+0130: simple mapping, dot lost
    assert java_lowercase("ΚΟΣ") == "κοσ"  # final sigma NOT applied (per-codepoint)
    assert java_lowercase("Straße") == "straße"


def test_stop_filter():
    a = StandardAnalyzer(stop_words=ENGLISH_STOP_WORDS)
    assert a("the quick brown fox") == ["quick", "brown", "fox"]
    toks = a.tokens("the quick brown fox is fast")
    # positions keep holes where stops were removed
    assert [(t.term, t.position) for t in toks] == [
        ("quick", 1), ("brown", 2), ("fox", 3), ("fast", 5)]


def test_ascii_general_path_agreement():
    cases = [
        "B2B 2B testing 1234", "O'Reilly's 21.35 216.239.63.104",
        "A:B_A::B 1.2_1..2 C_A.:B", "some-dashed-phrase ac/dc",
        "x" * 300 + " tail", "_lead_ _1_2_ mid__dle",
    ]
    for c in cases:
        from lucene_ray.analysis.tokenizer import Scanner
        fast = [t.text for t in tokenize(c)]
        general = [t.text for t in Scanner(c).tokens()]
        assert fast == general, c


# --- SmallFloat ------------------------------------------------------------

def test_smallfloat_roundtrip_monotone():
    prev = -1
    for i in range(0, 1 << 16):
        b = int_to_byte4(i)
        assert 0 <= b <= 255
        assert byte4_to_int(b) <= i
        assert b >= prev_b if (prev_b := int_to_byte4(max(i - 1, 0))) is not None else True
    # exact for values < 40 (SmallFloat.java: 24 free values + 4-bit exact)
    for i in range(40):
        assert byte4_to_int(int_to_byte4(i)) == i
    assert int_to_byte4(41) == 40  # first lossy step


def test_smallfloat_vectorized_matches_scalar():
    import numpy as np
    xs = np.concatenate([np.arange(0, 4096), 2 ** np.arange(12, 31, dtype=np.int64)])
    enc = int_to_byte4_array(xs)
    for x, e in zip(xs.tolist(), enc.tolist()):
        assert int_to_byte4(x) == e


def test_shingle_filter():
    from lucene_ray.analysis.stemmer import AnalyzerChain, ShingleFilter
    f = ShingleFilter(2, 2)
    assert f(["a", "b", "c"]) == ["a", "a_b", "b", "b_c", "c"]
    f2 = ShingleFilter(2, 3, token_separator=" ", output_unigrams=False)
    assert f2(["a", "b", "c", "d"]) == [
        "a b", "a b c", "b c", "b c d", "c d"]
    assert f([]) == []
    assert f(["solo"]) == ["solo"]
    chain = AnalyzerChain(ShingleFilter(2, 2))
    assert chain("Data Merge Window") == [
        "data", "data_merge", "merge", "merge_window", "window"]


def test_datetools_roundtrip_and_order():
    from datetime import datetime, timezone, timedelta
    from lucene_ray.analysis.datetools import (
        RESOLUTIONS, date_to_string, round_floor, string_to_date)
    dt = datetime(2024, 3, 7, 15, 42, 9, 123000)
    assert date_to_string(dt, "day") == "20240307"
    assert date_to_string(dt, "minute") == "202403071542"
    assert date_to_string(dt, "millisecond") == "20240307154209123"
    # round trip at every resolution == floor
    assert string_to_date("20240307154209123") == dt
    assert string_to_date("202403") == datetime(2024, 3, 1)
    assert round_floor(dt, "hour") == datetime(2024, 3, 7, 15)
    # lexicographic == chronological
    a, b = datetime(1999, 12, 31, 23, 59), datetime(2000, 1, 1, 0, 0)
    for res in RESOLUTIONS:
        sa, sb = date_to_string(a, res), date_to_string(b, res)
        assert sa <= sb
    # tz-aware renders in UTC
    east = datetime(2024, 1, 1, 1, 30,
                    tzinfo=timezone(timedelta(hours=5)))
    assert date_to_string(east, "hour") == "2023123120"


class TestCoreAnalyzers:
    """WhitespaceAnalyzer / SimpleAnalyzer / StopAnalyzer
    (analysis/core package)."""

    def test_whitespace_preserves_case_and_punct(self):
        from lucene_ray.analysis.analyzer import WhitespaceAnalyzer
        a = WhitespaceAnalyzer()
        assert a("Foo BAR's  x-1 ") == ["Foo", "BAR's", "x-1"]
        assert a("") == [] and a(None or "") == []

    def test_simple_letter_runs(self):
        from lucene_ray.analysis.analyzer import SimpleAnalyzer
        a = SimpleAnalyzer()
        assert a("Foo2Bar don't x-1") == ["foo", "bar", "don", "t", "x"]

    def test_stop_analyzer(self):
        from lucene_ray.analysis.analyzer import StopAnalyzer
        a = StopAnalyzer({"the", "a"})
        assert a("The a Fox") == ["fox"]
