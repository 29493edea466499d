"""Khmer / Lao / Myanmar dictionary segmentation — goldens transcribed
from the reference's TestICUTokenizer.java testKhmer/testLao/
testMyanmar (the ICU dictionary-BreakIterator cases)."""

from lucene_ray.analysis.sea import (KhmerTokenizer, LaoTokenizer,
                                     MyanmarTokenizer)
from lucene_ray.analysis.thai import load_lexicon


def test_khmer_golden():
    assert KhmerTokenizer()("ផ្ទះស្កឹមស្កៃបីបួនខ្នងនេះ") == \
        ["ផ្ទះ", "ស្កឹមស្កៃ", "បី", "បួន", "ខ្នង", "នេះ"]


def test_lao_goldens():
    t = LaoTokenizer()
    assert t("ກວ່າດອກ") == ["ກວ່າ", "ດອກ"]
    assert t("ພາສາລາວ") == ["ພາສາ", "ລາວ"]


def test_myanmar_golden():
    assert MyanmarTokenizer()("သက်ဝင်လှုပ်ရှားစေပြီး") == \
        ["သက်ဝင်", "လှုပ်ရှား", "စေ", "ပြီး"]


def test_mixed_script_delegation():
    # non-Khmer runs go through the UAX#29 tokenizer
    assert KhmerTokenizer()("ខ្ញុំ abc ភាសា") == ["ខ្ញុំ", "abc", "ភាសា"]


def test_offsets():
    toks = LaoTokenizer().tokenize("ພາສາລາວ")
    assert [(t.term, t.start, t.end) for t in toks] == \
        [("ພາສາ", 0, 4), ("ລາວ", 4, 7)]


def test_real_dictionary_slot(tmp_path):
    p = tmp_path / "km.txt"
    p.write_text("ខ្មែរ\nភាសា\n", encoding="utf-8")
    t = KhmerTokenizer(lexicon=load_lexicon(str(p)))
    assert t("ភាសាខ្មែរ") == ["ភាសា", "ខ្មែរ"]
