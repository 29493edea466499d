"""Khmer / Lao / Myanmar dictionary segmentation — the remaining
southeast-Asian scripts of the ICU dictionary-BreakIterator role
(``lucene/analysis/icu/.../segmentation/ICUTokenizer.java:40``; the
reference's goldens live in ``TestICUTokenizer.java:284-301``
testKhmer/testLao/testMyanmar). Same minimal-cost Viterbi core as
``analysis/thai.py`` (these scripts are likewise written without
spaces), one mini lexicon per script covering the reference corpus +
common vocabulary, and the same one-word-per-line real-dictionary slot
(``thai.load_lexicon``)."""

from __future__ import annotations

from .thai import ThaiTokenizer

MINI_LEXICON_KM = frozenset("""
ផ្ទះ ស្កឹមស្កៃ បី បួន ខ្នង នេះ ខ្ញុំ ភាសា ខ្មែរ ទៅ មក នៅ ជា មាន ធ្វើ
ប្រទេស កម្ពុជា មនុស្ស ទឹក បាយ ស្រុក ភ្នំពេញ សៀវភៅ រៀន សាលា
""".split())

MINI_LEXICON_LO = frozenset("""
ກວ່າ ດອກ ພາສາ ລາວ ຂ້ອຍ ເຈົ້າ ໄປ ມາ ຢູ່ ແມ່ນ ມີ ເຮັດ ປະເທດ ຄົນ ນ້ຳ
ເຂົ້າ ບ້ານ ເມືອງ ຮຽນ ໂຮງຮຽນ ປຶ້ມ ວຽງຈັນ
""".split())

MINI_LEXICON_MY = frozenset("""
သက်ဝင် လှုပ်ရှား စေ ပြီး မြန်မာ ဘာသာ စကား ကျွန်တော် သွား လာ နေ ဖြစ် ရှိ
လုပ် နိုင်ငံ လူ ရေ ထမင်း အိမ် မြို့ စာ သင် ကျောင်း စာအုပ်
""".split())


def _range_pred(lo: int, hi: int):
    def pred(ch: str, _lo=lo, _hi=hi) -> bool:
        return _lo <= ord(ch) <= _hi
    return staticmethod(pred)


class KhmerTokenizer(ThaiTokenizer):
    _in_script = _range_pred(0x1780, 0x17FF)

    @staticmethod
    def _default_lexicon():
        return MINI_LEXICON_KM


class LaoTokenizer(ThaiTokenizer):
    _in_script = _range_pred(0x0E80, 0x0EFF)

    @staticmethod
    def _default_lexicon():
        return MINI_LEXICON_LO


class MyanmarTokenizer(ThaiTokenizer):
    _in_script = _range_pred(0x1000, 0x109F)

    @staticmethod
    def _default_lexicon():
        return MINI_LEXICON_MY
