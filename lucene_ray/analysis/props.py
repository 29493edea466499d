"""Unicode word-break / emoji property classification.

Implements the character classes used by the reference tokenizer grammar
(``lucene/core/src/java/org/apache/lucene/analysis/standard/
StandardTokenizerImpl.jflex:63-100``): UAX#29 Word_Break properties,
script classes (Han / Hiragana / Katakana / Hangul), Line_Break
Complex_Context (South-East-Asian), and TR51 emoji properties.

Property data is reconstructed from the public Unicode specifications
(UAX#29 WordBreakProperty derivations, UAX#14 LB=SA, UTS#51
Extended_Pictographic / Emoji_Modifier_Base) on top of Python's
``unicodedata`` general categories. Each codepoint maps to a *bitmask* —
classes may overlap, exactly as in the JFlex char classes.
"""

from __future__ import annotations

import bisect
import sys
import unicodedata as _ud
from functools import lru_cache

# --- property bits ---------------------------------------------------------
EXTEND = 1 << 0
FORMAT = 1 << 1
ZWJ = 1 << 2
ALETTER = 1 << 3
HEBREW = 1 << 4
NUMERIC = 1 << 5
KATAKANA = 1 << 6
MIDLETTER = 1 << 7
MIDNUM = 1 << 8
MIDNUMLET = 1 << 9
SQ = 1 << 10  # Single_Quote
DQ = 1 << 11  # Double_Quote
ENL = 1 << 12  # ExtendNumLet
RI = 1 << 13  # Regional_Indicator
HAN = 1 << 14
HIRAGANA = 1 << 15
HANGUL = 1 << 16
SA = 1 << 17  # LB: Complex_Context (South-East Asian)
EXTPICT = 1 << 18  # Extended_Pictographic
EMOJI_MOD = 1 << 19  # Emoji_Modifier (skin tones)
EMOJI_MOD_BASE = 1 << 20
KEYCAPBASE = 1 << 21  # [0-9#*]

# composites used by the scanner
EXT_FMT_ZWJ = EXTEND | FORMAT | ZWJ
MID_LETTER_EX = MIDLETTER | MIDNUMLET | SQ  # letters' mid class
MID_NUMERIC_EX = MIDNUM | MIDNUMLET | SQ  # numerics' mid class
AHLETTER = ALETTER | HEBREW

_MIDLETTER_SET = frozenset(
    [0x003A, 0x00B7, 0x0387, 0x05F4, 0x2027, 0xFE13, 0xFE55, 0xFF1A]
)
_MIDNUM_SET = frozenset(
    [0x002C, 0x003B, 0x037E, 0x0589, 0x060C, 0x060D, 0x066C, 0x07F8,
     0x2044, 0xFE10, 0xFE14, 0xFE50, 0xFE54, 0xFF0C, 0xFF1B]
)
_MIDNUMLET_SET = frozenset([0x002E, 0x2018, 0x2019, 0x2024, 0xFE52, 0xFF07, 0xFF0E])

_HAN_RANGES = [
    (0x3005, 0x3005), (0x3007, 0x3007), (0x3021, 0x3029), (0x3038, 0x303B),
    (0x3400, 0x4DBF), (0x4E00, 0x9FFF), (0xF900, 0xFAFF),
    (0x20000, 0x2A6DF), (0x2A700, 0x2EBEF), (0x2F800, 0x2FA1F),
    (0x30000, 0x3134F),
]
_HIRAGANA_RANGES = [(0x3041, 0x3096), (0x309D, 0x309F), (0x1B001, 0x1B11F), (0x1B150, 0x1B152)]
_KATAKANA_RANGES = [
    (0x3031, 0x3035), (0x30A1, 0x30FA), (0x30FC, 0x30FF), (0x31F0, 0x31FF),
    (0x32D0, 0x32FE), (0x3300, 0x3357), (0xFF66, 0xFF9F), (0x1B000, 0x1B000),
    (0x1B164, 0x1B167),
]
_HANGUL_RANGES = [
    (0x1100, 0x11FF), (0x3131, 0x318E), (0xA960, 0xA97C), (0xAC00, 0xD7A3),
    (0xD7B0, 0xD7C6), (0xD7CB, 0xD7FB), (0xFFA0, 0xFFDC),
]
# SEA scripts (LB=SA applies to their letters & marks; filtered by category)
_SA_RANGES = [
    (0x0E00, 0x0E7F),  # Thai
    (0x0E80, 0x0EFF),  # Lao
    (0x1000, 0x109F),  # Myanmar
    (0x1780, 0x17FF),  # Khmer
    (0x1950, 0x197F),  # Tai Le
    (0x1980, 0x19DF),  # New Tai Lue
    (0x1A20, 0x1AAF),  # Tai Tham
    (0xA9E0, 0xA9FF),  # Myanmar Extended-B
    (0xAA60, 0xAA7F),  # Myanmar Extended-A
    (0xAA80, 0xAADF),  # Tai Viet
]
_HEBREW_RANGES = [(0x05D0, 0x05F2), (0xFB1D, 0xFB1D), (0xFB1F, 0xFB4F)]

# UTS#51 Extended_Pictographic (Unicode 12-era ranges)
_EXTPICT_RANGES = [
    (0x00A9, 0x00A9), (0x00AE, 0x00AE), (0x203C, 0x203C), (0x2049, 0x2049),
    (0x2122, 0x2122), (0x2139, 0x2139), (0x2194, 0x2199), (0x21A9, 0x21AA),
    (0x231A, 0x231B), (0x2328, 0x2328), (0x2388, 0x2388), (0x23CF, 0x23CF),
    (0x23E9, 0x23F3), (0x23F8, 0x23FA), (0x24C2, 0x24C2), (0x25AA, 0x25AB),
    (0x25B6, 0x25B6), (0x25C0, 0x25C0), (0x25FB, 0x25FE), (0x2600, 0x2605),
    (0x2607, 0x2612), (0x2614, 0x2685), (0x2690, 0x2705), (0x2708, 0x2712),
    (0x2714, 0x2714), (0x2716, 0x2716), (0x271D, 0x271D), (0x2721, 0x2721),
    (0x2728, 0x2728), (0x2733, 0x2734), (0x2744, 0x2744), (0x2747, 0x2747),
    (0x274C, 0x274C), (0x274E, 0x274E), (0x2753, 0x2755), (0x2757, 0x2757),
    (0x2763, 0x2767), (0x2795, 0x2797), (0x27A1, 0x27A1), (0x27B0, 0x27B0),
    (0x27BF, 0x27BF), (0x2934, 0x2935), (0x2B05, 0x2B07), (0x2B1B, 0x2B1C),
    (0x2B50, 0x2B50), (0x2B55, 0x2B55), (0x3030, 0x3030), (0x303D, 0x303D),
    (0x3297, 0x3297), (0x3299, 0x3299),
    (0x1F000, 0x1F0FF), (0x1F10D, 0x1F10F), (0x1F12F, 0x1F12F),
    (0x1F16C, 0x1F171), (0x1F17E, 0x1F17F), (0x1F18E, 0x1F18E),
    (0x1F191, 0x1F19A), (0x1F1AD, 0x1F1E5), (0x1F201, 0x1F20F),
    (0x1F21A, 0x1F21A), (0x1F22F, 0x1F22F), (0x1F232, 0x1F23A),
    (0x1F23C, 0x1F23F), (0x1F249, 0x1F3FA), (0x1F400, 0x1F53D),
    (0x1F546, 0x1F64F), (0x1F680, 0x1F6FF), (0x1F774, 0x1F77F),
    (0x1F7D5, 0x1F7FF), (0x1F80C, 0x1F80F), (0x1F848, 0x1F84F),
    (0x1F85A, 0x1F85F), (0x1F888, 0x1F88F), (0x1F8AE, 0x1F8FF),
    (0x1F90C, 0x1F93A), (0x1F93C, 0x1F945), (0x1F947, 0x1FAFF),
    (0x1FC00, 0x1FFFD),
]
_EMOJI_MOD_BASE_RANGES = [
    (0x261D, 0x261D), (0x26F9, 0x26F9), (0x270A, 0x270D), (0x1F385, 0x1F385),
    (0x1F3C2, 0x1F3C4), (0x1F3C7, 0x1F3C7), (0x1F3CA, 0x1F3CC),
    (0x1F442, 0x1F443), (0x1F446, 0x1F450), (0x1F466, 0x1F478),
    (0x1F47C, 0x1F47C), (0x1F481, 0x1F483), (0x1F485, 0x1F487),
    (0x1F48F, 0x1F48F), (0x1F491, 0x1F491), (0x1F4AA, 0x1F4AA),
    (0x1F574, 0x1F575), (0x1F57A, 0x1F57A), (0x1F590, 0x1F590),
    (0x1F595, 0x1F596), (0x1F645, 0x1F647), (0x1F64B, 0x1F64F),
    (0x1F6A3, 0x1F6A3), (0x1F6B4, 0x1F6B6), (0x1F6C0, 0x1F6C0),
    (0x1F6CC, 0x1F6CC), (0x1F90C, 0x1F90C), (0x1F90F, 0x1F90F),
    (0x1F918, 0x1F91F), (0x1F926, 0x1F926), (0x1F930, 0x1F939),
    (0x1F93C, 0x1F93E), (0x1F977, 0x1F977), (0x1F9B5, 0x1F9B6),
    (0x1F9B8, 0x1F9B9), (0x1F9BB, 0x1F9BB), (0x1F9CD, 0x1F9DD),
]


def _flatten(ranges):
    starts, ends = [], []
    for a, b in ranges:
        starts.append(a)
        ends.append(b)
    return starts, ends


_TABLES = {
    name: _flatten(rng)
    for name, rng in [
        ("han", _HAN_RANGES), ("hiragana", _HIRAGANA_RANGES),
        ("katakana", _KATAKANA_RANGES), ("hangul", _HANGUL_RANGES),
        ("sa", _SA_RANGES), ("hebrew", _HEBREW_RANGES),
        ("extpict", _EXTPICT_RANGES), ("emb", _EMOJI_MOD_BASE_RANGES),
    ]
}


def _in(table: str, cp: int) -> bool:
    starts, ends = _TABLES[table]
    i = bisect.bisect_right(starts, cp) - 1
    return i >= 0 and cp <= ends[i]


@lru_cache(maxsize=None)
def classify(cp: int) -> int:
    """Word-break property bitmask for one codepoint."""
    ch = chr(cp)
    cat = _ud.category(ch)
    m = 0
    if cp == 0x200D:
        return ZWJ
    if cp == 0x0027:
        m |= SQ
    elif cp == 0x0022:
        m |= DQ
    if cp in _MIDLETTER_SET:
        m |= MIDLETTER
    if cp in _MIDNUM_SET:
        m |= MIDNUM
    if cp in _MIDNUMLET_SET:
        m |= MIDNUMLET
    if cat == "Nd" or cp == 0x066B:
        m |= NUMERIC
    if cat == "Pc" or cp == 0x202F:
        m |= ENL
    if 0x1F1E6 <= cp <= 0x1F1FF:
        return m | RI
    if 0x1F3FB <= cp <= 0x1F3FF:
        # Emoji modifiers are WB:Extend as well
        return m | EMOJI_MOD | EXTEND
    if cp == 0x23 or cp == 0x2A or 0x30 <= cp <= 0x39:
        m |= KEYCAPBASE
    if _in("extpict", cp):
        m |= EXTPICT
        if _in("emb", cp):
            m |= EMOJI_MOD_BASE
        return m
    # marks / format chars (combining closure)
    if cat in ("Mn", "Mc", "Me") or cp == 0x200C:
        m |= EXTEND
        # SEA combining marks are also Complex_Context
        if _in("sa", cp):
            m |= SA
        return m
    if cat == "Cf" and cp != 0x200B:
        return m | FORMAT
    # script classes
    if _in("han", cp):
        return m | HAN
    if _in("hiragana", cp):
        return m | HIRAGANA
    if _in("katakana", cp):
        return m | KATAKANA
    if _in("hangul", cp):
        # Hangul syllables/jamo are ALetter too (grammar intersects)
        return m | HANGUL | ALETTER
    if cat in ("Lo", "Lm", "Mn", "Mc") and _in("sa", cp):
        return m | SA
    if cat == "Lo" and _in("hebrew", cp):
        return m | HEBREW
    if cat in ("Lu", "Ll", "Lt", "Lm", "Lo", "Nl"):
        m |= ALETTER
    return m


def classify_str(s: str) -> list[int]:
    c = classify
    return [c(ord(ch)) for ch in s]


# --- Java-semantics per-codepoint lowercase --------------------------------
# Java's Character.toLowerCase(int) applies the *simple* lowercase mapping
# (one codepoint -> one codepoint). Python's str.lower() applies the full
# mapping; the cases where they differ by length are handled explicitly.
# (analysis/LowerCaseFilter.java:32-44 -> CharacterUtils.java:53-59)
_LOWER_EXCEPTIONS = {0x0130: "i"}  # LATIN CAPITAL LETTER I WITH DOT ABOVE


@lru_cache(maxsize=None)
def _lower_cp(ch: str) -> str:
    lo = ch.lower()
    if len(lo) != 1:
        return _LOWER_EXCEPTIONS.get(ord(ch), ch)
    return lo


def java_lowercase(s: str) -> str:
    """Per-codepoint lowercase with Java Character.toLowerCase semantics.

    Context-free: final sigma stays U+03C3, U+0130 maps to plain 'i'.
    """
    if s.isascii():
        return s.lower()
    lc = _lower_cp
    return "".join([lc(ch) for ch in s])
