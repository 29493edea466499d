"""ICU analysis roles: folding, normalization, script runs.

Plays the part of the reference's ``lucene/analysis/icu`` module:

* ``ICUFoldingFilter`` (UTR#30 foldings): implemented as
  NFKC → Unicode case fold → NFD → strip combining marks → NFC via
  the stdlib ``unicodedata``. This covers the big UTR#30 classes —
  accent removal, case folding, canonical duplicates, width folding
  (full-width→ASCII via NFKC), Greek final sigma, German ß→ss — and
  is documented as an approximation of ICU's table-driven foldings
  (the exotic classes like Hebrew alternates differ).
* ``ICUNormalizer2Filter`` (nfkc_cf mode): NFKC + case fold.
* ``script_runs`` (ICUTokenizer's script-boundary segmentation,
  ``ICUTokenizer.java:40``): splits text into maximal same-script
  runs (Common/Inherited attach to the active run, as in UAX#24 run
  resolution) so per-script tokenizers can compose. Dictionary-based
  Thai/Khmer/Lao word breaking is out of scope (needs the ICU break
  dictionaries) and documented as such.

All pieces are plain callables pluggable into ``AnalyzerChain`` /
``build_index(analyzer=)`` and picklable for actor-pool stages.
"""

from __future__ import annotations

import unicodedata


def icu_fold(s: str) -> str:
    """UTR#30-style folding: width/compat fold (NFKC), case fold,
    diacritic removal (NFD -> drop Mn -> NFC)."""
    s = unicodedata.normalize("NFKC", s).casefold()
    s = unicodedata.normalize("NFD", s)
    s = "".join(c for c in s if unicodedata.category(c) != "Mn")
    return unicodedata.normalize("NFC", s)


def nfkc_cf(s: str) -> str:
    """ICU nfkc_cf normalizer (ICUNormalizer2Filter default mode)."""
    return unicodedata.normalize(
        "NFKC", unicodedata.normalize("NFKC", s).casefold())


class ICUFoldingFilter:
    """Token filter: fold every token (drops tokens that fold away)."""

    def __call__(self, tokens: list[str]) -> list[str]:
        out = []
        for t in tokens:
            f = icu_fold(t)
            if f:
                out.append(f)
        return out


class ICUNormalizer2Filter:
    def __call__(self, tokens: list[str]) -> list[str]:
        return [x for x in (nfkc_cf(t) for t in tokens) if x]


def _script(c: str) -> str:
    """Coarse script bucket via unicodedata (enough for run
    segmentation): LATIN/GREEK/CYRILLIC/HAN/HIRAGANA/KATAKANA/HANGUL/
    ARABIC/HEBREW/THAI/DEVANAGARI/COMMON."""
    o = ord(c)
    for lo, hi, name in _RANGES:
        if lo <= o <= hi:
            return name
    if c.isalpha():
        try:
            n = unicodedata.name(c)
        except ValueError:
            return "COMMON"
        return n.split(" ")[0]
    return "COMMON"


_RANGES = [
    (0x0041, 0x024F, "LATIN"), (0x0370, 0x03FF, "GREEK"),
    (0x0400, 0x04FF, "CYRILLIC"), (0x0590, 0x05FF, "HEBREW"),
    (0x0600, 0x06FF, "ARABIC"), (0x0900, 0x097F, "DEVANAGARI"),
    (0x0E00, 0x0E7F, "THAI"), (0x3040, 0x309F, "HIRAGANA"),
    (0x30A0, 0x30FF, "KATAKANA"), (0x4E00, 0x9FFF, "HAN"),
    (0x3400, 0x4DBF, "HAN"), (0xAC00, 0xD7AF, "HANGUL"),
    (0x1100, 0x11FF, "HANGUL"),
]


class ScriptRoutingAnalyzer:
    """ICUTokenizer's per-script delegation, composed end-to-end:
    text splits into script runs, each run goes to its script's
    analyzer — HAN → the smartcn-role lattice, HIRAGANA/KATAKANA →
    the kuromoji-role lattice, HANGUL → the nori-role lattice,
    everything else → StandardAnalyzer + ICU folding. The Lucene
    equivalent is wiring ICUTokenizer's per-script break iterators;
    here each run reuses the language modules directly."""

    def __init__(self, stop_words=frozenset()):
        from .analyzer import StandardAnalyzer
        from .chinese import ChineseAnalyzer
        from .japanese import JapaneseAnalyzer
        from .korean import KoreanAnalyzer
        self._zh = ChineseAnalyzer()
        self._ja = JapaneseAnalyzer()
        self._ko = KoreanAnalyzer()
        self._std = StandardAnalyzer(stop_words=stop_words)
        self._fold = ICUFoldingFilter()

    def __call__(self, text: str) -> list[str]:
        # coalesce adjacent HAN/kana runs: interleaved kanji+kana IS
        # Japanese (ICU's break rules treat the Japanese orthography as
        # one context); a kana-free HAN stretch routes to Chinese
        runs = script_runs(text or "")
        merged: list[tuple[int, int, str]] = []
        for a, b, script in runs:
            if merged and script in ("HAN", "HIRAGANA", "KATAKANA") \
                    and merged[-1][2] in ("HAN", "HIRAGANA", "KATAKANA",
                                          "CJK"):
                pa_, _, ps = merged[-1]
                has_kana = bool({script, ps} & {"HIRAGANA", "KATAKANA"}) \
                    or ps == "CJK"
                merged[-1] = (pa_, b, "CJK" if has_kana else "HAN")
            else:
                merged.append((a, b, script))
        out: list[str] = []
        for a, b, script in merged:
            run = text[a:b]
            if script == "HAN":
                out.extend(self._zh(run))
            elif script in ("HIRAGANA", "KATAKANA", "CJK"):
                out.extend(self._ja(run))
            elif script == "HANGUL":
                out.extend(self._ko(run))
            else:
                out.extend(self._fold(self._std(run)))
        return out

    def analyze_batch(self, texts) -> list[list[str]]:
        return [self(t) for t in texts]


def script_runs(text: str) -> list[tuple[int, int, str]]:
    """Maximal same-script runs as (start, end, script). COMMON
    characters (digits, punctuation, spaces) extend the active run
    when surrounded by it, else form their own COMMON runs — the
    UAX#24 run-resolution rule ICUTokenizer applies before handing
    each run to its per-script breaker."""
    if not text:
        return []
    runs: list[list] = []
    cur_script = None
    start = 0
    for i, c in enumerate(text):
        sc = _script(c)
        if cur_script is None:
            cur_script = sc
            continue
        if sc == cur_script or sc == "COMMON":
            continue
        if cur_script == "COMMON":
            cur_script = sc  # run inherits the first real script
            continue
        runs.append([start, i, cur_script])
        start, cur_script = i, sc
    runs.append([start, len(text), cur_script or "COMMON"])
    return [(a, b, s) for a, b, s in runs]
