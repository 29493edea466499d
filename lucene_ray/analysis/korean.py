"""Korean morphological analysis — the nori role.

Plays the part of ``lucene/analysis/nori`` (``KoreanTokenizer.java``):
the same Viterbi lattice engine as the Japanese module (the MeCab
algorithm is dictionary-agnostic; nori itself is kuromoji retargeted
at mecab-ko-dic), with a self-authored mini lexicon of common Korean
nouns, josa (particles), and verb endings so agglutinated eojeol like
서울에 split into 서울 + 에. The production mecab-ko-dic plugs in via
``load_dictionary`` (same CSV shape); it is not bundled (no network).

POS tags follow the mecab-ko convention: NNG (noun), JKS/JKO/JKB/JX
(particles), VV (verb), EF/EP (endings), SN (number).
"""

from __future__ import annotations

from .japanese import (JapaneseTokenizer, JaToken, char_class,
                       load_dictionary, ALPHA)

_ID_N, _ID_J, _ID_V, _ID_E = range(4)

MINI_LEXICON_KO = [
    *(f"{w},{_ID_N},{_ID_N},{c},NNG" for w, c in [
        ("한국", 3000), ("서울", 3000), ("학교", 3000), ("학생", 3000),
        ("사람", 3000), ("언어", 3200), ("음식", 3200), ("시간", 3200),
        ("한국어", 4000), ("어", 5500), ("김치", 3200), ("책", 4000),
        ("물", 4000), ("집", 4000), ("친구", 3200),
    ]),
    *(f"{w},{_ID_J},{_ID_J},{c},J" for w, c in [
        ("은", 2500), ("는", 2500), ("이", 2600), ("가", 2500),
        ("을", 2500), ("를", 2500), ("에", 2500), ("의", 2500),
        ("도", 2600), ("로", 2600), ("에서", 2700), ("와", 2600),
        ("과", 2600), ("부터", 2800), ("까지", 2800),
    ]),
    *(f"{w},{_ID_V},{_ID_V},{c},VV" for w, c in [
        ("가", 4200), ("먹", 4000), ("있", 4000), ("공부", 3800),
        ("만나", 4000), ("보", 4300),
    ]),
    *(f"{w},{_ID_E},{_ID_E},{c},E" for w, c in [
        ("다", 3200), ("요", 3200), ("습니다", 3000), ("ㅂ니다", 3400),
        ("었", 3400), ("는다", 3300), ("해요", 3200), ("했다", 3200),
    ]),
]

CONN_KO = {
    (_ID_N, _ID_J): -1800,   # noun + josa binds tightly
    (_ID_V, _ID_E): -2000,   # verb stem + ending
    (_ID_E, _ID_E): -800,
    (_ID_J, _ID_N): -400,
    (_ID_J, _ID_V): -400,
    (_ID_N, _ID_N): 1200,    # noun-noun adjacency pays a little
}


def mini_dictionary_ko():
    return load_dictionary(MINI_LEXICON_KO, CONN_KO, default_conn=0)


class KoreanTokenizer(JapaneseTokenizer):
    """nori's KoreanTokenizer role (decompound handling is the same
    search-mode penalty machinery as the Japanese path)."""

    def __init__(self, dictionary=None, mode: str = "search"):
        super().__init__(dictionary or mini_dictionary_ko(), mode)


class KoreanAnalyzer:
    """KoreanAnalyzer role: tokenize, drop particles/endings (the
    reference's default POS stop set includes J*/E*), lowercase latin."""

    STOP_POS = ("J", "E")

    def __init__(self, dictionary=None, mode: str = "search",
                 keep_particles: bool = False):
        self.tokenizer = KoreanTokenizer(dictionary, mode)
        self.keep_particles = keep_particles

    def __call__(self, text: str) -> list[str]:
        out = []
        for t in self.tokenizer.tokenize(text or ""):
            if t.surface.isspace() or not t.surface.strip():
                continue
            if not t.surface[0].isalnum():
                continue
            if not self.keep_particles and t.pos in self.STOP_POS:
                continue
            out.append(t.surface.lower()
                       if char_class(t.surface[0]) == ALPHA
                       and t.surface.isascii() else t.surface)
        return out

    def analyze_batch(self, texts) -> list[list[str]]:
        return [self(t) for t in texts]
