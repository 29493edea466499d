"""Chinese word segmentation — the smartcn role.

Plays the part of ``lucene/analysis/smartcn`` (``HMMChineseTokenizer``):
dictionary-driven lattice segmentation of Han text. smartcn's hidden
Markov bigram model is the same shortest-path-over-a-word-lattice
formulation the shared Viterbi engine implements (word costs stand in
for emission probabilities, connection costs for transitions), so this
module is a dictionary + analyzer wrapper over
``analysis.japanese.JapaneseTokenizer`` — the engine is script- and
language-agnostic. A production bigram dictionary plugs in via
``load_dictionary``; a self-authored mini lexicon ships for tests.

Out-of-lexicon Han runs fall back to per-character tokens (the kanji
unknown-word class), which is also smartcn's single-char fallback.
"""

from __future__ import annotations

from .japanese import JapaneseTokenizer, char_class, load_dictionary, ALPHA

_ID_W = 0  # one context class: smartcn's transitions are bigram-global

MINI_LEXICON_ZH = [
    *(f"{w},{_ID_W},{_ID_W},{c},WORD" for w, c in [
        ("中国", 3000), ("北京", 3000), ("上海", 3000), ("大学", 3200),
        ("学生", 3200), ("中文", 3300), ("我们", 3000), ("喜欢", 3400),
        ("学习", 3300), ("语言", 3400), ("北京大学", 5000),
        ("人民", 3300), ("共和国", 4200), ("中华", 3600),
        ("中华人民共和国", 9000), ("朋友", 3300), ("吃饭", 3500),
        ("今天", 3200), ("天气", 3400), ("很好", 3600), ("好", 4800),
        ("很", 4800), ("的", 2500), ("了", 2600), ("是", 2800),
        ("在", 2800), ("和", 2900),
    ]),
]


def mini_dictionary_zh():
    return load_dictionary(MINI_LEXICON_ZH, {}, default_conn=0)


class ChineseTokenizer(JapaneseTokenizer):
    """smartcn's HMMChineseTokenizer role. ``mode="search"`` splits
    long lexicalized compounds (中华人民共和国 -> 中华/人民/共和国)
    exactly like the CJK search-mode penalty path."""

    def __init__(self, dictionary=None, mode: str = "search"):
        super().__init__(dictionary or mini_dictionary_zh(), mode)


class ChineseAnalyzer:
    """SmartChineseAnalyzer role: segment, drop stop function words
    (的/了/是/在/和 by POS-free surface membership, matching smartcn's
    stopword handling), lowercase latin runs."""

    STOP_WORDS = frozenset("的 了 是 在 和 很".split())

    def __init__(self, dictionary=None, mode: str = "search",
                 stop_words=None):
        self.tokenizer = ChineseTokenizer(dictionary, mode)
        self.stop_words = (self.STOP_WORDS if stop_words is None
                           else frozenset(stop_words))

    def __call__(self, text: str) -> list[str]:
        out = []
        for t in self.tokenizer.tokenize(text or ""):
            s = t.surface
            if not s.strip() or not s[0].isalnum():
                continue
            if s in self.stop_words:
                continue
            out.append(s.lower() if char_class(s[0]) == ALPHA
                       and s.isascii() else s)
        return out

    def analyze_batch(self, texts) -> list[list[str]]:
        return [self(t) for t in texts]
