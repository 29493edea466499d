"""N-gram TOKENIZERS (raw text -> grams), distinct from the token
FILTERS in ``stemmer.py``: ``analysis/common/.../ngram/NGramTokenizer
.java:62`` (grams emitted by increasing start offset then length,
codepoint-counted, never splitting surrogate pairs — Python strings
are codepoint sequences so both hold by construction) and
``EdgeNGramTokenizer.java`` (leading-edge grams only). An optional
``is_token_char`` predicate pre-tokenizes the stream (isTokenChar
role): grams never cross a non-token char, and edge grams start at
each token run's first char. Offsets are in codepoints (repo-wide
convention; Java reports UTF-16 units — identical for BMP text)."""

from __future__ import annotations

from dataclasses import dataclass

DEFAULT_MIN_NGRAM_SIZE = 1
DEFAULT_MAX_NGRAM_SIZE = 2


@dataclass(frozen=True)
class GramToken:
    term: str
    start: int
    end: int


def _runs(text: str, pred):
    if pred is None:
        return [(0, len(text))] if text else []
    runs = []
    i, n = 0, len(text)
    while i < n:
        if pred(text[i]):
            j = i
            while j < n and pred(text[j]):
                j += 1
            runs.append((i, j))
            i = j
        else:
            i += 1
    return runs


class NGramTokenizer:
    def __init__(self, min_gram: int = DEFAULT_MIN_NGRAM_SIZE,
                 max_gram: int = DEFAULT_MAX_NGRAM_SIZE,
                 is_token_char=None, edges_only: bool = False):
        if min_gram < 1:
            raise ValueError("minGram must be greater than zero")
        if min_gram > max_gram:
            raise ValueError("minGram must not be greater than maxGram")
        self.min_gram, self.max_gram = min_gram, max_gram
        self.is_token_char = is_token_char
        self.edges_only = edges_only

    def tokenize(self, text: str) -> list[GramToken]:
        out = []
        for lo, hi in _runs(text, self.is_token_char):
            starts = (lo,) if self.edges_only else range(lo, hi)
            for s in starts:
                for g in range(self.min_gram, self.max_gram + 1):
                    if s + g > hi:
                        break
                    out.append(GramToken(text[s:s + g], s, s + g))
        return out

    def __call__(self, text: str) -> list[str]:
        return [t.term for t in self.tokenize(text)]


class EdgeNGramTokenizer(NGramTokenizer):
    """Leading-edge grams only (``EdgeNGramTokenizer.java``)."""

    DEFAULT_MAX_GRAM_SIZE = 1
    DEFAULT_MIN_GRAM_SIZE = 1

    def __init__(self, min_gram: int = 1, max_gram: int = 1,
                 is_token_char=None):
        super().__init__(min_gram, max_gram, is_token_char,
                         edges_only=True)
