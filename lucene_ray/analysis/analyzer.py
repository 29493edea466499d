"""StandardAnalyzer-equivalent analysis chain.

Pipeline = StandardTokenizer -> LowerCaseFilter -> StopFilter, per
``lucene/core/src/java/org/apache/lucene/analysis/standard/
StandardAnalyzer.java:85-96``. The default stop set is EMPTY
(``StandardAnalyzer.java:51-53``); the classic 33-word English list
(``lucene/analysis/common/.../en/EnglishAnalyzer.java:43-54``) is
exported as ``ENGLISH_STOP_WORDS``.

StopFilter adds the number of removed tokens to the next token's
position increment (``FilteringTokenFilter.java:49-58``).
"""

from __future__ import annotations

from typing import NamedTuple

from .props import java_lowercase
from .tokenizer import DEFAULT_MAX_TOKEN_LENGTH, tokenize, tokenize_texts_ascii

ENGLISH_STOP_WORDS = frozenset(
    "a an and are as at be but by for if in into is it no not of on or such "
    "that the their then there these they this to was will with".split()
)


class AnalyzedToken(NamedTuple):
    term: str
    position: int  # absolute token position (posInc bookkeeping applied)
    start: int
    end: int


class StandardAnalyzer:
    """Callable analysis chain: ``analyzer(text) -> list[str]``.

    Stateless and picklable; build once per actor (``__init__`` of a
    map_batches class), reuse per batch.
    """

    def __init__(self, stop_words=frozenset(), max_token_length=DEFAULT_MAX_TOKEN_LENGTH):
        self.stop_words = frozenset(stop_words)
        self.max_token_length = max_token_length

    def tokens(self, text: str) -> list[AnalyzedToken]:
        """Full attribute stream (term, position, offsets)."""
        out = []
        pos = -1
        stop = self.stop_words
        for tok in tokenize(text, self.max_token_length):
            term = java_lowercase(tok.text)
            pos += 1
            if term in stop:
                continue
            out.append(AnalyzedToken(term, pos, tok.start, tok.end))
        return out

    def __call__(self, text: str) -> list[str]:
        """Term strings only (the indexing hot path)."""
        stop = self.stop_words
        if text.isascii():
            # lowercasing the whole string first is equivalent on ASCII
            # (case never affects ASCII token boundaries) and avoids a
            # per-token .lower() call
            terms = tokenize_texts_ascii([text.lower()])[0]
            if len(text) > self.max_token_length and \
                    max(map(len, terms), default=0) > self.max_token_length:
                # an over-long token exists; redo with buffer-split rules
                terms = [
                    java_lowercase(t.text)
                    for t in tokenize(text, self.max_token_length)
                ]
        else:
            terms = self._analyze_mixed(text)
        if stop:
            terms = [t for t in terms if t not in stop]
        return terms

    def _analyze_mixed(self, text: str) -> list[str]:
        """Mostly-ASCII text with Unicode spans: split on ASCII spaces (a
        space can never be inside any token — no word-break rule spans
        one), run the regex fast path on ASCII fragments and the full
        scanner only on fragments that need it."""
        mtl = self.max_token_length
        terms: list[str] = []
        for part in text.split(" "):
            if not part:
                continue
            if part.isascii():
                sub = tokenize_texts_ascii([part.lower()])[0]
                if len(part) > mtl and max(map(len, sub), default=0) > mtl:
                    sub = [java_lowercase(t.text) for t in tokenize(part, mtl)]
                terms.extend(sub)
            else:
                terms.extend(java_lowercase(t.text)
                             for t in tokenize(part, mtl))
        return terms

    def analyze_batch(self, texts) -> list[list[str]]:
        """Vectorized-ish batch analysis; ASCII fast path in bulk."""
        stop = self.stop_words
        mtl = self.max_token_length
        out: list[list[str]] = []
        for text in texts:
            if text is None:
                out.append([])
                continue
            out.append(self(text))
        return out


class KeywordAnalyzer:
    """Whole-value-as-one-token analyzer (``analysis/core/
    KeywordAnalyzer.java``): for id/keyword fields (url, lang, source)
    where the stored value IS the term. Callable + picklable like
    StandardAnalyzer."""

    stop_words: frozenset = frozenset()
    max_token_length = 32766  # IndexWriter.MAX_TERM_LENGTH-ish

    def __call__(self, text: str) -> list:
        return [text] if text else []

    def analyze_batch(self, texts):
        return [self(t or "") for t in texts]

    def tokens(self, text: str):
        from .analyzer import AnalyzedToken
        return ([AnalyzedToken(text, 0, 0, len(text))] if text else [])


class WhitespaceAnalyzer:
    """Split on Unicode whitespace, no case folding
    (``analysis/core/WhitespaceAnalyzer.java`` /
    ``WhitespaceTokenizer.java``)."""

    def __init__(self, max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH):
        self.max_token_length = max_token_length
        self.stop_words = frozenset()

    def __call__(self, text: str) -> list[str]:
        return [t for t in (text or "").split()
                if len(t) <= self.max_token_length]

    def analyze_batch(self, texts) -> list[list[str]]:
        return [self(t) if t is not None else [] for t in texts]


class SimpleAnalyzer:
    """Maximal letter runs, lowercased — LetterTokenizer + LowerCase
    (``analysis/core/SimpleAnalyzer.java``)."""

    def __init__(self, max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH):
        self.max_token_length = max_token_length
        self.stop_words = frozenset()

    def __call__(self, text: str) -> list[str]:
        out = []
        cur = []
        for ch in (text or ""):
            if ch.isalpha():
                cur.append(ch)
            elif cur:
                out.append("".join(cur))
                cur = []
        if cur:
            out.append("".join(cur))
        return [java_lowercase(t) for t in out
                if len(t) <= self.max_token_length]

    def analyze_batch(self, texts) -> list[list[str]]:
        return [self(t) if t is not None else [] for t in texts]


class StopAnalyzer:
    """SimpleAnalyzer + stop filter
    (``analysis/core/StopAnalyzer.java``; the reference takes the stop
    set as a constructor argument since 9.x)."""

    def __init__(self, stop_words,
                 max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH):
        self._inner = SimpleAnalyzer(max_token_length)
        self.stop_words = frozenset(stop_words)
        self.max_token_length = max_token_length

    def __call__(self, text: str) -> list[str]:
        return [t for t in self._inner(text) if t not in self.stop_words]

    def analyze_batch(self, texts) -> list[list[str]]:
        return [self(t) if t is not None else [] for t in texts]
