"""CJK bigram analysis (CJKBigramFilter / CJKAnalyzer analogs).

Reference semantics
(``lucene/analysis/common/src/java/org/apache/lucene/analysis/cjk/
CJKBigramFilter.java``, tests ``TestCJKBigramFilter.java``; analyzer
``cjk/CJKAnalyzer.java``):

* The StandardTokenizer emits Han and Hiragana as SINGLE-codepoint
  tokens and Katakana / Hangul as runs. The bigram filter buffers the
  codepoints of consecutive tokens whose type is enabled (han /
  hiragana / katakana / hangul — mixed-script bigrams form when both
  scripts are enabled) and emits every adjacent pair as one
  ``<DOUBLE>`` token.
* A buffered codepoint with no neighbor (an isolated CJK char between
  non-CJK tokens) is emitted as a ``<SINGLE>`` unigram even when
  ``output_unigrams`` is off.
* ``output_unigrams=True`` additionally emits every buffered codepoint
  as a unigram alongside the bigrams (the "index bigrams and unigrams"
  recall mode).
* Non-enabled tokens (ALPHANUM, NUM, ...) pass through unchanged in
  stream order.
"""

from __future__ import annotations

from .analyzer import DEFAULT_MAX_TOKEN_LENGTH
from .props import java_lowercase
from .tokenizer import HANGUL, HIRAGANA, IDEOGRAPHIC, KATAKANA, tokenize

ALL_SCRIPTS = frozenset({IDEOGRAPHIC, HIRAGANA, KATAKANA, HANGUL})


class CJKBigramFilter:
    """Token-type-aware bigrammer over a ``tokenize()`` Token stream.

    Operates on raw text (it needs token types, which the plain
    list-of-terms filter protocol drops): ``filter.terms(text)`` returns
    the final term list.
    """

    def __init__(self, scripts=ALL_SCRIPTS, output_unigrams: bool = False,
                 max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH):
        self.scripts = frozenset(scripts)
        self.output_unigrams = output_unigrams
        self.max_token_length = max_token_length

    def _flush(self, buf: list[str], out: list[str]) -> None:
        if not buf:
            return
        if len(buf) == 1:
            out.append(buf[0])  # isolated char -> SINGLE unigram
        elif self.output_unigrams:
            for i in range(len(buf) - 1):
                out.append(buf[i])
                out.append(buf[i] + buf[i + 1])
            out.append(buf[-1])
        else:
            out.extend(buf[i] + buf[i + 1] for i in range(len(buf) - 1))
        buf.clear()

    def terms(self, text: str) -> list[str]:
        out: list[str] = []
        buf: list[str] = []
        for tok in tokenize(text, self.max_token_length):
            if tok.type in self.scripts:
                buf.extend(tok.text)  # runs contribute every codepoint
            else:
                self._flush(buf, out)
                out.append(tok.text)
        self._flush(buf, out)
        return out


class CJKAnalyzer:
    """StandardTokenizer -> CJKBigramFilter(all scripts) -> lowercase ->
    stop filter (``cjk/CJKAnalyzer.java`` chain). Pluggable wherever the
    build accepts an analyzer (callable + ``analyze_batch`` +
    ``max_token_length``)."""

    def __init__(self, stop_words=frozenset(), output_unigrams: bool = False,
                 max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH):
        self.stop_words = frozenset(stop_words)
        self.max_token_length = max_token_length
        self._bigram = CJKBigramFilter(
            output_unigrams=output_unigrams, max_token_length=max_token_length)

    def __call__(self, text: str) -> list[str]:
        terms = [java_lowercase(t) for t in self._bigram.terms(text)]
        if self.stop_words:
            terms = [t for t in terms if t not in self.stop_words]
        return terms

    def analyze_batch(self, texts) -> list[list[str]]:
        return [self(t) if t is not None else [] for t in texts]
