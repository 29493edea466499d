"""Common miscellaneous token filters and char filters
(``lucene/analysis/common/src/java/org/apache/lucene/analysis/
{miscellaneous,util,tr,fr,pattern}``), on this repo's list-of-terms
filter protocol (``AnalyzerChain``): a filter is a picklable callable
``list[str] -> list[str]``; a char filter is ``str -> str`` and runs
before tokenization.

Each class documents its reference counterpart; semantics are
transcribed from the published javadoc/test behavior, not the code.
"""

from __future__ import annotations

import re
import unicodedata


class LengthFilter:
    """Keep tokens whose length is within [min_len, max_len]
    (``miscellaneous/LengthFilter.java``)."""

    def __init__(self, min_len: int = 0, max_len: int = 2 ** 31 - 1):
        assert 0 <= min_len <= max_len
        self.min_len, self.max_len = min_len, max_len

    def __call__(self, terms):
        return [t for t in terms if self.min_len <= len(t) <= self.max_len]


class TruncateTokenFilter:
    """Truncate tokens to a fixed length
    (``miscellaneous/TruncateTokenFilter.java``)."""

    def __init__(self, length: int = 10):
        assert length >= 1
        self.length = length

    def __call__(self, terms):
        return [t[:self.length] for t in terms]


class ReverseStringFilter:
    """Reverse each token (``reverse/ReverseStringFilter.java`` — the
    leading-wildcard-query support trick)."""

    def __call__(self, terms):
        return [t[::-1] for t in terms]


class DecimalDigitFilter:
    """Fold any Unicode decimal digit to ASCII 0-9
    (``core/DecimalDigitFilter.java``)."""

    def __call__(self, terms):
        out = []
        for t in terms:
            if t.isascii():
                out.append(t)
                continue
            out.append("".join(
                chr(ord("0") + unicodedata.digit(ch))
                if unicodedata.category(ch) == "Nd" else ch for ch in t))
        return out


class ApostropheFilter:
    """Strip everything from the first apostrophe on (``tr/
    ApostropheFilter.java`` — Turkish possessive suffixes)."""

    _APO = ("'", "’")

    def __call__(self, terms):
        out = []
        for t in terms:
            for a in self._APO:
                i = t.find(a)
                if i >= 0:
                    t = t[:i]
                    break
            if t:
                out.append(t)
        return out


class ElisionFilter:
    """Remove French-style elided articles (l', d', qu', ...) from the
    token head (``util/ElisionFilter.java``; FrenchAnalyzer's default
    article set)."""

    DEFAULT_ARTICLES = frozenset(
        ["l", "m", "t", "qu", "n", "s", "j", "d", "c", "jusqu", "quoiqu",
         "lorsqu", "puisqu"])

    def __init__(self, articles=DEFAULT_ARTICLES):
        self.articles = frozenset(a.lower() for a in articles)

    def __call__(self, terms):
        out = []
        for t in terms:
            for a in ("'", "’"):
                i = t.find(a)
                if i >= 0 and t[:i].lower() in self.articles:
                    t = t[i + 1:]
                    break
            if t:
                out.append(t)
        return out


class PatternReplaceFilter:
    """Regex replace inside each token
    (``pattern/PatternReplaceFilter.java``). ``all_occurrences=False``
    replaces only the first match, like the reference flag."""

    def __init__(self, pattern: str, replacement: str = "",
                 all_occurrences: bool = True):
        self.re = re.compile(pattern)
        self.replacement = replacement
        self.count = 0 if all_occurrences else 1

    def __call__(self, terms):
        return [self.re.sub(self.replacement, t, count=self.count)
                for t in terms]


class LimitTokenCountFilter:
    """Keep only the first ``max_token_count`` tokens
    (``miscellaneous/LimitTokenCountFilter.java``)."""

    def __init__(self, max_token_count: int):
        assert max_token_count >= 1
        self.max_token_count = max_token_count

    def __call__(self, terms):
        return terms[:self.max_token_count]


class KeywordRepeatStemFilter:
    """KeywordRepeatFilter + stemmer + RemoveDuplicatesTokenFilter
    composed (``miscellaneous/KeywordRepeatFilter.java``,
    ``RemoveDuplicatesTokenFilter.java``): each token emits its stem AND
    the original surface form (when the stem differs) — index both, so
    exact-form queries still match stemmed indexes."""

    def __init__(self, stem):
        self.stem = stem

    def __call__(self, terms):
        out = []
        for t in terms:
            s = self.stem(t)
            out.append(s)
            if s != t:
                out.append(t)
        return out


# --- char filters (run on raw text before tokenization) ---------------------


class MappingCharFilter:
    """Literal string substitutions on the raw text, longest match
    first (``charfilter/MappingCharFilter.java``)."""

    def __init__(self, mapping: dict[str, str]):
        self.mapping = dict(mapping)
        keys = sorted(self.mapping, key=len, reverse=True)
        self.re = re.compile("|".join(re.escape(k) for k in keys)) \
            if keys else None

    def __call__(self, text: str) -> str:
        if not self.re or not text:
            return text
        return self.re.sub(lambda m: self.mapping[m.group(0)], text)


class PatternReplaceCharFilter:
    """Regex replace on the raw text
    (``pattern/PatternReplaceCharFilter.java``)."""

    def __init__(self, pattern: str, replacement: str = ""):
        self.re = re.compile(pattern)
        self.replacement = replacement

    def __call__(self, text: str) -> str:
        return self.re.sub(self.replacement, text) if text else text


class FingerprintFilter:
    """Collapse the whole token stream into ONE sorted-deduped
    fingerprint token (``miscellaneous/FingerprintFilter.java`` — the
    near-duplicate-detection normalization Solr popularized).
    ``max_output_token_size`` guards pathological docs; streams longer
    than it emit nothing, like the reference."""

    def __init__(self, separator: str = " ",
                 max_output_token_size: int = 1024):
        self.separator = separator
        self.max_output_token_size = max_output_token_size

    def __call__(self, terms):
        if not terms:
            return []
        fp = self.separator.join(sorted(set(terms)))
        if len(fp) > self.max_output_token_size:
            return []
        return [fp]


class NFKCNormalizationFilter:
    """Unicode NFKC(-casefold) compatibility normalization — the
    ``analysis/icu`` ICUNormalizer2Filter role (full-width forms,
    ligatures, compatibility chars fold to canonical text) without the
    ICU dependency (stdlib unicodedata)."""

    def __init__(self, casefold: bool = False):
        self.casefold = casefold

    def __call__(self, terms):
        out = []
        for t in terms:
            n = unicodedata.normalize("NFKC", t)
            out.append(n.casefold() if self.casefold else n)
        return out


class CommonGramsFilter:
    """Bigram common words with their neighbors alongside the unigrams
    (``commongrams/CommonGramsFilter.java`` — the phrase-speedup trick
    for stopword-heavy phrases): for each adjacent pair where either
    side is a common word, also emit ``left_right``."""

    SEPARATOR = "_"

    def __init__(self, common_words):
        self.common = frozenset(common_words)

    def __call__(self, terms):
        out = []
        for i, t in enumerate(terms):
            out.append(t)
            if i + 1 < len(terms) and (t in self.common
                                       or terms[i + 1] in self.common):
                out.append(t + self.SEPARATOR + terms[i + 1])
        return out
