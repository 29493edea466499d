"""Porter stemmer — the classic 1980 algorithm (M.F. Porter, "An
algorithm for suffix stripping", Program 14(3), public domain spec),
conformant to the reference's golden vocabulary
(``analysis/common/src/test/.../en/porterTestData.zip``: 23k
voc.txt -> output.txt pairs; filter analog
``analysis/common/src/java/.../en/PorterStemFilter.java``).

Implemented from the published algorithm description, not the Java
source.
"""

from __future__ import annotations

_VOWELS = set("aeiou")


def _is_cons(w: str, i: int) -> bool:
    c = w[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return i == 0 or not _is_cons(w, i - 1)
    return True


def _measure(stem: str) -> int:
    """Number of VC sequences: [C](VC){m}[V]."""
    m = 0
    i = 0
    n = len(stem)
    while i < n and _is_cons(stem, i):
        i += 1
    while True:
        while i < n and not _is_cons(stem, i):
            i += 1
        if i >= n:
            return m
        m += 1
        while i < n and _is_cons(stem, i):
            i += 1
        if i >= n:
            return m


def _has_vowel(stem: str) -> bool:
    return any(not _is_cons(stem, i) for i in range(len(stem)))


def _ends_double_cons(w: str) -> bool:
    return (len(w) >= 2 and w[-1] == w[-2] and _is_cons(w, len(w) - 1))


def _cvc(w: str) -> bool:
    """*o: stem ends cvc where the final c is not w, x or y."""
    if len(w) < 3:
        return False
    return (_is_cons(w, len(w) - 3) and not _is_cons(w, len(w) - 2)
            and _is_cons(w, len(w) - 1) and w[-1] not in "wxy")


def porter_stem(word: str) -> str:
    w = word
    if len(w) <= 2:
        return w

    # Step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]

    # Step 1b
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    else:
        flag = False
        if w.endswith("ed") and _has_vowel(w[:-2]):
            w = w[:-2]
            flag = True
        elif w.endswith("ing") and _has_vowel(w[:-3]):
            w = w[:-3]
            flag = True
        if flag:
            if w.endswith(("at", "bl", "iz")):
                w = w + "e"
            elif _ends_double_cons(w) and w[-1] not in "lsz":
                w = w[:-1]
            elif _measure(w) == 1 and _cvc(w):
                w = w + "e"

    # Step 1c
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"

    # Step 2 (m > 0)
    _STEP2 = [
        ("ational", "ate"), ("tional", "tion"), ("enci", "ence"),
        ("anci", "ance"), ("izer", "ize"), ("bli", "ble"), ("alli", "al"),
        ("entli", "ent"), ("eli", "e"), ("ousli", "ous"), ("ization", "ize"),
        ("ation", "ate"), ("ator", "ate"), ("alism", "al"),
        ("iveness", "ive"), ("fulness", "ful"), ("ousness", "ous"),
        ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble"), ("logi", "log"),
    ]
    for suf, rep in _STEP2:
        if w.endswith(suf):
            if _measure(w[:-len(suf)]) > 0:
                w = w[:-len(suf)] + rep
            break

    # Step 3 (m > 0)
    _STEP3 = [
        ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
        ("ical", "ic"), ("ful", ""), ("ness", ""),
    ]
    for suf, rep in _STEP3:
        if w.endswith(suf):
            if _measure(w[:-len(suf)]) > 0:
                w = w[:-len(suf)] + rep
            break

    # Step 4 (m > 1)
    _STEP4 = ["al", "ance", "ence", "er", "ic", "able", "ible", "ant",
              "ement", "ment", "ent", "ion", "ou", "ism", "ate", "iti",
              "ous", "ive", "ize"]
    for suf in sorted(_STEP4, key=len, reverse=True):
        if w.endswith(suf):
            stem = w[:-len(suf)]
            if suf == "ion" and not (stem and stem[-1] in "st"):
                continue
            if _measure(stem) > 1:
                w = stem
            break

    # Step 5a
    if w.endswith("e"):
        m = _measure(w[:-1])
        if m > 1 or (m == 1 and not _cvc(w[:-1])):
            w = w[:-1]

    # Step 5b (m > 1, ends ll -> single l)
    if _measure(w) > 1 and w.endswith("ll"):
        w = w[:-1]

    return w


class PorterStemFilter:
    """Token filter: term -> porter_stem(term) (PorterStemFilter.java
    analog). Compose with any analyzer callable."""

    def __call__(self, terms):
        return [porter_stem(t) for t in terms]


class EnglishAnalyzer:
    """StandardAnalyzer + PorterStemFilter preset — the Analyzer hook's
    first shipped extension (SURVEY §2.10; ``analysis/en``)."""

    def __init__(self, stop_words=frozenset()):
        from .analyzer import StandardAnalyzer
        self._std = StandardAnalyzer(stop_words=stop_words)
        self.stop_words = stop_words
        self.max_token_length = self._std.max_token_length

    def __call__(self, text: str):
        return [porter_stem(t) for t in self._std(text)]

    def analyze_batch(self, texts):
        return [self(t or "") for t in texts]


class NGramFilter:
    """Token filter: emit all n-grams of each term for min_gram <=
    n <= max_gram (``analysis/common/.../ngram/NGramTokenFilter.java``
    semantics: grams in order of start offset, then length)."""

    def __init__(self, min_gram: int = 2, max_gram: int = 3,
                 preserve_original: bool = False):
        assert 1 <= min_gram <= max_gram
        self.min_gram, self.max_gram = min_gram, max_gram
        self.preserve_original = preserve_original

    def __call__(self, terms):
        out = []
        for t in terms:
            n = len(t)
            if self.preserve_original and (n < self.min_gram
                                           or n > self.max_gram):
                out.append(t)
            for start in range(n):
                for g in range(self.min_gram,
                               min(self.max_gram, n - start) + 1):
                    out.append(t[start:start + g])
        return out


class EdgeNGramFilter:
    """Token filter: emit the leading edge n-grams of each term for
    min_gram <= n <= min(max_gram, len) — the search-as-you-type
    staple (``analysis/common/.../ngram/EdgeNGramTokenFilter.java:33``
    semantics: grams in increasing length, all at the token's position;
    ``preserve_original`` keeps terms whose codepoint length falls
    outside [min_gram, max_gram]). Python ``len``/slicing already
    counts codepoints, matching Java's codePointCount/offsetByCodePoints
    handling of supplementary characters."""

    def __init__(self, min_gram: int = 1, max_gram: int = 2,
                 preserve_original: bool = False):
        if min_gram < 1:
            raise ValueError("minGram must be greater than zero")
        if min_gram > max_gram:
            raise ValueError("minGram must not be greater than maxGram")
        self.min_gram, self.max_gram = min_gram, max_gram
        self.preserve_original = preserve_original

    def __call__(self, terms):
        out = []
        for t in terms:
            n = len(t)
            if self.preserve_original and n < self.min_gram:
                out.append(t)
                continue
            for g in range(self.min_gram, min(self.max_gram, n) + 1):
                out.append(t[:g])
            if self.preserve_original and n > self.max_gram:
                out.append(t)
        return out


class SynonymFilter:
    """Token filter: expand terms by a synonym map
    (``analysis/common/.../synonym/SynonymGraphFilter.java`` role,
    single-token expand mode: the original term plus its synonyms)."""

    def __init__(self, synonyms: dict):
        # normalize: every member of a group maps to the full group
        self.map = {k: tuple(v) for k, v in synonyms.items()}

    def __call__(self, terms):
        out = []
        for t in terms:
            out.append(t)
            out.extend(self.map.get(t, ()))
        return out


class AnalyzerChain:
    """Composable analysis chain: char filters -> StandardAnalyzer ->
    token filters, in order (Analyzer.createComponents role: the
    CharFilter slot runs on raw text BEFORE tokenization —
    ``analysis/CharFilter.java``). Pluggable into build_index via the
    ``analyzer`` hook."""

    def __init__(self, *filters, stop_words=frozenset(), char_filters=()):
        from .analyzer import StandardAnalyzer
        self._std = StandardAnalyzer(stop_words=stop_words)
        self.filters = filters
        self.char_filters = tuple(char_filters)
        self.stop_words = stop_words
        self.max_token_length = self._std.max_token_length

    def __call__(self, text):
        for cf in self.char_filters:
            text = cf(text)
        terms = self._std(text)
        for f in self.filters:
            terms = f(terms)
        return terms

    def analyze_batch(self, texts):
        return [self(t if t is not None else "") for t in texts]


class ShingleFilter:
    """Word-shingle token filter
    (``analysis/common/.../shingle/ShingleFilter.java`` semantics,
    flattened to the list protocol: at each token position emit the
    unigram (if ``output_unigrams``) followed by each shingle of size
    ``min_shingle..max_shingle`` starting there, tokens joined by
    ``token_separator``; trailing windows shorter than min_shingle
    emit nothing). The phrase-speedup / common-grams role."""

    def __init__(self, min_shingle: int = 2, max_shingle: int = 2,
                 token_separator: str = "_",
                 output_unigrams: bool = True):
        assert 2 <= min_shingle <= max_shingle
        self.min_shingle = min_shingle
        self.max_shingle = max_shingle
        self.sep = token_separator
        self.output_unigrams = output_unigrams

    def __call__(self, terms):
        out = []
        n = len(terms)
        for i in range(n):
            if self.output_unigrams:
                out.append(terms[i])
            for size in range(self.min_shingle, self.max_shingle + 1):
                if i + size <= n:
                    out.append(self.sep.join(terms[i:i + size]))
        return out
