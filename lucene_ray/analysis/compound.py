"""Compound-word decomposition — the ``analysis/compound`` package
roles (``CompoundWordTokenFilterBase.java``,
``DictionaryCompoundWordTokenFilter.java``,
``HyphenationCompoundWordTokenFilter.java``, tests
``TestCompoundWordTokenFilter.java``), plus Liang's pattern
hyphenation (``compound/hyphenation/HyphenationTree.java`` — the
algorithm is F. M. Liang's 1983 TeX hyphenation, public knowledge;
this implementation is written from the published algorithm, not the
Java).

Filters follow this package's convention (callable over a term list):
the original token is emitted first, its subwords directly after it —
the reference emits subwords at positionIncrement 0 with the original
word's offsets.
"""

from __future__ import annotations

DEFAULT_MIN_WORD_SIZE = 5
DEFAULT_MIN_SUBWORD_SIZE = 2
DEFAULT_MAX_SUBWORD_SIZE = 15


class HyphenationTree:
    """Liang pattern hyphenation: patterns like ``"hy3ph"`` assign
    interletter digit weights; a word (wrapped in '.') takes the MAX
    weight per gap over all matching pattern windows; gaps with ODD
    final weight are hyphenation points. ``hyphenate`` returns the
    reference's point array shape: ``[0, p1, .., pn, len]`` or None
    when no interior point survives (remain/push char margins
    excluded, exceptions applied first)."""

    def __init__(self, patterns, exceptions=()):
        self.classmap: dict[str, str] = {}  # char normalization classes
        self.pat: dict[str, tuple[int, ...]] = {}
        self._max_pat = 1
        for p in patterns:
            letters, values = self._parse(p)
            self.pat[letters] = values
            if len(letters) > self._max_pat:
                self._max_pat = len(letters)
        # exceptions: "as-so-ciate" style -> explicit points
        self.exc: dict[str, list[int]] = {}
        for e in exceptions:
            parts = e.split("-")
            word = "".join(parts)
            pts, acc = [], 0
            for seg in parts[:-1]:
                acc += len(seg)
                pts.append(acc)
            self.exc[word.lower()] = pts

    @staticmethod
    def _parse(pattern: str):
        letters = []
        values = [0]
        saw_digit = False
        for ch in pattern:
            if ch.isdigit():
                values[-1] = int(ch)
                saw_digit = True
            else:
                letters.append(ch)
                values.append(0)
                saw_digit = False
        del saw_digit
        return "".join(letters), tuple(values)

    def hyphenate(self, word: str, remain: int = 1, push: int = 1):
        n = len(word)
        low = word.lower()
        if self.classmap:
            low = "".join(self.classmap.get(c, c) for c in low)
        if low in self.exc:
            pts = [p for p in self.exc[low]
                   if remain <= p <= n - push]
        else:
            w = "." + low + "."
            il = [0] * (len(w) + 1)  # interletter weights
            for i in range(len(w)):
                for j in range(i + 1, min(i + self._max_pat, len(w)) + 1):
                    vals = self.pat.get(w[i:j])
                    if vals is None:
                        continue
                    for k, v in enumerate(vals):
                        if v > il[i + k]:
                            il[i + k] = v
            # gap g (between word[g-1] and word[g]) = il index g + 1
            pts = [g for g in range(1, n)
                   if il[g + 1] % 2 == 1 and remain <= g <= n - push]
        if not pts:
            return None
        return [0] + pts + [n]


def parse_fop_xml(path: str) -> HyphenationTree:
    """Parse a FOP/OFFO hyphenation pattern file (the
    ``hyphenation.dtd`` format ``PatternParser.java`` reads):
    ``<classes>`` char-normalization groups (first char of a group is
    the normal form), ``<patterns>`` whitespace-separated Liang
    patterns, optional ``<exceptions>`` hyphenated words."""
    import re
    import xml.etree.ElementTree as ET

    with open(path, encoding="utf-8") as f:
        content = f.read()
    # the DOCTYPE references a local DTD; strip it for ElementTree
    content = re.sub(r"<!DOCTYPE[^>]*>", "", content)
    root = ET.fromstring(content)
    classmap: dict[str, str] = {}
    cl = root.find("classes")
    if cl is not None and cl.text:
        for group in cl.text.split():
            for ch in group:
                classmap[ch] = group[0]
    pats: list[str] = []
    pt = root.find("patterns")
    if pt is not None and pt.text:
        pats = pt.text.split()
    exc: list[str] = []
    ex = root.find("exceptions")
    if ex is not None and ex.text:
        exc = ex.text.split()
    tree = HyphenationTree(pats, exc)
    tree.classmap = classmap
    return tree


class DictionaryCompoundWordTokenFilter:
    """Brute-force Germanic decompounder: every dictionary subword of
    length [min_subword_size, max_subword_size] found anywhere inside
    a token of length >= min_word_size is emitted after it;
    ``only_longest_match`` keeps only the longest match per start
    offset (DictionaryCompoundWordTokenFilter.decompose)."""

    def __init__(self, dictionary,
                 min_word_size: int = DEFAULT_MIN_WORD_SIZE,
                 min_subword_size: int = DEFAULT_MIN_SUBWORD_SIZE,
                 max_subword_size: int = DEFAULT_MAX_SUBWORD_SIZE,
                 only_longest_match: bool = False):
        if dictionary is None:
            raise ValueError("dictionary must not be null")
        self.dict = frozenset(w.lower() for w in dictionary)
        self.min_word = min_word_size
        self.min_sub = min_subword_size
        self.max_sub = max_subword_size
        self.longest = only_longest_match

    def _decompose(self, term: str) -> list[str]:
        low = term.lower()
        n = len(low)
        out = []
        for i in range(0, n - self.min_sub + 1):
            longest = None
            for j in range(self.min_sub, self.max_sub + 1):
                if i + j > n:
                    break
                if low[i:i + j] in self.dict:
                    if self.longest:
                        if longest is None or len(longest) < j:
                            longest = term[i:i + j]
                    else:
                        out.append(term[i:i + j])
            if self.longest and longest is not None:
                out.append(longest)
        return out

    def __call__(self, terms):
        out = []
        for t in terms:
            out.append(t)
            if len(t) >= self.min_word:
                out.extend(self._decompose(t))
        return out


class HyphenationCompoundWordTokenFilter:
    """Decompound along hyphenation points
    (HyphenationCompoundWordTokenFilter.decompose): candidate subwords
    span hyphenation points, longest-first per start point; with a
    dictionary only dictionary words (or the word minus a final
    binding character) survive; without one, every point-to-point
    part in the size window is emitted. ``no_sub_matches`` /
    ``no_overlapping_matches`` reproduce the reference's consumed-
    point tracking."""

    def __init__(self, hyphenator: HyphenationTree, dictionary=None,
                 min_word_size: int = DEFAULT_MIN_WORD_SIZE,
                 min_subword_size: int = DEFAULT_MIN_SUBWORD_SIZE,
                 max_subword_size: int = DEFAULT_MAX_SUBWORD_SIZE,
                 only_longest_match: bool = False,
                 no_sub_matches: bool = False,
                 no_overlapping_matches: bool = False):
        self.hyph = hyphenator
        self.dict = (None if dictionary is None
                     else frozenset(w.lower() for w in dictionary))
        self.min_word = min_word_size
        self.min_sub = min_subword_size
        self.max_sub = max_subword_size
        self.no_sub = no_sub_matches
        self.no_overlap = no_overlapping_matches
        self.calc_sub = (not only_longest_match and not no_sub_matches
                         and not no_overlapping_matches)

    def _decompose(self, term: str) -> list[str]:
        low = term.lower()
        n = len(low)
        if self.dict is not None and not self.calc_sub and (
                low in self.dict or (n > 1 and low[:-1] in self.dict)):
            return []  # whole token in dictionary -> keep as is
        hyp = self.hyph.hyphenate(low, 1, 1)
        if hyp is None:
            return []
        max_sub = min(self.max_sub, n - 1)
        out = []
        consumed = -1
        i = 0
        while i < len(hyp):
            if self.no_overlap:
                i = max(i, consumed)
                if i >= len(hyp):
                    break
            start = hyp[i]
            until = max(consumed, i) if self.no_sub else i
            for j in range(len(hyp) - 1, until, -1):
                plen = hyp[j] - start
                if plen > max_sub:
                    continue
                if plen < self.min_sub:
                    break
                if self.dict is None or low[start:start + plen] in self.dict:
                    out.append(term[start:start + plen])
                    consumed = j
                    if not self.calc_sub:
                        break
                elif low[start:start + plen - 1] in self.dict:
                    # genitive-'s / binding character
                    out.append(term[start:start + plen - 1])
                    consumed = j
                    if not self.calc_sub:
                        break
            i += 1
        return out

    def __call__(self, terms):
        out = []
        for t in terms:
            out.append(t)
            if len(t) >= self.min_word:
                out.extend(self._decompose(t))
        return out
