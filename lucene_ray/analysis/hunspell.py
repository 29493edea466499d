"""Hunspell dictionary stemming (.aff/.dic) — the reference's
production morphology path for ~100 languages.

Plays the role of ``lucene/analysis/common/src/java/org/apache/lucene/
analysis/hunspell/Hunspell.java:49`` / ``Stemmer.java`` /
``Dictionary.java`` (behavior verified against the reference's own
test .aff/.dic fixtures in ``tests/test_hunspell.py``; the semantics
below are implemented from the public hunspell(5) file-format
documentation, not from the Java).

Supported directive set (the stemming core):

* ``SET`` (encoding), ``FLAG`` modes: single-char (default/UTF-8),
  ``long`` (two chars), ``num`` (comma-separated integers)
* ``PFX``/``SFX`` rule blocks — strip, affix text with optional
  continuation flags (``affix/FLAGS``), condition character classes,
  cross-product flag; multiple blocks may share one flag name
* ``AF`` flag aliases (a dic entry ``word/3`` refers to alias 3)
* ``FULLSTRIP`` (affix may strip the entire word)
* ``NEEDAFFIX`` (entry invalid without an affix)
* ``CIRCUMFIX`` (a prefix/suffix carrying the circumfix flag is valid
  only when paired with a counterpart that also carries it)
* ``IGNORE`` (characters stripped from both input and dictionary)
* ``ONLYINCOMPOUND`` (entries/affixes excluded from plain stemming)
* escaped slashes in .dic (``R2\\/D2/A``), tab-separated morphological
  data (parsed off)

Stemming algorithm (Stemmer.java's analysis direction):
a word stems to a dictionary entry if it IS one (and doesn't require
an affix), or decomposes as ``stem+sfx``, ``pfx+stem``,
``pfx+stem+sfx`` (both cross-product), or ``stem+sfx_inner+sfx_outer``
where the outer suffix's flag appears in the inner suffix's
continuation classes (hunspell's twofold suffix stripping). Homonyms
yield one stem per dictionary entry. Case handling follows
``Stemmer.varyCase`` (Stemmer.java:111-140): UPPER words union the
title- and lower-case variants' stems, TITLE words the lower-case
variant's (conformance: the transcribed ``TestCaseSensitive``
36-golden suite); MIXED words additionally fall back to a lowercase
lookup when nothing matched (the Dictionary ``ignoreCase`` role).

Scale shape: the parsed dictionary is a plain picklable object built
once per actor in a ``map_batches`` stage's ``__init__`` (the
Analyzer-hook slot of ``build_index``), never per batch.

Out of scope (documented): compounding (COMPOUNDRULE/COMPOUNDFLAG),
ICONV/OCONV transliteration, KEEPCASE/CHECKSHARPS case edge rules,
COMPLEXPREFIXES, suggestion data (REP/MAP/KEY/TRY are parsed and
ignored).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


@dataclass(frozen=True)
class AffixRule:
    flag: str
    strip: str
    affix: str
    cont: frozenset  # continuation flags carried by the affixed form
    cond: object     # compiled regex or None (= '.')
    cross: bool


@dataclass
class HunspellDictionary:
    words: dict = field(default_factory=dict)   # word -> [frozenset flags]
    prefixes: list = field(default_factory=list)
    suffixes: list = field(default_factory=list)
    # suffix rules indexed by affix text (analysis-side lookup)
    sfx_by_affix: dict = field(default_factory=dict)
    pfx_by_affix: dict = field(default_factory=dict)
    fullstrip: bool = False
    needaffix: str | None = None
    circumfix: str | None = None
    onlyincompound: str | None = None
    ignore: str = ""
    flag_mode: str = "char"
    af_aliases: list = field(default_factory=list)

    def parse_flags(self, s: str) -> frozenset:
        if not s:
            return frozenset()
        if self.af_aliases and s.isdigit():
            i = int(s)
            if 1 <= i <= len(self.af_aliases):
                return self.af_aliases[i - 1]
        if self.flag_mode == "long":
            return frozenset(s[i:i + 2] for i in range(0, len(s) - 1, 2))
        if self.flag_mode == "num":
            return frozenset(p.strip() for p in s.split(",") if p.strip())
        return frozenset(s)


def _split_dic_line(line: str) -> tuple[str, str]:
    """word[/flags][\\tmorph] with ``\\/`` escaping; the flag separator
    is the first unescaped ``/`` at index > 0 (a leading slash is part
    of the word, matching the reference's escaped.dic handling)."""
    line = line.split("\t")[0].strip()
    out = []
    i = 0
    sep = -1
    while i < len(line):
        c = line[i]
        if c == "\\" and i + 1 < len(line) and line[i + 1] == "/":
            out.append("/")
            i += 2
            continue
        if c == "/" and i > 0 and sep < 0:
            sep = len(out)
        out.append(c)
        i += 1
    s = "".join(out)
    if sep < 0:
        return s, ""
    return s[:sep], s[sep + 1:]


def parse_dictionary(aff_text: str, dic_text: str) -> HunspellDictionary:
    d = HunspellDictionary()
    lines = aff_text.splitlines()
    i = 0
    pending: dict[tuple, list] = {}
    while i < len(lines):
        parts = lines[i].split("#")[0].split()
        i += 1
        if not parts:
            continue
        kw = parts[0]
        if kw == "FLAG" and len(parts) > 1:
            d.flag_mode = {"long": "long", "num": "num"}.get(
                parts[1], "char")
        elif kw == "FULLSTRIP":
            d.fullstrip = True
        elif kw == "NEEDAFFIX" and len(parts) > 1:
            d.needaffix = parts[1]
        elif kw == "CIRCUMFIX" and len(parts) > 1:
            d.circumfix = parts[1]
        elif kw == "ONLYINCOMPOUND" and len(parts) > 1:
            d.onlyincompound = parts[1]
        elif kw == "IGNORE" and len(parts) > 1:
            d.ignore = parts[1]
        elif kw == "AF" and len(parts) > 1:
            if parts[1].isdigit() and len(parts) == 2:
                continue  # the count header
            d.af_aliases.append(d.parse_flags(parts[1]))
        elif kw in ("PFX", "SFX") and len(parts) >= 4:
            if parts[2] in ("Y", "N") and parts[3].isdigit():
                # header: PFX flag cross count
                pending[(kw, parts[1])] = [parts[2] == "Y"]
                continue
            # entry: PFX flag strip affix [condition]
            flag = parts[1]
            cross = pending.get((kw, flag), [True])[0]
            strip = "" if parts[2] == "0" else parts[2]
            affix_raw = parts[3]
            cont = frozenset()
            if "/" in affix_raw:
                a, _, cflags = affix_raw.partition("/")
                affix = "" if a == "0" else a
                cont = d.parse_flags(cflags)
            else:
                affix = "" if affix_raw == "0" else affix_raw
            cond_s = parts[4] if len(parts) > 4 else "."
            if cond_s == "." or cond_s == "":
                cond = None
            elif kw == "SFX":
                cond = re.compile("(?:" + cond_s + ")$")
            else:
                cond = re.compile("^(?:" + cond_s + ")")
            rule = AffixRule(flag, strip, affix, cont, cond, cross)
            if kw == "SFX":
                d.suffixes.append(rule)
                d.sfx_by_affix.setdefault(affix, []).append(rule)
            else:
                d.prefixes.append(rule)
                d.pfx_by_affix.setdefault(affix, []).append(rule)
    # .dic
    dic_lines = dic_text.splitlines()
    start = 1 if dic_lines and dic_lines[0].strip().isdigit() else 0
    ign = str.maketrans("", "", d.ignore) if d.ignore else None
    for line in dic_lines[start:]:
        if not line.strip():
            continue
        word, flags_s = _split_dic_line(line)
        if ign:
            word = word.translate(ign)
        if not word:
            continue
        d.words.setdefault(word, []).append(d.parse_flags(flags_s))
    return d


class HunspellStemmer:
    """Analysis-direction stemmer over a parsed dictionary
    (Stemmer.java role). ``stem(word)`` returns the matching
    dictionary entries' text, one per homonym entry."""

    def __init__(self, dictionary: HunspellDictionary):
        self.d = dictionary
        self._ign = str.maketrans("", "", self.d.ignore) \
            if self.d.ignore else None
        # affix lengths present, for end/start slicing
        self._sfx_lens = sorted({len(a) for a in self.d.sfx_by_affix})
        self._pfx_lens = sorted({len(a) for a in self.d.pfx_by_affix})

    # -- flag checks ------------------------------------------------------
    def _entry_flags(self, word: str):
        return self.d.words.get(word, [])

    def _plain_ok(self, flags: frozenset) -> bool:
        if self.d.needaffix and self.d.needaffix in flags:
            return False
        if self.d.onlyincompound and self.d.onlyincompound in flags:
            return False
        return True

    def _affix_usable(self, rule: AffixRule) -> bool:
        if self.d.onlyincompound and \
                self.d.onlyincompound in rule.cont:
            return False
        return True

    def _needs_circumfix(self, rule: AffixRule) -> bool:
        return self.d.circumfix is not None and \
            self.d.circumfix in rule.cont

    # -- candidate enumeration ---------------------------------------------
    def _sfx_candidates(self, word: str):
        """(rule, stem_candidate) for every suffix rule whose affix
        matches the word end and whose condition accepts the stem."""
        for L in self._sfx_lens:
            if L > len(word):
                break
            app = word[len(word) - L:] if L else ""
            for r in self.d.sfx_by_affix.get(app, ()):
                stem = word[:len(word) - L] + r.strip
                if not stem:
                    continue
                if not self.d.fullstrip and L >= len(word):
                    continue
                if r.cond is not None and not r.cond.search(stem):
                    continue
                if not self._affix_usable(r):
                    continue
                yield r, stem

    def _pfx_candidates(self, word: str):
        for L in self._pfx_lens:
            if L > len(word):
                break
            app = word[:L] if L else ""
            for r in self.d.pfx_by_affix.get(app, ()):
                stem = r.strip + word[L:]
                if not stem:
                    continue
                if not self.d.fullstrip and L >= len(word):
                    continue
                if r.cond is not None and not r.cond.search(stem):
                    continue
                if not self._affix_usable(r):
                    continue
                yield r, stem

    # -- main --------------------------------------------------------------
    def stem(self, word: str) -> list[str]:
        if self._ign:
            word = word.translate(self._ign)
        if not word:
            return []
        # Stemmer.analyze (Stemmer.java:96-105): the exact-case form
        # ALWAYS stems; UPPER words also try the title and lower case
        # variants, TITLE words the lower variant (varyCase:111-140,
        # union of all variants' stems — duplicates kept, one stem per
        # dictionary entry); MIXED words (first char lowercase, or
        # interior capitals) get no case folding in the reference
        # unless the dictionary was loaded ignoreCase — that role is
        # played by the lowercase fallback when nothing else matched.
        out = list(self._forms(word))
        for v in self._case_variants(word):
            out.extend(self._forms(v))
        if not out:
            low = word.lower()
            if low != word:
                out = self._forms(low)
        return out

    def _case_variants(self, word: str) -> list[str]:
        """Title/lower variants per WordCase.caseOf: UPPER = no
        lowercase letters at all; TITLE = first char upper, no other
        uppercase; anything else (incl. lowercase-first) is MIXED."""
        if not word or word[0].islower():
            return []
        has_lower = any(c.islower() for c in word)
        n_upper = sum(1 for c in word if c.isupper())
        variants = []
        if not has_lower and n_upper >= 1:  # UPPER
            title = word[0] + word[1:].lower()
            if title != word:
                variants.append(title)
            low = word.lower()
            if low != word and low != title:
                variants.append(low)
        elif word[0].isupper() and n_upper == 1:  # TITLE
            low = word.lower()
            if low != word:
                variants.append(low)
        return variants

    def _forms(self, word: str) -> list[str]:
        d = self.d
        out: list[str] = []
        # 1. the word itself
        for flags in self._entry_flags(word):
            if self._plain_ok(flags):
                out.append(word)
        # 2. suffix strip (+ twofold inner suffix)
        for r, stem in self._sfx_candidates(word):
            if self._needs_circumfix(r):
                pass  # suffix carrying the circumfix flag needs a prefix
            else:
                for flags in self._entry_flags(stem):
                    if r.flag in flags and self._compound_ok(flags):
                        out.append(stem)
            # twofold: outer rule's flag must appear in the INNER
            # suffix's continuation classes (hunspell generation order:
            # stem+inner carries inner.cont, which licenses outer)
            for r2, stem2 in self._sfx_candidates(stem):
                if r.flag not in r2.cont:
                    continue
                if self._needs_circumfix(r2) or self._needs_circumfix(r):
                    continue
                for flags in self._entry_flags(stem2):
                    if r2.flag in flags and self._compound_ok(flags):
                        out.append(stem2)
        # 3. prefix strip (alone, and cross-product with a suffix)
        for p, stem in self._pfx_candidates(word):
            if not self._needs_circumfix(p):
                for flags in self._entry_flags(stem):
                    if p.flag in flags and self._compound_ok(flags):
                        out.append(stem)
            if not p.cross:
                continue
            for r, stem2 in self._sfx_candidates(stem):
                if not r.cross:
                    continue
                # circumfix pairing: both or neither carry the flag
                if d.circumfix is not None and \
                        (d.circumfix in p.cont) != (d.circumfix in r.cont):
                    continue
                for flags in self._entry_flags(stem2):
                    if r.flag not in flags or not self._compound_ok(flags):
                        continue
                    # the prefix flag may come from the stem or from
                    # the suffix's continuation classes
                    if p.flag in flags or p.flag in r.cont:
                        out.append(stem2)
        return out

    def _compound_ok(self, flags: frozenset) -> bool:
        return not (self.d.onlyincompound
                    and self.d.onlyincompound in flags)


def load(aff_path: str, dic_path: str) -> HunspellStemmer:
    with open(aff_path, encoding="utf-8", errors="replace") as f:
        aff = f.read()
    with open(dic_path, encoding="utf-8", errors="replace") as f:
        dic = f.read()
    return HunspellStemmer(parse_dictionary(aff, dic))


class HunspellStemFilter:
    """Token-filter slot for the analyzer chain
    (``HunspellStemFilter.java`` role): replaces each token with its
    dictionary stems (all stems stacked, like the reference's default
    dedup=true behavior), keeping the original token when nothing
    stems. ``longest_only=True`` emits just the longest stem."""

    def __init__(self, stemmer: HunspellStemmer,
                 longest_only: bool = False):
        self.stemmer = stemmer
        self.longest_only = longest_only

    def __call__(self, tokens: list[str]) -> list[str]:
        out: list[str] = []
        for t in tokens:
            stems = self.stemmer.stem(t)
            if not stems:
                out.append(t)
            elif self.longest_only:
                out.append(max(stems, key=len))
            else:
                seen = set()
                for s in stems:
                    if s not in seen:
                        seen.add(s)
                        out.append(s)
        return out
