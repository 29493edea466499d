"""StandardTokenizer-conformant UAX#29 word segmentation.

A from-scratch re-implementation of the reference tokenizer grammar
(``lucene/core/src/java/org/apache/lucene/analysis/standard/
StandardTokenizerImpl.jflex``): UAX#29 word-break rules (Unicode 12.1)
extended with TR51 emoji sequences, Hangul/Katakana typing rules, single
Han/Hiragana tokens, and Complex_Context (SE-Asian) runs.

Scanner semantics mirror JFlex longest-match with rule order as
tie-break; the rule order is the grammar's::

    EMOJI > NUMERIC > HANGUL > KATAKANA > WORD > SOUTHEAST_ASIAN >
    IDEOGRAPHIC > HIRAGANA > (skip one char)

Max token length follows ``StandardTokenizer.java:145-167`` +
``StandardTokenizerImpl.setBufferSize``: the scanner buffer is
``max_token_length`` UTF-16 units, so a longer run is *split* at the
longest valid match that fits (e.g. 256 letters -> tokens of 255 + 1).

There is a fast vectorized path for pure-ASCII inputs (a compiled regex
encoding the ASCII projection of the same rules) and a general
codepoint-level scanner for everything else; both produce identical
output on ASCII (tested).
"""

from __future__ import annotations

import re
from typing import NamedTuple

from . import props as P

ALPHANUM = "<ALPHANUM>"
NUM = "<NUM>"
SOUTHEAST_ASIAN = "<SOUTHEAST_ASIAN>"
IDEOGRAPHIC = "<IDEOGRAPHIC>"
HIRAGANA = "<HIRAGANA>"
KATAKANA = "<KATAKANA>"
HANGUL = "<HANGUL>"
EMOJI = "<EMOJI>"

DEFAULT_MAX_TOKEN_LENGTH = 255  # StandardAnalyzer.java:37

# --- ASCII fast path -------------------------------------------------------
# ASCII projection of the word/numeric rules:
#   core chars  [A-Za-z0-9_]   (ALetter | Numeric | ExtendNumLet)
#   letter mids [.':]          (MidNumLet | SingleQuote | MidLetter)
#   number mids [.,;']         (MidNumLet | SingleQuote | MidNum)
# A single mid joins two cores only when flanked by same-class chars.
_ASCII_MID = r"(?:(?<=[A-Za-z])[':.](?=[A-Za-z])|(?<=[0-9])[,.;'](?=[0-9]))"
# a token must contain at least one letter/digit: ExtendNumLet ('_') runs
# alone are NOT tokens (neither the WORD nor the NUMERIC rule matches
# them — WordBreakTestUnicode conformance)
_ASCII_TOKEN_RE = re.compile(
    r"[A-Za-z0-9_]*[A-Za-z0-9][A-Za-z0-9_]*(?:" + _ASCII_MID
    + r"[A-Za-z0-9_]+)*")
_ASCII_HAS_ALPHA_RE = re.compile(r"[A-Za-z]")


class Token(NamedTuple):
    text: str
    start: int  # codepoint offset in input
    end: int
    type: str


def _utf16_limit(s: str, start: int, max_units: int) -> int:
    """Largest end index such that s[start:end] fits in max_units UTF-16 units."""
    units = 0
    i = start
    n = len(s)
    while i < n:
        units += 2 if ord(s[i]) > 0xFFFF else 1
        if units > max_units:
            return i
        i += 1
    return n


class Scanner:
    """General scanner over one string (non-ASCII path)."""

    __slots__ = ("s", "pm", "n", "has_supplementary")

    def __init__(self, s: str):
        self.s = s
        self.pm = P.classify_str(s)
        self.n = len(s)
        # when no supplementary-plane chars exist, UTF-16 length ==
        # codepoint length, so the buffer limit is a plain index add
        self.has_supplementary = max(map(ord, s)) > 0xFFFF if s else False

    # -- helpers ------------------------------------------------------------
    def _ex(self, i: int, lim: int) -> int:
        """Consume (Extend|Format|ZWJ)* closure."""
        pm = self.pm
        while i < lim and pm[i] & P.EXT_FMT_ZWJ:
            i += 1
        return i

    def _ex_sans_pressel(self, i: int, lim: int) -> int:
        """Closure excluding U+FE0E / U+FE0F (emoji rules)."""
        pm, s = self.pm, self.s
        while i < lim and pm[i] & P.EXT_FMT_ZWJ and s[i] not in "︎️":
            i += 1
        return i

    def _base_ex(self, i: int, lim: int, bit: int) -> int:
        """Match one char with property `bit` plus closure; -1 if no match."""
        if i < lim and self.pm[i] & bit:
            return self._ex(i + 1, lim)
        return -1

    # -- emoji rule ---------------------------------------------------------
    def _emoji_char_ex(self, i: int, lim: int) -> int:
        if i < lim and self.pm[i] & P.EXTPICT:
            return self._ex_sans_pressel(i + 1, lim)
        return -1

    def _ecpm(self, i: int, lim: int) -> int:
        """EmojiCharOrPresSeqOrModSeq; returns end or -1. Longest of:
        ZWJ* EmojiCharEx PresSel?  |  (ZWJ* EmojiModBaseEx)? EmojiModEx
        """
        pm, s = self.pm, self.s
        j = i
        while j < lim and pm[j] & P.ZWJ:
            j += 1
        best = -1
        # alt 1: EmojiCharEx PresSel?
        e = self._emoji_char_ex(j, lim)
        if e != -1:
            if e < lim and s[e] == "️":
                e += 1
            best = e
        # alt 2: (ZWJ* EmojiModBaseEx)? EmojiModEx
        e2 = -1
        if j < lim and pm[j] & P.EMOJI_MOD_BASE:
            mid = self._ex_sans_pressel(j + 1, lim)
            if mid < lim and pm[mid] & P.EMOJI_MOD:
                e2 = self._ex_sans_pressel(mid + 1, lim)
        if e2 == -1 and i < lim and pm[i] & P.EMOJI_MOD:
            # bare modifier (no leading ZWJ allowed in this sub-alt)
            e2 = self._ex_sans_pressel(i + 1, lim)
        return max(best, e2)

    def match_emoji(self, i: int, lim: int) -> int:
        pm, s = self.pm, self.s
        best = -1
        # branch: ECPM ( (ZWJ ECPM)* | TagSpec+ TagTerm )
        e = self._ecpm(i, lim)
        if e != -1:
            j = e
            while j < lim:
                # (ZWJ ECPM)*: the greedy Ex-closure may have absorbed the
                # joining ZWJ; JFlex backtracking would give it back, so an
                # ECPM starting right after a closure-consumed ZWJ also
                # continues the sequence.
                if pm[j] & P.ZWJ:
                    k = self._ecpm(j + 1, lim)
                elif j > i and pm[j - 1] & P.ZWJ:
                    k = self._ecpm(j, lim)
                else:
                    break
                if k <= j:
                    break
                j = k
            best = max(best, j)
            # tag sequence (flag tags); TagSpec/TagTerm are Cf -> usually
            # already consumed by the closure, but handle explicitly too
            j = e
            saw_tag = False
            while j < lim and 0xE0020 <= ord(s[j]) <= 0xE007E:
                j += 1
                saw_tag = True
            if saw_tag and j < lim and ord(s[j]) == 0xE007F:
                best = max(best, j + 1)
        # branch: KeyCapBaseCharEx PresSel? KeyCapEx — the closure must
        # stop at U+20E3 itself (it is WB:Extend; greedy consumption would
        # eat the keycap the branch needs — JFlex backtracks here)
        if i < lim and pm[i] & P.KEYCAPBASE:
            j = i + 1
            while (j < lim and pm[j] & P.EXT_FMT_ZWJ and s[j] not in "︎️"
                   and ord(s[j]) != 0x20E3):
                j += 1
            if j < lim and s[j] == "️":
                j += 1
            if j < lim and ord(s[j]) == 0x20E3:
                best = max(best, self._ex_sans_pressel(j + 1, lim))
        # branch: RI RI
        j = self._base_ex(i, lim, P.RI)
        if j != -1:
            j2 = self._base_ex(j, lim, P.RI)
            if j2 != -1:
                best = max(best, j2)
        return best

    # -- numeric rule -------------------------------------------------------
    def match_numeric(self, i: int, lim: int) -> int:
        # ENL* Num ((ENL* | MidNumeric) Num)* ENL*
        pm = self.pm
        j = i
        while True:
            k = self._base_ex(j, lim, P.ENL)
            if k == -1:
                break
            j = k
        j = self._base_ex(j, lim, P.NUMERIC)
        if j == -1:
            return -1
        while True:
            save = j
            # (ENL* | MidNumeric) Num
            k = j
            advanced = False
            while True:
                k2 = self._base_ex(k, lim, P.ENL)
                if k2 == -1:
                    break
                k = k2
                advanced = True
            if not advanced:
                k2 = self._base_ex(j, lim, P.MID_NUMERIC_EX)
                if k2 != -1:
                    k = k2
            k = self._base_ex(k, lim, P.NUMERIC)
            if k == -1:
                j = save
                break
            j = k
        while True:
            k = self._base_ex(j, lim, P.ENL)
            if k == -1:
                break
            j = k
        return j

    # -- hangul / katakana runs --------------------------------------------
    def _match_run(self, i: int, lim: int, bit: int) -> int:
        j = self._base_ex(i, lim, bit)
        if j == -1:
            return -1
        while True:
            k = self._base_ex(j, lim, bit)
            if k == -1:
                return j
            j = k

    def match_hangul(self, i: int, lim: int) -> int:
        return self._match_run(i, lim, P.HANGUL)

    def match_katakana(self, i: int, lim: int) -> int:
        return self._match_run(i, lim, P.KATAKANA)

    def match_sea(self, i: int, lim: int) -> int:
        return self._match_run(i, lim, P.SA)

    # -- the big word rule --------------------------------------------------
    def _word_body(self, i: int, lim: int) -> int:
        """BODY := Katakana (ENL* Katakana)*
                 | ( Hebrew (SQ | DQ Hebrew) | Num ((ENL*|MidNum) Num)*
                   | AHLetter ((ENL*|MidLet) AHLetter)* )+
        Returns end or -1."""
        pm = self.pm
        j = self._base_ex(i, lim, P.KATAKANA)
        if j != -1:
            while True:
                save = j
                k = j
                while True:
                    k2 = self._base_ex(k, lim, P.ENL)
                    if k2 == -1:
                        break
                    k = k2
                k = self._base_ex(k, lim, P.KATAKANA)
                if k == -1:
                    return save
                j = k
        # second alternative: one-or-more letter/number runs
        j = i
        matched_any = False
        while True:
            start_iter = j
            # Hebrew quote forms: Heb (SQ | DQ Heb)
            e = -1
            h = self._base_ex(j, lim, P.HEBREW)
            if h != -1:
                q = self._base_ex(h, lim, P.SQ)
                if q != -1:
                    e = q
                else:
                    q = self._base_ex(h, lim, P.DQ)
                    if q != -1:
                        q2 = self._base_ex(q, lim, P.HEBREW)
                        if q2 != -1:
                            e = q2
            # Numeric run
            e_num = self._base_ex(j, lim, P.NUMERIC)
            if e_num != -1:
                k = e_num
                while True:
                    save = k
                    k2 = k
                    advanced = False
                    while True:
                        k3 = self._base_ex(k2, lim, P.ENL)
                        if k3 == -1:
                            break
                        k2 = k3
                        advanced = True
                    if not advanced:
                        k3 = self._base_ex(k, lim, P.MID_NUMERIC_EX)
                        if k3 != -1:
                            k2 = k3
                    k2 = self._base_ex(k2, lim, P.NUMERIC)
                    if k2 == -1:
                        k = save
                        break
                    k = k2
                e_num = k
            # AHLetter run
            e_ah = self._base_ex(j, lim, P.AHLETTER)
            if e_ah != -1:
                k = e_ah
                while True:
                    save = k
                    k2 = k
                    advanced = False
                    while True:
                        k3 = self._base_ex(k2, lim, P.ENL)
                        if k3 == -1:
                            break
                        k2 = k3
                        advanced = True
                    if not advanced:
                        k3 = self._base_ex(k, lim, P.MID_LETTER_EX)
                        if k3 != -1:
                            k2 = k3
                    k2 = self._base_ex(k2, lim, P.AHLETTER)
                    if k2 == -1:
                        k = save
                        break
                    k = k2
                e_ah = k
            step = max(e, e_num, e_ah)
            if step == -1 or step == start_iter:
                break
            j = step
            matched_any = True
        return j if matched_any else -1

    def match_word(self, i: int, lim: int) -> int:
        # ENL* BODY (ENL+ BODY)* ENL*
        j = i
        lead = False
        while True:
            k = self._base_ex(j, lim, P.ENL)
            if k == -1:
                break
            j = k
            lead = True
        b = self._word_body(j, lim)
        if b == -1:
            # trailing-only ENLs: "___" alone is NOT a word token (the rule
            # requires at least one BODY)... except pure ENL runs match the
            # NUMERIC rule? No - numeric requires a digit. No body -> no match.
            return -1
        j = b
        while True:
            save = j
            k = j
            advanced = False
            while True:
                k2 = self._base_ex(k, lim, P.ENL)
                if k2 == -1:
                    break
                k = k2
                advanced = True
            if not advanced:
                break
            b = self._word_body(k, lim)
            if b == -1:
                j = k  # trailing ENL* absorbs them
                break
            j = b
        return j

    def match_han(self, i: int, lim: int) -> int:
        return self._base_ex(i, lim, P.HAN)

    def match_hiragana(self, i: int, lim: int) -> int:
        return self._base_ex(i, lim, P.HIRAGANA)

    # -- main loop ----------------------------------------------------------
    def tokens(self, max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH) -> list[Token]:
        s, n = self.s, self.n
        out = []
        i = 0
        while i < n:
            if not self.pm[i]:  # fast skip for unclassified chars
                i += 1
                continue
            if self.has_supplementary:
                lim = _utf16_limit(s, i, max_token_length)
            else:
                lim = min(n, i + max_token_length)
            best = -1
            best_type = None
            for matcher, ttype in (
                (self.match_emoji, EMOJI),
                (self.match_numeric, NUM),
                (self.match_hangul, HANGUL),
                (self.match_katakana, KATAKANA),
                (self.match_word, ALPHANUM),
                (self.match_sea, SOUTHEAST_ASIAN),
                (self.match_han, IDEOGRAPHIC),
                (self.match_hiragana, HIRAGANA),
            ):
                e = matcher(i, lim)
                if e > best:
                    best = e
                    best_type = ttype
            if best > i:
                out.append(Token(s[i:best], i, best, best_type))
                i = best
            else:
                i += 1
        return out


def tokenize(s: str, max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH) -> list[Token]:
    """Segment ``s`` into tokens (text, start, end, type)."""
    if s.isascii():
        return _tokenize_ascii(s, max_token_length)
    return Scanner(s).tokens(max_token_length)


def _tokenize_ascii(s: str, max_token_length: int) -> list[Token]:
    out = []
    for m in _ASCII_TOKEN_RE.finditer(s):
        text = m.group()
        start = m.start()
        if len(text) <= max_token_length:
            ttype = ALPHANUM if _ASCII_HAS_ALPHA_RE.search(text) else NUM
            out.append(Token(text, start, m.end(), ttype))
        else:
            # buffer-split semantics: re-scan the long match with the
            # general scanner, which caps each match at max_token_length
            sub = Scanner(text)
            for t in sub.tokens(max_token_length):
                out.append(Token(t.text, start + t.start, start + t.end, t.type))
    return out


def tokenize_texts_ascii(texts: list[str]) -> list[list[str]]:
    """Hot-path helper: token strings only, for a batch of ASCII texts."""
    findall = _ASCII_TOKEN_RE.findall
    return [findall(t) for t in texts]
