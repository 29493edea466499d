"""Phonetic encoders + token filter — the analysis-phonetic module role
(``lucene/analysis/phonetic/src/java/org/apache/lucene/analysis/
phonetic/PhoneticFilter.java``, which delegates to commons-codec's
Soundex / Metaphone; tests ``TestPhoneticFilter.java``).

Both encoders are implemented from the published algorithms:
- Soundex: the U.S. National Archives (NARA) coding rules, including
  the H/W-transparency rule (letters with equal codes separated by H
  or W collapse; vowels break the run).
- Metaphone: Lawrence Philips' 1990 algorithm (Computer Language 7(12))
  with the standard 4-character truncation.
"""

from __future__ import annotations

_SOUNDEX_CODES = {}
for _letters, _code in (("BFPV", "1"), ("CGJKQSXZ", "2"), ("DT", "3"),
                        ("L", "4"), ("MN", "5"), ("R", "6")):
    for _ch in _letters:
        _SOUNDEX_CODES[_ch] = _code

_VOWELS = "AEIOU"


def soundex(word: str) -> str:
    """4-char NARA soundex (e.g. 'Robert' -> 'R163'). Empty input ->
    empty output."""
    letters = [c for c in word.upper() if "A" <= c <= "Z"]
    if not letters:
        return ""
    out = [letters[0]]
    last = _SOUNDEX_CODES.get(letters[0], "0")
    for c in letters[1:]:
        if c in "HW":            # transparent: do not reset the run
            continue
        code = _SOUNDEX_CODES.get(c, "0")
        if code == "0":          # vowel: breaks the run
            last = "0"
            continue
        if code != last:
            out.append(code)
            if len(out) == 4:
                break
        last = code
    return "".join(out) + "0" * (4 - len(out))


def _is_vowel(s: str, i: int) -> bool:
    return 0 <= i < len(s) and s[i] in _VOWELS


def metaphone(word: str, max_len: int = 4) -> str:
    """Philips 1990 metaphone, 4-char default ('Thompson' -> 'TMSN')."""
    s = "".join(c for c in word.upper() if "A" <= c <= "Z")
    if not s:
        return ""
    # initial-pair transforms
    if s[:2] in ("AE", "GN", "KN", "PN", "WR"):
        s = s[1:]
    elif s[:1] == "X":
        s = "S" + s[1:]
    elif s[:2] == "WH":
        s = "W" + s[2:]
    out = []
    i = 0
    n = len(s)
    while i < n and len(out) < max_len:
        c = s[i]
        # duplicate letters: skip the second, except C
        if c != "C" and i > 0 and s[i - 1] == c:
            i += 1
            continue
        nxt = s[i + 1] if i + 1 < n else ""
        nx2 = s[i + 2] if i + 2 < n else ""
        if c in _VOWELS:
            if i == 0:
                out.append(c)
        elif c == "B":
            # silent terminal B after M ("dumb")
            if not (i == n - 1 and i > 0 and s[i - 1] == "M"):
                out.append("B")
        elif c == "C":
            if nxt == "I" and nx2 == "A":           # -CIA-
                out.append("X")
            elif nxt == "H":
                if i > 0 and s[i - 1] == "S":       # -SCH-
                    out.append("K")
                else:
                    out.append("X")
                i += 1                              # consume the H
            elif nxt in "IEY":
                out.append("S")
            else:
                out.append("K")
        elif c == "D":
            if nxt == "G" and nx2 in "EIY":         # -DGE/DGI/DGY
                out.append("J")
                i += 1                              # consume G
            else:
                out.append("T")
        elif c == "G":
            if nxt == "H":
                # GH: silent unless at end or before a vowel
                if i + 2 < n and not _is_vowel(s, i + 2):
                    i += 1
                else:
                    out.append("K")
                    i += 1
            elif nxt == "N":                        # GN, GNED: silent G
                pass
            elif nxt in "IEY":
                out.append("J")
            else:
                out.append("K")
        elif c == "H":
            # silent after a vowel with no vowel following, or after
            # C/S/P/T/G (those handled at the consonant)
            if i > 0 and _is_vowel(s, i - 1) and not _is_vowel(s, i + 1):
                pass
            elif i > 0 and s[i - 1] in "CSPTG":
                pass
            else:
                out.append("H")
        elif c == "K":
            if not (i > 0 and s[i - 1] == "C"):     # CK: K silent
                out.append("K")
        elif c == "P":
            if nxt == "H":
                out.append("F")
                i += 1
            else:
                out.append("P")
        elif c == "Q":
            out.append("K")
        elif c == "S":
            if nxt == "H":
                out.append("X")
                i += 1
            elif nxt == "I" and nx2 in "OA":        # -SIO-, -SIA-
                out.append("X")
            else:
                out.append("S")
        elif c == "T":
            if nxt == "I" and nx2 in "OA":          # -TIO-, -TIA-
                out.append("X")
            elif nxt == "H":
                out.append("0")                     # theta
                i += 1
            elif nxt == "C" and nx2 == "H":         # -TCH-: T silent
                pass
            else:
                out.append("T")
        elif c == "V":
            out.append("F")
        elif c == "W":
            if _is_vowel(s, i + 1):
                out.append("W")
        elif c == "X":
            out.append("K")
            if len(out) < max_len:
                out.append("S")
        elif c == "Y":
            if _is_vowel(s, i + 1):
                out.append("Y")
        elif c == "Z":
            out.append("S")
        else:
            out.append(c)
        i += 1
    return "".join(out)


class PhoneticFilter:
    """Token filter for ``AnalyzerChain``: replaces each token with its
    phonetic code, or (``inject=True``, the reference default) emits
    the code alongside the original at the same position."""

    def __init__(self, encoder: str = "metaphone", inject: bool = True):
        self.encode = {"soundex": soundex,
                       "metaphone": metaphone}[encoder]
        self.inject = inject

    def __call__(self, tokens: list[str]) -> list[str]:
        out = []
        for t in tokens:
            code = self.encode(t).lower()
            if self.inject:
                out.append(t)
                if code and code != t:
                    out.append(code)
            else:
                out.append(code if code else t)
        return out
