"""Word-delimiter splitting (``analysis/common/src/java/org/apache/
lucene/analysis/miscellaneous/WordDelimiterGraphFilter.java`` +
``WordDelimiterIterator.java`` analog).

Splits tokens into subwords at delimiter characters, case transitions
and letter/digit transitions, then optionally emits catenated runs and
the original token. Character classes follow the reference's
``WordDelimiterIterator.getType`` (Unicode category based): Lu=UPPER,
Ll=LOWER, other letters and combining marks=ALPHA (so Thai/Arabic/
Hindi words and precomposed marks never split), Nd/Nl/No=DIGIT,
everything else is a subword delimiter. ``isBreak`` transitions are
transcribed from ``WordDelimiterIterator.java:225-242``.

Stacked (same-position) outputs flatten to the list protocol in the
reference's emission order — original (PRESERVE_ORIGINAL) first, then
CATENATE_ALL, then per start position any catenated run starting
there before the single part (``TestWordDelimiterGraphFilter.
testLotsOfConcatenating``); phrase positions under stacking are
therefore approximate, like the other flattened graph filters here.
"""

from __future__ import annotations

import unicodedata

# flags (WordDelimiterGraphFilter.java:67-116)
GENERATE_WORD_PARTS = 1
GENERATE_NUMBER_PARTS = 2
CATENATE_WORDS = 4
CATENATE_NUMBERS = 8
CATENATE_ALL = 16
PRESERVE_ORIGINAL = 32
SPLIT_ON_CASE_CHANGE = 64
SPLIT_ON_NUMERICS = 128
STEM_ENGLISH_POSSESSIVE = 256

# char classes (WordDelimiterIterator.java:37-46)
_LOWER = 1
_UPPER = 2
_DIGIT = 4
_SUBWORD_DELIM = 8
_ALPHA = _LOWER | _UPPER


def _char_type(ch: str) -> int:
    cat = unicodedata.category(ch)
    if cat == "Lu":
        return _UPPER
    if cat == "Ll":
        return _LOWER
    if cat in ("Lt", "Lm", "Lo", "Mn", "Me", "Mc"):
        return _ALPHA
    if cat in ("Nd", "Nl", "No"):
        return _DIGIT
    if cat == "Cs":  # unpaired surrogate guard (Python strings rarely)
        return _ALPHA | _DIGIT
    return _SUBWORD_DELIM


class WordDelimiterGraphFilter:
    """Token filter on the list protocol."""

    def __init__(self, flags: int = (GENERATE_WORD_PARTS
                                     | GENERATE_NUMBER_PARTS
                                     | SPLIT_ON_CASE_CHANGE
                                     | SPLIT_ON_NUMERICS
                                     | STEM_ENGLISH_POSSESSIVE)):
        self.flags = flags

    # -- iterator ------------------------------------------------------
    def _is_break(self, last: int, cur: int) -> bool:
        # WordDelimiterIterator.isBreak
        if cur & last:
            return False
        f = self.flags
        if not (f & SPLIT_ON_CASE_CHANGE) and (last & _ALPHA) and (cur & _ALPHA):
            return False
        if (last & _UPPER) and (cur & _ALPHA):
            return False  # UPPER->letter never splits (ABCDef stays)
        if not (f & SPLIT_ON_NUMERICS) and (
                ((last & _ALPHA) and (cur & _DIGIT))
                or ((last & _DIGIT) and (cur & _ALPHA))):
            return False
        return True

    def _split(self, token: str):
        """Yield (start, end) subword spans; returns (spans, single_word)
        where single_word mirrors WordDelimiterIterator.isSingleWord."""
        types = [_char_type(c) for c in token]
        n = len(token)
        start_b, end_b = 0, n
        while start_b < n and types[start_b] == _SUBWORD_DELIM:
            start_b += 1
        while end_b > start_b and types[end_b - 1] == _SUBWORD_DELIM:
            end_b -= 1
        stem_poss = bool(self.flags & STEM_ENGLISH_POSSESSIVE)

        def ends_with_possessive(pos: int) -> bool:
            # WordDelimiterIterator.endsWithPossessive
            return (stem_poss and pos > 2
                    and token[pos - 2] == "'"
                    and token[pos - 1] in "sS"
                    and (types[pos - 3] & _ALPHA) != 0
                    and (pos == end_b or types[pos] == _SUBWORD_DELIM))

        spans = []
        has_final_poss = False
        cur = start_b
        skip_poss = False
        while cur < end_b:
            if skip_poss:
                cur += 2
                skip_poss = False
            while cur < end_b and types[cur] == _SUBWORD_DELIM:
                cur += 1
            if cur >= end_b:
                break
            last = types[cur]
            end = cur + 1
            while end < end_b:
                t = types[end]
                if self._is_break(last, t):
                    break
                last = t
                end = end + 1
            if end < end_b - 1 and ends_with_possessive(end + 2):
                skip_poss = True
            spans.append((cur, end))
            cur = end
        # final possessive marker (WordDelimiterIterator.setBounds)
        if stem_poss and spans and spans[-1][1] == end_b - 2 \
                and ends_with_possessive(end_b):
            has_final_poss = True
        single = (len(spans) == 1 and spans[0][0] == start_b
                  and spans[0][1] == (end_b - 2 if has_final_poss else end_b))
        # non-stemmed possessive leaves ' as delimiter; the iterator
        # naturally splits there (types["'"]==delim), handled above.
        return spans, single

    # -- emission ------------------------------------------------------
    def _emit(self, token: str, out: list):
        f = self.flags
        spans, single = self._split(token)
        if not spans:
            if f & PRESERVE_ORIGINAL:
                out.append(token)
            return
        if single:
            out.append(token[spans[0][0]:spans[0][1]])
            return
        if f & PRESERVE_ORIGINAL:
            out.append(token)
        parts = [token[s:e] for s, e in spans]
        if (f & CATENATE_ALL) and len(parts) > 1:
            out.append("".join(parts))
        # type runs (first-char class decides the subword type)
        types = [(_char_type(token[s]) & _DIGIT) != 0 for s, e in spans]
        i = 0
        while i < len(parts):
            j = i + 1
            while j < len(parts) and types[j] == types[i]:
                j += 1
            is_digit = types[i]
            cat_flag = CATENATE_NUMBERS if is_digit else CATENATE_WORDS
            gen_flag = (GENERATE_NUMBER_PARTS if is_digit
                        else GENERATE_WORD_PARTS)
            if (f & cat_flag) and (j - i > 1 or not (f & gen_flag)):
                out.append("".join(parts[i:j]))
            if f & gen_flag:
                out.extend(parts[i:j])
            i = j

    def __call__(self, terms):
        out: list = []
        for t in terms:
            self._emit(t, out)
        return out
