"""URL + email preserving tokenization (UAX29URLEmailTokenizer analog).

The reference tokenizer
(``lucene/analysis/common/src/java/org/apache/lucene/analysis/email/
UAX29URLEmailTokenizer.java``, grammar ``UAX29URLEmailTokenizerImpl.jflex``,
tests ``TestUAX29URLEmailTokenizer.java``) extends the standard UAX#29
word-break rules with two extra top-priority token types: ``<URL>``
(RFC 3986-shaped, scheme or ``www.`` led) and ``<EMAIL>`` (RFC 5321/5322
addr-spec with optional quoted local part). This analog pre-scans the
text for URL/email spans with compiled regexes (longest-leftmost, URL
before EMAIL at equal start like the grammar's priority order), emits
each span as one token, and delegates the gaps to the standard
tokenizer — the exact web-text use case: mailto/link tokens survive as
single searchable terms instead of shattering into host/path fragments.
"""

from __future__ import annotations

import re

from .analyzer import DEFAULT_MAX_TOKEN_LENGTH
from .props import java_lowercase
from .tokenizer import Token, tokenize

URL = "<URL>"
EMAIL = "<EMAIL>"

# RFC3986-ish absolute URL (scheme://...) or scheme-relative www. form.
# Trailing unbalanced punctuation is excluded the way browsers/linkifiers
# do (the JFlex grammar encodes this via its path productions).
_URL_CORE = (
    r"(?:(?:https?|ftp|file)://|www\.)"          # scheme or www.
    r"[\w.-]+(?::\d{1,5})?"                       # host[:port]
    r"(?:/[^\s<>\"'`{}|\\^\[\]]*)?"               # /path?query#frag
)
# addr-spec: dot-atom or quoted local @ dotted domain with alpha TLD
_EMAIL_CORE = (
    r"(?:\"[^\"\\\r\n]{1,62}\"|[A-Za-z0-9!#$%&'*+/=?^_`{|}~-]+"
    r"(?:\.[A-Za-z0-9!#$%&'*+/=?^_`{|}~-]+)*)"
    r"@(?:[A-Za-z0-9](?:[A-Za-z0-9-]{0,61}[A-Za-z0-9])?\.)+"
    r"[A-Za-z]{2,24}"
)
# scheme matching is case-insensitive (the grammar's [hH][tT][tT][pP]...)
_SPAN_RE = re.compile(f"(?P<url>{_URL_CORE})|(?P<email>{_EMAIL_CORE})",
                      re.IGNORECASE)
_TRIM_RE = re.compile(r"[.,;:!?'\"\]}>]+$")


def _find_spans(text: str):
    """(start, end, type) spans, trailing punctuation trimmed."""
    for m in _SPAN_RE.finditer(text):
        kind = URL if m.lastgroup == "url" else EMAIL
        s, e = m.span()
        if kind == URL:
            u = _TRIM_RE.sub("", text[s:e])
            # a trailing ')' stays only while parens balance
            # (wiki-style "(see http://x/y_(z))" links)
            while u.endswith(")") and u.count(")") > u.count("("):
                u = _TRIM_RE.sub("", u[:-1])
            e = s + len(u)
        if e > s:
            yield s, e, kind


def tokenize_urlemail(text: str,
                      max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH
                      ) -> list[Token]:
    """Token stream with <URL>/<EMAIL> spans intact, standard rules
    elsewhere. Over-long spans are skipped like over-long standard
    tokens (StandardTokenizer.java:145-167 buffer semantics)."""
    out: list[Token] = []
    last = 0

    def gap(lo: int, hi: int):
        if hi > lo:
            for t in tokenize(text[lo:hi], max_token_length):
                out.append(Token(t.text, t.start + lo, t.end + lo, t.type))

    for s, e, kind in _find_spans(text):
        if s < last:
            continue
        gap(last, s)
        if e - s <= max_token_length:
            out.append(Token(text[s:e], s, e, kind))
        last = e
    gap(last, len(text))
    return out


class UAX29URLEmailAnalyzer:
    """tokenize_urlemail -> lowercase -> stop filter
    (``email/UAX29URLEmailAnalyzer.java`` chain)."""

    def __init__(self, stop_words=frozenset(),
                 max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH):
        self.stop_words = frozenset(stop_words)
        self.max_token_length = max_token_length

    def __call__(self, text: str) -> list[str]:
        terms = [java_lowercase(t.text)
                 for t in tokenize_urlemail(text, self.max_token_length)]
        if self.stop_words:
            terms = [t for t in terms if t not in self.stop_words]
        return terms

    def analyze_batch(self, texts) -> list[list[str]]:
        return [self(t) if t is not None else [] for t in texts]
