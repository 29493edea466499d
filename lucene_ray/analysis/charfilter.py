"""CharFilter stage: pre-tokenizer text transforms.

Reference: the CharFilter slot of ``Analyzer.createComponents``
(``lucene/core/src/java/org/apache/lucene/analysis/CharFilter.java``)
and ``HTMLStripCharFilter``
(``lucene/analysis/common/src/java/org/apache/lucene/analysis/
charfilter/HTMLStripCharFilter.jflex``, tests
``TestHTMLStripCharFilter.java``). The jflex scanner's semantics, as
encoded by its test suite, are:

- markup is removed; INLINE elements (b, i, span, em, ...) leave no
  separator (``find<b>jim</b>`` -> ``findjim``) while all other
  elements are replaced by a newline (``one<p>two`` -> ``one\\ntwo``)
- SCRIPT and STYLE elements disappear with their content
- comments, processing instructions, doctype and CDATA markers are
  stripped (CDATA content is kept)
- character entities are decoded (``&Uuml;`` -> ``Ü``, numeric
  ``&#61;`` / ``&#x393;`` forms included)

This module re-implements that contract directly (regex scanner over
Python's HTML5 entity table), not the generated DFA.
"""

from __future__ import annotations

import html as _html
import re

# HTMLStripCharFilter.jflex InlineElments set
_INLINE = frozenset("""a abbr acronym b basefont bdo big cite code dfn em
font i img input kbd label q s samp select small span strike strong sub
sup textarea tt u var""".split())

_SCRIPT_STYLE = re.compile(
    r"<(script|style)\b[^>]*>.*?</\1\s*>", re.IGNORECASE | re.DOTALL)
_COMMENT = re.compile(r"<!--.*?-->", re.DOTALL)
_PI_DOCTYPE = re.compile(r"<[!?][^>]*>")
_CDATA_OPEN = re.compile(r"<!\[CDATA\[", re.IGNORECASE)
_CDATA_CLOSE = re.compile(r"\]\]>")
_TAG = re.compile(r"</?\s*([a-zA-Z][a-zA-Z0-9:_-]*)(\s[^<>]*?)?/?\s*>")


def html_strip(text) -> str:
    """HTMLStripCharFilter analog: markup out, text (entities decoded)
    through. Accepts str or utf-8 bytes (the input_hint's
    ``html: binary`` column)."""
    if text is None:
        return ""
    if isinstance(text, (bytes, bytearray, memoryview)):
        text = bytes(text).decode("utf-8", errors="replace")
    text = _SCRIPT_STYLE.sub("\n", text)
    text = _COMMENT.sub("", text)
    text = _CDATA_OPEN.sub("", text)
    text = _CDATA_CLOSE.sub("", text)
    text = _PI_DOCTYPE.sub("", text)

    def _tag(m: re.Match) -> str:
        return "" if m.group(1).lower() in _INLINE else "\n"

    text = _TAG.sub(_tag, text)
    return _html.unescape(text)


class HTMLStripCharFilter:
    """Callable form for the AnalyzerChain char-filter slot."""

    def __call__(self, text) -> str:
        return html_strip(text)
