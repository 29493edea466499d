"""ASCII folding (``analysis/common/src/java/org/apache/lucene/analysis/
miscellaneous/ASCIIFoldingFilter.java`` analog).

Folds Unicode characters in the Latin blocks (Latin-1 Supplement,
Latin Extended A/B/Additional, IPA/phonetic extensions, fullwidth
forms, typographic punctuation) to their nearest ASCII equivalents:
``é -> e``, ``Æ -> AE``, ``ß -> ss``, curly quotes -> straight quotes.
Characters with no mapping (Greek, Cyrillic, CJK, bare combining
marks) pass through unchanged — byte-for-byte the reference contract.

The character table is the published folding table (vendored as
``data/ascii_folding.tsv``, 1242 mappings — the same conformance data
the reference asserts in ``TestASCIIFoldingFilter.testAllFoldings``,
re-extracted by ``tools/extract_ascii_folding.py``); the code here is
an ordinary table-driven ``str.translate``.
"""

from __future__ import annotations

import os

_TABLE: dict[int, str] | None = None


def _table() -> dict[int, str]:
    global _TABLE
    if _TABLE is None:
        path = os.path.join(os.path.dirname(__file__), "data",
                            "ascii_folding.tsv")
        t = {}
        with open(path, encoding="utf-8") as f:
            for line in f:
                cp, _, out = line.rstrip("\n").partition("\t")
                t[int(cp, 16)] = out
        _TABLE = t
    return _TABLE


def ascii_fold(text: str) -> str:
    """Fold one string; ASCII input returns itself (no copy)."""
    if text.isascii():
        return text
    return text.translate(_table())


class ASCIIFoldingFilter:
    """Token filter on the list protocol: each term is folded; with
    ``preserve_original`` the unfolded term is also emitted (after the
    folded one, same position — ASCIIFoldingFilter.java:85)."""

    def __init__(self, preserve_original: bool = False):
        self.preserve_original = preserve_original

    def __call__(self, terms):
        out = []
        for t in terms:
            f = ascii_fold(t)
            out.append(f)
            if self.preserve_original and f != t:
                out.append(t)
        return out
