"""MemoryIndex: a single-document in-memory index — the memory module
(``lucene/memory/src/java/org/apache/lucene/index/memory/
MemoryIndex.java``, tests ``TestMemoryIndex.java``): analyze one
document once, then run any number of queries against it, each
returning the BM25 score the document would get in a real one-doc
index (the reference's percolation / "would this doc match?" tool).

Matching reuses the monitor module's exact per-doc walks
(``monitor.matches_doc`` — same phrase/span machinery as the
searcher); scoring applies the exact64 BM25 with single-doc collection
stats: N = 1, df(t) = 1 for present terms, avgdl = dl, so
idf = ln(1 + 0.5/1.5) and the length norm is exactly 1.
"""

from __future__ import annotations

import math

import numpy as np

from .query import (
    BooleanQuery, BoostQuery, ConstantScoreQuery, DisjunctionMaxQuery,
    MatchAllDocsQuery, PhraseQuery, Query, SpanNearQuery, TermQuery,
)
from .monitor import matches_doc

K1, B = 1.2, 0.75
_IDF1 = math.log(1.0 + 0.5 / 1.5)  # idf with N=1, df=1


class MemoryIndex:
    """One analyzed document; ``search(q)`` -> float score (0.0 = no
    match, like MemoryIndex.search)."""

    def __init__(self, text: str, analyzer=None, numerics=None,
                 k1: float = K1, b: float = B):
        if analyzer is None:
            from ..analysis.analyzer import StandardAnalyzer
            analyzer = StandardAnalyzer()
        toks = analyzer(text)
        self.dl = len(toks)
        self.pos: dict[str, np.ndarray] = {}
        for i, t in enumerate(toks):
            self.pos.setdefault(t, []).append(i)
        self.pos = {t: np.asarray(p, dtype=np.int64)
                    for t, p in self.pos.items()}
        self.numerics = numerics or {}
        self.k1 = k1
        self.b = b

    # --- scoring ----------------------------------------------------------
    def _tf_score(self, freq: float, boost: float = 1.0,
                  idf: float = _IDF1) -> float:
        # dl == avgdl -> norm factor is exactly 1
        return boost * idf * freq / (freq + self.k1)

    def _score(self, q: Query, boost: float = 1.0) -> tuple[bool, float]:
        """(matches, score)."""
        if isinstance(q, TermQuery):
            p = self.pos.get(q.term)
            if p is None:
                return False, 0.0
            return True, self._tf_score(float(len(p)), boost * q.boost)
        if isinstance(q, MatchAllDocsQuery):
            return True, boost * q.boost
        if isinstance(q, BoostQuery):
            return self._score(q.inner, boost * q.boost)
        if isinstance(q, ConstantScoreQuery):
            if matches_doc(q.inner, self.pos, self.numerics):
                return True, boost * q.boost
            return False, 0.0
        if isinstance(q, DisjunctionMaxQuery):
            parts = [self._score(d, boost) for d in q.disjuncts]
            hits = [s for ok, s in parts if ok]
            if not hits:
                return False, 0.0
            mx = max(hits)
            return True, mx + q.tie_breaker * (sum(hits) - mx)
        if isinstance(q, BooleanQuery):
            if not matches_doc(q, self.pos, self.numerics):
                return False, 0.0
            total = 0.0
            for c in q.must:
                total += self._score(c, boost)[1]
            for c in q.should:
                ok, s = self._score(c, boost)
                if ok:
                    total += s
            return True, total  # filter/must_not contribute no score
        if isinstance(q, PhraseQuery):
            if not matches_doc(q, self.pos, self.numerics):
                return False, 0.0
            from .searcher import Searcher
            slots = [self.pos[t] - i for i, t in enumerate(q.terms)]
            if len(slots) == 1:
                freq = float(len(slots[0]))
            elif q.slop == 0:
                base = slots[0]
                for s in slots[1:]:
                    base = base[np.isin(base, s)]
                freq = float(len(base))
            else:
                rpt = Searcher._repeat_groups(q.terms)
                freq = Searcher._sloppy_freq_doc(
                    slots, rpt, q.slop, len(set(q.terms)) < len(q.terms))
            idf_sum = _IDF1 * len(q.terms)
            return True, self._tf_score(freq, boost * q.boost, idf_sum)
        if isinstance(q, SpanNearQuery):
            if not matches_doc(q, self.pos, self.numerics):
                return False, 0.0
            from .searcher import Searcher
            slots = [self.pos[t] for t in q.terms]
            n = len(slots)
            if n == 1:
                freq = float(len(slots[0]))
            elif q.in_order:
                freq = Searcher._ordered_span_freq(slots, q.slop)
            else:
                rpt = Searcher._repeat_groups(q.terms)
                freq = Searcher._sloppy_freq_doc(
                    slots, rpt, q.slop, len(set(q.terms)) < n,
                    offsets=[0] * n, span_offset=n - 1)
            idf_sum = _IDF1 * len(q.terms)
            return True, self._tf_score(freq, boost * q.boost, idf_sum)
        # multi-term / numeric etc.: constant-score on match
        if matches_doc(q, self.pos, self.numerics):
            return True, boost * getattr(q, "boost", 1.0)
        return False, 0.0

    def search(self, q: Query) -> float:
        ok, s = self._score(q)
        return s if ok else 0.0
