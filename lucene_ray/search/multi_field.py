"""Cross-field search over a multi-field index
(``index/multi_field.build_multi_field_index`` layout).

Leaf queries route to their field's single-field Searcher (exact
per-field BM25 stats/norms); boolean/dismax trees combine the COMPLETE
per-leaf (docs, scores) on global docIDs — the BooleanWeight-over-
fields analog (``index/FieldInfos.java`` gives the reference per-field
postings inside one segment; here each field is its own index sharing
docIDs). Combination semantics mirror ``Searcher._eval_nested``:
scores sum in double, FILTER matches without scoring, minShouldMatch
gates SHOULD, DisMax = max + tie_breaker * rest.
"""

from __future__ import annotations

import os
from dataclasses import replace

import numpy as np

from ..index.multi_field import read_multi_field_meta
from .query import (
    BooleanQuery,
    BoostQuery,
    ConstantScoreQuery,
    DisjunctionMaxQuery,
    MatchAllDocsQuery,
    Query,
)
from .reader import IndexReader
from .searcher import Searcher, TopDocs, _top_k


class MultiFieldSearcher:
    def __init__(self, out_dir: str, similarity: str = "lucene"):
        meta = read_multi_field_meta(out_dir)
        self.default_field = meta["default_field"]
        self.fields = meta["fields"]
        self.searchers = {
            f: Searcher(IndexReader(os.path.join(out_dir, "fields", f)),
                        similarity=similarity)
            for f in self.fields}
        self.exact64 = similarity == "bm25_exact64"

    # -- evaluation ----------------------------------------------------------
    def _leaf(self, q: Query):
        fld = getattr(q, "field", None) or self.default_field
        s = self.searchers.get(fld)
        if s is None:  # absent field matches nothing (Lucene semantics)
            return np.empty(0, np.int64), np.empty(0, np.float64)
        if getattr(q, "field", None) is not None:
            q = replace(q, field=None)
        return s.eval_complete(q)

    def _eval(self, q: Query):
        if isinstance(q, BoostQuery):
            d, s = self._eval(q.inner)
            return d, s * np.float64(q.boost)
        if isinstance(q, ConstantScoreQuery):
            d, _ = self._eval(q.inner)
            return d, np.full(len(d), np.float64(q.boost))
        if isinstance(q, MatchAllDocsQuery):
            parts = [sr.doc_ids.astype(np.int64)
                     for sr in self.searchers[self.default_field]
                     .reader.segments()]
            docs = (np.sort(np.concatenate(parts)) if parts
                    else np.empty(0, np.int64))
            return docs, np.full(len(docs), np.float64(q.boost))
        if isinstance(q, DisjunctionMaxQuery):
            per = [self._eval(s) for s in q.disjuncts]
            per = [(d, s) for d, s in per if len(d)]
            if not per:
                return np.empty(0, np.int64), np.empty(0, np.float64)
            cand = np.unique(np.concatenate([d for d, _ in per]))
            mx = np.full(len(cand), -np.inf)
            total = np.zeros(len(cand), np.float64)
            for d, s in per:
                pos = np.searchsorted(cand, d)
                np.maximum.at(mx, pos, s)
                total[pos] += s
            return cand, mx + q.tie_breaker * (total - mx)
        if isinstance(q, BooleanQuery):
            return self._eval_bool(q)
        return self._leaf(q)

    def _eval_bool(self, q: BooleanQuery):
        empty = (np.empty(0, np.int64), np.empty(0, np.float64))
        m_parts = [self._eval(c) for c in q.must]
        f_parts = [self._eval(c)[0] for c in q.filter]
        cand = None
        for d, _ in m_parts:
            cand = d if cand is None else cand[np.isin(cand, d,
                                                       assume_unique=True)]
        for d in f_parts:
            cand = d if cand is None else cand[np.isin(cand, d,
                                                       assume_unique=True)]
        s_parts = [self._eval(c) for c in q.should]
        msm = q.min_should_match
        if cand is None:
            if not s_parts:
                return empty
            msm = max(msm, 1)
            parts = [d for d, _ in s_parts if len(d)]
            if not parts:
                return empty
            cand = np.unique(np.concatenate(parts))
        if len(cand) == 0:
            return empty
        sums = np.zeros(len(cand), np.float64)
        counts = np.zeros(len(cand), np.int64)
        for d, s in m_parts + s_parts:
            idx = np.searchsorted(cand, d)
            ok = (idx < len(cand)) & \
                (cand[np.minimum(idx, len(cand) - 1)] == d)
            sums[idx[ok]] += s[ok]
        for d, _ in s_parts:
            idx = np.searchsorted(cand, d)
            ok = (idx < len(cand)) & \
                (cand[np.minimum(idx, len(cand) - 1)] == d)
            counts[idx[ok]] += 1
        if s_parts and msm > 0:
            keep = counts >= msm
            cand, sums = cand[keep], sums[keep]
        for c in q.must_not:
            if len(cand) == 0:
                break
            d, _ = self._eval(c)
            keep = ~np.isin(cand, d, assume_unique=True)
            cand, sums = cand[keep], sums[keep]
        return cand, sums

    # -- public API ----------------------------------------------------------
    def search(self, q: Query, k: int = 10) -> TopDocs:
        docs, scores = self._eval(q)
        if len(docs) == 0:
            return TopDocs(np.empty(0, np.int64), np.empty(0, np.float32))
        sc = scores if self.exact64 else scores.astype(np.float32)
        return _top_k(docs, sc, k)

    def match_docs(self, q: Query) -> np.ndarray:
        docs, _ = self._eval(q)
        return docs

    def count(self, q: Query) -> int:
        return len(self.match_docs(q))
