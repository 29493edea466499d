"""Search-result grouping: top-N groups, top-k hits per group.

Reference semantics: the grouping module's two-pass collectors
(``lucene/grouping/src/java/org/apache/lucene/search/grouping/
FirstPassGroupingCollector.java`` selects the top-N groups by the best
hit in each group; ``TopGroupsCollector.java`` + ``TopGroups.java``
then keep the top-k hits within each selected group; tests
``TestGrouping.java``). Group heads come from a stored keyword column
(the SortedDocValues grouping field role).

Ray-first shape: ONE pass over the normal per-segment scorer feed (the
Collector protocol) — each segment contributes only per-group partial
top-k rows and a per-group best score (combiner), so the driver-side
merge is O(groups * k), never O(matching docs). Determinism: groups
rank by (best desc, group value asc); hits within a group by
(score desc, doc_id asc) — the same tie orders TopDocs uses.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .query import Query, query_terms
from .searcher import Searcher


class GroupTopKCollector:
    """Collector (CollectorManager role) computing TopGroups.

    ``collect_segment(sr, docs, scores)`` receives the COMPLETE match
    set of one segment; the collector reduces it immediately to
    per-group partials (group value, local top-k docs, local best) so
    resident state stays O(groups * k).
    """

    def __init__(self, group_col: str, n_groups: int = 10, k: int = 3):
        self.group_col = group_col
        self.n_groups = n_groups
        self.k = k
        # group value -> (best_score, [(score, doc), ...] top-k)
        self._best: dict[str, float] = {}
        self._hits: dict[str, tuple[np.ndarray, np.ndarray]] = {}

    def collect_segment(self, sr, docs: np.ndarray,
                        scores: np.ndarray) -> None:
        vals = sr.stored(docs, self.group_col)
        keys, inv = np.unique(np.asarray(
            ["" if v is None else str(v) for v in vals]),
            return_inverse=True)
        scores = scores.astype(np.float64)
        for gi, gval in enumerate(keys):
            m = inv == gi
            gd, gs = docs[m], scores[m]
            # local top-k (score desc, doc asc)
            order = np.lexsort((gd, -gs))[:self.k]
            gd, gs = gd[order], gs[order]
            prev = self._hits.get(gval)
            if prev is not None:
                gd = np.concatenate([prev[0], gd])
                gs = np.concatenate([prev[1], gs])
                order = np.lexsort((gd, -gs))[:self.k]
                gd, gs = gd[order], gs[order]
            self._hits[gval] = (gd, gs)
            best = float(gs[0]) if len(gs) else -np.inf
            if best > self._best.get(gval, -np.inf):
                self._best[gval] = best

    def result(self) -> pa.Table:
        # group rank: best desc, group value asc (FirstPass group sort)
        groups = sorted(self._best,
                        key=lambda g: (-self._best[g], g))[:self.n_groups]
        gcol, grank, dcol, drank = [], [], [], []
        for gi, g in enumerate(groups, 1):
            gd, _gs = self._hits[g]
            for di, d in enumerate(gd, 1):
                gcol.append(g)
                grank.append(gi)
                dcol.append(int(d))
                drank.append(di)
        return pa.table({
            self.group_col: pa.array(gcol, pa.string()),
            "group_rank": pa.array(grank, pa.int64()),
            "doc_id": pa.array(dcol, pa.int64()),
            "doc_rank": pa.array(drank, pa.int64()),
        })


def group_topk(searcher: Searcher, q: Query, group_col: str,
               n_groups: int = 10, k: int = 3) -> pa.Table:
    """TopGroups for ``q`` grouped by the stored ``group_col``:
    (group, group_rank, doc_id, doc_rank) — the top-``n_groups``
    groups by best hit, the top-``k`` hits within each."""
    return searcher.collect(q, GroupTopKCollector(group_col, n_groups, k))
