"""Facet counting + drill-down over stored keyword columns.

The reference's facet module collects matching docs and counts their
category ordinals (``facet/FacetsCollector.java:49``,
``facet/StringDocValuesReaderState`` / SortedSetDocValuesFacetCounts;
drill-down = ``facet/DrillDownQuery.java``). Ray-first shape: the
matching docIDs come from the normal query path per segment, the
category values come from a doc_id-pushdown read of the stored column,
and counts pre-aggregate per segment before one tiny driver combine —
no shuffle of per-doc rows.
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pyarrow as pa

from .query import BooleanQuery, Query, TermQuery
from .searcher import Searcher


def facet_counts(searcher: Searcher, q: Query, col: str,
                 top_n: int | None = None) -> pa.Table:
    """(value, count) over docs matching ``q``, counted from the stored
    ``col`` — count desc, ties by value asc (FacetResult ordering)."""
    q = searcher.rewrite(q)
    from .query import query_terms
    searcher._prefetch(sorted(set(query_terms(q))))
    total: Counter = Counter()
    for sr in searcher.reader.segments():
        docs = searcher._match_docs(sr, q)
        if len(docs) == 0:
            continue
        # per-segment partial count (combiner): only (value, n) leaves
        vals = sr.stored(np.sort(docs), col)
        total.update(v for v in vals if v is not None)
    items = sorted(total.items(), key=lambda kv: (-kv[1], kv[0]))
    if top_n is not None:
        items = items[:top_n]
    return pa.table({
        col: pa.array([v for v, _ in items], pa.string()),
        "count": pa.array([n for _, n in items], pa.int64()),
    })


def drill_down(base: Query, col_terms: dict[str, str],
               keyword_fields: bool = True) -> Query:
    """DrillDownQuery analog: base query + one FILTER per (field,
    value) — for multi-field indexes where facet dimensions are
    keyword fields."""
    filters = tuple(TermQuery(v, field=f) for f, v in col_terms.items())
    if isinstance(base, BooleanQuery):
        return BooleanQuery(must=base.must, should=base.should,
                            must_not=base.must_not,
                            filter=base.filter + filters,
                            min_should_match=base.min_should_match)
    return BooleanQuery(must=(base,), filter=filters)
