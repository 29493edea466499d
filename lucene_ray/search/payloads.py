"""PayloadScoreQuery role (``queries/payloads/PayloadScoreQuery.java``
+ ``PayloadFunction`` hierarchy: MinPayloadFunction, MaxPayloadFunction,
AveragePayloadFunction, SumPayloadFunction; decoded by
``PayloadDecoder.FLOAT_DECODER``).

With ``include_span_score=False`` (the common term-weighting use) the
document's score IS the payload aggregate; with True it multiplies the
wrapped span query's score, as in the reference.
"""

from __future__ import annotations

import numpy as np

_FUNCS = {
    "min": lambda arrs: np.array([min(a) for a in arrs]),
    "max": lambda arrs: np.array([max(a) for a in arrs]),
    "avg": lambda arrs: np.array([sum(a) / len(a) for a in arrs]),
    "sum": lambda arrs: np.array([sum(a) for a in arrs]),
}


def payload_check(payload_dir: str, term: str, value: float) -> np.ndarray:
    """SpanPayloadCheckQuery role (``queries/payloads/
    SpanPayloadCheckQuery.java``): doc_ids (sorted) where at least one
    occurrence of ``term`` carries payload == ``value``."""
    from ..index.payload_index import payload_postings

    docs, pays = payload_postings(payload_dir, term)
    keep = [i for i, p in enumerate(pays)
            if any(float(x) == float(value) for x in p)]
    return docs[keep] if keep else np.empty(0, np.int64)


def payload_score(payload_dir: str, term: str, func: str = "sum",
                  *, searcher=None, include_span_score: bool = False):
    """(doc_ids, scores) for PayloadScoreQuery(SpanTermQuery(term),
    func): per matching doc, the payload aggregate over that doc's
    occurrences — optionally multiplied by the span (BM25) score."""
    from ..index.payload_index import payload_postings

    if func not in _FUNCS:
        raise ValueError(f"unknown payload function {func!r} "
                         f"(expected one of {sorted(_FUNCS)})")
    docs, pays = payload_postings(payload_dir, term)
    if len(docs) == 0:
        return docs, np.empty(0, np.float64)
    scores = _FUNCS[func](pays).astype(np.float64)
    if include_span_score:
        if searcher is None:
            raise ValueError("include_span_score needs a searcher")
        from .query import TermQuery
        sdocs, sscores = searcher.eval_complete(TermQuery(term))
        pos = np.searchsorted(sdocs, docs)
        ok = (pos < len(sdocs)) & (sdocs[np.minimum(pos, len(sdocs) - 1)]
                                   == docs)
        scores = scores * np.where(ok, sscores[np.minimum(
            pos, len(sdocs) - 1)], 0.0)
    return docs, scores
