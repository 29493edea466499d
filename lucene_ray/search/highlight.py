"""Passage highlighting — the unified highlighter's role
(``lucene/highlighter/src/java/org/apache/lucene/search/uhighlight/
UnifiedHighlighter.java``): re-analyze the stored text, find query-term
occurrences by OFFSET (the analyzer keeps start/end per token), pick
the best-scoring passages, and mark the hits.

Passage scoring follows the reference's shape: passages are scored by
unique matched terms first (coverage), then total hits, then earlier
start; ties are deterministic.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..analysis import StandardAnalyzer
from .query import Query, query_terms
from .searcher import Searcher


def highlight_text(text: str, terms, *, analyzer=None,
                   max_passages: int = 1, passage_len: int = 100,
                   pre: str = "<b>", post: str = "</b>") -> list[str]:
    """Best ``max_passages`` snippets of ``text`` with query terms
    wrapped in pre/post tags. Terms match on ANALYZED tokens (so
    casing/punctuation behave like search)."""
    analyzer = analyzer or StandardAnalyzer()
    want = set(terms)
    hits = [(t.start, t.end, t.term) for t in analyzer.tokens(text or "")
            if t.term in want]
    return _assemble_passages(text, hits, max_passages=max_passages,
                              passage_len=passage_len, pre=pre, post=post)


def _assemble_passages(text: str, hits, *, max_passages: int = 1,
                       passage_len: int = 100, pre: str = "<b>",
                       post: str = "</b>") -> list[str]:
    """Passage selection + tag insertion over precomputed hit offsets
    (shared by the analyze-at-query-time highlighter above and the
    term-vector FastVectorHighlighter below)."""
    if not hits:
        return []
    # candidate passages: fixed windows anchored at each hit start
    passages = []
    for i, (s, _e, _t) in enumerate(hits):
        lo = max(0, s - passage_len // 4)
        hi = min(len(text), lo + passage_len)
        inside = [(hs, he, ht) for hs, he, ht in hits if lo <= hs and he <= hi]
        uniq = len({ht for _, _, ht in inside})
        passages.append((uniq, len(inside), -lo, lo, hi, inside))
    # coverage desc, hit count desc, earlier start; dedupe overlaps
    passages.sort(reverse=True)
    chosen = []
    taken: list[tuple[int, int]] = []
    for uniq, nh, _negl, lo, hi, inside in passages:
        if any(not (hi <= tl or lo >= th) for tl, th in taken):
            continue
        chosen.append((lo, hi, inside))
        taken.append((lo, hi))
        if len(chosen) >= max_passages:
            break
    out = []
    for lo, hi, inside in sorted(chosen):
        parts = []
        pos = lo
        for hs, he, _t in sorted(inside):
            if hs < pos:
                continue
            parts.append(text[pos:hs])
            parts.append(pre + text[hs:he] + post)
            pos = he
        parts.append(text[pos:hi])
        snippet = "".join(parts)
        if lo > 0:
            snippet = "..." + snippet
        if hi < len(text):
            snippet = snippet + "..."
        out.append(snippet)
    return out


def highlight_topk(searcher: Searcher, q: Query, k: int = 10,
                   text_col: str = "text", *, passage_len: int = 100,
                   analyzer=None) -> pa.Table:
    """Search + highlight: (doc_id, rank, snippet) for the top-k docs.
    The stored text is fetched with docID predicate pushdown (only the
    k hits' rows are read)."""
    rq = searcher.rewrite(q)
    terms = set(query_terms(rq))
    td = searcher.search(q, k)
    snippets = []
    by_seg: dict = {}
    infos = searcher.reader.segment_infos
    for d in td.doc_ids.tolist():
        for info in infos:
            if info.min_doc <= d <= info.max_doc:
                by_seg.setdefault(info.seg_id, []).append(d)
                break
    texts: dict[int, str] = {}
    for seg_id, docs in by_seg.items():
        sr = searcher.reader.segment(seg_id)
        vals = sr.stored(np.asarray(docs, np.int64), text_col)
        texts.update(zip(docs, vals))
    for d in td.doc_ids.tolist():
        snips = highlight_text(texts.get(d) or "", terms,
                               analyzer=analyzer, passage_len=passage_len)
        snippets.append(snips[0] if snips else "")
    return pa.table({
        "doc_id": pa.array(td.doc_ids, pa.int64()),
        "rank": pa.array(np.arange(1, len(td.doc_ids) + 1), pa.int64()),
        "snippet": pa.array(snippets, pa.string()),
    })


def fast_vector_highlight(reader, doc_id: int, terms, *, text: str,
                          max_passages: int = 1, passage_len: int = 100,
                          pre: str = "<b>", post: str = "</b>") -> list[str]:
    """FastVectorHighlighter role (``lucene/highlighter/src/java/.../
    vectorhighlight/FastVectorHighlighter.java``): hit offsets come from
    the offsets-bearing TERM VECTOR (no re-analysis of the document at
    query time — the property that makes FVH fast on huge docs); the
    raw text is used only for passage slicing. Requires an index built
    with ``term_vector_offsets=True``."""
    tv = reader.term_vector_offsets(doc_id)
    want = set(terms)
    hits = []
    for i in range(len(tv)):
        term = tv.column("term")[i].as_py()
        if term in want:
            ss = tv.column("starts")[i].as_py()
            es = tv.column("ends")[i].as_py()
            hits.extend((s, e, term) for s, e in zip(ss, es))
    hits.sort()
    return _assemble_passages(text, hits, max_passages=max_passages,
                              passage_len=passage_len, pre=pre, post=post)
