"""Index readers: point-in-time snapshot over one manifest generation
(DirectoryReader analog, ``index/StandardDirectoryReader.java``).

A ``SegmentReader`` holds one segment's term dictionary (a hash of
term -> postings row) and per-doc arrays (doc_id, doc_len, norm) in
RAM. At test scale whole segments are resident; at 100 TB scale each
query worker holds only its doc-range slice of segments, and the term
dict would be swapped for term-sorted Parquet row-group pruning
(min/max term statistics play the FST index's role — SURVEY.md §1.2).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow.parquet as pq

from ..codecs.postings import PackedPostings
from ..index.manifest import IndexManifest, read_manifest


class SegmentReader:
    def __init__(self, seg_dir: str, cache_size: int = 256):
        t = pq.read_table(os.path.join(seg_dir, "postings.parquet"))
        self._terms = t.column("term").to_pylist()
        self._row = {term: i for i, term in enumerate(self._terms)}
        self._t = t
        d = pq.read_table(os.path.join(seg_dir, "docs.parquet"))
        self.doc_ids = d.column("doc_id").to_numpy()
        self.doc_lens = d.column("doc_len").to_numpy()
        self.norms = d.column("norm").to_numpy().astype(np.uint8)
        self._docs_table = d
        # contiguous docIDs (the common corpus layout) -> O(1) lookups
        n = len(self.doc_ids)
        self._contiguous = bool(
            n and self.doc_ids[-1] - self.doc_ids[0] == n - 1)
        self._base = int(self.doc_ids[0]) if n else 0
        # LRUQueryCache analog: hot terms' materialized postings
        from collections import OrderedDict
        self._cache: "OrderedDict[str, PackedPostings]" = OrderedDict()
        self._cache_size = cache_size

    def _idx_for(self, docs: np.ndarray) -> np.ndarray:
        if self._contiguous:
            return docs - self._base
        return np.searchsorted(self.doc_ids, docs)

    def __len__(self):
        return len(self.doc_ids)

    @property
    def num_terms(self):
        return len(self._terms)

    def terms(self):
        return iter(self._terms)

    def get_postings(self, term: str) -> PackedPostings | None:
        cached = self._cache.get(term)
        if cached is not None:
            self._cache.move_to_end(term)
            return cached
        i = self._row.get(term)
        if i is None:
            return None
        t = self._t
        has_pos = "positions" in t.column_names
        p = PackedPostings(
            doc_count=t.column("doc_count")[i].as_py(),
            ttf=t.column("ttf")[i].as_py(),
            docs=t.column("docs")[i].as_py(),
            freqs=t.column("freqs")[i].as_py(),
            block_last_docs=np.asarray(t.column("block_last_docs")[i].as_py(),
                                       dtype=np.int32),
            imp_freqs=np.asarray(t.column("imp_freqs")[i].as_py(), dtype=np.int32),
            imp_norms=np.asarray(t.column("imp_norms")[i].as_py(), dtype=np.uint8),
            imp_offsets=np.asarray(t.column("imp_offsets")[i].as_py(), dtype=np.int64),
            chunk_doc_counts=np.asarray(t.column("chunk_doc_counts")[i].as_py(),
                                        dtype=np.int32),
            positions=(t.column("positions")[i].as_py() or b"") if has_pos else b"",
            chunk_occ_counts=np.asarray(
                t.column("chunk_occ_counts")[i].as_py() or [],
                dtype=np.int64) if has_pos else np.empty(0, np.int64),
        )
        self._cache[term] = p
        if len(self._cache) > self._cache_size:
            self._cache.popitem(last=False)
        return p

    def get_positions(self, term: str):
        """(docs, freqs, flat positions) or None. Requires an index built
        with ``index_positions=True``."""
        from ..codecs.postings import unpack_positions, unpack_postings
        p = self.get_postings(term)
        if p is None:
            return None
        if not len(p.positions):
            raise ValueError(
                "index was built without positions (index_positions=True)")
        docs, freqs = unpack_postings(p)
        pos = unpack_positions(p.positions, p.chunk_occ_counts, freqs)
        return docs, freqs, pos

    def df(self, term: str) -> int:
        i = self._row.get(term)
        return 0 if i is None else self._t.column("df")[i].as_py()

    def norms_for(self, docs: np.ndarray) -> np.ndarray:
        """Norm bytes for (sorted or unsorted) global docIDs in this segment."""
        return self.norms[self._idx_for(docs)]

    def doc_lens_for(self, docs: np.ndarray) -> np.ndarray:
        return self.doc_lens[self._idx_for(docs)]

    def stored(self, docs: np.ndarray, col: str):
        idx = self._idx_for(docs)
        return self._docs_table.column(col).take(idx).to_pylist()


class IndexReader:
    """Opens the latest (or a pinned) manifest generation."""

    def __init__(self, index_dir: str, generation: int | None = None,
                 segment_ids: list[str] | None = None):
        self.index_dir = index_dir
        self.manifest: IndexManifest = read_manifest(index_dir, generation)
        segs = self.manifest.segments
        if segment_ids is not None:
            want = set(segment_ids)
            segs = [s for s in segs if s.seg_id in want]
        self.segment_infos = segs
        self._readers: dict[str, SegmentReader] = {}
        self._term_stats: dict[str, tuple[int, int]] | None = None

    @property
    def doc_count(self) -> int:  # docs with the field (for idf / avgdl)
        return self.manifest.field_doc_count

    @property
    def num_docs(self) -> int:
        return self.manifest.num_docs

    @property
    def sum_total_term_freq(self) -> int:
        return self.manifest.sum_doc_len

    def segment(self, seg_id: str) -> SegmentReader:
        r = self._readers.get(seg_id)
        if r is None:
            r = SegmentReader(os.path.join(self.index_dir, "segments", seg_id))
            self._readers[seg_id] = r
        return r

    def segments(self):
        for info in self.segment_infos:
            yield self.segment(info.seg_id)

    def term_stats(self, terms: list[str]) -> dict[str, tuple[int, int]]:
        """Global (df, ttf) per term — TermStates.build analog.

        Loads the merged term_stats table once per reader (vocabulary-
        sized; at larger scale this becomes a predicate-pushdown read of
        only the query terms' row groups)."""
        if self._term_stats is None:
            gen = self.manifest.generation
            path = os.path.join(self.index_dir, "global", f"term_stats_gen{gen}")
            stats: dict[str, tuple[int, int]] = {}
            if os.path.isdir(path):
                t = pq.read_table(path)
                for term, df, ttf in zip(t.column("term").to_pylist(),
                                         t.column("df").to_pylist(),
                                         t.column("ttf").to_pylist()):
                    stats[term] = (df, ttf)
            else:
                # fall back: aggregate from segments (small indexes only)
                for sr in self.segments():
                    tt = sr._t
                    for term, df, ttf in zip(tt.column("term").to_pylist(),
                                             tt.column("df").to_pylist(),
                                             tt.column("ttf").to_pylist()):
                        d, f = stats.get(term, (0, 0))
                        stats[term] = (d + df, f + ttf)
            self._term_stats = stats
        return {t: self._term_stats.get(t, (0, 0)) for t in terms}
