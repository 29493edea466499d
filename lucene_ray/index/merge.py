"""Segment merge: the groupby-on-term shuffle.

Reference semantics (SURVEY.md §3.2): ``TieredMergePolicy.findMerges``
(segsPerTier=10, maxMergedSegmentBytes cap — ``TieredMergePolicy.java:
89-95,317``) selects groups of small segments; ``SegmentMerger`` k-way
merges posting lists per term with docBase remapping
(``SegmentMerger.java:104-158``, ``MultiTermsEnum``).

Ray-native design: docIDs are already global (data-derived), so merging
postings of one term across doc-disjoint segments is an ordered *chunk
concat* — no re-encode. The shuffle is ``groupby('term')`` over the
segments' posting rows; ``map_groups`` orders chunks by segment doc
range and concatenates packed blocks. Term-frequency skew (Zipf head):
with ``salt_buckets > 1`` the first shuffle keys on
``(term, seg_ord // bucket)`` so one hot term's chunks land on many
reducers; a second tiny groupby concatenates the per-bucket partials in
order (salted repartition per the north rule; sub-runs stay doc-sorted
because bucketing follows segment order).

``repack=True`` additionally re-blocks into full 128-doc blocks and
recomputes impacts from norms (forceMerge(1) analog).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data

from ..codecs.postings import PackedPostings, concat_postings, repack_postings
from .builder import POSTINGS_SCHEMA
from .manifest import IndexManifest, SegmentInfo, read_manifest, write_manifest


def plan_merges(segments: list[SegmentInfo], segs_per_tier: int = 10,
                max_merged_docs: int = 10_000_000) -> list[list[SegmentInfo]]:
    """Group doc-range-adjacent segments into merge candidates.

    TieredMergePolicy-lite: walk segments in doc order, open a group
    while it stays under both the per-tier segment count and the merged
    size cap; singleton groups are left unmerged.
    """
    groups: list[list[SegmentInfo]] = []
    cur: list[SegmentInfo] = []
    cur_docs = 0
    for s in sorted(segments, key=lambda x: x.min_doc):
        if cur and (len(cur) >= segs_per_tier or cur_docs + s.num_docs > max_merged_docs):
            groups.append(cur)
            cur, cur_docs = [], 0
        cur.append(s)
        cur_docs += s.num_docs
    if cur:
        groups.append(cur)
    return groups


def _row_to_packed(r: dict) -> PackedPostings:
    return PackedPostings(
        doc_count=r["doc_count"], ttf=r["ttf"], docs=r["docs"], freqs=r["freqs"],
        block_last_docs=np.asarray(r["block_last_docs"], dtype=np.int32),
        imp_freqs=np.asarray(r["imp_freqs"], dtype=np.int32),
        imp_norms=np.asarray(r["imp_norms"], dtype=np.uint8),
        imp_offsets=np.asarray(r["imp_offsets"], dtype=np.int64),
        chunk_doc_counts=np.asarray(r["chunk_doc_counts"], dtype=np.int32),
    )


def _packed_to_cols(term: str, p: PackedPostings, rows: dict) -> None:
    rows["term"].append(term)
    rows["df"].append(p.doc_count)
    rows["ttf"].append(p.ttf)
    rows["doc_count"].append(p.doc_count)
    rows["docs"].append(p.docs)
    rows["freqs"].append(p.freqs)
    rows["block_last_docs"].append(np.asarray(p.block_last_docs, dtype=np.int32))
    rows["imp_freqs"].append(np.asarray(p.imp_freqs, dtype=np.int32))
    rows["imp_norms"].append(np.asarray(p.imp_norms).astype(np.int32))
    rows["imp_offsets"].append(np.asarray(p.imp_offsets, dtype=np.int32))
    rows["chunk_doc_counts"].append(np.asarray(p.chunk_doc_counts, dtype=np.int32))


_MERGED_COLS = ("term", "df", "ttf", "doc_count", "docs", "freqs",
                "block_last_docs", "imp_freqs", "imp_norms", "imp_offsets",
                "chunk_doc_counts")


def _merge_group_fn(group: pa.Table) -> pa.Table:
    """map_groups fn: all chunks of one term (or one term-bucket) ->
    one concatenated posting row. Chunks ordered by segment doc range."""
    rows = group.to_pylist()
    rows.sort(key=lambda r: r["seg_ord"])
    merged = concat_postings([_row_to_packed(r) for r in rows])
    out = {k: [] for k in _MERGED_COLS}
    _packed_to_cols(rows[0]["term"], merged, out)
    out_t = pa.Table.from_pydict(out, schema=POSTINGS_SCHEMA)
    return out_t.append_column("seg_ord", pa.array([rows[0]["seg_ord"]], pa.int64()))


def merge_group(index_dir: str, group: list[SegmentInfo], out_seg_id: str,
                *, salt_buckets: int = 1, repack: bool = False) -> SegmentInfo:
    """Merge one group of doc-disjoint segments into a new segment."""
    group = sorted(group, key=lambda s: s.min_doc)
    parts = []
    for ord_, s in enumerate(group):
        p = os.path.join(index_dir, "segments", s.seg_id, "postings.parquet")
        ds = ray.data.read_parquet(p)
        ds = ds.add_column("seg_ord", lambda df, o=ord_: [o] * len(df),
                           batch_format="pandas")
        parts.append(ds)
    ds = parts[0].union(*parts[1:]) if len(parts) > 1 else parts[0]

    if salt_buckets > 1:
        # salted two-level merge: spread each term over `salt_buckets`
        # reducers keyed by segment-order bucket, then concat partials
        def add_salt(df, nb=salt_buckets):
            import pandas as pd
            bucket = (df["seg_ord"] // max(1, (len(group) + nb - 1) // nb)).astype(str)
            df["term_salt"] = df["term"] + "\x00" + bucket
            return df
        ds = ds.map_batches(add_salt, batch_format="pandas")
        partial = ds.groupby("term_salt").map_groups(
            lambda g: _merge_group_fn(g.drop_columns(["term_salt"])),
            batch_format="pyarrow")
        merged = partial.groupby("term").map_groups(_merge_group_fn,
                                                    batch_format="pyarrow")
    else:
        merged = ds.groupby("term").map_groups(_merge_group_fn,
                                               batch_format="pyarrow")

    seg_dir = os.path.join(index_dir, "segments", out_seg_id)
    os.makedirs(seg_dir, exist_ok=True)

    # docs tables: ordered concat (disjoint sorted ranges)
    doc_tables = [pq.read_table(os.path.join(index_dir, "segments", s.seg_id,
                                             "docs.parquet")) for s in group]
    docs_table = pa.concat_tables(doc_tables)
    pq.write_table(docs_table, os.path.join(seg_dir, "docs.parquet"))

    if repack:
        doc_ids_arr = docs_table.column("doc_id").to_numpy()
        norms_arr = docs_table.column("norm").to_numpy().astype(np.uint8)

        def do_repack(batch: pa.Table) -> pa.Table:
            out = {k: [] for k in _MERGED_COLS}
            for r in batch.to_pylist():
                p = repack_postings(
                    _row_to_packed(r),
                    lambda d: norms_arr[np.searchsorted(doc_ids_arr, d)])
                _packed_to_cols(r["term"], p, out)
            return pa.Table.from_pydict(out, schema=POSTINGS_SCHEMA)

        merged = merged.map_batches(do_repack, batch_format="pyarrow")
        merged_t = pa.concat_tables(
            b for b in merged.iter_batches(batch_format="pyarrow", batch_size=4096))
    else:
        merged_t = pa.concat_tables(
            b.drop_columns(["seg_ord"])
            for b in merged.iter_batches(batch_format="pyarrow", batch_size=4096))

    # keep terms sorted (term-dict order, FreqProxTermsWriter.java:99)
    merged_t = merged_t.sort_by("term")
    pq.write_table(merged_t, os.path.join(seg_dir, "postings.parquet"))

    return SegmentInfo(
        seg_id=out_seg_id,
        num_docs=sum(s.num_docs for s in group),
        min_doc=min(s.min_doc for s in group),
        max_doc=max(s.max_doc for s in group),
        sum_doc_len=sum(s.sum_doc_len for s in group),
        num_terms=len(merged_t),
        lineage="+".join(s.lineage for s in group)[:120],
        field_doc_count=sum(s.field_doc_count for s in group),
    )


def merge_segments(index_dir: str, *, segs_per_tier: int = 10,
                   max_merged_docs: int = 10_000_000, salt_buckets: int = 1,
                   repack: bool = False, min_group: int = 2) -> IndexManifest:
    """One round of tiered merging; returns the new manifest generation."""
    m = read_manifest(index_dir)
    groups = plan_merges(m.segments, segs_per_tier, max_merged_docs)
    new_segments = []
    for gi, group in enumerate(groups):
        if len(group) < min_group:
            new_segments.extend(group)
            continue
        seg_id = (f"merged-{group[0].min_doc:012d}-{group[-1].max_doc:012d}"
                  f"-g{m.generation + 1}")
        new_segments.append(merge_group(index_dir, group, seg_id,
                                        salt_buckets=salt_buckets, repack=repack))
    new_manifest = IndexManifest(
        generation=m.generation + 1,
        num_docs=m.num_docs,
        sum_doc_len=m.sum_doc_len,
        field=m.field,
        stop_words=m.stop_words,
        segments=sorted(new_segments, key=lambda s: s.min_doc),
        field_doc_count=m.field_doc_count,
    )
    write_manifest(index_dir, new_manifest)
    # stats are per-corpus, not per-segment-layout: link/copy previous gen
    src = os.path.join(index_dir, "global", f"term_stats_gen{m.generation}")
    dst = os.path.join(index_dir, "global", f"term_stats_gen{new_manifest.generation}")
    if os.path.isdir(src) and not os.path.exists(dst):
        os.symlink(os.path.abspath(src), dst)
    return new_manifest
