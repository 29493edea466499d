"""CheckIndex analog (``index/CheckIndex.java``): decode every structure
and re-verify invariants as a Ray Data job.

Checks per segment:
- posting docIDs strictly increasing, within [min_doc, max_doc]
- df == decoded doc count; ttf == sum(freqs)
- block_last_docs match decoded block boundaries
- impacts dominate every (freq, norm) pair in their block
- docs table sorted by doc_id, unique
Manifest-level: segment doc ranges disjoint; counts sum to manifest.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data

from ..codecs.postings import BLOCK_SIZE, unpack_postings
from .manifest import read_manifest
from .merge import _row_to_packed


def _check_postings_batch(batch: pa.Table, min_doc: int, max_doc: int) -> pa.Table:
    errors = []
    for r in batch.to_pylist():
        term = r["term"]
        p = _row_to_packed(r)
        docs, freqs = unpack_postings(p)
        if len(docs) != r["df"]:
            errors.append(f"{term}: df {r['df']} != {len(docs)}")
            continue
        if (np.diff(docs) <= 0).any():
            errors.append(f"{term}: docs not strictly increasing")
        if docs[0] < min_doc or docs[-1] > max_doc:
            errors.append(f"{term}: docs outside segment range")
        if int(freqs.sum()) != r["ttf"]:
            errors.append(f"{term}: ttf mismatch")
        if (freqs < 1).any():
            errors.append(f"{term}: freq < 1")
        # block boundaries (per chunk layout)
        from ..codecs.postings import _block_sizes
        sizes = _block_sizes(p.chunk_doc_counts)
        ends = np.cumsum(sizes) - 1
        if not np.array_equal(docs[ends], np.asarray(p.block_last_docs, dtype=np.int64)):
            errors.append(f"{term}: block_last_docs mismatch")
        # impacts dominate
        off = np.asarray(p.imp_offsets)
        start = 0
        for b, n in enumerate(sizes):
            bf, bn = freqs[start:start + n], None
            pf = p.imp_freqs[off[b]:off[b + 1]]
            if len(pf) and bf.max() > pf.max():
                errors.append(f"{term}: impact max freq below true max in block {b}")
            start += n
    return pa.table({"error": pa.array(errors, type=pa.string())})


def validate_index(index_dir: str, generation: int | None = None) -> list[str]:
    """Returns a list of invariant violations (empty == healthy)."""
    m = read_manifest(index_dir, generation)
    errors: list[str] = []

    prev_max = -1
    tot_docs = tot_dl = tot_fdc = 0
    for s in sorted(m.segments, key=lambda x: x.min_doc):
        if s.min_doc <= prev_max:
            errors.append(f"{s.seg_id}: doc range overlaps previous segment")
        prev_max = s.max_doc
        tot_docs += s.num_docs
        tot_dl += s.sum_doc_len
        tot_fdc += s.field_doc_count

        seg_dir = os.path.join(index_dir, "segments", s.seg_id)
        d = pq.read_table(os.path.join(seg_dir, "docs.parquet"))
        doc_ids = d.column("doc_id").to_numpy()
        if len(doc_ids) != s.num_docs:
            errors.append(f"{s.seg_id}: docs table row count mismatch")
        if len(doc_ids) and (np.diff(doc_ids) <= 0).any():
            errors.append(f"{s.seg_id}: docs table not sorted/unique")
        if int(d.column("doc_len").to_numpy().sum()) != s.sum_doc_len:
            errors.append(f"{s.seg_id}: sum_doc_len mismatch")

        # live-docs file (tombstones): exists, sorted, in-range, count
        if s.del_gen >= 0:
            dp = os.path.join(seg_dir, f"deletes_gen{s.del_gen}.parquet")
            if not os.path.isfile(dp):
                errors.append(f"{s.seg_id}: missing deletes_gen{s.del_gen}")
            else:
                dels = pq.read_table(dp).column("doc_id").to_numpy()
                if len(dels) != s.del_count:
                    errors.append(f"{s.seg_id}: del_count mismatch")
                if len(dels) and (np.diff(dels) <= 0).any():
                    errors.append(f"{s.seg_id}: deletes not sorted/unique")
                if len(dels) and not np.isin(dels, doc_ids).all():
                    errors.append(f"{s.seg_id}: deleted docID not in segment")

        # term-membership fingerprints cover the shard vocabularies
        from ..search.reader import _ShardedPostings
        from ..util import term_hash64
        sp = _ShardedPostings(os.path.join(seg_dir, "postings.parquet"))
        for name in sp._paths:
            ts = sp.termset(name)
            if ts is None:
                continue
            f = sp._file(name)
            terms = f.pf.read(columns=["term"]).column("term").to_pylist()
            h = np.sort(term_hash64(terms))
            if not np.array_equal(h, ts):
                errors.append(f"{s.seg_id}/{name or 'postings'}: "
                              "termset fingerprint mismatch")

        ds = ray.data.read_parquet(os.path.join(seg_dir, "postings.parquet"))
        err_ds = ds.map_batches(
            _check_postings_batch, batch_format="pyarrow",
            fn_kwargs={"min_doc": s.min_doc, "max_doc": s.max_doc})
        errors.extend(r["error"] for r in err_ds.take_all())

    if tot_docs != m.num_docs:
        errors.append("manifest num_docs != sum of segments")
    if tot_dl != m.sum_doc_len:
        errors.append("manifest sum_doc_len != sum of segments")
    if tot_fdc != m.field_doc_count:
        errors.append("manifest field_doc_count != sum of segments")

    # index sort (CheckIndex.testSort role): when the index records a
    # sort, stored rows must actually be ordered by (field, orig id)
    # within and ACROSS segments in docID order
    from .sorted import read_index_sort
    srt = read_index_sort(index_dir)
    if srt is not None:
        field, asc = srt["field"], srt["ascending"]
        oid = f"orig_{srt['id_col']}"
        prev_key = None
        for s in sorted(m.segments, key=lambda x: x.min_doc):
            seg_dir = os.path.join(index_dir, "segments", s.seg_id)
            d = pq.read_table(os.path.join(seg_dir, "docs.parquet"),
                              columns=[field, oid])
            v = d.column(field).to_numpy()
            o = d.column(oid).to_numpy()
            if not asc:
                v = -v
            key_ok = (v[1:] > v[:-1]) | ((v[1:] == v[:-1])
                                         & (o[1:] > o[:-1]))
            if len(v) > 1 and not key_ok.all():
                errors.append(f"{s.seg_id}: violates recorded index "
                              f"sort on {field}")
            if prev_key is not None and len(v) and \
                    (v[0], o[0]) < prev_key:
                errors.append(f"{s.seg_id}: sort order breaks at "
                              "segment boundary")
            if len(v):
                prev_key = (v[-1], o[-1])
    return errors
