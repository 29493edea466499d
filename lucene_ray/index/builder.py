"""Distributed inverted-index build: a Ray Data streaming pipeline.

Architecture (SURVEY.md §3.1): the reference's DWPT model — N indexing
threads each building an independent in-RAM segment, flushed when the
RAM budget is hit (``DocumentsWriterPerThread.java:210-242``,
``FlushByRamOrCountsPolicy.java:31-104``) — maps to a stateful
actor-pool ``map_batches`` stage: each *batch* becomes one immutable
segment (tokenize -> invert -> pack -> flush to Parquet), so worker RAM
is bounded by ``batch_size`` regardless of corpus size, and the
streaming executor provides the stall/backpressure control
(``DocumentsWriterStallControl.java:50-61``) for free.

docIDs are data-derived (a monotone int64 ``id_col``), never
positional, so results are invariant to batch boundaries, actor
scheduling, and partition counts — the docBase-prefix-sum determinism
requirement of SURVEY.md §7.

Scale notes (100 TB): the only all-to-all exchange is the *term-stats*
aggregate, which moves pre-aggregated (term, df, ttf) rows (a partial
aggregate per segment, combiner pattern). Posting payloads never
shuffle at build time; they are written partition-local, one directory
per segment -> resumable output.
"""

from __future__ import annotations

import hashlib
import os


import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data

from ..analysis import StandardAnalyzer, int_to_byte4_array
from ..analysis.arrow_tokenize import _tokenize_batch_arrow
from ..codecs import pack_postings
from ..codecs.postings import pack_postings_many
from .manifest import IndexManifest, SegmentInfo, write_manifest

def _parquet_files(source) -> list[str]:
    if isinstance(source, (list, tuple)):
        return list(source)
    source = str(source)
    if os.path.isdir(source):
        return sorted(
            os.path.join(source, f) for f in os.listdir(source)
            if f.endswith(".parquet"))
    return [source]


POSTINGS_SCHEMA = pa.schema([
    ("term", pa.large_string()),
    ("df", pa.int64()),
    ("ttf", pa.int64()),
    ("doc_count", pa.int64()),
    ("docs", pa.large_binary()),
    ("freqs", pa.large_binary()),
    ("block_last_docs", pa.large_list(pa.int32())),
    ("docs_bb", pa.large_list(pa.int32())),   # per-block byte lengths
    ("freqs_bb", pa.large_list(pa.int32())),  # (skip-pointer analog)
    ("imp_freqs", pa.large_list(pa.int32())),
    ("imp_norms", pa.large_list(pa.int32())),
    ("imp_offsets", pa.large_list(pa.int32())),
    ("chunk_doc_counts", pa.large_list(pa.int32())),
    ("positions", pa.large_binary()),          # empty unless index_positions
    ("chunk_occ_counts", pa.large_list(pa.int64())),
])

_ROW_KEYS = tuple(POSTINGS_SCHEMA.names)

# Terms per Parquet row group in postings files. Small row groups give
# the reader fine-grained min/max term pruning (the FST/block-tree term
# index analog): a query term materializes at most one row group.
POSTINGS_ROW_GROUP = 256


class SegmentIndexer:
    """Stateful map_batches stage: one batch in -> one segment flushed.

    Analyzer tables are built once per actor (``__init__``), mirroring
    the reference's per-thread analyzer reuse (``analysis/Analyzer.java``
    ReuseStrategy). The returned batch is small segment *metadata* only.
    """

    def __init__(self, out_dir: str, text_col: str, id_col: str,
                 stored_cols: tuple, stop_words: frozenset,
                 arrow_fast_path: bool = True, index_positions: bool = False,
                 analyzer=None, doc_value_cols: tuple = (),
                 postings_format: str = "for128",
                 term_vectors: bool = False,
                 term_vector_offsets: bool = False):
        self.out_dir = out_dir
        self.text_col = text_col
        self.id_col = id_col
        self.doc_value_cols = tuple(doc_value_cols)
        self.stored_cols = tuple(dict.fromkeys(
            (*stored_cols, *doc_value_cols)))
        # Analyzer.createComponents analog (SURVEY §2.10): any picklable
        # callable `text -> list[str]` (with .tokens() for positions and
        # .stop_words/.max_token_length attrs for the fast path) plugs in
        self.analyzer = analyzer or StandardAnalyzer(stop_words=stop_words)
        # only the EXACT StandardAnalyzer semantics are encoded in the
        # Arrow kernels; any subclass/custom chain uses the Python path
        custom = analyzer is not None and type(analyzer) is not StandardAnalyzer
        # positions need per-doc ordered tokens -> Python analyzer path;
        # the Arrow kernel path encodes StandardAnalyzer semantics only
        self.index_positions = index_positions
        self.arrow_fast_path = (arrow_fast_path and not index_positions
                                and not custom)
        # PostingsFormat SPI slot (codecs/registry.py): blocks are
        # self-describing, so mixed-format segments read transparently
        self.postings_format = postings_format
        # TermVectorsFormat role: per-segment forward index
        # (doc_id, term, tf) sorted by doc for pushdown reads
        # offsets-in-term-vectors (FieldType.setStoreTermVectorOffsets
        # role, the FastVectorHighlighter source); needs the per-token
        # offsets only the positional Python path produces
        self.term_vector_offsets = term_vector_offsets
        self.term_vectors = term_vectors or term_vector_offsets
        if term_vector_offsets:
            self.index_positions = True
            self.arrow_fast_path = False
        self._seg_override: str | None = None  # ShardIndexer naming hook

    def __call__(self, batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.Table.from_pydict(
                {k: [] for k in ("seg_id", "num_docs", "min_doc", "max_doc",
                                 "sum_doc_len", "num_terms", "lineage",
                                 "field_doc_count")})
        doc_ids = batch[self.id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(doc_ids, kind="stable")
        if not np.array_equal(order, np.arange(len(doc_ids))):
            batch = batch.take(pa.array(order))
            doc_ids = doc_ids[order]
        n_docs = len(doc_ids)
        if self.arrow_fast_path:
            import pyarrow.compute as pc
            flat_arr, doc_idx = _tokenize_batch_arrow(batch[self.text_col],
                                                      self.analyzer)
            doc_lens = np.bincount(doc_idx, minlength=n_docs).astype(np.int64)
            if len(flat_arr):
                enc = pc.dictionary_encode(flat_arr)
                codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
                uniques = np.asarray(enc.dictionary.to_pylist(), dtype=object)
            else:
                codes = np.empty(0, np.int64)
                uniques = np.empty(0, dtype=object)
        else:
            import itertools
            import pandas as pd
            texts = batch[self.text_col].to_pylist()
            if self.index_positions:
                flat, pos_list, lens = [], [], []
                off_s, off_e = ([], []) if self.term_vector_offsets else (None, None)
                for text in texts:
                    toks = self.analyzer.tokens(text or "")
                    lens.append(len(toks))
                    for at in toks:
                        flat.append(at.term)
                        pos_list.append(at.position)
                        if off_s is not None:
                            off_s.append(at.start)
                            off_e.append(at.end)
                doc_lens = np.asarray(lens, dtype=np.int64)
                positions = np.asarray(pos_list, dtype=np.int64)
                if off_s is not None:
                    tok_starts = np.asarray(off_s, dtype=np.int64)
                    tok_ends = np.asarray(off_e, dtype=np.int64)
            else:
                term_lists = self.analyzer.analyze_batch(texts)
                doc_lens = np.fromiter((len(t) for t in term_lists),
                                       dtype=np.int64, count=n_docs)
                flat = list(itertools.chain.from_iterable(term_lists))
            if flat:
                codes, uniques = pd.factorize(np.asarray(flat, dtype=object))
                codes = codes.astype(np.int64)
            else:
                codes = np.empty(0, np.int64)
                uniques = np.empty(0, dtype=object)
            doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), doc_lens)
        norms = int_to_byte4_array(doc_lens)

        # vectorized invert: one sort over (term, doc) keys gives the
        # tf triplets; pack every term in one batch pass
        n_terms = 0
        if len(codes):
            key = codes * n_docs + doc_idx
            if self.index_positions:
                order = np.lexsort((positions, key))
                key_s = key[order]
                pos_s = positions[order]
                new_grp = np.ones(len(key_s), dtype=bool)
                new_grp[1:] = key_s[1:] != key_s[:-1]
                grp_starts = np.nonzero(new_grp)[0]
                uk = key_s[grp_starts]
                tf = np.diff(np.append(grp_starts, len(key_s)))
            else:
                uk, tf = np.unique(key, return_counts=True)
            t_codes = uk // n_docs
            d_idx = (uk % n_docs).astype(np.int64)
            bounds = np.searchsorted(t_codes, np.arange(len(uniques) + 1))
            term_order = np.argsort(uniques)  # UTF-8 byte order == str order
            n_terms = len(uniques)
            # reorder triplets so terms are sorted (term dict order)
            seg_starts = bounds[term_order]
            seg_ends = bounds[term_order + 1]
            seg_lens = seg_ends - seg_starts
            gather = np.concatenate(
                [np.arange(s, e) for s, e in zip(seg_starts, seg_ends)]) \
                if n_terms else np.empty(0, np.int64)
            lpos = d_idx[gather]
            rows = pack_postings_many(
                doc_ids[lpos], tf[gather], norms[lpos],
                np.concatenate([[0], np.cumsum(seg_lens)]),
                postings_format=self.postings_format)
            rows["term"] = uniques[term_order].tolist()
            if self.index_positions:
                from ..codecs.postings import pack_positions_many
                # occurrence slices per (sorted) term, concatenated
                occ_bnd = np.append(grp_starts, len(key_s))
                tf_g = tf[gather]
                flat_parts = [pos_s[occ_bnd[g]:occ_bnd[g + 1]] for g in gather]
                pos_flat = (np.concatenate(flat_parts) if flat_parts
                            else np.empty(0, np.int64))
                occ_counts_per_term = np.concatenate(
                    [[0], np.cumsum([tf[bounds[c]:bounds[c + 1]].sum()
                                     for c in term_order])]).astype(np.int64)
                g_starts = np.concatenate(
                    [[0], np.cumsum(tf_g)[:-1]]).astype(np.int64)
                bufs = pack_positions_many(pos_flat, occ_counts_per_term,
                                           g_starts)
                rows["positions"] = bufs
                rows["chunk_occ_counts"] = [
                    np.array([occ_counts_per_term[j + 1]
                              - occ_counts_per_term[j]], dtype=np.int64)
                    for j in range(n_terms)]
        else:
            rows = {k: [] for k in _ROW_KEYS}
        postings_table = pa.Table.from_pydict(rows, schema=POSTINGS_SCHEMA)

        doc_cols = {
            "doc_id": pa.array(doc_ids, type=pa.int64()),
            "doc_len": pa.array(doc_lens, type=pa.int32()),
            "norm": pa.array(norms, type=pa.uint8()),
        }
        for c in self.stored_cols:
            doc_cols[c] = batch[c]
        docs_table = pa.table(doc_cols)

        # deterministic, content-addressed segment id -> resumable
        min_doc, max_doc = int(doc_ids.min()), int(doc_ids.max())
        lineage = hashlib.sha1(
            f"{min_doc}:{max_doc}:{len(doc_ids)}".encode()).hexdigest()[:12]
        seg_id = self._seg_override or f"seg-{min_doc:012d}-{max_doc:012d}-{lineage}"
        seg_dir = os.path.join(self.out_dir, "segments", seg_id)
        os.makedirs(seg_dir, exist_ok=True)
        pq.write_table(postings_table, os.path.join(seg_dir, "postings.parquet"),
                       row_group_size=POSTINGS_ROW_GROUP)
        # value-sorted doc-values sidecars (BKD/SortedNumericDocValues
        # role): numeric range filters read only the covering row groups
        for c in self.doc_value_cols:
            dv = pa.table({"value": docs_table.column(c),
                           "doc_id": docs_table.column("doc_id")}) \
                .sort_by([("value", "ascending"), ("doc_id", "ascending")])
            pq.write_table(dv, os.path.join(seg_dir, f"dv_{c}.parquet"),
                           row_group_size=4096)
        if self.term_vectors:
            # TermVectorsFormat analog (codecs/lucene90/
            # Lucene90TermVectorsFormat.java): the forward index,
            # (doc, term, tf), doc-sorted so a single-doc read touches
            # one row-group slice (written even when empty, so readers
            # can distinguish "no terms" from "not enabled")
            if len(codes):
                cols = {
                    "doc_id": pa.array(doc_ids[d_idx], pa.int64()),
                    "term": pa.array(uniques[t_codes].tolist(),
                                     pa.large_string()),
                    "tf": pa.array(tf, pa.int64()),
                }
                if self.term_vector_offsets:
                    # per-(term,doc) occurrence slices (position-sorted
                    # via the invert's lexsort) as list columns — the
                    # withTermVectorOffsets/Positions payload
                    occ_bnd = np.append(grp_starts, len(key_s)).astype(
                        np.int32)
                    for name, vals in (("positions", pos_s),
                                       ("starts", tok_starts[order]),
                                       ("ends", tok_ends[order])):
                        cols[name] = pa.ListArray.from_arrays(
                            pa.array(occ_bnd, pa.int32()),
                            pa.array(vals, pa.int64()))
                tv = pa.table(cols).sort_by([("doc_id", "ascending"),
                                             ("term", "ascending")])
            else:
                cols = {"doc_id": pa.array([], pa.int64()),
                        "term": pa.array([], pa.large_string()),
                        "tf": pa.array([], pa.int64())}
                if self.term_vector_offsets:
                    for name in ("positions", "starts", "ends"):
                        cols[name] = pa.array([], pa.list_(pa.int64()))
                tv = pa.table(cols)
            pq.write_table(tv, os.path.join(seg_dir, "tv.parquet"),
                           row_group_size=4096)
        # term-membership fingerprint: readers skip this segment's
        # postings entirely for absent terms (FST-presence role)
        from ..util import term_hash64
        np.sort(term_hash64(rows["term"] if rows.get("term") else [])) \
            .tofile(os.path.join(seg_dir, "postings.termset"))
        pq.write_table(docs_table, os.path.join(seg_dir, "docs.parquet"))

        return pa.table({
            "seg_id": [seg_id],
            "num_docs": [len(doc_ids)],
            "min_doc": [min_doc],
            "max_doc": [max_doc],
            "sum_doc_len": [int(doc_lens.sum())],
            "num_terms": [n_terms],
            "lineage": [lineage],
            "field_doc_count": [int((doc_lens > 0).sum())],
        })


def build_index(
    source,
    out_dir: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    stored_cols: tuple = (),
    stop_words: frozenset = frozenset(),
    batch_size: int = 4096,
    concurrency=None,
    compute_term_stats: bool = True,
    index_positions: bool = False,
    analyzer=None,
    mode: str = "create_or_append",
    allow_doc_overlap: bool = False,
    doc_value_cols: tuple = (),
    postings_format: str = "for128",
    term_vectors: bool = False,
    term_vector_offsets: bool = False,
) -> IndexManifest:
    """Build an inverted index over a Parquet corpus / Dataset.

    ``source``: a parquet path (str) or a ``ray.data.Dataset``.
    ``id_col`` must be int64, unique and monotone in storage order (the
    global docID; SURVEY.md §1.2). ``analyzer``: optional custom
    analysis chain (callable ``text -> tokens``; Analyzer hook).

    ``mode``: "create_or_append" (default, IndexWriter OpenMode analog —
    a build over an existing index APPENDS its segments to the manifest
    chain like addDocuments+commit, ``index/IndexWriter.java:1468,4020``)
    or "create" (start a fresh chain ignoring prior segments). Appends
    whose doc-id range overlaps existing segments are rejected unless
    ``allow_doc_overlap`` (docIDs are the caller's primary key).
    """
    batch_kwargs: dict = {"batch_size": batch_size}
    if isinstance(source, (str, os.PathLike)) or (
            isinstance(source, (list, tuple)) and source and isinstance(source[0], str)):
        cols = list(dict.fromkeys(
            [id_col, text_col, *stored_cols, *doc_value_cols]))
        # one batch == one contiguous read block: size blocks to batch_size
        # at the read and disable batch coalescing, so every segment is a
        # contiguous doc range no matter how tasks are scheduled (batch
        # coalescing would interleave blocks from parallel read tasks and
        # produce overlapping segments)
        files = _parquet_files(source)
        total_rows = sum(pq.read_metadata(f).num_rows for f in files)
        nblocks = max(1, -(-total_rows // batch_size))
        ds = ray.data.read_parquet(files, columns=cols,
                                   override_num_blocks=nblocks)
        batch_kwargs = {"batch_size": None}
    else:
        # pre-built Dataset: batch boundaries may interleave, so segments
        # can overlap in doc range — queries stay correct (docIDs are
        # data-derived); merge then uses its sort-repack fallback
        ds = source

    if concurrency is None:
        # fixed actor pool sized to the cluster (DWPT pool analog), one
        # slot left free for read tasks
        from ..util import default_concurrency
        concurrency = default_concurrency()
    fn_kwargs = dict(out_dir=out_dir, text_col=text_col, id_col=id_col,
                     stored_cols=stored_cols, stop_words=stop_words,
                     index_positions=index_positions, analyzer=analyzer,
                     doc_value_cols=doc_value_cols,
                     postings_format=postings_format,
                     term_vectors=term_vectors,
                     term_vector_offsets=term_vector_offsets)
    meta = ds.map_batches(
        SegmentIndexer,
        fn_constructor_kwargs=fn_kwargs,
        batch_format="pyarrow",
        concurrency=concurrency,
        zero_copy_batch=True,
        **batch_kwargs,
    )
    seg_rows = meta.take_all()  # tiny: one row per segment

    segments = [SegmentInfo(
        seg_id=r["seg_id"], num_docs=int(r["num_docs"]), min_doc=int(r["min_doc"]),
        max_doc=int(r["max_doc"]), sum_doc_len=int(r["sum_doc_len"]),
        num_terms=int(r["num_terms"]), lineage=r["lineage"],
        field_doc_count=int(r["field_doc_count"])) for r in seg_rows]
    segments.sort(key=lambda s: s.min_doc)

    from .manifest import latest_generation, read_manifest
    prev_gen = latest_generation(out_dir)
    if mode == "create_or_append" and prev_gen >= 0:
        prev = read_manifest(out_dir, prev_gen)
        if prev.field != text_col or prev.stop_words != sorted(stop_words):
            raise ValueError(
                "append with different field/stop_words than the index "
                f"({prev.field!r}/{len(prev.stop_words)} stop words)")
        if not allow_doc_overlap:
            old_ids = {s.seg_id for s in prev.segments}
            for s in segments:
                if s.seg_id in old_ids:
                    raise ValueError(
                        f"append would duplicate segment {s.seg_id} "
                        "(same docs already indexed)")
                for o in prev.segments:
                    if s.min_doc <= o.max_doc and o.min_doc <= s.max_doc:
                        raise ValueError(
                            f"appended docID range [{s.min_doc},{s.max_doc}]"
                            f" overlaps existing segment {o.seg_id}; use "
                            "update_by_key or allow_doc_overlap=True")
        segments = sorted(prev.segments + segments, key=lambda s: s.min_doc)
    manifest = IndexManifest(
        generation=prev_gen + 1,
        num_docs=sum(s.num_docs for s in segments),
        sum_doc_len=sum(s.sum_doc_len for s in segments),
        field=text_col,
        stop_words=sorted(stop_words),
        segments=segments,
        field_doc_count=sum(s.field_doc_count for s in segments),
    )
    write_manifest(out_dir, manifest)

    if compute_term_stats:
        compute_global_term_stats(out_dir, manifest)
    return manifest


@ray.remote
def _stats_leaf(paths: list[str], n_parts: int) -> list[pa.Table]:
    """Map-side combine: read a chunk of segment stats columns, aggregate
    locally, hash-partition by term (the combiner + partial-shuffle leg
    of the term aggregate, SURVEY.md §2.5)."""
    import pandas as pd
    t = pa.concat_tables(
        pq.read_table(p, columns=["term", "df", "ttf"]) for p in paths)
    g = t.group_by("term").aggregate([("df", "sum"), ("ttf", "sum")])
    g = g.rename_columns(["term", "df", "ttf"])
    if n_parts == 1:
        return g  # num_returns=1: return the table itself, not a list
    from ..util import crc32_batch
    h = crc32_batch(g.column("term")).astype(np.int64) % n_parts
    return [g.filter(pa.array(h == r)) for r in range(n_parts)]


@ray.remote
def _stats_reduce(out_path: str, *parts: pa.Table) -> int:
    t = pa.concat_tables(parts)
    g = t.group_by("term").aggregate([("df", "sum"), ("ttf", "sum")])
    g = g.rename_columns(["term", "df", "ttf"]).sort_by("term")
    pq.write_table(g, out_path, row_group_size=4096)
    return len(g)


def compute_global_term_stats(index_dir: str, manifest: IndexManifest) -> None:
    """Global per-term (df, ttf) via an explicit map-combine + hash
    shuffle tree (leaf tasks aggregate chunks of per-segment stats
    locally, reducers own term-hash partitions). ~10x faster than a
    generic sort-based groupby for this pre-aggregated shape, and each
    level scales with the cluster."""
    paths = [os.path.join(index_dir, "segments", s.seg_id, "postings.parquet")
             for s in manifest.segments]
    out = os.path.join(index_dir, "global", f"term_stats_gen{manifest.generation}")
    os.makedirs(out, exist_ok=True)
    cpus = max(1, int(ray.cluster_resources().get("CPU", 4)))
    n_parts = min(cpus, max(1, len(paths) // 2))
    chunk = max(1, (len(paths) + cpus - 1) // cpus)
    leaves = [
        _stats_leaf.options(num_returns=n_parts).remote(
            paths[i:i + chunk], n_parts)
        for i in range(0, len(paths), chunk)
    ]
    if n_parts == 1:
        leaves = [[leaf] for leaf in leaves]
    reducers = [
        _stats_reduce.remote(os.path.join(out, f"part-{r:05d}.parquet"),
                             *[leaf[r] for leaf in leaves])
        for r in range(n_parts)
    ]
    ray.get(reducers)
    # record the bucket function so readers can route a term to its part
    import json
    with open(os.path.join(out, "_META.json"), "w") as f:
        json.dump({"n_parts": n_parts, "hash": "crc32"}, f)
