"""Delta + FOR (frame-of-reference) packed posting blocks with per-block
block-max impact metadata.

Mirrors the reference postings layout semantics — 128-doc blocks of
delta-encoded docIDs bit-packed at the block's max bit width, freqs
packed per block, per-block competitive (freq, norm) impact pairs —
without replicating its on-disk file format:

- block size 128: ``codecs/lucene90/ForUtil.java:32``
- impacts / competitive pairs: ``codecs/CompetitiveImpactAccumulator.java``
- strictly-increasing docIDs enforced: ``Lucene90PostingsWriter.java:231-236``

All kernels are vectorized numpy; no per-element Python loops on the
pack/unpack hot path.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

BLOCK_SIZE = 128
MAX_IMPACTS_PER_BLOCK = 8


class PackedPostings(NamedTuple):
    """One term's packed postings (possibly multiple concatenated chunks).

    A *chunk* is an independently delta-packed run of docIDs (its first
    delta is the absolute first docID), so chunks from disjoint doc
    ranges can be concatenated without repacking — the segment-merge
    fast path and the hot-term salting path both rely on this.

    ``positions``/``chunk_occ_counts`` are empty unless the index was
    built with positions (the .pos stream for PhraseQuery).
    """

    doc_count: int  # total docs across chunks (== df in this posting)
    ttf: int  # total term frequency
    docs: bytes  # packed doc deltas: per block [u8 width][packed bits]
    freqs: bytes  # packed freqs, same block structure
    block_last_docs: np.ndarray  # int32[nblocks], last docID per block
    imp_freqs: np.ndarray  # int32, flattened impact pairs
    imp_norms: np.ndarray  # uint8
    imp_offsets: np.ndarray  # int32[nblocks+1] prefix offsets into imp_*
    chunk_doc_counts: np.ndarray  # int32[nchunks], docs per chunk
    positions: bytes = b""  # packed position deltas (reset per posting)
    chunk_occ_counts: np.ndarray = np.empty(0, np.int64)  # occurrences/chunk
    # pack-time per-block byte lengths (incl. the header byte) of the
    # docs/freqs streams — lets readers compute every block's byte
    # offset with one cumsum instead of a per-block header scan
    # (Lucene90SkipWriter stores the analogous file pointers at write
    # time). Empty = unknown (legacy data) -> header-scan fallback.
    docs_bb: np.ndarray = np.empty(0, np.int32)
    freqs_bb: np.ndarray = np.empty(0, np.int32)


# --- bit packing -----------------------------------------------------------

def _pack_block(vals: np.ndarray, fmt: str = "for128") -> bytes:
    """Encode one block. Default ``for128``: [width u8][bit-packed].
    Registered formats: [tag u8][len u16][payload] (self-describing —
    see codecs/registry.py, the PerFieldPostingsFormat analog)."""
    if fmt != "for128":
        from .registry import get_format, wrap_block
        tag, encode, _ = get_format(fmt)
        return wrap_block(tag, encode(vals.astype(np.uint32)))
    n = len(vals)
    width = int(vals.max()).bit_length() if n else 0
    if width == 0:
        return bytes([0])
    bits = np.unpackbits(vals.astype(">u4").view(np.uint8).reshape(n, 4), axis=1)
    packed = np.packbits(bits[:, 32 - width:])
    return bytes([width]) + packed.tobytes()


def _unpack_block(buf: memoryview, pos: int, n: int) -> tuple[np.ndarray, int]:
    width = buf[pos]
    pos += 1
    if width > 32:  # registered-format tag: [len u16][payload]
        from .registry import get_decoder
        nbytes = buf[pos] | (buf[pos + 1] << 8)
        pos += 2
        vals = get_decoder(width)(bytes(buf[pos:pos + nbytes]), n)
        return vals, pos + nbytes
    if width == 0:
        return np.zeros(n, dtype=np.uint32), pos
    nbytes = (n * width + 7) // 8
    bits = np.unpackbits(np.frombuffer(buf[pos:pos + nbytes], dtype=np.uint8),
                         count=n * width).reshape(n, width)
    full = np.zeros((n, 32), dtype=np.uint8)
    full[:, 32 - width:] = bits
    vals = np.packbits(full, axis=1).view(">u4").reshape(n).astype(np.uint32)
    return vals, pos + nbytes


def _pack_values(vals: np.ndarray, fmt: str = "for128") -> bytes:
    """Pack an array in BLOCK_SIZE blocks, each at its own width."""
    return _pack_values_bb(vals, fmt)[0]


def _pack_values_bb(vals: np.ndarray,
                    fmt: str = "for128") -> tuple[bytes, np.ndarray]:
    """(packed bytes, per-block byte lengths incl. header)."""
    out = []
    for i in range(0, len(vals), BLOCK_SIZE):
        out.append(_pack_block(vals[i:i + BLOCK_SIZE], fmt))
    return b"".join(out), np.fromiter((len(b) for b in out),
                                      dtype=np.int32, count=len(out))


def _block_sizes(chunk_doc_counts) -> list[int]:
    """Block layout of a (possibly multi-chunk) posting: each chunk is
    blocked independently (full 128s + its own tail)."""
    sizes = []
    for c in np.asarray(chunk_doc_counts, dtype=np.int64).tolist():
        sizes.extend([BLOCK_SIZE] * (c // BLOCK_SIZE))
        if c % BLOCK_SIZE:
            sizes.append(c % BLOCK_SIZE)
    return sizes


def _scan_block_offsets(buf: bytes, sizes) -> tuple[np.ndarray, np.ndarray]:
    """(byte_offset_of_block, width_of_block) via header-only scan."""
    n = len(sizes)
    offs = np.empty(n + 1, dtype=np.int64)
    widths = np.empty(n, dtype=np.int64)
    mv = memoryview(buf)
    pos = 0
    for i, m in enumerate(sizes):
        offs[i] = pos
        w = mv[pos]
        if w > 32:  # registered-format block: [tag][len u16][payload]
            widths[i] = -1  # excluded from the width-grouped fast path
            pos += 3 + (mv[pos + 1] | (mv[pos + 2] << 8))
        else:
            widths[i] = w
            pos += 1 + (m * w + 7) // 8
    offs[n] = pos
    return offs, widths


def stream_layout(p: "PackedPostings",
                  stream: str) -> tuple[np.ndarray, np.ndarray]:
    """(byte_offsets int64[n+1], widths int64[n]) of the ``docs`` or
    ``freqs`` stream. O(blocks) vectorized when pack-time byte lengths
    are present (one cumsum + one header gather); header-scan fallback
    for legacy packings."""
    buf = p.docs if stream == "docs" else p.freqs
    bb = p.docs_bb if stream == "docs" else p.freqs_bb
    sizes = np.asarray(_block_sizes(p.chunk_doc_counts), dtype=np.int64)
    n = len(sizes)
    if len(bb) == n and n > 0:
        offs = np.empty(n + 1, dtype=np.int64)
        offs[0] = 0
        np.cumsum(np.asarray(bb, dtype=np.int64), out=offs[1:])
        hdr = np.frombuffer(buf, dtype=np.uint8)[offs[:-1]].astype(np.int64)
        widths = np.where(hdr > 32, -1, hdr)
        return offs, widths
    return _scan_block_offsets(buf, sizes)


def _unpack_values(buf: bytes, sizes: list[int],
                   sel: np.ndarray | None = None,
                   layout: tuple[np.ndarray, np.ndarray] | None = None
                   ) -> np.ndarray:
    """Decode blocks (all, or the selected subset in index order),
    concatenated. Full 128-value blocks are decoded per-width in single
    unpackbits/packbits calls — ~20x less Python overhead than a
    per-block loop."""
    sizes_arr = np.asarray(sizes, dtype=np.int64)
    offs, widths = layout if layout is not None \
        else _scan_block_offsets(buf, sizes_arr)
    if sel is None:
        sel = np.arange(len(sizes_arr))
    else:
        sel = np.asarray(sel, dtype=np.int64)
    sel_sizes = sizes_arr[sel]
    out_offs = np.concatenate([[0], np.cumsum(sel_sizes)])
    out = np.empty(int(sel_sizes.sum()), dtype=np.uint32)
    raw = np.frombuffer(buf, dtype=np.uint8)
    sel_widths = widths[sel]
    # registered-format blocks (width tag -1) decode via the per-block
    # path; the vectorized gather below is FOR-width-specific
    full_mask = (sel_sizes == BLOCK_SIZE) & (sel_widths >= 0)
    for w in np.unique(sel_widths):
        grp = np.nonzero((sel_widths == w) & full_mask)[0]
        if len(grp) == 0:
            continue
        if w == 0:
            for gi in grp:
                out[out_offs[gi]:out_offs[gi + 1]] = 0
            continue
        nbytes = (BLOCK_SIZE * int(w) + 7) // 8
        starts = offs[sel[grp]] + 1
        gather = raw[starts[:, None] + np.arange(nbytes)[None, :]]
        bits = np.unpackbits(gather, axis=1)[:, :BLOCK_SIZE * int(w)]
        bits = bits.reshape(len(grp), BLOCK_SIZE, int(w))
        full = np.zeros((len(grp), BLOCK_SIZE, 32), dtype=np.uint8)
        full[:, :, 32 - int(w):] = bits
        vals = np.packbits(full.reshape(len(grp), -1), axis=1) \
            .view(">u4").astype(np.uint32).reshape(len(grp), BLOCK_SIZE)
        # vectorized scatter into the (non-contiguous) output slots
        out[out_offs[grp][:, None] + np.arange(BLOCK_SIZE)[None, :]] = vals
    # tails (and any non-full selected blocks): scalar path
    mv = memoryview(buf)
    for gi in np.nonzero(~full_mask)[0]:
        b = sel[gi]
        vals, _ = _unpack_block(mv, int(offs[b]), int(sizes_arr[b]))
        out[out_offs[gi]:out_offs[gi + 1]] = vals
    return out


# --- impacts ---------------------------------------------------------------

def _skyline(freqs: np.ndarray, norms: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Competitive (freq, norm) pairs: no pair with freq>= and norm<=.

    Returns (freqs asc, norms asc) — competitive pairs sorted by norm with
    strictly increasing freq (CompetitiveImpactAccumulator semantics).
    """
    # max freq per distinct norm
    order = np.lexsort((-freqs, norms))
    n_sorted = norms[order]
    f_sorted = freqs[order]
    first = np.ones(len(n_sorted), dtype=bool)
    first[1:] = n_sorted[1:] != n_sorted[:-1]
    nu = n_sorted[first]
    fu = f_sorted[first]  # max freq per norm (first after sort by -freq)
    # keep pairs whose freq exceeds every smaller-norm pair's freq
    cummax = np.maximum.accumulate(fu)
    keep = np.ones(len(fu), dtype=bool)
    keep[1:] = fu[1:] > cummax[:-1]
    fu, nu = fu[keep], nu[keep]
    if len(fu) > MAX_IMPACTS_PER_BLOCK:
        # conservative downsample: per chunk keep (max freq, min norm),
        # which dominates every pair in the chunk (upper bound stays safe)
        idx = np.array_split(np.arange(len(fu)), MAX_IMPACTS_PER_BLOCK)
        fu = np.array([fu[i].max() for i in idx], dtype=fu.dtype)
        nu = np.array([nu[i].min() for i in idx], dtype=nu.dtype)
        # re-skyline after merge (norm mins may now collide/dominate)
        order2 = np.argsort(nu, kind="stable")
        fu, nu = fu[order2], nu[order2]
        cummax = np.maximum.accumulate(fu)
        keep = np.ones(len(fu), dtype=bool)
        keep[1:] = fu[1:] > cummax[:-1]
        fu, nu = fu[keep], nu[keep]
    return fu.astype(np.int32), nu.astype(np.uint8)


def compute_impacts(freqs: np.ndarray, norms: np.ndarray):
    """Per-128-block impact skylines over aligned (freq, norm) arrays.

    Returns (imp_freqs, imp_norms, imp_offsets) flattened per block.
    """
    nblocks = (len(freqs) + BLOCK_SIZE - 1) // BLOCK_SIZE
    fs, ns, offs = [], [], [0]
    for b in range(nblocks):
        sl = slice(b * BLOCK_SIZE, (b + 1) * BLOCK_SIZE)
        f, n = _skyline(np.asarray(freqs[sl]), np.asarray(norms[sl]))
        fs.append(f)
        ns.append(n)
        offs.append(offs[-1] + len(f))
    return (
        np.concatenate(fs) if fs else np.empty(0, np.int32),
        np.concatenate(ns) if ns else np.empty(0, np.uint8),
        np.asarray(offs, dtype=np.int32),
    )


# --- public pack/unpack ----------------------------------------------------

def pack_postings(doc_ids: np.ndarray, freqs: np.ndarray,
                  norms: np.ndarray,
                  postings_format: str = "for128") -> PackedPostings:
    """Pack one term's postings (one chunk).

    ``doc_ids`` must be strictly increasing int32/int64; ``freqs`` >= 1;
    ``norms`` are the posting docs' norm bytes (for impacts).
    """
    doc_ids = np.asarray(doc_ids, dtype=np.int64)
    freqs = np.asarray(freqs, dtype=np.int64)
    if len(doc_ids) == 0:
        raise ValueError("empty posting")
    # block_last_docs is int32 and each chunk's first delta is stored as
    # uint32; a docID >= 2^31 would silently wrap and corrupt skip data
    if doc_ids[-1] >= 2**31 or doc_ids[0] < 0:
        raise ValueError(f"docID out of int32 range: {doc_ids[-1]}")
    deltas = np.empty(len(doc_ids), dtype=np.uint32)
    deltas[0] = doc_ids[0]
    if len(doc_ids) > 1:
        d = np.diff(doc_ids)
        if (d <= 0).any():
            raise ValueError("docs out of order")  # Lucene90PostingsWriter.java:231
        deltas[1:] = d
    nblocks = (len(doc_ids) + BLOCK_SIZE - 1) // BLOCK_SIZE
    block_last = doc_ids[np.minimum(
        np.arange(1, nblocks + 1) * BLOCK_SIZE - 1, len(doc_ids) - 1)].astype(np.int32)
    imp_f, imp_n, imp_off = compute_impacts(freqs, np.asarray(norms))
    docs_buf, docs_bb = _pack_values_bb(deltas, postings_format)
    freqs_buf, freqs_bb = _pack_values_bb(freqs.astype(np.uint32),
                                          postings_format)
    return PackedPostings(
        doc_count=len(doc_ids),
        ttf=int(freqs.sum()),
        docs=docs_buf,
        freqs=freqs_buf,
        docs_bb=docs_bb,
        freqs_bb=freqs_bb,
        block_last_docs=block_last,
        imp_freqs=imp_f,
        imp_norms=imp_n,
        imp_offsets=imp_off,
        chunk_doc_counts=np.array([len(doc_ids)], dtype=np.int32),
    )


def unpack_postings(p: PackedPostings) -> tuple[np.ndarray, np.ndarray]:
    """Decode a (possibly multi-chunk) posting -> (doc_ids int64, freqs int32)."""
    sizes = _block_sizes(p.chunk_doc_counts)
    deltas = _unpack_values(p.docs, sizes,
                            layout=stream_layout(p, "docs")).astype(np.int64)
    freqs = _unpack_values(p.freqs, sizes,
                           layout=stream_layout(p, "freqs")).astype(np.int32)
    # per-chunk cumsum: each chunk's first delta is absolute
    counts = np.asarray(p.chunk_doc_counts, dtype=np.int64)
    docs = np.cumsum(deltas)
    if len(counts) > 1:
        # Each chunk's deltas sum to its last absolute docID, so the global
        # cumsum over-counts chunk j by sum(last_doc of chunks < j).
        blocks_per_chunk = (counts + BLOCK_SIZE - 1) // BLOCK_SIZE
        last_block_idx = np.cumsum(blocks_per_chunk) - 1
        chunk_last = np.asarray(p.block_last_docs, dtype=np.int64)[last_block_idx]
        corr = np.concatenate([[0], np.cumsum(chunk_last[:-1])])
        docs = docs - np.repeat(corr, counts)
    return docs, freqs


def concat_postings(chunks: list[PackedPostings]) -> PackedPostings:
    """Concatenate postings of the SAME term over disjoint, increasing doc
    ranges (segment merge fast path — no unpack/repack).

    Callers must pass chunks ordered by doc range; validated via
    block_last_docs monotonicity.
    """
    if len(chunks) == 1:
        return chunks[0]
    last = -1
    for c in chunks:
        first_block_last = int(c.block_last_docs[0])
        if first_block_last <= last:
            raise ValueError("merge chunks out of doc order / overlapping")
        last = int(c.block_last_docs[-1])
    off_parts = [np.asarray(chunks[0].imp_offsets, dtype=np.int64)]
    base = int(chunks[0].imp_offsets[-1])
    for c in chunks[1:]:
        off_parts.append(np.asarray(c.imp_offsets[1:], dtype=np.int64) + base)
        base += int(c.imp_offsets[-1])
    has_pos = any(len(c.positions) for c in chunks)
    return PackedPostings(
        positions=b"".join(c.positions for c in chunks) if has_pos else b"",
        chunk_occ_counts=(np.concatenate(
            [np.atleast_1d(np.asarray(c.chunk_occ_counts, dtype=np.int64))
             if len(np.atleast_1d(c.chunk_occ_counts)) else
             np.array([c.ttf], dtype=np.int64) for c in chunks])
            if has_pos else np.empty(0, np.int64)),
        doc_count=sum(c.doc_count for c in chunks),
        ttf=sum(c.ttf for c in chunks),
        docs=b"".join(c.docs for c in chunks),
        freqs=b"".join(c.freqs for c in chunks),
        block_last_docs=np.concatenate([c.block_last_docs for c in chunks]),
        imp_freqs=np.concatenate([c.imp_freqs for c in chunks]),
        imp_norms=np.concatenate([c.imp_norms for c in chunks]),
        imp_offsets=np.concatenate(off_parts).astype(np.int32),
        chunk_doc_counts=np.concatenate([c.chunk_doc_counts for c in chunks]),
        # block byte lengths concatenate directly (they are per-block,
        # not cumulative); drop to the scan fallback if any chunk lacks
        # them (legacy data)
        docs_bb=(np.concatenate([c.docs_bb for c in chunks])
                 if all(len(c.docs_bb) for c in chunks)
                 else np.empty(0, np.int32)),
        freqs_bb=(np.concatenate([c.freqs_bb for c in chunks])
                  if all(len(c.freqs_bb) for c in chunks)
                  else np.empty(0, np.int32)),
    )


def repack_postings(p: PackedPostings, norms_lookup) -> PackedPostings:
    """Optimize path: re-block a multi-chunk posting into full 128-doc
    blocks (recomputing impacts from per-doc norms).

    ``norms_lookup(doc_ids) -> uint8 norms`` supplies the norm bytes
    (TieredMergePolicy 'forceMerge' analog).
    """
    docs, freqs = unpack_postings(p)
    norms = norms_lookup(docs)
    out = pack_postings(docs, freqs, norms)
    if len(p.positions):
        flat = unpack_positions(p.positions, p.chunk_occ_counts, freqs)
        group_starts = np.concatenate([[0], np.cumsum(freqs)[:-1]])
        bufs = pack_positions_many(flat, np.array([0, len(flat)]),
                                   group_starts.astype(np.int64))
        out = out._replace(positions=bufs[0],
                           chunk_occ_counts=np.array([len(flat)], np.int64))
    return out


# --- batch pack (vectorized across terms) ----------------------------------

# minimal width w with max value <= 2^w - 1: searchsorted over thresholds
_WIDTH_THRESHOLDS = (np.left_shift(np.int64(1), np.arange(33, dtype=np.int64))
                     - 1).astype(np.int64)


def _widths_of(maxv: np.ndarray) -> np.ndarray:
    return np.searchsorted(_WIDTH_THRESHOLDS, maxv.astype(np.int64),
                           side="left").astype(np.uint8)


def pack_postings_many(doc_ids: np.ndarray, freqs: np.ndarray,
                       norms: np.ndarray, term_bounds: np.ndarray,
                       postings_format: str = "for128") -> dict:
    """Pack MANY terms' postings in one vectorized pass.

    ``doc_ids``/``freqs``/``norms`` are the per-term posting arrays
    concatenated (term j occupies ``term_bounds[j]:term_bounds[j+1]``,
    docs strictly increasing within each term). Bit-packing runs once
    per (width x full-block) group instead of once per block; impact
    skylines are computed with one global lexsort + segmented cummax.

    Returns a dict of per-term column lists identical to looping
    :func:`pack_postings` (tested equivalent).
    """
    D = np.ascontiguousarray(doc_ids, dtype=np.int64)
    F = np.ascontiguousarray(freqs, dtype=np.int64)
    Nrm = np.ascontiguousarray(norms, dtype=np.uint8)
    tb = np.ascontiguousarray(term_bounds, dtype=np.int64)
    n_terms = len(tb) - 1
    counts = np.diff(tb)
    if (counts <= 0).any():
        raise ValueError("empty posting")
    if len(D) and (D[tb[1:] - 1].max() >= 2**31 or D[tb[:-1]].min() < 0):
        raise ValueError("docID out of int32 range")

    delta = D.copy()
    delta[1:] -= D[:-1]
    starts = tb[:-1]
    delta[starts] = D[starts]  # first delta of each term is absolute
    ok = delta > 0
    ok[starts] = delta[starts] >= 0
    if not ok.all():
        raise ValueError("docs out of order")
    delta_u = delta.astype(np.uint32)

    nblocks = (counts + BLOCK_SIZE - 1) // BLOCK_SIZE
    total_blocks = int(nblocks.sum())
    term_of_block = np.repeat(np.arange(n_terms), nblocks)
    bcs = np.concatenate([[0], np.cumsum(nblocks)])  # block index per term
    block_ord = np.arange(total_blocks) - bcs[term_of_block]
    bstart = tb[term_of_block] + BLOCK_SIZE * block_ord
    bend = np.minimum(bstart + BLOCK_SIZE, tb[term_of_block + 1])
    bsize = (bend - bstart).astype(np.int64)

    def pack_stream(vals: np.ndarray) -> list[bytes]:
        if postings_format != "for128":
            # registered formats encode per block (self-describing tags)
            return [_pack_block(vals[bstart[b]:bend[b]], postings_format)
                    for b in range(total_blocks)]
        maxv = np.maximum.reduceat(vals, bstart)
        widths = _widths_of(maxv)
        out: list[bytes] = [b""] * total_blocks
        arange_b = np.arange(BLOCK_SIZE)
        for w in np.unique(widths):
            idx = np.nonzero(widths == w)[0]
            if w == 0:
                zero = b"\x00"
                for b in idx:
                    out[b] = zero
                continue
            full = idx[bsize[idx] == BLOCK_SIZE]
            if len(full):
                gather = vals[bstart[full][:, None] + arange_b[None, :]]
                bits = np.unpackbits(
                    gather.astype(">u4").view(np.uint8)
                    .reshape(len(full), BLOCK_SIZE, 4), axis=2)
                sel = bits.reshape(len(full), BLOCK_SIZE, 32)[:, :, 32 - w:]
                packed = np.packbits(sel.reshape(len(full), BLOCK_SIZE * w),
                                     axis=1)
                wb = bytes([w])
                pb = packed.tobytes()
                row = packed.shape[1]
                for i, b in enumerate(full):
                    out[b] = wb + pb[i * row:(i + 1) * row]
            for b in idx[bsize[idx] != BLOCK_SIZE]:
                out[b] = _pack_block(vals[bstart[b]:bend[b]])
        return out

    docs_blocks = pack_stream(delta_u)
    freqs_blocks = pack_stream(F.astype(np.uint32))
    block_last = D[bend - 1].astype(np.int32)

    # --- impacts: global lexsort + segmented strict cummax -----------------
    block_of_el = np.repeat(np.arange(total_blocks), bsize)
    order = np.lexsort((-F, Nrm, block_of_el))
    bo = block_of_el[order]
    no = Nrm[order]
    fo = F[order]
    first = np.ones(len(bo), dtype=bool)
    first[1:] = (bo[1:] != bo[:-1]) | (no[1:] != no[:-1])
    bo, no, fo = bo[first], no[first], fo[first]
    key = (bo.astype(np.int64) << 32) | fo  # block-partitioned cummax
    cm = np.maximum.accumulate(key)
    keep = np.ones(len(key), dtype=bool)
    keep[1:] = key[1:] > cm[:-1]
    bo, no, fo = bo[keep], no[keep], fo[keep]
    off = np.searchsorted(bo, np.arange(total_blocks + 1))
    sizes_imp = np.diff(off)
    if (sizes_imp > MAX_IMPACTS_PER_BLOCK).any():
        # rare: rebuild only oversized blocks with the capped skyline
        pieces_f, pieces_n, new_off = [], [], [0]
        for b in range(total_blocks):
            bf, bn = fo[off[b]:off[b + 1]], no[off[b]:off[b + 1]]
            if len(bf) > MAX_IMPACTS_PER_BLOCK:
                bf, bn = _skyline(F[bstart[b]:bend[b]], Nrm[bstart[b]:bend[b]])
            pieces_f.append(bf)
            pieces_n.append(bn)
            new_off.append(new_off[-1] + len(bf))
        fo = np.concatenate(pieces_f)
        no = np.concatenate(pieces_n)
        off = np.asarray(new_off, dtype=np.int64)

    # --- per-term assembly -------------------------------------------------
    ttfs = np.add.reduceat(F, tb[:-1])
    n_out = n_terms
    out = {
        "term": None,  # caller fills
        "df": counts.tolist(),
        "ttf": ttfs.tolist(),
        "doc_count": counts.tolist(),
        "docs": [], "freqs": [], "block_last_docs": [],
        "docs_bb": [], "freqs_bb": [],
        "imp_freqs": [], "imp_norms": [], "imp_offsets": [],
        "chunk_doc_counts": [np.array([c], dtype=np.int32) for c in counts],
        "positions": [b""] * n_out,
        "chunk_occ_counts": [np.empty(0, np.int64)] * n_out,
    }
    fo32 = fo.astype(np.int32)
    no32 = no.astype(np.int32)
    docs_bl = np.fromiter((len(b) for b in docs_blocks),
                          dtype=np.int32, count=total_blocks)
    freqs_bl = np.fromiter((len(b) for b in freqs_blocks),
                           dtype=np.int32, count=total_blocks)
    for j in range(n_terms):
        b0, b1 = bcs[j], bcs[j + 1]
        out["docs"].append(b"".join(docs_blocks[b0:b1]))
        out["freqs"].append(b"".join(freqs_blocks[b0:b1]))
        out["block_last_docs"].append(block_last[b0:b1])
        out["docs_bb"].append(docs_bl[b0:b1])
        out["freqs_bb"].append(freqs_bl[b0:b1])
        o0, o1 = off[b0], off[b1]
        out["imp_freqs"].append(fo32[o0:o1])
        out["imp_norms"].append(no32[o0:o1])
        out["imp_offsets"].append((off[b0:b1 + 1] - o0).astype(np.int32))
    return out


def decode_selected_blocks(p: PackedPostings,
                           sel: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(docs, freqs) of the selected blocks only (indices ascending).

    The skip-data path: block doc bases come from block_last_docs, so no
    preceding blocks need decoding (Lucene90SkipReader role)."""
    sizes = np.asarray(_block_sizes(p.chunk_doc_counts), dtype=np.int64)
    blast = np.asarray(p.block_last_docs, dtype=np.int64)
    counts = np.asarray(p.chunk_doc_counts, dtype=np.int64)
    blocks_per_chunk = (counts + BLOCK_SIZE - 1) // BLOCK_SIZE
    chunk_first = np.concatenate([[0], np.cumsum(blocks_per_chunk)[:-1]])
    bases = np.empty(len(sizes), dtype=np.int64)
    if len(sizes):
        bases[0] = 0
        bases[1:] = blast[:-1]
        bases[chunk_first] = 0
    deltas = _unpack_values(p.docs, sizes, sel=sel,
                            layout=stream_layout(p, "docs")).astype(np.int64)
    freqs = _unpack_values(p.freqs, sizes, sel=sel,
                           layout=stream_layout(p, "freqs")).astype(np.int32)
    sel_sizes = sizes[sel]
    boffs = np.concatenate([[0], np.cumsum(sel_sizes)])
    gcs = np.cumsum(deltas)
    block_sums = np.add.reduceat(deltas, boffs[:-1]) if len(sel) else deltas
    carry = np.concatenate([[0], np.cumsum(block_sums[:-1])])
    docs = gcs - np.repeat(carry, sel_sizes) + np.repeat(bases[sel], sel_sizes)
    return docs, freqs


# --- positional postings (PhraseQuery support) -----------------------------
# Layout per term: all occurrences ordered by (doc, position), positions
# delta-encoded with a reset (absolute value) at each posting/doc
# boundary, FOR-packed in 128-value blocks per term chunk. Mirrors the
# role of the reference's .pos stream (Lucene90PostingsFormat.java:
# 155-246) without its file format.


def pack_positions_many(pos_flat: np.ndarray, occ_bounds: np.ndarray,
                        group_starts: np.ndarray) -> list[bytes]:
    """Pack many terms' position streams.

    ``pos_flat``: all occurrences' positions (grouped by term, then doc,
    ascending within doc). ``occ_bounds``: per-term occurrence ranges
    (n_terms+1). ``group_starts``: indices where a new (term, doc)
    posting begins (delta resets there).
    """
    P = np.ascontiguousarray(pos_flat, dtype=np.int64)
    delta = P.copy()
    delta[1:] -= P[:-1]
    delta[group_starts] = P[group_starts]
    if (delta < 0).any():
        raise ValueError("positions out of order")
    vals = delta.astype(np.uint32)
    out = []
    for j in range(len(occ_bounds) - 1):
        out.append(_pack_values(vals[occ_bounds[j]:occ_bounds[j + 1]]))
    return out


def unpack_positions(buf: bytes, chunk_occ_counts: np.ndarray,
                     freqs: np.ndarray) -> np.ndarray:
    """Decode one term's position stream.

    ``chunk_occ_counts``: occurrences per chunk (blocking layout);
    ``freqs``: the term's per-posting freqs (posting boundaries = delta
    resets). Returns absolute positions, flat (slice by cumsum(freqs)).
    """
    sizes = _block_sizes(chunk_occ_counts)
    delta = _unpack_values(buf, sizes).astype(np.int64)
    freqs = np.asarray(freqs, dtype=np.int64)
    starts = np.concatenate([[0], np.cumsum(freqs)[:-1]])
    group_last = np.add.reduceat(delta, starts)
    corr = np.concatenate([[0], np.cumsum(group_last[:-1])])
    return np.cumsum(delta) - np.repeat(corr, freqs)


def concat_position_chunks(bufs: list[bytes],
                           occ_counts: list[int]) -> tuple[bytes, np.ndarray]:
    """Merge path: concatenate per-chunk packed position streams."""
    return b"".join(bufs), np.asarray(occ_counts, dtype=np.int64)
