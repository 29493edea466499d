"""Pack-time block byte lengths: stream_layout must equal the header
scan, for single chunks, giant terms, batch packs, and concats — and
readers must decode identically whether the lengths are present or not
(legacy fallback).

Reference role: ``Lucene90SkipWriter`` records posting-file pointers at
write time so readers never scan block headers
(lucene/core/src/java/org/apache/lucene/codecs/lucene90/
Lucene90SkipWriter.java:76).
"""

import numpy as np
import pytest

from lucene_ray.codecs.postings import (
    _block_sizes,
    _scan_block_offsets,
    concat_postings,
    pack_postings,
    pack_postings_many,
    stream_layout,
    unpack_postings,
)


def _rand_posting(rng, n, start=0):
    gaps = rng.integers(1, 50, n)
    docs = start + np.cumsum(gaps)
    freqs = rng.integers(1, 200, n)
    norms = rng.integers(1, 255, n).astype(np.uint8)
    return docs, freqs, norms


@pytest.mark.parametrize("n", [1, 127, 128, 129, 1000, 100_000])
def test_layout_matches_scan(n):
    rng = np.random.default_rng(n)
    docs, freqs, norms = _rand_posting(rng, n)
    p = pack_postings(docs, freqs, norms)
    sizes = np.asarray(_block_sizes(p.chunk_doc_counts), dtype=np.int64)
    assert len(p.docs_bb) == len(sizes)
    for stream, buf in (("docs", p.docs), ("freqs", p.freqs)):
        offs, widths = stream_layout(p, stream)
        soffs, swidths = _scan_block_offsets(buf, sizes)
        np.testing.assert_array_equal(offs, soffs)
        np.testing.assert_array_equal(widths, swidths)
    # legacy fallback: stripping the lengths must not change decode
    legacy = p._replace(docs_bb=np.empty(0, np.int32),
                        freqs_bb=np.empty(0, np.int32))
    d1, f1 = unpack_postings(p)
    d2, f2 = unpack_postings(legacy)
    np.testing.assert_array_equal(d1, d2)
    np.testing.assert_array_equal(f1, f2)
    np.testing.assert_array_equal(d1, docs)


def test_concat_preserves_lengths():
    rng = np.random.default_rng(7)
    chunks = []
    start = 0
    for _ in range(5):
        docs, freqs, norms = _rand_posting(rng, int(rng.integers(1, 700)),
                                           start)
        start = int(docs[-1]) + 1
        chunks.append(pack_postings(docs, freqs, norms))
    c = concat_postings(chunks)
    sizes = np.asarray(_block_sizes(c.chunk_doc_counts), dtype=np.int64)
    assert len(c.docs_bb) == len(sizes)
    offs, widths = stream_layout(c, "docs")
    soffs, swidths = _scan_block_offsets(c.docs, sizes)
    np.testing.assert_array_equal(offs, soffs)
    np.testing.assert_array_equal(widths, swidths)
    # one chunk without lengths -> whole concat falls back (empty)
    chunks[2] = chunks[2]._replace(docs_bb=np.empty(0, np.int32))
    c2 = concat_postings(chunks)
    assert len(c2.docs_bb) == 0
    d1, f1 = unpack_postings(c)
    d2, f2 = unpack_postings(c2)
    np.testing.assert_array_equal(d1, d2)
    np.testing.assert_array_equal(f1, f2)


def test_batch_pack_emits_lengths():
    rng = np.random.default_rng(11)
    D, F, N, tb = [], [], [], [0]
    for _ in range(20):
        docs, freqs, norms = _rand_posting(rng, int(rng.integers(1, 400)))
        D.append(docs)
        F.append(freqs)
        N.append(norms)
        tb.append(tb[-1] + len(docs))
    D, F, N = map(np.concatenate, (D, F, N))
    many = pack_postings_many(D, F, N, np.asarray(tb))
    for j in range(20):
        lo, hi = tb[j], tb[j + 1]
        p = pack_postings(D[lo:hi], F[lo:hi], N[lo:hi])
        np.testing.assert_array_equal(many["docs_bb"][j], p.docs_bb)
        np.testing.assert_array_equal(many["freqs_bb"][j], p.freqs_bb)


def test_giant_term_layout_is_not_scanned(benchmark=None):
    """A 2M-doc posting (15k+ blocks): the stored-lengths layout is
    exact and much cheaper than the header scan (no per-block Python)."""
    import time
    rng = np.random.default_rng(3)
    docs, freqs, norms = _rand_posting(rng, 2_000_000)
    p = pack_postings(docs, freqs, norms)
    sizes = np.asarray(_block_sizes(p.chunk_doc_counts), dtype=np.int64)
    t0 = time.perf_counter()
    offs, widths = stream_layout(p, "docs")
    fast = time.perf_counter() - t0
    t0 = time.perf_counter()
    soffs, swidths = _scan_block_offsets(p.docs, sizes)
    slow = time.perf_counter() - t0
    np.testing.assert_array_equal(offs, soffs)
    np.testing.assert_array_equal(widths, swidths)
    # sanity (not a strict perf gate — CI noise): cumsum path should
    # beat the 15k-iteration Python scan comfortably
    assert fast < slow, (fast, slow)
