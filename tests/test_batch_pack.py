"""pack_postings_many must be bit-identical to per-term pack_postings."""

import numpy as np
import pytest

from lucene_ray.codecs.postings import (
    pack_postings,
    pack_postings_many,
    unpack_postings,
    PackedPostings,
)


def _rand_terms(rng, n_terms, skew=False):
    D, F, N, bounds = [], [], [], [0]
    for t in range(n_terms):
        n = int(rng.integers(1, 500)) if not skew else \
            int(rng.choice([1, 2, 5, 127, 128, 129, 1000, 5000]))
        gaps = rng.integers(1, 1000, size=n)
        docs = np.cumsum(gaps) - 1
        freqs = rng.integers(1, 200, size=n)
        norms = rng.integers(0, 256, size=n).astype(np.uint8)
        D.append(docs)
        F.append(freqs)
        N.append(norms)
        bounds.append(bounds[-1] + n)
    return (np.concatenate(D), np.concatenate(F), np.concatenate(N),
            np.asarray(bounds))


@pytest.mark.parametrize("skew", [False, True])
def test_batch_equals_scalar(skew):
    rng = np.random.default_rng(17)
    D, F, N, tb = _rand_terms(rng, 60, skew)
    many = pack_postings_many(D, F, N, tb)
    for j in range(len(tb) - 1):
        lo, hi = tb[j], tb[j + 1]
        p = pack_postings(D[lo:hi], F[lo:hi], N[lo:hi])
        assert many["docs"][j] == p.docs, j
        assert many["freqs"][j] == p.freqs, j
        assert many["df"][j] == p.doc_count
        assert many["ttf"][j] == p.ttf
        np.testing.assert_array_equal(many["block_last_docs"][j], p.block_last_docs)
        np.testing.assert_array_equal(many["imp_freqs"][j], p.imp_freqs)
        np.testing.assert_array_equal(many["imp_norms"][j],
                                      p.imp_norms.astype(np.int32))
        np.testing.assert_array_equal(many["imp_offsets"][j], p.imp_offsets)
        # roundtrip through the batch-packed bytes
        p2 = PackedPostings(
            doc_count=many["df"][j], ttf=many["ttf"][j], docs=many["docs"][j],
            freqs=many["freqs"][j],
            block_last_docs=np.asarray(many["block_last_docs"][j]),
            imp_freqs=np.asarray(many["imp_freqs"][j]),
            imp_norms=np.asarray(many["imp_norms"][j], dtype=np.uint8),
            imp_offsets=np.asarray(many["imp_offsets"][j]),
            chunk_doc_counts=np.asarray(many["chunk_doc_counts"][j]))
        d2, f2 = unpack_postings(p2)
        np.testing.assert_array_equal(d2, D[lo:hi])
        np.testing.assert_array_equal(f2, F[lo:hi])


def test_batch_rejects_out_of_order():
    with pytest.raises(ValueError):
        pack_postings_many(np.array([3, 2]), np.array([1, 1]),
                           np.zeros(2, np.uint8), np.array([0, 2]))
