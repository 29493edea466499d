"""Skew-safety and vectorization tests for the dedup family (VERDICT r1
item 2): degenerate LSH buckets must not be quadratic, vectorized batch
kernels must agree with the per-doc reference implementations, and
keeper selection must resolve planted duplicate components."""

import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_ray.pipelines.dedup import (
    BUCKET_CAP,
    MinHashSigs,
    SimHash,
    minhash_dedup_keepers,
    minhash_lsh_candidates,
    simhash_candidates,
)


@pytest.fixture(scope="module")
def boilerplate_corpus(ray_session, tmp_path_factory):
    """10k identical '404 page' docs + a few distinct ones — the classic
    degenerate LSH bucket. All-pairs would be ~50M pairs."""
    n_dup = 10_000
    texts = ["page not found error four oh four please go back home"] * n_dup
    rng = np.random.default_rng(3)
    vocab = [f"u{i}" for i in range(400)]
    for i in range(50):
        texts.append(" ".join(rng.choice(vocab, 40)))
    t = pa.table({"doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
                  "text": pa.array(texts, pa.string())})
    d = tmp_path_factory.mktemp("boiler")
    path = str(d / "documents.parquet")
    pq.write_table(t, path)
    return path, n_dup


def test_minhash_degenerate_bucket_linear(boilerplate_corpus):
    path, n_dup = boilerplate_corpus
    t0 = time.perf_counter()
    pairs = minhash_lsh_candidates(path).take_all()
    dt = time.perf_counter() - t0
    assert dt < 60, f"degenerate bucket took {dt:.0f}s"
    # star collapse: pair volume is O(B), not O(B^2)
    assert len(pairs) < 5 * n_dup
    # every dup doc is linked to the hub (doc 0)
    linked = {r["doc_b"] for r in pairs if r["doc_a"] == 0}
    assert len(linked) == n_dup - 1


def test_simhash_degenerate_bucket_linear(boilerplate_corpus):
    path, n_dup = boilerplate_corpus
    t0 = time.perf_counter()
    pairs = simhash_candidates(path, max_hamming=3).take_all()
    dt = time.perf_counter() - t0
    assert dt < 60, f"degenerate bucket took {dt:.0f}s"
    # sorted-window: identical hashes sort adjacent -> chain of pairs
    assert len(pairs) < 10 * n_dup
    bya = {}
    for r in pairs:
        bya.setdefault(r["doc_a"], set()).add(r["doc_b"])
    # doc 0's window neighbors are all hamming-0 dups
    assert bya.get(0), "no pairs anchored at doc 0"


def test_minhash_keepers_components(boilerplate_corpus):
    path, n_dup = boilerplate_corpus
    rows = minhash_dedup_keepers(path, iters=2).take_all()
    keeper = {r["doc_id"]: r["keeper"] for r in rows}
    # all 10k boilerplate docs collapse to keeper 0
    assert all(keeper[d] == 0 for d in range(n_dup))
    # distinct docs keep themselves (unless LSH-collided, allow 2 misses)
    self_kept = sum(keeper[d] == d for d in range(n_dup, n_dup + 50))
    assert self_kept >= 48


def test_minhash_batch_matches_scalar(ray_session):
    ms = MinHashSigs()
    texts = ["the quick brown fox jumps over the lazy dog",
             "pack my box with five dozen liquor jugs", "", "one two",
             "the quick brown fox jumps over the lazy dog"]
    batch = pa.table({"doc_id": pa.array(np.arange(5, dtype=np.int64)),
                      "text": pa.array(texts, pa.string())})
    sh, starts, kept = ms._batch_shingles(batch)
    assert kept.tolist() == [0, 1, 3, 4]  # empty doc dropped
    # batch signatures == per-doc signatures
    out = ms(batch)
    keys = {}
    for band, key, doc in zip(out["band"].to_pylist(), out["key"].to_pylist(),
                              out["doc_id"].to_pylist()):
        keys[(band, doc)] = key
    for b in range(ms.bands):
        # identical docs 0 and 4 share every band key
        assert keys[(b, 0)] == keys[(b, 4)]
    sig0 = ms.signature(texts[0])
    sig1 = ms.signature(texts[1])
    assert not np.array_equal(sig0, sig1)
    # the fold key of sig0's band b must match the batch output
    for b in range(ms.bands):
        block = sig0[b * ms.rows_per_band:(b + 1) * ms.rows_per_band]
        k = (block * ms.fold).sum(dtype=np.uint64)
        assert keys[(b, 0)] == int(np.uint64(k).astype(np.int64))


def test_simhash_batch_matches_scalar(ray_session):
    sh = SimHash()
    texts = ["the quick brown fox", "pack my box", "", "the quick brown fox",
             "words repeated words repeated words"]
    batch = pa.table({"doc_id": pa.array(np.arange(5, dtype=np.int64)),
                      "text": pa.array(texts, pa.string())})
    got = sh._batch_simhash(batch)
    for i, t in enumerate(texts):
        assert int(got[i]) == sh.simhash(t), (i, t)


def test_winnow_vectorized_matches_scalar(ray_session):
    """r5: the vectorized _Winnow batch kernel must be bit-exact with
    the per-row reference algorithm (per-gram md5, per-doc sliding
    window) for every (k, w) shape — the same A/B gate the minhash and
    simhash batch kernels have."""
    import hashlib
    import random

    from lucene_ray.pipelines.dedup import _Winnow

    def scalar(batch, k, w):
        out = set()
        for did, text in zip(batch["doc_id"].to_pylist(),
                             batch["text"].to_pylist()):
            ws = [x for x in (text or "").split(" ") if x]
            n = len(ws) - k + 1
            if n <= 0:
                continue
            grams = [" ".join(ws[i:i + k]) for i in range(n)]
            h = np.array([int(hashlib.md5(g.encode()).hexdigest()[:8], 16)
                          for g in grams], dtype=np.int64)
            if len(h) >= w:
                fps = np.unique(
                    np.lib.stride_tricks.sliding_window_view(h, w)
                    .min(axis=1))
            else:
                fps = np.unique(h.min(keepdims=True))
            out |= {(did, int(f)) for f in fps}
        return out

    rng = random.Random(7)
    words = ["alpha", "beta", "gamma", "delta", "eps", "the", "a", "x1"]
    texts = []
    for _ in range(120):
        t = " ".join(rng.choice(words) for _ in range(rng.randint(0, 25)))
        if rng.random() < 0.2:
            t = "  " + t + "   " + t  # extra spaces + repetition
        if rng.random() < 0.05:
            t = None
        texts.append(t)
    batch = pa.table({
        "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
        "text": pa.array(texts, pa.string())})
    for k, w in [(5, 4), (3, 2), (1, 1), (2, 7)]:
        got_t = _Winnow(k, w)(batch)
        got = set(zip(got_t["doc_id"].to_pylist(),
                      got_t["fp"].to_pylist()))
        assert got == scalar(batch, k, w), (k, w)
