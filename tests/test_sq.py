"""Scalar quantization: roundtrip bounds, correction accuracy, recall."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_ray.pipelines.sq import (
    SQ_BITS_MAX, fit_quantiles, knn_sq, quantize, sq_dot,
)


def _unit(m):
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


def test_quantize_roundtrip_bound():
    rng = np.random.default_rng(3)
    m = _unit(rng.normal(size=(500, 32)))
    p = fit_quantiles(m, confidence=1.0)  # full range -> no clipping
    q, sq, corr = quantize(m, p)
    dq = p.min_q + p.alpha * q.astype(np.float64)
    assert np.abs(m - dq).max() <= p.alpha / 2 + 1e-12
    assert q.max() <= SQ_BITS_MAX
    assert np.allclose(sq, q.sum(axis=1))


def test_correction_improves_near_neighbor_estimate():
    # the correction approximates the cross-error terms by each side's
    # self-error — exact when u == v, so it tightens estimates exactly
    # where ranking needs it: near the top (u ~ v pairs)
    rng = np.random.default_rng(4)
    a = _unit(rng.normal(size=(64, 32)))
    b = _unit(a + 0.05 * rng.normal(size=(64, 32)))
    p = fit_quantiles(np.vstack([a, b]))
    qa, sa, ca = quantize(a, p)
    qb, sb, cb = quantize(b, p)
    est = np.array([sq_dot(qa[i:i + 1], sa[i:i + 1], ca[i:i + 1],
                           qb[i:i + 1], sb[i:i + 1], cb[i:i + 1], p)[0, 0]
                    for i in range(len(a))])
    naive = np.array([sq_dot(qa[i:i + 1], sa[i:i + 1], np.zeros(1),
                             qb[i:i + 1], sb[i:i + 1], np.zeros(1), p)[0, 0]
                      for i in range(len(a))])
    true = (a * b).sum(axis=1)
    assert np.abs(est - true).mean() < np.abs(naive - true).mean()
    assert np.abs(est - true).mean() < 0.005  # tight at dim 32 / 7 bits


@pytest.fixture(scope="module")
def clustered_vecs(ray_session, tmp_path_factory):
    rng = np.random.default_rng(9)
    cents = _unit(rng.normal(size=(15, 24)))
    rows = []
    for i in range(1500):
        v = cents[i % 15] + 0.15 * rng.normal(size=24)
        rows.append(v / np.linalg.norm(v))
    mat = np.asarray(rows, dtype=np.float32)
    d = tmp_path_factory.mktemp("sq")
    path = str(d / "embeddings.parquet")
    pq.write_table(pa.table({
        "vec_id": pa.array(np.arange(1500, dtype=np.int64)),
        "embedding": pa.array(list(mat), pa.list_(pa.float32()))}), path)
    return path, mat.astype(np.float64)


def _brute(mat, qid, k):
    q = mat[qid] / np.linalg.norm(mat[qid])
    m = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = m @ q
    ids = np.arange(len(mat))
    keep = ids != qid
    ids, sims = ids[keep], sims[keep]
    order = np.lexsort((ids, -sims))[:k]
    return ids[order].tolist()


def test_knn_sq_exhaustive_equals_brute(clustered_vecs):
    path, mat = clustered_vecs
    t = knn_sq(path, range(5), 10, rerank_all=True).to_pandas()
    for qid in range(5):
        got = t[t.qid == qid].sort_values("rank")["vec_id"].tolist()
        assert got == _brute(mat, qid, 10)


def test_knn_sq_default_rerank_recall(clustered_vecs):
    path, mat = clustered_vecs
    t = knn_sq(path, range(10), 10, rerank=30).to_pandas()
    hit = tot = 0
    for qid in range(10):
        want = set(_brute(mat, qid, 10))
        got = set(t[t.qid == qid]["vec_id"].tolist())
        hit += len(want & got)
        tot += len(want)
    assert hit / tot >= 0.95
