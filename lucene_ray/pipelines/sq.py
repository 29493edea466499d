"""Scalar-quantized vector search (int7 quantization + rescore).

Reference semantics: ``lucene/core/src/java/org/apache/lucene/util/
quantization/ScalarQuantizer.java`` + ``codecs/lucene99/
Lucene99ScalarQuantizedVectorsFormat.java`` (tests
``TestScalarQuantizer.java``, ``TestLucene99ScalarQuantizedVectorsFormat
.java``): per-index min/max quantiles from a confidence interval over a
sample, linear 7-bit quantization, and a per-vector score-correction
constant so quantized dot products approximate float dot products;
full-precision rescoring of the quantized candidates recovers exactness.

Quantization math (the published formulation the reference implements):
  alpha = (maxQ - minQ) / 127
  q_i   = round(clamp(v_i, minQ, maxQ) - minQ) / alpha)   in [0, 127]
  dq_i  = minQ + alpha * q_i          (dequantized)
  corr  = sum_i (v_i - dq_i) * dq_i   (per-vector correction)
  dot(u, v) ~= sum_i dq(u)_i dq(v)_i + corr_u + corr_v
            =  alpha^2 (qu . qv) + alpha*minQ*(sum qu + sum qv)
               + dim*minQ^2 + corr_u + corr_v
so a segment stores only (qvec uint8, sum_q, corr) — 1 byte/dim + 12
bytes instead of 4 bytes/dim, and candidate selection is an int matmul.

Ray-first shape: quantile fit on a driver-side SAMPLE (broadcast with
``ray.put``); quantize + int-dot candidate selection is a stateless
``map_batches`` over the embeddings (partial top-R per batch); ONE
``groupby(qid)`` reduce keeps top-R per query; full-precision rescore
reads ONLY the candidate vectors back (pushdown) — driver sees
O(nq * R) rows. ``rerank_all=True`` keeps every candidate, making the
result bit-equal to brute force (the SQL-oracle gate, same pattern as
the exhaustive-beam HNSW gate); default-R recall is pytest-gated.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import pyarrow as pa

import ray
import ray.data

from .similarity import _load_queries, _TOPK_SCHEMA

SQ_BITS_MAX = 127  # 7-bit, as Lucene99's default


class SQParams(NamedTuple):
    min_q: float
    max_q: float
    alpha: float
    dim: int


def fit_quantiles(sample: np.ndarray,
                  confidence: float | None = None) -> SQParams:
    """Confidence-interval quantiles over all components of a sample of
    (already normalized) vectors — ScalarQuantizer.fromVectors. The
    default confidence is Lucene's ``1 - 1/(dim + 1)``."""
    dim = sample.shape[1]
    if confidence is None:
        confidence = 1.0 - 1.0 / (dim + 1)
    flat = sample.reshape(-1)
    lo = (1.0 - confidence) / 2.0
    min_q = float(np.quantile(flat, lo))
    max_q = float(np.quantile(flat, 1.0 - lo))
    if max_q <= min_q:
        max_q = min_q + 1e-9
    return SQParams(min_q, max_q, (max_q - min_q) / SQ_BITS_MAX, dim)


def quantize(mat: np.ndarray, p: SQParams):
    """(qvec uint8 (n, d), sum_q int64 (n,), corr float64 (n,))."""
    c = np.clip(mat, p.min_q, p.max_q)
    q = np.round((c - p.min_q) / p.alpha).astype(np.uint8)
    dq = p.min_q + p.alpha * q.astype(np.float64)
    corr = ((mat - dq) * dq).sum(axis=1)
    return q, q.sum(axis=1, dtype=np.int64), corr


def sq_dot(qu: np.ndarray, su: np.ndarray, cu: np.ndarray,
           qv: np.ndarray, sv: np.ndarray, cv: np.ndarray,
           p: SQParams) -> np.ndarray:
    """Estimated dot products (nu, nv) from quantized parts."""
    ip = qu.astype(np.int32) @ qv.astype(np.int32).T  # int matmul
    return (p.alpha * p.alpha * ip
            + p.alpha * p.min_q * (su[:, None] + sv[None, :])
            + p.dim * p.min_q * p.min_q
            + cu[:, None] + cv[None, :])


def _fit_from_sample(path: str, sample_rows: int = 2048,
                     confidence: float | None = None) -> SQParams:
    import pyarrow.parquet as pq
    t = pq.read_table(path, columns=["embedding"],
                      filters=[("vec_id", "<", sample_rows)])
    m = np.stack(t.column("embedding").to_pylist()).astype(np.float64)
    m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
    return fit_quantiles(m, confidence)


def knn_sq(path: str, query_ids, k: int = 10, rerank: int = 40,
           rerank_all: bool = False, exclude_self: bool = True,
           confidence: float | None = None) -> pa.Table:
    """Scalar-quantized ANN: int7 candidate selection + full-precision
    rescore of the top-``rerank`` candidates per query. With
    ``rerank_all`` every vector is rescored (== brute force; the
    oracle gate). Returns (qid, vec_id, rank)."""
    query_ids = list(query_ids)
    p = _fit_from_sample(path, confidence=confidence)
    qids, qmat = _load_queries(path, query_ids)
    qq, qs, qc = quantize(qmat, p)
    ref = ray.put((qids, qq, qs, qc, p))
    R = 1 << 62 if rerank_all else max(rerank, k + 1)

    def partial(batch: pa.Table) -> pa.Table:
        q_ids, q_q, q_s, q_c, pp = ray.get(ref)
        vids = batch["vec_id"].to_numpy()
        mat = np.stack(batch["embedding"].to_pylist()).astype(np.float64)
        mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        vq, vs, vc = quantize(mat, pp)
        sims = sq_dot(q_q, q_s, q_c, vq, vs, vc, pp)  # (nq, nb)
        kk = min(R, sims.shape[1])
        if kk < sims.shape[1]:
            idx = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
        else:
            idx = np.tile(np.arange(sims.shape[1]), (len(q_ids), 1))
        return pa.table({
            "qid": pa.array(np.repeat(q_ids, idx.shape[1]), pa.int64()),
            "vec_id": pa.array(vids[idx].reshape(-1), pa.int64()),
            "sim": pa.array(np.take_along_axis(sims, idx, axis=1)
                            .reshape(-1), pa.float64())})

    ds = ray.data.read_parquet(path, columns=["vec_id", "embedding"])
    parts = ds.map_batches(partial, batch_format="pyarrow")

    def reduce_q(group: pa.Table) -> pa.Table:
        qid = group["qid"][0].as_py()
        v = group["vec_id"].to_numpy()
        s = group["sim"].to_numpy()
        kk = min(R if not rerank_all else len(v), len(v))
        order = np.lexsort((v, -s))[:kk]
        return pa.table({
            "qid": pa.array(np.full(len(order), qid, np.int64)),
            "vec_id": pa.array(v[order].astype(np.int64))})

    cand = parts.groupby("qid").map_groups(
        reduce_q, batch_format="pyarrow").to_pandas()
    # full-precision rescore of the candidate union (pushdown unless
    # the exhaustive gate already selected everything)
    import pyarrow.parquet as pq
    uniq = np.unique(cand["vec_id"].to_numpy())
    if rerank_all:
        t = pq.read_table(path, columns=["vec_id", "embedding"])
    else:
        t = pq.read_table(path, columns=["vec_id", "embedding"],
                          filters=[("vec_id", "in", uniq.tolist())])
    cids = t.column("vec_id").to_numpy()
    cmat = np.stack(t.column("embedding").to_pylist()).astype(np.float64)
    cmat /= np.maximum(np.linalg.norm(cmat, axis=1, keepdims=True), 1e-12)
    pos = {int(v): i for i, v in enumerate(cids)}
    out = []
    for qi, qid in enumerate(qids):
        mine = cand[cand["qid"] == qid]["vec_id"].to_numpy()
        if exclude_self:
            mine = mine[mine != qid]
        rows = np.array([pos[int(v)] for v in mine], dtype=np.int64)
        sims = cmat[rows] @ qmat[qi]
        order = np.lexsort((mine, -sims))[:k]
        sel = mine[order]
        out.append(pa.table({
            "qid": pa.array(np.full(len(sel), qid, np.int64)),
            "vec_id": pa.array(sel.astype(np.int64)),
            "rank": pa.array(np.arange(1, len(sel) + 1, dtype=np.int64))}))
    if not out:
        return _TOPK_SCHEMA.empty_table()
    return pa.concat_tables(out)
