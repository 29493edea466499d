"""Product-quantized ANN (PQ codes + asymmetric distance + rescore).

The product-quantization compression path a 100-TB vector corpus needs
(Jégou, Douze, Schmid, "Product Quantization for Nearest Neighbor
Search", IEEE TPAMI 2011 — the published algorithm; plays the same
compressed-vector role as the reference's quantized KNN formats,
``lucene/core/src/java/org/apache/lucene/codecs/lucene99/
Lucene99ScalarQuantizedVectorsFormat.java`` being the scalar cousin):

- TRAIN: the dimension is split into M subspaces; per-subspace k-means
  (K centroids each) on a driver-side sample -> an (M, K, dsub)
  codebook, the broadcast small side. Storage per vector is M bytes
  (codes) instead of 4*dim — 16x smaller than float32 at dim=64, M=16.
- ENCODE + SEARCH (ADC, asymmetric distance computation): a stateless
  ``map_batches`` encodes each batch and scores ALL queries against it
  with per-query lookup tables LUT[m, k] = <query_sub_m, codebook_mk>
  (one (M*K, dsub) matmul per batch of queries, then a gather-sum per
  vector) -> partial top-R; ONE ``groupby(qid)`` reduce keeps top-R
  per query; full-precision rescore reads only the candidates back.
- ``rerank_all=True`` rescores everything (== brute force; the oracle
  gate, same pattern as exhaustive HNSW / SQ); default-R recall is
  pytest-gated.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from .ivf import _kmeans, _normalize
from .similarity import _TOPK_SCHEMA, _load_queries


def train_codebook(sample: np.ndarray, m: int = 8, k: int = 256,
                   iters: int = 10, seed: int = 17) -> np.ndarray:
    """(M, K, dsub) codebook: independent k-means per subspace.
    ``sample`` must be normalized; dim must divide by ``m``."""
    n, dim = sample.shape
    assert dim % m == 0, f"dim {dim} not divisible by M={m}"
    dsub = dim // m
    k = min(k, n)
    books = []
    for j in range(m):
        sub = np.ascontiguousarray(sample[:, j * dsub:(j + 1) * dsub])
        # plain (non-spherical) k-means on the subvectors: Lloyd's with
        # euclidean assignment — subvectors are not unit-norm
        rng = np.random.default_rng(seed + j)
        cent = sub[rng.choice(n, k, replace=False)].copy()
        for _ in range(iters):
            d2 = ((sub[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2) \
                if n * k * dsub <= 2**24 else None
            if d2 is None:
                # blockwise for big samples
                assign = np.empty(n, dtype=np.int64)
                step = max(1, 2**24 // (k * dsub))
                for s in range(0, n, step):
                    blk = sub[s:s + step]
                    d = (blk ** 2).sum(1)[:, None] - 2 * blk @ cent.T \
                        + (cent ** 2).sum(1)[None, :]
                    assign[s:s + step] = np.argmin(d, axis=1)
            else:
                assign = np.argmin(d2, axis=1)
            for c in range(k):
                mem = sub[assign == c]
                if len(mem):
                    cent[c] = mem.mean(axis=0)
        books.append(cent)
    return np.stack(books).astype(np.float64)  # (M, K, dsub)


def encode(mat: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(n, M) uint8/uint16 codes: nearest centroid per subspace."""
    m, k, dsub = books.shape
    n = len(mat)
    codes = np.empty((n, m), dtype=np.uint8 if k <= 256 else np.uint16)
    for j in range(m):
        sub = mat[:, j * dsub:(j + 1) * dsub]
        cent = books[j]
        d = (sub ** 2).sum(1)[:, None] - 2 * sub @ cent.T \
            + (cent ** 2).sum(1)[None, :]
        codes[:, j] = np.argmin(d, axis=1)
    return codes


def adc_scores(qmat: np.ndarray, codes: np.ndarray,
               books: np.ndarray) -> np.ndarray:
    """(nq, n) approximate dot products: LUT gather-sum."""
    m, k, dsub = books.shape
    nq = len(qmat)
    # LUT[q, j, c] = <q_sub_j, books[j, c]>
    lut = np.einsum("qjd,jcd->qjc",
                    qmat.reshape(nq, m, dsub), books)
    n = len(codes)
    out = np.zeros((nq, n), dtype=np.float64)
    for j in range(m):
        out += lut[:, j, :][:, codes[:, j].astype(np.int64)]
    return out


def knn_pq(path: str, query_ids, k: int = 10, m: int = 8,
           n_cent: int = 256, rerank: int = 40, rerank_all: bool = False,
           exclude_self: bool = True, sample_rows: int = 4096,
           seed: int = 17) -> pa.Table:
    """PQ-ADC ANN with full-precision rescore of the top-``rerank``
    candidates per query; ``rerank_all`` == brute (oracle gate).
    Returns (qid, vec_id, rank)."""
    import pyarrow.parquet as pq

    query_ids = list(query_ids)
    t = pq.read_table(path, columns=["embedding"],
                      filters=[("vec_id", "<", sample_rows)])
    sample = _normalize(np.stack(t.column("embedding").to_pylist())
                        .astype(np.float64))
    books = train_codebook(sample, m=m, k=n_cent, seed=seed)
    qids, qmat = _load_queries(path, query_ids)
    ref = ray.put((qids, qmat, books))
    R = 1 << 62 if rerank_all else max(rerank, k + 1)

    def partial(batch: pa.Table) -> pa.Table:
        q_ids, q_mat, bks = ray.get(ref)
        vids = batch["vec_id"].to_numpy()
        mat = _normalize(np.stack(batch["embedding"].to_pylist())
                         .astype(np.float64))
        sims = adc_scores(q_mat, encode(mat, bks), bks)
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
        kk = min(R, len(v))
        order = np.lexsort((v, -s))[:kk]
        return pa.table({
            "qid": pa.array(np.full(len(order), qid, np.int64)),
            "vec_id": pa.array(v[order].astype(np.int64))})

    cand = parts.groupby("qid").map_groups(
        reduce_q, batch_format="pyarrow").to_pandas()
    uniq = np.unique(cand["vec_id"].to_numpy())
    if rerank_all:
        t = pq.read_table(path, columns=["vec_id", "embedding"])
    else:
        t = pq.read_table(path, columns=["vec_id", "embedding"],
                          filters=[("vec_id", "in", uniq.tolist())])
    cids = t.column("vec_id").to_numpy()
    cmat = _normalize(np.stack(t.column("embedding").to_pylist())
                      .astype(np.float64))
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
