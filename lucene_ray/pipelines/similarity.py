"""Similarity search over an embedding column (list<float>).

- brute-force cosine top-k: numpy matmul per batch against a broadcast
  query matrix (ray.put once, read per actor) with per-batch partial
  top-k -> tiny driver merge. Exact; the baseline.
- LSH-bucketed ANN: random-hyperplane signatures route vectors and
  queries to buckets; query probes its bucket (+ multiprobe neighbors).
  Approximate; the 100 TB scale path (shuffle moves (bucket, id) rows,
  matmuls stay bucket-local).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data


_TOPK_SCHEMA = pa.schema([("qid", pa.int64()), ("vec_id", pa.int64()),
                          ("rank", pa.int64())])


def _merge_topk_partials(parts: "ray.data.Dataset", k: int,
                         exclude_self: bool) -> pa.Table:
    """Distributed top-k reduce: ``groupby(qid).map_groups`` collapses
    every query's per-block partials to its final k rows, so the driver
    only ever materializes O(nq*k) rows — independent of input block
    count (r2 finding: ``take_all()`` of partials grew with the corpus).
    Tie order matches the old driver merge: cosine desc, vec_id asc."""

    def reduce_q(group: pa.Table) -> pa.Table:
        qid = group["qid"][0].as_py()
        v = group["vec_id"].to_numpy()
        s = group["sim"].to_numpy()
        if exclude_self:
            m = v != qid
            v, s = v[m], s[m]
        order = np.lexsort((v, -s))[:k]
        n = len(order)
        return pa.table({
            "qid": pa.array(np.full(n, qid, np.int64), pa.int64()),
            "vec_id": pa.array(v[order].astype(np.int64), pa.int64()),
            "rank": pa.array(np.arange(1, n + 1), pa.int64())})

    rows = parts.groupby("qid").map_groups(
        reduce_q, batch_format="pyarrow").take_all()
    if not rows:
        return _TOPK_SCHEMA.empty_table()
    return pa.Table.from_pylist(rows, schema=_TOPK_SCHEMA).sort_by(
        [("qid", "ascending"), ("rank", "ascending")])


def _load_queries(path: str, query_ids: list[int]):
    import pyarrow.parquet as pq
    import pyarrow.dataset as pads
    t = pq.read_table(path, columns=["vec_id", "embedding"],
                      filters=[("vec_id", "in", list(query_ids))])
    order = np.argsort(t.column("vec_id").to_numpy())
    qids = t.column("vec_id").to_numpy()[order]
    qmat = np.stack(t.column("embedding").to_pylist()).astype(np.float64)[order]
    qmat /= np.maximum(np.linalg.norm(qmat, axis=1, keepdims=True), 1e-12)
    return qids, qmat


def knn_brute(path: str, query_ids, k: int = 10,
              exclude_self: bool = True) -> pa.Table:
    """Exact cosine top-k for each query vector.

    Returns (qid, vec_id, rank) — rank 1..k by cosine desc, ties by
    vec_id asc. Distributed: per-batch partial top-k, driver merges the
    (n_queries x k x n_batches) partials.
    """
    query_ids = list(query_ids)
    qids, qmat = _load_queries(path, query_ids)
    ref = ray.put((qids, qmat))

    def partial_topk(batch: pa.Table) -> pa.Table:
        q_ids, q_mat = ray.get(ref)
        vids = batch["vec_id"].to_numpy()
        mat = np.stack(batch["embedding"].to_pylist()).astype(np.float64)
        mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        sims = q_mat @ mat.T  # (nq, nb)
        nq = sims.shape[0]
        kk = min(k + 1, sims.shape[1])
        idx = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]  # vectorized
        return pa.table({
            "qid": pa.array(np.repeat(q_ids, kk), pa.int64()),
            "vec_id": pa.array(vids[idx].reshape(-1), pa.int64()),
            "sim": pa.array(np.take_along_axis(sims, idx, axis=1)
                            .reshape(-1), pa.float64())})

    ds = ray.data.read_parquet(path, columns=["vec_id", "embedding"])
    parts = ds.map_batches(partial_topk, batch_format="pyarrow")
    return _merge_topk_partials(parts, k, exclude_self)


def knn_metric(path: str, query_ids, k: int = 10, *,
               metric: str = "cosine", label_mod: int | None = None,
               exclude_self: bool = True) -> pa.Table:
    """Exact top-k under a pluggable VectorSimilarityFunction
    (``index/VectorSimilarityFunction.java``: COSINE / DOT_PRODUCT /
    EUCLIDEAN) with an optional pre-filter on the ``label`` column —
    the KnnFloatVectorQuery(filter) shape: the reference intersects
    the filter's bitset with candidates; here the filter prunes each
    batch before the matmul (exact path). Rank: similarity desc
    (distance asc for euclidean), ties vec_id asc."""
    if metric not in ("cosine", "dot", "euclidean"):
        raise ValueError(f"unknown metric {metric!r}")
    query_ids = list(query_ids)
    import pyarrow.parquet as pq
    t = pq.read_table(path, columns=["vec_id", "embedding"],
                      filters=[("vec_id", "in", query_ids)])
    order = np.argsort(t.column("vec_id").to_numpy())
    qids = t.column("vec_id").to_numpy()[order]
    qmat = np.stack(t.column("embedding").to_pylist()) \
        .astype(np.float64)[order]
    if metric == "cosine":
        qmat = qmat / np.maximum(
            np.linalg.norm(qmat, axis=1, keepdims=True), 1e-12)
    ref = ray.put((qids, qmat))

    def partial_topk(batch: pa.Table) -> pa.Table:
        q_ids, q_mat = ray.get(ref)
        vids = batch["vec_id"].to_numpy()
        keep = np.ones(len(vids), dtype=bool)
        if label_mod is not None:
            keep = batch["label"].to_numpy() % label_mod == 0
        if not keep.any():
            return pa.table({"qid": pa.array([], pa.int64()),
                             "vec_id": pa.array([], pa.int64()),
                             "sim": pa.array([], pa.float64())})
        vids = vids[keep]
        mat = np.stack(
            batch["embedding"].to_pylist()).astype(np.float64)[keep]
        if metric == "cosine":
            mat = mat / np.maximum(
                np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
            sims = q_mat @ mat.T
        elif metric == "dot":
            sims = q_mat @ mat.T
        else:  # euclidean: higher sim == closer -> negate the distance
            # direct form per query (NOT the expanded a^2+b^2-2ab,
            # whose cancellation error could reorder near-dup pairs
            # vs the oracle's direct computation)
            sims = np.empty((len(q_mat), len(mat)))
            for qi in range(len(q_mat)):
                diff = mat - q_mat[qi]
                sims[qi] = -np.sqrt(np.einsum("nd,nd->n", diff, diff))
        kk = min(k + 1, sims.shape[1])
        idx = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
        return pa.table({
            "qid": pa.array(np.repeat(q_ids, kk), pa.int64()),
            "vec_id": pa.array(vids[idx].reshape(-1), pa.int64()),
            "sim": pa.array(np.take_along_axis(sims, idx, axis=1)
                            .reshape(-1), pa.float64())})

    cols = ["vec_id", "embedding"] + (
        ["label"] if label_mod is not None else [])
    ds = ray.data.read_parquet(path, columns=cols)
    parts = ds.map_batches(partial_topk, batch_format="pyarrow")
    return _merge_topk_partials(parts, k, exclude_self)


class _HyperplaneLSH:
    def __init__(self, dim: int, n_bits: int = 12, seed: int = 13):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((n_bits, dim))
        self.weights = (1 << np.arange(n_bits, dtype=np.int64))

    def bucket(self, mat: np.ndarray) -> np.ndarray:
        return ((mat @ self.planes.T) > 0) @ self.weights


def knn_lsh(path: str, query_ids, k: int = 10, n_bits: int = 8,
            exclude_self: bool = True) -> pa.Table:
    """Approximate top-k: hyperplane-LSH bucket + single-bit multiprobe.
    Same output schema as knn_brute (qid, vec_id, rank)."""
    query_ids = list(query_ids)
    qids, qmat = _load_queries(path, query_ids)
    dim = qmat.shape[1]
    lsh = _HyperplaneLSH(dim, n_bits)
    qb = lsh.bucket(qmat)
    # probe set per query: own bucket + all 1-bit flips
    probes = {}
    for qi, b in zip(qids, qb):
        probes[int(qi)] = {int(b)} | {int(b) ^ (1 << i) for i in range(n_bits)}
    ref = ray.put((qids, qmat, probes))

    def bucketed_topk(batch: pa.Table) -> pa.Table:
        q_ids, q_mat, probe = ray.get(ref)
        vids = batch["vec_id"].to_numpy()
        mat = np.stack(batch["embedding"].to_pylist()).astype(np.float64)
        mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        vb = _HyperplaneLSH(mat.shape[1], n_bits).bucket(mat)
        out_q, out_v, out_s = [], [], []
        for qi in range(len(q_ids)):
            mask = np.isin(vb, list(probe[int(q_ids[qi])]))
            if not mask.any():
                continue
            row = q_mat[qi] @ mat[mask].T
            sub = vids[mask]
            kk = min(k + 1, len(sub))
            idx = np.argpartition(-row, kk - 1)[:kk]
            out_q.extend([q_ids[qi]] * len(idx))
            out_v.extend(sub[idx])
            out_s.extend(row[idx])
        return pa.table({"qid": pa.array(out_q, pa.int64()),
                         "vec_id": pa.array(out_v, pa.int64()),
                         "sim": pa.array(out_s, pa.float64())})

    ds = ray.data.read_parquet(path, columns=["vec_id", "embedding"])
    parts = ds.map_batches(bucketed_topk, batch_format="pyarrow")
    return _merge_topk_partials(parts, k, exclude_self)


def lsh_recall_vs_brute(path: str, query_ids, k: int = 10) -> float:
    """Recall@k of the LSH variant against the exact baseline."""
    brute = knn_brute(path, query_ids, k)
    approx = knn_lsh(path, query_ids, k)
    b = {}
    for r in brute.to_pylist():
        b.setdefault(r["qid"], set()).add(r["vec_id"])
    a = {}
    for r in approx.to_pylist():
        a.setdefault(r["qid"], set()).add(r["vec_id"])
    recs = [len(b[q] & a.get(q, set())) / max(len(b[q]), 1) for q in b]
    return float(np.mean(recs)) if recs else 0.0
