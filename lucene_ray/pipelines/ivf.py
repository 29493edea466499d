"""IVF (inverted-file) ANN index over an embedding column.

The reference ships a graph ANN index (HNSW —
``util/hnsw/HnswGraphBuilder.java:617``, queries
``search/TestKnnFloatVectorQuery.java``). A navigable graph needs a
shared mutable structure while it builds, which fights the Ray Data
model; the Ray-first equivalent of "a persisted ANN index you probe
instead of scanning" is IVF partitioning:

- BUILD: k-means centroids from a driver-side sample (the model is
  tiny), then ONE streaming ``map_batches`` assigns every vector to its
  nearest centroid and writes Parquet partitioned by list id — a
  resumable, hive-partitioned index directory.
- SEARCH: a query probes its ``nprobe`` nearest centroids and reads
  ONLY those list partitions (partition pruning at the read — the scan
  is |probed lists| / |lists| of the data), then exact cosine top-k
  inside the probed subset.

Recall is tunable with nprobe (= 1.0 when nprobe == n_lists).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa

import ray
import ray.data


def _normalize(mat: np.ndarray) -> np.ndarray:
    return mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)


def _kmeans(sample: np.ndarray, n_lists: int, iters: int, seed: int):
    """Spherical k-means (cosine): Lloyd's on normalized vectors."""
    rng = np.random.default_rng(seed)
    cent = sample[rng.choice(len(sample), n_lists, replace=False)].copy()
    for _ in range(iters):
        assign = np.argmax(sample @ cent.T, axis=1)
        for c in range(n_lists):
            members = sample[assign == c]
            if len(members):
                v = members.sum(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    cent[c] = v / n
    return cent.astype(np.float32)


def build_ivf_index(path: str, out_dir: str, *, n_lists: int | None = None,
                    sample_size: int = 20_000, iters: int = 10,
                    seed: int = 41) -> dict:
    """Build the IVF index directory: centroids.npy + meta.json +
    ``lists/list=<c>/*.parquet`` (vec_id + normalized vector)."""
    ds = ray.data.read_parquet(path, columns=["vec_id", "embedding"])
    n_total = ds.count()
    if n_lists is None:
        n_lists = max(1, min(256, int(np.sqrt(n_total))))
    frac = min(1.0, sample_size / max(n_total, 1))
    sample_rows = (ds.random_sample(frac, seed=seed).take(sample_size)
                   if frac < 1.0 else ds.take(n_total))
    sample = _normalize(np.stack([r["embedding"] for r in sample_rows])
                        .astype(np.float32))
    n_lists = min(n_lists, len(sample))
    cent = _kmeans(sample, n_lists, iters, seed)
    os.makedirs(out_dir, exist_ok=True)
    np.save(os.path.join(out_dir, "centroids.npy"), cent)
    cref = ray.put(cent)

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(cref)
        mat = _normalize(np.stack(batch["embedding"].to_pylist())
                         .astype(np.float32))
        lists = np.argmax(mat @ c.T, axis=1).astype(np.int32)
        vec = pa.FixedSizeListArray.from_arrays(
            pa.array(mat.reshape(-1)), mat.shape[1])
        # "list" becomes the hive partition dir; "list_id" stays in the
        # row data so probed reads see it without partition inference
        return pa.table({"list": pa.array(lists),
                         "list_id": pa.array(lists),
                         "vec_id": batch["vec_id"],
                         "vec": vec})

    ds.map_batches(assign, batch_format="pyarrow").write_parquet(
        os.path.join(out_dir, "lists"), partition_cols=["list"])
    meta = {"n_lists": int(n_lists), "dim": int(cent.shape[1]),
            "n_vectors": int(n_total)}
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump(meta, f)
    return meta


def ivf_search(out_dir: str, qids: np.ndarray, qmat: np.ndarray,
               k: int = 10, nprobe: int = 8,
               exclude_self: bool = True) -> pa.Table:
    """Probe each query's nprobe nearest lists; exact cosine inside.
    Returns (qid, vec_id, rank) like knn_brute."""
    cent = np.load(os.path.join(out_dir, "centroids.npy"))
    qmat = _normalize(qmat.astype(np.float32))
    nprobe = min(nprobe, len(cent))
    sims_c = qmat @ cent.T
    probes = np.argsort(-sims_c, axis=1)[:, :nprobe]  # (nq, nprobe)
    needed = sorted({int(x) for x in probes.reshape(-1)})
    # explicit partition pruning: only the probed lists' directories are
    # ever opened (|probed| / |lists| of the index data)
    lists_root = os.path.join(out_dir, "lists")
    dirs = [os.path.join(lists_root, f"list={c}") for c in needed]
    paths = [os.path.join(d, f) for d in dirs if os.path.isdir(d)
             for f in sorted(os.listdir(d)) if f.endswith(".parquet")]
    if not paths:
        return pa.table({"qid": pa.array([], pa.int64()),
                         "vec_id": pa.array([], pa.int64()),
                         "rank": pa.array([], pa.int64())})
    ds = ray.data.read_parquet(paths)
    qref = ray.put((qids, qmat, probes))

    def partial(batch: pa.Table) -> pa.Table:
        q_ids, q_mat, prb = ray.get(qref)
        lists = batch["list_id"].to_numpy()
        vids = batch["vec_id"].to_numpy()
        mat = np.stack(batch["vec"].to_pylist()).astype(np.float32)
        out_q, out_v, out_s = [], [], []
        for qi in range(len(q_ids)):
            mask = np.isin(lists, prb[qi])
            if not mask.any():
                continue
            row = (q_mat[qi] @ mat[mask].T).astype(np.float64)
            sub = vids[mask]
            kk = min(k + 1, len(sub))
            idx = np.argpartition(-row, kk - 1)[:kk]
            out_q.extend([q_ids[qi]] * len(idx))
            out_v.extend(sub[idx])
            out_s.extend(row[idx])
        return pa.table({"qid": pa.array(out_q, pa.int64()),
                         "vec_id": pa.array(out_v, pa.int64()),
                         "sim": pa.array(out_s, pa.float64())})

    from .similarity import _merge_topk_partials
    parts = ds.map_batches(partial, batch_format="pyarrow")
    return _merge_topk_partials(parts, k, exclude_self)


def knn_ivf(path: str, query_ids, k: int = 10, nprobe: int = 8,
            index_dir: str | None = None) -> pa.Table:
    """Build-or-reuse the IVF index for ``path``, answer top-k."""
    import hashlib

    from .similarity import _load_queries

    if index_dir is None:
        key = hashlib.md5(path.encode()).hexdigest()[:12]
        index_dir = os.path.join("/tmp/lucene_ray_cache", f"ivf-{key}")
    if not os.path.exists(os.path.join(index_dir, "meta.json")):
        build_ivf_index(path, index_dir)
    qids, qmat = _load_queries(path, list(query_ids))
    return ivf_search(index_dir, qids, qmat, k=k, nprobe=nprobe)


def ivf_recall_vs_brute(path: str, query_ids, k: int = 10,
                        nprobe: int = 8) -> float:
    from .similarity import knn_brute
    brute = knn_brute(path, query_ids, k)
    approx = knn_ivf(path, query_ids, k, nprobe=nprobe)
    b: dict[int, set] = {}
    for r in brute.to_pylist():
        b.setdefault(r["qid"], set()).add(r["vec_id"])
    a: dict[int, set] = {}
    for r in approx.to_pylist():
        a.setdefault(r["qid"], set()).add(r["vec_id"])
    recs = [len(b[q] & a.get(q, set())) / max(len(b[q]), 1) for q in b]
    return float(np.mean(recs)) if recs else 0.0
