"""IVF ANN index: partitioned build, probe-limited search, recall."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_ray.pipelines.ivf import (
    build_ivf_index,
    ivf_recall_vs_brute,
    knn_ivf,
)


@pytest.fixture(scope="module")
def clustered_vecs(ray_session, tmp_path_factory):
    """Clustered vectors (IVF's favorable case) + a planted near-dup."""
    rng = np.random.default_rng(31)
    centers = rng.standard_normal((10, 32)).astype(np.float32) * 3
    rows = []
    for i in range(800):
        c = centers[i % 10]
        rows.append(c + rng.standard_normal(32).astype(np.float32) * 0.3)
    base = np.stack(rows)
    base[700] = base[0] + rng.standard_normal(32).astype(np.float32) * 0.01
    t = pa.table({
        "vec_id": pa.array(np.arange(800, dtype=np.int64)),
        "embedding": pa.array([v.tolist() for v in base],
                              pa.list_(pa.float32())),
    })
    d = tmp_path_factory.mktemp("ivf")
    path = str(d / "embeddings.parquet")
    pq.write_table(t, path)
    return path, str(d / "ivfidx"), base


def test_build_partitioned_layout(clustered_vecs):
    path, idx, base = clustered_vecs
    meta = build_ivf_index(path, idx, n_lists=16)
    assert meta["n_vectors"] == 800 and meta["dim"] == 32
    lists_dir = os.path.join(idx, "lists")
    parts = [p for p in os.listdir(lists_dir) if p.startswith("list=")]
    assert len(parts) > 4  # hive partitions, one dir per non-empty list
    assert os.path.exists(os.path.join(idx, "centroids.npy"))


def test_planted_neighbor_found(clustered_vecs):
    path, idx, base = clustered_vecs
    got = knn_ivf(path, [0], k=5, nprobe=4, index_dir=idx).to_pylist()
    assert got and got[0]["vec_id"] == 700  # planted near-dup is rank 1


def test_recall_improves_with_nprobe(clustered_vecs):
    path, idx, base = clustered_vecs
    r2 = ivf_recall_vs_brute(path, range(8), k=10, nprobe=2)
    r_all = ivf_recall_vs_brute(path, range(8), k=10, nprobe=16)
    assert r_all == 1.0  # probing every list == exact
    assert r2 <= r_all
    assert r2 > 0.5  # clustered data: few probes already recall most
