"""HNSW graph ANN: exhaustive-beam exactness, default-ef recall,
persistence round-trip, multi-segment merge, determinism.

Reference behaviors: util/hnsw/TestHnswFloatVectorGraph.java (graph
build + recall), search/TestKnnFloatVectorQuery.java (top-k query)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_ray.pipelines.hnsw import (
    _HnswGraph,
    _levels_for,
    _normalize64,
    build_hnsw_index,
    hnsw_recall_vs_brute,
    knn_hnsw,
)


@pytest.fixture(scope="module")
def clustered_emb(ray_session, tmp_path_factory):
    """20 well-separated clusters x 400 members: recall is meaningful
    (random uniform vectors make every neighbor list arbitrary)."""
    rng = np.random.default_rng(77)
    n_clusters, per, dim = 20, 400, 32
    centers = rng.standard_normal((n_clusters, dim)).astype(np.float32) * 5
    vecs = np.concatenate([
        centers[c] + rng.standard_normal((per, dim)).astype(np.float32)
        for c in range(n_clusters)])
    n = len(vecs)
    perm = rng.permutation(n)
    vecs = vecs[perm]
    t = pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array([v.tolist() for v in vecs],
                              pa.list_(pa.float32())),
    })
    d = tmp_path_factory.mktemp("hnsw")
    path = str(d / "embeddings.parquet")
    pq.write_table(t, path, row_group_size=1024)
    # one shared build: all graph tests reuse this index (build is the
    # expensive part of this module)
    idx = str(d / "idx")
    build_hnsw_index(path, idx, segment_size=2048)
    return path, vecs, str(d), idx


def test_graph_exhaustive_is_exact(ray_session):
    rng = np.random.default_rng(3)
    mat = _normalize64(rng.standard_normal((500, 16)).astype(np.float32))
    g = _HnswGraph(mat, _levels_for(np.arange(500), 16))
    g.build()
    q = mat[7]
    res = g.search(q, 10, ef=500)
    sims = mat @ q
    want = np.lexsort((np.arange(500), -sims))[:10]
    assert [n for _, n in res] == want.tolist()


def test_multi_segment_exhaustive_matches_brute(clustered_emb):
    """4+ segments, exhaustive ef: HNSW == brute force exactly
    (the knn_hnsw_top10 oracle gate)."""
    from lucene_ray.pipelines.similarity import knn_brute
    path, vecs, d, idx = clustered_emb
    qids = [0, 17, 4242, 7999]
    got = knn_hnsw(path, qids, k=10, ef=10**6, segment_size=2048,
                   index_dir=idx)
    want = knn_brute(path, qids, k=10)
    assert got.to_pylist() == want.to_pylist()


def test_recall_at_default_ef(clustered_emb):
    from lucene_ray.pipelines.hnsw import hnsw_search
    from lucene_ray.pipelines.similarity import _load_queries, knn_brute
    path, vecs, d, idx = clustered_emb
    qid_list = list(range(0, 8000, 400))
    qids, qmat = _load_queries(path, qid_list)
    approx = hnsw_search(idx, qids, qmat, k=10, ef=100)
    brute = knn_brute(path, qid_list, k=10)
    b: dict = {}
    for r in brute.to_pylist():
        b.setdefault(r["qid"], set()).add(r["vec_id"])
    a: dict = {}
    for r in approx.to_pylist():
        a.setdefault(r["qid"], set()).add(r["vec_id"])
    recs = [len(b[q] & a.get(q, set())) / 10 for q in b]
    rec = sum(recs) / len(recs)
    assert rec >= 0.95, rec


def test_persistence_roundtrip_and_resume(clustered_emb):
    """Loading a written segment reproduces search results; re-running
    the build skips existing segment dirs (resumability)."""
    import os

    from lucene_ray.pipelines.hnsw import _load_segment
    path, vecs, d, idx = clustered_emb
    with open(os.path.join(idx, "manifest.json")) as f:
        import json
        m1 = json.load(f)
    assert len(m1["segments"]) >= 2
    seg = m1["segments"][0]
    mtime = os.path.getmtime(os.path.join(idx, seg, "graph.parquet"))
    vec_ids, g = _load_segment(os.path.join(idx, seg))
    assert g.entry >= 0 and len(vec_ids) > 0
    res = g.search(g.mat[0], 5, ef=50)
    assert len(res) == 5
    m2 = build_hnsw_index(path, idx, segment_size=2048)
    assert m2["segments"] == m1["segments"]
    assert os.path.getmtime(os.path.join(idx, seg, "graph.parquet")) == mtime


def test_levels_deterministic_and_geometric():
    ids = np.arange(100_000, dtype=np.int64)
    lv = _levels_for(ids, 16)
    assert (lv == _levels_for(ids, 16)).all()
    # geometric decay: ~1/M of nodes per extra level
    frac1 = (lv >= 1).mean()
    assert 0.02 < frac1 < 0.15
    assert (lv >= 2).mean() < frac1 * 0.3
