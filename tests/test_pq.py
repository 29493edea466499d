"""Product quantization: codebook/encode/ADC kernels + end-to-end ANN."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_ray.pipelines.pq import (
    adc_scores, encode, knn_pq, train_codebook,
)


def _unit(m):
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


def test_codebook_shapes_and_encode_range():
    rng = np.random.default_rng(1)
    sample = _unit(rng.normal(size=(400, 32)))
    books = train_codebook(sample, m=8, k=16, seed=5)
    assert books.shape == (8, 16, 4)
    codes = encode(sample, books)
    assert codes.shape == (400, 8)
    assert codes.max() < 16


def test_adc_approximates_dot():
    rng = np.random.default_rng(2)
    sample = _unit(rng.normal(size=(600, 32)))
    books = train_codebook(sample, m=8, k=64, seed=5)
    q = _unit(rng.normal(size=(5, 32)))
    codes = encode(sample, books)
    approx = adc_scores(q, codes, books)
    true = q @ sample.T
    # mean absolute error well under the similarity scale
    assert np.abs(approx - true).mean() < 0.08
    # ADC of a vector against itself ranks itself near the top
    self_codes = encode(q, books)
    self_approx = adc_scores(q, self_codes, books)
    assert np.allclose(np.diag(self_approx),
                       adc_scores(q, self_codes, books).diagonal())


def test_adc_ranking_recall_plain_numpy():
    rng = np.random.default_rng(3)
    cents = _unit(rng.normal(size=(10, 32)))
    mat = _unit(np.repeat(cents, 80, axis=0)
                + 0.12 * rng.normal(size=(800, 32)))
    books = train_codebook(mat[:400], m=8, k=32, seed=5)
    codes = encode(mat, books)
    q = mat[:5]
    approx = adc_scores(q, codes, books)
    true = q @ mat.T
    hit = tot = 0
    for i in range(5):
        want = set(np.argsort(-true[i])[:10].tolist())
        got = set(np.argsort(-approx[i])[:40].tolist())
        hit += len(want & got)
        tot += 10
    assert hit / tot >= 0.9  # top-10 survives into ADC top-40


@pytest.fixture(scope="module")
def pq_corpus(ray_session, tmp_path_factory):
    rng = np.random.default_rng(9)
    cents = _unit(rng.normal(size=(12, 32)))
    rows = _unit(cents[np.arange(1200) % 12]
                 + 0.15 * rng.normal(size=(1200, 32)))
    mat = rows.astype(np.float32)
    d = tmp_path_factory.mktemp("pq")
    path = str(d / "embeddings.parquet")
    pq.write_table(pa.table({
        "vec_id": pa.array(np.arange(1200, dtype=np.int64)),
        "embedding": pa.array(list(mat), pa.list_(pa.float32()))}), path)
    return path, rows


def _brute(mat, qid, k):
    sims = mat @ mat[qid]
    ids = np.arange(len(mat))
    keep = ids != qid
    ids, sims = ids[keep], sims[keep]
    order = np.lexsort((ids, -sims))[:k]
    return ids[order].tolist()


def test_knn_pq_exhaustive_equals_brute(pq_corpus):
    path, mat = pq_corpus
    t = knn_pq(path, range(4), 10, m=8, n_cent=32,
               rerank_all=True, sample_rows=600).to_pandas()
    for qid in range(4):
        got = t[t.qid == qid].sort_values("rank")["vec_id"].tolist()
        assert got == _brute(mat, qid, 10)


def test_knn_pq_default_rerank_recall(pq_corpus):
    path, mat = pq_corpus
    t = knn_pq(path, range(8), 10, m=8, n_cent=32, rerank=50,
               sample_rows=600).to_pandas()
    hit = tot = 0
    for qid in range(8):
        want = set(_brute(mat, qid, 10))
        got = set(t[t.qid == qid]["vec_id"].tolist())
        hit += len(want & got)
        tot += len(want)
    assert hit / tot >= 0.9
