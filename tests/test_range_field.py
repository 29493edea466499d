"""RangeFieldQuery (document/DoubleRange + search/RangeFieldQuery
roles): INTERSECTS / WITHIN / CONTAINS / CROSSES vs brute predicates."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def rf_corpus(ray_session, tmp_path_factory):
    from lucene_ray.index import build_index
    rng = np.random.default_rng(41)
    n = 400
    lo = rng.uniform(0, 100, n)
    hi = lo + rng.uniform(0, 60, n)
    t = pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "text": pa.array([f"doc {i}" for i in range(n)], pa.string()),
        "rlo": pa.array(lo),
        "rhi": pa.array(hi),
    })
    d = tmp_path_factory.mktemp("rangef")
    path = str(d / "docs.parquet")
    pq.write_table(t, path)
    out = str(d / "idx")
    build_index(path, out, batch_size=64, doc_value_cols=("rlo", "rhi"))
    return out, lo, hi


QLO, QHI = 30.0, 70.0


def _brute(lo, hi, relation):
    inter = (lo <= QHI) & (hi >= QLO)
    within = (lo >= QLO) & (hi <= QHI)
    contains = (lo <= QLO) & (hi >= QHI)
    if relation == "intersects":
        keep = inter
    elif relation == "within":
        keep = within
    elif relation == "contains":
        keep = contains
    else:
        keep = inter & ~within & ~contains
    return np.nonzero(keep)[0]


@pytest.mark.parametrize("relation",
                         ["intersects", "within", "contains", "crosses"])
def test_range_field_relations(rf_corpus, relation):
    from lucene_ray.search import IndexReader, RangeFieldQuery, Searcher
    out, lo, hi = rf_corpus
    s = Searcher(IndexReader(out))
    q = RangeFieldQuery(("rlo",), ("rhi",), (QLO,), (QHI,), relation)
    got = s.match_docs(q)
    want = _brute(lo, hi, relation)
    assert len(want) > 0  # non-trivial at this seed
    np.testing.assert_array_equal(got, want)


def test_range_field_partition():
    """within + contains + crosses partitions intersects."""
    rng = np.random.default_rng(7)
    lo = rng.uniform(0, 100, 1000)
    hi = lo + rng.uniform(0, 80, 1000)
    i = set(_brute(lo, hi, "intersects"))
    w = set(_brute(lo, hi, "within"))
    c = set(_brute(lo, hi, "contains"))
    x = set(_brute(lo, hi, "crosses"))
    assert w | c | x == i
    assert not (w & x) and not (c & x)


def test_range_field_multidim(rf_corpus):
    """2-D range field: conjunction across dims (same column pair used
    twice with different boxes = intersection of the 1-D results)."""
    from lucene_ray.search import IndexReader, RangeFieldQuery, Searcher
    out, lo, hi = rf_corpus
    s = Searcher(IndexReader(out))
    q = RangeFieldQuery(("rlo", "rlo"), ("rhi", "rhi"),
                        (QLO, 50.0), (QHI, 90.0), "intersects")
    got = s.match_docs(q)
    want = np.nonzero((lo <= QHI) & (hi >= QLO)
                      & (lo <= 90.0) & (hi >= 50.0))[0]
    np.testing.assert_array_equal(got, want)


def test_range_field_validation():
    from lucene_ray.search import RangeFieldQuery
    with pytest.raises(ValueError):
        RangeFieldQuery(("a",), ("b",), (1.0,), (2.0,), "touches")
    with pytest.raises(ValueError):
        RangeFieldQuery(("a",), ("b",), (1.0, 2.0), (2.0,), "within")


def test_range_field_distributed_equals_local(rf_corpus):
    from lucene_ray.search import IndexReader, RangeFieldQuery, Searcher
    from lucene_ray.search.distributed import RaySearcher
    out, lo, hi = rf_corpus
    q = RangeFieldQuery(("rlo",), ("rhi",), (QLO,), (QHI,), "crosses")
    local = Searcher(IndexReader(out))
    dist = RaySearcher(out, num_workers=3)
    assert local.count(q) == dist.count(q)
    a = local.search(q, k=50)
    b = dist.search(q, k=50)
    assert a.doc_ids.tolist() == b.doc_ids.tolist()
