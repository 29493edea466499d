"""BKD points analog (util/bkd/BKDWriter.java, search/PointRangeQuery
.java; TestPointQueries.java semantics): per-segment k-d leaves with
cell bounds, box queries with leaf pruning."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_ray.index.points import (
    _build_leaves,
    build_point_index,
    point_box_docs,
)


def test_leaf_split_partitions_all_points():
    rng = np.random.default_rng(1)
    ids = np.arange(10_000, dtype=np.int64)
    coords = rng.random((10_000, 2))
    leaves = _build_leaves(ids, coords, 512)
    got = np.sort(np.concatenate([lv[0] for lv in leaves]))
    assert (got == ids).all()
    assert max(len(lv[0]) for lv in leaves) <= 512
    assert len(leaves) >= 10_000 // 512


@pytest.fixture(scope="module")
def point_index(ray_session, tmp_path_factory):
    rng = np.random.default_rng(2)
    n = 50_000
    x = rng.uniform(0, 1000, n)
    y = rng.uniform(-50, 50, n)
    t = pa.table({"pid": pa.array(np.arange(n, dtype=np.int64)),
                  "x": pa.array(x), "y": pa.array(y)})
    d = tmp_path_factory.mktemp("pts")
    src = str(d / "points.parquet")
    pq.write_table(t, src, row_group_size=8192)
    out = str(d / "idx")
    build_point_index(src, out, dims=("x", "y"), id_col="pid",
                      batch_size=8192)
    return out, x, y


def test_box_query_exact(point_index):
    out, x, y = point_index
    for box in ([(100.0, 200.0), (-10.0, 10.0)],
                [(None, 50.0), (0.0, None)],
                [(999.9, 1000.0), (-50.0, 50.0)],
                [(5000.0, 6000.0), (0.0, 1.0)]):  # empty
        got = point_box_docs(out, box)
        m = np.ones(len(x), dtype=bool)
        for arr, (lo, hi) in zip((x, y), box):
            if lo is not None:
                m &= arr >= lo
            if hi is not None:
                m &= arr <= hi
        want = np.nonzero(m)[0]
        assert got.tolist() == want.tolist(), box


def test_timestamp_dim(ray_session, tmp_path_factory):
    """The events-table shape: (ts: timestamp, value: double) box."""
    base = 1_700_000_000_000_000
    n = 5000
    rng = np.random.default_rng(3)
    ts = base + rng.integers(0, 10**9, n)
    val = rng.random(n) * 100
    t = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
        "value": pa.array(val)})
    d = tmp_path_factory.mktemp("pts_ts")
    src = str(d / "events.parquet")
    pq.write_table(t, src)
    out = str(d / "idx")
    build_point_index(src, out, dims=("ts", "value"), id_col="event_id",
                      batch_size=2048)
    lo, hi = base + 10**8, base + 5 * 10**8
    got = point_box_docs(out, [(lo, hi), (20.0, 60.0)])
    want = np.nonzero((ts >= lo) & (ts <= hi) &
                      (val >= 20.0) & (val <= 60.0))[0]
    assert got.tolist() == want.tolist()
