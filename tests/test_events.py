"""Event-stream ops: sessionization gap semantics + windows."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_ray.pipelines.events import (
    sessionize,
    tumbling_window_counts,
    user_stats,
)


@pytest.fixture(scope="module")
def events_path(ray_session, tmp_path_factory):
    # user 1: two sessions (gap 40min); user 2: one session
    base = 1_700_000_000_000_000  # us
    m = 60 * 1_000_000
    rows = [
        (0, base + 0 * m, 1, "view", 1.0),
        (1, base + 10 * m, 1, "click", 2.0),
        (2, base + 55 * m, 1, "view", 3.0),      # 45min gap -> new session
        (3, base + 60 * m, 1, "click", 4.0),
        (4, base + 5 * m, 2, "view", 5.0),
    ]
    t = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
        "value": pa.array([r[4] for r in rows], pa.float64()),
    })
    d = tmp_path_factory.mktemp("events")
    path = str(d / "events.parquet")
    pq.write_table(t, path)
    return path, base, m


def test_sessionize_gaps(events_path):
    path, base, m = events_path
    rows = sorted(sessionize(path, gap_minutes=30).take_all(),
                  key=lambda r: (r["user_id"], r["session_start"]))
    assert len(rows) == 3
    u1a, u1b, u2 = rows
    assert u1a["user_id"] == 1 and u1a["n_events"] == 2
    assert u1a["session_start"] == base and u1a["duration_sec"] == 600.0
    assert u1a["total_value"] == 3.0
    assert u1b["n_events"] == 2 and u1b["session_start"] == base + 55 * m
    assert u2["user_id"] == 2 and u2["n_events"] == 1
    assert u2["duration_sec"] == 0.0


def test_tumbling_windows(events_path):
    path, base, m = events_path
    rows = tumbling_window_counts(path, minutes=60).take_all()
    got = {(r["window_start"], r["event_type"]): r["n_events"] for r in rows}
    w0 = (base // (60 * 60 * 1_000_000)) * 60 * 60 * 1_000_000
    assert sum(got.values()) == 5
    assert got[(w0, "view")] >= 2  # first hour holds the early views


def test_user_stats(events_path):
    path, base, m = events_path
    rows = {r["user_id"]: r for r in user_stats(path).take_all()}
    assert rows[1]["n_events"] == 4 and rows[2]["n_events"] == 1
    assert rows[1]["total_value"] == 10.0


def test_sessionize_scale_form_matches_per_user(ray_session, tmp_path_factory):
    """The partition-sweep sessionize (one call per hash partition) and
    the per-user map_groups form produce identical session rows on a
    many-user corpus with boundary-adjacent gaps."""
    from lucene_ray.pipelines.events import sessionize_per_user
    rng = np.random.default_rng(33)
    n = 20_000
    base = 1_700_000_000_000_000
    uid = rng.integers(0, 500, n)
    ts = base + rng.integers(0, 3 * 86_400, n) * 1_000_000
    t = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
        "user_id": pa.array(uid, pa.int64()),
        "event_type": pa.array(["view"] * n, pa.string()),
        "value": pa.array(rng.random(n), pa.float64()),
    })
    d = tmp_path_factory.mktemp("events_big")
    path = str(d / "events.parquet")
    pq.write_table(t, path, row_group_size=2048)

    def key(rows):
        return sorted((r["user_id"], r["session_start"], r["n_events"],
                       round(r["total_value"], 6), round(r["duration_sec"], 6))
                      for r in rows)

    a = key(sessionize(path, num_partitions=16).take_all())
    b = key(sessionize_per_user(path).take_all())
    assert a == b and len(a) > 500


def test_hopping_windows_overlap(events_path):
    """Each event lands in size/hop windows; counts match a brute
    recomputation."""
    from lucene_ray.pipelines.events import hopping_window_counts
    path, base, m = events_path
    rows = hopping_window_counts(path, 60, 30).take_all()
    total = sum(r["n_events"] for r in rows)
    assert total == 5 * 2  # 5 events x 2 overlapping windows
    # window starts sit on the hop lattice; the event at base lands in
    # the aligned window and the one hop earlier
    hop = 30 * m
    aligned = (base // hop) * hop
    starts = {r["window_start"] for r in rows}
    assert aligned in starts and aligned - hop in starts
