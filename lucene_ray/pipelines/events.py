"""Event-stream operators over the ``events`` table: sessionization and
windowed aggregates — the batch form of the streaming windows a
training-data pipeline needs (click/session features).

Shuffle discipline: ONE hash shuffle on the entity key (user_id);
sessionization and window assignment are then group-local sorted
sweeps. Tumbling-window aggregates pre-combine inside batches before
the (window, type) groupby (combiner pattern).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data.aggregate import Count, Max, Mean, Min, Sum


def read_events(path: str, columns=("event_id", "ts", "user_id",
                                    "event_type", "value")) -> ray.data.Dataset:
    return ray.data.read_parquet(path, columns=list(columns))


def _session_sweep(g: pa.Table, gap_us: int) -> pa.Table:
    """One vectorized sessionization sweep over a (user_id, ts,
    event_id)-sorted run that may span MANY users: a session break is a
    user change OR a gap over the threshold. All-numpy; no per-user
    Python work."""
    order = pc.sort_indices(g, sort_keys=[("user_id", "ascending"),
                                          ("ts", "ascending"),
                                          ("event_id", "ascending")])
    g = g.take(order)
    ts = g.column("ts").cast(pa.int64()).to_numpy()  # microseconds
    uid = g.column("user_id").to_numpy()
    vals = g.column("value").to_numpy()
    n = len(ts)
    new = np.ones(n, dtype=bool)
    if n > 1:
        new[1:] = (uid[1:] != uid[:-1]) | ((ts[1:] - ts[:-1]) > gap_us)
    sid = np.cumsum(new) - 1
    n_sessions = int(sid[-1]) + 1 if n else 0
    brk = np.nonzero(new)[0]
    starts = ts[new]
    ends = np.maximum.reduceat(ts, brk) if n else np.empty(0, np.int64)
    counts = np.bincount(sid, minlength=n_sessions)
    totals = np.bincount(sid, weights=vals, minlength=n_sessions)
    return pa.table({
        "user_id": pa.array(uid[new], pa.int64()),
        "session_start": pa.array(starts, pa.int64()),
        "n_events": pa.array(counts.astype(np.int64)),
        "total_value": pa.array(np.round(totals, 6), pa.float64()),
        "duration_sec": pa.array((ends - starts) / 1e6, pa.float64()),
    })


def sessionize(path: str, gap_minutes: float = 30.0,
               num_partitions: int = 256) -> ray.data.Dataset:
    """Per-user sessions: a new session starts when the gap since the
    previous event exceeds ``gap_minutes``. Returns one row per session:
    (user_id, session_start ts, n_events, total_value, duration_sec).

    Scale form (r2 finding: ``groupby(user_id).map_groups`` paid one
    Python call *per user*): ONE shuffle on ``part = hash(user_id) % P``
    routes every user's events to one of ``num_partitions`` partitions,
    then a single partition-local sort + vectorized sweep handles ALL of
    that partition's users at once — P Python calls total, independent
    of entity count (the 10^8-user case). Only the 4 needed columns
    enter the shuffle (event_type never moves)."""
    gap_us = int(gap_minutes * 60 * 1e6)

    def add_part(batch: pa.Table) -> pa.Table:
        uid = batch.column("user_id").to_numpy()
        # splitmix-style mix so sequential user_ids spread evenly
        h = (uid.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) >> \
            np.uint64(33)
        return batch.append_column(
            "part", pa.array((h % np.uint64(num_partitions))
                             .astype(np.int64), pa.int64()))

    def sweep(g: pa.Table) -> pa.Table:
        return _session_sweep(g.drop_columns(["part"]), gap_us)

    return (read_events(path, columns=("event_id", "ts", "user_id",
                                       "value"))
            .map_batches(add_part, batch_format="pyarrow")
            .groupby("part")
            .map_groups(sweep, batch_format="pyarrow"))


def sessionize_per_user(path: str, gap_minutes: float = 30.0) -> ray.data.Dataset:
    """Per-entity form kept for A/B benchmarking: one map_groups call
    per user (correct, but pays per-entity Python overhead)."""
    gap_us = int(gap_minutes * 60 * 1e6)

    def per_user(g: pa.Table) -> pa.Table:
        return _session_sweep(g, gap_us)

    return read_events(path).groupby("user_id").map_groups(
        per_user, batch_format="pyarrow")


def tumbling_window_counts(path: str, minutes: int = 60) -> ray.data.Dataset:
    """Events per (window_start, event_type) for tumbling windows —
    batch-side partial counts, then a small groupby of (window, type)
    partials (combiner pattern: the shuffle moves counts, not events)."""
    width_us = int(minutes * 60 * 1e6)

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").cast(pa.int64()).to_numpy()
        win = (ts // width_us) * width_us
        et = batch.column("event_type").to_pylist()
        cnt: dict = {}
        for w, e in zip(win, et):
            cnt[(int(w), e)] = cnt.get((int(w), e), 0) + 1
        return pa.table({
            "window_start": pa.array([k[0] for k in cnt], pa.int64()),
            "event_type": pa.array([k[1] for k in cnt], pa.string()),
            "n": pa.array(list(cnt.values()), pa.int64()),
        })

    return read_events(path, columns=("ts", "event_type")) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby(["window_start", "event_type"]) \
        .aggregate(Sum("n", alias_name="n_events"))


def hopping_window_counts(path: str, size_minutes: int = 60,
                          hop_minutes: int = 30) -> ray.data.Dataset:
    """Events per (window_start, event_type) for OVERLAPPING hopping
    windows (size must be a multiple of hop): each event lands in
    size/hop windows. Vectorized fan-out inside the batch (np.repeat of
    the window-start lattice), then the same combiner-pattern groupby as
    the tumbling form — the shuffle moves per-batch partial counts, not
    size/hop copies of the events."""
    assert size_minutes % hop_minutes == 0
    width_us = int(size_minutes * 60 * 1e6)
    hop_us = int(hop_minutes * 60 * 1e6)
    n_win = width_us // hop_us

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").cast(pa.int64()).to_numpy()
        base = (ts // hop_us) * hop_us
        # windows containing ts: start = base - j*hop, j = 0..n_win-1
        starts = (base[:, None] -
                  np.arange(n_win, dtype=np.int64)[None, :] * hop_us)
        et = batch.column("event_type").to_pylist()
        uniq = list(dict.fromkeys(et))
        if not uniq:
            return pa.table({"window_start": pa.array([], pa.int64()),
                             "event_type": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        code_of = {e: i for i, e in enumerate(uniq)}
        ec = np.array([code_of[e] for e in et], dtype=np.int64)
        key = starts.reshape(-1) * len(uniq) + np.repeat(ec, n_win)
        uk, cnt = np.unique(key, return_counts=True)
        return pa.table({
            "window_start": pa.array(uk // len(uniq), pa.int64()),
            "event_type": pa.array([uniq[int(k % len(uniq))]
                                    for k in uk], pa.string()),
            "n": pa.array(cnt.astype(np.int64)),
        })

    return read_events(path, columns=("ts", "event_type")) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby(["window_start", "event_type"]) \
        .aggregate(Sum("n", alias_name="n_events"))


def user_stats(path: str) -> ray.data.Dataset:
    """Per-user activity profile (feature table)."""
    return read_events(path).groupby("user_id").aggregate(
        Count(alias_name="n_events"),
        Sum("value", alias_name="total_value"),
        Min("ts", alias_name="first_ts"),
        Max("ts", alias_name="last_ts"),
    )
