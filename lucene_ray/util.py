"""Shared Ray helpers."""

from __future__ import annotations

import ray


def default_concurrency() -> int:
    """Fixed actor-pool size = cluster CPUs - 1: one slot stays free for
    upstream read tasks (a pool equal to num_cpus deadlocks the streaming
    executor), and a fixed pool ramps up ~2x faster than an autoscaling
    (1, n) pool on short jobs."""
    cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    return max(1, cpus - 1)
