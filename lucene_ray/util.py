"""Shared Ray helpers."""

from __future__ import annotations

import ray


def default_concurrency() -> tuple[int, int]:
    """Autoscaling actor-pool bounds: cap below cluster CPUs so upstream
    read tasks always get a slot (fixed pool == num_cpus deadlocks the
    streaming executor)."""
    cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    return (1, max(1, cpus - 1))
