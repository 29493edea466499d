"""Shared Ray helpers."""

from __future__ import annotations

import ray


_PROCESS_CACHE: dict = {}


def cached_callable(cls, **kwargs):
    """Wrap a callable class for TASK-based ``map_batches``: the instance
    is built lazily once per worker process and reused across tasks —
    the same state-amortization as an actor pool, without a pool's
    CPU reservation (pools deadlock when several stages each demand a
    full-cluster pool, e.g. a union of branches sharing one stage)."""
    key_kwargs = tuple(sorted(kwargs.items(), key=lambda kv: kv[0]))

    def fn(batch):
        key = (cls.__module__, cls.__qualname__, key_kwargs)
        inst = _PROCESS_CACHE.get(key)
        if inst is None:
            inst = _PROCESS_CACHE[key] = cls(**kwargs)
        return inst(batch)

    fn.__name__ = f"cached_{cls.__name__}"
    return fn


def default_concurrency() -> int:
    """Fixed actor-pool size ~80% of cluster CPUs: the remaining slots
    feed the upstream read/split stage (a pool equal to num_cpus
    deadlocks the streaming executor; leaving just one slot serializes
    reads and caps scaling). Fixed pools also ramp ~2x faster than
    autoscaling (1, n) pools on short jobs."""
    import os
    override = os.environ.get("LUCENE_RAY_POOL")
    if override:
        return max(1, int(override))
    cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    return max(1, min(cpus - 1, int(cpus * 0.8)))


def term_hash64(terms) -> "np.ndarray":
    """Stable 64-bit hashes for term-membership fingerprints (the
    term-dictionary bloom/FST-presence role). blake2b-8 per term."""
    import hashlib

    import numpy as np
    out = np.empty(len(terms), dtype=np.uint64)
    for i, t in enumerate(terms):
        out[i] = int.from_bytes(
            hashlib.blake2b(t.encode(), digest_size=8).digest(), "little")
    return out
