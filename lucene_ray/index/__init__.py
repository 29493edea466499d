"""Index build / merge / manifest / stats."""

from .builder import SegmentIndexer, build_index, compute_global_term_stats
from .manifest import (
    IndexManifest,
    SegmentInfo,
    latest_generation,
    read_manifest,
    write_manifest,
)

__all__ = [
    "SegmentIndexer", "build_index", "compute_global_term_stats",
    "IndexManifest", "SegmentInfo", "read_manifest", "write_manifest",
    "latest_generation",
]
