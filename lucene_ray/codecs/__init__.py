"""Posting-list codecs: delta+FOR bit-packed blocks + block-max impacts."""

from .postings import (
    BLOCK_SIZE,
    PackedPostings,
    compute_impacts,
    pack_postings,
    unpack_positions_noop,
    unpack_postings,
)

__all__ = [
    "BLOCK_SIZE",
    "PackedPostings",
    "pack_postings",
    "unpack_postings",
    "compute_impacts",
    "unpack_positions_noop",
]
