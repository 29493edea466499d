"""Posting-list codecs: delta+FOR bit-packed blocks + block-max impacts."""

from .postings import (
    BLOCK_SIZE,
    PackedPostings,
    compute_impacts,
    pack_postings,
    pack_positions_many,
    unpack_positions,
    unpack_postings,
)

__all__ = [
    "BLOCK_SIZE",
    "PackedPostings",
    "pack_postings",
    "unpack_postings",
    "compute_impacts",
    "pack_positions_many",
    "unpack_positions",
]
