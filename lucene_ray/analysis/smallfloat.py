"""Lossy small-float encodings for document-length norms.

Re-implements the norm byte encoding used by the reference engine
(``lucene/core/src/java/org/apache/lucene/util/SmallFloat.java:103-166``,
``longToInt4`` / ``int4ToLong`` / ``intToByte4`` / ``byte4ToInt``): a
float-like encoding for positive ints that preserves ordering and keeps
4 significant bits, with the low ``255 - longToInt4(MAX_INT)`` values
stored exactly.

Pure functions + a 256-entry decode table (``LENGTH_TABLE``), mirroring
``BM25Similarity.java:131-136``.
"""

from __future__ import annotations

import numpy as np


def long_to_int4(i: int) -> int:
    """Float-like encoding for positive ints; 4 significant bits."""
    if i < 0:
        raise ValueError(f"Only supports positive values, got {i}")
    num_bits = i.bit_length()
    if num_bits < 4:
        return i
    shift = num_bits - 4
    encoded = (i >> shift) & 0x07  # drop the implicit most-significant bit
    encoded |= (shift + 1) << 3  # shift 0 is reserved for subnormal values
    return encoded


def int4_to_long(i: int) -> int:
    bits = i & 0x07
    shift = (i >> 3) - 1
    if shift == -1:
        return bits
    return (bits | 0x08) << shift


_MAX_INT4 = long_to_int4(2**31 - 1)
NUM_FREE_VALUES = 255 - _MAX_INT4


def int_to_byte4(i: int) -> int:
    """Encode a token count into one unsigned byte (0..255)."""
    if i < 0:
        raise ValueError(f"Only supports positive values, got {i}")
    if i < NUM_FREE_VALUES:
        return i
    return NUM_FREE_VALUES + long_to_int4(i - NUM_FREE_VALUES)


def byte4_to_int(b: int) -> int:
    """Decode a byte written by :func:`int_to_byte4` (b in 0..255)."""
    if b < NUM_FREE_VALUES:
        return b
    return NUM_FREE_VALUES + int4_to_long(b - NUM_FREE_VALUES)


# Decoded doc length per norm byte, float32 (BM25Similarity.LENGTH_TABLE).
LENGTH_TABLE = np.array([byte4_to_int(i) for i in range(256)], dtype=np.float32)

# Vectorized encoder: norm byte for every possible small doc length is
# monotone, so encode via searchsorted against the decode table boundaries.
_DECODED = np.array([byte4_to_int(i) for i in range(256)], dtype=np.int64)


def int_to_byte4_array(lengths: np.ndarray) -> np.ndarray:
    """Vectorized ``int_to_byte4`` over an int array -> uint8 array."""
    lengths = np.asarray(lengths, dtype=np.int64)
    if (lengths < 0).any():
        raise ValueError("Only supports positive values")
    # int_to_byte4 is the monotone step function whose value at x is the
    # largest code c with _DECODED[c] <= x.
    codes = np.searchsorted(_DECODED, lengths, side="right") - 1
    return codes.astype(np.uint8)
