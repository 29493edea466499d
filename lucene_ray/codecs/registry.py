"""Pluggable postings-encoder registry — the PerFieldPostingsFormat /
PostingsFormat SPI analog (``codecs/perfield/PerFieldPostingsFormat.java
:65,228``, ``codecs/PostingsFormat.java`` NamedSPILoader registration).

Every postings block is SELF-DESCRIBING: its first byte is either a
FOR bit-width (0..32 — the default ``for128`` delta+FOR codec, the
Lucene90 ForUtil role) or a registered format tag (>= 64), followed by
a u16 payload length (so header-only scans can skip blocks without
decoding) and the format's payload. Because the tag travels with the
data, readers need no side-channel: segments built with different
per-field formats merge by chunk concat and decode transparently —
exactly the property PerFieldPostingsFormat's per-field file suffixes
buy the reference.

Register a custom format with :func:`register_postings_format`; select
it per build/field via ``build_index(postings_format=...)`` /
``build_multi_field_index(fields_formats=...)``.
"""

from __future__ import annotations

import struct

import numpy as np

# name -> (tag, encode(vals: uint32[]) -> payload bytes,
#          decode(payload: bytes, n: int) -> uint32[])
_FORMATS: dict[str, tuple] = {}
_DECODERS: dict[int, tuple] = {}

FOR128 = "for128"  # built-in bit-width codec; tags 0..32 are widths


def register_postings_format(name: str, tag: int, encode, decode) -> None:
    """Register an alternative block codec. ``tag`` must be >= 64 and
    unique (0..32 are FOR widths; 33..63 reserved)."""
    if tag < 64 or tag > 255:
        raise ValueError(f"format tag must be in [64, 255], got {tag}")
    if name in _FORMATS or tag in _DECODERS:
        prev = _FORMATS.get(name)
        if prev is not None and prev[0] == tag:
            return  # idempotent re-register
        raise ValueError(f"postings format {name!r}/tag {tag} taken")
    _FORMATS[name] = (tag, encode, decode)
    _DECODERS[tag] = (name, decode)


def get_format(name: str):
    if name == FOR128:
        return None
    if name not in _FORMATS:
        raise KeyError(
            f"unknown postings format {name!r}; registered: "
            f"{[FOR128, *_FORMATS]}")
    return _FORMATS[name]


def get_decoder(tag: int):
    if tag not in _DECODERS:
        raise ValueError(f"block with unregistered format tag {tag}")
    return _DECODERS[tag][1]


def wrap_block(tag: int, payload: bytes) -> bytes:
    return bytes([tag]) + struct.pack("<H", len(payload)) + payload


# --- built-in alternative: LEB128 varint (vectorized) ---------------------

def _vint_encode(vals: np.ndarray) -> bytes:
    v = vals.astype(np.uint64)
    nb = np.ones(len(v), dtype=np.int64)
    for k in range(1, 5):
        nb += (v >= (np.uint64(1) << np.uint64(7 * k)))
    out = np.zeros(int(nb.sum()), dtype=np.uint8)
    pos = np.concatenate([[0], np.cumsum(nb)[:-1]])
    for k in range(5):
        m = nb > k
        if not m.any():
            break
        idx = pos[m] + k
        byte = ((v[m] >> np.uint64(7 * k)) & np.uint64(0x7F)) \
            .astype(np.uint8)
        cont = ((nb[m] > k + 1).astype(np.uint8)) << 7
        out[idx] = byte | cont
    return out.tobytes()


def _vint_decode(payload, n: int) -> np.ndarray:
    b = np.frombuffer(payload, dtype=np.uint8)
    ends = np.nonzero((b & 0x80) == 0)[0][:n]
    starts = np.concatenate([[0], ends[:-1] + 1]) if n else \
        np.empty(0, np.int64)
    vals = np.zeros(n, dtype=np.uint64)
    for k in range(5):
        idx = starts + k
        m = idx <= ends
        if not m.any():
            break
        vals[m] |= (b[idx[m]] & np.uint8(0x7F)).astype(np.uint64) \
            << np.uint64(7 * k)
    return vals.astype(np.uint32)


register_postings_format("vint", 65, _vint_encode, _vint_decode)
