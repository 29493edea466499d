"""MinHash token filter — the analysis-chain form of minhash
fingerprinting (``lucene/analysis/common/src/java/org/apache/lucene/
analysis/minhash/MinHashFilter.java:47``): consume the whole token
stream (typically word shingles), hash every token with
MurmurHash3_x64_128 over its UTF-16LE bytes, derive ``hash_count``
rehashes per token, and keep the ``hash_set_size`` smallest values in
each of ``bucket_count`` range buckets; the surviving hashes are
emitted as synthetic tokens. Indexing those tokens lets plain term
matching approximate Jaccard document similarity.

MurmurHash3 is Austin Appleby's public-domain algorithm; the constants
and tail handling below follow the public x64_128 specification and are
verified against the reference's own test vectors
(``TestMinHashFilter.java:43-55``) in ``tests/test_edge_minhash_path.py``.

The pipeline-level minhash operators (``pipelines/dedup.py``) cover the
dedup ROLE at scale; this filter is the chain-pluggable FORM users
compose with ``AnalyzerChain`` (e.g. shingle -> minhash -> index).
"""

from __future__ import annotations

from bisect import insort

_M64 = (1 << 64) - 1
_C1 = 0x87C37B91114253D5
_C2 = 0x4CF5AD432745937F


def _rotl64(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _fmix64(k: int) -> int:
    k ^= k >> 33
    k = (k * 0xFF51AFD7ED558CCD) & _M64
    k ^= k >> 33
    k = (k * 0xC4CEB9FE1A85EC53) & _M64
    k ^= k >> 33
    return k


def murmur3_x64_128(data: bytes, seed: int = 0) -> tuple[int, int]:
    """(val1, val2) as UNSIGNED 64-bit ints — Java's (h1, h2) longs
    reinterpreted unsigned (``MinHashFilter.murmurhash3_x64_128``)."""
    h1 = seed & 0xFFFFFFFF
    h2 = seed & 0xFFFFFFFF
    length = len(data)
    nblocks = length // 16
    for i in range(nblocks):
        o = 16 * i
        k1 = int.from_bytes(data[o:o + 8], "little")
        k2 = int.from_bytes(data[o + 8:o + 16], "little")
        k1 = _rotl64((k1 * _C1) & _M64, 31)
        h1 ^= (k1 * _C2) & _M64
        h1 = _rotl64(h1, 27)
        h1 = (h1 + h2) & _M64
        h1 = (h1 * 5 + 0x52DCE729) & _M64
        k2 = _rotl64((k2 * _C2) & _M64, 33)
        h2 ^= (k2 * _C1) & _M64
        h2 = _rotl64(h2, 31)
        h2 = (h2 + h1) & _M64
        h2 = (h2 * 5 + 0x38495AB5) & _M64
    tail = data[nblocks * 16:]
    if len(tail) > 8:
        k2 = int.from_bytes(tail[8:], "little")
        k2 = _rotl64((k2 * _C2) & _M64, 33)
        h2 ^= (k2 * _C1) & _M64
    if tail:
        k1 = int.from_bytes(tail[:8], "little")
        k1 = _rotl64((k1 * _C1) & _M64, 31)
        h1 ^= (k1 * _C2) & _M64
    h1 ^= length
    h2 ^= length
    h1 = (h1 + h2) & _M64
    h2 = (h2 + h1) & _M64
    h1 = _fmix64(h1)
    h2 = _fmix64(h2)
    h1 = (h1 + h2) & _M64
    h2 = (h2 + h1) & _M64
    return h1, h2


def _int_hash(i: int) -> tuple[int, int]:
    """murmur of the big-endian 4 bytes of i (``MinHashFilter.getBytes``)."""
    return murmur3_x64_128(i.to_bytes(4, "big"))


def _chars_of(value: int, n: int, total_bits: int) -> str:
    """Top n 16-bit units of a value, as Java's (char)(x >> shift)."""
    return "".join(chr((value >> (total_bits - 16 * (k + 1))) & 0xFFFF)
                   for k in range(n))


class MinHashFilter:
    """List-protocol port of the reference filter. Defaults mirror
    ``MinHashFilter.java:52-56`` (hash_count=1, bucket_count=512,
    hash_set_size=1); ``with_rotation`` defaults to bucket_count > 1
    (the factory's default, ``MinHashFilterFactory.java``).

    ``encoding='utf16units'`` (default) emits the exact reference token
    text — 16-bit units of the 128-bit hash as chars, which may include
    UNPAIRED SURROGATES and therefore cannot be stored in Arrow/UTF-8
    columns; use ``encoding='hex'`` for index-safe tokens (same hash,
    hex-printed, one token per reference token)."""

    def __init__(self, hash_count: int = 1, bucket_count: int = 512,
                 hash_set_size: int = 1, with_rotation: bool | None = None,
                 encoding: str = "utf16units"):
        if hash_count < 1 or bucket_count < 1 or hash_set_size < 1:
            raise ValueError("hashCount, bucketCount and hashSetSize "
                             "must be >= 1")
        if encoding not in ("utf16units", "hex"):
            raise ValueError(encoding)
        self.hash_count = hash_count
        self.bucket_count = bucket_count
        self.hash_set_size = hash_set_size
        self.with_rotation = (bucket_count > 1 if with_rotation is None
                              else with_rotation)
        self.encoding = encoding
        self.bucket_size = (1 << 32) // bucket_count
        if (1 << 32) % bucket_count != 0:
            self.bucket_size += 1
        self._ihash = [_int_hash(i) for i in range(hash_count)]

    def __call__(self, terms) -> list[str]:
        if not terms:
            return []
        # minsets[i][b] = ascending list of (val2, val1) pairs, capped
        # at hash_set_size (FixedSizeTreeSet order: val2 then val1,
        # both unsigned)
        minsets = [[[] for _ in range(self.bucket_count)]
                   for _ in range(self.hash_count)]
        for t in terms:
            v1, v2 = murmur3_x64_128(t.encode("utf-16-le"))
            for i in range(self.hash_count):
                iv1, iv2 = self._ihash[i]
                r1 = (v1 * 37 + iv1) & _M64
                r2 = (v2 * 37 + iv2) & _M64
                b = (r2 >> 32) // self.bucket_size
                s = minsets[i][b]
                pair = (r2, r1)
                if len(s) >= self.hash_set_size:
                    if pair >= s[-1]:
                        continue
                    s.pop()
                if pair not in s:
                    insort(s, pair)
        if self.with_rotation and self.hash_set_size == 1:
            # fill empty buckets from the next non-empty one (cyclic)
            for i in range(self.hash_count):
                row = minsets[i]
                for b in range(self.bucket_count):
                    if not row[b]:
                        for off in range(1, self.bucket_count):
                            nxt = row[(b + off) % self.bucket_count]
                            if nxt:
                                row[b] = [nxt[0]]
                                break
        out = []
        for i in range(self.hash_count):
            for b in range(self.bucket_count):
                for (r2, r1) in minsets[i][b]:
                    out.append(self._emit(i, r1, r2))
        return out

    def _emit(self, i: int, r1: int, r2: int) -> str:
        if self.encoding == "hex":
            pre = f"{i:08x}" if self.hash_count > 1 else ""
            body = f"{r2:016x}" + (f"{r1:016x}" if self.hash_count == 1
                                   else f"{(r1 >> 32):08x}")
            return pre + body
        s = ""
        if self.hash_count > 1:
            s += _chars_of(i & 0xFFFFFFFF, 2, 32)
        s += _chars_of(r2, 4, 64)
        # val1: top 2 units always; all 4 only when hash_count == 1
        s += _chars_of(r1, 4 if self.hash_count == 1 else 2, 64)
        return s
