"""JPEG (ITU-T T.81 / JFIF) codec in pure numpy.

Decoder: baseline sequential DCT (SOF0/1) — 4:4:4, 4:2:2 and 4:2:0
chroma subsampling, restart-interval DC-predictor resets — AND
progressive DCT (SOF2, Annex G): spectral-selection bands,
successive-approximation DC/AC first + refinement scans (G.1.2.3
correction-bit walk), EOB runs, multi-scan coefficient accumulation.
Encoders: 4:4:4/4:2:0 baseline with the Annex K example tables
(quality-scaled per the IJG convention) and a progressive SS+SA
scan-script encoder; both share the quantized-coefficient front end,
so progressive-encode -> decode is PIXEL-IDENTICAL to the baseline
round trip at the same quality (the conformance gate in
``tests/test_jpeg.py::TestProgressive``).

The reference treats image payloads through third-party decoders; this
repo keeps multimodal columns opaque ``binary`` and implements the
published formats directly (same policy as the BMP/PNG/GIF/WAV codecs
in ``mm_codecs.py``).
"""

from __future__ import annotations

import struct

import numpy as np

# --- shared tables ----------------------------------------------------------

_ZIGZAG = np.array([
    0,  1,  8, 16,  9,  2,  3, 10, 17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63],
    dtype=np.int64)
_UNZIGZAG = np.argsort(_ZIGZAG)

# Annex K.1 example quantization tables
_QL = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99],
    dtype=np.float64)
_QC = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99],
    dtype=np.float64)

# Annex K.3 typical Huffman tables: (BITS[1..16], HUFFVAL)
_DC_L = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
         list(range(12)))
_DC_C = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
         list(range(12)))
_AC_L = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
_AC_C = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])


def _dct_matrix() -> np.ndarray:
    k = np.arange(8)
    m = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16)
    m *= np.sqrt(2.0 / 8)
    m[0] *= 1 / np.sqrt(2)
    return m


_DCT = _dct_matrix()


def _canonical_codes(bits, values):
    """(code, length) per symbol from the BITS/HUFFVAL spec form."""
    codes = {}
    code = 0
    i = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            codes[values[i]] = (code, ln)
            code += 1
            i += 1
        code <<= 1
    return codes


class _HuffDecoder:
    """16-bit lookahead table: value = (symbol, code length)."""

    def __init__(self, bits, values):
        self.lut = np.zeros(1 << 16, dtype=np.int32)  # (sym<<8)|len
        for sym, (code, ln) in _canonical_codes(bits, values).items():
            lo = code << (16 - ln)
            hi = lo + (1 << (16 - ln))
            self.lut[lo:hi] = (int(sym) << 8) | ln


class _BitReader:
    """MSB-first reader over a destuffed entropy segment."""

    def __init__(self, data: bytes):
        self.bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
        self.pos = 0

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        b = self.bits[self.pos:self.pos + n]
        if len(b) < n:
            raise EOFError("entropy data exhausted")
        self.pos += n
        return int(b.dot(1 << np.arange(len(b) - 1, -1, -1)))

    def decode(self, huff: _HuffDecoder) -> int:
        window = self.bits[self.pos:self.pos + 16]
        if len(window) < 16:
            window = np.concatenate(
                [window, np.zeros(16 - len(window), dtype=np.uint8)])
        key = int(window.dot(1 << np.arange(15, -1, -1)))
        v = int(huff.lut[key])
        ln = v & 0xFF
        if ln == 0 or self.pos + ln > len(self.bits):
            raise ValueError("invalid Huffman code")
        self.pos += ln
        return v >> 8


def _extend(v: int, s: int) -> int:
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def decode_jpeg(blob: bytes) -> np.ndarray:
    """Baseline JPEG -> HxWx3 uint8 RGB (grayscale replicated)."""
    if blob[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffDecoder] = {}
    huff_ac: dict[int, _HuffDecoder] = {}
    comps = []  # (id, h, v, tq)
    width = height = 0
    restart = 0
    i = 2
    scan = None
    while i < len(blob):
        if blob[i] != 0xFF:
            i += 1
            continue
        marker = blob[i + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if marker == 0xD9:  # EOI
            break
        ln = struct.unpack(">H", blob[i + 2:i + 4])[0]
        seg = blob[i + 4:i + 2 + ln]
        if marker == 0xDB:  # DQT
            j = 0
            while j < len(seg):
                pq_, tq = seg[j] >> 4, seg[j] & 0xF
                if pq_ == 0:
                    tbl = np.frombuffer(seg[j + 1:j + 65],
                                        dtype=np.uint8).astype(np.float64)
                    j += 65
                else:
                    tbl = np.frombuffer(seg[j + 1:j + 129],
                                        dtype=">u2").astype(np.float64)
                    j += 129
                qt[tq] = tbl
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 (baseline/ext seq)
            height, width = struct.unpack(">HH", seg[1:5])
            n = seg[5]
            comps = []
            for c in range(n):
                cid, hv, tq = seg[6 + 3 * c:9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0xF, tq))
        elif marker == 0xC2:  # SOF2: progressive DCT
            return _decode_progressive(blob)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(
                "only baseline/extended sequential and progressive "
                "Huffman JPEG are supported")
        elif marker == 0xC4:  # DHT
            j = 0
            while j < len(seg):
                tc, th = seg[j] >> 4, seg[j] & 0xF
                bits = list(seg[j + 1:j + 17])
                nv = sum(bits)
                vals = list(seg[j + 17:j + 17 + nv])
                (huff_dc if tc == 0 else huff_ac)[th] = _HuffDecoder(bits,
                                                                     vals)
                j += 17 + nv
        elif marker == 0xDD:  # DRI
            restart = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan_comps = []
            for c in range(ns):
                cs, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                scan_comps.append((cs, tt >> 4, tt & 0xF))
            scan = (scan_comps, i + 2 + ln)
            break
        i += 2 + ln
    if scan is None or not comps:
        raise ValueError("truncated JPEG (no SOS/SOF)")

    scan_comps, data_start = scan
    # destuff entropy data up to EOI, remembering restart boundaries
    raw = blob[data_start:]
    out_bytes = bytearray()
    rst_bitpos = []
    j = 0
    while j < len(raw):
        b = raw[j]
        if b == 0xFF:
            nxt = raw[j + 1] if j + 1 < len(raw) else 0xD9
            if nxt == 0x00:
                out_bytes.append(0xFF)
                j += 2
                continue
            if 0xD0 <= nxt <= 0xD7:
                rst_bitpos.append(len(out_bytes) * 8)
                j += 2
                continue
            break  # EOI or next marker
        out_bytes.append(b)
        j += 1
    reader = _BitReader(bytes(out_bytes))

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-width // (8 * hmax))
    mcuy = -(-height // (8 * vmax))
    planes = {}
    for cid, h, v, tq in comps:
        planes[cid] = np.zeros((mcuy * v * 8, mcux * h * 8),
                               dtype=np.float64)
    pred = {cid: 0 for cid, *_ in comps}
    by_id = {cid: (h, v, tq) for cid, h, v, tq in comps}
    n_mcu = 0
    rst_i = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart and n_mcu and n_mcu % restart == 0:
                # byte-align at the recorded restart boundary
                if rst_i < len(rst_bitpos):
                    reader.pos = rst_bitpos[rst_i]
                    rst_i += 1
                pred = {cid: 0 for cid in pred}
            n_mcu += 1
            for cs, td, ta in scan_comps:
                h, v, tq = by_id[cs]
                for by in range(v):
                    for bx in range(h):
                        zz = np.zeros(64, dtype=np.float64)
                        s = reader.decode(huff_dc[td])
                        diff = _extend(reader.read(s), s) if s else 0
                        pred[cs] += diff
                        zz[0] = pred[cs]
                        k = 1
                        while k < 64:
                            rs = reader.decode(huff_ac[ta])
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC run past block end")
                            zz[k] = _extend(reader.read(s), s)
                            k += 1
                        blk = (zz * qt[tq])[_UNZIGZAG].reshape(8, 8)
                        pix = _DCT.T @ blk @ _DCT + 128.0
                        y0 = (my * v + by) * 8
                        x0 = (mx * h + bx) * 8
                        planes[cs][y0:y0 + 8, x0:x0 + 8] = pix

    # upsample to full resolution, crop, color-convert
    full = []
    for cid, h, v, tq in comps:
        p = planes[cid]
        if h < hmax or v < vmax:
            p = np.repeat(np.repeat(p, vmax // v, axis=0), hmax // h, axis=1)
        full.append(p[:height, :width])
    if len(full) == 1:
        g = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.round(np.stack([r, g, b], axis=2)), 0,
                   255).astype(np.uint8)


# --- encoder ----------------------------------------------------------------


def _quality_scale(tbl: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip(np.floor((tbl * s + 50) / 100), 1, 255)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, ln: int):
        self.acc = (self.acc << ln) | (code & ((1 << ln) - 1))
        self.n += ln
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.n -= 8

    def flush(self):
        if self.n:
            self.write(0x7F, 8 - self.n)  # pad with 1s per spec


def _csize(v: int) -> int:
    return 0 if v == 0 else int(abs(v)).bit_length()


def _dht_segment(tc: int, th: int, bits, values) -> bytes:
    payload = bytes([tc << 4 | th]) + bytes(bits) + bytes(values)
    return b"\xff\xc4" + struct.pack(">H", len(payload) + 2) + payload


def _block_coefs(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """(nby, nbx, 64) zigzagged quantized coefficients of one plane
    (already level-shifted, dims multiples of 8) — one vectorized
    DCT over every block."""
    ph, pw = plane.shape
    b = plane.reshape(ph // 8, 8, pw // 8, 8).transpose(0, 2, 1, 3)
    d = np.einsum("ij,xyjk,lk->xyil", _DCT, b, _DCT)
    z = d.reshape(ph // 8, pw // 8, 64)[:, :, _ZIGZAG]
    # q is in natural (row-major) order; z is zigzag-ordered, so the
    # divisor for zigzag slot k is q[_ZIGZAG[k]] (T.81 B.2.4.1 stores
    # and applies DQT entries in zigzag order)
    return np.round(z / q[_ZIGZAG][None, None, :]).astype(np.int64)


def _pad_plane(p: np.ndarray, ph: int, pw: int) -> np.ndarray:
    h, w = p.shape
    pp = np.empty((ph, pw), dtype=np.float64)
    pp[:h, :w] = p
    pp[h:, :w] = p[h - 1:h, :]
    pp[:, w:] = pp[:, w - 1:w]
    return pp


def encode_jpeg(img: np.ndarray, quality: int = 85,
                subsampling: str = "4:4:4") -> bytes:
    """HxWx3 uint8 RGB -> baseline JFIF bytes (4:4:4 or 4:2:0)."""
    if img.ndim == 2:
        img = np.repeat(img[:, :, None], 3, axis=2)
    if subsampling not in ("4:4:4", "4:2:0"):
        raise ValueError("subsampling must be '4:4:4' or '4:2:0'")
    sub = subsampling == "4:2:0"
    h, w = img.shape[:2]
    ql = _quality_scale(_QL, quality)
    qc = _quality_scale(_QC, quality)
    f = img.astype(np.float64)
    y = 0.299 * f[..., 0] + 0.587 * f[..., 1] + 0.114 * f[..., 2]
    cb = 128 - 0.168736 * f[..., 0] - 0.331264 * f[..., 1] + 0.5 * f[..., 2]
    cr = 128 + 0.5 * f[..., 0] - 0.418688 * f[..., 1] - 0.081312 * f[..., 2]
    dc_codes = [_canonical_codes(*_DC_L), _canonical_codes(*_DC_C)]
    ac_codes = [_canonical_codes(*_AC_L), _canonical_codes(*_AC_C)]
    bw = _BitWriter()
    pred = [0, 0, 0]

    mcu = 16 if sub else 8
    ph = -(-h // mcu) * mcu
    pw = -(-w // mcu) * mcu
    yp = _pad_plane(y, ph, pw) - 128.0
    if sub:
        cbp = _pad_plane(cb, ph, pw)
        crp = _pad_plane(cr, ph, pw)
        # 2x2 box-filter downsample
        cbp = cbp.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3)) - 128.0
        crp = crp.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3)) - 128.0
    else:
        cbp = _pad_plane(cb, ph, pw) - 128.0
        crp = _pad_plane(cr, ph, pw) - 128.0
    coefs = [_block_coefs(yp, ql), _block_coefs(cbp, qc),
             _block_coefs(crp, qc)]
    samp = [(2, 2), (1, 1), (1, 1)] if sub else [(1, 1), (1, 1), (1, 1)]

    def emit_block(zz: np.ndarray, ci: int):
        dct_t = act_t = 0 if ci == 0 else 1
        diff = int(zz[0]) - pred[ci]
        pred[ci] = int(zz[0])
        s = _csize(diff)
        code, ln = dc_codes[dct_t][s]
        bw.write(code, ln)
        if s:
            bw.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
        run = 0
        last_nz = np.flatnonzero(zz[1:])
        last = last_nz[-1] + 1 if len(last_nz) else 0
        for k in range(1, last + 1):
            v = int(zz[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = ac_codes[act_t][0xF0]
                bw.write(code, ln)
                run -= 16
            s = _csize(v)
            code, ln = ac_codes[act_t][(run << 4) | s]
            bw.write(code, ln)
            bw.write(v if v >= 0 else v + (1 << s) - 1, s)
            run = 0
        if last < 63:
            code, ln = ac_codes[act_t][0x00]
            bw.write(code, ln)

    for my in range(ph // mcu):
        for mx in range(pw // mcu):
            for ci in range(3):
                sh, sv = samp[ci]
                for by in range(sv):
                    for bx in range(sh):
                        emit_block(coefs[ci][my * sv + by, mx * sh + bx], ci)
    bw.flush()

    out = bytearray(b"\xff\xd8")
    out += (b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00"
            + struct.pack(">HH", 1, 1) + b"\x00\x00")
    for tq, tbl in ((0, ql), (1, qc)):
        # DQT bytes are zigzag-ordered per T.81 B.2.4.1
        out += (b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq])
                + bytes(tbl.astype(np.uint8)[_ZIGZAG]))
    ysamp = 0x22 if sub else 0x11
    out += (b"\xff\xc0" + struct.pack(">H", 17) + b"\x08"
            + struct.pack(">HH", h, w) + b"\x03"
            + bytes([1, ysamp, 0]) + bytes([2, 0x11, 1]) + bytes([3, 0x11, 1]))
    out += _dht_segment(0, 0, *_DC_L) + _dht_segment(1, 0, *_AC_L)
    out += _dht_segment(0, 1, *_DC_C) + _dht_segment(1, 1, *_AC_C)
    out += (b"\xff\xda" + struct.pack(">H", 12) + b"\x03"
            + bytes([1, 0x00]) + bytes([2, 0x11]) + bytes([3, 0x11])
            + b"\x00\x3f\x00")
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


# --- progressive DCT (SOF2) --------------------------------------------------
# Multi-scan decode per T.81 Annex G: spectral selection (Ss..Se bands)
# and successive approximation (Ah/Al bit planes) for both DC and AC,
# EOB runs, per-scan Huffman tables, restart intervals. Coefficients
# accumulate across scans into per-component arrays; dequantize + IDCT
# once at the end.


def _destuff_entropy(blob: bytes, start: int):
    """(destuffed bytes, restart bit positions, index of the next
    marker's 0xFF) from a raw entropy-coded segment."""
    out = bytearray()
    rst_bitpos = []
    j = start
    while j < len(blob):
        b = blob[j]
        if b == 0xFF:
            nxt = blob[j + 1] if j + 1 < len(blob) else 0xD9
            if nxt == 0x00:
                out.append(0xFF)
                j += 2
                continue
            if 0xD0 <= nxt <= 0xD7:
                rst_bitpos.append(len(out) * 8)
                j += 2
                continue
            if nxt == 0xFF:
                # T.81 B.1.1.2: 0xFF fill bytes may pad before a marker;
                # skip the run so the caller resumes at the marker's 0xFF
                j += 1
                continue
            break
        out.append(b)
        j += 1
    return bytes(out), rst_bitpos, j


def _decode_progressive(blob: bytes) -> np.ndarray:
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffDecoder] = {}
    huff_ac: dict[int, _HuffDecoder] = {}
    comps: list[tuple] = []
    width = height = 0
    restart = 0
    coef: dict[int, np.ndarray] = {}  # cid -> (nby_pad, nbx_pad, 64)
    pred: dict[int, int] = {}
    hmax = vmax = 1
    mcux = mcuy = 0
    i = 2
    while i + 1 < len(blob):
        if blob[i] != 0xFF:
            i += 1
            continue
        marker = blob[i + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if marker == 0xD9:
            break
        ln = struct.unpack(">H", blob[i + 2:i + 4])[0]
        seg = blob[i + 4:i + 2 + ln]
        if marker == 0xDB:
            j = 0
            while j < len(seg):
                pq_, tq = seg[j] >> 4, seg[j] & 0xF
                if pq_ == 0:
                    qt[tq] = np.frombuffer(seg[j + 1:j + 65],
                                           dtype=np.uint8).astype(np.float64)
                    j += 65
                else:
                    qt[tq] = np.frombuffer(seg[j + 1:j + 129],
                                           dtype=">u2").astype(np.float64)
                    j += 129
        elif marker == 0xC2:
            height, width = struct.unpack(">HH", seg[1:5])
            n = seg[5]
            comps = []
            for c in range(n):
                cid, hv, tq = seg[6 + 3 * c:9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0xF, tq))
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            mcux = -(-width // (8 * hmax))
            mcuy = -(-height // (8 * vmax))
            for cid, h, v, tq in comps:
                coef[cid] = np.zeros((mcuy * v, mcux * h, 64),
                                     dtype=np.int64)
                pred[cid] = 0
        elif marker == 0xC4:
            j = 0
            while j < len(seg):
                tc, th = seg[j] >> 4, seg[j] & 0xF
                bits = list(seg[j + 1:j + 17])
                nv = sum(bits)
                vals = list(seg[j + 17:j + 17 + nv])
                (huff_dc if tc == 0 else huff_ac)[th] = \
                    _HuffDecoder(bits, vals)
                j += 17 + nv
        elif marker == 0xDD:
            restart = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:
            ns = seg[0]
            scan_comps = [(seg[1 + 2 * c], seg[2 + 2 * c] >> 4,
                           seg[2 + 2 * c] & 0xF) for c in range(ns)]
            ss, se, ahal = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
            data, rst_bitpos, nxt = _destuff_entropy(blob, i + 2 + ln)
            _progressive_scan(
                coef, pred, comps, scan_comps, huff_dc, huff_ac,
                ss, se, ahal >> 4, ahal & 0xF, data, rst_bitpos,
                restart, width, height, hmax, vmax, mcux, mcuy)
            i = nxt
            continue
        i += 2 + ln
    if not comps or not coef:
        raise ValueError("truncated progressive JPEG")

    planes = {}
    for cid, h, v, tq in comps:
        cz = coef[cid]
        nby, nbx = cz.shape[:2]
        blk = (cz.astype(np.float64) * qt[tq][None, None, :])
        blk = blk[:, :, _UNZIGZAG].reshape(nby, nbx, 8, 8)
        pix = np.einsum("ji,xyjk,kl->xyil", _DCT, blk, _DCT) + 128.0
        planes[cid] = pix.transpose(0, 2, 1, 3).reshape(nby * 8, nbx * 8)
    full = []
    for cid, h, v, tq in comps:
        p = planes[cid]
        if h < hmax or v < vmax:
            p = np.repeat(np.repeat(p, vmax // v, axis=0), hmax // h, axis=1)
        full.append(p[:height, :width])
    if len(full) == 1:
        g = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.round(np.stack([r, g, b], axis=2)), 0,
                   255).astype(np.uint8)


def _progressive_scan(coef, pred, comps, scan_comps, huff_dc, huff_ac,
                      ss, se, ah, al, data, rst_bitpos, restart,
                      width, height, hmax, vmax, mcux, mcuy):
    reader = _BitReader(data)
    by_id = {cid: (h, v, tq) for cid, h, v, tq in comps}
    state = {"eobrun": 0}

    def dc_first(cz, by, bx, cs, td):
        s = reader.decode(huff_dc[td])
        diff = _extend(reader.read(s), s) if s else 0
        pred[cs] += diff
        cz[by, bx, 0] = pred[cs] << al

    def dc_refine(cz, by, bx):
        cz[by, bx, 0] |= reader.read(1) << al

    def ac_first(zz, ta):
        if state["eobrun"] > 0:
            state["eobrun"] -= 1
            return
        k = ss
        while k <= se:
            rs = reader.decode(huff_ac[ta])
            r, s = rs >> 4, rs & 0xF
            if s == 0:
                if r == 15:
                    k += 16
                    continue
                state["eobrun"] = (1 << r) - 1 + (reader.read(r) if r
                                                  else 0)
                break
            k += r
            if k > se:
                raise ValueError("AC run past band end")
            zz[k] = _extend(reader.read(s), s) << al
            k += 1

    def ac_refine(zz, ta):
        # T.81 G.1.2.3 / the canonical successive-approximation
        # refinement walk: newly-significant coefficients arrive as
        # (run, 1) symbols; every already-nonzero coefficient crossed
        # (or remaining after EOB) consumes one correction bit.
        p1 = 1 << al
        m1 = -1 << al
        k = ss
        if state["eobrun"] == 0:
            while k <= se:
                rs = reader.decode(huff_ac[ta])
                r, s = rs >> 4, rs & 0xF
                val = 0
                if s == 0:
                    if r != 15:
                        # FULL count here (no -1): the current block
                        # decrements in the correction-bit tail below
                        state["eobrun"] = (1 << r) + (
                            reader.read(r) if r else 0)
                        break
                else:
                    val = p1 if reader.read(1) else m1
                while k <= se:
                    c = int(zz[k])
                    if c != 0:
                        if reader.read(1) and (c & p1) == 0:
                            zz[k] = c + (p1 if c >= 0 else m1)
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if val and k <= se:
                    zz[k] = val
                k += 1
        if state["eobrun"] > 0:
            while k <= se:
                c = int(zz[k])
                if c != 0 and reader.read(1) and (c & p1) == 0:
                    zz[k] = c + (p1 if c >= 0 else m1)
                k += 1
            state["eobrun"] -= 1

    def maybe_restart(n_unit, rst_i):
        if restart and n_unit and n_unit % restart == 0:
            if rst_i < len(rst_bitpos):
                reader.pos = rst_bitpos[rst_i]
                rst_i += 1
            for c in pred:
                pred[c] = 0
            state["eobrun"] = 0
        return rst_i

    rst_i = 0
    if len(scan_comps) > 1:
        # interleaved: DC scans only (T.81 G.1.1.1.1)
        if ss != 0:
            raise ValueError("interleaved progressive AC scan")
        n_mcu = 0
        for my in range(mcuy):
            for mx in range(mcux):
                rst_i = maybe_restart(n_mcu, rst_i)
                n_mcu += 1
                for cs, td, ta in scan_comps:
                    h, v, tq = by_id[cs]
                    for by in range(v):
                        for bx in range(h):
                            if ah == 0:
                                dc_first(coef[cs], my * v + by,
                                         mx * h + bx, cs, td)
                            else:
                                dc_refine(coef[cs], my * v + by,
                                          mx * h + bx)
    else:
        cs, td, ta = scan_comps[0]
        h, v, tq = by_id[cs]
        # non-interleaved dims: ceil of the COMPONENT size (T.81 A.2.2)
        cw = -(-width * h // hmax)
        ch = -(-height * v // vmax)
        nbx = -(-cw // 8)
        nby = -(-ch // 8)
        cz = coef[cs]
        n_blk = 0
        for by in range(nby):
            for bx in range(nbx):
                rst_i = maybe_restart(n_blk, rst_i)
                n_blk += 1
                if ss == 0:
                    if ah == 0:
                        dc_first(cz, by, bx, cs, td)
                    else:
                        dc_refine(cz, by, bx)
                else:
                    if ah == 0:
                        ac_first(cz[by, bx], ta)
                    else:
                        ac_refine(cz[by, bx], ta)


# progressive AC scans need EOBn symbols the Annex K baseline tables
# lack: one flat table with every (run, size<=10) symbol at 9 bits
_AC_P = ([0, 0, 0, 0, 0, 0, 0, 0, 176, 0, 0, 0, 0, 0, 0, 0],
         sorted((r << 4) | s for r in range(16) for s in range(11)))


def encode_jpeg_progressive(img: np.ndarray, quality: int = 85,
                            subsampling: str = "4:4:4",
                            restart_interval: int = 0) -> bytes:
    """HxWx3 RGB (or HxW gray) uint8 -> progressive JFIF bytes (SOF2,
    4:4:4 or 4:2:0): the canonical spectral-selection + successive-
    approximation scan script — DC first at Al=1 (interleaved MCU
    order), AC bands 1-5 / 6-63 first at Al=1 per component (over the
    ceil-of-component-size block grid, T.81 A.2.2), then DC and AC
    refinement scans at Al=0 (Annex G; AC refinement per G.1.2.3's
    buffered correction-bit algorithm). Fully decodable by
    ``decode_jpeg`` and coefficient-identical to ``encode_jpeg`` at
    the same quality over the visible (cropped) region."""
    gray = img.ndim == 2
    if subsampling not in ("4:4:4", "4:2:0"):
        raise ValueError("subsampling must be '4:4:4' or '4:2:0'")
    sub = subsampling == "4:2:0" and not gray
    if gray:
        planes_in = [img.astype(np.float64)]
    else:
        f = img.astype(np.float64)
        y = 0.299 * f[..., 0] + 0.587 * f[..., 1] + 0.114 * f[..., 2]
        cb = (128 - 0.168736 * f[..., 0] - 0.331264 * f[..., 1]
              + 0.5 * f[..., 2])
        cr = (128 + 0.5 * f[..., 0] - 0.418688 * f[..., 1]
              - 0.081312 * f[..., 2])
        planes_in = [y, cb, cr]
    h, w = img.shape[:2]
    ql = _quality_scale(_QL, quality)
    qc = _quality_scale(_QC, quality)
    qs = [ql] + [qc, qc][:len(planes_in) - 1]
    mcu = 16 if sub else 8
    ph = -(-h // mcu) * mcu
    pw = -(-w // mcu) * mcu
    if sub:
        yp = _pad_plane(planes_in[0], ph, pw) - 128.0
        cbp = _pad_plane(planes_in[1], ph, pw)
        crp = _pad_plane(planes_in[2], ph, pw)
        cbp = cbp.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3)) - 128.0
        crp = crp.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3)) - 128.0
        coefs = [_block_coefs(yp, ql), _block_coefs(cbp, qc),
                 _block_coefs(crp, qc)]
        samp = [(2, 2), (1, 1), (1, 1)]
    else:
        coefs = [_block_coefs(_pad_plane(p, ph, pw) - 128.0, q)
                 for p, q in zip(planes_in, qs)]
        samp = [(1, 1)] * len(coefs)
    nc = len(coefs)
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcuy, mcux = ph // (8 * vmax), pw // (8 * hmax)
    # non-interleaved (AC) scan grid: ceil of the COMPONENT size
    ac_dims = []
    for ci in range(nc):
        sh, sv = samp[ci]
        cw = -(-w * sh // hmax)
        ch = -(-h * sv // vmax)
        ac_dims.append((-(-ch // 8), -(-cw // 8)))

    dc_codes = [_canonical_codes(*_DC_L)] + \
        [_canonical_codes(*_DC_C)] * (nc - 1)
    ac_codes = _canonical_codes(*_AC_P)

    scans = []  # (sos_payload, entropy bytes)

    rst_n = [0]

    def emit_rst(bw):
        bw.flush()
        bw.out += bytes([0xFF, 0xD0 + (rst_n[0] & 7)])
        rst_n[0] += 1

    def sos(comp_specs, ss, se, ah, al, bw):
        rst_n[0] = 0
        payload = bytes([len(comp_specs)])
        for cs, td, ta in comp_specs:
            payload += bytes([cs, (td << 4) | ta])
        payload += bytes([ss, se, (ah << 4) | al])
        scans.append((payload, bytes(bw.out)))

    # --- scan 1: DC first, interleaved MCU order, Al=1 (arith shift) ---
    bw = _BitWriter()
    pred = [0] * nc
    n_mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and n_mcu and \
                    n_mcu % restart_interval == 0:
                emit_rst(bw)
                pred = [0] * nc
            n_mcu += 1
            for ci in range(nc):
                sh, sv = samp[ci]
                for by in range(sv):
                    for bx in range(sh):
                        dc = int(coefs[ci][my * sv + by,
                                           mx * sh + bx, 0]) >> 1
                        diff = dc - pred[ci]
                        pred[ci] = dc
                        s = _csize(diff)
                        code, lnc = dc_codes[ci][s]
                        bw.write(code, lnc)
                        if s:
                            bw.write(diff if diff >= 0
                                     else diff + (1 << s) - 1, s)
    bw.flush()
    sos([(ci + 1, 0 if ci == 0 else 1, 0) for ci in range(nc)],
        0, 0, 0, 1, bw)

    def ac_first(cz, lo, hi, al, nby, nbx):
        bw = _BitWriter()
        eobrun = 0

        def flush_eob():
            nonlocal eobrun
            if eobrun:
                nbits = eobrun.bit_length() - 1
                code, lnc = ac_codes[nbits << 4]
                bw.write(code, lnc)
                if nbits:
                    bw.write(eobrun - (1 << nbits), nbits)
                eobrun = 0

        n_blk = 0
        for by in range(nby):
            for bx in range(nbx):
                if restart_interval and n_blk and \
                        n_blk % restart_interval == 0:
                    flush_eob()
                    emit_rst(bw)
                n_blk += 1
                zz = cz[by, bx]
                pts = [(1 if int(v) >= 0 else -1) * (abs(int(v)) >> al)
                       for v in zz[lo:hi + 1]]
                nz = [i for i, v in enumerate(pts) if v]
                if not nz:
                    eobrun += 1
                    if eobrun == 0x7FFF:
                        flush_eob()
                    continue
                flush_eob()
                run = 0
                for i in range(nz[-1] + 1):
                    v = pts[i]
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, lnc = ac_codes[0xF0]
                        bw.write(code, lnc)
                        run -= 16
                    s = _csize(v)
                    code, lnc = ac_codes[(run << 4) | s]
                    bw.write(code, lnc)
                    bw.write(v if v >= 0 else v + (1 << s) - 1, s)
                    run = 0
                if nz[-1] < hi - lo:
                    eobrun = 1
        flush_eob()
        bw.flush()
        return bw

    def ac_refine(cz, lo, hi, al, nby, nbx):
        # G.1.2.3 encoder: pool = correction bits owed to the pending
        # EOB run (flushed after its EOBn), cur = bits since the last
        # emitted symbol in this block (flushed after symbol + sign)
        bw = _BitWriter()
        eobrun = 0
        pool: list[int] = []
        cur: list[int] = []

        def flush_eob():
            nonlocal eobrun
            if eobrun:
                nbits = eobrun.bit_length() - 1
                code, lnc = ac_codes[nbits << 4]
                bw.write(code, lnc)
                if nbits:
                    bw.write(eobrun - (1 << nbits), nbits)
                for b in pool:
                    bw.write(b, 1)
                pool.clear()
                eobrun = 0

        def flush_cur():
            for b in cur:
                bw.write(b, 1)
            cur.clear()

        n_blk = 0
        for by in range(nby):
            for bx in range(nbx):
                if restart_interval and n_blk and \
                        n_blk % restart_interval == 0:
                    flush_eob()
                    emit_rst(bw)
                n_blk += 1
                zz = cz[by, bx]
                absv = [abs(int(v)) >> al for v in zz[lo:hi + 1]]
                eob = -1
                for i, t in enumerate(absv):
                    if t == 1:
                        eob = i
                r = 0
                for i, t in enumerate(absv):
                    if t == 0:
                        r += 1
                        continue
                    while r > 15 and i <= eob:
                        flush_eob()
                        code, lnc = ac_codes[0xF0]
                        bw.write(code, lnc)
                        r -= 16
                        flush_cur()
                    if t > 1:
                        cur.append(t & 1)
                        continue
                    flush_eob()
                    code, lnc = ac_codes[(r << 4) | 1]
                    bw.write(code, lnc)
                    bw.write(0 if int(zz[lo + i]) < 0 else 1, 1)
                    flush_cur()
                    r = 0
                if r > 0 or cur:
                    eobrun += 1
                    pool.extend(cur)
                    cur.clear()
                    if eobrun == 0x7FFF:
                        flush_eob()
        flush_eob()
        bw.flush()
        return bw

    for ci in range(nc):  # AC first passes, per component per band
        for lo, hi in ((1, 5), (6, 63)):
            sos([(ci + 1, 0, 0)], lo, hi, 0, 1,
                ac_first(coefs[ci], lo, hi, 1, *ac_dims[ci]))

    # DC refinement (raw bits, interleaved MCU order, Ah=1 -> Al=0)
    bw = _BitWriter()
    n_mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and n_mcu and \
                    n_mcu % restart_interval == 0:
                emit_rst(bw)
            n_mcu += 1
            for ci in range(nc):
                sh, sv = samp[ci]
                for by in range(sv):
                    for bx in range(sh):
                        bw.write(int(coefs[ci][my * sv + by,
                                               mx * sh + bx, 0]) & 1, 1)
    bw.flush()
    sos([(ci + 1, 0, 0) for ci in range(nc)], 0, 0, 1, 0, bw)

    for ci in range(nc):  # AC refinement passes
        for lo, hi in ((1, 5), (6, 63)):
            sos([(ci + 1, 0, 0)], lo, hi, 1, 0,
                ac_refine(coefs[ci], lo, hi, 0, *ac_dims[ci]))

    # --- assemble ---
    out = bytearray(b"\xff\xd8")
    out += (b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00"
            + struct.pack(">HH", 1, 1) + b"\x00\x00")
    for tq, tbl in list(((0, ql), (1, qc)))[:min(nc, 2)]:
        out += (b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq])
                + bytes(tbl.astype(np.uint8)[_ZIGZAG]))
    out += (b"\xff\xc2" + struct.pack(">H", 8 + 3 * nc) + b"\x08"
            + struct.pack(">HH", h, w) + bytes([nc]))
    for ci in range(nc):
        sh, sv = samp[ci]
        out += bytes([ci + 1, (sh << 4) | sv, 0 if ci == 0 else 1])
    out += _dht_segment(0, 0, *_DC_L)
    if nc > 1:
        out += _dht_segment(0, 1, *_DC_C)
    out += _dht_segment(1, 0, *_AC_P)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    for payload, data in scans:
        out += (b"\xff\xda" + struct.pack(">H", len(payload) + 2)
                + payload + data)
    out += b"\xff\xd9"
    return bytes(out)
