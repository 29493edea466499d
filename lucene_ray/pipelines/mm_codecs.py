"""Real multimodal codecs in pure numpy — no external libraries.

BMP (Windows V3, 24-bit BI_RGB), WAV (RIFF PCM16 mono), PNG (8-bit
gray/RGB/RGBA), GIF (87a/89a LZW) and baseline JPEG (``mm_jpeg.py``)
are implemented directly from their published specifications, which
makes the multimodal pipeline stages REAL end-to-end in this container:
encoded bytes go in, pixels/samples come out, features are computed
from actual content (not digests). Anything beyond these remains
import-gated (PIL/soundfile) as before.
"""

from __future__ import annotations

import struct

import numpy as np

# --- BMP (24-bit, uncompressed) --------------------------------------------


def encode_bmp(img: np.ndarray) -> bytes:
    """HxWx3 uint8 (RGB) -> BMP bytes (bottom-up, BGR, 4-byte row pad)."""
    h, w, c = img.shape
    assert c == 3 and img.dtype == np.uint8
    row_bytes = (w * 3 + 3) & ~3
    data = np.zeros((h, row_bytes), dtype=np.uint8)
    bgr = img[::-1, :, ::-1]  # bottom-up rows, RGB->BGR
    data[:, :w * 3] = bgr.reshape(h, w * 3)
    pixel_bytes = data.tobytes()
    header = struct.pack("<2sIHHI", b"BM", 54 + len(pixel_bytes), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                       len(pixel_bytes), 2835, 2835, 0, 0)
    return header + info + pixel_bytes


def decode_bmp(blob: bytes) -> np.ndarray:
    """BMP bytes -> HxWx3 uint8 RGB. Supports the 24-bit BI_RGB layout
    (top-down or bottom-up)."""
    if blob[:2] != b"BM":
        raise ValueError("not a BMP file")
    offset = struct.unpack_from("<I", blob, 10)[0]
    hdr_size = struct.unpack_from("<I", blob, 14)[0]
    if hdr_size < 40:
        raise ValueError("unsupported BMP header")
    w, h = struct.unpack_from("<ii", blob, 18)
    planes, bpp = struct.unpack_from("<HH", blob, 26)
    comp = struct.unpack_from("<I", blob, 30)[0]
    if bpp != 24 or comp != 0:
        raise ValueError(f"unsupported BMP: bpp={bpp} compression={comp}")
    top_down = h < 0
    h = abs(h)
    row_bytes = (w * 3 + 3) & ~3
    data = np.frombuffer(blob, dtype=np.uint8,
                         count=row_bytes * h, offset=offset)
    rows = data.reshape(h, row_bytes)[:, :w * 3].reshape(h, w, 3)
    if not top_down:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR -> RGB


def resize_nearest(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    h, w = img.shape[:2]
    yi = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xi = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return img[yi][:, xi]


def resize_bilinear(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    h, w = img.shape[:2]
    y = (np.arange(out_h) + 0.5) * h / out_h - 0.5
    x = (np.arange(out_w) + 0.5) * w / out_w - 0.5
    y0 = np.clip(np.floor(y).astype(np.int64), 0, h - 1)
    x0 = np.clip(np.floor(x).astype(np.int64), 0, w - 1)
    y1 = np.clip(y0 + 1, 0, h - 1)
    x1 = np.clip(x0 + 1, 0, w - 1)
    wy = np.clip(y - y0, 0, 1)[:, None, None]
    wx = np.clip(x - x0, 0, 1)[None, :, None]
    p = img.astype(np.float64)
    out = (p[y0][:, x0] * (1 - wy) * (1 - wx) + p[y0][:, x1] * (1 - wy) * wx
           + p[y1][:, x0] * wy * (1 - wx) + p[y1][:, x1] * wy * wx)
    return np.round(out).clip(0, 255).astype(np.uint8)


def image_grid_features(img: np.ndarray, grid: int = 4,
                        hist_bins: int = 16) -> np.ndarray:
    """64-dim content features: grid x grid mean RGB (48) + grayscale
    histogram (16), all from decoded pixels."""
    small = resize_bilinear(img, grid * 8, grid * 8).astype(np.float32)
    cells = small.reshape(grid, 8, grid, 8, 3).mean(axis=(1, 3))  # g,g,3
    gray = small.mean(axis=2)
    hist, _ = np.histogram(gray, bins=hist_bins, range=(0, 256))
    hist = hist.astype(np.float32) / max(gray.size, 1)
    return np.concatenate([cells.reshape(-1) / 255.0, hist])


# --- WAV (RIFF PCM16 mono) --------------------------------------------------


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """float samples in [-1, 1] -> RIFF WAVE PCM16 mono bytes."""
    pcm = np.clip(np.asarray(samples, np.float64), -1.0, 1.0)
    ints = np.round(pcm * 32767.0).astype("<i2")
    data = ints.tobytes()
    fmt = struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, 1, sample_rate,
                      sample_rate * 2, 2, 16)
    hdr = struct.pack("<4sI4s", b"RIFF", 4 + len(fmt) + 8 + len(data),
                      b"WAVE")
    return hdr + fmt + struct.pack("<4sI", b"data", len(data)) + data


def decode_wav(blob: bytes) -> tuple[np.ndarray, int]:
    """RIFF WAVE PCM16 mono -> (float64 samples in [-1,1], sample_rate)."""
    if blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("not a WAV file")
    pos = 12
    sample_rate = None
    samples = None
    while pos + 8 <= len(blob):
        cid, size = struct.unpack_from("<4sI", blob, pos)
        pos += 8
        if cid == b"fmt ":
            fmt_code, channels, sample_rate = struct.unpack_from(
                "<HHI", blob, pos)
            bits = struct.unpack_from("<H", blob, pos + 14)[0]
            if fmt_code != 1 or channels != 1 or bits != 16:
                raise ValueError("unsupported WAV (need PCM16 mono)")
        elif cid == b"data":
            ints = np.frombuffer(blob, dtype="<i2", count=size // 2,
                                 offset=pos)
            samples = ints.astype(np.float64) / 32767.0
        pos += size + (size & 1)
    if samples is None or sample_rate is None:
        raise ValueError("missing fmt/data chunk")
    return samples, sample_rate


def frame_energies(samples: np.ndarray, n_frames: int) -> np.ndarray:
    """RMS energy per equal-length frame."""
    n = len(samples)
    if n == 0:
        return np.zeros(n_frames)
    bounds = np.linspace(0, n, n_frames + 1).astype(np.int64)
    return np.array([
        float(np.sqrt(np.mean(samples[bounds[i]:bounds[i + 1]] ** 2)))
        if bounds[i + 1] > bounds[i] else 0.0
        for i in range(n_frames)])


def spectrogram(samples: np.ndarray, frame: int = 256,
                hop: int = 128) -> np.ndarray:
    """Magnitude spectrogram via numpy rFFT (Hann window)."""
    n = len(samples)
    if n < frame:
        samples = np.pad(samples, (0, frame - n))
        n = frame
    starts = np.arange(0, n - frame + 1, hop)
    win = np.hanning(frame)
    frames = np.stack([samples[s:s + frame] * win for s in starts])
    return np.abs(np.fft.rfft(frames, axis=1))


# --- PNG (8-bit gray / RGB / RGBA, non-interlaced) --------------------------
# Full spec-conformant decode of the common web layout: zlib-inflated
# IDAT, all five scanline filters (None/Sub/Up/Average/Paeth) unfiltered.
# Sub rows unfilter as a vectorized mod-256 prefix sum over pixel groups;
# Up rows as one uint8 add; Average/Paeth fall back to a per-byte sweep
# (sequential by definition). Encode emits any chosen filter type, which
# lets tests round-trip every unfilter path.

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
import zlib as _zlib


def _png_chunk(tag: bytes, payload: bytes) -> bytes:
    return (struct.pack(">I", len(payload)) + tag + payload
            + struct.pack(">I", _zlib.crc32(tag + payload) & 0xFFFFFFFF))


def encode_png(img: np.ndarray, *, filter_type: int = 0,
               compress_level: int = 6) -> bytes:
    """HxW (gray), HxWx3 (RGB) or HxWx4 (RGBA) uint8 -> PNG bytes."""
    assert img.dtype == np.uint8
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, planes = img.shape
    color = {1: 0, 3: 2, 4: 6}[planes]
    raw = img.reshape(h, w * planes)
    bpp = planes
    stride = w * planes
    filt = np.zeros((h, 1 + stride), dtype=np.uint8)
    filt[:, 0] = filter_type
    if filter_type == 0:
        filt[:, 1:] = raw
    elif filter_type == 1:  # Sub
        filt[:, 1:] = raw
        filt[:, 1 + bpp:] = raw[:, bpp:] - raw[:, :-bpp]
    elif filter_type == 2:  # Up
        filt[0, 1:] = raw[0]
        filt[1:, 1:] = raw[1:] - raw[:-1]
    elif filter_type in (3, 4):  # Average / Paeth
        prev = np.zeros(stride, dtype=np.int64)
        for y in range(h):
            row = raw[y].astype(np.int64)
            left = np.concatenate([np.zeros(bpp, np.int64), row[:-bpp]])
            up = prev
            if filter_type == 3:
                pred = (left + up) // 2
            else:
                ul = np.concatenate([np.zeros(bpp, np.int64),
                                     prev[:-bpp]])
                p = left + up - ul
                pa_, pb, pc = np.abs(p - left), np.abs(p - up), np.abs(p - ul)
                pred = np.where((pa_ <= pb) & (pa_ <= pc), left,
                                np.where(pb <= pc, up, ul))
            filt[y, 1:] = ((row - pred) & 0xFF).astype(np.uint8)
            prev = row
    else:
        raise ValueError(f"bad filter type {filter_type}")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    idat = _zlib.compress(filt.tobytes(), compress_level)
    return (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", idat) + _png_chunk(b"IEND", b""))


def decode_png(blob: bytes) -> np.ndarray:
    """PNG bytes -> HxW / HxWx3 / HxWx4 uint8 (gray / RGB / RGBA)."""
    if blob[:8] != _PNG_SIG:
        raise ValueError("not a PNG file")
    pos = 8
    ihdr = None
    idat = []
    plte = None
    trns = None
    while pos + 8 <= len(blob):
        size, tag = struct.unpack_from(">I4s", blob, pos)
        payload = blob[pos + 8:pos + 8 + size]
        pos += 12 + size
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", payload)
        elif tag == b"PLTE":
            plte = np.frombuffer(payload, np.uint8).reshape(-1, 3)
        elif tag == b"tRNS":
            trns = np.frombuffer(payload, np.uint8)
        elif tag == b"IDAT":
            idat.append(payload)
        elif tag == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    w, h, depth, color, comp, filt_method, interlace = ihdr
    if depth not in (8, 16) or comp != 0 or filt_method != 0 \
            or interlace != 0:
        raise ValueError(
            f"unsupported PNG: depth={depth} interlace={interlace}")
    planes = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color)
    if planes is None:
        raise ValueError(f"unsupported PNG color type {color}")
    if color == 3 and plte is None:
        raise ValueError("palette PNG without PLTE chunk")
    if color == 3 and depth != 8:
        raise ValueError("palette PNG must be 8-bit here")
    nb = depth // 8
    bpp = planes * nb  # filters operate on BYTES with pixel offset bpp
    stride = w * bpp
    data = np.frombuffer(_zlib.decompress(b"".join(idat)), np.uint8)
    if data.size != h * (1 + stride):
        raise ValueError("corrupt PNG scanline data")
    rows = data.reshape(h, 1 + stride)
    ftypes = rows[:, 0]
    raw = rows[:, 1:]
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ft = ftypes[y]
        line = raw[y]
        if ft == 0:
            rec = line.copy()
        elif ft == 1:  # Sub: mod-256 prefix sum over pixel groups
            rec = np.cumsum(
                line.reshape(w, bpp).astype(np.int64), axis=0
            ).reshape(stride).astype(np.uint8)
        elif ft == 2:  # Up
            rec = line + prev
        elif ft in (3, 4):
            rec = np.zeros(stride, dtype=np.int64)
            li = line.astype(np.int64)
            pv = prev.astype(np.int64)
            for x in range(stride):
                a = rec[x - bpp] if x >= bpp else 0
                b = pv[x]
                if ft == 3:
                    pred = (a + b) // 2
                else:
                    c = pv[x - bpp] if x >= bpp else 0
                    p = a + b - c
                    pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if pa_ <= pb and pa_ <= pc else (
                        b if pb <= pc else c)
                rec[x] = (li[x] + pred) & 0xFF
            rec = rec.astype(np.uint8)
        else:
            raise ValueError(f"bad PNG filter {ft}")
        out[y] = rec
        prev = rec
    if nb == 2:
        # 16-bit samples are big-endian; take the high byte (the exact
        # floor of value/257-free 8-bit scale used for feature work)
        img = out.reshape(h, w, planes, 2)[:, :, :, 0].copy()
    else:
        img = out.reshape(h, w, planes)
    if color == 3:  # indexed-color: map through PLTE (+ optional tRNS)
        idx = img[:, :, 0]
        if int(idx.max(initial=0)) >= len(plte):
            raise ValueError("palette index out of range")
        rgb = plte[idx]
        if trns is not None:
            alpha = np.full(len(plte), 255, dtype=np.uint8)
            alpha[:len(trns)] = trns
            return np.concatenate([rgb, alpha[idx][:, :, None]], axis=2)
        return rgb.copy()
    if planes == 1:
        return img[:, :, 0].copy()
    if planes == 2:  # gray+alpha -> gray
        return img[:, :, 0].copy()
    return img.copy()


def decode_image(blob: bytes) -> np.ndarray:
    """Magic-dispatched image decode (BMP, PNG, GIF or baseline JPEG)
    -> HxWx3 uint8 RGB."""
    if blob[:2] == b"BM":
        return decode_bmp(blob)
    if blob[:8] == _PNG_SIG:
        img = decode_png(blob)
        if img.ndim == 2:
            img = np.repeat(img[:, :, None], 3, axis=2)
        elif img.shape[2] == 4:
            img = img[:, :, :3].copy()
        return img
    if blob[:6] in (b"GIF87a", b"GIF89a"):
        return decode_gif(blob)
    if blob[:2] == b"\xff\xd8":
        from .mm_jpeg import decode_jpeg
        return decode_jpeg(blob)
    raise ValueError(
        "unrecognized image format (need BMP, PNG, GIF or JPEG)")


# --- GIF (87a/89a, LZW) ----------------------------------------------------
# Pure-Python/numpy implementation of the published GIF specification
# (CompuServe GIF89a spec): logical screen descriptor, global/local
# color tables, variable-width LSB-first LZW, interlace passes. The
# encoder uses the classic "uncompressed GIF" technique (a CLEAR code
# is emitted before the dictionary would force a width increase), which
# produces a fully spec-conformant stream.

_GIF_SIGS = (b"GIF87a", b"GIF89a")


def _lzw_decode(data: bytes, mcs: int, n_pixels: int) -> np.ndarray:
    """Variable-width LSB-first LZW -> uint8 index array."""
    clear = 1 << mcs
    end = clear + 1
    width = mcs + 1
    # bit reader over the whole byte stream
    bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8),
                         bitorder="little")
    pos = 0
    nbits = len(bits)
    # dictionary as index chains: base entries are single literals
    prefix = np.full(4096, -1, dtype=np.int32)
    suffix = np.zeros(4096, dtype=np.int32)
    for i in range(clear):
        suffix[i] = i
    next_code = end + 1
    prev = -1
    out = np.empty(n_pixels, dtype=np.uint8)
    n_out = 0
    stack = []
    while pos + width <= nbits and n_out < n_pixels:
        code = int(bits[pos:pos + width] @ (1 << np.arange(width,
                                                           dtype=np.int64)))
        pos += width
        if code == clear:
            next_code = end + 1
            width = mcs + 1
            prev = -1
            continue
        if code == end:
            break
        if prev < 0:
            out[n_out] = suffix[code]
            n_out += 1
            prev = code
            continue
        if code < next_code:
            cur = code
        elif code == next_code:
            # KwKwK case: entry = dict[prev] + first(dict[prev])
            cur = prev
        else:
            raise ValueError("corrupt LZW stream")
        # expand chain (reversed)
        stack.clear()
        c = cur
        while c >= 0:
            stack.append(suffix[c])
            c = prefix[c]
        first = stack[-1]
        if code == next_code:
            stack.insert(0, first)
        for v in reversed(stack):
            if n_out < n_pixels:
                out[n_out] = v
                n_out += 1
        if next_code < 4096:
            prefix[next_code] = prev
            suffix[next_code] = first
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = code
    return out[:n_out]


def _lzw_encode_uncompressed(indices: np.ndarray, mcs: int) -> bytes:
    """Literal-codes-only LZW stream (CLEAR before every forced width
    increase keeps the code width at mcs+1 — the spec-conformant
    'uncompressed GIF' technique)."""
    clear = 1 << mcs
    end = clear + 1
    width = mcs + 1
    cap = (1 << width) - 1  # emit CLEAR when next_code would reach this
    out_bits = []
    next_code = end + 1
    first_after_clear = True

    def emit(code: int):
        for b in range(width):
            out_bits.append((code >> b) & 1)

    emit(clear)
    for p in map(int, indices):
        emit(p)
        if first_after_clear:
            first_after_clear = False
        else:
            next_code += 1
        if next_code >= cap:
            emit(clear)
            next_code = end + 1
            first_after_clear = True
    emit(end)
    arr = np.array(out_bits, dtype=np.uint8)
    return np.packbits(arr, bitorder="little").tobytes()


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def encode_gif(indices: np.ndarray, palette: np.ndarray) -> bytes:
    """(H, W) uint8 index image + (n<=256, 3) uint8 palette -> GIF89a."""
    h, w = indices.shape
    n = len(palette)
    assert n <= 256 and indices.max(initial=0) < n
    bits = max(1, int(np.ceil(np.log2(max(n, 2)))))
    table_size = 1 << bits
    mcs = max(2, bits)
    out = [b"GIF89a", struct.pack("<HHBBB", w, h,
                                  0x80 | (bits - 1), 0, 0)]
    pal = np.zeros((table_size, 3), dtype=np.uint8)
    pal[:n] = palette
    out.append(pal.tobytes())
    out.append(struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0))
    out.append(bytes([mcs]))
    lzw = _lzw_encode_uncompressed(indices.reshape(-1), mcs)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i:i + 255]
        out.append(bytes([len(chunk)]) + chunk)
    out.append(b"\x00;")
    return b"".join(out)


def decode_gif(blob: bytes) -> np.ndarray:
    """First frame of a GIF -> HxWx3 uint8 RGB (interlace supported)."""
    if blob[:6] not in _GIF_SIGS:
        raise ValueError("not a GIF")
    sw, sh, packed, _bg, _ar = struct.unpack_from("<HHBBB", blob, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        size = 2 << (packed & 0x07)
        gct = np.frombuffer(blob, np.uint8, size * 3, pos) \
            .reshape(size, 3)
        pos += size * 3
    while pos < len(blob):
        b = blob[pos]
        if b == 0x21:  # extension: skip sub-blocks
            pos += 2
            while blob[pos] != 0:
                pos += 1 + blob[pos]
            pos += 1
        elif b == 0x2C:  # image descriptor
            _l, _t, w, h, ipk = struct.unpack_from("<HHHHB", blob, pos + 1)
            pos += 10
            ct = gct
            if ipk & 0x80:
                size = 2 << (ipk & 0x07)
                ct = np.frombuffer(blob, np.uint8, size * 3, pos) \
                    .reshape(size, 3)
                pos += size * 3
            mcs = blob[pos]
            pos += 1
            parts = []
            while blob[pos] != 0:
                ln = blob[pos]
                parts.append(blob[pos + 1:pos + 1 + ln])
                pos += 1 + ln
            pos += 1
            idx = _lzw_decode(b"".join(parts), mcs, w * h)
            if len(idx) < w * h:
                idx = np.pad(idx, (0, w * h - len(idx)))
            img = idx.reshape(h, w)
            if ipk & 0x40:  # interlaced: reorder rows by pass
                rows = np.concatenate([np.arange(start, h, step)
                                       for start, step in
                                       _INTERLACE_PASSES])
                deinter = np.empty_like(img)
                deinter[rows] = img
                img = deinter
            if ct is None:
                raise ValueError("GIF image without a color table")
            return ct[img]
        elif b == 0x3B:
            break
        else:
            raise ValueError(f"unknown GIF block 0x{b:02x}")
    raise ValueError("GIF contains no image data")


def decode_gif_frames(blob: bytes, max_frames: int = 256) -> list:
    """ALL frames of a (possibly animated) GIF composed onto the
    logical screen -> list of HxWx3 uint8 RGB canvases.

    Honors per-frame Graphic Control Extensions: transparency index
    (transparent pixels keep the underlying canvas) and disposal
    methods 2 (restore background) / 3 (restore previous); frames may
    be partial (l, t, w, h sub-rects), as animation deltas usually are.
    """
    if blob[:6] not in _GIF_SIGS:
        raise ValueError("not a GIF")
    sw, sh, packed, bg, _ar = struct.unpack_from("<HHBBB", blob, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        size = 2 << (packed & 0x07)
        gct = np.frombuffer(blob, np.uint8, size * 3, pos).reshape(size, 3)
        pos += size * 3
    bg_rgb = gct[bg] if gct is not None and bg < len(gct) else \
        np.zeros(3, np.uint8)
    canvas = np.broadcast_to(bg_rgb, (sh, sw, 3)).copy()
    frames = []
    transparent = None
    disposal = 0
    while pos < len(blob) and len(frames) < max_frames:
        b = blob[pos]
        if b == 0x21:
            label = blob[pos + 1]
            pos += 2
            sub0 = pos
            while blob[pos] != 0:
                pos += 1 + blob[pos]
            pos += 1
            if label == 0xF9 and blob[sub0] >= 4:  # GCE
                gpk = blob[sub0 + 1]
                disposal = (gpk >> 2) & 0x7
                transparent = blob[sub0 + 4] if gpk & 0x01 else None
        elif b == 0x2C:
            left, top, w, h, ipk = struct.unpack_from("<HHHHB", blob,
                                                      pos + 1)
            pos += 10
            ct = gct
            if ipk & 0x80:
                size = 2 << (ipk & 0x07)
                ct = np.frombuffer(blob, np.uint8, size * 3, pos) \
                    .reshape(size, 3)
                pos += size * 3
            mcs = blob[pos]
            pos += 1
            parts = []
            while blob[pos] != 0:
                ln = blob[pos]
                parts.append(blob[pos + 1:pos + 1 + ln])
                pos += 1 + ln
            pos += 1
            idx = _lzw_decode(b"".join(parts), mcs, w * h)
            if len(idx) < w * h:
                idx = np.pad(idx, (0, w * h - len(idx)))
            img = idx.reshape(h, w)
            if ipk & 0x40:
                rows = np.concatenate([np.arange(start, h, step)
                                       for start, step in
                                       _INTERLACE_PASSES])
                deinter = np.empty_like(img)
                deinter[rows] = img
                img = deinter
            if ct is None:
                raise ValueError("GIF image without a color table")
            prev = canvas.copy() if disposal == 3 else None
            # clip the frame rect to the logical screen: a malformed
            # GIF may declare left+w / top+h beyond it, and numpy's
            # clamped slice would otherwise shape-mismatch on the blit
            ch = min(h, max(sh - top, 0))
            cw = min(w, max(sw - left, 0))
            region = canvas[top:top + ch, left:left + cw]
            rgb = ct[img][:ch, :cw]
            if transparent is not None:
                opaque = (img != transparent)[:ch, :cw]
                region[opaque] = rgb[opaque]
            else:
                region[:] = rgb
            frames.append(canvas.copy())
            if disposal == 2:
                canvas[top:top + h, left:left + w] = bg_rgb
            elif disposal == 3 and prev is not None:
                canvas = prev
            transparent = None
            disposal = 0
        elif b == 0x3B:
            break
        else:
            raise ValueError(f"unknown GIF block 0x{b:02x}")
    if not frames:
        raise ValueError("GIF contains no image data")
    return frames


def encode_gif_animation(frame_indices: list, palette: np.ndarray) -> bytes:
    """List of (H, W) uint8 index images + shared palette -> animated
    GIF89a (full-frame replacement, no transparency)."""
    h, w = frame_indices[0].shape
    n = len(palette)
    bits = max(1, int(np.ceil(np.log2(max(n, 2)))))
    mcs = max(2, bits)
    pal = np.zeros((1 << bits, 3), dtype=np.uint8)
    pal[:n] = palette
    out = [b"GIF89a", struct.pack("<HHBBB", w, h, 0x80 | (bits - 1), 0, 0),
           pal.tobytes()]
    for fi in frame_indices:
        out.append(b"\x21\xf9\x04\x00\x04\x00\x00\x00")  # GCE delay=4
        out.append(b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0))
        data = _lzw_encode_uncompressed(fi.reshape(-1), mcs)
        out.append(bytes([mcs]))
        for i in range(0, len(data), 255):
            chunk = data[i:i + 255]
            out.append(bytes([len(chunk)]) + chunk)
        out.append(b"\x00")
    out.append(b";")
    return b"".join(out)
