"""Real multimodal codecs in pure numpy — no external libraries.

BMP (Windows V3, 24-bit BI_RGB) and WAV (RIFF PCM16 mono) are fully
specified public formats simple enough to en/decode vectorized, which
makes the multimodal pipeline stages REAL end-to-end in this container:
encoded bytes go in, pixels/samples come out, features are computed
from actual content (not digests). Formats beyond these remain
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
    while pos + 8 <= len(blob):
        size, tag = struct.unpack_from(">I4s", blob, pos)
        payload = blob[pos + 8:pos + 8 + size]
        pos += 12 + size
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", payload)
        elif tag == b"IDAT":
            idat.append(payload)
        elif tag == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    w, h, depth, color, comp, filt_method, interlace = ihdr
    if depth != 8 or comp != 0 or filt_method != 0 or interlace != 0:
        raise ValueError(
            f"unsupported PNG: depth={depth} interlace={interlace}")
    planes = {0: 1, 2: 3, 4: 2, 6: 4}.get(color)
    if planes is None:
        raise ValueError(f"unsupported PNG color type {color}")
    bpp = planes
    stride = w * planes
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
    img = out.reshape(h, w, planes)
    if planes == 1:
        return img[:, :, 0].copy()
    if planes == 2:  # gray+alpha -> gray
        return img[:, :, 0].copy()
    return img.copy()


def decode_image(blob: bytes) -> np.ndarray:
    """Magic-dispatched image decode (BMP or PNG) -> HxWx3 uint8 RGB."""
    if blob[:2] == b"BM":
        return decode_bmp(blob)
    if blob[:8] == _PNG_SIG:
        img = decode_png(blob)
        if img.ndim == 2:
            img = np.repeat(img[:, :, None], 3, axis=2)
        elif img.shape[2] == 4:
            img = img[:, :, :3].copy()
        return img
    raise ValueError("unrecognized image format (need BMP or PNG)")
