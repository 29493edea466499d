"""GIF codec: round-trips, a real compressing LZW stream (dictionary
growth, width increases, KwKwK), interlace, and the canonical 1x1 GIF."""

import struct

import numpy as np
import pytest

from lucene_ray.pipelines.mm_codecs import (
    _lzw_decode, decode_gif, decode_image, encode_gif,
)


def _lzw_compress(indices, mcs):
    """Independent spec-following LZW compressor (string-table based)
    used ONLY as a test oracle for the decoder."""
    clear = 1 << mcs
    end = clear + 1
    width = mcs + 1
    table = {(i,): i for i in range(clear)}
    next_code = end + 1
    bits = []

    def emit(code, w):
        for b in range(w):
            bits.append((code >> b) & 1)

    emit(clear, width)
    prev = ()
    for p in map(int, indices):
        cur = prev + (p,)
        if cur in table:
            prev = cur
            continue
        emit(table[prev], width)
        if next_code < 4096:
            table[cur] = next_code
            next_code += 1
            if next_code == (1 << width) + 1 and width < 12:
                # the encoder's table runs ONE entry ahead of the
                # decoder's (its add for e_i lands when the decoder
                # processes e_{i+1}), so it widens at (1<<width)+1
                width += 1
        prev = (p,)
    if prev:
        emit(table[prev], width)
    emit(end, width)
    return np.packbits(np.array(bits, dtype=np.uint8),
                       bitorder="little").tobytes()


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_lzw_decode_against_real_compressor(seed):
    rng = np.random.default_rng(seed)
    # repetitive data drives real dictionary growth incl. KwKwK runs
    base = rng.integers(0, 7, 50).astype(np.uint8)
    data = np.concatenate([base] * 40 + [np.zeros(100, np.uint8)])
    stream = _lzw_compress(data, 3)
    out = _lzw_decode(stream, 3, len(data))
    assert (out == data).all()


def test_gif_roundtrip_shapes_and_colors():
    rng = np.random.default_rng(7)
    for _ in range(5):
        h, w = int(rng.integers(1, 50)), int(rng.integers(1, 50))
        ncol = int(rng.integers(2, 257))
        pal = rng.integers(0, 256, (ncol, 3)).astype(np.uint8)
        idx = rng.integers(0, ncol, (h, w)).astype(np.uint8)
        rgb = decode_gif(encode_gif(idx, pal))
        assert (rgb == pal[idx]).all()


def test_gif_interlaced_decode():
    # hand-build an interlaced GIF: same pixels, rows stored in
    # interlace pass order; decode must restore natural order
    rng = np.random.default_rng(8)
    h, w, ncol = 13, 9, 8
    pal = rng.integers(0, 256, (ncol, 3)).astype(np.uint8)
    idx = rng.integers(0, ncol, (h, w)).astype(np.uint8)
    plain = encode_gif(idx, pal)
    rows = np.concatenate([np.arange(s, h, st)
                           for s, st in ((0, 8), (4, 8), (2, 4), (1, 2))])
    inter = encode_gif(idx[rows], pal)
    # flip the interlace bit in the image descriptor (offset: 6+7+pal)
    pal_size = (2 << ((plain[10]) & 7)) * 3
    desc = 13 + pal_size
    inter = bytearray(inter)
    assert inter[desc] == 0x2C
    inter[desc + 9] |= 0x40
    got = decode_gif(bytes(inter))
    assert (got == pal[idx]).all()


def test_canonical_1x1_gif():
    blob = bytes([
        0x47, 0x49, 0x46, 0x38, 0x39, 0x61, 0x01, 0x00, 0x01, 0x00,
        0x80, 0x00, 0x00, 0x00, 0x00, 0x00, 0xFF, 0xFF, 0xFF,
        0x21, 0xF9, 0x04, 0x01, 0x00, 0x00, 0x00, 0x00,
        0x2C, 0x00, 0x00, 0x00, 0x00, 0x01, 0x00, 0x01, 0x00, 0x00,
        0x02, 0x02, 0x44, 0x01, 0x00, 0x3B])
    img = decode_gif(blob)
    assert img.shape == (1, 1, 3)


def test_decode_image_dispatches_gif():
    pal = np.array([[255, 0, 0], [0, 255, 0]], dtype=np.uint8)
    idx = np.array([[0, 1], [1, 0]], dtype=np.uint8)
    img = decode_image(encode_gif(idx, pal))
    assert img.shape == (2, 2, 3)
    assert (img == pal[idx]).all()
