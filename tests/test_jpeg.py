"""Baseline JPEG codec (pure numpy, ITU-T T.81 baseline + JFIF):
round-trip error bounds, marker structure, subsampling, dispatch."""

import struct

import numpy as np
import pytest

from lucene_ray.pipelines.mm_codecs import decode_image
from lucene_ray.pipelines.mm_jpeg import decode_jpeg, encode_jpeg


def _gradient(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack([(xx * 255 / w), (yy * 255 / h),
                     ((xx + yy) * 255 / (w + h))], axis=2).astype(np.uint8)


class TestRoundTrip:
    def test_smooth_gradient_tight_bound(self):
        img = _gradient(40, 56)
        dec = decode_jpeg(encode_jpeg(img, quality=90))
        assert dec.shape == img.shape
        err = np.abs(dec.astype(int) - img.astype(int))
        assert err.max() <= 6 and err.mean() < 1.5

    def test_solid_color_exact(self):
        img = np.full((16, 24, 3), (200, 30, 90), dtype=np.uint8)
        dec = decode_jpeg(encode_jpeg(img, quality=95))
        assert np.abs(dec.astype(int) - img.astype(int)).max() <= 1

    def test_odd_dimensions_crop(self):
        img = _gradient(13, 17)
        for sub in ("4:4:4", "4:2:0"):
            dec = decode_jpeg(encode_jpeg(img, 90, subsampling=sub))
            assert dec.shape == (13, 17, 3)

    def test_420_subsampled_roundtrip(self):
        img = _gradient(41, 57)
        blob = encode_jpeg(img, quality=90, subsampling="4:2:0")
        dec = decode_jpeg(blob)
        err = np.abs(dec.astype(int) - img.astype(int))
        assert err.max() <= 14 and err.mean() < 3
        # 4:2:0 stream is smaller than 4:4:4 at equal quality
        assert len(blob) < len(encode_jpeg(img, quality=90))

    def test_grayscale_input(self):
        g = np.linspace(0, 255, 13 * 17).reshape(13, 17).astype(np.uint8)
        dec = decode_jpeg(encode_jpeg(g, 90))
        assert dec.shape == (13, 17, 3)
        assert np.abs(dec[:, :, 0].astype(int) - g.astype(int)).max() <= 4

    def test_quality_monotone_size(self):
        img = _gradient(32, 32)
        sizes = [len(encode_jpeg(img, q)) for q in (30, 60, 90)]
        assert sizes[0] < sizes[2]

    def test_high_frequency_content_decodes(self):
        rng = np.random.default_rng(3)
        img = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
        dec = decode_jpeg(encode_jpeg(img, 95))
        assert dec.shape == img.shape  # lossy, but structurally sound


class TestStructure:
    def test_markers(self):
        blob = encode_jpeg(_gradient(8, 8), 85)
        assert blob[:2] == b"\xff\xd8" and blob[-2:] == b"\xff\xd9"
        assert b"JFIF\x00" in blob[:30]
        assert b"\xff\xc0" in blob and b"\xff\xc4" in blob
        assert b"\xff\xdb" in blob and b"\xff\xda" in blob

    def test_sof_dims(self):
        blob = encode_jpeg(_gradient(19, 23), 85)
        i = blob.index(b"\xff\xc0")
        hh, ww = struct.unpack(">HH", blob[i + 5:i + 9])
        assert (hh, ww) == (19, 23)

    def test_byte_stuffing_no_stray_markers(self):
        # entropy data may not contain unstuffed FF bytes
        blob = encode_jpeg(_gradient(32, 32), 5)  # coarse -> many FFs likely
        i = blob.index(b"\xff\xda")
        ln = struct.unpack(">H", blob[i + 2:i + 4])[0]
        data = blob[i + 2 + ln:-2]
        j = 0
        while j < len(data) - 1:
            if data[j] == 0xFF:
                assert data[j + 1] == 0x00, f"stray marker at {j}"
                j += 2
            else:
                j += 1

    def test_not_jpeg_rejected(self):
        with pytest.raises(ValueError):
            decode_jpeg(b"\x89PNG\r\n")

    def test_lossless_rejected(self):
        # progressive (SOF2) is now supported; lossless (SOF3) is not
        blob = bytearray(encode_jpeg(_gradient(8, 8), 85))
        i = bytes(blob).index(b"\xff\xc0")
        blob[i + 1] = 0xC3  # flip SOF0 -> SOF3 (lossless)
        with pytest.raises(ValueError):
            decode_jpeg(bytes(blob))


class TestDispatch:
    def test_decode_image_magic(self):
        img = _gradient(16, 16)
        dec = decode_image(encode_jpeg(img, 90))
        assert dec.shape == (16, 16, 3)
        assert np.abs(dec.astype(int) - img.astype(int)).max() <= 6


class TestProgressive:
    """SOF2 progressive (T.81 Annex G): spectral selection +
    successive approximation, DC/AC first + refinement scans, EOB
    runs. The progressive encoder shares `_block_coefs` with the
    baseline encoder, so decoding its output must give PIXEL-IDENTICAL
    results to the baseline round trip at the same quality — an exact
    equivalence gate over every scan type."""

    def _eq(self, img, quality):
        from lucene_ray.pipelines.mm_jpeg import (
            decode_jpeg, encode_jpeg, encode_jpeg_progressive,
        )
        base = decode_jpeg(encode_jpeg(img, quality))
        blob = encode_jpeg_progressive(img, quality)
        # really progressive: SOF2 marker + >= 6 SOS scans
        assert b"\xff\xc2" in blob and blob.count(b"\xff\xda") >= 6
        assert (decode_jpeg(blob) == base).all()

    def test_gradient_rgb(self):
        yy, xx = np.mgrid[0:45, 0:61]
        rng = np.random.default_rng(3)
        img = np.stack([
            xx * 255 // 60, yy * 255 // 44,
            (xx + yy) * 127 // 104 + rng.integers(0, 30, (45, 61)),
        ], axis=2).astype(np.uint8)
        self._eq(img, 85)

    def test_grayscale(self):
        yy, xx = np.mgrid[0:33, 0:40]
        self._eq((xx * 6 + yy * 2).astype(np.uint8), 70)

    def test_noise_stresses_zrl_and_refinement(self):
        rng = np.random.default_rng(7)
        self._eq(rng.integers(0, 256, (32, 40, 3), dtype=np.uint8), 95)

    def test_flat_long_eob_runs(self):
        img = np.full((64, 72, 3), 130, dtype=np.uint8)
        img[10, 11] = [200, 20, 90]
        self._eq(img, 30)

    def test_low_quality_sparse(self):
        rng = np.random.default_rng(11)
        self._eq(rng.integers(100, 140, (24, 17, 3), dtype=np.uint8), 5)

    def test_multiple_qualities_and_sizes(self):
        rng = np.random.default_rng(13)
        for q, (h, w) in [(50, (8, 8)), (75, (9, 23)), (92, (17, 16))]:
            img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            self._eq(img, q)

    def test_decode_image_dispatch(self):
        from lucene_ray.pipelines.mm_codecs import decode_image
        from lucene_ray.pipelines.mm_jpeg import encode_jpeg_progressive
        img = np.full((16, 16, 3), 99, dtype=np.uint8)
        out = decode_image(encode_jpeg_progressive(img, 90))
        assert out.shape == (16, 16, 3)

    def test_progressive_420_subsampled(self):
        # odd dims exercise the ceil-of-component-size AC grid vs the
        # MCU-padded DC grid (T.81 A.2.2)
        from lucene_ray.pipelines.mm_jpeg import (
            decode_jpeg, encode_jpeg, encode_jpeg_progressive,
        )
        rng = np.random.default_rng(17)
        for (h, w) in [(17, 23), (32, 48)]:
            yy, xx = np.mgrid[0:h, 0:w]
            img = np.stack([
                xx * 255 // max(w - 1, 1), yy * 255 // max(h - 1, 1),
                rng.integers(0, 256, (h, w)),
            ], axis=2).astype(np.uint8)
            for q in (85, 40):
                base = decode_jpeg(encode_jpeg(img, q, "4:2:0"))
                blob = encode_jpeg_progressive(img, q, "4:2:0")
                assert b"\xff\xc2" in blob
                assert (decode_jpeg(blob) == base).all(), (h, w, q)

    def test_progressive_restart_intervals(self):
        # RSTn inside EVERY progressive scan type: byte realign +
        # DC-predictor and EOB-run resets
        import re

        from lucene_ray.pipelines.mm_jpeg import (
            decode_jpeg, encode_jpeg, encode_jpeg_progressive,
        )
        rng = np.random.default_rng(5)
        for (h, w), sub in [((45, 61), "4:4:4"), ((33, 49), "4:2:0")]:
            yy, xx = np.mgrid[0:h, 0:w]
            img = np.stack([
                xx * 255 // max(w - 1, 1), yy * 255 // max(h - 1, 1),
                rng.integers(0, 256, (h, w)),
            ], axis=2).astype(np.uint8)
            base = decode_jpeg(encode_jpeg(img, 80, sub))
            for ri in (1, 7):
                blob = encode_jpeg_progressive(img, 80, sub,
                                               restart_interval=ri)
                assert re.search(b"\xff[\xd0-\xd7]", blob)
                assert (decode_jpeg(blob) == base).all(), (sub, ri)
