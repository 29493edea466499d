"""Multimodal columns: image/audio as opaque binary columns with typed
metadata, processed by actor-pool map_batches stages.

The decode kernels are REAL for the fully-specified public formats this
container can handle in numpy + stdlib zlib alone — BMP (24-bit),
PNG (8-bit gray/RGB/RGBA, all five scanline filters) and WAV (PCM16
mono), implemented in ``mm_codecs.py``: encoded bytes in, pixels /
samples out, features computed from actual content; image stages
magic-dispatch on the container signature. Formats that need external
libraries (JPEG via PIL, FLAC/OGG via soundfile) stay import-gated and
raise NotImplementedError when the library is absent.
``decoder="fake"`` keeps the digest-seeded path for plumbing tests.

Batch sizing note (100 TB): binary payloads dominate memory, so stages
default to small ``batch_size`` — a batch x concurrency must fit the
worker heap; see the guide's memory section.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray.data

from ..util import default_concurrency
from .mm_codecs import (
    decode_image,
    decode_wav,
    frame_energies,
    image_grid_features,
    resize_bilinear,
    spectrogram,
)

IMAGE_SCHEMA = pa.schema([
    ("doc_id", pa.int64()),
    ("image", pa.binary()),       # opaque encoded bytes
    ("mime", pa.string()),
    ("width", pa.int32()),        # typed metadata travels with the blob
    ("height", pa.int32()),
])


class ImageFeatureExtractor:
    """Actor-pool stage: encoded image bytes -> fixed-size feature vector.

    ``decoder="auto"`` (default) magic-dispatches real BMP or PNG bytes
    and computes grid-mean-RGB + grayscale-histogram features from the
    pixels; ``decoder="fake"`` derives digest-seeded pseudo-features
    (plumbing tests); ``decoder="pil"`` import-gates the general path.
    """

    def __init__(self, decoder: str = "auto", feature_dim: int = 64):
        self.feature_dim = feature_dim
        if decoder == "bmp":  # legacy alias; decode_image handles BMP
            decoder = "auto"
        self.decoder = decoder
        if decoder == "pil":
            try:
                from PIL import Image  # noqa: F401
                self._pil = Image
            except ImportError as e:
                raise NotImplementedError(
                    "PIL not available in this environment; use "
                    "decoder='auto' (real BMP/PNG, numpy) or 'fake'") from e
        elif decoder not in ("auto", "fake"):
            raise ValueError(f"unknown decoder {decoder}")

    def _fake_features(self, blob: bytes) -> np.ndarray:
        # deterministic pseudo-features from a content digest
        digest = hashlib.sha256(blob).digest()
        seed = int.from_bytes(digest[:8], "little")
        rng = np.random.default_rng(seed)
        return rng.standard_normal(self.feature_dim).astype(np.float32)

    def _features(self, blob: bytes) -> np.ndarray:
        if self.decoder == "fake":
            return self._fake_features(blob)
        img = decode_image(blob)
        f = image_grid_features(img).astype(np.float32)
        if len(f) < self.feature_dim:
            f = np.pad(f, (0, self.feature_dim - len(f)))
        return f[:self.feature_dim]

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch.column("image").to_pylist()
        feats = [self._features(b or b"") for b in blobs]
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "feature": pa.array([f.tolist() for f in feats],
                                pa.list_(pa.float32(), self.feature_dim)),
            "n_bytes": pa.array([len(b or b"") for b in blobs], pa.int64()),
        })


class ImageResizer:
    """Actor-pool stage: BMP/PNG bytes -> resized BMP bytes (bilinear)."""

    def __init__(self, out_w: int = 64, out_h: int = 64):
        self.out_w, self.out_h = out_w, out_h

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .mm_codecs import encode_bmp
        out = []
        for b in batch.column("image").to_pylist():
            img = decode_image(b)
            out.append(encode_bmp(resize_bilinear(img, self.out_w,
                                                  self.out_h)))
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "image": pa.array(out, pa.binary()),
            "mime": pa.array(["image/bmp"] * len(out), pa.string()),
            "width": pa.array([self.out_w] * len(out), pa.int32()),
            "height": pa.array([self.out_h] * len(out), pa.int32()),
        })


class AudioFrameSampler:
    """Actor-pool stage: WAV bytes -> per-frame RMS energy rows
    (one row per (doc, frame)); ``decoder="fake"`` keeps the byte-mean
    plumbing path."""

    def __init__(self, decoder: str = "wav", frames_per_clip: int = 4):
        self.frames = frames_per_clip
        self.decoder = decoder
        if decoder not in ("wav", "fake"):
            raise NotImplementedError(
                "audio codecs beyond PCM WAV unavailable; use 'wav'/'fake'")

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids, frame_ids, energies = [], [], []
        for d, blob in zip(batch.column("doc_id").to_pylist(),
                           batch.column("audio").to_pylist()):
            blob = blob or b""
            if self.decoder == "wav":
                samples, _sr = decode_wav(blob)
                es = frame_energies(samples, self.frames)
            else:
                step = max(1, len(blob) // self.frames)
                es = [float(np.frombuffer(blob[f * step:(f + 1) * step],
                                          dtype=np.uint8)
                            .astype(np.float64).mean())
                      if blob[f * step:(f + 1) * step] else 0.0
                      for f in range(self.frames)]
            for f in range(self.frames):
                doc_ids.append(d)
                frame_ids.append(f)
                energies.append(float(es[f]))
        return pa.table({"doc_id": pa.array(doc_ids, pa.int64()),
                         "frame": pa.array(frame_ids, pa.int32()),
                         "energy": pa.array(energies, pa.float64())})


class AudioSpectrogram:
    """Actor-pool stage: WAV bytes -> flattened magnitude spectrogram
    summary (per-band mean over time) — batched FFT feature extraction."""

    def __init__(self, frame: int = 256, hop: int = 128, bands: int = 32):
        self.frame, self.hop, self.bands = frame, hop, bands

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = []
        for blob in batch.column("audio").to_pylist():
            samples, _sr = decode_wav(blob or b"")
            spec = spectrogram(samples, self.frame, self.hop)
            nb = spec.shape[1]
            edges = np.linspace(0, nb, self.bands + 1).astype(np.int64)
            band = np.array([spec[:, edges[i]:edges[i + 1]].mean()
                             if edges[i + 1] > edges[i] else 0.0
                             for i in range(self.bands)], dtype=np.float32)
            feats.append(band)
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "spec": pa.array([f.tolist() for f in feats],
                             pa.list_(pa.float32(), self.bands)),
        })


def image_features(ds_or_path, *, batch_size: int = 64,
                   decoder: str = "bmp") -> ray.data.Dataset:
    """image table -> feature table. Small batches: payloads are large."""
    ds = (ray.data.read_parquet(ds_or_path)
          if isinstance(ds_or_path, str) else ds_or_path)
    return ds.map_batches(
        ImageFeatureExtractor, fn_constructor_kwargs={"decoder": decoder},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=default_concurrency())


def image_resize(ds_or_path, out_w: int = 64, out_h: int = 64, *,
                 batch_size: int = 64) -> ray.data.Dataset:
    ds = (ray.data.read_parquet(ds_or_path)
          if isinstance(ds_or_path, str) else ds_or_path)
    return ds.map_batches(
        ImageResizer, fn_constructor_kwargs={"out_w": out_w, "out_h": out_h},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=default_concurrency())


def audio_frames(ds_or_path, *, batch_size: int = 64,
                 decoder: str = "wav") -> ray.data.Dataset:
    ds = (ray.data.read_parquet(ds_or_path)
          if isinstance(ds_or_path, str) else ds_or_path)
    return ds.map_batches(
        AudioFrameSampler, fn_constructor_kwargs={"decoder": decoder},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=default_concurrency())


def audio_spectrograms(ds_or_path, *, batch_size: int = 64) -> ray.data.Dataset:
    ds = (ray.data.read_parquet(ds_or_path)
          if isinstance(ds_or_path, str) else ds_or_path)
    return ds.map_batches(
        AudioSpectrogram, batch_format="pyarrow", batch_size=batch_size,
        concurrency=default_concurrency())


def synth_image_table(n: int, seed: int = 3, real: bool = True) -> pa.Table:
    """Deterministic image corpus. ``real=True``: actual encoded bytes
    (gradient + noise patterns), alternating BMP and PNG containers with
    the PNG filter type cycling 0..4 so every unfilter path runs
    end-to-end; ``real=False``: random blobs for plumbing tests."""
    from .mm_codecs import encode_bmp, encode_png
    rng = np.random.default_rng(seed)
    blobs, ws, hs, mimes = [], [], [], []
    for i in range(n):
        if real:
            w = int(rng.integers(16, 64))
            h = int(rng.integers(16, 64))
            yy, xx = np.mgrid[0:h, 0:w]
            img = np.stack([
                (xx * 255 // max(w - 1, 1)),
                (yy * 255 // max(h - 1, 1)),
                rng.integers(0, 256, (h, w)),
            ], axis=2).astype(np.uint8)
            if i % 2:
                blobs.append(encode_png(img, filter_type=(i // 2) % 5))
                mimes.append("image/png")
            else:
                blobs.append(encode_bmp(img))
                mimes.append("image/bmp")
        else:
            w = int(rng.integers(16, 512))
            h = int(rng.integers(16, 512))
            blobs.append(rng.integers(0, 256, size=int(rng.integers(512, 4096)),
                                      dtype=np.uint8).tobytes())
            mimes.append("image/fake")
        ws.append(w)
        hs.append(h)
    return pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "image": pa.array(blobs, pa.binary()),
        "mime": pa.array(mimes, pa.string()),
        "width": pa.array(np.asarray(ws, dtype=np.int32), pa.int32()),
        "height": pa.array(np.asarray(hs, dtype=np.int32), pa.int32()),
    })


def synth_audio_table(n: int, seed: int = 4, sr: int = 8000,
                      dur: float = 0.25) -> pa.Table:
    """Deterministic WAV corpus: sine + noise clips (real PCM16)."""
    from .mm_codecs import encode_wav
    rng = np.random.default_rng(seed)
    t = np.arange(int(sr * dur)) / sr
    blobs = []
    for i in range(n):
        f0 = float(rng.uniform(100, 2000))
        x = 0.6 * np.sin(2 * np.pi * f0 * t) \
            + 0.1 * rng.standard_normal(len(t))
        blobs.append(encode_wav(x, sr))
    return pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "audio": pa.array(blobs, pa.binary()),
    })


class VideoFrameSampler:
    """Actor-pool stage: encoded video bytes -> k evenly-sampled frames
    with per-frame grid features (one output row per (doc, frame)).

    ``decoder="gif"`` (default) decodes animated GIF89a clips for REAL
    (full GCE composition — transparency, partial frames, disposal —
    via ``mm_codecs.decode_gif_frames``); general containers (mp4 etc.)
    need av/ffmpeg, absent in this environment, so ``decoder="fake"``
    derives digest-seeded frames keeping the Ray-side plumbing (schema,
    batch size, actor signature, output layout) real and tested."""

    def __init__(self, n_frames: int = 4, decoder: str = "gif",
                 feature_dim: int = 64):
        if decoder not in ("gif", "fake"):
            raise NotImplementedError(
                "general video decode needs av/ffmpeg (not in this "
                "container); use decoder='gif' (real animated GIF) or "
                "'fake'")
        self.n = n_frames
        self.decoder = decoder
        self.feature_dim = feature_dim

    def _frames(self, blob: bytes) -> list:
        if self.decoder == "gif":
            from .mm_codecs import decode_gif_frames
            return decode_gif_frames(blob)
        digest = hashlib.sha256(blob).digest()
        rng = np.random.default_rng(int.from_bytes(digest[:8], "little"))
        return [rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
                for _ in range(max(self.n, 1))]

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids, frame_ids, feats, n_total = [], [], [], []
        for doc, blob in zip(batch.column("doc_id").to_pylist(),
                             batch.column("video").to_pylist()):
            frames = self._frames(blob or b"")
            # evenly-spaced sample of n frames (all, if clip is shorter)
            take = np.unique(np.linspace(0, len(frames) - 1,
                                         min(self.n, len(frames)))
                             .astype(np.int64))
            for fi in take:
                f = image_grid_features(frames[fi]).astype(np.float32)
                if len(f) < self.feature_dim:
                    f = np.pad(f, (0, self.feature_dim - len(f)))
                doc_ids.append(doc)
                frame_ids.append(int(fi))
                feats.append(f[:self.feature_dim].tolist())
                n_total.append(len(frames))
        return pa.table({
            "doc_id": pa.array(doc_ids, pa.int64()),
            "frame": pa.array(frame_ids, pa.int32()),
            "n_frames": pa.array(n_total, pa.int32()),
            "feature": pa.array(feats,
                                pa.list_(pa.float32(), self.feature_dim)),
        })


def synth_video_table(n: int, seed: int = 11, n_frames: int = 6) -> pa.Table:
    """Deterministic animated-GIF clip corpus (real encoded bytes:
    shared palette, moving-block frames)."""
    from .mm_codecs import encode_gif_animation
    rng = np.random.default_rng(seed)
    blobs, nf = [], []
    for i in range(n):
        h = int(rng.integers(12, 24))
        w = int(rng.integers(12, 24))
        pal = rng.integers(0, 256, size=(8, 3), dtype=np.uint8)
        k = int(rng.integers(2, n_frames + 1))
        frames = []
        for f in range(k):
            fr = np.zeros((h, w), dtype=np.uint8)
            y = (f * 3) % max(h - 4, 1)
            x = (f * 5) % max(w - 4, 1)
            fr[y:y + 4, x:x + 4] = 1 + (f % 7)
            frames.append(fr)
        blobs.append(encode_gif_animation(frames, pal))
        nf.append(k)
    return pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "video": pa.array(blobs, pa.binary()),
        "mime": pa.array(["image/gif"] * n, pa.string()),
        "n_frames": pa.array(nf, pa.int32()),
    })


def video_frame_features(ds_or_path, *, n_frames: int = 4,
                         batch_size: int = 16,
                         decoder: str = "gif") -> ray.data.Dataset:
    """video table -> one feature row per sampled (doc, frame). Small
    batches: clip payloads are large; decode state lives per actor."""
    ds = (ray.data.read_parquet(ds_or_path)
          if isinstance(ds_or_path, str) else ds_or_path)
    return ds.map_batches(
        VideoFrameSampler,
        fn_constructor_kwargs={"n_frames": n_frames, "decoder": decoder},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=default_concurrency())
