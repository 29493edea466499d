"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed by actor-pool map_batches stages.

The container ships no image/audio codecs, so the *decode kernels* are
stubs: ``decoder="fake"`` (default) derives deterministic features from
the bytes themselves — making the Ray-side plumbing (schema, batch
sizing, actor signatures, output layout) real and testable — while
``decoder="pil"`` / ``decoder="soundfile"`` raise NotImplementedError
until the real libraries are present (import-gated).

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

IMAGE_SCHEMA = pa.schema([
    ("doc_id", pa.int64()),
    ("image", pa.binary()),       # opaque encoded bytes
    ("mime", pa.string()),
    ("width", pa.int32()),        # typed metadata travels with the blob
    ("height", pa.int32()),
])


class ImageFeatureExtractor:
    """Actor-pool stage: encoded image bytes -> fixed-size feature vector.

    Real decoders load once per actor in ``__init__`` (model/codec the
    expensive part); ``__call__`` is per batch.
    """

    def __init__(self, decoder: str = "fake", feature_dim: int = 64):
        self.feature_dim = feature_dim
        self.decoder = decoder
        if decoder == "pil":
            try:
                from PIL import Image  # noqa: F401
                self._pil = Image
            except ImportError as e:
                raise NotImplementedError(
                    "PIL not available in this environment; use decoder='fake' "
                    "for plumbing tests") from e
        elif decoder != "fake":
            raise ValueError(f"unknown decoder {decoder}")

    def _fake_features(self, blob: bytes) -> np.ndarray:
        # deterministic pseudo-features from a content digest
        digest = hashlib.sha256(blob).digest()
        seed = int.from_bytes(digest[:8], "little")
        rng = np.random.default_rng(seed)
        return rng.standard_normal(self.feature_dim).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch.column("image").to_pylist()
        if self.decoder == "fake":
            feats = [self._fake_features(b or b"") for b in blobs]
        else:  # pragma: no cover - real decoder path
            raise NotImplementedError("real image decode is a stub in this env")
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "feature": pa.array([f.tolist() for f in feats],
                                pa.list_(pa.float32(), self.feature_dim)),
            "n_bytes": pa.array([len(b or b"") for b in blobs], pa.int64()),
        })


class AudioFrameSampler:
    """Actor-pool stage: audio bytes -> sampled frame stats (stub kernel,
    real plumbing). Output: one row per (doc, frame)."""

    def __init__(self, decoder: str = "fake", frames_per_clip: int = 4):
        self.frames = frames_per_clip
        if decoder != "fake":
            raise NotImplementedError("audio codecs unavailable; use 'fake'")

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids, frame_ids, energies = [], [], []
        for d, blob in zip(batch.column("doc_id").to_pylist(),
                           batch.column("audio").to_pylist()):
            blob = blob or b""
            step = max(1, len(blob) // self.frames)
            for f in range(self.frames):
                chunk = blob[f * step:(f + 1) * step]
                doc_ids.append(d)
                frame_ids.append(f)
                energies.append(float(np.frombuffer(
                    chunk, dtype=np.uint8).astype(np.float64).mean())
                    if chunk else 0.0)
        return pa.table({"doc_id": pa.array(doc_ids, pa.int64()),
                         "frame": pa.array(frame_ids, pa.int32()),
                         "energy": pa.array(energies, pa.float64())})


def image_features(ds_or_path, *, batch_size: int = 64,
                   decoder: str = "fake") -> ray.data.Dataset:
    """image table -> feature table. Small batches: payloads are large."""
    ds = (ray.data.read_parquet(ds_or_path)
          if isinstance(ds_or_path, str) else ds_or_path)
    return ds.map_batches(
        ImageFeatureExtractor, fn_constructor_kwargs={"decoder": decoder},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=default_concurrency())


def audio_frames(ds_or_path, *, batch_size: int = 64) -> ray.data.Dataset:
    ds = (ray.data.read_parquet(ds_or_path)
          if isinstance(ds_or_path, str) else ds_or_path)
    return ds.map_batches(
        AudioFrameSampler, batch_format="pyarrow", batch_size=batch_size,
        concurrency=default_concurrency())


def synth_image_table(n: int, seed: int = 3) -> pa.Table:
    """Deterministic fake image corpus for plumbing tests."""
    rng = np.random.default_rng(seed)
    blobs = [rng.integers(0, 256, size=int(rng.integers(512, 4096)),
                          dtype=np.uint8).tobytes() for _ in range(n)]
    return pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "image": pa.array(blobs, pa.binary()),
        "mime": pa.array(["image/fake"] * n, pa.string()),
        "width": pa.array(rng.integers(16, 512, n).astype(np.int32), pa.int32()),
        "height": pa.array(rng.integers(16, 512, n).astype(np.int32), pa.int32()),
    })
