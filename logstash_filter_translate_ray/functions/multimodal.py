"""Multimodal columns: opaque ``binary`` payloads + typed metadata.

The image/audio codec libraries are NOT available in this environment, so
the decode kernels are STUBS behind ``use_real_codecs`` — clearly marked
``NotImplementedError`` — while everything Ray-side (schema, actor-pool
signature, batch sizing, output layout) is real and tested with the
deterministic fake decoder.

Design notes for 100 TB: binary payloads dominate block size, so these
stages run with SMALL ``batch_size`` (default 64) and an actor pool whose
``__init__`` would hold the codec/model; blocks stay Arrow end-to-end
(binary columns do not survive pandas round-trips well — see guide
pitfalls).
"""

from __future__ import annotations

import zlib
from typing import Optional

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("payload", pa.binary()),
    ("media_type", pa.string()),     # "image" | "audio" | "video"
    ("width", pa.int32()),           # typed metadata (nullable)
    ("height", pa.int32()),
    ("sample_rate", pa.int32()),
])

DEFAULT_MEDIA_BATCH_SIZE = 64


def make_fake_media(n: int, seed: int = 42, payload_size: int = 4096) -> pa.Table:
    """Deterministic synthetic media table for tests/benchmarks."""
    rng = np.random.RandomState(seed)
    payloads = [rng.randint(0, 256, payload_size).astype(np.uint8).tobytes()
                for _ in range(n)]
    types = np.array(["image", "audio", "video"])[rng.randint(0, 3, n)]
    return pa.table({
        "media_id": pa.array(np.arange(n), type=pa.int64()),
        "payload": pa.array(payloads, type=pa.binary()),
        "media_type": pa.array(types.astype(object), type=pa.string()),
        "width": pa.array(rng.randint(16, 512, n), type=pa.int32()),
        "height": pa.array(rng.randint(16, 512, n), type=pa.int32()),
        "sample_rate": pa.array(rng.choice([8000, 16000, 44100], n),
                                type=pa.int32()),
    }, schema=MEDIA_SCHEMA)


class DecodeFeatureStage:
    """Actor-pool decode/feature-extract stage.

    ``__init__`` is where a real build would load codecs / feature models
    (once per actor). ``__call__`` emits per-payload feature columns:
    byte size, crc32 digest, and a deterministic 8-dim "embedding"
    (a real decoder would replace ``_fake_features``).
    """

    def __init__(self, use_real_codecs: bool = False):
        if use_real_codecs:
            raise NotImplementedError(
                "image/audio codec libraries are not available in this "
                "environment; run with use_real_codecs=False (deterministic "
                "fake decode) — the Ray plumbing is identical")
        self.use_real = use_real_codecs

    @staticmethod
    def _fake_features(payload: bytes) -> np.ndarray:
        # deterministic: crc of 8 stripes of the payload, scaled to [0, 1)
        n = max(1, len(payload) // 8)
        return np.array([zlib.crc32(payload[i * n:(i + 1) * n]) % 1000 / 1000.0
                         for i in range(8)], dtype=np.float32)

    def __call__(self, tbl: pa.Table) -> pa.Table:
        from .text import md5_lower64
        payloads = tbl["payload"].to_pylist()
        sizes = np.array([len(p or b"") for p in payloads], dtype=np.int64)
        # md5-lower64 (== DuckDB md5_number_lower) so the digest column is
        # SQL-verifiable when payloads derive from a registered table
        digests = np.array([md5_lower64(p or b"") for p in payloads],
                           dtype=np.uint64)
        feats = [self._fake_features(p or b"") for p in payloads]
        tbl = tbl.append_column("payload_bytes", pa.array(sizes))
        tbl = tbl.append_column("payload_digest", pa.array(digests))
        tbl = tbl.append_column(
            "features", pa.array([f.tolist() for f in feats],
                                 type=pa.list_(pa.float32())))
        return tbl


class ResizeStage:
    """Image resize stub: recomputes typed metadata (the real pixel work is
    behind the codec gate); passes payload through untouched."""

    def __init__(self, max_side: int = 256, use_real_codecs: bool = False):
        if use_real_codecs:
            raise NotImplementedError("codec libraries unavailable — stub only")
        self.max_side = max_side

    def __call__(self, tbl: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        w = tbl["width"].to_numpy(zero_copy_only=False).astype(np.float64)
        h = tbl["height"].to_numpy(zero_copy_only=False).astype(np.float64)
        scale = np.minimum(1.0, self.max_side / np.maximum(w, h))
        tbl = tbl.append_column("resized_width",
                                pa.array((w * scale).astype(np.int32)))
        tbl = tbl.append_column("resized_height",
                                pa.array((h * scale).astype(np.int32)))
        return tbl


def frame_sample_plan(n_frames: int, every: int = 10) -> list[int]:
    """Deterministic frame-sampling plan for video payloads (stub for the
    per-frame decode, real at the planning level)."""
    return list(range(0, n_frames, every))


def decode_features_dataset(ds, concurrency: int = 2,
                            batch_size: int = DEFAULT_MEDIA_BATCH_SIZE):
    return ds.map_batches(DecodeFeatureStage, batch_format="pyarrow",
                          batch_size=batch_size, concurrency=concurrency)


def resize_dataset(ds, max_side: int = 256, concurrency: int = 2,
                   batch_size: int = DEFAULT_MEDIA_BATCH_SIZE):
    return ds.map_batches(ResizeStage,
                          fn_constructor_kwargs=dict(max_side=max_side),
                          batch_format="pyarrow", batch_size=batch_size,
                          concurrency=concurrency)
