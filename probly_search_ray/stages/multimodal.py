"""Multimodal column plumbing (image/audio as opaque binary + metadata).

The decode kernels themselves are STUBBED — image/audio libraries are
not available in this environment — but the Ray-side plumbing is real
and tested: schemas, actor-pool stages with per-actor setup, batch
sizing for large binary payloads, and deterministic fake feature
extraction so downstream pipelines (dedup by perceptual hash, feature
stats) can run end-to-end.

Swap ``decode=...`` for a real decoder (PIL / torchaudio) in
production; nothing else changes.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("kind", pa.string()),          # "image" | "audio"
    ("payload", pa.binary()),       # opaque encoded bytes
    ("width", pa.int32()),          # metadata (typed, queryable)
    ("height", pa.int32()),
    ("sample_rate", pa.int32()),
])


def synth_media_table(n: int, seed: int = 3) -> pa.Table:
    """Deterministic fake media rows for tests/benches."""
    rng = np.random.default_rng(seed)
    kinds = np.where(rng.integers(0, 2, n) == 0, "image", "audio")
    payloads = [rng.integers(0, 256, size=int(rng.integers(64, 512)),
                             dtype=np.uint8).tobytes() for _ in range(n)]
    return pa.table({
        "media_id": pa.array(np.arange(n, dtype=np.int64)),
        "kind": pa.array(kinds.astype(object), type=pa.string()),
        "payload": pa.array(payloads, type=pa.binary()),
        "width": pa.array(rng.integers(16, 256, n).astype(np.int32)),
        "height": pa.array(rng.integers(16, 256, n).astype(np.int32)),
        "sample_rate": pa.array(
            np.where(kinds == "audio", 16000, 0).astype(np.int32)),
    }, schema=MEDIA_SCHEMA)


def _fake_decode(payload: bytes, kind: str) -> np.ndarray:
    """Deterministic stand-in for a real decoder: hashes payload bytes
    into a fixed-size float feature vector."""
    raw = np.frombuffer(payload, dtype=np.uint8)
    out = np.zeros(16, dtype=np.float64)
    idx = np.arange(len(raw)) % 16
    np.add.at(out, idx, raw.astype(np.float64))
    return out / max(len(raw), 1)


class MediaFeatures:
    """Actor-pool stage: decode + feature-extract media payloads.

    ``__init__`` is where a real model/codec would load (once per
    actor); with ``real_decode=True`` it raises NotImplementedError to
    mark the stub boundary explicitly.
    Use small ``batch_size`` (e.g. 64) — payloads are large binaries.
    """

    def __init__(self, real_decode: bool = False):
        if real_decode:
            raise NotImplementedError(
                "real image/audio decoding requires PIL/torchaudio, "
                "not available in this environment — plug them in here")
        self.decode = _fake_decode

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        kinds = batch["kind"].to_pylist()
        feats = np.stack([self.decode(p, k) for p, k in zip(payloads, kinds)])
        return pa.table({
            "media_id": batch["media_id"],
            "kind": batch["kind"],
            "feature": pa.array(list(feats), type=pa.list_(pa.float64())),
            "feat_norm": pa.array(np.round(np.linalg.norm(feats, axis=1), 6)),
        })


def media_feature_pipeline(media_ds, concurrency: int = 2,
                           batch_size: int = 64):
    """documents-in → features-out; actor pool with per-actor decoder
    state, small batches for large payloads."""
    return media_ds.map_batches(
        MediaFeatures, batch_format="pyarrow",
        batch_size=batch_size, concurrency=concurrency)
