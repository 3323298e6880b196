"""Multimodal columns: image/audio as opaque binary + typed metadata.

Unlike round 1's declared stub, the decode step is now a REAL codec
for two self-describing uncompressed formats that need only numpy:

- images: binary P6 PPM (``P6\\nW H\\n255\\n`` + RGB24 bytes) —
  decoded with a real header parser, nearest-neighbor resized, and
  reduced to luminance-histogram features;
- audio: PCM16 with a minimal 12-byte header (``PCM1`` + rate +
  n_samples) — decoded to int16 samples, framed (frame/hop), and
  reduced to per-frame RMS energy features.

Compressed formats (JPEG/PNG/FLAC…) go through the same entry points
when PIL / soundfile are importable; in this container they are not,
so ``decode_image`` raises a clear NotImplementedError for them — the
boundary is the *format*, not the pipeline.

Ray shape: the feature stage is an actor pool (codec/model state built
once per actor in ``__init__``), small ``batch_size`` because payloads
are large binaries, zero-copy Arrow in/out.
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

try:  # real JPEG/PNG path when available (not in this container)
    from PIL import Image as _PIL_Image  # noqa: F401
    _HAVE_PIL = True
except ImportError:
    _HAVE_PIL = False


# -- codecs ----------------------------------------------------------------

def encode_ppm(rgb: np.ndarray) -> bytes:
    """(h, w, 3) uint8 → binary P6 PPM."""
    h, w, _ = rgb.shape
    return b"P6\n%d %d\n255\n" % (w, h) + rgb.astype(np.uint8).tobytes()


def decode_image(payload: bytes) -> np.ndarray:
    """Encoded image bytes → (h, w, 3) uint8.  P6 PPM natively; other
    formats require PIL."""
    if payload[:2] == b"P6":
        # header: magic, whitespace, W, H, maxval, single whitespace
        parts = payload.split(b"\n", 3)
        w, h = (int(x) for x in parts[1].split())
        data = parts[3]
        return np.frombuffer(data[: w * h * 3], dtype=np.uint8) \
            .reshape(h, w, 3)
    if _HAVE_PIL:
        import io
        return np.asarray(_PIL_Image.open(io.BytesIO(payload)).convert("RGB"))
    raise NotImplementedError(
        "compressed image formats need PIL, which is unavailable here; "
        "P6 PPM payloads are decoded natively")


def resize_nearest(rgb: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize (pure numpy indexing)."""
    h, w, _ = rgb.shape
    yi = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xi = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return rgb[yi][:, xi]


def encode_pcm16(samples: np.ndarray, rate: int) -> bytes:
    """int16 samples → PCM1 container (magic, rate, count, payload)."""
    head = b"PCM1" + np.array([rate, len(samples)], np.int32).tobytes()
    return head + samples.astype("<i2").tobytes()


def decode_audio(payload: bytes) -> tuple[np.ndarray, int]:
    """PCM1 bytes → (int16 samples, sample_rate)."""
    if payload[:4] != b"PCM1":
        raise NotImplementedError(
            "compressed audio needs soundfile/torchaudio (unavailable); "
            "PCM1 payloads are decoded natively")
    rate, n = np.frombuffer(payload[4:12], dtype=np.int32)
    return np.frombuffer(payload[12:12 + 2 * n], dtype="<i2"), int(rate)


def frame_rms(samples: np.ndarray, frame: int = 512,
              hop: int = 256) -> np.ndarray:
    """Per-frame RMS energy (the audio 'frame-sample' op), vectorized
    via stride tricks."""
    x = samples.astype(np.float64) / 32768.0
    if len(x) < frame:
        x = np.pad(x, (0, frame - len(x)))
    nf = 1 + (len(x) - frame) // hop
    idx = np.arange(frame)[None, :] + hop * np.arange(nf)[:, None]
    return np.sqrt((x[idx] ** 2).mean(axis=1))


# -- synthetic media -------------------------------------------------------

def synth_media_table(n: int, seed: int = 3) -> pa.Table:
    """Deterministic media rows with REAL encoded payloads (P6 / PCM1)."""
    rng = np.random.default_rng(seed)
    kinds = np.where(rng.integers(0, 2, n) == 0, "image", "audio")
    payloads, widths, heights, rates = [], [], [], []
    for i in range(n):
        if kinds[i] == "image":
            h, w = (int(x) for x in rng.integers(8, 48, 2))
            payloads.append(encode_ppm(
                rng.integers(0, 256, (h, w, 3), dtype=np.uint8)))
            widths.append(w)
            heights.append(h)
            rates.append(0)
        else:
            ns = int(rng.integers(1000, 4000))
            payloads.append(encode_pcm16(
                rng.integers(-3000, 3000, ns).astype(np.int16), 16000))
            widths.append(0)
            heights.append(0)
            rates.append(16000)
    return pa.table({
        "media_id": pa.array(np.arange(n, dtype=np.int64)),
        "kind": pa.array(kinds.astype(object), type=pa.string()),
        "payload": pa.array(payloads, type=pa.binary()),
        "width": pa.array(np.asarray(widths, np.int32)),
        "height": pa.array(np.asarray(heights, np.int32)),
        "sample_rate": pa.array(np.asarray(rates, np.int32)),
    }, schema=MEDIA_SCHEMA)


def media_from_documents(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Derive a deterministic media table from the documents table —
    text bytes rendered into a PPM 'image' — so multimodal pipelines
    have a driver-table input without external data."""
    ids = batch["doc_id"].to_numpy()
    texts = batch[text_col].to_pylist()
    payloads, widths, heights = [], [], []
    for t in texts:
        # null text ⇒ empty doc (the tokenizer contract) ⇒ black image
        raw = np.frombuffer((t or "").encode(), dtype=np.uint8)
        w = 16
        h = max(1, min(32, (len(raw) + w * 3 - 1) // (w * 3)))
        need = h * w * 3
        px = np.resize(raw, need) if len(raw) else np.zeros(need, np.uint8)
        payloads.append(encode_ppm(px.reshape(h, w, 3)))
        widths.append(w)
        heights.append(h)
    n = len(ids)
    return pa.table({
        "media_id": pa.array(ids.astype(np.int64)),
        "kind": pa.array(["image"] * n, type=pa.string()),
        "payload": pa.array(payloads, type=pa.binary()),
        "width": pa.array(np.asarray(widths, np.int32)),
        "height": pa.array(np.asarray(heights, np.int32)),
        "sample_rate": pa.array(np.zeros(n, np.int32)),
    }, schema=MEDIA_SCHEMA)


# -- feature stage ---------------------------------------------------------

class MediaFeatures:
    """Actor-pool stage: decode + resize/frame + feature-extract.

    ``__init__`` holds the per-actor state (codec dispatch, target
    size) — the place a real model would load once per actor.
    Use small ``batch_size`` (e.g. 64): payloads are large binaries.
    """

    def __init__(self, image_size: int = 16, frame: int = 512,
                 hop: int = 256):
        from probly_search_ray.functions.mem import tune_allocator
        tune_allocator()
        self.image_size = image_size
        self.frame = frame
        self.hop = hop

    def _image_features(self, payload: bytes) -> np.ndarray:
        rgb = decode_image(payload)
        small = resize_nearest(rgb, self.image_size, self.image_size)
        lum = (0.299 * small[..., 0] + 0.587 * small[..., 1]
               + 0.114 * small[..., 2])
        hist, _ = np.histogram(lum, bins=8, range=(0, 256))
        mean_rgb = small.reshape(-1, 3).mean(axis=0)
        return np.concatenate((mean_rgb, hist / hist.sum(),
                               [lum.mean(), lum.std()])) / 256.0

    def _audio_features(self, payload: bytes) -> np.ndarray:
        samples, rate = decode_audio(payload)
        rms = frame_rms(samples, self.frame, self.hop)
        hist, _ = np.histogram(rms, bins=8, range=(0, 0.2))
        return np.concatenate((
            [rms.mean(), rms.max(), float(len(samples)) / max(rate, 1)],
            hist / max(hist.sum(), 1),
            [0.0, 0.0]))

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        kinds = batch["kind"].to_pylist()
        feats = np.stack([
            self._image_features(p) if k == "image"
            else self._audio_features(p)
            for p, k in zip(payloads, kinds)])
        return pa.table({
            "media_id": batch["media_id"],
            "kind": batch["kind"],
            "feature": pa.array(list(feats), type=pa.list_(pa.float64())),
            "feat_norm": pa.array(np.round(np.linalg.norm(feats, axis=1), 6)),
        })


def media_feature_pipeline(media_ds, concurrency=None,
                           batch_size: int = 64):
    """media-in → features-out; actor pool with per-actor decoder
    state, small batches for large payloads."""
    from probly_search_ray.functions.sizing import auto_pool
    return media_ds.map_batches(
        MediaFeatures, batch_format="pyarrow",
        batch_size=batch_size, concurrency=concurrency or auto_pool())
