"""Multimodal column stages: image/audio/video as opaque binary columns.

The decode libraries (PIL/ffmpeg/torchaudio) are not in this container, so
the *codec* step is stubbed — ``DETERMINISTIC_FAKE`` produces a seeded fake
"decoded" tensor from the payload bytes, ``STRICT`` raises
NotImplementedError — but all the Ray-side plumbing is real and tested:
typed schema (binary payload + metadata struct columns), actor-pool
map_batches stages with per-actor setup, small batch sizes for large
payloads, and a stable output layout (fixed-size feature vectors).

At 100 TB these stages are the canonical actor-pool pattern: model/codec
loaded once per actor in __init__, ``batch_size`` sized so
payload x batch x concurrency fits worker heaps.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("kind", pa.string()),          # image | audio | video
    ("payload", pa.binary()),       # opaque encoded bytes
    ("width", pa.int32()),          # metadata travels as typed columns
    ("height", pa.int32()),
    ("sample_rate", pa.int32()),
    ("n_frames", pa.int32()),
])

DETERMINISTIC_FAKE = "fake"
STRICT = "strict"


def synthesize_media(n: int = 64, seed: int = 42) -> pa.Table:
    """Deterministic fake media table for tests (payload = seeded bytes)."""
    rng = np.random.default_rng(seed)
    kinds = np.array(["image", "audio", "video"])[rng.integers(0, 3, n)]
    payloads = [rng.integers(0, 256, int(rng.integers(64, 4096)),
                             dtype=np.uint8).tobytes() for _ in range(n)]
    return pa.table({
        "media_id": pa.array(np.arange(n), type=pa.int64()),
        "kind": pa.array(kinds.tolist(), type=pa.string()),
        "payload": pa.array(payloads, type=pa.binary()),
        "width": pa.array(rng.integers(16, 512, n).astype(np.int32)),
        "height": pa.array(rng.integers(16, 512, n).astype(np.int32)),
        "sample_rate": pa.array(np.full(n, 16000, dtype=np.int32)),
        "n_frames": pa.array(rng.integers(1, 300, n).astype(np.int32)),
    }).cast(MEDIA_SCHEMA)


class MediaDecoder:
    """Actor-pool stage: decode payload -> fixed-size feature vector.

    ``mode=DETERMINISTIC_FAKE`` derives a seeded feature vector from the
    payload digest (stable across runs/workers). ``mode=STRICT`` raises —
    plug a real decoder (PIL.Image.open / soundfile / pyav) here.
    """

    FEATURE_DIM = 32

    def __init__(self, mode: str = DETERMINISTIC_FAKE):
        self.mode = mode
        # real decoders would be constructed here, once per actor:
        # self.image_decoder = PIL.Image; self.resampler = ...
        if mode not in (DETERMINISTIC_FAKE, STRICT):
            raise ValueError(mode)

    def _decode_one(self, kind: str, payload: bytes) -> np.ndarray:
        if self.mode == STRICT:
            raise NotImplementedError(
                f"no {kind} codec in this environment; install PIL/ffmpeg "
                "and implement _decode_one"
            )
        digest = hashlib.sha256(payload).digest()
        seed = int.from_bytes(digest[:8], "little")
        rng = np.random.default_rng(seed)
        return rng.standard_normal(self.FEATURE_DIM).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        kinds = batch.column("kind").to_pylist()
        payloads = batch.column("payload").to_pylist()
        feats = np.vstack([
            self._decode_one(k, p) for k, p in zip(kinds, payloads)
        ]) if batch.num_rows else np.empty((0, self.FEATURE_DIM), np.float32)
        flat = pa.array(feats.ravel(), type=pa.float32())
        offsets = pa.array(
            np.arange(0, (batch.num_rows + 1) * self.FEATURE_DIM,
                      self.FEATURE_DIM, dtype=np.int32))
        return pa.table({
            "media_id": batch.column("media_id"),
            "kind": batch.column("kind"),
            "payload_bytes": pa.array(
                [len(p) for p in payloads], type=pa.int64()),
            "features": pa.ListArray.from_arrays(offsets, flat),
        })


class FrameSampler:
    """Video stage: pick every ``stride``-th frame index (metadata-only here;
    a real implementation would pyav-decode just those frames)."""

    def __init__(self, stride: int = 30):
        self.stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        n_frames = batch.column("n_frames").to_numpy(zero_copy_only=False)
        idx_lists = [list(range(0, int(n), self.stride)) for n in n_frames]
        return pa.table({
            "media_id": batch.column("media_id"),
            "sampled_frames": pa.array(idx_lists, type=pa.list_(pa.int32())),
            "n_sampled": pa.array([len(x) for x in idx_lists], type=pa.int64()),
        })


def decode_media_dataset(ds, mode: str = DETERMINISTIC_FAKE, batch_size: int = 16,
                         concurrency: int | None = None):
    """The canonical actor-pool wiring: small batches (large payloads),
    decoder constructed once per actor."""
    if concurrency is None:
        from ..pipelines.encode import _default_concurrency

        concurrency = min(4, _default_concurrency())
    return ds.map_batches(
        MediaDecoder,
        fn_constructor_kwargs={"mode": mode},
        batch_size=batch_size,
        batch_format="pyarrow",
        concurrency=concurrency,
        num_cpus=1,
    )
