"""Multimodal column plumbing: binary payloads + typed metadata.

Image/audio/video payloads are opaque `binary` columns with a metadata
struct; decode / feature-extract / resize / frame-sample run as
actor-pool map_batches stages. The decode libraries (PIL/ffmpeg/etc.)
are NOT in this environment, so the actual decode is stubbed behind
`DecodeUnavailable` or a deterministic fake — but the Ray-side plumbing
(schema, batch sizing for large blobs, actor signature, output layout)
is real and tested (tests/test_functions.py).

Design notes for 100 TB: binary rows are wide — these stages must run
with small `batch_size` and `target_max_block_size` tuned so
batch x concurrency fits worker heaps; outputs (features) are narrow and
re-block upstream of any shuffle.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),  # image | audio | video
        ("format", pa.string()),  # png/jpeg/wav/mp4/...
        ("payload", pa.binary()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)


class DecodeUnavailable(NotImplementedError):
    """Raised when a real decoder is required but not installed."""


class ImageDecoder:
    """Actor-pool stage: decode image bytes -> fixed-size float features.

    With no imaging library in this container, `fake=True` (default)
    derives a deterministic feature vector from the payload bytes so the
    distributed plumbing is fully exercisable; `fake=False` raises
    DecodeUnavailable at __init__ (fail fast, once per actor).
    """

    def __init__(self, feature_dim: int = 16, fake: bool = True):
        if not fake:
            try:
                import PIL.Image  # noqa: F401
            except ImportError as e:
                raise DecodeUnavailable("no imaging library installed") from e
        self.feature_dim = feature_dim
        self.fake = fake

    def _features(self, payload: bytes) -> np.ndarray:
        # deterministic fake: blake2b-seeded values, unit-normalized
        h = hashlib.blake2b(payload or b"", digest_size=8 * self.feature_dim).digest()
        v = np.frombuffer(h, dtype=np.uint64).astype(np.float64)
        v = (v / 2.0**64) * 2 - 1
        n = np.linalg.norm(v)
        return v / n if n else v

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [self._features(p) for p in batch["payload"].to_pylist()]
        mat = np.stack(feats) if feats else np.empty((0, self.feature_dim))
        flat = pa.array(mat.ravel(), pa.float32())
        offs = pa.array(
            np.arange(0, (len(feats) + 1) * self.feature_dim, self.feature_dim,
                      dtype=np.int32)
        )
        return pa.table(
            {
                "media_id": batch["media_id"],
                "kind": batch["kind"],
                "features": pa.ListArray.from_arrays(offs, flat),
            }
        )


class FrameSampler:
    """Actor-pool stage: sample N 'frames' from video payloads.

    Fake decode: frames are deterministic byte slices; real decode would
    seek keyframes. Output is exploded (media_id, frame_idx, frame_bytes)
    — a flat_map-shaped batch fn (one input row -> N output rows).
    """

    def __init__(self, n_frames: int = 4, fake: bool = True):
        if not fake:
            raise DecodeUnavailable("no video library installed")
        self.n_frames = n_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, idxs, frames = [], [], []
        for mid, payload in zip(
            batch["media_id"].to_pylist(), batch["payload"].to_pylist()
        ):
            data = payload or b""
            step = max(1, len(data) // self.n_frames)
            for f in range(self.n_frames):
                ids.append(mid)
                idxs.append(f)
                frames.append(data[f * step : (f + 1) * step])
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "frame_idx": pa.array(idxs, pa.int32()),
                "frame_bytes": pa.array(frames, pa.binary()),
            }
        )


def decode_features(ds, kind: str = "image", feature_dim: int = 16,
                    concurrency=(1, 2), batch_size: int = 64):
    """Media dataset -> feature dataset via the actor-pool decoder.
    Small batch_size on purpose: payload rows are wide."""
    return ds.map_batches(
        ImageDecoder,
        fn_constructor_kwargs={"feature_dim": feature_dim},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def make_fake_media_table(n: int = 32, seed: int = 89) -> pa.Table:
    """Deterministic synthetic media table for tests."""
    rng = np.random.Generator(np.random.PCG64(seed))
    kinds = ["image", "audio", "video"]
    rows = {
        "media_id": list(range(n)),
        "kind": [kinds[i % 3] for i in range(n)],
        "format": ["png" if i % 3 == 0 else "wav" if i % 3 == 1 else "mp4" for i in range(n)],
        "payload": [rng.bytes(128 + int(rng.integers(0, 512))) for _ in range(n)],
        "width": [64] * n,
        "height": [64] * n,
        "duration_ms": [0 if i % 3 == 0 else 1000 for i in range(n)],
    }
    return pa.table(
        {
            "media_id": pa.array(rows["media_id"], pa.int64()),
            "kind": pa.array(rows["kind"], pa.string()),
            "format": pa.array(rows["format"], pa.string()),
            "payload": pa.array(rows["payload"], pa.binary()),
            "width": pa.array(rows["width"], pa.int32()),
            "height": pa.array(rows["height"], pa.int32()),
            "duration_ms": pa.array(rows["duration_ms"], pa.int32()),
        }
    )
