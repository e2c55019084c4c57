"""Multimodal column plumbing: binary payloads + typed metadata.

Image/audio/video payloads are opaque `binary` columns with a metadata
struct; decode / feature-extract / resize / frame-sample run as
actor-pool map_batches stages. Formats that need external libraries
(PNG/JPEG/MP4 — PIL/ffmpeg are NOT in this environment) are stubbed
behind `DecodeUnavailable` or a deterministic fake; formats that do not
(PPM P6 images, RIFF/WAV PCM16 audio) have REAL numpy decoders
(`decode_ppm` / `decode_wav`), real nearest-neighbor resize, and real
feature extraction (grid channel means / frame RMS + zero-crossings).
The Ray-side plumbing (schema, batch sizing for large blobs, actor
signature, output layout) is shared by both paths and tested
(tests/test_functions.py).

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
        # deterministic fake: blake2b-seeded values, unit-normalized.
        # blake2b caps digest_size at 64 bytes, so dims > 8 chain
        # counter-salted digests (the default feature_dim=16 crashed
        # with ValueError before)
        need = 8 * self.feature_dim
        chunks = []
        for i in range((need + 63) // 64):
            chunks.append(
                hashlib.blake2b(
                    payload or b"", digest_size=min(64, need - 64 * i),
                    salt=i.to_bytes(8, "big"),
                ).digest()
            )
        v = np.frombuffer(b"".join(chunks), dtype=np.uint64).astype(np.float64)
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


# ---------------------------------------------------- real codecs (no deps)


def encode_ppm(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> binary PPM (P6)."""
    h, w, _ = arr.shape
    return b"P6\n%d %d\n255\n" % (w, h) + arr.astype(np.uint8).tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6) -> (h, w, 3) uint8. Pure numpy; raises ValueError
    on malformed input (callers map that to DecodeUnavailable)."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    # header: magic, width, height, maxval — whitespace/comment separated
    tokens: list[bytes] = []
    i = 2
    while len(tokens) < 3:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":  # comment to end of line
            while i < len(payload) and payload[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        tokens.append(payload[i:j])
        i = j
    i += 1  # single whitespace after maxval
    w, h, maxval = int(tokens[0]), int(tokens[1]), int(tokens[2])
    if maxval != 255:
        raise ValueError("only maxval=255 PPM supported")
    data = np.frombuffer(payload, np.uint8, count=w * h * 3, offset=i)
    return data.reshape(h, w, 3)


def resize_nearest(arr: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize of an (h, w, c) image — index gather."""
    h, w = arr.shape[:2]
    ys = np.minimum((np.arange(out_h) * h) // out_h, h - 1)
    xs = np.minimum((np.arange(out_w) * w) // out_w, w - 1)
    return arr[ys[:, None], xs[None, :]]


def encode_wav(wave: np.ndarray, rate: int = 16000) -> bytes:
    """float [-1,1] mono -> RIFF/WAVE PCM16."""
    import struct

    pcm = np.clip(wave, -1.0, 1.0)
    pcm = (pcm * 32767.0).astype("<i2").tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(pcm), b"WAVE", b"fmt ", 16, 1, 1,
        rate, rate * 2, 2, 16, b"data", len(pcm),
    )
    return hdr + pcm


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM16 -> (float64 mono waveform in [-1,1], sample_rate).
    Multi-channel input is averaged to mono."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    i = 12
    fmt = None
    data = None
    while i + 8 <= len(payload):
        cid = payload[i : i + 4]
        (size,) = struct.unpack("<I", payload[i + 4 : i + 8])
        body = payload[i + 8 : i + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        i += 8 + size + (size & 1)
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, n_channels, rate, _, _, bits = fmt
    if audio_format != 1 or bits != 16:
        raise ValueError("only PCM16 WAV supported")
    pcm = np.frombuffer(data, "<i2").astype(np.float64) / 32767.0
    if n_channels > 1:
        pcm = pcm[: (pcm.size // n_channels) * n_channels]
        pcm = pcm.reshape(-1, n_channels).mean(axis=1)
    return pcm, rate


def image_grid_features(arr: np.ndarray, grid: int = 2) -> np.ndarray:
    """Per-cell per-channel means over a grid x grid partition plus
    global mean/std — a real, deterministic image descriptor
    (grid=2, RGB -> 14 dims)."""
    g = resize_nearest(arr, grid * 8, grid * 8).astype(np.float64) / 255.0
    cells = g.reshape(grid, 8, grid, 8, 3).mean(axis=(1, 3))  # (g, g, 3)
    return np.concatenate([cells.ravel(), [g.mean(), g.std()]])


def audio_frame_features(wave: np.ndarray, n_frames: int = 6) -> np.ndarray:
    """Per-frame RMS + global zero-crossing rate — a real audio
    descriptor (n_frames + 1 dims)."""
    if wave.size == 0:
        return np.zeros(n_frames + 1)
    step = max(1, wave.size // n_frames)
    rms = np.array(
        [
            np.sqrt((wave[f * step : (f + 1) * step] ** 2).mean())
            if wave[f * step : (f + 1) * step].size
            else 0.0
            for f in range(n_frames)
        ]
    )
    zcr = float((np.diff(np.sign(wave)) != 0).mean()) if wave.size > 1 else 0.0
    return np.concatenate([rms, [zcr]])


class PPMImageDecoder:
    """Actor-pool stage with a REAL decode path: PPM payloads decode to
    pixel arrays, resize nearest-neighbor, and emit grid-mean features;
    non-PPM formats raise DecodeUnavailable (fail fast, per batch)."""

    def __init__(self, grid: int = 2, resize_to: int | None = None):
        self.grid = grid
        self.resize_to = resize_to

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = []
        for fmt, payload in zip(
            batch["format"].to_pylist(), batch["payload"].to_pylist()
        ):
            if fmt != "ppm":
                raise DecodeUnavailable(f"no decoder for format {fmt!r}")
            arr = decode_ppm(payload)
            if self.resize_to:
                arr = resize_nearest(arr, self.resize_to, self.resize_to)
            feats.append(image_grid_features(arr, self.grid))
        dim = self.grid * self.grid * 3 + 2
        mat = np.stack(feats) if feats else np.empty((0, dim))
        flat = pa.array(mat.ravel(), pa.float32())
        offs = pa.array(np.arange(0, (len(feats) + 1) * dim, dim, dtype=np.int32))
        return pa.table(
            {
                "media_id": batch["media_id"],
                "features": pa.ListArray.from_arrays(offs, flat),
            }
        )


class WavAudioDecoder:
    """Actor-pool stage: REAL RIFF/WAV PCM16 decode -> frame-RMS +
    zero-crossing features."""

    def __init__(self, n_frames: int = 6):
        self.n_frames = n_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = []
        rates = []
        for fmt, payload in zip(
            batch["format"].to_pylist(), batch["payload"].to_pylist()
        ):
            if fmt != "wav":
                raise DecodeUnavailable(f"no decoder for format {fmt!r}")
            wave, rate = decode_wav(payload)
            rates.append(rate)
            feats.append(audio_frame_features(wave, self.n_frames))
        dim = self.n_frames + 1
        mat = np.stack(feats) if feats else np.empty((0, dim))
        flat = pa.array(mat.ravel(), pa.float32())
        offs = pa.array(np.arange(0, (len(feats) + 1) * dim, dim, dtype=np.int32))
        return pa.table(
            {
                "media_id": batch["media_id"],
                "sample_rate": pa.array(rates, pa.int32()),
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
    Small batch_size on purpose: payload rows are wide. `kind` routes
    to the matching decoder (it was silently ignored before)."""
    if kind == "image":
        cls, kwargs = ImageDecoder, {"feature_dim": feature_dim}
    elif kind == "audio":
        cls, kwargs = WavAudioDecoder, {}
    else:
        raise ValueError(f"unknown media kind {kind!r}")
    return ds.map_batches(
        cls,
        fn_constructor_kwargs=kwargs,
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
