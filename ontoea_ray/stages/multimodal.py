"""Multimodal columns: image/audio/video as opaque ``binary`` payloads with
typed metadata, processed by actor-pool ``map_batches`` stages.

Codec status (the container ships no image/audio libraries):

- REAL pure-Python decoders for the container-free formats: 16-bit PCM
  WAV (:func:`decode_wav_pcm` — RIFF chunk walk, numpy frombuffer) and
  binary PPM/PGM (:func:`decode_ppm` — P6/P5 header parse + raw plane).
  ``DecodeAudio`` / ``DecodeImage`` route real payloads through these;
  matching encoders exist so tests pin exact round-trips.
- Compressed formats (JPEG/PNG/MP3/OGG/MP4...) remain honestly STUBBED:
  `_decode_real` raises ``NotImplementedError`` naming the gap; construct
  with ``fake=True`` for the deterministic payload-seeded fake so the
  Ray-side plumbing — schema, batch size, actor signature, output layout
  — stays testable end-to-end.  Swap in Pillow/librosa on a machine that
  has them.

Batch-size guidance: binary payloads are large; size ``batch_size`` so
``batch_size × max_payload × concurrency`` fits each worker's heap (pass
small values like 16-64 for multi-MB media).
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pyarrow as pa
import ray.data


# ---------------------------------------------------------------------------
# pure-Python codecs (no external libraries; formats that need none)
# ---------------------------------------------------------------------------


def decode_wav_pcm(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode a 16-bit PCM RIFF/WAVE payload -> (mono int16 samples,
    sample_rate).  Multichannel files take channel 0 (deterministic — a
    mixdown would round).  Raises ``ValueError`` on non-RIFF payloads and
    ``NotImplementedError`` for compressed (non-PCM) WAV variants."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV payload missing fmt/data chunk")
    audio_format, n_channels, sample_rate, _, _, bits = fmt
    if audio_format != 1 or bits != 16:
        raise NotImplementedError(
            f"only 16-bit PCM WAV is decodable without codec libraries "
            f"(got format={audio_format}, bits={bits})"
        )
    frames = np.frombuffer(data, dtype="<i2")
    if n_channels > 1:
        frames = frames[:: n_channels]  # channel 0
    return frames.astype(np.int16), int(sample_rate)


def encode_wav_pcm(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """Minimal mono 16-bit PCM WAV writer (the test-vector twin of
    :func:`decode_wav_pcm`)."""
    pcm = np.asarray(samples, "<i2").tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(pcm), b"WAVE", b"fmt ", 16, 1, 1,
        sample_rate, sample_rate * 2, 2, 16, b"data", len(pcm),
    )
    return hdr + pcm


def decode_ppm(payload: bytes) -> np.ndarray:
    """Decode a binary PPM (P6) or PGM (P5) payload -> (h, w, 3) uint8
    (grayscale replicates to 3 channels).  Handles comments and maxval <=
    255; raises ``ValueError`` on anything else."""
    if payload[:2] not in (b"P6", b"P5"):
        raise ValueError("not a binary PPM/PGM payload")
    gray = payload[:2] == b"P5"
    # header = magic + 3 whitespace-separated ints, '#' comments allowed
    fields, pos = [], 2
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    ch = 1 if gray else 3
    raw = np.frombuffer(payload, np.uint8, count=h * w * ch, offset=pos)
    px = raw.reshape(h, w, ch)
    return np.repeat(px, 3, axis=2) if gray else px.copy()


def encode_ppm(pixels: np.ndarray) -> bytes:
    """Minimal binary P6 writer for (h, w, 3) uint8 arrays."""
    h, w, _ = pixels.shape
    return b"P6\n%d %d\n255\n" % (w, h) + np.asarray(pixels, np.uint8).tobytes()


def _resize_nearest(px: np.ndarray, h: int, w: int) -> np.ndarray:
    """Nearest-neighbor resize (h0, w0, 3) -> (h, w, 3) via index gather —
    deterministic, no interpolation rounding to disagree about."""
    h0, w0, _ = px.shape
    ri = (np.arange(h) * h0) // h
    ci = (np.arange(w) * w0) // w
    return px[ri[:, None], ci[None, :], :]

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("url", pa.string()),
        ("mime", pa.string()),
        ("payload", pa.binary()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)


def _payload_rng(payload: bytes) -> np.random.Generator:
    seed = int.from_bytes(hashlib.blake2b(payload, digest_size=8).digest(), "big")
    return np.random.default_rng(seed)


class DecodeImage:
    """payload binary -> pixels fixed_size_list<uint8>[H*W*3] (+ dims).

    Stateful actor stage: codec initialisation happens once per actor in
    ``__init__`` (the real decoder would load libraries/ICC tables here)."""

    def __init__(self, *, target: tuple[int, int] = (32, 32), fake: bool = False):
        self.h, self.w = target
        self.fake = fake

    def _decode_real(self, payload: bytes) -> np.ndarray:
        # container-free formats decode for real (pure-Python P6/P5
        # parser + deterministic nearest-neighbor resize); compressed
        # formats stay honestly stubbed
        if payload[:2] in (b"P6", b"P5"):
            return _resize_nearest(decode_ppm(payload), self.h, self.w).reshape(-1)
        raise NotImplementedError(
            "only binary PPM/PGM decodes without codec libraries in this "
            "environment; construct DecodeImage(fake=True) for the "
            "deterministic test decoder on other formats"
        )

    def _decode_fake(self, payload: bytes) -> np.ndarray:
        return _payload_rng(payload).integers(0, 256, self.h * self.w * 3, dtype=np.uint8)

    def __call__(self, batch: pa.Table) -> pa.Table:
        decode = self._decode_fake if self.fake else self._decode_real
        pixels = np.stack([decode(p) for p in batch["payload"].to_pylist()])
        return pa.table(
            {
                "media_id": batch["media_id"],
                "pixels": pa.FixedSizeListArray.from_arrays(
                    pa.array(pixels.reshape(-1), pa.uint8()), self.h * self.w * 3
                ),
                "width": pa.array(np.full(len(batch), self.w, np.int32)),
                "height": pa.array(np.full(len(batch), self.h, np.int32)),
            }
        )


class ImageFeatures:
    """pixels -> feature vector (channel-mean / std / histogram) — a real
    vectorized kernel over the decoded tensor (no stub needed)."""

    def __init__(self, *, dims: tuple[int, int] = (32, 32)):
        self.h, self.w = dims

    def __call__(self, batch: pa.Table) -> pa.Table:
        flat = batch["pixels"].combine_chunks().flatten().to_numpy(zero_copy_only=False)
        px = flat.reshape(len(batch), self.h * self.w, 3).astype(np.float32)
        mean = px.mean(axis=1)
        std = px.std(axis=1)
        # 8-bin histogram of channel 0, vectorized across rows: bin = v//32
        # (identical to np.histogram(range=(0,256), bins=8) on uint8 data)
        n = len(batch)
        bins = (px[:, :, 0] // 32).astype(np.int64)
        offs = (np.arange(n)[:, None] * 8 + bins).ravel()
        hist = np.bincount(offs, minlength=n * 8).reshape(n, 8).astype(np.float32)
        feats = np.concatenate([mean, std, hist], axis=1)
        return pa.table(
            {
                "media_id": batch["media_id"],
                "features": pa.FixedSizeListArray.from_arrays(
                    pa.array(feats.reshape(-1), pa.float32()), feats.shape[1]
                ),
            }
        )


class FrameSampler:
    """video payload -> n_frames deterministic frame payloads (stubbed the
    same way; real impl would seek the container)."""

    def __init__(self, *, n_frames: int = 4, fake: bool = False):
        self.n_frames = n_frames
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError("video codecs unavailable; use fake=True")
        ids, frame_idx, frames = [], [], []
        for mid, payload in zip(batch["media_id"].to_pylist(), batch["payload"].to_pylist()):
            rng = _payload_rng(payload)
            for f in range(self.n_frames):
                ids.append(mid)
                frame_idx.append(f)
                frames.append(rng.bytes(64))
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "frame": pa.array(frame_idx, pa.int32()),
                "payload": pa.array(frames, pa.binary()),
            }
        )


def _stage_pool(concurrency):
    """Pool size for ONE of the two chained media actor stages: together
    they must leave CPUs for the read/input tasks or the streaming executor
    starves (observed hang on a 4-CPU pytest session with 2+2 actors)."""
    if concurrency is not None:
        return concurrency
    import ray as _ray

    total = int(_ray.cluster_resources().get("CPU", 4))
    return max(1, (total - 2) // 2)


def decode_image_stage(media: ray.data.Dataset, *, fake: bool = False,
                       target=(32, 32), concurrency=None, batch_size: int = 64) -> ray.data.Dataset:
    return media.map_batches(
        DecodeImage, fn_constructor_kwargs={"fake": fake, "target": target},
        batch_format="pyarrow", batch_size=batch_size, concurrency=_stage_pool(concurrency),
    )


def image_features_stage(decoded: ray.data.Dataset, *, dims=(32, 32), concurrency=None,
                         batch_size: int = 256) -> ray.data.Dataset:
    return decoded.map_batches(
        ImageFeatures, fn_constructor_kwargs={"dims": dims},
        batch_format="pyarrow", batch_size=batch_size, concurrency=_stage_pool(concurrency),
    )


def synth_media_dataset(n: int = 64, seed: int = 42) -> ray.data.Dataset:
    """Deterministic fake media table in MEDIA_SCHEMA (binary payloads)."""
    rng = np.random.default_rng(seed)
    payloads = [rng.bytes(128) for _ in range(n)]
    tbl = pa.table(
        {
            "media_id": pa.array(np.arange(n), pa.int64()),
            "url": pa.array([f"https://media.example.org/{i}.img" for i in range(n)], pa.string()),
            "mime": pa.array(["image/fake"] * n, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array(np.full(n, 0, np.int32)),
            "height": pa.array(np.full(n, 0, np.int32)),
            "duration_ms": pa.array(np.full(n, 0, np.int32)),
        }
    )
    return ray.data.from_arrow(tbl)


class DecodeAudio:
    """payload binary -> PCM fixed_size_list<int16>[n_samples].

    Same contract as :class:`DecodeImage`: the codec body is honestly
    stubbed (no audio libraries in this environment — construct with
    ``fake=True`` for the deterministic test decoder), while the actor
    signature, batch schema and pool sizing are the real plumbing a
    libsndfile/ffmpeg-backed decoder would drop into."""

    def __init__(self, *, n_samples: int = 2048, fake: bool = False):
        self.n_samples = n_samples
        self.fake = fake

    def _decode_real(self, payload: bytes) -> tuple[np.ndarray, int]:
        # 16-bit PCM WAV decodes for real (pure-Python RIFF walk);
        # compressed formats stay honestly stubbed
        if payload[:4] == b"RIFF":
            samples, rate = decode_wav_pcm(payload)
            out = np.zeros(self.n_samples, np.int16)
            n = min(len(samples), self.n_samples)
            out[:n] = samples[:n]  # truncate / zero-pad to the fixed width
            return out, rate
        raise NotImplementedError(
            "only 16-bit PCM WAV decodes without codec libraries in this "
            "environment; construct DecodeAudio(fake=True) for the "
            "deterministic test decoder on other formats"
        )

    def _decode_fake(self, payload: bytes) -> tuple[np.ndarray, int]:
        return (
            _payload_rng(payload).integers(
                -(2**15), 2**15, self.n_samples, dtype=np.int16
            ),
            16000,
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        decode = self._decode_fake if self.fake else self._decode_real
        decoded = [decode(p) for p in batch["payload"].to_pylist()]
        pcm = np.stack([d[0] for d in decoded]) if decoded else np.zeros((0, self.n_samples), np.int16)
        rates = np.array([d[1] for d in decoded], np.int32)
        return pa.table(
            {
                "media_id": batch["media_id"],
                "pcm": pa.FixedSizeListArray.from_arrays(
                    pa.array(pcm.reshape(-1), pa.int16()), self.n_samples
                ),
                "sample_rate": pa.array(rates),
            }
        )


class AudioFeatures:
    """PCM -> per-window RMS energy + zero-crossing counts — a REAL
    vectorized kernel over the decoded tensor (integer outputs so any
    downstream check is bit-stable).  n_windows fixed windows per clip."""

    def __init__(self, *, n_samples: int = 2048, n_windows: int = 8):
        assert n_samples % n_windows == 0
        self.n_samples = n_samples
        self.n_windows = n_windows

    def __call__(self, batch: pa.Table) -> pa.Table:
        flat = batch["pcm"].combine_chunks().flatten().to_numpy(zero_copy_only=False)
        n = len(batch)
        w = self.n_samples // self.n_windows
        x = flat.reshape(n, self.n_windows, w).astype(np.int64)
        rms = np.sqrt((x * x).mean(axis=2)).astype(np.int64)  # (n, n_windows)
        sign = x >= 0
        zc = (sign[:, :, 1:] != sign[:, :, :-1]).sum(axis=2).astype(np.int64)
        feats = np.concatenate([rms, zc], axis=1)
        return pa.table(
            {
                "media_id": batch["media_id"],
                "features": pa.FixedSizeListArray.from_arrays(
                    pa.array(feats.reshape(-1), pa.int64()), feats.shape[1]
                ),
            }
        )


def decode_audio_stage(media: ray.data.Dataset, *, fake: bool = False,
                       n_samples: int = 2048, concurrency=None,
                       batch_size: int = 64) -> ray.data.Dataset:
    return media.map_batches(
        DecodeAudio, fn_constructor_kwargs={"fake": fake, "n_samples": n_samples},
        batch_format="pyarrow", batch_size=batch_size, concurrency=_stage_pool(concurrency),
    )


def audio_features_stage(decoded: ray.data.Dataset, *, n_samples: int = 2048,
                         n_windows: int = 8, concurrency=None,
                         batch_size: int = 256) -> ray.data.Dataset:
    return decoded.map_batches(
        AudioFeatures,
        fn_constructor_kwargs={"n_samples": n_samples, "n_windows": n_windows},
        batch_format="pyarrow", batch_size=batch_size, concurrency=_stage_pool(concurrency),
    )


def frame_sample_stage(media: ray.data.Dataset, *, n_frames: int = 4, fake: bool = False,
                       concurrency=None, batch_size: int = 64) -> ray.data.Dataset:
    """Video payloads -> per-frame rows (media_id, frame, payload).  The
    sampler is an actor-pool stage like the decoders: container seek state
    would live in ``__init__`` (codec stubbed; ``fake=True`` produces the
    deterministic frame bytes the tests pin)."""
    return media.map_batches(
        FrameSampler, fn_constructor_kwargs={"n_frames": n_frames, "fake": fake},
        batch_format="pyarrow", batch_size=batch_size, concurrency=_stage_pool(concurrency),
    )
