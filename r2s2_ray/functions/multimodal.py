"""Multimodal column plumbing: image/audio/video payloads are opaque ``binary``
columns with typed metadata; decode/feature stages are actor-pool ``map_batches``
callables. The decode kernels themselves are STUBBED (no image/audio libraries in
this environment — clearly marked below); the Ray-side plumbing — schema, batch
sizing, actor signatures, output layout — is real and tested.

Scale notes: binary payloads force SMALL batch sizes (batch bytes ~= payload x
batch_size must fit the worker heap; pass batch_size explicitly). Stages stay in
``batch_format="pyarrow"`` end to end — binary/list columns do not survive pandas
round-trips losslessly.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data

#: canonical multimodal schema: payload + typed metadata
MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("media_type", pa.string()),  # "image" | "audio" | "video"
        ("payload", pa.binary()),
        ("meta", pa.string()),  # JSON sidecar (dims, codec, sr, ...)
    ]
)


class BinaryStats:
    """Real (non-stub) payload stage: byte length + sha256 — the content-identity
    pass every media pipeline starts with (dedup key, integrity)."""

    def __init__(self, id_col: str = "media_id", payload_col: str = "payload"):
        self.id_col, self.payload_col = id_col, payload_col

    def __call__(self, b: pa.Table) -> pa.Table:
        payloads = b[self.payload_col].to_pylist()
        return pa.table(
            {
                self.id_col: b[self.id_col],
                "n_bytes": pa.array([len(p) for p in payloads], pa.int64()),
                "sha256": pa.array([hashlib.sha256(p).hexdigest() for p in payloads], pa.string()),
            }
        )


class ImageDecode:
    """Actor-pool image decode -> fixed-size float feature. The decode kernel is a
    STUB: with ``fake=True`` it emits a deterministic payload-derived vector (so
    the distributed plumbing is testable); with ``fake=False`` it raises
    NotImplementedError because no image library ships in this container."""

    def __init__(self, size: tuple[int, int] = (8, 8), fake: bool = True):
        self.size = size
        self.fake = fake

    def __call__(self, b: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError(
                "image decoding requires PIL/cv2, which are not available here; "
                "run with fake=True for the deterministic stand-in"
            )
        h, w = self.size
        feats = []
        for p in b["payload"].to_pylist():
            d = hashlib.blake2b(p, digest_size=h * w).digest()
            feats.append((np.frombuffer(d, dtype=np.uint8).astype(np.float32) / 255.0).tolist())
        return pa.table(
            {
                "media_id": b["media_id"],
                "feature": pa.array(feats, pa.list_(pa.float32())),
            }
        )


class FrameSampler:
    """Video frame-sampling stub: emits (media_id, frame_idx) rows at a fixed
    stride from the declared frame count in ``meta`` JSON — the row-expansion
    plumbing (one input row -> many output rows) that a real sampler needs."""

    def __init__(self, stride: int = 10):
        self.stride = stride

    def __call__(self, b: pa.Table) -> pa.Table:
        import json

        ids, frames = [], []
        for mid, meta in zip(b["media_id"].to_pylist(), b["meta"].to_pylist()):
            n = int(json.loads(meta or "{}").get("n_frames", 0))
            for f in range(0, n, self.stride):
                ids.append(mid)
                frames.append(f)
        return pa.table(
            {"media_id": pa.array(ids, pa.int64()), "frame_idx": pa.array(frames, pa.int32())}
        )


class AudioFrames:
    """Audio decode -> windowed frame features, stubbed like ImageDecode: with
    ``fake=True`` the "decoded waveform" is a deterministic payload-derived byte
    stream framed at (win, hop) from the declared sample rate in ``meta`` JSON —
    the windowing/row-expansion plumbing is real; a real build would swap the
    stub for soundfile/librosa in ``__init__`` (actor-pool, loaded once)."""

    def __init__(self, win: int = 400, hop: int = 160, fake: bool = True):
        self.win, self.hop, self.fake = win, hop, fake

    def __call__(self, b: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError(
                "audio decoding requires soundfile/librosa, not available here; "
                "run with fake=True for the deterministic stand-in"
            )
        import json

        ids, idxs, energies = [], [], []
        for mid, p, meta in zip(
            b["media_id"].to_pylist(), b["payload"].to_pylist(), b["meta"].to_pylist()
        ):
            n_samples = int(json.loads(meta or "{}").get("n_samples", len(p)))
            wave = np.frombuffer(
                hashlib.blake2b(p, digest_size=32).digest() * (n_samples // 32 + 1), dtype=np.uint8
            )[:n_samples].astype(np.float32)
            for fi, start in enumerate(range(0, max(1, n_samples - self.win + 1), self.hop)):
                seg = wave[start : start + self.win]
                ids.append(mid)
                idxs.append(fi)
                energies.append(float(np.sqrt(np.mean(seg * seg))) if len(seg) else 0.0)
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "frame_idx": pa.array(idxs, pa.int32()),
                "rms": pa.array(energies, pa.float32()),
            }
        )


def audio_frames(ds: ray.data.Dataset, *, win: int = 400, hop: int = 160, batch_size: int = 64, concurrency=(1, 8)) -> ray.data.Dataset:
    return ds.map_batches(
        AudioFrames,
        fn_constructor_args=(win, hop),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def binary_stats(ds: ray.data.Dataset, id_col: str, payload_col: str, *, batch_size: int = 256, concurrency=(1, 8)) -> ray.data.Dataset:
    return ds.map_batches(
        BinaryStats,
        fn_constructor_args=(id_col, payload_col),
        batch_format="pyarrow",
        batch_size=batch_size,  # small: payload x batch must fit the heap
        concurrency=concurrency,
    )


def image_features(ds: ray.data.Dataset, *, batch_size: int = 64, concurrency=(1, 8)) -> ray.data.Dataset:
    return ds.map_batches(
        ImageDecode, batch_format="pyarrow", batch_size=batch_size, concurrency=concurrency
    )


def sample_frames(ds: ray.data.Dataset, stride: int = 10, *, batch_size: int = 64, concurrency=(1, 4)) -> ray.data.Dataset:
    return ds.map_batches(
        FrameSampler,
        fn_constructor_args=(stride,),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
