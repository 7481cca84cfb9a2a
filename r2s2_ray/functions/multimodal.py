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


def _sha_stream(payload: bytes, n: int) -> np.ndarray:
    """Deterministic n-byte pseudo-stream from a payload: sha256 digests chained
    over HEX STRINGS (d1 = sha256(payload), d_{k+1} = sha256(hex(d_k))) so the
    DuckDB oracle — whose sha256() only accepts VARCHAR — can reproduce it."""
    hexes = [hashlib.sha256(payload).hexdigest()]
    while 32 * len(hexes) < n:
        hexes.append(hashlib.sha256(hexes[-1].encode()).hexdigest())
    raw = bytes.fromhex("".join(hexes))
    reps = -(-n // len(raw))
    return np.frombuffer(raw * reps, dtype=np.uint8)[:n]


class ImageDecode:
    """Actor-pool image decode -> fixed-size float feature. The decode kernel is a
    STUB: with ``fake=True`` it emits a deterministic payload-derived vector (so
    the distributed plumbing is testable — and SQL-checkable: sha256-chain bytes
    scaled by the exact dyadic 1/256, see oracles_td.image_features_oracle);
    with ``fake=False`` it raises NotImplementedError because no image library
    ships in this container."""

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
            d = _sha_stream(p, h * w)
            # /256 (a power of two) is exact in float32 — bit-identical to the
            # oracle's CAST(b/256.0 AS FLOAT)
            feats.append((d.astype(np.float32) / 256.0).tolist())
        return pa.table(
            {
                "media_id": b["media_id"],
                "feature": pa.array(feats, pa.list_(pa.float32())),
            }
        )


class FrameSampler:
    """Video frame-sampling stub: emits (media_id, frame_idx) rows at a fixed
    stride from the declared frame count in ``meta`` JSON — the row-expansion
    plumbing (one input row -> many output rows) that a real sampler needs.
    The expansion is vectorized (numpy repeat/arange over per-row counts);
    only the tiny per-row JSON parse stays scalar."""

    def __init__(self, stride: int = 10):
        self.stride = stride

    def __call__(self, b: pa.Table) -> pa.Table:
        import json

        mids = np.asarray(b["media_id"].to_pylist(), dtype=np.int64)
        n = np.asarray(
            [int(json.loads(m or "{}").get("n_frames", 0)) for m in b["meta"].to_pylist()],
            dtype=np.int64,
        )
        k = -(-n // self.stride)  # frames emitted per row (ceil)
        k[n <= 0] = 0
        total = int(k.sum())
        if total == 0:
            return pa.table(
                {"media_id": pa.array([], pa.int64()), "frame_idx": pa.array([], pa.int32())}
            )
        ids = np.repeat(mids, k)
        starts = np.repeat(np.cumsum(k) - k, k)
        frames = (np.arange(total) - starts) * self.stride
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "frame_idx": pa.array(frames.astype(np.int32), pa.int32()),
            }
        )


class AudioFrames:
    """Audio decode -> windowed frame features, stubbed like ImageDecode: with
    ``fake=True`` the "decoded waveform" is a deterministic payload-derived byte
    stream (sha256 of the payload, cycled) framed at (win, hop) from the declared
    sample count in ``meta`` JSON — the windowing/row-expansion plumbing is real;
    a real build would swap the stub for soundfile/librosa in ``__init__``
    (actor-pool, loaded once). The per-frame feature is the INTEGER energy
    (sum of squared byte samples) so the DuckDB oracle matches exactly — no
    float-summation-order hazard."""

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
            digest = hashlib.sha256(p).digest()
            wave = np.frombuffer(
                digest * (n_samples // 32 + 1), dtype=np.uint8
            )[:n_samples].astype(np.int64)
            sq = wave * wave
            for fi, start in enumerate(range(0, max(1, n_samples - self.win + 1), self.hop)):
                seg = sq[start : start + self.win]
                ids.append(mid)
                idxs.append(fi)
                energies.append(int(seg.sum()))
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "frame_idx": pa.array(idxs, pa.int32()),
                "energy": pa.array(energies, pa.int64()),
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


def video_frames(ds: ray.data.Dataset, *, stride: int = 10, batch_size: int = 256, concurrency=(1, 8)) -> ray.data.Dataset:
    return ds.map_batches(
        FrameSampler,
        fn_constructor_args=(stride,),
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


class PHash:
    """Average-hash perceptual signature over the decoded byte stream (the
    pHash-family image-dedup primitive; the decode is the same deterministic
    sha-chain STUB as ImageDecode, so the SQL oracle reproduces signatures
    bit-for-bit): bit i is set iff byte_i > floor(mean(bytes)). Emits one
    (media_id, phash int64) row per payload."""

    def __init__(self, n_bytes: int = 64):
        self.n_bytes = n_bytes
        self._weights = (np.uint64(1) << np.arange(n_bytes % 64 or 64, dtype=np.uint64))

    def __call__(self, b: pa.Table) -> pa.Table:
        out = []
        for p in b["payload"].to_pylist():
            d = _sha_stream(p, self.n_bytes).astype(np.uint64)
            mean = np.uint64(int(d.sum()) // self.n_bytes)
            bits = d > mean
            h = np.uint64(0)
            for i in np.flatnonzero(bits):
                h |= np.uint64(1) << np.uint64(int(i) % 64)
            out.append(np.int64(h))
        return pa.table(
            {
                "media_id": b["media_id"],
                "phash": pa.array([int(x) for x in out], pa.int64()),
            }
        )


def phash_neardup(
    ds: ray.data.Dataset,
    *,
    n_bytes: int = 64,
    num_buckets: int = 32,
    batch_size: int = 256,
    concurrency=(1, 8),
) -> ray.data.Dataset:
    """Perceptual-hash near-dup canonicalization: signature per payload
    (actor pool), then ONE signature-bucketed sort co-locates equal
    signatures and a block-local group-min assigns every media its canonical
    id — the exact-dedup shape on the perceptual key. Output
    (media_id, phash, canon_id)."""
    import polars as pl

    sigs = ds.map_batches(
        PHash,
        fn_constructor_args=(n_bytes,),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )

    def bucket(b: pa.Table) -> pa.Table:
        h = b["phash"]
        h = h.combine_chunks() if isinstance(h, pa.ChunkedArray) else h
        u = h.to_numpy(zero_copy_only=False).astype(np.uint64)
        return b.append_column(
            "bucket", pa.array((u % np.uint64(num_buckets)).astype(np.int64))
        )

    def canon(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b)
        out = df.with_columns(
            pl.col("media_id").min().over("phash").alias("canon_id")
        )
        return out.select(["media_id", "phash", "canon_id"]).to_arrow()

    return (
        sigs.map_batches(bucket, batch_format="pyarrow")
        .sort("bucket")
        .map_batches(canon, batch_format="pyarrow", batch_size=None)
    )
