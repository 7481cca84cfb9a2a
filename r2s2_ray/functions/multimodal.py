"""Multimodal column plumbing: image/audio/video payloads are opaque ``binary``
columns with typed metadata; decode/feature stages are actor-pool ``map_batches``
callables. Decode status by format: WAV and PNG decode are REAL (stdlib wave
parser; chunk-walking CRC-checked PNG parser with full filter support — see
:class:`WavDecode` / :func:`png_decode_gray` at the bottom); JPEG/MP3/MP4 need
external codecs absent from this environment, so those paths keep the clearly
marked deterministic stand-ins. The Ray-side plumbing — schema, batch sizing,
actor signatures, output layout — is real and tested on every path.

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


# ---------------------------------------------------------------------------
# REAL decode kernels (no external libs): WAV via the stdlib wave module,
# PNG via a chunk parser + zlib inflate + scanline unfiltering. These close
# the "decode is a stand-in" gap for the two container formats the standard
# library can genuinely parse; JPEG/MP3/MP4 still need external codecs and
# keep the stand-in path.
# ---------------------------------------------------------------------------


def wav_encode(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """int16 mono samples -> a real RIFF/WAVE container (stdlib wave writer).
    Fixture-side helper: the DECODER below is the operator under test."""
    import io
    import wave as _wave

    buf = io.BytesIO()
    with _wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


class WavDecode:
    """REAL audio decode: parses the RIFF/WAVE container (stdlib ``wave``),
    decodes PCM-16 mono to samples, and emits per-window INTEGER energies
    (sum of squared samples at (win, hop)) — same output contract as the
    AudioFrames stand-in, but the waveform comes from an actual format
    parse, so a corrupted container raises instead of producing rows."""

    def __init__(self, win: int = 400, hop: int = 160):
        self.win, self.hop = win, hop

    def __call__(self, b: pa.Table) -> pa.Table:
        import io
        import wave as _wave

        ids, idxs, energies = [], [], []
        for mid, p in zip(b["media_id"].to_pylist(), b["payload"].to_pylist()):
            with _wave.open(io.BytesIO(p), "rb") as w:
                if w.getnchannels() != 1 or w.getsampwidth() != 2:
                    raise ValueError(f"media {mid}: expected PCM-16 mono")
                raw = w.readframes(w.getnframes())
            s = np.frombuffer(raw, dtype="<i2").astype(np.int64)
            sq = s * s
            n = len(s)
            for fi, start in enumerate(range(0, max(1, n - self.win + 1), self.hop)):
                ids.append(mid)
                idxs.append(fi)
                energies.append(int(sq[start : start + self.win].sum()))
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "frame_idx": pa.array(idxs, pa.int32()),
                "energy": pa.array(energies, pa.int64()),
            }
        )


def png_encode_gray(pixels: np.ndarray) -> bytes:
    """(h, w) uint8 grayscale -> a real PNG (8-bit, colortype 0). Rows are
    filtered with type y % 3 in {None, Sub, Up} so decoding genuinely
    exercises unfiltering, not just inflate. Fixture-side helper."""
    import struct
    import zlib

    h, w = pixels.shape

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    lines = []
    prev = np.zeros(w, dtype=np.int64)
    for y in range(h):
        row = pixels[y].astype(np.int64)
        f = y % 3
        if f == 0:
            enc = row
        elif f == 1:  # Sub: delta vs left neighbor
            enc = (row - np.concatenate(([0], row[:-1]))) % 256
        else:  # Up: delta vs row above
            enc = (row - prev) % 256
        lines.append(bytes([f]) + enc.astype(np.uint8).tobytes())
        prev = row
    idat = zlib.compress(b"".join(lines), 6)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )


def _png_unfilter(raw: np.ndarray, h: int, w: int) -> np.ndarray:
    """Reverse PNG scanline filters (types 0-4) for 8-bit grayscale (bpp=1)."""
    out = np.zeros((h, w), dtype=np.uint8)
    stride = w + 1
    for y in range(h):
        f = int(raw[y * stride])
        line = raw[y * stride + 1 : (y + 1) * stride].astype(np.int64)
        above = out[y - 1].astype(np.int64) if y else np.zeros(w, dtype=np.int64)
        if f == 0:
            cur = line
        elif f == 1:  # Sub
            cur = np.zeros(w, dtype=np.int64)
            acc = 0
            # running prefix (left neighbor is the RECONSTRUCTED byte)
            for x in range(w):
                acc = (line[x] + acc) % 256
                cur[x] = acc
        elif f == 2:  # Up
            cur = (line + above) % 256
        elif f == 3:  # Average
            cur = np.zeros(w, dtype=np.int64)
            left = 0
            for x in range(w):
                left = (line[x] + (left + above[x]) // 2) % 256
                cur[x] = left
        elif f == 4:  # Paeth
            cur = np.zeros(w, dtype=np.int64)
            left = 0
            for x in range(w):
                ul = above[x - 1] if x else 0
                p = left + above[x] - ul
                pr = min(
                    (abs(p - left), 0, left),
                    (abs(p - above[x]), 1, above[x]),
                    (abs(p - ul), 2, ul),
                )[2]
                left = (line[x] + pr) % 256
                cur[x] = left
        else:
            raise ValueError(f"unknown PNG filter type {f}")
        out[y] = cur.astype(np.uint8)
    return out


def png_decode_gray(data: bytes) -> np.ndarray:
    """REAL PNG decode for 8-bit grayscale: signature + chunk walk with CRC
    verification, IHDR validation, IDAT concat + zlib inflate, scanline
    unfiltering. Raises on any malformed container."""
    import struct
    import zlib

    if data[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG (bad signature)")
    pos, w = 8, None
    idat = b""
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        typ = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])
        if zlib.crc32(typ + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {typ!r}: CRC mismatch")
        if typ == b"IHDR":
            w, h, depth, ctype, comp, filt, inter = struct.unpack(">IIBBBBB", body)
            if (depth, ctype, comp, filt, inter) != (8, 0, 0, 0, 0):
                raise ValueError("only 8-bit non-interlaced grayscale supported")
        elif typ == b"IDAT":
            idat += body
        elif typ == b"IEND":
            break
        pos += 12 + length
    if w is None:
        raise ValueError("PNG missing IHDR")
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8)
    if len(raw) != h * (w + 1):
        raise ValueError("PNG payload size mismatch")
    return _png_unfilter(raw, h, w)


class PngPixelStats:
    """Actor-pool stage over REAL PNG payloads: decode (CRC-checked parse +
    inflate + unfilter) and emit integer pixel statistics per image."""

    def __call__(self, b: pa.Table) -> pa.Table:
        ids, sums, mins, maxs = [], [], [], []
        for mid, p in zip(b["media_id"].to_pylist(), b["payload"].to_pylist()):
            px = png_decode_gray(p).astype(np.int64)
            ids.append(mid)
            sums.append(int(px.sum()))
            mins.append(int(px.min()))
            maxs.append(int(px.max()))
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "pixel_sum": pa.array(sums, pa.int64()),
                "pixel_min": pa.array(mins, pa.int64()),
                "pixel_max": pa.array(maxs, pa.int64()),
            }
        )


def wav_energy(ds: ray.data.Dataset, *, win: int = 400, hop: int = 160, batch_size: int = 64, concurrency=(1, 8)) -> ray.data.Dataset:
    return ds.map_batches(
        WavDecode,
        fn_constructor_args=(win, hop),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def png_pixel_stats(ds: ray.data.Dataset, *, batch_size: int = 64, concurrency=(1, 8)) -> ray.data.Dataset:
    return ds.map_batches(
        PngPixelStats, batch_format="pyarrow", batch_size=batch_size, concurrency=concurrency
    )


def bmp_encode_rgb(px: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> a REAL 24bpp uncompressed BMP (BITMAPINFOHEADER,
    bottom-up rows, BGR byte order, rows padded to 4 bytes) — the fixture
    encoder for the decode kernel below."""
    import struct

    h, w, c = px.shape
    assert c == 3 and px.dtype == np.uint8
    row_size = (3 * w + 3) & ~3
    img = np.zeros((h, row_size), dtype=np.uint8)
    img[:, : 3 * w] = px[::-1, :, ::-1].reshape(h, 3 * w)  # bottom-up + BGR
    data = img.tobytes()
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + len(data), 0, 0, off)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0
    )
    return header + info + data


def bmp_decode_rgb(data: bytes) -> np.ndarray:
    """REAL BMP decode (stdlib + numpy only): validates the magic, header
    size, 24bpp, BI_RGB compression; reads the pixel-array offset; inverts
    bottom-up row order, strips the 4-byte row padding and the BGR byte
    order. Returns (h, w, 3) uint8 RGB. Malformed containers raise."""
    import struct

    if len(data) < 54 or data[:2] != b"BM":
        raise ValueError("not a BMP: bad magic")
    off = struct.unpack_from("<I", data, 10)[0]
    hsize, w, h = struct.unpack_from("<Iii", data, 14)
    planes, bpp, comp = struct.unpack_from("<HHI", data, 26)
    if hsize < 40 or planes != 1:
        raise ValueError("unsupported BMP header")
    if bpp != 24 or comp != 0:
        raise ValueError(f"unsupported BMP: bpp={bpp} compression={comp}")
    if h <= 0 or w <= 0:
        raise ValueError("top-down or empty BMP not supported")
    row_size = (3 * w + 3) & ~3
    need = off + row_size * h
    if len(data) < need:
        raise ValueError("truncated BMP pixel array")
    arr = np.frombuffer(data, dtype=np.uint8, count=row_size * h, offset=off)
    rows = arr.reshape(h, row_size)[:, : 3 * w].reshape(h, w, 3)
    return rows[::-1, :, ::-1].copy()  # bottom-up -> top-down, BGR -> RGB


class BmpChannelStats:
    """Actor-pool stage over REAL BMP payloads: decode (header validation,
    padding strip, row/byte-order inversion) and emit per-channel integer
    sums — a decode bug (padding, BGR, bottom-up) breaks the oracle hash."""

    def __call__(self, b: pa.Table) -> pa.Table:
        ids, sr, sg, sb = [], [], [], []
        for mid, p in zip(b["media_id"].to_pylist(), b["payload"].to_pylist()):
            px = bmp_decode_rgb(p).astype(np.int64)
            ids.append(mid)
            sr.append(int(px[:, :, 0].sum()))
            sg.append(int(px[:, :, 1].sum()))
            sb.append(int(px[:, :, 2].sum()))
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "sum_r": pa.array(sr, pa.int64()),
                "sum_g": pa.array(sg, pa.int64()),
                "sum_b": pa.array(sb, pa.int64()),
            }
        )


def bmp_channel_stats(
    ds: ray.data.Dataset, *, batch_size: int = 64, concurrency=(1, 8)
) -> ray.data.Dataset:
    return ds.map_batches(
        BmpChannelStats, batch_format="pyarrow", batch_size=batch_size, concurrency=concurrency
    )


class BmpResizeStats:
    """Actor-pool stage: REAL BMP decode + nearest-neighbor DOWNSAMPLE
    (integer stride sampling, ``out[r, c] = in[r*sy, c*sx]`` — the pinned
    resize contract, so the SQL oracle can enumerate exactly which source
    pixels survive) + per-channel integer sums of the RESIZED image. The
    resize step is where a real vision pipeline normalizes crawl images
    before feature extraction; here the kernel is a zero-copy numpy stride
    view, decode bugs and off-by-one stride bugs both break the hash."""

    def __init__(self, sy: int = 2, sx: int = 2):
        self.sy, self.sx = sy, sx

    def __call__(self, b: pa.Table) -> pa.Table:
        ids, ohs, ows, sr, sg, sb = [], [], [], [], [], []
        for mid, p in zip(b["media_id"].to_pylist(), b["payload"].to_pylist()):
            px = bmp_decode_rgb(p)[:: self.sy, :: self.sx].astype(np.int64)
            ids.append(mid)
            ohs.append(px.shape[0])
            ows.append(px.shape[1])
            sr.append(int(px[:, :, 0].sum()))
            sg.append(int(px[:, :, 1].sum()))
            sb.append(int(px[:, :, 2].sum()))
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "out_h": pa.array(ohs, pa.int64()),
                "out_w": pa.array(ows, pa.int64()),
                "sum_r": pa.array(sr, pa.int64()),
                "sum_g": pa.array(sg, pa.int64()),
                "sum_b": pa.array(sb, pa.int64()),
            }
        )


def bmp_resize_stats(
    ds: ray.data.Dataset,
    *,
    sy: int = 2,
    sx: int = 2,
    batch_size: int = 64,
    concurrency=(1, 8),
) -> ray.data.Dataset:
    return ds.map_batches(
        BmpResizeStats,
        fn_constructor_kwargs={"sy": sy, "sx": sx},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class MediaMeta:
    """Actor-pool stage over a HETEROGENEOUS binary media column: sniff the
    container by magic bytes and extract typed metadata from REAL headers —
    the "opaque binary column with typed metadata" front door every
    multimodal pipeline needs before routing payloads to format-specific
    decoders. PNG -> IHDR dims (signature-checked), BMP -> header dims
    (validated 24bpp), RIFF/WAVE -> frame count + sample rate via the stdlib
    reader. Unknown magic is reported, not raised (a corpus crawl always
    contains junk); per-row absent fields are -1."""

    def __call__(self, b: pa.Table) -> pa.Table:
        import io
        import struct
        import wave as _wave

        ids, kinds, ws, hs, ns = [], [], [], [], []
        for mid, p in zip(b["media_id"].to_pylist(), b["payload"].to_pylist()):
            kind, w, h, n = "unknown", -1, -1, -1
            data = bytes(p)
            if data[:8] == b"\x89PNG\r\n\x1a\n" and data[12:16] == b"IHDR":
                kind = "png"
                w, h = struct.unpack(">II", data[16:24])
            elif data[:2] == b"BM":
                kind = "bmp"
                _, w, h = struct.unpack_from("<Iii", data, 14)
            elif data[:4] == b"RIFF" and data[8:12] == b"WAVE":
                kind = "wav"
                with _wave.open(io.BytesIO(data), "rb") as r:
                    n = r.getnframes()
            elif data[:2] == b"\xff\xd8":
                kind = "jpeg"
                # walk markers to the first SOF for dims (frame header dims
                # are authoritative; APPn/DQT/DHT are skipped by length)
                q = 2
                while q + 4 <= len(data):
                    if data[q] != 0xFF:
                        break
                    m = data[q + 1]
                    if 0xC0 <= m <= 0xCF and m not in (0xC4, 0xC8, 0xCC):
                        h, w = struct.unpack(">HH", data[q + 5 : q + 9])
                        break
                    if m in (0xD8, 0xD9) or 0xD0 <= m <= 0xD7:
                        q += 2
                        continue
                    (ln,) = struct.unpack(">H", data[q + 2 : q + 4])
                    q += 2 + ln
            ids.append(mid)
            kinds.append(kind)
            ws.append(int(w))
            hs.append(int(h))
            ns.append(int(n))
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "kind": pa.array(kinds, pa.string()),
                "width": pa.array(ws, pa.int64()),
                "height": pa.array(hs, pa.int64()),
                "n_samples": pa.array(ns, pa.int64()),
            }
        )


def media_meta(
    ds: ray.data.Dataset, *, batch_size: int = 64, concurrency=(1, 8)
) -> ray.data.Dataset:
    return ds.map_batches(
        MediaMeta, batch_format="pyarrow", batch_size=batch_size, concurrency=concurrency
    )


# ---------------------------------------------------------------------------
# Baseline JPEG (ITU-T T.81, grayscale, stdlib + numpy only)
# ---------------------------------------------------------------------------

#: zigzag scan order (T.81 Figure 5) — index i of the scan holds block
#: position ZIGZAG[i] in row-major order
_JPEG_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

#: standard luminance Huffman tables (T.81 Annex K.3) — (bits, huffval)
_JPEG_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_JPEG_DC_VALS = list(range(12))
_JPEG_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_JPEG_AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _jpeg_dct_matrix() -> np.ndarray:
    """The 8x8 DCT-II basis A with A[u, x] = C(u)/2 * cos((2x+1) u pi / 16):
    forward F = A f A^T, inverse f = A^T F A (orthonormal)."""
    a = np.zeros((8, 8), dtype=np.float64)
    for u in range(8):
        c = np.sqrt(0.5) if u == 0 else 1.0
        for x in range(8):
            a[u, x] = 0.5 * c * np.cos((2 * x + 1) * u * np.pi / 16.0)
    return a


_JPEG_A = _jpeg_dct_matrix()


def _huff_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical Huffman assignment (T.81 Annex C): value -> (code, length)."""
    out: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # T.81 byte stuffing
                self.buf.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec
        return bytes(self.buf)


def _jpeg_category(v: int) -> int:
    return int(abs(v)).bit_length()


def jpeg_encode_gray(px: np.ndarray, quant: int = 1) -> bytes:
    """(h, w) uint8 grayscale -> a REAL baseline JFIF/JPEG (SOF0, one
    component, standard Annex K Huffman tables, flat quantization table of
    ``quant``): level shift, 8x8 float DCT, round-quantize, zigzag, DC DPCM
    + AC run-length, canonical Huffman, 0xFF byte stuffing. ``quant=1``
    keeps DC-only (flat-tile) blocks bit-exact through decode — the pinned
    fixture contract; larger values behave like a real quality knob.
    Fixture-side helper; the decoder below is the shipped operator kernel."""
    import struct

    h, w = px.shape
    q = np.full(64, int(quant), dtype=np.int64)
    dc_codes = _huff_codes(_JPEG_DC_BITS, _JPEG_DC_VALS)
    ac_codes = _huff_codes(_JPEG_AC_BITS, _JPEG_AC_VALS)

    bw = _BitWriter()
    prev_dc = 0
    hb, wb = (h + 7) // 8, (w + 7) // 8
    padded = np.empty((hb * 8, wb * 8), dtype=np.float64)
    padded[:h, :w] = px.astype(np.float64)
    padded[h:, :w] = px[h - 1 :, :].astype(np.float64)  # edge replicate
    padded[:, w:] = padded[:, w - 1 : w]
    padded -= 128.0
    for by in range(hb):
        for bx in range(wb):
            blk = padded[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
            coef = _JPEG_A @ blk @ _JPEG_A.T
            zz = np.round(coef.reshape(-1)[_JPEG_ZIGZAG] / q).astype(np.int64)
            diff = int(zz[0]) - prev_dc
            prev_dc = int(zz[0])
            s = _jpeg_category(diff)
            c, ln = dc_codes[s]
            bw.write(c, ln)
            if s:
                bits = diff if diff >= 0 else diff + (1 << s) - 1
                bw.write(bits, s)
            run = 0
            last_nz = int(np.nonzero(zz[1:])[0][-1]) + 1 if np.any(zz[1:]) else 0
            for i in range(1, last_nz + 1):
                v = int(zz[i])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    c, ln = ac_codes[0xF0]  # ZRL
                    bw.write(c, ln)
                    run -= 16
                s = _jpeg_category(v)
                c, ln = ac_codes[(run << 4) | s]
                bw.write(c, ln)
                bits = v if v >= 0 else v + (1 << s) - 1
                bw.write(bits, s)
                run = 0
            if last_nz < 63:
                c, ln = ac_codes[0x00]  # EOB
                bw.write(c, ln)
    scan = bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    dqt = seg(0xFFDB, bytes([0]) + bytes(int(q[i]) for i in range(64)))
    sof = seg(0xFFC0, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))
    dht = seg(
        0xFFC4,
        bytes([0x00]) + bytes(_JPEG_DC_BITS) + bytes(_JPEG_DC_VALS)
        + bytes([0x10]) + bytes(_JPEG_AC_BITS) + bytes(_JPEG_AC_VALS),
    )
    sos = seg(0xFFDA, bytes([1, 1, 0x00, 0, 63, 0]))
    app0 = seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    return b"\xff\xd8" + app0 + dqt + sof + dht + sos + scan + b"\xff\xd9"


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read(self, n: int) -> int:
        while self.nbits < n:
            if self.pos >= len(self.data):
                raise ValueError("JPEG scan data exhausted mid-symbol")
            byte = self.data[self.pos]
            self.pos += 1
            if byte == 0xFF:
                if self.pos >= len(self.data) or self.data[self.pos] != 0x00:
                    raise ValueError("unexpected marker inside JPEG scan data")
                self.pos += 1  # unstuff
            self.acc = (self.acc << 8) | byte
            self.nbits += 8
        out = (self.acc >> (self.nbits - n)) & ((1 << n) - 1)
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1
        return out


def _huff_decoder(bits: list[int], vals: list[int]):
    """(code, length) -> value lookup dict keyed by (length, code)."""
    table: dict[tuple[int, int], int] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_read(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read(1)
        v = table.get((length, code))
        if v is not None:
            return v
    raise ValueError("invalid JPEG Huffman code")


def _extend(bits: int, s: int) -> int:
    # T.81 F.12: magnitude-category decode of a signed value
    return bits if bits >= (1 << (s - 1)) else bits - (1 << s) + 1


def jpeg_decode_gray(data: bytes) -> np.ndarray:
    """REAL baseline JPEG decode for 8-bit single-component (grayscale)
    images: full marker walk (APPn/COM skipped, DQT/DHT accumulated, SOF0
    validated — progressive/multi-component/subsampled streams REJECTED
    loudly), entropy decode with byte unstuffing against the file's OWN
    Huffman tables, DC DPCM, dequantize, inverse zigzag, float IDCT, level
    shift + clamp, edge-crop to the declared dims. Baseline-lossy in
    general; DC-only blocks (flat 8x8 tiles) reconstruct bit-exactly, which
    is the sweep fixture's oracle contract."""
    import struct

    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    h = w = None
    qsel = 0
    scan_start = None
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError("JPEG marker sync lost")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (ln,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        body = data[pos + 4 : pos + 2 + ln]
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            b = 0
            while b < len(body):
                pq, tq = body[b] >> 4, body[b] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit JPEG quant tables unsupported")
                qt[tq] = np.frombuffer(
                    body[b + 1 : b + 65], dtype=np.uint8
                ).astype(np.int64)
                b += 65
        elif marker == 0xC4:  # DHT
            b = 0
            while b < len(body):
                tc, th = body[b] >> 4, body[b] & 0x0F
                bits = list(body[b + 1 : b + 17])
                n = sum(bits)
                vals = list(body[b + 17 : b + 17 + n])
                huff[(tc, th)] = _huff_decoder(bits, vals)
                b += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, ncomp = struct.unpack(">BHHB", body[:6])
            if prec != 8 or ncomp != 1:
                raise ValueError(
                    "only 8-bit single-component baseline JPEG supported"
                )
            if body[7] != 0x11:
                raise ValueError("subsampled JPEG unsupported")
            qsel = body[8]
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise ValueError("non-baseline (progressive/extended) JPEG unsupported")
        elif marker == 0xDD:
            raise ValueError("JPEG restart intervals unsupported")
        elif marker == 0xDA:  # SOS
            nscomp = body[0]
            if nscomp != 1:
                raise ValueError("multi-component JPEG scan unsupported")
            dc_sel, ac_sel = body[2] >> 4, body[2] & 0x0F
            scan_start = pos + 2 + ln
            break
        pos += 2 + ln
    if scan_start is None or h is None:
        raise ValueError("JPEG missing SOS or SOF0")
    end = data.rfind(b"\xff\xd9")
    if end < 0:
        raise ValueError("JPEG missing EOI")
    br = _BitReader(data[scan_start:end])
    dct, act = huff.get((0, dc_sel)), huff.get((1, ac_sel))
    if dct is None or act is None or qsel not in qt:
        raise ValueError("JPEG scan references undefined Huffman/quant table")
    q = qt[qsel]
    hb, wb = (h + 7) // 8, (w + 7) // 8
    out = np.zeros((hb * 8, wb * 8), dtype=np.uint8)
    inv_zz = np.empty(64, dtype=np.int64)
    inv_zz[_JPEG_ZIGZAG] = np.arange(64)
    prev_dc = 0
    for by in range(hb):
        for bx in range(wb):
            zz = np.zeros(64, dtype=np.int64)
            s = _huff_read(br, dct)
            diff = _extend(br.read(s), s) if s else 0
            prev_dc += diff
            zz[0] = prev_dc
            i = 1
            while i < 64:
                rs = _huff_read(br, act)
                run, size = rs >> 4, rs & 0x0F
                if size == 0:
                    if run == 15:  # ZRL
                        i += 16
                        continue
                    break  # EOB
                i += run
                if i > 63:
                    raise ValueError("JPEG AC run overflows the block")
                zz[i] = _extend(br.read(size), size)
                i += 1
            coef = (zz * q)[inv_zz].reshape(8, 8).astype(np.float64)
            blk = _JPEG_A.T @ coef @ _JPEG_A
            out[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = np.clip(
                np.round(blk) + 128, 0, 255
            ).astype(np.uint8)
    return out[:h, :w]


class JpegPixelStats:
    """Actor-pool stage over REAL baseline JPEG payloads: full container +
    entropy decode (markers, file-defined Huffman tables, DPCM, dequant,
    IDCT) and integer pixel stats per image — any parse/Huffman/DCT bug
    breaks the oracle hash on the flat-tile fixtures."""

    def __call__(self, b: pa.Table) -> pa.Table:
        ids, sums, mins, maxs = [], [], [], []
        for mid, p in zip(b["media_id"].to_pylist(), b["payload"].to_pylist()):
            px = jpeg_decode_gray(bytes(p)).astype(np.int64)
            ids.append(mid)
            sums.append(int(px.sum()))
            mins.append(int(px.min()))
            maxs.append(int(px.max()))
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "pixel_sum": pa.array(sums, pa.int64()),
                "pixel_min": pa.array(mins, pa.int64()),
                "pixel_max": pa.array(maxs, pa.int64()),
            }
        )


def jpeg_pixel_stats(
    ds: ray.data.Dataset, *, batch_size: int = 64, concurrency=(1, 8)
) -> ray.data.Dataset:
    return ds.map_batches(
        JpegPixelStats, batch_format="pyarrow", batch_size=batch_size, concurrency=concurrency
    )
