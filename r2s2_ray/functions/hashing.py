"""SQL-expressible, fully vectorized 64-bit hashing primitives.

Every hash in the dedup/text family that needs a DuckDB oracle goes through
these, so the oracle SQL can reproduce bit-identical values:

* :func:`poly_hash_arr` — fp(s) = sum_i byte_i * P^i (mod 2^64) over the UTF-8
  bytes of each string. Equals a Horner fold ``acc*P + byte`` over the REVERSED
  byte sequence, which is what the DuckDB oracle computes with ``list_reduce``.
  Vectorized across an entire Arrow string array in O(total_bytes): global
  powers of P via wrapping ``np.cumprod``, per-string segment sums via
  ``np.add.reduceat``, and the per-string exponent re-basing via the modular
  inverse of P (P is odd, hence invertible mod 2^64).
* :func:`affine64` — h -> a*h + b (mod 2^64), the MinHash permutation family
  (a odd => bijective). Constants come from :func:`perm_constants` by index so
  the SQL side can regenerate them from the same closed form.

The byte-level definition (not codepoints) keeps Python and SQL in agreement on
non-ASCII input: both sides hash ``encode(text)``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

#: polynomial base (the FNV-1a 64-bit prime; any odd constant works)
P = np.uint64(1099511628211)
#: modular inverse of P mod 2^64 (P odd => exists); pow(P, -1, 2**64)
P_INV = np.uint64(pow(int(P), -1, 1 << 64))

#: MinHash permutation constant bases (odd so a_i stays odd) — mirrored in SQL
K_A = 0x9E3779B97F4A7C15  # odd
K_B = 0xC2B2AE3D27D4EB4F  # odd
#: band-key combiner base (poly over the band's signature slice)
Q = np.uint64(0x100000001B3)


def _byte_view(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(bytes, offsets) of a non-null Arrow string/binary array, zero-copy."""
    arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    if pa.types.is_large_string(arr.type) or pa.types.is_large_binary(arr.type):
        off_dtype = np.int64
        width = 8
    else:
        off_dtype = np.int32
        width = 4
    bufs = arr.buffers()
    offsets = np.frombuffer(bufs[1], dtype=off_dtype, count=len(arr) + 1 + arr.offset)[
        arr.offset : arr.offset + len(arr) + 1
    ]
    data = np.frombuffer(bufs[2], dtype=np.uint8) if bufs[2] is not None else np.empty(0, np.uint8)
    del width
    return data, offsets.astype(np.int64)


def poly_hash_arr(arr: pa.Array) -> np.ndarray:
    """uint64 polynomial hash per string: sum_i byte_i * P^i (mod 2^64).

    Empty strings hash to 0. No per-row Python: one pass over the concatenated
    byte buffer (wrapping uint64 arithmetic is the mod)."""
    data, offsets = _byte_view(arr)
    n = len(offsets) - 1
    starts = offsets[:-1]
    lengths = np.diff(offsets)
    lo, hi = int(offsets[0]), int(offsets[-1])
    seg = data[lo:hi].astype(np.uint64)
    total = hi - lo
    if total == 0:
        return np.zeros(n, dtype=np.uint64)
    # pw[j] = P^j for global byte position j (uint64 wrap == mod 2^64)
    base = np.full(total, P, dtype=np.uint64)
    base[0] = 1
    pw = np.cumprod(base)
    weighted = seg * pw
    rel = starts - lo
    # pad one zero so a trailing empty string's start offset (== total) is a
    # valid reduceat index unclamped; clamping with min(rel, total-1) truncated
    # the PREVIOUS string's last byte(s) when the batch ended in empty strings
    weighted = np.concatenate([weighted, np.zeros(1, np.uint64)])
    # reduceat gives sum over [rel[i], rel[i+1]); equal bounds (empty string)
    # wrongly return weighted[rel[i]] — masked out below
    with np.errstate(over="ignore"):
        sums = np.add.reduceat(weighted, rel)
    # rebase: fp_i = sums_i * P^{-start_i}
    ibase = np.full(total + 1, P_INV, dtype=np.uint64)
    ibase[0] = 1
    ipw = np.cumprod(ibase)
    out = sums * ipw[rel]
    out[lengths == 0] = 0
    return out


def poly_hash_one(s: str) -> int:
    """Scalar reference implementation (tests / docs)."""
    acc = 0
    p = int(P)
    m = (1 << 64) - 1
    for i, b in enumerate(s.encode("utf-8")):
        acc = (acc + b * pow(p, i, 1 << 64)) & m
    return acc


def perm_constants(i: int) -> tuple[int, int]:
    """(a_i, b_i) for MinHash permutation i: a odd by construction."""
    m = (1 << 64) - 1
    return ((2 * i + 1) * K_A) & m, (i * K_B) & m


def affine64(h: np.ndarray, a: int, b: int) -> np.ndarray:
    """a*h + b mod 2^64, vectorized (uint64 wrap)."""
    return h * np.uint64(a) + np.uint64(b)


def band_key(sig_cols: list[np.ndarray]) -> np.ndarray:
    """Combine a band's signature slice into one 64-bit key:
    sum_j h_j * Q^j (mod 2^64) — order-sensitive, SQL-expressible."""
    acc = np.zeros_like(sig_cols[0])
    q = np.uint64(1)
    for col in sig_cols:
        acc = acc + col * q
        q = q * Q
    return acc


def plane_sign(table: int, plane: int, dim: int) -> int:
    """Deterministic Rademacher hyperplane entry (+1/-1) for cosine LSH —
    SQL-expressible: sign of the top bit of a mixed integer hash."""
    x = (table * 1000003 + plane * 1009 + dim + 1) & ((1 << 64) - 1)
    h = (x * K_A) & ((1 << 64) - 1)
    return 1 if h >= (1 << 63) else -1


def plane_matrix(table: int, num_planes: int, dim: int) -> np.ndarray:
    """(dim, num_planes) matrix of +-1 entries from :func:`plane_sign`."""
    d = np.arange(dim, dtype=np.uint64)[:, None]
    p = np.arange(num_planes, dtype=np.uint64)[None, :]
    x = np.uint64(table * 1000003) + p * np.uint64(1009) + d + np.uint64(1)
    h = x * np.uint64(K_A)
    return np.where(h >= np.uint64(1 << 63), 1.0, -1.0)
