"""Deterministic 64-bit hashing kernels (vectorized numpy, no per-row Python).

Frozen specs — every other module (generators, UDFs, goldens, oracles) derives
from these exact formulas; changing any constant invalidates golden fixtures.

The reference's analogue of this file is the fixed-point/delta arithmetic of
its decoder (readosm.c:1179-1211) — deterministic integer math that every
consumer must reproduce bit-for-bit.
"""

from __future__ import annotations

import numpy as np

U64 = np.uint64

# splitmix64 constants (Vigna, public domain — http://prng.di.unimi.it/splitmix64.c)
_SM_GAMMA = U64(0x9E3779B97F4A7C15)
_SM_M1 = U64(0xBF58476D1CE4E5B9)
_SM_M2 = U64(0x94D049BB133111EB)

# FNV-1a 64-bit constants
_FNV_OFFSET = U64(0xCBF29CE484222325)
_FNV_PRIME = U64(0x100000001B3)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer over a uint64 array. Input may be int64 (reinterpreted)."""
    z = np.asarray(x).astype(np.int64, copy=False).view(U64) + _SM_GAMMA
    z = (z ^ (z >> U64(30))) * _SM_M1
    z = (z ^ (z >> U64(27))) * _SM_M2
    return z ^ (z >> U64(31))


def fnv1a64_bytes(data: bytes) -> int:
    """FNV-1a over one byte string → uint64 (python int)."""
    h = int(_FNV_OFFSET)
    for b in data:
        h = ((h ^ b) * int(_FNV_PRIME)) & 0xFFFFFFFFFFFFFFFF
    return h


def fnv1a64_str_array(strs) -> np.ndarray:
    """FNV-1a over an iterable of strings → uint64 array.

    Fully vectorized: one pyarrow UTF-8 buffer (contiguous bytes + offsets) is
    scattered into a padded (n, maxlen) matrix with no per-string Python loop,
    then hashed column-by-column (maxlen iterations — ~13 for image ids).
    """
    import pyarrow as pa

    if isinstance(strs, pa.Array):
        arr = strs  # Arrow-native callers (mapInArrow): zero conversion
        if pa.types.is_large_string(arr.type):
            # large_string has int64 offsets — the int32 view below would
            # silently misread them; normalize first
            arr = arr.cast(pa.string())
        elif not pa.types.is_string(arr.type):
            raise TypeError(f"fnv1a64_str_array: expected string array, got {arr.type}")
    else:
        arr = pa.array(strs, type=pa.string())
    if arr.null_count:
        raise ValueError("fnv1a64_str_array: null strings not allowed")
    n = len(arr)
    if n == 0:
        return np.empty(0, dtype=U64)
    validity, offsets_buf, data_buf = arr.buffers()
    off = np.frombuffer(offsets_buf, dtype=np.int32)[arr.offset : arr.offset + n + 1]
    off = off.astype(np.int64)
    buf = np.frombuffer(data_buf, dtype=np.uint8)
    lens = np.diff(off)
    starts = off[:-1]
    maxlen = int(lens.max()) if n else 0
    h = np.full(n, _FNV_OFFSET, dtype=U64)
    if maxlen == 0:
        return h
    # byte j of every string is a strided gather from the shared UTF-8 buffer
    # (no scatter matrix — O(Σlen) gathers total, nothing materialized per row)
    if int(lens.min()) == maxlen:
        # uniform length (generated ids): Arrow's data buffer is the packed
        # (n, maxlen) byte matrix already — column views, no gathers/masks
        mat = buf[starts[0] : starts[0] + n * maxlen].reshape(n, maxlen)
        for j in range(maxlen):
            np.bitwise_xor(h, mat[:, j].astype(U64), out=h)
            np.multiply(h, _FNV_PRIME, out=h)
    else:
        alive = np.arange(n)  # strings longer than j — shrinks monotonically
        for j in range(maxlen):
            alive = alive[lens[alive] > j]
            b = buf[starts[alive] + j].astype(U64)
            h[alive] = (h[alive] ^ b) * _FNV_PRIME
    return h


def u64_to_i64(x: np.ndarray) -> np.ndarray:
    """Reinterpret uint64 bits as int64 (two's complement) — for parquet/Spark LongType."""
    return np.asarray(x, dtype=U64).view(np.int64)


def i64_to_u64(x: np.ndarray) -> np.ndarray:
    return np.asarray(x, dtype=np.int64).view(U64)


def u01(x: np.ndarray) -> np.ndarray:
    """uint64 → float64 uniform in [0, 1) using the top 53 bits."""
    return (np.asarray(x, dtype=U64) >> U64(11)).astype(np.float64) / float(1 << 53)


def phash64(pixels: np.ndarray, w: int, h: int) -> int:
    """Perceptual hash of a grayscale image: 8x8 block means vs their median → 64 bits.

    Frozen spec: blocks are (h//8, w//8); bit (r*8+c) set iff block mean > median
    of the 64 means; bits packed MSB-first into an int64 (two's complement).
    Mirrors the role of the reference's node id (the stable per-entity key,
    pbf2sqlite.c:415) — here derived from payload so duplicates collide.
    """
    img = pixels.reshape(h, w).astype(np.float64)
    bh, bw = h // 8, w // 8
    means = img.reshape(8, bh, 8, bw).mean(axis=(1, 3))  # (8, 8)
    med = np.median(means)
    bits = (means > med).astype(np.uint64).ravel()
    val = U64(0)
    for i in range(64):
        val = (val << U64(1)) | bits[i]
    return int(val.view(np.int64))


def phash64_batch(flat_pixels: np.ndarray, w: int, h: int) -> np.ndarray:
    """phash64 over a batch of same-shape images: (n, h*w) uint8 → int64[n]."""
    n = flat_pixels.shape[0]
    img = flat_pixels.reshape(n, 8, h // 8, 8, w // 8).astype(np.float64)
    means = img.mean(axis=(2, 4)).reshape(n, 64)  # (n, 64)
    med = np.median(means, axis=1, keepdims=True)
    bits = (means > med).astype(np.uint64)
    weights = U64(1) << np.arange(63, -1, -1, dtype=U64)
    return (bits * weights).sum(axis=1, dtype=U64).view(np.int64)


def minhash_params(num_perm: int, seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic (a, b) coefficient arrays for num_perm universal-hash permutations."""
    idx = np.arange(num_perm, dtype=np.int64)
    a = splitmix64(idx + np.int64(seed * 1_000_003)) | U64(1)  # odd multipliers
    b = splitmix64(idx + np.int64(seed * 1_000_003 + 500_009))
    return a, b


def minhash_signature(shingle_hashes: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """MinHash signature: min over shingles of (a*h + b) per permutation → uint64[num_perm]."""
    if shingle_hashes.size == 0:
        return np.full(a.shape[0], U64(0xFFFFFFFFFFFFFFFF), dtype=U64)
    sh = np.asarray(shingle_hashes, dtype=U64)
    # (num_perm, n_shingles) — fine for num_perm<=128 and shingles<=few thousand
    vals = a[:, None] * sh[None, :] + b[:, None]
    return vals.min(axis=1)


def simhash64(token_hashes: np.ndarray, weights: np.ndarray | None = None) -> int:
    """SimHash: weighted bit-vote over token hashes → 64-bit fingerprint (int64)."""
    th = np.asarray(token_hashes, dtype=U64)
    if th.size == 0:
        return 0
    if weights is None:
        weights = np.ones(th.shape[0], dtype=np.float64)
    bits = ((th[:, None] >> np.arange(64, dtype=U64)[None, :]) & U64(1)).astype(np.float64)
    votes = (bits * 2.0 - 1.0) * weights[:, None]
    sig_bits = (votes.sum(axis=0) > 0).astype(np.uint64)
    val = (sig_bits << np.arange(64, dtype=U64)).sum(dtype=U64)
    return int(val.view(np.int64))
