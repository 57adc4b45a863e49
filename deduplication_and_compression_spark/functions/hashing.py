"""Vectorized (numpy) hashing primitives.

These are the signature kernels the pandas/Arrow UDFs call — and the
SAME functions the brute-force pytest oracles call, so pipeline and
oracle can never drift on "identical shingle/signature config"
(BASELINE.json north_rule).

Everything is uint64 arithmetic with natural wraparound; no per-row
Python, no per-shingle Python.  The reference computes one SHA-256 per
4096-byte chunk (/root/reference/SHA_algorithm/SHA256.cpp:176-223) and
ships an (unused) xxhash64 (/root/reference/CDC/CDC.h:24-202); here the
non-cryptographic role is filled by splitmix64-mixed polynomial hashes,
and the cryptographic role by Spark's built-in ``sha2``/``md5``.
"""

from __future__ import annotations

import numpy as np

_U64 = np.uint64

# splitmix64 constants (public domain, Vigna)
_SM_GAMMA = _U64(0x9E3779B97F4A7C15)
_SM_M1 = _U64(0xBF58476D1CE4E5B9)
_SM_M2 = _U64(0x94D049BB133111EB)

# polynomial rolling-hash base (odd => invertible mod 2^64)
_POLY_BASE = _U64(0x100000001B3)  # FNV prime, reused as poly base


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer over a uint64 array.

    In-place arithmetic on one working copy: the naive chained
    expression allocates ~10 temporaries, which at 10^7-element inputs
    (150 MB each) leaves the malloc fast path and page-faults its way
    to a 10x slowdown."""
    with np.errstate(over="ignore"):
        z = np.array(x, dtype=_U64, copy=True)
        z += _SM_GAMMA
        z ^= z >> _U64(30)
        z *= _SM_M1
        z ^= z >> _U64(27)
        z *= _SM_M2
        z ^= z >> _U64(31)
    return z


def make_seeds(n: int, seed: int) -> np.ndarray:
    """n decorrelated uint64 seeds derived from one master seed."""
    return splitmix64(np.arange(1, n + 1, dtype=_U64) * _U64(seed | 1))


def char_kgram_hashes(text: str, k: int) -> np.ndarray:
    """uint64 hashes of every UTF-8 byte k-gram of ``text``.

    Fully vectorized: one polynomial pass over the byte array, then a
    splitmix64 mix.  Returns an empty array for texts shorter than k.
    """
    buf = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
    n = buf.shape[0]
    if n < k:
        return np.empty(0, dtype=_U64)
    h = np.zeros(n - k + 1, dtype=_U64)
    with np.errstate(over="ignore"):
        for j in range(k):
            h = h * _POLY_BASE + buf[j : n - k + 1 + j].astype(_U64)
    return splitmix64(h)


def token_hashes(text: str) -> np.ndarray:
    """uint64 hash per whitespace token (for SimHash features)."""
    toks = text.split()
    if not toks:
        return np.empty(0, dtype=_U64)
    out = np.empty(len(toks), dtype=_U64)
    with np.errstate(over="ignore"):
        for i, t in enumerate(toks):
            b = np.frombuffer(t.encode("utf-8"), dtype=np.uint8).astype(_U64)
            acc = _U64(len(b))
            for chunk in b:  # tokens are short; still cheap
                acc = acc * _POLY_BASE + chunk
            out[i] = acc
    return splitmix64(out)


def minhash_signature(shingles: np.ndarray, seeds: np.ndarray) -> np.ndarray:
    """MinHash signature: for each seed p, min over shingles of
    splitmix64(shingle ^ seed_p).  Returns uint64[len(seeds)].

    Empty shingle set → all-max sentinel (never collides with a real
    signature because splitmix64 output 0xFFFF...F is a measure-zero hit
    per lane across all 128 lanes).
    """
    if shingles.shape[0] == 0:
        return np.full(seeds.shape[0], np.iinfo(np.uint64).max, dtype=_U64)
    u = np.unique(shingles)
    # (S x P) matrix in chunks of seeds to bound memory
    out = np.empty(seeds.shape[0], dtype=_U64)
    step = 32
    for s in range(0, seeds.shape[0], step):
        block = splitmix64(u[:, None] ^ seeds[None, s : s + step])
        out[s : s + step] = block.min(axis=0)
    return out


def minhash_signatures_batch(
    texts: "list[str]", k: int, seeds: np.ndarray, tile_rows: int = 16
) -> np.ndarray:
    """Batch MinHash: returns uint64[(n_texts, n_perm)].

    Row-tiled: shingle hashes for ~tile_rows texts at a time are mixed
    against all seeds in ONE preallocated (shingles x n_perm) buffer
    that stays L3-resident, then reduced per text with a single
    axis-0 reduceat.  The earlier whole-batch formulations were
    memory-bandwidth-bound (128 passes over a 100 MB+ array) and went
    superlinear once temporaries left the cache; this shape is linear
    in batch size and allocation-free in the hot loop.
    """
    per_row = [np.unique(char_kgram_hashes(t, k)) for t in texts]
    counts = np.array([a.shape[0] for a in per_row], dtype=np.int64)
    n = len(texts)
    nperm = seeds.shape[0]
    out = np.empty((n, nperm), dtype=_U64)
    out.fill(np.uint64(np.iinfo(np.uint64).max))
    max_shingles = 0
    for i in range(0, n, tile_rows):
        max_shingles = max(max_shingles, int(counts[i : i + tile_rows].sum()))
    if max_shingles == 0:
        return out
    buf = np.empty((max_shingles, nperm), dtype=_U64)
    tmp = np.empty((max_shingles, nperm), dtype=_U64)
    c30, c27, c31 = _U64(30), _U64(27), _U64(31)
    with np.errstate(over="ignore"):
        for i in range(0, n, tile_rows):
            rows = [a for a in per_row[i : i + tile_rows] if a.shape[0] > 0]
            if not rows:
                continue
            cat = np.concatenate(rows)
            m = cat.shape[0]
            b, t = buf[:m], tmp[:m]
            np.bitwise_xor(cat[:, None], seeds[None, :], out=b)
            # in-place splitmix64 over the tile
            b += _SM_GAMMA
            np.right_shift(b, c30, out=t); b ^= t
            b *= _SM_M1
            np.right_shift(b, c27, out=t); b ^= t
            b *= _SM_M2
            np.right_shift(b, c31, out=t); b ^= t
            tc = counts[i : i + tile_rows]
            nz = np.flatnonzero(tc > 0)
            starts = np.zeros(nz.shape[0], dtype=np.int64)
            np.cumsum(tc[nz][:-1], out=starts[1:])
            out[i + nz] = np.minimum.reduceat(b, starts, axis=0)
    return out


def band_hashes(signature: np.ndarray, bands: int, rows: int) -> np.ndarray:
    """Hash each band of ``rows`` consecutive signature lanes to one
    uint64 bucket key.  signature: uint64[(n, bands*rows)] or
    uint64[bands*rows].  Returns same leading shape with trailing dim
    ``bands``."""
    sig = np.asarray(signature, dtype=_U64)
    single = sig.ndim == 1
    if single:
        sig = sig[None, :]
    grouped = sig.reshape(sig.shape[0], bands, rows)
    h = np.full((sig.shape[0], bands), _U64(1469598103934665603), dtype=_U64)
    with np.errstate(over="ignore"):
        for r in range(rows):
            h = (h ^ grouped[:, :, r]) * _POLY_BASE
    h = splitmix64(h)
    return h[0] if single else h


def simhash_from_features(
    feature_hashes: np.ndarray, weights: np.ndarray | None = None, bits: int = 64
) -> int:
    """Classic SimHash (Charikar 2002): sum signed weights per bit of
    each feature hash; sign of the sum gives the output bit."""
    if feature_hashes.shape[0] == 0:
        return 0
    bit_matrix = (
        (feature_hashes[:, None] >> np.arange(bits, dtype=_U64)[None, :]) & _U64(1)
    ).astype(np.int64)
    signed = bit_matrix * 2 - 1
    if weights is not None:
        signed = signed * weights[:, None].astype(np.int64)
    sums = signed.sum(axis=0)
    out = np.uint64(0)
    bitpos = np.flatnonzero(sums > 0).astype(np.uint64)
    for b in bitpos:
        out |= _U64(1) << b
    return int(out.astype(np.int64))  # reinterpret as signed for Spark LongType


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized popcount(xor) over int64/uint64 arrays."""
    x = (np.asarray(a).astype(np.int64).view(_U64)) ^ (
        np.asarray(b).astype(np.int64).view(_U64)
    )
    cnt = np.zeros(x.shape, dtype=np.int64)
    for shift in range(0, 64, 8):
        cnt += _POPCOUNT_TABLE[((x >> _U64(shift)) & _U64(0xFF)).astype(np.int64)]
    return cnt


_POPCOUNT_TABLE = np.array([bin(i).count("1") for i in range(256)], dtype=np.int64)


def u64_to_i64(a: np.ndarray) -> np.ndarray:
    """Reinterpret uint64 → int64 (Spark LongType carrier)."""
    return np.asarray(a, dtype=_U64).view(np.int64)


def i64_to_u64(a: np.ndarray) -> np.ndarray:
    return np.asarray(a, dtype=np.int64).view(_U64)
