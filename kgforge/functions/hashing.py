"""Deterministic hashing / sketching primitives for dedup at scale.

Everything here is process-stable (no salted ``hash()``): crc32 and
blake2 based, with numpy-vectorized minhash/simhash kernels.
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np

_MERSENNE = (1 << 61) - 1


def text_md5(text: str) -> str:
    return hashlib.md5(text.encode("utf-8")).hexdigest()


def shingle_hashes(text: str, n: int = 3) -> np.ndarray:
    """crc32 hashes of word n-gram shingles (unique, sorted)."""
    toks = text.split()
    if len(toks) < n:
        grams = [" ".join(toks)] if toks else []
    else:
        grams = [" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)]
    if not grams:
        return np.empty(0, dtype=np.uint64)
    arr = np.fromiter((zlib.crc32(g.encode("utf-8")) for g in grams),
                      dtype=np.uint64, count=len(grams))
    return np.unique(arr)


def minhash_params(k: int, seed: int = 1234) -> tuple[np.ndarray, np.ndarray]:
    """k universal-hash (a*x+b mod p) parameter pairs, seeded."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=k, dtype=np.int64).astype(np.uint64)
    b = rng.integers(0, _MERSENNE, size=k, dtype=np.int64).astype(np.uint64)
    return a, b


def minhash_signature(shingles: np.ndarray, a: np.ndarray,
                      b: np.ndarray) -> np.ndarray:
    """k-wide minhash signature (uint64), vectorized k×|shingles|.

    Hash family: multiply-shift over uint64 with wraparound
    (``h = (a*x + b) mod 2^64``) — a standard universal family that
    stays in native uint64 numpy ops (Python-object bignum math here was
    ~40x slower and dominated the LSH stage)."""
    k = len(a)
    if len(shingles) == 0:
        return np.full(k, np.iinfo(np.uint64).max, dtype=np.uint64)
    with np.errstate(over="ignore"):
        prod = a[:, None] * shingles[None, :] + b[:, None]  # mod 2^64
    return np.min(prod, axis=1)


_MIX0 = np.uint64(0x9E3779B97F4A7C15)
_MIX1 = np.uint64(0xBF58476D1CE4E5B9)
_MIX2 = np.uint64(0x94D049BB133111EB)


def band_hash_matrix(sigs: np.ndarray, n_bands: int) -> np.ndarray:
    """``(n_docs, k)`` uint64 signature matrix → ``(n_docs, n_bands)``
    band hashes, fully vectorized (splitmix64-style fold across the
    band's rows — equal band chunks always hash equal; the per-doc
    blake2b loop this replaced was the explode-stage hot spot)."""
    n, k = sigs.shape
    r = k // n_bands
    chunks = sigs[:, :n_bands * r].reshape(n, n_bands, r)
    with np.errstate(over="ignore"):
        h = np.full((n, n_bands), _MIX0, dtype=np.uint64)
        for j in range(r):
            h = h ^ chunks[:, :, j]
            h = h * _MIX1
            h ^= h >> np.uint64(31)
            h = h * _MIX2
            h ^= h >> np.uint64(29)
    return h


def band_hashes(sig: np.ndarray, n_bands: int) -> list[int]:
    """LSH band hashes for ONE signature (vector form of
    :func:`band_hash_matrix`, kept consistent with it)."""
    return band_hash_matrix(sig[None, :], n_bands)[0].tolist()


_SIMHASH_A = np.uint64(0x9E3779B97F4A7C15)  # splitmix64 multiplier
_SIMHASH_B = np.uint64(0xBF58476D1CE4E5B9)
_BIT_IDX = np.arange(64, dtype=np.uint64)


def simhash64(text: str) -> int:
    """64-bit simhash over whitespace tokens.

    Token → crc32 → splitmix-style uint64 mix (vectorized); bit votes
    summed as a (tokens × 64) matrix — no per-token Python hashing."""
    toks = text.split()
    if not toks:
        return 0
    crcs = np.fromiter((zlib.crc32(t.encode("utf-8")) for t in toks),
                       dtype=np.uint64, count=len(toks))
    with np.errstate(over="ignore"):
        h = (crcs * _SIMHASH_A + _SIMHASH_B)
        h ^= h >> np.uint64(31)
        h = h * _SIMHASH_B
        h ^= h >> np.uint64(29)
    bits = ((h[:, None] >> _BIT_IDX[None, :]) & np.uint64(1)).astype(np.int64)
    votes = (bits * 2 - 1).sum(axis=0)
    out = np.uint64(0)
    mask = votes > 0
    out = int(np.sum((np.uint64(1) << _BIT_IDX)[mask]))
    return out


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    """Exact Jaccard of two sorted-unique hash arrays."""
    if len(a) == 0 and len(b) == 0:
        return 1.0
    inter = np.intersect1d(a, b, assume_unique=True).size
    union = len(a) + len(b) - inter
    return inter / union if union else 0.0
