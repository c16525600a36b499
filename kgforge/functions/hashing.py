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
    """k-wide minhash signature (uint64). Vectorized k×|shingles|."""
    k = len(a)
    if len(shingles) == 0:
        return np.full(k, np.iinfo(np.uint64).max, dtype=np.uint64)
    # (k, n) = a[:,None]*x[None,:] + b  mod p   (object->uint64 safe via %)
    prod = (a[:, None].astype(object) * shingles[None, :].astype(object)
            + b[:, None].astype(object)) % _MERSENNE
    return np.min(np.array(prod, dtype=np.uint64), axis=1)


def band_hashes(sig: np.ndarray, n_bands: int) -> list[int]:
    """LSH band hashes: split the signature into bands, hash each."""
    r = len(sig) // n_bands
    out = []
    for band in range(n_bands):
        chunk = sig[band * r:(band + 1) * r].tobytes()
        out.append(int.from_bytes(
            hashlib.blake2b(chunk, digest_size=8).digest(), "big"))
    return out


def simhash64(text: str) -> int:
    """64-bit simhash over whitespace tokens (crc32-seeded bit votes)."""
    acc = np.zeros(64, dtype=np.int64)
    for tok in text.split():
        h = int.from_bytes(
            hashlib.blake2b(tok.encode("utf-8"), digest_size=8).digest(),
            "big")
        bits = np.fromiter(((h >> i) & 1 for i in range(64)), dtype=np.int64,
                           count=64)
        acc += bits * 2 - 1
    out = 0
    for i in range(64):
        if acc[i] > 0:
            out |= 1 << i
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
