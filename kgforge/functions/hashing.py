"""Deterministic hashing / sketching primitives for dedup at scale.

Everything here is process-stable (no salted ``hash()``): crc32 and
blake2 based, with numpy-vectorized minhash/simhash kernels.
"""

from __future__ import annotations

import hashlib
import re
import zlib

import numpy as np

_MERSENNE = (1 << 61) - 1


def text_md5(text: str) -> str:
    return hashlib.md5(text.encode("utf-8")).hexdigest()


def fast_text_hash64(values) -> np.ndarray:
    """VECTORIZED 64-bit content hash of a string array → uint64
    (``pd.util.hash_array`` siphash under the hood — the
    ``SHARD_FN="pdhash64"`` discipline from kg_build).  The production
    alternative to a per-row Python ``hashlib.md5`` loop (~1 µs/row is
    real money at 10^12 docs); md5 stays for ``oracle_mode`` paths
    that must re-derive the hash in DuckDB.  Callers keep the uint64
    through routing and folds and hex-format only result-sized output
    (if at all) — never per corpus row."""
    import pandas as pd
    arr = np.asarray(
        [v if v is not None else "" for v in values], dtype=object)
    return pd.util.hash_array(arr, categorize=False)


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


_BIT_IDX = np.arange(64, dtype=np.uint64)
# RE2 '\S+' semantics ([^ \t\n\f\r]) — matches the DuckDB oracle's
# regexp_extract_all(text, '\S+'); Python str.split() would also split
# on Unicode whitespace (NBSP,  , …) and silently disagree.
_TOKEN_SPLIT = re.compile(r"[^ \t\n\f\r]+")


def token_hash64_md5(token: str) -> int:
    """First 8 bytes (big-endian) of md5(token) as a uint64 — chosen so
    a SQL engine can replicate it exactly:
    ``('0x' || substr(md5(tok), 1, 16))::UBIGINT`` in DuckDB."""
    return int.from_bytes(
        hashlib.md5(token.encode("utf-8")).digest()[:8], "big")


def simhash64_batch(texts: list) -> np.ndarray:
    """64-bit simhash per text, batch-vectorized: md5 runs ONCE per
    token unique ACROSS THE WHOLE BATCH (corpus tokens repeat heavily,
    so this cuts the hash count ~10×), bit votes accumulate with one
    ``np.add.at`` scatter over a (unique-tokens × 64) sign matrix.

    Semantics are identical to :func:`simhash64` (RE2-``\\S+`` tokens,
    md5-derived hashes, occurrence-weighted votes, bit set when the
    vote sum is > 0) — oracle-able: every step replicates in plain SQL
    via :func:`token_hash64_md5`."""
    n = len(texts)
    out = np.zeros(n, dtype=np.uint64)
    tok_lists = [_TOKEN_SPLIT.findall(t or "") for t in texts]
    counts = np.fromiter((len(tl) for tl in tok_lists),
                         dtype=np.int64, count=n)
    if counts.sum() == 0:
        return out
    flat = np.asarray([tok for tl in tok_lists for tok in tl],
                      dtype=object)
    uniq, inv = np.unique(flat, return_inverse=True)
    hs = np.fromiter((token_hash64_md5(t) for t in uniq),
                     dtype=np.uint64, count=len(uniq))
    signs = (((hs[:, None] >> _BIT_IDX[None, :]) & np.uint64(1))
             .astype(np.float64) * 2.0 - 1.0)    # (uniq, 64) in {-1, 1}
    votes = np.zeros((n, 64), dtype=np.int64)
    doc_idx = np.repeat(np.arange(n, dtype=np.int64), counts)
    # one bincount per bit keeps the transient at O(occurrences × 8 B);
    # a single signs[inv] gather would be occurrences × 64 × 8 B —
    # ~10 GB on a 128 MiB text block.  ±1 float sums are exact to 2^53.
    for b in range(64):
        votes[:, b] = np.bincount(doc_idx, weights=signs[inv, b],
                                  minlength=n).astype(np.int64)
    bit_vals = (np.uint64(1) << _BIT_IDX)
    return ((votes > 0).astype(np.uint64) * bit_vals[None, :]).sum(
        axis=1, dtype=np.uint64)


def simhash64(text: str) -> int:
    """64-bit simhash over RE2-``\\S+`` tokens with md5-derived token
    hashes — single-doc form of :func:`simhash64_batch`."""
    return int(simhash64_batch([text])[0])


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    """Exact Jaccard of two sorted-unique hash arrays."""
    if len(a) == 0 and len(b) == 0:
        return 1.0
    inter = np.intersect1d(a, b, assume_unique=True).size
    union = len(a) + len(b) - inter
    return inter / union if union else 0.0
