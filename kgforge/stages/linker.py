"""Embedding-ANN entity-linking candidate generation.

North-star parity: the reference links mentions purely by exact unique
attributes (its Cypher ``MERGE`` key, reference
``graphrag_sdk/steps/extract_data_step.py:201-226``); the graft's
north-star additionally names "entity linking with candidate-generation
(alias dictionary + embedding ANN)".  The alias dictionary lives in
``stages.canonicalize._resolve_aliases``; this module supplies the ANN
half for alias-missed surface forms:

- every surface form and every canonical entity name is embedded as a
  hashed character-3-gram COUNT vector (md5(gram) % dim — md5 precisely
  so a DuckDB oracle can rebuild every vector);
- candidates score by cosine; everything stays in small exact integers
  (dot products and squared norms of count vectors), so the argmax and
  the acceptance threshold are bit-exactly mirrorable in SQL:
  ``cos >= tn/td  ⟺  td²·dot² >= tn²·|q|²·|c|²`` (dot >= 0 always —
  counts are non-negative);
- the candidate catalog is the SMALL side (an entity dictionary), so it
  is broadcast once via ``ray.put`` and each batch does one integer
  matmul — no shuffle touches the mention stream.

Scale note: the catalog matrix is ``O(n_entities × dim)`` int64 per
actor.  Beyond ~10^7 catalog entries swap the broadcast matmul for the
IVF path (``stages.ann.ivf_topk``) over the same count vectors; the
acceptance rule is unchanged.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
from ray.data import Dataset

DEFAULT_DIM = 64
DEFAULT_N = 3
# cosine acceptance threshold as an exact rational tn/td (0.35)
DEFAULT_THRESHOLD = (7, 20)


def gram_dim(gram: str, dim: int = DEFAULT_DIM) -> int:
    """md5-hashed dimension of one character n-gram — first 8 hex chars
    as uint32, mod dim (mirrored in SQL as
    ``('0x' || substr(md5(g), 1, 8))::UBIGINT % dim``)."""
    return int(hashlib.md5(gram.encode("utf-8")).hexdigest()[:8], 16) % dim


def embed_counts(strings, n: int = DEFAULT_N,
                 dim: int = DEFAULT_DIM,
                 _cache: dict | None = None) -> np.ndarray:
    """Hashed char-n-gram count matrix ``(len(strings), dim)`` int64.
    Strings shorter than ``n`` embed to the zero vector.  ``_cache``
    (gram -> dim) persists across batches when supplied by a stateful
    caller; gram vocabularies are tiny relative to the corpus."""
    cache = _cache if _cache is not None else {}
    out = np.zeros((len(strings), dim), dtype=np.int64)
    for r, s in enumerate(strings):
        if s is None:
            continue
        row = out[r]
        for i in range(len(s) - n + 1):
            g = s[i:i + n]
            d = cache.get(g)
            if d is None:
                d = gram_dim(g, dim)
                cache[g] = d
            row[d] += 1
    return out


class AnnLinker:
    """Actor-pool stage: ``surface: string`` column → the same rows with
    ``canonical`` (best catalog match, ``''`` when no candidate shares a
    gram), exact integer score fields (``dot``, ``q_norm_sq``,
    ``c_norm_sq``) and ``linked`` (cosine >= threshold).

    The catalog is broadcast (``ray.put`` list wrapped in a 1-list, the
    repo's ObjectRef convention) and embedded ONCE per actor in
    ``__init__``; ``__call__`` is one int64 matmul per batch.

    Determinism contract (mirrored in the SQL oracle): argmax is over
    ``dot²/|c|²`` (monotone in cosine for fixed ``q``; both sides exact
    small ints so the float64 ratio is correctly rounded and ordering is
    exact), ties broken by ascending canonical string.
    """

    def __init__(self, catalog, n: int = DEFAULT_N, dim: int = DEFAULT_DIM,
                 threshold: tuple[int, int] = DEFAULT_THRESHOLD,
                 surface_col: str = "surface"):
        if isinstance(catalog, list) and len(catalog) == 1 and \
                isinstance(catalog[0], ray.ObjectRef):
            catalog = ray.get(catalog[0])
        # ascending sort: np.argmax picks the FIRST maximal score, which
        # is then the lexicographically smallest canonical among ties
        self.canon = sorted(set(catalog))
        self.n, self.dim = n, dim
        self.tn, self.td = threshold
        self.surface_col = surface_col
        self._cache: dict = {}
        self.cmat = embed_counts(self.canon, n, dim, self._cache)
        self.cn2 = np.einsum("ij,ij->i", self.cmat, self.cmat)

    def __call__(self, batch: pa.Table) -> pa.Table:
        surfaces = batch.column(self.surface_col).to_pylist()
        q = embed_counts(surfaces, self.n, self.dim, self._cache)
        qn2 = np.einsum("ij,ij->i", q, q)
        if len(self.canon) == 0 or len(surfaces) == 0:
            dot = np.zeros(len(surfaces), dtype=np.int64)
            canon = [""] * len(surfaces)
            cn2 = np.zeros(len(surfaces), dtype=np.int64)
        else:
            dots = q @ self.cmat.T                         # int64 exact
            # dot²/|c|² — numerators/denominators are small exact ints,
            # so the float64 ratios order exactly (see module docstring)
            score = (dots.astype(np.float64) ** 2) / \
                np.maximum(self.cn2, 1).astype(np.float64)
            best = np.argmax(score, axis=1)
            rows = np.arange(len(surfaces))
            dot = dots[rows, best]
            matched = dot > 0
            canon = [self.canon[b] if m else ""
                     for b, m in zip(best, matched)]
            cn2 = np.where(matched, self.cn2[best], 0)
        linked = (dot > 0) & (
            self.td * self.td * dot * dot >=
            self.tn * self.tn * qn2 * cn2)
        return pa.Table.from_arrays(
            [batch.column(self.surface_col),
             pa.array(canon, pa.string()),
             pa.array(dot, pa.int64()),
             pa.array(qn2, pa.int64()),
             pa.array(cn2, pa.int64()),
             pa.array(linked, pa.bool_())],
            names=[self.surface_col, "canonical", "dot", "q_norm_sq",
                   "c_norm_sq", "linked"])

    def link_one(self, surface: str) -> str | None:
        """Scalar helper for the normalize-path fallback: canonical name
        when ``linked``, else None.  Callers memoize per surface."""
        t = self(pa.table({self.surface_col: pa.array([surface],
                                                      pa.string())}))
        return t.column("canonical")[0].as_py() \
            if t.column("linked")[0].as_py() else None


def distinct_strings(ds: Dataset, col: str, n_buckets: int = 16) -> Dataset:
    """Distributed exact distinct over one string column: per-batch
    unique (combiner) → coarse-bucket groupby → per-bucket unique.  Only
    already-deduped strings ride the shuffle."""

    def local_unique(batch: pa.Table) -> pa.Table:
        vals = pd.unique(batch.column(col).drop_null().to_pandas())
        h = pd.util.hash_array(vals.astype(object)) % n_buckets
        return pa.table({col: pa.array(vals, pa.string()),
                         "bucket": pa.array(h.astype(np.int64))})

    def bucket_unique(df: pd.DataFrame) -> pa.Table:
        return pa.table({col: pa.array(sorted(set(df[col])), pa.string())})

    return (ds.map_batches(local_unique, batch_format="pyarrow")
            .groupby("bucket").map_groups(bucket_unique,
                                          batch_format="pandas"))
