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


def ann_link_bucketed(surfaces: Dataset, catalog: Dataset,
                      n: int = DEFAULT_N, dim: int = DEFAULT_DIM,
                      threshold: tuple[int, int] = DEFAULT_THRESHOLD,
                      surface_col: str = "surface",
                      catalog_col: str = "canon",
                      n_buckets: int = 16) -> Dataset:
    """EXACT scale path of :class:`AnnLinker` with the catalog as a
    DATASET (never broadcast, never driver-held) — for catalogs beyond
    the broadcast bound (~10^7 names).

    Output-identical to the broadcast linker (pinned in pytest): a
    candidate pair must share ≥1 embedding dimension (otherwise
    dot = 0, which never wins the argmax), so co-partitioning both
    sides by NONZERO DIM enumerates every viable pair.  Each pair is
    scored in exactly one group — its MINIMUM shared dim (the minhash
    band-ownership trick: both dim sets are recomputed from the strings
    inside the fold, so no pair-dedup exchange is needed).  A final
    coarse-bucket fold takes the per-surface argmax under the same
    exact integer rule, and surfaces with no candidate rejoin with the
    empty match.

    Skew note: a hot dim (a very common character gram) gathers many
    strings and its group does a cross product — at web scale raise
    ``dim`` (more, smaller groups) before sharding hot dims."""

    def tag(col: str, kind: int):
        def fn(t: pa.Table) -> pa.Table:
            vals = [s for s in pd.unique(
                t.column(col).drop_null().to_pandas()) if s is not None]
            mat = embed_counts(vals, n, dim)
            out_s, out_d = [], []
            for s, row in zip(vals, mat):
                for d in np.nonzero(row)[0]:
                    out_s.append(s)
                    out_d.append(int(d))
            return pa.table({
                "s": pa.array(out_s, pa.string()),
                "dim": pa.array(out_d, pa.int64()),
                "kind": pa.array([kind] * len(out_s), pa.int64())})
        return fn

    tagged = (surfaces.map_batches(tag(surface_col, 0),
                                   batch_format="pyarrow")
              .union(catalog.map_batches(tag(catalog_col, 1),
                                         batch_format="pyarrow")))

    def score_group(g: pd.DataFrame) -> pa.Table:
        d_own = int(g["dim"].iloc[0])
        qs = sorted(set(g.loc[g["kind"] == 0, "s"]))
        cs = sorted(set(g.loc[g["kind"] == 1, "s"]))
        if not qs or not cs:
            return _EMPTY_PAIRS
        cache: dict = {}
        qmat = embed_counts(qs, n, dim, cache)
        cmat = embed_counts(cs, n, dim, cache)
        # ownership: score (q, c) here only if this dim is the SMALLEST
        # dim where both are nonzero
        dots = qmat @ cmat.T
        qn2 = np.einsum("ij,ij->i", qmat, qmat)
        cn2 = np.einsum("ij,ij->i", cmat, cmat)
        both = (qmat[:, None, :] > 0) & (cmat[None, :, :] > 0)
        first_shared = np.argmax(both, axis=2)  # first True index
        rows, cols = np.nonzero((first_shared == d_own) & (dots > 0))
        if len(rows) == 0:
            return _EMPTY_PAIRS
        return pa.table({
            "surface": pa.array([qs[i] for i in rows], pa.string()),
            "canonical": pa.array([cs[j] for j in cols], pa.string()),
            "dot": pa.array(dots[rows, cols], pa.int64()),
            "q_norm_sq": pa.array(qn2[rows], pa.int64()),
            "c_norm_sq": pa.array(cn2[cols], pa.int64())})

    pairs = tagged.groupby("dim").map_groups(score_group,
                                             batch_format="pandas")

    def bucket(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "surface" not in t.column_names:
            return _EMPTY_PAIRS.append_column(
                "sbucket", pa.array([], pa.int64()))
        h = pd.util.hash_array(
            t.column("surface").to_pandas().astype(object).to_numpy())
        return t.append_column(
            "sbucket", pa.array((h % n_buckets).astype(np.int64)))

    def argmax_group(g: pd.DataFrame) -> pa.Table:
        tn, td = threshold
        g = g.sort_values("surface", kind="mergesort")
        out = {k: [] for k in ("surface", "canonical", "dot",
                               "q_norm_sq", "c_norm_sq", "linked")}
        for s, sub in g.groupby("surface", sort=True):
            dot = sub["dot"].to_numpy(np.int64)
            cn2 = sub["c_norm_sq"].to_numpy(np.int64)
            score = (dot.astype(np.float64) ** 2) / cn2.astype(np.float64)
            # exact argmax, ties to smallest canonical (same rule as
            # AnnLinker: float64 ratios of small ints order exactly)
            best_score = score.max()
            cand = sub.iloc[np.nonzero(score == best_score)[0]]
            row = cand.sort_values("canonical").iloc[0]
            qn2 = int(row["q_norm_sq"])
            linked = bool(td * td * int(row["dot"]) ** 2 >=
                          tn * tn * qn2 * int(row["c_norm_sq"]))
            out["surface"].append(s)
            out["canonical"].append(row["canonical"])
            out["dot"].append(int(row["dot"]))
            out["q_norm_sq"].append(qn2)
            out["c_norm_sq"].append(int(row["c_norm_sq"]))
            out["linked"].append(linked)
        return pa.table({
            "surface": pa.array(out["surface"], pa.string()),
            "canonical": pa.array(out["canonical"], pa.string()),
            "dot": pa.array(out["dot"], pa.int64()),
            "q_norm_sq": pa.array(out["q_norm_sq"], pa.int64()),
            "c_norm_sq": pa.array(out["c_norm_sq"], pa.int64()),
            "linked": pa.array(out["linked"], pa.bool_())})

    # result-sized; pin it so the anti-join's count and the final union
    # don't re-execute the pair+argmax chain
    linked = (pairs.map_batches(bucket, batch_format="pyarrow")
              .groupby("sbucket").map_groups(argmax_group,
                                             batch_format="pandas")
              .materialize())

    # surfaces with no candidate pair rejoin with the empty match
    from .joins import anti_join_keys
    missing = anti_join_keys(
        surfaces.select_columns([surface_col]), linked,
        surface_col, "surface")

    def empty_rows(t: pa.Table) -> pa.Table:
        vals = t.column(surface_col)
        strings = [s for s in pd.unique(vals.drop_null().to_pandas())]
        mat = embed_counts(strings, n, dim)
        qn2 = np.einsum("ij,ij->i", mat, mat) if strings \
            else np.array([], np.int64)
        k = len(strings)
        return pa.table({
            "surface": pa.array(strings, pa.string()),
            "canonical": pa.array([""] * k, pa.string()),
            "dot": pa.array(np.zeros(k, np.int64)),
            "q_norm_sq": pa.array(qn2, pa.int64()),
            "c_norm_sq": pa.array(np.zeros(k, np.int64)),
            "linked": pa.array([False] * k, pa.bool_())})

    return linked.union(missing.map_batches(empty_rows,
                                            batch_format="pyarrow"))


_EMPTY_PAIRS = pa.table({
    "surface": pa.array([], pa.string()),
    "canonical": pa.array([], pa.string()),
    "dot": pa.array([], pa.int64()),
    "q_norm_sq": pa.array([], pa.int64()),
    "c_norm_sq": pa.array([], pa.int64())})


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
