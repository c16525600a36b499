"""Deduplication operators for web-scale training-data curation.

All follow the same scale shape: per-batch vectorized signature
computation (``map_batches``) → explode to bucket rows → ONE
``groupby`` shuffle over bucket keys → within-bucket verification in
``map_groups``.  No stage materializes the corpus; candidate
verification happens on signatures carried through the shuffle, never by
re-fetching documents.

- ``exact_dedup``: content-hash groupby, keep smallest id (deterministic).
- ``minhash_lsh_pairs``: word-shingle minhash, banded LSH buckets,
  signature-estimated Jaccard verification.
- ``simhash_pairs``: 64-bit simhash, 16-bit band blocking, Hamming
  verification.
- ``ngram_jaccard_pairs``: exact n-gram Jaccard verification on LSH
  candidates (shingle sets carried only for candidates' buckets).
- ``embedding_pairs``: random-hyperplane LSH over an embedding column,
  within-bucket cosine verification.
"""

from __future__ import annotations

import hashlib
from itertools import combinations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset

from ..functions import hashing as H

N_COARSE_BUCKETS = 64


def _coarse_bucket(tbl: pa.Table, key_col: str,
                   n: int = N_COARSE_BUCKETS) -> pa.Table:
    """Coarse shuffle key over an exact LSH key: the groupby moves data by
    bucket (O(n) groups, sized to the cluster), and the exact-key pairing
    runs vectorized inside each bucket — per-tiny-group ``map_groups``
    scheduling is the scale killer this avoids."""
    vals = tbl.column(key_col).to_pylist()
    return tbl.append_column(
        "bucket", pa.array([int(v) % n for v in vals], pa.int64()))


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(ds: Dataset, id_col: str = "doc_id",
                text_col: str = "text") -> Dataset:
    """One row per distinct text: the smallest id wins (deterministic),
    plus the duplicate count.  Shuffle key = md5(text) — uniform even
    when text lengths are skewed."""

    def add_hash(batch: pa.Table) -> pa.Table:
        hashes = [H.text_md5(t or "") for t in batch.column(text_col).to_pylist()]
        out = batch.select([id_col, text_col]).append_column(
            "text_hash", pa.array(hashes, pa.string()))
        buckets = [int(h[:8], 16) % 64 for h in hashes]
        return out.append_column("bucket", pa.array(buckets, pa.int64()))

    def keep_first(group: pd.DataFrame) -> pd.DataFrame:
        # one call per coarse bucket; the per-key fold is a vectorized
        # pandas groupby inside (per-tiny-group map_groups overhead is the
        # scale killer — see canonicalize.py bucketing rationale)
        g = (group.sort_values(id_col)
                  .groupby("text_hash", as_index=False)
                  .agg(**{id_col: (id_col, "min"),
                          "n_dups": (id_col, "size"),
                          text_col: (text_col, "first")}))
        g["n_dups"] = g["n_dups"].astype(np.int64)
        return g[[id_col, "n_dups", text_col]]

    return (ds.map_batches(add_hash, batch_format="pyarrow")
              .groupby("bucket")
              .map_groups(keep_first, batch_format="pandas")
              .select_columns([id_col, "n_dups", text_col]))


# ---------------------------------------------------------------------------
# minhash + LSH
# ---------------------------------------------------------------------------


def minhash_lsh_pairs(ds: Dataset, id_col: str = "doc_id",
                      text_col: str = "text", num_hashes: int = 64,
                      n_bands: int = 16, shingle_n: int = 3,
                      threshold: float = 0.7, seed: int = 1234) -> Dataset:
    """Near-duplicate pairs ``(id_a < id_b, est_jaccard)`` with
    signature-estimated Jaccard >= threshold.

    Pipeline: signature per doc (vectorized) → explode to
    ``(band_id, band_hash, id, signature)`` rows → groupby bucket →
    pairwise signature agreement within bucket → global pair dedup.
    """
    a, b = H.minhash_params(num_hashes, seed)

    def sign(batch: pa.Table) -> pa.Table:
        ids_out, bands_out, bhash_out, sigs_out = [], [], [], []
        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        for i, t in zip(ids, texts):
            sig = H.minhash_signature(H.shingle_hashes(t or "", shingle_n), a, b)
            for band_id, bh in enumerate(H.band_hashes(sig, n_bands)):
                ids_out.append(i)
                bands_out.append(band_id)
                bhash_out.append(bh)
                sigs_out.append(sig.tobytes())
        tbl = pa.Table.from_arrays(
            [pa.array(ids_out, pa.int64()), pa.array(bands_out, pa.int32()),
             pa.array(bhash_out, pa.uint64()), pa.array(sigs_out, pa.binary())],
            names=[id_col, "band_id", "band_hash", "sig"])
        return _coarse_bucket(tbl, "band_hash")

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        # one map_groups call per COARSE bucket; exact LSH buckets are a
        # pandas groupby inside (avoids per-tiny-group scheduling overhead)
        rows = {"id_a": [], "id_b": [], "est_jaccard": []}
        for _, sub in group.groupby(["band_id", "band_hash"], sort=False):
            if len(sub) < 2:
                continue
            uniq = sub.drop_duplicates(subset=[id_col])
            items = [(int(r[id_col]),
                      np.frombuffer(r["sig"], dtype=np.uint64))
                     for _, r in uniq.iterrows()]
            for (ia, sa), (ib, sb) in combinations(items, 2):
                est = float(np.mean(sa == sb))
                if est >= threshold:
                    lo, hi = (ia, ib) if ia < ib else (ib, ia)
                    rows["id_a"].append(lo)
                    rows["id_b"].append(hi)
                    rows["est_jaccard"].append(est)
        out = pd.DataFrame(rows)
        out["id_a"] = out["id_a"].astype(np.int64)
        out["id_b"] = out["id_b"].astype(np.int64)
        out["est_jaccard"] = out["est_jaccard"].astype(np.float64)
        return out.drop_duplicates(subset=["id_a", "id_b"])

    pairs = (ds.map_batches(sign, batch_format="pyarrow")
               .groupby("bucket")
               .map_groups(bucket_pairs, batch_format="pandas"))
    # a pair can surface from several bands — global dedup, keep max est
    return (pairs.groupby(["id_a", "id_b"])
                 .max("est_jaccard")
                 .map_batches(lambda t: t.rename_columns(
                     ["id_a", "id_b", "est_jaccard"]),
                     batch_format="pyarrow"))


# ---------------------------------------------------------------------------
# simhash
# ---------------------------------------------------------------------------


def simhash_pairs(ds: Dataset, id_col: str = "doc_id",
                  text_col: str = "text", max_hamming: int = 3) -> Dataset:
    """Near-duplicate pairs by 64-bit simhash: block on four 16-bit bands
    (any pair within Hamming<=3 of each other shares at least one band by
    pigeonhole), verify Hamming distance within blocks."""

    def sign(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        id_o, band_o, key_o, sim_o = [], [], [], []
        for i, t in zip(ids, texts):
            s = H.simhash64(t or "")
            for band in range(4):
                id_o.append(i)
                band_o.append(band)
                key_o.append((s >> (band * 16)) & 0xFFFF)
                sim_o.append(s)
        tbl = pa.Table.from_arrays(
            [pa.array(id_o, pa.int64()), pa.array(band_o, pa.int32()),
             pa.array(key_o, pa.int32()), pa.array(sim_o, pa.uint64())],
            names=[id_col, "band_id", "band_key", "simhash"])
        return _coarse_bucket(tbl, "band_key")

    def verify(group: pd.DataFrame) -> pd.DataFrame:
        rows = {"id_a": [], "id_b": [], "hamming": []}
        for _, sub in group.groupby(["band_id", "band_key"], sort=False):
            if len(sub) < 2:
                continue
            uniq = sub.drop_duplicates(subset=[id_col])
            items = [(int(r[id_col]), int(r["simhash"]))
                     for _, r in uniq.iterrows()]
            for (ia, sa), (ib, sb) in combinations(items, 2):
                d = H.hamming64(sa, sb)
                if d <= max_hamming:
                    lo, hi = (ia, ib) if ia < ib else (ib, ia)
                    rows["id_a"].append(lo)
                    rows["id_b"].append(hi)
                    rows["hamming"].append(d)
        out = pd.DataFrame(rows)
        for c, t in (("id_a", np.int64), ("id_b", np.int64),
                     ("hamming", np.int64)):
            out[c] = out[c].astype(t)
        return out.drop_duplicates(subset=["id_a", "id_b"])

    pairs = (ds.map_batches(sign, batch_format="pyarrow")
               .groupby("bucket")
               .map_groups(verify, batch_format="pandas"))
    return (pairs.groupby(["id_a", "id_b"])
                 .min("hamming")
                 .map_batches(lambda t: t.rename_columns(
                     ["id_a", "id_b", "hamming"]), batch_format="pyarrow"))


# ---------------------------------------------------------------------------
# exact n-gram jaccard on LSH candidates
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(ds: Dataset, id_col: str = "doc_id",
                        text_col: str = "text", shingle_n: int = 3,
                        threshold: float = 0.5, n_bands: int = 8,
                        num_hashes: int = 32, seed: int = 99) -> Dataset:
    """Exact word-n-gram Jaccard >= threshold, with LSH candidate
    generation; shingle sets ride through the bucket shuffle so
    verification never re-reads documents."""
    a, b = H.minhash_params(num_hashes, seed)

    def sign(batch: pa.Table) -> pa.Table:
        id_o, band_o, key_o, sh_o = [], [], [], []
        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        for i, t in zip(ids, texts):
            sh = H.shingle_hashes(t or "", shingle_n)
            sig = H.minhash_signature(sh, a, b)
            for band_id, bh in enumerate(H.band_hashes(sig, n_bands)):
                id_o.append(i)
                band_o.append(band_id)
                key_o.append(bh)
                sh_o.append(sh.tobytes())
        tbl = pa.Table.from_arrays(
            [pa.array(id_o, pa.int64()), pa.array(band_o, pa.int32()),
             pa.array(key_o, pa.uint64()), pa.array(sh_o, pa.binary())],
            names=[id_col, "band_id", "band_hash", "shingles"])
        return _coarse_bucket(tbl, "band_hash")

    def verify(group: pd.DataFrame) -> pd.DataFrame:
        rows = {"id_a": [], "id_b": [], "jaccard": []}
        for _, sub in group.groupby(["band_id", "band_hash"], sort=False):
            if len(sub) < 2:
                continue
            uniq = sub.drop_duplicates(subset=[id_col])
            items = [(int(r[id_col]),
                      np.frombuffer(r["shingles"], dtype=np.uint64))
                     for _, r in uniq.iterrows()]
            for (ia, sa), (ib, sb) in combinations(items, 2):
                j = H.jaccard(sa, sb)
                if j >= threshold:
                    lo, hi = (ia, ib) if ia < ib else (ib, ia)
                    rows["id_a"].append(lo)
                    rows["id_b"].append(hi)
                    rows["jaccard"].append(j)
        out = pd.DataFrame(rows)
        out["id_a"] = out["id_a"].astype(np.int64)
        out["id_b"] = out["id_b"].astype(np.int64)
        out["jaccard"] = out["jaccard"].astype(np.float64)
        return out.drop_duplicates(subset=["id_a", "id_b"])

    pairs = (ds.map_batches(sign, batch_format="pyarrow")
               .groupby("bucket")
               .map_groups(verify, batch_format="pandas"))
    return (pairs.groupby(["id_a", "id_b"])
                 .max("jaccard")
                 .map_batches(lambda t: t.rename_columns(
                     ["id_a", "id_b", "jaccard"]), batch_format="pyarrow"))


# ---------------------------------------------------------------------------
# embedding cosine near-dup
# ---------------------------------------------------------------------------


def embedding_pairs(ds: Dataset, id_col: str = "vec_id",
                    vec_col: str = "embedding", threshold: float = 0.9,
                    n_planes: int = 8, seed: int = 7,
                    dim: int | None = None) -> Dataset:
    """Cosine near-duplicate pairs over a ``list<float>`` column.

    Random-hyperplane LSH (seeded) buckets candidates; exact cosine is
    verified within buckets.  Multi-probe (flip one bit) keeps recall up
    without widening the shuffle much.
    """

    def sign(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        mat = np.array(batch.column(vec_col).to_pylist(), dtype=np.float64)
        if mat.ndim != 2 or mat.size == 0:
            return pa.Table.from_arrays(
                [pa.array([], pa.int64()), pa.array([], pa.int64()),
                 pa.array([], pa.binary())],
                names=[id_col, "bucket", "vec"])
        d = mat.shape[1]
        rng = np.random.default_rng(seed)
        planes = rng.standard_normal((d, n_planes))
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        unit = mat / norms
        bits = (unit @ planes) > 0
        codes = bits @ (1 << np.arange(n_planes))
        id_o, bkt_o, vec_o = [], [], []
        for row, (i, code) in enumerate(zip(ids, codes)):
            probes = {int(code)} | {int(code) ^ (1 << p)
                                    for p in range(n_planes)}
            for pcode in probes:
                id_o.append(i)
                bkt_o.append(pcode)
                vec_o.append(unit[row].tobytes())
        return pa.Table.from_arrays(
            [pa.array(id_o, pa.int64()), pa.array(bkt_o, pa.int64()),
             pa.array(vec_o, pa.binary())],
            names=[id_col, "bucket", "vec"])

    def verify(group: pd.DataFrame) -> pd.DataFrame:
        rows = {"id_a": [], "id_b": [], "cosine": []}
        if len(group) > 1:
            uniq = group.drop_duplicates(subset=[id_col])
            ids = uniq[id_col].to_numpy()
            mat = np.stack([np.frombuffer(v, dtype=np.float64)
                            for v in uniq["vec"]])
            sims = mat @ mat.T
            ia, ib = np.triu_indices(len(ids), k=1)
            mask = sims[ia, ib] >= threshold
            for x, y, s in zip(ia[mask], ib[mask], sims[ia, ib][mask]):
                lo, hi = sorted((int(ids[x]), int(ids[y])))
                rows["id_a"].append(lo)
                rows["id_b"].append(hi)
                rows["cosine"].append(float(s))
        out = pd.DataFrame(rows)
        out["id_a"] = out["id_a"].astype(np.int64)
        out["id_b"] = out["id_b"].astype(np.int64)
        out["cosine"] = out["cosine"].astype(np.float64)
        return out

    pairs = (ds.map_batches(sign, batch_format="pyarrow")
               .groupby("bucket")
               .map_groups(verify, batch_format="pandas"))
    return (pairs.groupby(["id_a", "id_b"])
                 .max("cosine")
                 .map_batches(lambda t: t.rename_columns(
                     ["id_a", "id_b", "cosine"]), batch_format="pyarrow"))
