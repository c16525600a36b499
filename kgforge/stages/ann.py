"""Similarity search over an embedding column (``list<float>``).

- ``brute_force_topk``: exact cosine top-k — the query matrix is
  broadcast once (``ray.put``), each batch does one numpy matmul and
  emits only its LOCAL top-k per query; a single small groupby merges
  partial top-ks.  Shuffle volume is O(queries × k × blocks), never the
  corpus.
- ``ivf_topk``: IVF-style scale path — vectors are assigned to the
  nearest of C seeded centroids (one shuffle key), queries probe the
  ``nprobe`` nearest centroid buckets only.  Approximate; recall
  controlled by nprobe/C.
"""

from __future__ import annotations

import functools as _functools

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
from ray.data import Dataset


def vectors_to_matrix(batch: pa.Table, vec_col: str,
                      dtype=np.float64) -> np.ndarray:
    """``list<float>`` / ``fixed_size_list`` column → ``(n, d)`` matrix
    without a Python list round-trip: reshape the flattened Arrow values
    buffer (zero-copy up to the final dtype cast).  Ragged rows raise —
    embedding columns are fixed-dimension by contract."""
    col = batch.column(vec_col)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.empty((0, 0), dtype=dtype)
    if pa.types.is_fixed_size_list(col.type):
        d = col.type.list_size
        vals = col.flatten().to_numpy(zero_copy_only=False)
        return np.ascontiguousarray(vals.reshape(n, d), dtype=dtype)
    offsets = col.offsets.to_numpy(zero_copy_only=False)
    widths = np.diff(offsets)
    if widths.size and not np.all(widths == widths[0]):
        raise ValueError(f"ragged vector column {vec_col!r}")
    d = int(widths[0]) if widths.size else 0
    vals = col.flatten().to_numpy(zero_copy_only=False)
    return np.ascontiguousarray(vals.reshape(n, d), dtype=dtype)


def _as_matrix(batch: pa.Table, vec_col: str) -> np.ndarray:
    return vectors_to_matrix(batch, vec_col)


def _normalize(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return mat / norms


def brute_force_topk(ds: Dataset, queries: np.ndarray, k: int = 10,
                     id_col: str = "vec_id",
                     vec_col: str = "embedding") -> Dataset:
    """Exact cosine top-k: rows ``(query_id, vec_id, score)``,
    k rows per query, ties broken by ascending ``vec_id``."""
    qmat = _normalize(np.asarray(queries, dtype=np.float64))
    qref = ray.put(qmat)

    def local_topk(batch: pa.Table) -> pa.Table:
        q = ray.get(qref)
        ids = np.asarray(batch.column(id_col).to_pylist(), dtype=np.int64)
        mat = _as_matrix(batch, vec_col)
        if mat.size == 0:
            return pa.Table.from_arrays(
                [pa.array([], pa.int64()), pa.array([], pa.int64()),
                 pa.array([], pa.float64())],
                names=["query_id", id_col, "score"])
        sims = _normalize(mat) @ q.T              # (n, m)
        kk = min(k, sims.shape[0])
        qid_o, id_o, sc_o = [], [], []
        for j in range(sims.shape[1]):
            col = sims[:, j]
            # deterministic partial top-k: sort by (-score, vec_id)
            order = np.lexsort((ids, -col))[:kk]
            qid_o.extend([j] * len(order))
            id_o.extend(ids[order].tolist())
            sc_o.extend(col[order].tolist())
        return pa.Table.from_arrays(
            [pa.array(qid_o, pa.int64()), pa.array(id_o, pa.int64()),
             pa.array(sc_o, pa.float64())],
            names=["query_id", id_col, "score"])

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["score", id_col],
                              ascending=[False, True]).head(k)
        return g.reset_index(drop=True)

    return (ds.map_batches(local_topk, batch_format="pyarrow")
              .groupby("query_id")
              .map_groups(merge, batch_format="pandas"))


def _kmeans_centroids(sample: np.ndarray, n_centroids: int, seed: int,
                      n_iter: int) -> np.ndarray:
    """Seeded spherical k-means (Lloyd's, fixed iterations) on a
    unit-normalized sample — deterministic: seeded init, deterministic
    argmax assignment, empty clusters keep their previous centroid."""
    rng = np.random.default_rng(seed)
    idx = rng.choice(len(sample), size=n_centroids, replace=False)
    c = sample[idx]
    for _ in range(n_iter):
        assign = np.argmax(sample @ c.T, axis=1)
        new = np.empty_like(c)
        for j in range(n_centroids):
            members = sample[assign == j]
            new[j] = members.sum(axis=0) if len(members) else c[j]
        c = _normalize(new)
    return c


def ivf_topk(ds: Dataset, queries: np.ndarray, k: int = 10,
             n_centroids: int = 16, nprobe: int = 4, seed: int = 31,
             id_col: str = "vec_id", vec_col: str = "embedding",
             dim: int | None = None, train_iters: int = 8,
             train_sample: int = 65536, n_assign: int = 1) -> Dataset:
    """IVF-bucketed approximate top-k.

    Centroids come from a seeded spherical k-means pass over a bounded
    prefix sample (``train_sample`` rows streamed once, Lloyd's for
    ``train_iters`` iterations on the driver, result broadcast) — same
    dataflow as untrained centroids, roughly double the recall at equal
    nprobe.  ``train_iters=0`` falls back to a seeded random rotation of
    the unit sphere.  Each vector shuffles into its ``n_assign`` nearest
    centroid buckets (multiple assignment: index is ``n_assign``× bigger,
    recall at equal nprobe rises sharply on weakly-clustered data); each
    query searches its ``nprobe`` nearest buckets inside ``map_groups``
    and the merge deduplicates multi-assigned hits.
    """
    qmat = _normalize(np.asarray(queries, dtype=np.float64))
    d = dim or qmat.shape[1]
    sample = None
    if train_iters > 0:
        rows, tot = [], 0
        for batch in ds.select_columns([vec_col]).iter_batches(
                batch_size=8192, batch_format="pyarrow"):
            m = vectors_to_matrix(batch, vec_col)
            if m.size:
                rows.append(m)
                tot += len(m)
            if tot >= train_sample:
                break
        if rows:
            sample = _normalize(np.vstack(rows)[:train_sample])
    if sample is not None and len(sample) >= n_centroids:
        centroids = _kmeans_centroids(sample, n_centroids, seed,
                                      train_iters)
    else:
        rng = np.random.default_rng(seed)
        centroids = _normalize(rng.standard_normal((n_centroids, d)))
    q_assign = np.argsort(-(qmat @ centroids.T), axis=1)[:, :nprobe]
    # bucket -> query ids probing it
    probes: dict[int, list[int]] = {}
    for qid, buckets in enumerate(q_assign):
        for b in buckets:
            probes.setdefault(int(b), []).append(qid)
    cref = ray.put(centroids)
    qref = ray.put(qmat)
    pref = ray.put(probes)

    def assign(batch: pa.Table) -> pa.Table:
        cents = ray.get(cref)
        ids = np.asarray(batch.column(id_col).to_pylist(), dtype=np.int64)
        mat = _as_matrix(batch, vec_col)
        if mat.size == 0:
            return pa.Table.from_arrays(
                [pa.array([], pa.int64()), pa.array([], pa.int64()),
                 pa.array([], pa.binary())],
                names=[id_col, "centroid", "vec"])
        unit = _normalize(mat)
        sims = unit @ cents.T
        if n_assign <= 1:
            cent = np.argmax(sims, axis=1)[:, None]
        else:
            cent = np.argsort(-sims, axis=1)[:, :n_assign]
        n_rep = cent.shape[1]
        rep_ids = np.repeat(ids, n_rep)
        vecs = [v.tobytes() for v in unit for _ in range(n_rep)]
        return pa.Table.from_arrays(
            [pa.array(rep_ids, pa.int64()),
             pa.array(cent.reshape(-1).astype(np.int64), pa.int64()),
             pa.array(vecs, pa.binary())],
            names=[id_col, "centroid", "vec"])

    def search(group: pd.DataFrame) -> pd.DataFrame:
        probing = ray.get(pref)
        q = ray.get(qref)
        bucket = int(group["centroid"].iloc[0])
        qids = probing.get(bucket, [])
        rows = {"query_id": [], id_col: [], "score": []}
        if qids:
            ids = group[id_col].to_numpy()
            mat = np.stack([np.frombuffer(v, dtype=np.float64)
                            for v in group["vec"]])
            sims = mat @ q[qids].T
            kk = min(k, len(ids))
            for col_idx, qid in enumerate(qids):
                col = sims[:, col_idx]
                order = np.lexsort((ids, -col))[:kk]
                rows["query_id"].extend([qid] * len(order))
                rows[id_col].extend(ids[order].tolist())
                rows["score"].extend(col[order].tolist())
        out = pd.DataFrame(rows)
        out["query_id"] = out["query_id"].astype(np.int64)
        out[id_col] = out[id_col].astype(np.int64)
        out["score"] = out["score"].astype(np.float64)
        return out

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        # a multi-assigned vector can surface from several probed
        # buckets — dedup before head(k) or it double-counts
        return (group.sort_values(["score", id_col],
                                  ascending=[False, True])
                .drop_duplicates(subset=[id_col]).head(k)
                .reset_index(drop=True))

    return (ds.map_batches(assign, batch_format="pyarrow")
              .groupby("centroid")
              .map_groups(search, batch_format="pandas")
              .groupby("query_id")
              .map_groups(merge, batch_format="pandas"))


def kmeans_assign_fixed(ds: Dataset, k: int = 8, n_iter: int = 3,
                        vec_col: str = "embedding",
                        id_col: str = "vec_id",
                        scale: int = 1_000_000,
                        include_dist: bool = False) -> Dataset:
    """Deterministic distributed k-means corpus clustering (the data-
    mixing / SemDeDup-prep primitive) — EXACTLY SQL-oracle-able because
    every step is integer or exactly-representable-double arithmetic:

    - quantize: each component ``q = floor(float64(x) * scale)`` int64
      (floor form — never ``round`` on possibly-negative floats);
    - init: the embeddings of the ``k`` SMALLEST ids, centroid index =
      ascending-id rank (no RNG; byte-identical re-runs);
    - assign: argmin of the integer squared L2 distance, ties broken by
      the smaller centroid index (``np.argmin`` first-hit == the SQL
      ``row_number() ORDER BY dist, cidx`` rule);
    - update: elementwise ``floor(sum / count)`` computed in float64 —
      DuckDB ``//`` TRUNCATES toward zero while numpy floors, so both
      sides use the IEEE double division + floor on exactly-
      representable integers (|component sum| < 2^53 by the runtime
      guard below); an empty cluster keeps its previous centroid.

    Dataflow (Ray-Data-first): centroids are a tiny (k, d) int64 matrix
    broadcast per pass; each ``map_batches`` task emits ≤ k partial rows
    (cluster, count, component-sum list) — the classic combiner, so the
    per-iteration exchange is O(k·d·blocks), never the corpus.  The
    driver holds only the k×d reduce.  n_iter+1 dataset passes total:
    at 100 TB materialize the quantized (id, qvec) projection once
    upstream and feed it here.

    No reference counterpart (net-new training-data op); companion of
    ``ivf_topk``'s float k-means (ann.py:101) which trades exactness
    for recall tuning."""
    qds, cent = _kmeans_fit(ds, k=k, n_iter=n_iter, vec_col=vec_col,
                            id_col=id_col, scale=scale)

    def final_assign(batch: pa.Table, c=cent) -> pa.Table:
        mat = vectors_to_matrix(batch, "qvec", dtype=np.int64)
        a = _assign_ids(mat, c)
        cols = {id_col: batch.column(id_col),
                "cluster": pa.array(a, pa.int64())}
        if include_dist:
            x2 = np.sum(mat * mat, axis=1, dtype=np.int64)
            c2 = np.sum(c * c, axis=1, dtype=np.int64)
            cross = np.einsum("nd,nd->n", mat, c[a], dtype=np.int64)
            cols["dist"] = pa.array(x2 - 2 * cross + c2[a], pa.int64())
        return pa.table(cols)

    return qds.map_batches(final_assign, batch_format="pyarrow")


def _assign_ids(mat: np.ndarray, c: np.ndarray) -> np.ndarray:
    # (n, k) integer squared L2 via ||x||^2 - 2x.c + ||c||^2; all
    # int64, exact (guarded), argmin first-hit = smallest index
    x2 = np.sum(mat * mat, axis=1, dtype=np.int64)[:, None]
    c2 = np.sum(c * c, axis=1, dtype=np.int64)[None, :]
    cross = mat @ c.T            # int64 matmul, exact
    dist = x2 - 2 * cross + c2
    return np.argmin(dist, axis=1).astype(np.int64)


def _kmeans_fit(ds: Dataset, k: int, n_iter: int, vec_col: str,
                id_col: str, scale: int) -> tuple[Dataset, np.ndarray]:
    """Shared fit for :func:`kmeans_assign_fixed` /
    :func:`semantic_dedup`: returns the materialized quantized
    projection ``(id, qvec)`` and the final (k, d) int64 centroid
    matrix (the tiny broadcastable state)."""
    if not (1 <= k <= 4096):
        raise ValueError(f"k={k} out of range")

    def quantize(batch: pa.Table) -> pa.Table:
        mat = vectors_to_matrix(batch, vec_col, dtype=np.float64)
        q = np.floor(mat * scale).astype(np.int64)
        return pa.table({
            id_col: batch.column(id_col),
            "qvec": pa.FixedSizeListArray.from_arrays(
                pa.array(q.reshape(-1), pa.int64()), q.shape[1]),
        })

    qds = ds.map_batches(quantize, batch_format="pyarrow").materialize()

    # ---- init: embeddings of the k smallest ids (per-block bottom-k
    # combiner; only blocks*k tiny rows reach the driver) ----
    def local_bottomk(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="stable")[:k]
        return batch.take(pa.array(order, pa.int64()))

    seed_rows = (qds.map_batches(local_bottomk, batch_format="pyarrow")
                 .take_all())
    seed_rows.sort(key=lambda r: r[id_col])
    cent = np.asarray([list(r["qvec"]) for r in seed_rows[:k]],
                      dtype=np.int64)
    kk, d = cent.shape
    if kk < k:
        raise ValueError(f"k={k} but only {kk} vectors")

    for _ in range(n_iter):
        cen = cent  # rebind for closure capture by value semantics

        def partials(batch: pa.Table, c=cen) -> pa.Table:
            mat = vectors_to_matrix(batch, "qvec", dtype=np.int64)
            a = _assign_ids(mat, c)
            sums = np.zeros((k, d), dtype=np.int64)
            np.add.at(sums, a, mat)
            cnt = np.bincount(a, minlength=k).astype(np.int64)
            nz = np.flatnonzero(cnt)
            return pa.table({
                "cidx": pa.array(nz, pa.int64()),
                "cnt": pa.array(cnt[nz], pa.int64()),
                "sums": pa.FixedSizeListArray.from_arrays(
                    pa.array(sums[nz].reshape(-1), pa.int64()), d),
            })

        rows = (qds.map_batches(partials, batch_format="pyarrow")
                .take_all())
        sums = np.zeros((k, d), dtype=np.int64)
        cnt = np.zeros(k, dtype=np.int64)
        for r in rows:
            sums[r["cidx"]] += np.asarray(list(r["sums"]), dtype=np.int64)
            cnt[r["cidx"]] += r["cnt"]
        if np.abs(sums).max(initial=0) >= 2 ** 53:
            raise OverflowError("component sum exceeds exact-double "
                                "range; lower `scale` or shard the "
                                "update")
        new = cent.copy()
        nz = cnt > 0
        new[nz] = np.floor(sums[nz].astype(np.float64)
                           / cnt[nz, None]).astype(np.int64)
        cent = new

    return qds, cent


_HEX_EVEN = frozenset("02468ace")


@_functools.lru_cache(maxsize=8)
def _rp_sign_matrix(d: int, out_dim: int, salt: str) -> np.ndarray:
    """Deterministic ±1 sign matrix: ``s[i, j] = +1`` iff the first hex
    digit of ``md5(f"{i+1}:{j}:{salt}")`` is even (input dims 1-based to
    match SQL ``generate_subscripts``).  Derived, never shipped — every
    task rebuilds the same d×k matrix from the formula."""
    import hashlib
    s = np.empty((d, out_dim), dtype=np.int64)
    for i in range(d):
        for j in range(out_dim):
            h = hashlib.md5(f"{i + 1}:{j}:{salt}".encode()).hexdigest()
            s[i, j] = 1 if h[0] in _HEX_EVEN else -1
    return s


def random_projection_fixed(ds: Dataset, out_dim: int = 8,
                            vec_col: str = "embedding",
                            id_col: str = "vec_id",
                            scale: int = 1_000_000,
                            salt: str = "rp") -> Dataset:
    """Deterministic signed random projection (Achlioptas ±1 variant)
    — the dimensionality-reduction step before ANN / LSH at scale:
    ``y = floor(x * scale) @ S`` with ``S ∈ {±1}^{d×k}`` derived from
    md5, so the output is integer-EXACT and SQL-oracle-able (the
    oracle rebuilds S from the same md5 parity rule and re-derives the
    sums).  Zero shuffle: one ``map_batches`` pass, the d×k sign
    matrix is rebuilt from the formula inside each task (no broadcast
    object at all), and each int64 component is a sum of d terms
    |v| <= scale·|x| so overflow needs d·scale·max|x| >= 2^63 —
    unreachable for unit-scale embeddings.

    Output: ``(id, p0..p{k-1})`` int64.  No reference counterpart
    (net-new training-data op)."""
    if not (1 <= out_dim <= 256):
        raise ValueError(f"out_dim={out_dim} out of range")

    def project(batch: pa.Table) -> pa.Table:
        cols: dict[str, pa.Array] = {id_col: batch.column(id_col)}
        if batch.num_rows == 0:
            for j in range(out_dim):
                cols[f"p{j}"] = pa.array([], pa.int64())
            return pa.table(cols)
        mat = vectors_to_matrix(batch, vec_col, dtype=np.float64)
        q = np.floor(mat * scale).astype(np.int64)
        sgn = _rp_sign_matrix(q.shape[1], out_dim, salt)
        y = q @ sgn
        for j in range(out_dim):
            cols[f"p{j}"] = pa.array(y[:, j], pa.int64())
        return pa.table(cols)

    return ds.map_batches(project, batch_format="pyarrow")


def kmeans_medoids(ds: Dataset, k: int = 8, n_iter: int = 3,
                   vec_col: str = "embedding", id_col: str = "vec_id",
                   scale: int = 1_000_000) -> Dataset:
    """Per-cluster representative selection after
    :func:`kmeans_assign_fixed`: the member CLOSEST to its final
    centroid (integer squared L2; ties broken by the smallest id) — the
    SemDeDup/"typical example" primitive.  The per-cluster argmin is an
    in-block combiner (≤ k rows leave each block), merged on the driver
    (k rows total) — no extra shuffle beyond the assignment passes."""
    assign = kmeans_assign_fixed(ds, k=k, n_iter=n_iter,
                                 vec_col=vec_col, id_col=id_col,
                                 scale=scale, include_dist=True)

    def local_min(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "cluster": t.column("cluster").to_numpy(zero_copy_only=False),
            id_col: t.column(id_col).to_numpy(zero_copy_only=False),
            "dist": t.column("dist").to_numpy(zero_copy_only=False)})
        win = (df.sort_values(["cluster", "dist", id_col])
               .groupby("cluster", sort=False).head(1))
        return pa.table({
            "cluster": pa.array(win["cluster"].to_numpy(np.int64),
                                pa.int64()),
            id_col: pa.array(win[id_col].to_numpy(np.int64), pa.int64()),
            "dist": pa.array(win["dist"].to_numpy(np.int64), pa.int64())})

    parts = assign.map_batches(local_min, batch_format="pyarrow") \
                  .to_pandas()
    win = (parts.sort_values(["cluster", "dist", id_col])
           .groupby("cluster", sort=False).head(1)
           .sort_values("cluster").reset_index(drop=True))
    return ray.data.from_arrow(pa.table({
        "cluster": pa.array(win["cluster"].to_numpy(np.int64),
                            pa.int64()),
        id_col: pa.array(win[id_col].to_numpy(np.int64), pa.int64()),
        "dist": pa.array(win["dist"].to_numpy(np.int64), pa.int64())}))


def scalar_quantize_int8(ds: Dataset, id_col: str = "vec_id",
                         vec_col: str = "embedding",
                         scale: int = 1_000_000) -> Dataset:
    """Scalar int8 quantization of an embedding column — the memory-
    compression step that makes billion-vector ANN serving fit in RAM
    (4 bytes/dim -> 1): per-dimension min/max over the corpus, then
    ``code = ((xq - min_q) * 255) // max(range_q, 1)`` with
    ``xq = floor(float64(x) * scale)`` so every operation after the
    one float multiply is integer and the codes are bit-exact vs the
    SQL oracle.

    Shape: pass 1 folds per-batch per-dim (min, max) int64 partials —
    ``blocks × d`` tiny rows reach the driver, never the vectors; the
    d-sized arrays ride to pass 2 in the task closure (a few KB).  Both
    passes stream; the vectors are never exchanged at all.

    Output ``(id, codes: list<int64> in [0, 255])``.  No reference
    counterpart; net-new ANN-infrastructure op."""

    def mm_partial(t: pa.Table) -> pa.Table:
        mat = vectors_to_matrix(t, vec_col, dtype=np.float64)
        if mat.size == 0:
            return pa.table({"dim": pa.array([], pa.int64()),
                             "mn": pa.array([], pa.int64()),
                             "mx": pa.array([], pa.int64())})
        q = np.floor(mat * scale).astype(np.int64)
        return pa.table({
            "dim": pa.array(np.arange(q.shape[1], dtype=np.int64)),
            "mn": pa.array(q.min(axis=0), pa.int64()),
            "mx": pa.array(q.max(axis=0), pa.int64())})

    parts = ds.map_batches(mm_partial, batch_format="pyarrow").to_pandas()
    if len(parts) == 0:
        raise ValueError("scalar_quantize_int8: empty input")
    agg = parts.groupby("dim").agg(mn=("mn", "min"), mx=("mx", "max"))
    mn = agg["mn"].to_numpy(np.int64)
    rng = np.maximum(agg["mx"].to_numpy(np.int64) - mn, 1)

    def encode(t: pa.Table) -> pa.Table:
        mat = vectors_to_matrix(t, vec_col, dtype=np.float64)
        if mat.size == 0:
            # empty block: vectors_to_matrix returns (0, 0), which
            # would mis-broadcast against the (d,) min/range vectors
            return pa.table({
                id_col: t.column(id_col),
                "codes": pa.FixedSizeListArray.from_arrays(
                    pa.array([], pa.int64()), len(mn))})
        q = np.floor(mat * scale).astype(np.int64)
        codes = ((q - mn) * 255) // rng
        return pa.table({
            id_col: t.column(id_col),
            "codes": pa.FixedSizeListArray.from_arrays(
                pa.array(codes.reshape(-1), pa.int64()),
                codes.shape[1])})

    return ds.map_batches(encode, batch_format="pyarrow")
