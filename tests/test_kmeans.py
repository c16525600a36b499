"""Deterministic integer k-means (round 5) — engine vs an independent
dense-numpy re-derivation, plus the edge cases the SQL oracle relies on
(empty-cluster carry, tie-break by centroid index, id-based init)."""
import numpy as np
import pyarrow as pa
import pytest
import ray

from kgforge.stages.ann import kmeans_assign_fixed

SCALE = 1_000_000


def _ref_kmeans(ids, mat, k, n_iter):
    """Plain dense replication of the documented algorithm."""
    q = np.floor(mat.astype(np.float64) * SCALE).astype(np.int64)
    order = np.argsort(ids, kind="stable")
    cent = q[order[:k]].copy()
    for _ in range(n_iter):
        dist = ((q[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        a = np.argmin(dist, axis=1)
        for c in range(k):
            m = a == c
            if m.any():
                cent[c] = np.floor(
                    q[m].sum(axis=0).astype(np.float64) / m.sum()
                ).astype(np.int64)
    dist = ((q[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
    return np.argmin(dist, axis=1).astype(np.int64)


def _ds(ids, mat):
    return ray.data.from_arrow(pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array([row.tolist() for row in mat],
                              pa.list_(pa.float32())),
    }))


def _run(ids, mat, k, n_iter):
    out = (kmeans_assign_fixed(_ds(ids, mat), k=k, n_iter=n_iter)
           .to_pandas().sort_values("vec_id").reset_index(drop=True))
    return out


def test_matches_dense_reference():
    rng = np.random.default_rng(7)
    mat = rng.normal(size=(200, 16)).astype(np.float32)
    ids = rng.permutation(200).astype(np.int64) * 3 + 1
    out = _run(ids, mat, k=8, n_iter=3)
    want = _ref_kmeans(ids, mat, 8, 3)
    got = dict(zip(out["vec_id"], out["cluster"]))
    assert all(got[i] == w for i, w in zip(ids, want))


def test_init_uses_smallest_ids_not_row_order():
    rng = np.random.default_rng(3)
    mat = rng.normal(size=(50, 8)).astype(np.float32)
    ids = np.arange(50, dtype=np.int64)
    base = _run(ids, mat, k=4, n_iter=2)
    # shuffling row order must not change anything (init is by id)
    perm = rng.permutation(50)
    shuf = _run(ids[perm], mat[perm], k=4, n_iter=2)
    assert base.equals(shuf)


def test_empty_cluster_keeps_previous_centroid():
    # 3 distinct points, k=4: cluster 3's seed is a duplicate of a
    # closer centroid so it never wins an assignment — the update must
    # carry its previous centroid instead of crashing / zeroing it
    mat = np.array([[0.0, 0.0], [10.0, 10.0], [20.0, 20.0],
                    [0.0, 0.0], [10.0, 10.0], [20.0, 20.0]],
                   dtype=np.float32)
    ids = np.arange(6, dtype=np.int64)
    out = _run(ids, mat, k=4, n_iter=3)
    want = _ref_kmeans(ids, mat, 4, 3)
    assert list(out["cluster"]) == list(want)
    # the duplicate seed (id 3 == id 0's point) loses every tie to
    # centroid 0, so cluster 3 must be empty
    assert 3 not in set(out["cluster"])


def test_tiebreak_prefers_smaller_centroid_index():
    # a point exactly equidistant from two centroids lands on the
    # smaller index (np.argmin first hit == SQL ORDER BY dist, cidx)
    mat = np.array([[0.0], [2.0], [1.0]], dtype=np.float32)
    ids = np.array([0, 1, 2], dtype=np.int64)
    out = _run(ids, mat, k=2, n_iter=1)
    assert int(out.loc[out["vec_id"] == 2, "cluster"].iloc[0]) == 0


def test_k_larger_than_corpus_raises():
    mat = np.zeros((3, 4), dtype=np.float32)
    with pytest.raises(ValueError, match="only 3 vectors"):
        _run(np.arange(3, dtype=np.int64), mat, k=5, n_iter=1)


def test_medoids_match_dense_reference():
    from kgforge.stages.ann import kmeans_medoids
    rng = np.random.default_rng(19)
    mat = rng.normal(size=(120, 12)).astype(np.float32)
    ids = rng.permutation(120).astype(np.int64) * 7 + 3
    out = (kmeans_medoids(_ds(ids, mat), k=6, n_iter=2)
           .to_pandas().sort_values("cluster").reset_index(drop=True))
    # dense reference: recompute final centroids, take per-cluster
    # (dist, id) argmin
    q = np.floor(mat.astype(np.float64) * SCALE).astype(np.int64)
    order = np.argsort(ids, kind="stable")
    cent = q[order[:6]].copy()
    for _ in range(2):
        dist = ((q[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        a = np.argmin(dist, axis=1)
        for c in range(6):
            m = a == c
            if m.any():
                cent[c] = np.floor(
                    q[m].sum(axis=0).astype(np.float64) / m.sum()
                ).astype(np.int64)
    dist = ((q[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
    a = np.argmin(dist, axis=1)
    dsel = dist[np.arange(len(ids)), a]
    ref = {}
    for c in sorted(set(a)):
        m = np.flatnonzero(a == c)
        best = m[np.lexsort((ids[m], dsel[m]))[0]]
        ref[c] = (ids[best], dsel[best])
    got = {int(r.cluster): (int(r.vec_id), int(r.dist))
           for r in out.itertuples()}
    assert got == ref
