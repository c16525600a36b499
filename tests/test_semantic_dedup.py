"""SemDeDup (round 5) — engine vs a plain-Python re-derivation of the
documented semantics (cluster, then within-cluster smaller-id cosine
dominance), plus the planted-dup bite check the gate query relies on."""
import numpy as np
import pyarrow as pa
import ray

from kgforge.stages.dedup import semantic_dedup
from tests.test_kmeans import _ref_kmeans


def _ds(ids, mat):
    return ray.data.from_arrow(pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array([row.tolist() for row in mat],
                              pa.list_(pa.float64())),
    }))


def _ref_semdedup(ids, mat, k, n_iter, threshold):
    clusters = _ref_kmeans(ids, mat, k, n_iter)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    u = mat / norms
    kept = {}
    order = np.argsort(ids, kind="stable")
    for c in sorted(set(clusters.tolist())):
        rows = [i for i in order if clusters[i] == c]
        for pos, j in enumerate(rows):
            kept[int(ids[j])] = not any(
                float(u[i] @ u[j]) >= threshold for i in rows[:pos])
    return {int(i): int(c) for i, c in zip(ids, clusters)}, kept


def test_matches_plain_python_reference():
    rng = np.random.default_rng(17)
    mat = rng.normal(size=(150, 12)).astype(np.float64)
    # plant near-dup chains so the dominance rule actually fires
    for i in range(10):
        mat[100 + i] = 0.97 * mat[i] + 0.03 * mat[i + 1]
    ids = (rng.permutation(150).astype(np.int64) * 7 + 3)
    out = (semantic_dedup(_ds(ids, mat), k=6, n_iter=2, threshold=0.9)
           .to_pandas().sort_values("vec_id").reset_index(drop=True))
    want_cl, want_kept = _ref_semdedup(ids, mat, 6, 2, 0.9)
    assert len(out) == len(ids)
    for _, r in out.iterrows():
        assert want_cl[int(r["vec_id"])] == int(r["cluster"])
        assert want_kept[int(r["vec_id"])] == bool(r["kept"])
    assert not out["kept"].all()          # the pruning bit


def test_every_row_survives_when_no_pair_clears_threshold():
    rng = np.random.default_rng(5)
    mat = rng.normal(size=(40, 8))
    ids = np.arange(40, dtype=np.int64)
    out = semantic_dedup(_ds(ids, mat), k=4, n_iter=1,
                         threshold=0.999999).to_pandas()
    assert out["kept"].all()
    assert len(out) == 40
