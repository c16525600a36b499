"""Deterministic label-propagation communities (round 5).

Engine (driver path) vs an independent dict-based reference, the
driver/distributed path parity pin, multigraph dedup semantics, and
uint64-id safety above 2^63.
"""
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray

from kgforge.stages.graph import (label_propagation_distributed,
                                  label_propagation_fixed)


def _ref_lpa(pairs, n_iter):
    """Plain-python synchronous LPA over the DISTINCT undirected edge
    set: most frequent neighbour label, ties to the smallest label."""
    pairs = {(min(a, b), max(a, b)) for a, b in pairs if a != b}
    nodes = sorted({x for e in pairs for x in e})
    nbrs = {x: set() for x in nodes}
    for a, b in pairs:
        nbrs[a].add(b)
        nbrs[b].add(a)
    lab = {x: x for x in nodes}
    for _ in range(n_iter):
        new = {}
        for x in nodes:
            cnt = {}
            for v in nbrs[x]:
                cnt[lab[v]] = cnt.get(lab[v], 0) + 1
            new[x] = sorted(cnt.items(),
                            key=lambda kv: (-kv[1], kv[0]))[0][0]
        lab = new
    return lab


def _edges_ds(pairs):
    return ray.data.from_arrow(pa.table({
        "src_id": pa.array([a for a, _ in pairs], pa.uint64()),
        "dst_id": pa.array([b for _, b in pairs], pa.uint64())}))


def _check(pairs, n_iter, **kw):
    out = label_propagation_fixed(_edges_ds(pairs), n_iter=n_iter,
                                  mode="driver", **kw)
    want = _ref_lpa(pairs, n_iter)
    got = dict(zip(out["node_id"].astype(np.uint64),
                   out["community"].astype(np.uint64)))
    assert got == want
    return out


def test_two_cliques_with_bridge():
    cl1 = [(1, 2), (1, 3), (2, 3)]
    cl2 = [(10, 11), (10, 12), (11, 12)]
    _check(cl1 + cl2 + [(3, 10)], n_iter=5)


def test_randomized_reference_parity():
    rng = np.random.default_rng(11)
    pairs = [(int(a), int(b)) for a, b in
             rng.integers(0, 60, size=(300, 2)) if a != b]
    _check(pairs, n_iter=4)


def test_multigraph_duplicates_do_not_inflate_votes():
    # node 1's neighbours: 2 (edge repeated 3x) and 3, 4 (once each).
    # With dedup (the contract) round 1 gives label 2 only by the
    # smallest-label tie-break over {2, 3, 4} — a multiset count would
    # have made 2 win by frequency, same answer here, so check node 5
    # whose tie flips: neighbours {6 x3, 2 x1} -> dedup winner is 2
    # (tie, smaller), multiset winner would be 6
    pairs = [(1, 2), (1, 2), (1, 2), (1, 3), (1, 4),
             (5, 6), (5, 6), (5, 6), (2, 5)]
    out = _check(pairs, n_iter=1)
    got = dict(zip(out["node_id"], out["community"]))
    assert got[5] == 2


def test_bipartite_oscillation_is_deterministic():
    # complete bipartite K2,2: sync LPA flips sides each round — the
    # fixed unroll must still be deterministic and match the reference
    pairs = [(1, 10), (1, 11), (2, 10), (2, 11)]
    for it in (1, 2, 3):
        _check(pairs, n_iter=it)


def test_distributed_path_bit_identical():
    rng = np.random.default_rng(5)
    base = 2 ** 63
    pairs = [(base + int(a), base + int(b)) for a, b in
             rng.integers(0, 40, size=(150, 2)) if a != b]
    drv = (label_propagation_fixed(_edges_ds(pairs), n_iter=5,
                                   mode="driver")
           .sort_values("node_id").reset_index(drop=True))
    dst = (label_propagation_distributed(_edges_ds(pairs), n_iter=5,
                                         n_buckets=8)
           .to_pandas().sort_values("node_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(drv, dst, check_exact=True)


def test_auto_mode_returns_dataset():
    out = label_propagation_fixed(_edges_ds([(1, 2), (2, 3)]), n_iter=2)
    assert isinstance(out, ray.data.Dataset)


def test_empty_edges():
    empty = ray.data.from_arrow(pa.table({
        "src_id": pa.array([], pa.uint64()),
        "dst_id": pa.array([], pa.uint64())}))
    out = label_propagation_fixed(empty, n_iter=2, mode="driver")
    assert len(out) == 0


def test_bad_args():
    with pytest.raises(ValueError, match="n_iter"):
        label_propagation_fixed(_edges_ds([(1, 2)]), n_iter=0)
    with pytest.raises(ValueError, match="unknown mode"):
        label_propagation_fixed(_edges_ds([(1, 2)]), mode="nope")


def test_community_stats_modularity_exact():
    from kgforge.stages.graph import community_stats
    # two triangles joined by one bridge: communities = the triangles
    pairs = [(1, 2), (1, 3), (2, 3), (10, 11), (10, 12), (11, 12),
             (3, 10)]
    comms = label_propagation_fixed(_edges_ds(pairs), n_iter=5,
                                    mode="driver")
    out = (community_stats(_edges_ds(pairs), comms)
           .to_pandas().sort_values("community").reset_index(drop=True))
    # m = 7 edges; each triangle: e_in = 3, d_tot = 7 (bridge node has
    # degree 3+1) -> q_num = 4*7*3 - 49 = 35
    assert list(out["n_nodes"]) == [3, 3]
    assert list(out["e_in"]) == [3, 3]
    assert list(out["d_tot"]) == [7, 7]
    assert list(out["q_num"]) == [35, 35]
    assert all(abs(v - 35 / 196) < 1e-15
               for v in out["modularity_term"])


def test_community_stats_multigraph_dedup():
    from kgforge.stages.graph import community_stats
    # after ONE sync round on a single edge the labels swap: two
    # singleton communities over one distinct edge (m must be 1, not
    # 3 — the dedup under test)
    comms = label_propagation_fixed(
        _edges_ds([(1, 2), (1, 2), (2, 1)]), n_iter=1, mode="driver")
    out = (community_stats(_edges_ds([(1, 2), (1, 2), (2, 1)]), comms)
           .to_pandas().sort_values("community").reset_index(drop=True))
    assert list(out["n_nodes"]) == [1, 1]
    assert list(out["e_in"]) == [0, 0]
    assert list(out["d_tot"]) == [1, 1]
    # m = 1 (deduped): q_num = 4*1*0 - 1 = -1; a multiset m of 3 would
    # have given -1 too for e_in=0 but d_tot would be 3 -> -9
    assert list(out["q_num"]) == [-1, -1]


def test_bucket_exchange_path_bit_identical_to_driver_fold():
    # driver_fold_edge_limit=0 forces the per-round coarse-bucket
    # exchange; default folds votes on the driver — same winners
    rng = np.random.default_rng(7)
    pairs = [(int(a), int(b)) for a, b in
             rng.integers(0, 50, size=(200, 2)) if a != b]
    a = label_propagation_fixed(_edges_ds(pairs), n_iter=4,
                                mode="driver")
    b = label_propagation_fixed(_edges_ds(pairs), n_iter=4,
                                mode="driver",
                                driver_fold_edge_limit=0)
    pd.testing.assert_frame_equal(a.reset_index(drop=True),
                                  b.reset_index(drop=True))
