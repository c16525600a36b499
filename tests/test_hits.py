"""Fixed-point HITS (round 5) — engine vs a plain-numpy re-derivation,
driver/distributed path parity, and the degenerate shapes the SQL
oracle relies on (sink/source nodes, parallel edges, empty input)."""
import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from kgforge.stages.graph import hits_fixed, hits_fixed_distributed

S = 1 << 20


def _edges_ds(src, dst):
    return ray.data.from_arrow(pa.table({
        "src_id": pa.array(np.asarray(src, np.uint64), pa.uint64()),
        "dst_id": pa.array(np.asarray(dst, np.uint64), pa.uint64())}))


def _ref_hits(src, dst, n_iter):
    nodes = np.unique(np.concatenate([src, dst]))
    idx = {int(v): i for i, v in enumerate(nodes)}
    si = np.array([idx[int(v)] for v in src], np.int64)
    di = np.array([idx[int(v)] for v in dst], np.int64)
    h = np.full(len(nodes), S, object)          # python ints: no overflow
    a = np.zeros(len(nodes), object)
    for _ in range(n_iter):
        a_raw = np.zeros(len(nodes), object)
        for s, d in zip(si, di):
            a_raw[d] += h[s]
        tot = max(int(a_raw.sum()), 1)
        a = np.array([(int(x) * S) // tot for x in a_raw], object)
        h_raw = np.zeros(len(nodes), object)
        for s, d in zip(si, di):
            h_raw[s] += a[d]
        tot = max(int(h_raw.sum()), 1)
        h = np.array([(int(x) * S) // tot for x in h_raw], object)
    return nodes, h.astype(np.int64), a.astype(np.int64)


def _rand_graph(seed, n=40, m=200):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, m).astype(np.uint64) * 5 + 2
    dst = rng.integers(0, n, m).astype(np.uint64) * 5 + 2
    return src, dst


def test_matches_plain_python_reference():
    src, dst = _rand_graph(11)
    out = (hits_fixed(_edges_ds(src, dst), n_iter=4, mode="driver")
           .sort_values("node_id").reset_index(drop=True))
    nodes, h, a = _ref_hits(src, dst, 4)
    assert np.array_equal(out["node_id"].to_numpy(np.uint64), nodes)
    assert np.array_equal(out["hub_fixed"].to_numpy(np.int64), h)
    assert np.array_equal(out["auth_fixed"].to_numpy(np.int64), a)
    assert np.allclose(out["hub"], h / S)      # exact dyadics
    assert (out["auth_fixed"] > 0).any() and (out["hub_fixed"] > 0).any()


def test_distributed_path_bit_identical():
    src, dst = _rand_graph(23, n=30, m=120)
    drv = (hits_fixed(_edges_ds(src, dst), n_iter=3, mode="driver")
           .sort_values("node_id").reset_index(drop=True))
    dist = (hits_fixed_distributed(_edges_ds(src, dst), n_iter=3)
            .to_pandas().sort_values("node_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(drv, dist, check_dtype=False)


def test_auto_mode_returns_dataset_on_both_paths():
    src, dst = _rand_graph(7, n=10, m=30)
    small = hits_fixed(_edges_ds(src, dst), n_iter=2, mode="auto")
    forced = hits_fixed(_edges_ds(src, dst), n_iter=2, mode="auto",
                        driver_node_limit=1)
    assert isinstance(small, ray.data.Dataset)
    assert isinstance(forced, ray.data.Dataset)
    pd.testing.assert_frame_equal(
        small.to_pandas().sort_values("node_id").reset_index(drop=True),
        forced.to_pandas().sort_values("node_id").reset_index(drop=True),
        check_dtype=False)


def test_sink_and_source_nodes_get_zero_sides():
    # 1 -> 2: node 1 is a pure hub (authority 0), node 2 a pure
    # authority (hub 0)
    out = (hits_fixed(_edges_ds([1], [2]), n_iter=3, mode="driver")
           .set_index("node_id"))
    assert out.loc[1, "auth_fixed"] == 0
    assert out.loc[2, "hub_fixed"] == 0
    assert out.loc[1, "hub_fixed"] == S      # sole hub takes all mass
    assert out.loc[2, "auth_fixed"] == S


def test_empty_edges():
    ds = ray.data.from_arrow(pa.table({
        "src_id": pa.array([], pa.uint64()),
        "dst_id": pa.array([], pa.uint64())}))
    out = hits_fixed(ds, n_iter=2, mode="driver")
    assert len(out) == 0
    assert list(out.columns) == ["node_id", "hub_fixed", "auth_fixed",
                                 "hub", "authority"]
