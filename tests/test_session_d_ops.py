"""Round-5 session-D operators: inverted index, KS drift, int8
scalar quantization — plain-python reference parity + edge cases."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray

from kgforge.stages.ann import scalar_quantize_int8
from kgforge.stages.relational import grouped_ks_drift
from kgforge.stages.retrieval import inverted_index

SF = "/root/testdata/sf0.001"


@pytest.mark.usefixtures("ray_session")
def test_inverted_index_matches_reference():
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"])
    ref: dict[str, set[int]] = {}
    for did, text in zip(docs.column("doc_id").to_pylist(),
                         docs.column("text").to_pylist()):
        for tok in (text or "").split():
            ref.setdefault(tok, set()).add(did)
    got = inverted_index(
        ray.data.read_parquet(f"{SF}/documents.parquet",
                              columns=["doc_id", "text"])).to_pandas()
    assert len(got) == len(ref)
    by_tok = got.set_index("token")
    for tok, ids in ref.items():
        row = by_tok.loc[tok]
        assert row["df"] == len(ids)
        assert row["postings"] == ",".join(str(i) for i in sorted(ids))


@pytest.mark.usefixtures("ray_session")
def test_inverted_index_postings_ascending():
    got = inverted_index(
        ray.data.read_parquet(f"{SF}/documents.parquet",
                              columns=["doc_id", "text"])).to_pandas()
    for p in got["postings"].head(200):
        ids = [int(x) for x in p.split(",")]
        assert ids == sorted(ids) and len(set(ids)) == len(ids)


def _ref_ks(vals_old: list[int], vals_new: list[int]) -> int:
    """Brute-force cross-multiplied KS numerator on the cents grid."""
    n0, n1 = len(vals_old), len(vals_new)
    grid = sorted(set(vals_old) | set(vals_new))
    best = 0
    for v in grid:
        f0 = sum(1 for x in vals_old if x <= v)
        f1 = sum(1 for x in vals_new if x <= v)
        best = max(best, abs(f0 * n1 - f1 * n0))
    return best


@pytest.mark.usefixtures("ray_session")
def test_ks_drift_matches_bruteforce():
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["event_type", "value", "ts"])
    df = ev.to_pandas().dropna(subset=["event_type", "value", "ts"])
    us = df["ts"].to_numpy("datetime64[us]").astype(np.int64)
    mid = (int(us.min()) + int(us.max())) // 2
    df["v"] = np.floor(df["value"].to_numpy(np.float64) * 100.0
                       + 0.5).astype(np.int64)
    df["new"] = us > mid
    got = grouped_ks_drift(
        ray.data.read_parquet(f"{SF}/events.parquet",
                              columns=["event_type", "value", "ts"]),
        "event_type", "value", "ts").to_pandas()
    got = got.set_index("event_type")
    for etype, sub in df.groupby("event_type"):
        old = sub.loc[~sub["new"], "v"].tolist()
        new = sub.loc[sub["new"], "v"].tolist()
        row = got.loc[etype]
        assert row["n_old"] == len(old) and row["n_new"] == len(new)
        assert row["ks_num"] == _ref_ks(old, new)
        if old and new:
            assert row["ks_stat"] == float(row["ks_num"]) / (
                float(len(old)) * float(len(new)))


@pytest.mark.usefixtures("ray_session")
def test_ks_drift_one_sided_group():
    t = pa.table({
        "g": ["a"] * 4 + ["b"] * 3,
        "value": [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0],
        # 'a' spans both halves; 'b' lives entirely in the early half
        "ts": pa.array([0, 1, 90, 100, 0, 1, 2],
                       pa.timestamp("us"))})
    got = grouped_ks_drift(ray.data.from_arrow(t), "g", "value",
                           "ts").to_pandas().set_index("g")
    assert got.loc["b", "n_new"] == 0
    assert got.loc["b", "ks_num"] == 0
    assert pd.isna(got.loc["b", "ks_stat"])
    assert got.loc["a", "n_old"] == 2 and got.loc["a", "n_new"] == 2


@pytest.mark.usefixtures("ray_session")
def test_scalar_quantize_reference_and_bounds():
    ds = ray.data.read_parquet(f"{SF}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    got = scalar_quantize_int8(ds).to_pandas().sort_values("vec_id")
    emb = pq.read_table(f"{SF}/embeddings.parquet")
    mat = np.array(emb.column("embedding").to_pylist(), np.float64)
    q = np.floor(mat * 1_000_000).astype(np.int64)
    mn = q.min(axis=0)
    rng = np.maximum(q.max(axis=0) - mn, 1)
    ref = ((q - mn) * 255) // rng
    ids = emb.column("vec_id").to_numpy()
    order = np.argsort(ids)
    codes = np.vstack(got["codes"].to_numpy())
    assert (codes >= 0).all() and (codes <= 255).all()
    assert np.array_equal(codes, ref[order])
    # every dim hits both ends of the code range by construction
    assert (codes.min(axis=0) == 0).all()
    assert (codes.max(axis=0) == 255).all()


@pytest.mark.usefixtures("ray_session")
def test_scalar_quantize_constant_dim():
    t = pa.table({
        "vec_id": pa.array([1, 2, 3], pa.int64()),
        "embedding": pa.array([[0.5, 1.0], [0.5, 2.0], [0.5, 3.0]],
                              pa.list_(pa.float32()))})
    got = scalar_quantize_int8(ray.data.from_arrow(t)).to_pandas()
    codes = np.vstack(got.sort_values("vec_id")["codes"].to_numpy())
    # constant dim 0: range clamps to 1, all codes 0
    assert (codes[:, 0] == 0).all()
    assert codes[0, 1] == 0 and codes[2, 1] == 255


@pytest.mark.usefixtures("ray_session")
def test_adamic_adar_matches_bruteforce():
    import math

    from kgforge.stages.graph import link_prediction_adamic_adar
    # path + hub graph: 1-2, 2-3, 1-4, 3-4, 4-5 (undirected)
    edges = pa.table({
        "src_id": pa.array([1, 2, 1, 3, 4], pa.uint64()),
        "dst_id": pa.array([2, 3, 4, 4, 5], pa.uint64())})
    got = link_prediction_adamic_adar(
        ray.data.from_arrow(edges), k=100).to_pandas()
    # brute force
    adj: dict[int, set[int]] = {}
    for s, d in zip([1, 2, 1, 3, 4], [2, 3, 4, 4, 5]):
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    q = {u: int(math.floor(1e9 / math.log(len(vs)) + 0.5))
         for u, vs in adj.items() if len(vs) >= 2}
    exp = {}
    nodes = sorted(adj)
    for i, u in enumerate(nodes):
        for v in nodes[i + 1:]:
            if v in adj[u]:
                continue
            common = adj[u] & adj[v]
            if common:
                exp[(u, v)] = (len(common),
                               sum(q[w] for w in common))
    got_pairs = {(int(r.src_id), int(r.dst_id)): (int(r.inter),
                                                  int(r.aa_e9))
                 for r in got.itertuples()}
    assert got_pairs == exp
    # float column is the single-division image of the integer score
    for r in got.itertuples():
        assert r.aa == float(r.aa_e9) / 1e9
