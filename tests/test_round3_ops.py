"""Unit tests for the round-3 operators: anti-join (both strategies),
grouped exact quantiles, document chunking, n-gram frequencies."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray

from kgforge.stages.joins import anti_join_keys
from kgforge.stages.relational import (chunk_documents, grouped_quantiles,
                                       ngram_frequencies)


def _left():
    return ray.data.from_arrow(pa.table({
        "k": pa.array([1, 2, 3, 4, 5, None], pa.int64()),
        "v": pa.array(["a", "b", "c", "d", "e", "f"], pa.string())}))


def _right():
    return ray.data.from_arrow(pa.table({
        "rk": pa.array([2, 4, 4, 99], pa.int64())}))


@pytest.mark.parametrize("strategy", ["broadcast", "join"])
def test_anti_join_keys(strategy):
    out = anti_join_keys(_left(), _right(), "k", "rk",
                         strategy=strategy).to_pandas()
    # unmatched keys AND the null-key row survive; duplicate right keys
    # don't matter
    assert sorted(out["v"]) == ["a", "c", "e", "f"]


def test_anti_join_empty_right():
    empty = ray.data.from_arrow(pa.table({"rk": pa.array([], pa.int64())}))
    out = anti_join_keys(_left(), empty, "k", "rk",
                         strategy="broadcast").to_pandas()
    assert len(out) == 6                    # nothing excluded


def test_grouped_quantiles_exact():
    rows = []
    rng = np.random.default_rng(5)
    for g, n in [("a", 101), ("b", 37), ("c", 1)]:
        for v in rng.normal(size=n):
            rows.append((g, float(v)))
    ds = ray.data.from_arrow(pa.table({
        "g": pa.array([r[0] for r in rows], pa.string()),
        "x": pa.array([r[1] for r in rows], pa.float64())}))
    qs = [0.25, 0.5, 0.9]
    out = grouped_quantiles(ds, "g", "x", qs).to_pandas()
    df = pd.DataFrame(rows, columns=["g", "x"])
    for g, sub in df.groupby("g"):
        vals = np.sort(sub["x"].to_numpy())
        n = len(vals)
        for q in qs:
            rank = min(n - 1, max(0, int(np.ceil(q * n)) - 1))
            got = out[(out["g"] == g) & (out["q"] == q)]["value"].iloc[0]
            assert got == vals[rank], (g, q)


def test_chunk_documents_edges():
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array(["x" * 350, "", "y" * 150, "z" * 10],
                         pa.string())}))
    out = (chunk_documents(ds, chunk_chars=200, overlap=50).to_pandas()
           .sort_values(["doc_id", "chunk_id"]).reset_index(drop=True))
    # doc 1: starts 0,150,300 -> 3 chunks; doc 2: empty -> none;
    # doc 3: exactly one step -> 1 chunk; doc 4: short -> 1 chunk
    assert out.groupby("doc_id").size().to_dict() == {1: 3, 3: 1, 4: 1}
    d1 = out[out["doc_id"] == 1]["chunk"].tolist()
    assert [len(c) for c in d1] == [200, 200, 50]
    assert out[out["doc_id"] == 4]["chunk"].iloc[0] == "z" * 10


def test_chunk_documents_overlap_validation():
    ds = ray.data.from_arrow(pa.table({"doc_id": [1], "text": ["x"]}))
    with pytest.raises(ValueError):
        chunk_documents(ds, chunk_chars=50, overlap=50)


def test_ngram_frequencies_bigrams():
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["a b c a b", "a b", "solo"], pa.string())}))
    out = ngram_frequencies(ds, n=2, k=10).to_pandas()
    counts = dict(zip(out["ngram"], out["n"]))
    assert counts["a b"] == 3
    assert counts["b c"] == 1
    assert counts["c a"] == 1
    assert "solo" not in counts             # single-token doc: no bigram


# ---------------------------------------------------------------------------
# round-3 second wave: repetition stats, decontamination, doc frequencies
# ---------------------------------------------------------------------------


def test_repetition_stats_edges():
    from kgforge.functions.textstats import repetition_stats_batch
    t = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array([
            "a b\na b\nc d",       # 3 lines, one dup pair, bigram 'a b' x2
            "",                      # empty: 1 line (''), 0 bigrams
            "x",                     # single token: no bigrams
            "go go go go"],          # degenerate: top bigram 3/3
            pa.string())})
    out = repetition_stats_batch(t).to_pydict()
    assert out["n_lines"] == [3, 1, 1, 1]
    assert out["n_dup_lines"] == [1, 0, 0, 0]
    assert out["dup_line_frac"][0] == pytest.approx(1 / 3)
    # doc 0: bigrams [a b, b a, a b, b c, c d] -> 'a b' x2 over 5 slots
    assert out["top_bigram_frac"][0] == pytest.approx(2 / 5)
    assert out["top_bigram_frac"][1] == 0.0
    assert out["top_bigram_frac"][2] == 0.0
    assert out["top_bigram_frac"][3] == 1.0


def test_decontaminate_flags_shared_ngrams():
    from kgforge.stages.decontam import (benchmark_ngram_set,
                                         flag_contaminated)
    bench = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([0], pa.int64()),
        "text": pa.array(["one two three four five six"], pa.string())}))
    grams = benchmark_ngram_set(bench, n=5)
    assert "one two three four five" in grams
    assert "two three four five six" in grams
    corpus = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([10, 11, 12], pa.int64()),
        "text": pa.array([
            "zzz one two three four five zzz",   # shares one 5-gram
            "one two three four",                  # too short to share
            "one two three four five six seven"],  # shares both
            pa.string())}))
    out = (flag_contaminated(corpus, grams, n=5)
           .to_pandas().sort_values("doc_id"))
    assert out["n_hits"].tolist() == [1, 0, 2]
    assert out["contaminated"].tolist() == [True, False, True]


def test_doc_frequencies_df_vs_tf():
    from kgforge.stages.relational import doc_frequencies
    docs = ray.data.from_arrow(pa.table({
        "text": pa.array(["a a b", "a c", "", "b b b"], pa.string())}))
    out = doc_frequencies(docs, k=10).to_pandas()
    got = {r.token: (r.df, r.tf) for r in out.itertuples()}
    assert got == {"a": (2, 3), "b": (2, 4), "c": (1, 1)}
    # ordering: df desc then token asc
    assert out["token"].tolist() == ["a", "b", "c"]


def test_range_join_semantics():
    from kgforge.stages.relational import range_join
    # window [0, 10us]; bucket width = 10us -> left intervals cross
    # bucket boundaries (replication path) and edges are inclusive
    left = ray.data.from_arrow(pa.table({
        "lid": pa.array([1, 2, 3], pa.int64()),
        "k": pa.array([7, 7, 8], pa.int64()),
        "t": pa.array([100, 95, 100], pa.int64())}))
    right = ray.data.from_arrow(pa.table({
        "k": pa.array([7, 7, 7, 8, 9], pa.int64()),
        "t": pa.array([100, 105, 111, 110, 100], pa.int64()),
        "rid": pa.array([10, 11, 12, 13, 14], pa.int64())}))
    out = (range_join(left, right, key="k", left_ts="t", right_ts="t",
                      right_vals=["rid"], lo_us=0, hi_us=10)
           .to_pandas().sort_values(["lid", "rid_r"]))
    got = list(zip(out["lid"], out["rid_r"]))
    # lid=1 (k7,t100): rids at 100,105 in [100,110]; 111 is out
    # lid=2 (k7,t95): 100,105 in [95,105]
    # lid=3 (k8,t100): rid 13 at 110 == t+hi (inclusive edge)
    assert got == [(1, 10), (1, 11), (2, 10), (2, 11), (3, 13)]
    # exactly-once: no pair duplicated by the left replication
    assert len(got) == len(set(got))


def test_range_join_empty_and_validation():
    from kgforge.stages.relational import range_join
    left = ray.data.from_arrow(pa.table({
        "lid": pa.array([1], pa.int64()),
        "k": pa.array([1], pa.int64()),
        "t": pa.array([0], pa.int64())}))
    right = ray.data.from_arrow(pa.table({
        "k": pa.array([2], pa.int64()),
        "t": pa.array([0], pa.int64()),
        "rid": pa.array([9], pa.int64())}))
    out = range_join(left, right, key="k", left_ts="t", right_ts="t",
                     right_vals=["rid"], lo_us=0, hi_us=5).to_pandas()
    assert len(out) == 0                    # disjoint keys
    with pytest.raises(ValueError):
        range_join(left, right, key="k", left_ts="t", right_ts="t",
                   right_vals=["rid"], lo_us=5, hi_us=0)


def test_streaming_sessionize_equals_batch():
    from kgforge.stages.streaming import streaming_sessionize
    from kgforge.stages.windows import sessionize
    rng = np.random.default_rng(7)
    n = 3000
    t0 = 1_700_000_000_000_000
    tbl = pa.table({
        "event_id": pa.array(np.arange(n), pa.int64()),
        "user_id": pa.array(rng.integers(0, 40, n), pa.int64()),
        "ts": pa.array(t0 + rng.integers(0, 3_600_000_000 * 24, n),
                       pa.timestamp("us"))})
    batch = (sessionize(ray.data.from_arrow(tbl)).to_pandas()
             .sort_values(list(["user_id", "session_start_epoch",
                                "session_end_epoch", "n_events"]))
             .reset_index(drop=True))
    # small batch_size forces many watermark steps (the streaming path)
    stream = (streaming_sessionize(ray.data.from_arrow(tbl), n_workers=3,
                                   batch_size=256).to_pandas()
              .sort_values(list(["user_id", "session_start_epoch",
                                 "session_end_epoch", "n_events"]))
              .reset_index(drop=True))
    pd.testing.assert_frame_equal(
        batch[sorted(batch.columns)], stream[sorted(stream.columns)],
        check_exact=True)


def test_grouped_percent_rank_ties_and_singletons():
    from kgforge.stages.windows import grouped_percent_rank
    tbl = pa.table({
        "id": pa.array([0, 1, 2, 3, 4, 5], pa.int64()),
        "g": ["a", "a", "a", "a", "b", "c"],
        "v": pa.array([1.0, 2.0, 2.0, 4.0, 9.0, 3.0], pa.float64())})
    out = (grouped_percent_rank(ray.data.from_arrow(tbl), "g", "v", "id")
           .to_pandas().set_index("id").sort_index())
    # ties share the min rank; singleton groups get 0.0 (SQL semantics)
    assert out.loc[0, "pct_rank"] == 0.0
    assert out.loc[1, "pct_rank"] == pytest.approx(1 / 3)
    assert out.loc[2, "pct_rank"] == pytest.approx(1 / 3)
    assert out.loc[3, "pct_rank"] == 1.0
    assert out.loc[4, "pct_rank"] == 0.0
    assert out.loc[5, "pct_rank"] == 0.0


def test_grouped_sequence_features_order_and_gaps():
    from kgforge.stages.windows import grouped_sequence_features
    t0 = 1_700_000_000_000_000
    tbl = pa.table({
        "event_id": pa.array([3, 1, 2, 9], pa.int64()),
        "user_id": pa.array([7, 7, 7, 8], pa.int64()),
        "ts": pa.array([t0 + 10, t0, t0 + 10, t0 + 5],
                       pa.timestamp("us")),
        "value": pa.array([1.005, 2.0, 0.5, 3.0], pa.float64())})
    out = (grouped_sequence_features(
               ray.data.from_arrow(tbl), "user_id", "ts", "event_id",
               "value").to_pandas().set_index("event_id").sort_index())
    # user 7 order is (ts, id): 1 @ t0, 2 @ t0+10, 3 @ t0+10 (tie -> id)
    assert out.loc[1, ["seq_no", "delta_us", "run_cents"]].tolist() == \
        [1, -1, 200]
    assert out.loc[2, ["seq_no", "delta_us", "run_cents"]].tolist() == \
        [2, 10, 250]
    # 1.005 is stored as 1.00499...; *100 = 100.499... -> 100 cents on
    # BOTH sides (the cents trick mirrors the float, not decimal 1.005)
    assert out.loc[3, ["seq_no", "delta_us", "run_cents"]].tolist() == \
        [3, 0, 350]
    assert out.loc[9, ["seq_no", "delta_us", "run_cents"]].tolist() == \
        [1, -1, 300]


def test_pagerank_matches_dense_power_iteration():
    from kgforge.stages.graph import pagerank
    rng = np.random.default_rng(3)
    n_nodes, n_edges = 60, 400
    src = rng.integers(0, n_nodes, n_edges).astype(np.uint64)
    dst = rng.integers(0, n_nodes, n_edges).astype(np.uint64)
    edges = pa.table({"src_id": pa.array(src, pa.uint64()),
                      "dst_id": pa.array(dst, pa.uint64())})
    out = (pagerank(ray.data.from_arrow(edges), n_iter=15)
           .sort_values("node_id").reset_index(drop=True))
    # dense reference: same damping / dangling redistribution
    nodes = np.sort(np.unique(np.concatenate([src, dst])))
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    A = np.zeros((n, n))
    for s, d in zip(src, dst):
        A[idx[d], idx[s]] += 1.0
    outdeg = A.sum(axis=0)
    r = np.full(n, 1.0 / n)
    for _ in range(15):
        contrib = np.where(outdeg > 0, r / np.maximum(outdeg, 1), 0.0)
        dangling = r[outdeg == 0].sum()
        r = 0.15 / n + 0.85 * (A @ contrib + dangling / n)
    assert np.array_equal(out["node_id"].to_numpy(np.uint64), nodes)
    np.testing.assert_allclose(out["pagerank"].to_numpy(), r,
                               rtol=1e-10, atol=1e-14)
    assert abs(out["pagerank"].sum() - 1.0) < 1e-9


def test_pagerank_fixed_matches_dense_integer_recurrence():
    """pagerank_fixed is bit-exact vs a dense local replay of the same
    integer recurrence, and its ranking agrees with float pagerank."""
    from kgforge.stages.graph import pagerank, pagerank_fixed
    rng = np.random.default_rng(7)
    n_nodes, n_edges = 60, 400
    src = rng.integers(0, n_nodes, n_edges).astype(np.uint64)
    dst = rng.integers(0, n_nodes, n_edges).astype(np.uint64)
    edges = pa.table({"src_id": pa.array(src, pa.uint64()),
                      "dst_id": pa.array(dst, pa.uint64())})
    ds = ray.data.from_arrow(edges)
    out = (pagerank_fixed(ds, n_iter=15).to_pandas()
           .sort_values("node_id").reset_index(drop=True))
    # dense replay, pure python ints (no numpy) — any mismatch with the
    # distributed int64 path would indicate overflow or ordering bugs
    nodes = np.sort(np.unique(np.concatenate([src, dst])))
    idx = {int(v): i for i, v in enumerate(nodes)}
    n = len(nodes)
    outdeg = [0] * n
    in_edges: list[list[int]] = [[] for _ in range(n)]
    for s, d in zip(src, dst):
        outdeg[idx[int(s)]] += 1
        in_edges[idx[int(d)]].append(idx[int(s)])
    S = 1 << 40
    r = [S // n] * n
    base = (3 * S) // (20 * n)
    for _ in range(15):
        contrib = [r[u] // outdeg[u] if outdeg[u] else 0 for u in range(n)]
        dangling = sum(r[u] for u in range(n) if outdeg[u] == 0)
        r = [base + (17 * (sum(contrib[u] for u in in_edges[v])
                           + dangling // n)) // 20
             for v in range(n)]
    assert out["pr_fixed"].tolist() == r
    assert np.array_equal(out["pagerank"].to_numpy(),
                          np.array(r, np.float64) / float(S))
    # ranking parity with the float operator (same damping/iterations)
    flt = (pagerank(ds, n_iter=15)
           .sort_values("node_id").reset_index(drop=True))
    order_fixed = out.sort_values(
        ["pr_fixed", "node_id"], ascending=[False, True])["node_id"]
    order_float = flt.sort_values(
        ["pagerank", "node_id"], ascending=[False, True])["node_id"]
    assert order_fixed.tolist() == order_float.tolist()


def _parity_graph():
    """Random graph + a long path (high diameter, stresses pointer
    jumping) + a separate 2-node component; ids include values > 2^53
    to catch any pandas float-promotion corruption."""
    rng = np.random.default_rng(11)
    src = rng.integers(0, 30, 80, dtype=np.uint64)
    dst = rng.integers(0, 30, 80, dtype=np.uint64)
    base = np.uint64(2**63 + 11)     # above 2^53: float64 would corrupt
    path = np.arange(12, dtype=np.uint64) + base
    src = np.concatenate([src, path[:-1], [np.uint64(7_000_000)]])
    dst = np.concatenate([dst, path[1:], [np.uint64(7_000_001)]])
    return ray.data.from_arrow(pa.table({
        "src_id": pa.array(src, pa.uint64()),
        "dst_id": pa.array(dst, pa.uint64())}))


def test_pagerank_fixed_distributed_bit_exact():
    """The keyed-Dataset pagerank path is bit-identical to the driver
    fixed-point path (integer recurrence, order-free sums)."""
    from kgforge.stages.graph import (pagerank_fixed,
                                      pagerank_fixed_distributed)
    edges = _parity_graph()
    drv = (pagerank_fixed(edges, n_iter=8, mode="driver")
           .sort_values("node_id").reset_index(drop=True))
    dist = (pagerank_fixed_distributed(edges, n_iter=8, n_buckets=8)
            .to_pandas().sort_values("node_id").reset_index(drop=True))
    assert drv["node_id"].tolist() == dist["node_id"].tolist()
    assert drv["pr_fixed"].tolist() == dist["pr_fixed"].tolist()
    assert drv["pagerank"].tolist() == dist["pagerank"].tolist()


def test_connected_components_distributed_parity():
    from kgforge.stages.graph import (connected_components,
                                      connected_components_distributed)
    edges = _parity_graph()
    drv = (connected_components(edges, mode="driver")
           .sort_values("node_id").reset_index(drop=True))
    dist = (connected_components_distributed(edges, n_buckets=8)
            .to_pandas().sort_values("node_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(drv, dist)
    # the auto gate flips to the keyed-Dataset path past the limit:
    # past-limit mode returns a Dataset, not a DataFrame
    tiny = ray.data.from_arrow(pa.table({
        "src_id": pa.array([1, 2], pa.uint64()),
        "dst_id": pa.array([2, 3], pa.uint64())}))
    auto = connected_components(tiny, driver_node_limit=1)
    assert isinstance(auto, ray.data.Dataset)
    assert sorted(auto.to_pandas()["component_id"].unique()) == [1]


def test_k_hop_distributed_parity():
    from kgforge.stages.graph import k_hop, k_hop_distributed
    edges = _parity_graph()
    drv = (k_hop(edges, n_seeds=4, k=2, mode="driver")
           .sort_values("node_id").reset_index(drop=True))
    dist = (k_hop_distributed(edges, n_seeds=4, k=2, n_buckets=8)
            .to_pandas().sort_values("node_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(drv, dist)


def test_k_core_distributed_parity():
    from kgforge.stages.graph import k_core, k_core_distributed
    edges = _parity_graph()
    drv_ds, _ = k_core(edges, k=3, mode="driver")
    dist_ds, _ = k_core_distributed(edges, k=3, n_buckets=8)
    drv = drv_ds.to_pandas().sort_values("node_id").reset_index(drop=True)
    dist = (dist_ds.to_pandas().sort_values("node_id")
            .reset_index(drop=True))
    pd.testing.assert_frame_equal(drv, dist)


def test_k_core_distributed_big_ids_survive_the_core():
    """Regression for the join-shuffle float-promotion trap: a 4-clique
    of ids above 2^63 IS the 3-core, so the big ids must ride the two
    semi-join exchanges intact (nulls in a uint64 column would have
    degraded them through pandas float64).  _parity_graph's big ids all
    peel in round 1, which is why this case needs its own graph."""
    from kgforge.stages.graph import k_core, k_core_distributed
    big = np.uint64(2**63 + 101)
    ids = [big + np.uint64(i) for i in range(4)]
    src, dst = zip(*[(a, b) for i, a in enumerate(ids)
                     for b in ids[i + 1:]])
    edges = ray.data.from_arrow(pa.table({
        "src_id": pa.array(np.array(src, np.uint64), pa.uint64()),
        "dst_id": pa.array(np.array(dst, np.uint64), pa.uint64())}))
    drv_ds, _ = k_core(edges, k=3, mode="driver")
    dist_ds, _ = k_core_distributed(edges, k=3, n_buckets=4)
    drv = drv_ds.to_pandas().sort_values("node_id").reset_index(drop=True)
    dist = (dist_ds.to_pandas().sort_values("node_id")
            .reset_index(drop=True))
    pd.testing.assert_frame_equal(drv, dist)
    assert set(drv["node_id"]) == {int(i) for i in ids}


def test_degree_table_endpoints_only_on_one_side():
    from kgforge.stages.graph import degree_table
    edges = pa.table({"src_id": pa.array([1, 1, 2], pa.uint64()),
                      "dst_id": pa.array([2, 3, 3], pa.uint64())})
    out = (degree_table(ray.data.from_arrow(edges)).to_pandas()
           .set_index("node_id").sort_index())
    assert out.loc[1, ["out_degree", "in_degree", "degree"]].tolist() \
        == [2, 0, 2]
    assert out.loc[2, ["out_degree", "in_degree", "degree"]].tolist() \
        == [1, 1, 2]
    assert out.loc[3, ["out_degree", "in_degree", "degree"]].tolist() \
        == [0, 2, 2]


def test_entity_cooccurrence_counts_distinct_pages():
    from kgforge.stages.graph import entity_cooccurrence
    # page 10: A,B,B,C ; page 11: A,B ; page 12: C alone
    tbl = pa.table({
        "page": pa.array([10, 10, 10, 10, 11, 11, 12], pa.uint64()),
        "k": ["A", "B", "B", "C", "A", "B", "C"]})
    out = (entity_cooccurrence(ray.data.from_arrow(tbl), "page", "k")
           .to_pandas().set_index(["src_key", "dst_key"])["n_pages"]
           .sort_index())
    assert out.to_dict() == {("A", "B"): 2, ("A", "C"): 1, ("B", "C"): 1}


def test_connected_components_chain_and_islands():
    from kgforge.stages.graph import connected_components
    # long chain 0-1-2-...-9 (stresses propagation + compression),
    # a triangle {20,21,22}, a self-loop island pair {30,31}
    src = list(range(9)) + [20, 21, 22, 30, 30]
    dst = list(range(1, 10)) + [21, 22, 20, 30, 31]
    edges = pa.table({"src_id": pa.array(src, pa.uint64()),
                      "dst_id": pa.array(dst, pa.uint64())})
    out = (connected_components(ray.data.from_arrow(edges))
           .to_pandas().set_index("node_id")["component_id"])
    assert all(out.loc[i] == 0 for i in range(10))
    assert all(out.loc[i] == 20 for i in (20, 21, 22))
    assert out.loc[30] == 30 and out.loc[31] == 30


@pytest.mark.parametrize("strategy", ["broadcast", "join"])
def test_left_outer_join_semantics(strategy):
    from kgforge.stages.joins import left_outer_join
    left = ray.data.from_arrow(pa.table({
        "k": pa.array([1, 2, 3, 4], pa.int64()),
        "v": pa.array(["a", "b", "c", "d"], pa.string())}))
    right = ray.data.from_arrow(pa.table({
        "rk": pa.array([2, 2, 4], pa.int64()),
        "w": pa.array([10, 20, 40], pa.int64()),
        "s": pa.array(["x", "y", "z"], pa.string())}))
    out = (left_outer_join(left, right, "k", "rk", ["w", "s"],
                           strategy=strategy)
           .to_pandas().sort_values(["k", "w_r"]).reset_index(drop=True))
    # duplicate right key 2 duplicates the left row (SQL 1:N);
    # keys 1 and 3 survive with nulls
    assert list(out["k"]) == [1, 2, 2, 3, 4]
    assert out.loc[out["k"] == 1, "w_r"].isna().all()
    assert out.loc[out["k"] == 3, "s_r"].isna().all()
    assert sorted(out.loc[out["k"] == 2, "w_r"]) == [10, 20]
    assert list(out.loc[out["k"] == 4, "s_r"]) == ["z"]


@pytest.mark.parametrize("strategy", ["broadcast", "join", "auto"])
def test_left_outer_join_null_keys_never_match(strategy):
    """SQL LEFT JOIN: NULL keys never match — null-key left rows pass
    through null-filled, null-key right rows attach to nothing (a raw
    pandas merge would pair NaN with NaN)."""
    from kgforge.stages.joins import left_outer_join
    left = ray.data.from_arrow(pa.table({
        "k": pa.array(["a", None, "b", None], pa.string()),
        "v": pa.array([1, 2, 3, 4], pa.int64())}))
    right = ray.data.from_arrow(pa.table({
        "rk": pa.array(["a", None], pa.string()),
        "w": pa.array([10, 99], pa.int64())}))
    out = (left_outer_join(left, right, "k", "rk", ["w"],
                           strategy=strategy)
           .to_pandas().sort_values("v").reset_index(drop=True))
    assert list(out["v"]) == [1, 2, 3, 4]
    assert out.loc[0, "w_r"] == 10
    assert out.loc[[1, 2, 3], "w_r"].isna().all()


def test_left_outer_join_auto_flips_to_shuffle_over_limit():
    """auto collects the right side once and flips to the shuffle path
    only past broadcast_limit rows — output identical either way."""
    from kgforge.stages.joins import left_outer_join
    left = ray.data.from_arrow(pa.table({
        "k": pa.array(list(range(8)), pa.int64()),
        "v": pa.array([f"v{i}" for i in range(8)], pa.string())}))
    right = ray.data.from_arrow(pa.table({
        "rk": pa.array([1, 3, 3, 5], pa.int64()),
        "w": pa.array([10, 30, 31, 50], pa.int64())}))
    small = (left_outer_join(left, right, "k", "rk", ["w"],
                             strategy="auto", broadcast_limit=2)
             .to_pandas().sort_values(["k", "w_r"]).reset_index(drop=True))
    big = (left_outer_join(left, right, "k", "rk", ["w"],
                           strategy="auto", broadcast_limit=1000,
                           right_count=4)
           .to_pandas().sort_values(["k", "w_r"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(small, big)


def test_left_outer_join_empty_right_and_collision():
    from kgforge.stages.joins import left_outer_join
    left = ray.data.from_arrow(pa.table({
        "k": pa.array([1, 2], pa.int64()),
        "v": pa.array(["a", "b"], pa.string())}))
    empty = ray.data.from_arrow(pa.table({
        "rk": pa.array([], pa.int64()),
        "w": pa.array([], pa.int64())}))
    out = left_outer_join(left, empty, "k", "rk", ["w"],
                          strategy="join").to_pandas()
    assert len(out) == 2 and out["w_r"].isna().all()
    with pytest.raises(ValueError, match="collides"):
        left_outer_join(left, empty, "k", "rk", ["v"], suffix="")


def test_grouped_limit_caps_per_key():
    from kgforge.stages.relational import grouped_limit
    t = pa.table({
        "k": pa.array(["a"] * 5 + ["b"] * 2 + ["c"], pa.string()),
        "o": pa.array([f"o{i}" for i in [4, 2, 0, 3, 1, 1, 0, 0]],
                      pa.string()),
        "v": pa.array(list(range(8)), pa.int64())})
    out = (grouped_limit(ray.data.from_arrow(t), "k", "o", k=2)
           .to_pandas().sort_values(["k", "o"]).reset_index(drop=True))
    # per key: the 2 smallest 'o' values survive, others dropped
    assert out["k"].tolist() == ["a", "a", "b", "b", "c"]
    assert out["o"].tolist() == ["o0", "o1", "o0", "o1", "o0"]
    assert out["v"].tolist() == [2, 4, 6, 5, 7]
    # combiner path: many input blocks, cap still global per key
    many = ray.data.from_arrow(t).repartition(4)
    out2 = (grouped_limit(many, "k", "o", k=2)
            .to_pandas().sort_values(["k", "o"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(out, out2)


def test_grouped_ntile_uneven_and_singleton():
    from kgforge.stages.windows import grouped_ntile
    tbl = pa.table({
        "g": ["a"] * 7 + ["b"] * 3 + ["c"],
        "v": pa.array([5, 1, 3, 3, 2, 9, 7, 4, 4, 1, 2], pa.float64()),
        "i": pa.array(range(11), pa.int64())})
    out = (grouped_ntile(ray.data.from_arrow(tbl), "g", "v", "i", 4)
           .to_pandas().set_index("i")["tile"])
    # group a (7 rows, k=4): tile sizes 2,2,2,1 over value order
    # values sorted: 1(i1),2(i4),3(i2),3(i3),5(i0),7(i6),9(i5)
    assert list(out.loc[[1, 4, 2, 3, 0, 6, 5]]) == [1, 1, 2, 2, 3, 3, 4]
    # group b: ties on v=4 broken by id
    assert list(out.loc[[9, 7, 8]]) == [1, 2, 3]
    # singleton group
    assert out.loc[10] == 1


def test_line_dedup_boilerplate_stripped():
    from kgforge.stages.dedup import line_dedup
    nav = "HOME | ABOUT | CONTACT"
    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": [f"{nav}\nunique one\n\nfooter",
                 f"{nav}\nunique two\nfooter",
                 "all original\nlines here",
                 ""]}))
    out = (line_dedup(docs).to_pandas()
           .set_index("doc_id").sort_index())
    # nav + footer appear twice -> banned; empty line never banned
    assert out.loc[1, "text"] == "unique one\n"
    assert out.loc[1, "n_kept"] == 2 and out.loc[1, "n_removed"] == 2
    assert out.loc[2, "text"] == "unique two"
    assert out.loc[3, "text"] == "all original\nlines here"
    assert out.loc[3, "n_removed"] == 0
    # empty doc splits to one empty line, kept
    assert out.loc[4, "text"] == "" and out.loc[4, "n_kept"] == 1


def test_deterministic_shuffle_parity_and_determinism():
    import hashlib
    from kgforge.stages.relational import deterministic_shuffle
    ids = list(range(100))
    ds = ray.data.from_arrow(pa.table({"doc_id": pa.array(ids, pa.int64())}))
    out = deterministic_shuffle(ds, n_shards=4).to_pandas()
    # brute-force reference
    keys = {i: hashlib.md5(str(i).encode()).hexdigest() for i in ids}
    exp = {}
    for sh in range(4):
        members = sorted((keys[i], i) for i in ids
                         if int(keys[i][:2], 16) % 4 == sh)
        for pos, (_, i) in enumerate(members):
            exp[i] = (sh, pos)
    got = {int(r.doc_id): (int(r.shard), int(r.pos))
           for r in out.itertuples()}
    assert got == exp
    # rerun is byte-identical (resumable export contract)
    out2 = deterministic_shuffle(ds, n_shards=4).to_pandas()
    pd.testing.assert_frame_equal(
        out.sort_values("doc_id").reset_index(drop=True),
        out2.sort_values("doc_id").reset_index(drop=True))


def test_k_hop_bfs_depths():
    from kgforge.stages.graph import k_hop
    # path 1-2-3-4-5 plus a branch 2-10; seed = node 1
    edges = ray.data.from_arrow(pa.table({
        "src_id": pa.array([1, 2, 3, 4, 2], pa.uint64()),
        "dst_id": pa.array([2, 3, 4, 5, 10], pa.uint64())}))
    out = k_hop(edges, n_seeds=1, k=2).to_pandas()
    got = dict(zip(out.node_id.astype(int), out.hops.astype(int)))
    assert got == {1: 0, 2: 1, 3: 2, 10: 2}
    # k=3 reaches node 4; node 5 still out of range
    out3 = k_hop(edges, n_seeds=1, k=3).to_pandas()
    got3 = dict(zip(out3.node_id.astype(int), out3.hops.astype(int)))
    assert got3 == {1: 0, 2: 1, 3: 2, 10: 2, 4: 3}


def test_bm25_scores_vs_independent_reference():
    """Engine BM25 scores vs a pure-Python reference computed with a
    DIFFERENT op order (per-doc term loop, math-lib ops) — agreement
    to 1e-12 relative, and adjacent ranked scores differ by far more
    than float jitter, so the rank-only gate comparison is sound."""
    import math
    from kgforge.stages.retrieval import bm25_topk
    rng = np.random.default_rng(7)
    vocab = ["hash", "join", "scan", "sort", "the", "x"]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(3, 30)))
             for _ in range(60)]
    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(60), pa.int64()),
        "text": texts}))
    out = bm25_topk(docs, {"q": ["hash", "join"]}, k=10)

    toks = [t.split() for t in texts]
    n, avgdl = 60, sum(len(t) for t in toks) / 60
    k1, b = 1.2, 0.75
    ref = {}
    for i, tk in enumerate(toks):
        s = 0.0
        for term in ["hash", "join"]:
            df = sum(1 for t2 in toks if term in t2)
            tf = tk.count(term)
            if tf == 0:
                continue
            idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(tk) / avgdl))
        if s > 0:
            ref[i] = s
    exp = sorted(ref.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = list(zip(out["doc_id"], out["score"]))
    assert [i for i, _ in got] == [i for i, _ in exp]
    for (_, gs), (_, es) in zip(got, exp):
        assert abs(gs - es) <= 1e-12 * abs(es)
    # adjacent distinct scores are separated by >> float jitter
    ss = [s for _, s in got]
    gaps = [a - b2 for a, b2 in zip(ss, ss[1:]) if a != b2]
    assert all(g > 1e-9 for g in gaps)


def test_scd2_intervals_hand_built():
    """Known gaps-and-islands: runs collapse, state may recur later
    (new interval), open interval ends at -1."""
    from kgforge.stages.windows import scd2_intervals
    t = pa.table({
        "event_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        "ts": pa.array([10, 20, 30, 40, 50, 15], pa.timestamp("us")),
        "user_id": pa.array([7, 7, 7, 7, 7, 8], pa.int64()),
        "event_type": ["a", "a", "b", "a", "a", "z"]})
    out = (scd2_intervals(ray.data.from_arrow(t), "user_id",
                          "event_type", "ts", "event_id")
           .to_pandas().sort_values(["user_id", "valid_from_us"]))
    rows = list(zip(out.user_id.astype(int), out.event_type,
                    out.valid_from_us.astype(int),
                    out.valid_to_us.astype(int),
                    out.n_events.astype(int)))
    assert rows == [(7, "a", 10, 30, 2), (7, "b", 30, 40, 1),
                    (7, "a", 40, -1, 2), (8, "z", 15, -1, 1)]


def test_triangle_counts_hand_built():
    """Two triangles sharing edge (2,3); self-loop and duplicate
    direction must not affect counts; node 5 (no triangle) omitted."""
    from kgforge.stages.graph import triangle_counts
    e = pa.table({
        "src_id": pa.array([1, 1, 2, 2, 3, 3, 4, 2], pa.uint64()),
        "dst_id": pa.array([2, 3, 3, 4, 4, 3, 5, 1], pa.uint64())})
    out = (triangle_counts(ray.data.from_arrow(e))
           .to_pandas().sort_values("node_id"))
    got = dict(zip(out.node_id.astype(int), out.n_triangles.astype(int)))
    assert got == {1: 1, 2: 2, 3: 2, 4: 1}


def test_neighborhood_jaccard_hand_built():
    """Square 1-2-3-4-1: the two diagonals are the only candidates,
    each sharing both neighbors (jaccard 1.0); edges themselves are
    excluded.  Pendant 5 on node 1 adds (2,5)/(4,5)/(3,5)? no — 5
    only neighbors 1, so (2,5),(4,5) share neighbor 1."""
    from kgforge.stages.graph import neighborhood_jaccard
    e = pa.table({"src_id": pa.array([1, 2, 3, 4], pa.uint64()),
                  "dst_id": pa.array([2, 3, 4, 1], pa.uint64())})
    out = (neighborhood_jaccard(ray.data.from_arrow(e), k=10)
           .to_pandas())
    rows = sorted(zip(out.src_id.astype(int), out.dst_id.astype(int),
                      out.inter.astype(int), out.union_ct.astype(int),
                      out.jaccard))
    assert rows == [(1, 3, 2, 2, 1.0), (2, 4, 2, 2, 1.0)]


def test_incremental_kg_state_roundtrip(tmp_path):
    """Three-batch incremental build with the state persisted to
    Parquet between deltas == one full rebuild (bit-identical node
    table) — and delta order must not matter (LWW is commutative)."""
    import json as _json
    from kgforge.keys import hash64
    from kgforge.pipelines.kg_build import (KGBuildConfig,
                                            _fused_normalized, build_kg)
    from kgforge.pipelines.kg_update import (apply_delta, compact_state,
                                             read_state, write_state)
    from kgforge.testing.corpus import write_corpus
    d = str(tmp_path / "corpus")
    write_corpus(d, n_pages=120, seed=23, n_files=3)
    cfg = KGBuildConfig(
        ontology_json=open(f"{d}/ontology.json").read(),
        alias_map=_json.load(open(f"{d}/aliases.json")))
    pages = ray.data.read_parquet(f"{d}/pages")

    def part(r):
        def f(t: pa.Table) -> pa.Table:
            urls = t.column("url").to_pylist()
            return t.filter(pa.array([hash64(u) % 3 == r for u in urls]))
        return f

    def nodes_df(ds):
        return (ds.to_pandas().sort_values("node_key")
                .reset_index(drop=True))

    full = nodes_df(build_kg(pages, cfg).nodes)

    for order in ([0, 1, 2], [2, 0, 1]):        # delta order irrelevant
        state = compact_state(_fused_normalized(
            pages.map_batches(part(order[0]), batch_format="pyarrow"),
            cfg), cfg)
        sp = str(tmp_path / f"state_{order[0]}")
        write_state(state, sp)
        nodes = None
        for r in order[1:]:
            state = read_state(sp)
            delta = _fused_normalized(
                pages.map_batches(part(r), batch_format="pyarrow"), cfg)
            nodes, _edges, state = apply_delta(state, delta, cfg)
            sp = str(tmp_path / f"state_{order[0]}_{r}")
            write_state(state, sp)
        pd.testing.assert_frame_equal(nodes_df(nodes), full,
                                      check_exact=True)


def test_clustering_coefficient_hand_built():
    """Triangle {1,2,3} + pendant 3-4: cc(1)=cc(2)=1.0, cc(3)=1/3,
    node 4 (degree 1) excluded."""
    from kgforge.stages.graph import clustering_coefficient
    e = pa.table({"src_id": pa.array([1, 2, 1, 3], pa.uint64()),
                  "dst_id": pa.array([2, 3, 3, 4], pa.uint64())})
    out = clustering_coefficient(ray.data.from_arrow(e))
    got = dict(zip(out.node_id.astype(int), out.clustering))
    assert got == {1: 1.0, 2: 1.0, 3: 2 / 6}


def test_winsorized_group_stats_clips():
    """An outlier is clipped to the group's P95 before the mean."""
    from kgforge.stages.relational import winsorized_group_stats
    vals = [1.0] * 19 + [1000.0]
    t = pa.table({"event_type": ["a"] * 20,
                  "value": pa.array(vals, pa.float64())})
    out = (winsorized_group_stats(ray.data.from_arrow(t),
                                  "event_type", "value")
           .to_pandas())
    # P95 of 20 sorted values = rank ceil(.95*20)-1 = 18 -> 1.0
    assert int(out.n[0]) == 20
    assert int(out.win_sum_cents[0]) == 2000
    assert float(out.win_mean_cents[0]) == 100.0


def test_funnel_counts_hand_built():
    """User 1 completes all 3 steps; user 2 clicks BEFORE viewing (no
    step-2 credit); user 3 views only; purchase before click (user 1's
    second purchase path) requires strict ordering."""
    from kgforge.stages.windows import funnel_counts
    t = pa.table({
        "user_id": pa.array([1, 1, 1, 2, 2, 3, 1], pa.int64()),
        "event_type": ["view", "click", "purchase",
                       "click", "view", "view", "purchase"],
        "ts": pa.array([10, 20, 30, 5, 8, 1, 15], pa.timestamp("us"))})
    out = (funnel_counts(ray.data.from_arrow(t), "user_id",
                         "event_type", "ts",
                         ["view", "click", "purchase"])
           .to_pandas().sort_values("step"))
    assert list(out.n_users.astype(int)) == [3, 1, 1]


def test_dsir_importance_weights_reference():
    """importance_weights vs an independent plain-Python recompute of
    the smoothed unigram llr, plus the semantic direction: target-like
    docs must outscore background-only docs."""
    import hashlib
    import math

    import numpy as np
    import pyarrow as pa

    import ray
    from kgforge.stages.retrieval import importance_weights

    tgt_docs = ["alpha beta gamma"] * 6 + ["alpha beta"] * 2
    bg_docs = ["zeta eta theta"] * 6 + ["theta iota"] * 2
    texts = tgt_docs + bg_docs + [""]
    langs = ["en"] * len(tgt_docs) + ["de"] * len(bg_docs) + ["en"]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "lang": pa.array(langs, pa.string()),
                  "text": pa.array(texts, pa.string())})
    out = (importance_weights(ray.data.from_arrow(t), "lang", "en")
           .to_pandas().sort_values("doc_id").reset_index(drop=True))

    # independent recompute
    dim = 256
    h = lambda w: int(hashlib.md5(w.encode()).hexdigest()[:8], 16) % dim
    c_all, c_tgt = np.zeros(dim, np.int64), np.zeros(dim, np.int64)
    for txt, lg in zip(texts, langs):
        for w in txt.split():
            c_all[h(w)] += 1
            if lg == "en":
                c_tgt[h(w)] += 1
    B, T = int(c_all.sum()), int(c_tgt.sum())
    llr = [math.floor((math.log(c_tgt[d] + 1.0) - math.log(c_all[d] + 1.0)
                       + math.log(float(B + dim))
                       - math.log(float(T + dim))) * 1e9 + 0.5)
           for d in range(dim)]
    for i, (txt, _lg) in enumerate(zip(texts, langs)):
        want = sum(llr[h(w)] for w in txt.split())
        assert out.loc[i, "score_e9"] == want, i
        assert out.loc[i, "n_tokens"] == len(txt.split())
    # direction: a pure-target doc outscores a pure-background doc
    assert out.loc[0, "score_e9"] > out.loc[len(tgt_docs), "score_e9"]
    # empty doc scores zero
    assert out.iloc[-1]["score_e9"] == 0 and out.iloc[-1]["n_tokens"] == 0


def test_dsir_null_target_rows_are_background_only():
    """A NULL in the target column must not crash pass 1 (review
    finding: null-masked bool to_numpy gives an un-indexable object
    array) — NULL rows count toward the background only."""
    import pyarrow as pa

    import ray
    from kgforge.stages.retrieval import importance_weights
    t = pa.table({"doc_id": pa.array([0, 1, 2], pa.int64()),
                  "lang": pa.array(["en", None, "de"], pa.string()),
                  "text": pa.array(["alpha beta", "alpha", "gamma"],
                                   pa.string())})
    out = (importance_weights(ray.data.from_arrow(t), "lang", "en")
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert out["n_tokens"].tolist() == [2, 1, 1]
    # the en doc scores at least as high as the background-only docs
    assert out.loc[0, "score_e9"] >= out.loc[2, "score_e9"]


def test_span_dedup_exact_substr():
    from kgforge.stages.dedup import span_dedup
    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "text": ["the quick brown fox jumps over the lazy dog",
                 "intro  text\tthe quick brown fox jumps again here",
                 "unique document with no repeats at all whatsoever",
                 "a a a a a a a a",   # self-repeating 5-gram
                 ""]}))
    out = (span_dedup(docs).to_pandas()
           .set_index("doc_id").sort_index())
    # "the quick brown fox jumps" occurs in docs 1+2 -> covered tokens go
    assert out.loc[1, "text"] == "over the lazy dog"
    assert out.loc[1, "n_tokens"] == 9 and out.loc[1, "n_removed"] == 5
    # whitespace-normalized rebuild (double space / tab collapse)
    assert out.loc[2, "text"] == "intro text again here"
    # untouched doc still whitespace-normalized, zero removed
    assert out.loc[3, "n_removed"] == 0
    assert out.loc[3, "text"].startswith("unique document")
    # within-document repetition counts toward the >=2 occurrences
    assert out.loc[4, "text"] == "" and out.loc[4, "n_removed"] == 8
    # empty doc: no tokens, empty rebuild
    assert out.loc[5, "text"] == "" and out.loc[5, "n_tokens"] == 0


def test_span_dedup_boundary_isolation():
    # identical 5-grams split across two docs must NOT merge windows:
    # each doc alone has the gram once -> global count 2 -> banned;
    # but a window never crosses a doc boundary.
    from kgforge.stages.dedup import span_dedup
    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": ["p q r s t", "p q r s t u v"]}))
    out = (span_dedup(docs).to_pandas()
           .set_index("doc_id").sort_index())
    assert out.loc[1, "text"] == "" and out.loc[1, "n_removed"] == 5
    # doc 2: grams "p q r s t"(x2 corpus-wide) banned; "q r s t u",
    # "r s t u v" occur once -> only first 5 tokens covered
    assert out.loc[2, "text"] == "u v" and out.loc[2, "n_removed"] == 5


def test_deterministic_walks_paths_and_handcheck():
    import hashlib
    from kgforge.stages.graph import deterministic_walks
    edges = ray.data.from_arrow(pa.table({
        "src_id": pa.array([1, 1, 2, 3, 4, 5, 2**63 + 7], pa.uint64()),
        "dst_id": pa.array([2, 3, 3, 4, 1, 1, 1], pa.uint64())}))
    a = (deterministic_walks(edges, n_walks=2, walk_len=3)
         .to_pandas().sort_values(["start_id", "rep", "step"])
         .reset_index(drop=True))
    b = (deterministic_walks(edges, n_walks=2, walk_len=3,
                             mode="distributed")
         .to_pandas().sort_values(["start_id", "rep", "step"])
         .reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b, check_exact=True)
    # every walk has exactly walk_len+1 rows; walks never die
    assert len(a) == 6 * 2 * 4          # 6 nodes x 2 reps x 4 steps
    # hand-derived first step of walk (start=1, rep=0): neighbors of 1
    # ascending are [2,3,4,5,2^63+7]; choice = md5("1:0:1") % 5
    h = int(hashlib.md5(b"1:0:1").hexdigest()[:16], 16)
    nb = sorted([2, 3, 4, 5, 2**63 + 7])
    got = a[(a.start_id == 1) & (a.rep == 0)
            & (a.step == 1)].node_id.iloc[0]
    assert int(got) == nb[h % 5]
    # empty graph -> empty corpus on both paths
    empty = ray.data.from_arrow(pa.table({
        "src_id": pa.array([], pa.uint64()),
        "dst_id": pa.array([], pa.uint64())}))
    assert deterministic_walks(empty, 2, 2).count() == 0


def test_personalized_pagerank_fixed():
    from kgforge.stages.graph import personalized_pagerank_fixed
    # chain 1-2-3-4-5-6: seeds = {1,2} (n_seeds=2); mass concentrates
    # near the seeds and decays along the chain
    edges = ray.data.from_arrow(pa.table({
        "src_id": pa.array([1, 2, 3, 4, 5], pa.uint64()),
        "dst_id": pa.array([2, 3, 4, 5, 6], pa.uint64())}))
    # n_iter=30: the initial seed pulse decays ~0.85^30 so the
    # steady-state ordering assertions below hold
    out = personalized_pagerank_fixed(edges, n_seeds=2, n_iter=30)
    out = out.set_index("node_id").sort_index()
    assert len(out) == 6
    # total mass bounded by S
    assert out["ppr_fixed"].sum() <= (1 << 40)
    # steady state (hand-derived fixpoint): r2 > r3 > r4 > r5 > r6,
    # seed 1 holds only teleport + dangling return (~0.127)
    assert out.loc[2, "ppr"] == out["ppr"].max()
    assert (out.loc[3, "ppr"] > out.loc[4, "ppr"]
            > out.loc[5, "ppr"] > out.loc[6, "ppr"])
    assert 0.07 < out.loc[1, "ppr"] < out.loc[2, "ppr"]
    # non-seed unreachable node gets zero teleport: isolated via a
    # second component reachable only FROM it (no in-edges, not seed)
    edges2 = ray.data.from_arrow(pa.table({
        "src_id": pa.array([1, 9], pa.uint64()),
        "dst_id": pa.array([2, 8], pa.uint64())}))
    out2 = (personalized_pagerank_fixed(edges2, n_seeds=2, n_iter=5)
            .set_index("node_id"))
    assert out2.loc[9, "ppr_fixed"] == 0       # no teleport, no paths in
    assert out2.loc[1, "ppr_fixed"] > 0 and out2.loc[2, "ppr_fixed"] > 0


def test_kmv_quantiles_envelope():
    """The deterministic bottom-k sample's quantiles track the exact
    quantiles (uniform sample; loose envelope — exactness vs the SQL
    oracle is the gate's job, this pins statistical sanity)."""
    from kgforge.pipelines.queries import (events_value_quantiles,
                                           events_value_quantiles_kmv)
    sf = "/root/testdata/sf0.001"
    ex = {r["q"]: r["value"]
          for r in events_value_quantiles(sf).to_pylist()}
    ap = {r["q"]: r["value"]
          for r in events_value_quantiles_kmv(sf).to_pylist()}
    assert set(ex) == set(ap)
    for q in ex:
        assert abs(ap[q] - ex[q]) <= 0.25 * max(abs(ex[q]), 1.0)


def test_fuzzy_pairs_editdist1_semantics():
    from kgforge.stages.dedup import _editdist_le1, fuzzy_pairs_editdist1
    # unit: every edit kind + rejections
    assert _editdist_le1("abc", "abc")          # dist 0
    assert _editdist_le1("abc", "abd")          # substitution
    assert _editdist_le1("abc", "abxc")         # insertion
    assert _editdist_le1("abc", "ab")           # deletion
    assert not _editdist_le1("abc", "adx")      # dist 2 same length
    assert not _editdist_le1("abc", "cab")      # rotation = dist 2
    assert not _editdist_le1("abc", "abcde")    # length gap 2
    assert _editdist_le1("", "x") and _editdist_le1("", "")
    ds = ray.data.from_arrow(pa.table({
        "id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        "name": pa.array(["kitten", "kitteo", "kitte", "sitten",
                          "mitten", "müller"], pa.string())}))
    out = (fuzzy_pairs_editdist1(ds, "id", "name").to_pandas()
           .sort_values(["a_id", "b_id"]))
    got = set(zip(out["a_id"], out["b_id"]))
    # kitten~kitteo (sub), kitten~kitte (del), kitten~sitten (sub),
    # kitten~mitten (sub), kitteo~kitte (del), sitten~mitten (sub)
    assert got == {(1, 2), (1, 3), (1, 4), (1, 5), (2, 3), (4, 5)}
    assert (out["dist"] == 1).all()
    # duplicate names pair at dist 0, exactly once despite many
    # shared deletion keys
    ds2 = ray.data.from_arrow(pa.table({
        "id": pa.array([7, 8], pa.int64()),
        "name": pa.array(["same", "same"], pa.string())}))
    out2 = fuzzy_pairs_editdist1(ds2, "id", "name").to_pandas()
    assert len(out2) == 1 and out2["dist"].iloc[0] == 0


def test_weighted_pagerank_weights_matter():
    from kgforge.stages.graph import pagerank_weighted_fixed
    # star: hub 1 linked to 2 (weight 9) and 3 (weight 1) — mass from
    # the hub splits 9:1, so 2 must outrank 3; with equal weights they
    # tie exactly
    edges = ray.data.from_arrow(pa.table({
        "src_id": pa.array([1, 1], pa.uint64()),
        "dst_id": pa.array([2, 3], pa.uint64()),
        "w": pa.array([9, 1], pa.int64())}))
    out = (pagerank_weighted_fixed(edges, n_iter=10)
           .set_index("node_id"))
    assert out.loc[2, "wpr_fixed"] > out.loc[3, "wpr_fixed"]
    eq = ray.data.from_arrow(pa.table({
        "src_id": pa.array([1, 1], pa.uint64()),
        "dst_id": pa.array([2, 3], pa.uint64()),
        "w": pa.array([5, 5], pa.int64())}))
    oeq = (pagerank_weighted_fixed(eq, n_iter=10)
           .set_index("node_id"))
    assert oeq.loc[2, "wpr_fixed"] == oeq.loc[3, "wpr_fixed"]
    # mass bounded by S
    assert out["wpr_fixed"].sum() <= (1 << 40)
    # overflow guard trips loudly
    import pytest as _pt
    heavy = ray.data.from_arrow(pa.table({
        "src_id": pa.array([1], pa.uint64()),
        "dst_id": pa.array([2], pa.uint64()),
        "w": pa.array([1 << 40], pa.int64())}))
    with _pt.raises(ValueError):
        pagerank_weighted_fixed(heavy, n_iter=1)


def test_streaming_exact_dedup_equals_batch():
    """The streaming operator's min-id/count state merge is order-free,
    so its final emission must equal the batch operator's output — the
    property that lets it share the SQL oracle."""
    from kgforge.stages.dedup import exact_dedup
    from kgforge.stages.streaming import streaming_exact_dedup
    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([5, 1, 3, 2, 9, 7], pa.int64()),
        "text": pa.array(["a", "b", "a", "b", "c", "a"], pa.string())}))
    key = ["doc_id", "n_dups", "text_hash"]
    batch = (exact_dedup(docs, keep_text=False).to_pandas()
             .sort_values(key).reset_index(drop=True))
    stream = (streaming_exact_dedup(docs, n_workers=2, batch_rows=2)
              .to_pandas()[key].sort_values(key)
              .reset_index(drop=True))
    pd.testing.assert_frame_equal(batch[key], stream, check_exact=True)
    assert stream["n_dups"].sum() == 6 and len(stream) == 3
    assert set(stream["doc_id"]) == {1, 3, 9}  # min id per text
    # production fast-hash mode (vectorized siphash64, no per-row md5):
    # identical winners and counts; only the hash VALUES differ (hex of
    # uint64 instead of md5)
    fast = (streaming_exact_dedup(docs, n_workers=2, batch_rows=2,
                                  oracle_mode=False)
            .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(
        batch[["doc_id", "n_dups"]].sort_values("doc_id")
        .reset_index(drop=True),
        fast[["doc_id", "n_dups"]], check_exact=True)
    assert fast["text_hash"].str.fullmatch("[0-9a-f]{16}").all()


def test_hll_drops_nulls_like_sql():
    # engine must DROP None (the oracle's md5(CAST(x AS VARCHAR)) is
    # NULL for NULL and its register join discards it) — hashing
    # str(None) would silently diverge on null-bearing data
    from kgforge.stages.sketches import hll_partial
    import numpy as np
    a = hll_partial([1, 2, 3, None, None])
    b = hll_partial([1, 2, 3])
    assert np.array_equal(a, b)
    assert not hll_partial([None]).any()


def test_weighted_pagerank_directed_sinks():
    # undirected=False with a pure-sink node: the sink must be in the
    # node universe and receive mass (not crash / credit a neighbor)
    from kgforge.stages.graph import pagerank_weighted_fixed
    edges = ray.data.from_arrow(pa.table({
        "src_id": pa.array([1, 5], pa.uint64()),
        "dst_id": pa.array([2, 1], pa.uint64()),
        "w": pa.array([1, 1], pa.int64())}))
    out = (pagerank_weighted_fixed(edges, n_iter=5, undirected=False)
           .set_index("node_id").sort_index())
    assert set(out.index) == {1, 2, 5}
    assert out.loc[2, "wpr_fixed"] > out.loc[5, "wpr_fixed"]


def _span_dedup_reference(texts, n=5, min_count=2):
    """Plain-Python ExactSubstr reference: count positional word
    n-grams corpus-wide, ban count >= min_count, strip covered
    tokens, rebuild whitespace-normalized."""
    toks = [t.split() for t in texts]
    from collections import Counter
    cnt = Counter()
    for tk in toks:
        for i in range(len(tk) - n + 1):
            cnt[" ".join(tk[i:i + n])] += 1
    banned = {g for g, c in cnt.items() if c >= min_count}
    out = []
    for tk in toks:
        covered = [False] * len(tk)
        for i in range(len(tk) - n + 1):
            if " ".join(tk[i:i + n]) in banned:
                for j in range(i, i + n):
                    covered[j] = True
        kept = [t for t, c in zip(tk, covered) if not c]
        out.append((" ".join(kept), len(tk),
                    len(tk) - len(kept)))
    return out


def test_span_dedup_matches_reference_randomized():
    """Randomized parity vs the plain-Python ExactSubstr reference:
    tiny vocabulary forces plenty of duplicated 5-grams, multiple
    blocks force cross-batch gram counting."""
    import random
    from kgforge.stages.dedup import span_dedup
    rng = random.Random(7)
    vocab = ["a", "b", "c", "d"]
    texts = [" ".join(rng.choice(vocab)
                      for _ in range(rng.randint(0, 14)))
             for _ in range(60)]
    ref = _span_dedup_reference(texts)
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(60), pa.int64()),
        "text": pa.array(texts, pa.string())})).repartition(7)
    out = (span_dedup(ds).to_pandas().set_index("doc_id")
           .sort_index())
    for i, (txt, ntok, nrem) in enumerate(ref):
        assert out.loc[i, "text"] == txt, i
        assert out.loc[i, "n_tokens"] == ntok
        assert out.loc[i, "n_removed"] == nrem


def test_walks_match_reference_randomized():
    """Randomized parity vs a plain-Python walk simulator on a random
    graph (both paths of the engine already parity-pinned; this pins
    the SEMANTICS against an independent implementation)."""
    import hashlib
    import random
    from kgforge.stages.graph import deterministic_walks
    rng = random.Random(13)
    edges = set()
    while len(edges) < 40:
        a, b = rng.randint(1, 20), rng.randint(1, 20)
        if a != b:
            edges.add((min(a, b), max(a, b)))
    el = sorted(edges)
    ds = ray.data.from_arrow(pa.table({
        "src_id": pa.array([a for a, _ in el], pa.uint64()),
        "dst_id": pa.array([b for _, b in el], pa.uint64())}))
    out = deterministic_walks(ds, n_walks=2, walk_len=4).to_pandas()
    nbrs: dict = {}
    for a, b in el:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    nbrs = {k: sorted(v) for k, v in nbrs.items()}
    expect = {}
    for s in nbrs:
        for rep in range(2):
            cur = s
            expect[(s, rep, 0)] = s
            for t in range(1, 5):
                h = int(hashlib.md5(
                    f"{s}:{rep}:{t}".encode()).hexdigest()[:16], 16)
                cur = nbrs[cur][h % len(nbrs[cur])]
                expect[(s, rep, t)] = cur
    got = {(int(r.start_id), int(r.rep), int(r.step)): int(r.node_id)
           for r in out.itertuples()}
    assert got == expect
