"""Unit tests for the wave-5 operators: grouped Pearson correlation,
retention cohorts, ordered journey agg, grouped token frequencies,
sentence segmentation, weighted Bernoulli sampling, count-min sketch."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from kgforge.functions.textstats import sentences_batch
from kgforge.stages.relational import (grouped_corr,
                                       grouped_token_frequencies,
                                       weighted_bernoulli_sample)
from kgforge.stages.sketches import (CMS_DEPTH, CMS_WIDTH, cms_build,
                                     cms_estimate)
from kgforge.stages.windows import grouped_journey, retention_cohorts


def test_grouped_corr_matches_numpy():
    rng = np.random.default_rng(5)
    n = 800
    x = np.round(rng.uniform(1, 50, n), 2)
    y = np.round(3.0 * x + rng.normal(0, 10, n), 2)
    df = pd.DataFrame({"g": np.repeat(["a", "b"], n // 2),
                       "x": x, "y": y})
    out = (grouped_corr(ray.data.from_pandas(df), "g", "x", "y")
           .to_pandas().set_index("g"))
    for g, sub in df.groupby("g"):
        xc = np.floor(sub["x"].to_numpy() * 100 + 0.5).astype(np.int64)
        yc = np.floor(sub["y"].to_numpy() * 100 + 0.5).astype(np.int64)
        ref = np.corrcoef(xc, yc)[0, 1]
        assert abs(out.loc[g, "corr"] - ref) < 1e-9
        assert out.loc[g, "n"] == len(sub)
    # constant column → corr forced to 0, not nan
    const = pd.DataFrame({"g": ["c"] * 4, "x": [1.0] * 4,
                          "y": [1.0, 2.0, 3.0, 4.0]})
    oc = grouped_corr(ray.data.from_pandas(const),
                      "g", "x", "y").to_pandas()
    assert oc["corr"].iloc[0] == 0.0


def test_retention_cohorts_small():
    wk = 604_800
    df = pd.DataFrame({
        "user_id": np.array([1, 1, 1, 2, 2, 3], np.int64),
        # u1: weeks 0,1,3 · u2: weeks 1,1 · u3: week 3
        "ts": pd.to_datetime(np.array(
            [10, wk + 5, 3 * wk + 2, wk + 1, wk + 9, 3 * wk], np.int64),
            unit="s")})
    out = (retention_cohorts(ray.data.from_pandas(df))
           .to_pandas()
           .sort_values(["cohort_week", "week_offset"])
           .reset_index(drop=True))
    got = {(r.cohort_week, r.week_offset): r.n_users
           for r in out.itertuples()}
    # cohort weeks are absolute epoch weeks: u1 joins week 0, u2 week 1,
    # u3 week 3
    assert got[(0, 0)] == 1 and got[(0, 1)] == 1 and got[(0, 3)] == 1
    assert got[(1, 0)] == 1          # u2 active only its join week
    assert got[(3, 0)] == 1          # u3
    assert len(got) == 5


def test_grouped_journey_order_and_ties():
    df = pd.DataFrame({
        "event_id": np.array([4, 1, 2, 3], np.int64),
        "user_id": np.array([7, 7, 7, 8], np.int64),
        "event_type": ["d", "a", "b", "c"],
        # equal timestamps for events 4 and 2 → event_id breaks the tie
        "ts": pd.to_datetime([100, 50, 100, 10], unit="s")})
    out = (grouped_journey(ray.data.from_pandas(df))
           .to_pandas().set_index("user_id"))
    assert out.loc[7, "journey"] == "a>b>d"
    assert out.loc[7, "n_events"] == 3
    assert out.loc[8, "journey"] == "c"


def test_grouped_token_frequencies_topk():
    df = pd.DataFrame({
        "lang": ["en", "en", "de"],
        "text": ["a a a b b c", "b z", "x x y"]})
    out = (grouped_token_frequencies(ray.data.from_pandas(df),
                                     "lang", "text", k=2)
           .to_pandas().sort_values(["lang", "n", "token"],
                                    ascending=[True, False, True])
           .reset_index(drop=True))
    en = out[out["lang"] == "en"]
    assert list(zip(en["token"], en["n"])) == [("a", 3), ("b", 3)]
    de = out[out["lang"] == "de"]
    assert list(zip(de["token"], de["n"])) == [("x", 2), ("y", 1)]


def test_sentences_batch():
    t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "text": ["Hi there. Bye! Ok", "no terminator", ""]})
    out = sentences_batch(t)
    assert out.column("doc_id").to_pylist() == [1, 1, 1, 2]
    assert out.column("sent_idx").to_pylist() == [1, 2, 3, 1]
    assert out.column("sentence").to_pylist() == [
        "Hi there.", " Bye!", " Ok", "no terminator"]
    assert out.column("n_chars_sent").to_pylist() == [9, 5, 3, 13]


def test_weighted_sample_deterministic_and_monotone():
    df = pd.DataFrame({"doc_id": np.arange(2000, dtype=np.int64),
                       "n_chars": np.tile([100, 1000, 4000, 8000], 500)})
    ds = ray.data.from_pandas(df)
    a = weighted_bernoulli_sample(ds, "doc_id", "n_chars",
                                  scale=4000).to_pandas()
    b = weighted_bernoulli_sample(ds, "doc_id", "n_chars",
                                  scale=4000).to_pandas()
    assert sorted(a["doc_id"]) == sorted(b["doc_id"])   # deterministic
    # weight ≥ scale → probability 1 (u52 < 2^52 always)
    kept = set(a["doc_id"])
    assert all(i in kept for i in df[df["n_chars"] >= 4000]["doc_id"])
    # empirical rates near w/scale
    for w, lo, hi in [(100, 0.0, 0.10), (1000, 0.15, 0.35)]:
        ids = df[df["n_chars"] == w]["doc_id"]
        rate = sum(i in kept for i in ids) / len(ids)
        assert lo <= rate <= hi, (w, rate)


def test_cms_never_undercounts_and_merge():
    rng = np.random.default_rng(9)
    keys = rng.integers(0, 300, 5000).astype(np.int64)
    ds = ray.data.from_arrow(pa.table({"k": pa.array(keys, pa.int64())}))
    mat = cms_build(ds, "k")
    assert mat.shape == (CMS_DEPTH, CMS_WIDTH)
    assert mat.sum() == CMS_DEPTH * len(keys)
    # merge = elementwise sum of the two halves' matrices
    m1 = cms_build(ray.data.from_arrow(
        pa.table({"k": pa.array(keys[:2500], pa.int64())})), "k")
    m2 = cms_build(ray.data.from_arrow(
        pa.table({"k": pa.array(keys[2500:], pa.int64())})), "k")
    assert np.array_equal(mat, m1 + m2)

    true = pd.Series(keys).value_counts()
    uniq = ray.data.from_arrow(pa.table({
        "k": pa.array(sorted(set(keys.tolist())), pa.int64())}))
    est = (cms_estimate(uniq, "k", mat).to_pandas()
           .set_index("k")["cms_count"])
    # the defining CMS property: estimate >= true count, always
    assert all(est[k] >= true[k] for k in true.index)
    # and with 300 keys in 4×1024 cells, overcounts should be rare
    assert (sum(est[k] - true[k] for k in true.index)
            / true.sum() < 0.2)


def test_cube_levels():
    from kgforge.stages.relational import rollup_aggregate
    df = pd.DataFrame({"a": ["x", "x", "y"],
                       "b": np.array([1, 2, 1], np.int64),
                       "value": [1.0, 2.0, 4.0]})
    out = rollup_aggregate(ray.data.from_pandas(df),
                           [("a", "ALL"), ("b", -1)], "value",
                           mode="cube").to_pandas()
    # cube(2 dims): 3 finest + 2 by-a + 2 by-b + 1 grand = 8
    assert len(out) == 8
    byb = out[(out["a"] == "ALL") & (out["b"] == 1)]
    assert byb["n"].iloc[0] == 2 and byb["sum_cents"].iloc[0] == 500
    grand = out[(out["a"] == "ALL") & (out["b"] == -1)]
    assert grand["n"].iloc[0] == 3 and grand["sum_cents"].iloc[0] == 700


def test_grouped_mode_tiebreak():
    from kgforge.stages.relational import grouped_mode
    df = pd.DataFrame({"g": ["a"] * 4 + ["b"] * 3,
                       # group a: 2.0 ×2 ties 1.0 ×2 → smaller value wins
                       "value": [2.0, 2.0, 1.0, 1.0, 7.0, 7.0, 3.0]})
    out = (grouped_mode(ray.data.from_pandas(df), "g", "value")
           .to_pandas().set_index("g"))
    assert out.loc["a", "mode_cents"] == 100 and out.loc["a", "mode_n"] == 2
    assert out.loc["b", "mode_cents"] == 700 and out.loc["b", "mode_n"] == 2


def test_grouped_distinct_count():
    from kgforge.stages.relational import grouped_distinct_count
    rng = np.random.default_rng(2)
    df = pd.DataFrame({"g": rng.choice(["a", "b", "c"], 1000),
                       "u": rng.integers(0, 40, 1000).astype(np.int64)})
    out = (grouped_distinct_count(ray.data.from_pandas(df), "g", "u")
           .to_pandas().set_index("g"))
    for g, sub in df.groupby("g"):
        assert out.loc[g, "n_distinct"] == sub["u"].nunique()


def test_k_core_planted_clique_and_parity():
    from kgforge.stages.graph import k_core
    rng = np.random.default_rng(4)
    # sparse random graph + a planted 8-clique on nodes 100..107
    src = rng.integers(0, 60, 150).astype(np.int64)
    dst = rng.integers(0, 60, 150).astype(np.int64)
    cl = np.arange(100, 108, dtype=np.int64)
    ca, cb = map(np.ravel, np.meshgrid(cl, cl))
    m = ca < cb
    edges = pd.DataFrame({
        "src_id": np.concatenate([src, ca[m]]),
        "dst_id": np.concatenate([dst, cb[m]])})
    out, rounds = k_core(ray.data.from_pandas(edges), k=7)
    df = out.to_pandas()
    assert rounds < 40
    # the 8-clique IS the 7-core unless the random part conspires
    assert set(df["node_id"].astype(np.int64)) >= set(cl.tolist())
    assert all(df["core_degree"] >= 7)

    # brute-force peel parity on the full undirected simple graph
    und = set()
    for s, d in edges.itertuples(index=False):
        if s != d:
            und.add((min(s, d), max(s, d)))
    adj = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    active = set(adj)
    while True:
        drop = {v for v in active
                if len(adj[v] & active) < 7}
        if not drop:
            break
        active -= drop
    assert set(df["node_id"].astype(np.int64)) == active
    for r in df.itertuples():
        assert r.core_degree == len(adj[int(r.node_id)] & active)


def test_kg_kcore_rounds_within_sql_unroll():
    """The bounded-unroll oracle is only exact if the engine's peel
    converges inside the budget — check it on the actual gate graph."""
    from kgforge.pipelines import queries as Q
    from kgforge.stages.graph import k_core
    _, rounds = k_core(Q._comention_edges("/root/testdata/sf0.001"),
                       k=Q.KCORE_K)
    assert rounds <= Q.KCORE_SQL_ROUNDS


def test_running_sum_skips_null_values():
    from kgforge.stages.windows import grouped_running_sum
    t = pa.table({
        "event_id": pa.array([1, 2, 3], pa.int64()),
        "user_id": pa.array([5, 5, 5], pa.int64()),
        "ts": pa.array(pd.to_datetime([10, 20, 30], unit="s")),
        "value": pa.array([1.0, None, 2.0], pa.float64())})
    out = (grouped_running_sum(ray.data.from_arrow(t))
           .to_pandas().sort_values("event_id"))
    # the NULL row is dropped (oracle: WHERE value IS NOT NULL) and
    # does NOT poison later sums
    assert out["event_id"].tolist() == [1, 3]
    assert out["running_cents"].tolist() == [100, 300]


def test_full_outer_join_null_keys_never_match():
    from kgforge.stages.joins import full_outer_join
    left = ray.data.from_arrow(pa.table({
        "lk": pa.array([1, None], pa.int64()),
        "lv": pa.array(["a", "b"], pa.string())}))
    right = ray.data.from_arrow(pa.table({
        "rk": pa.array([1, None], pa.int64()),
        "rv": pa.array([10, 20], pa.int64())}))
    out = full_outer_join(left, right, "lk", "rk",
                          ["lv"], ["rv"]).to_pandas()
    # 1<->1 matches; the two NULL-key rows pass through UNMATCHED
    assert len(out) == 3
    matched = out[out["key"] == 1]
    assert matched["lv"].iloc[0] == "a" and matched["rv"].iloc[0] == 10
    nulls = out[out["key"].isna()]
    assert len(nulls) == 2
    assert sorted(nulls["lv"].fillna("-")) == ["-", "b"]
    assert sorted(nulls["rv"].fillna(-1).astype(int)) == [-1, 20]


def test_grouped_zscore_null_group_dropped():
    from kgforge.stages.relational import grouped_zscore
    t = pa.table({
        "event_id": pa.array([1, 2, 3], pa.int64()),
        "g": pa.array(["a", None, "a"], pa.string()),
        "value": pa.array([1.0, 5.0, 3.0], pa.float64())})
    out = grouped_zscore(ray.data.from_arrow(t), "g", "value",
                         keep_cols=["event_id"]).to_pandas()
    # no KeyError; the null-group row drops exactly as the oracle's
    # JOIN on the group key drops it
    assert out["event_id"].tolist() == [1, 3]


def test_negative_samples_properties():
    from kgforge.stages.graph import negative_edge_samples
    edges = pd.DataFrame({
        "src_id": np.array([1, 2, 3, 4, 1], np.int64),
        "dst_id": np.array([2, 3, 4, 5, 3], np.int64)})
    ds = ray.data.from_pandas(edges)
    a = negative_edge_samples(ds, k=8).to_pandas()
    b = negative_edge_samples(ds, k=8).to_pandas()
    key = ["src_id", "sample_j"]
    pd.testing.assert_frame_equal(
        a.sort_values(key).reset_index(drop=True),
        b.sort_values(key).reset_index(drop=True))     # deterministic
    und = {(min(s, d), max(s, d))
           for s, d in edges.itertuples(index=False)}
    for r in a.itertuples():
        assert r.src_id != r.neg_id
        assert (min(r.src_id, r.neg_id),
                max(r.src_id, r.neg_id)) not in und


def test_negative_samples_pair_strategy_parity():
    """Broadcast pair set vs the anti-join scale path: identical
    output on the same graph (the test_join_strategy_parity pattern),
    including ids above 2**63 riding the exact string pair key."""
    from kgforge.stages.graph import negative_edge_samples
    big = 2**63 + 11
    edges = pa.table({
        "src_id": pa.array([1, 2, 3, 4, 1, big], pa.uint64()),
        "dst_id": pa.array([2, 3, 4, 5, 3, 1], pa.uint64())})
    ds = ray.data.from_arrow(edges)
    key = ["src_id", "sample_j"]
    a = (negative_edge_samples(ds, k=8, pair_strategy="broadcast")
         .to_pandas().sort_values(key).reset_index(drop=True))
    b = (negative_edge_samples(ds, k=8, pair_strategy="join")
         .to_pandas().sort_values(key).reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)
    assert len(a) > 0
    # auto gates to the join path when the pair budget is zero
    c = (negative_edge_samples(ds, k=8, broadcast_pair_limit=0)
         .to_pandas().sort_values(key).reset_index(drop=True))
    pd.testing.assert_frame_equal(a, c)


def test_grouped_hll_envelope():
    from kgforge.stages.sketches import grouped_hll_distinct
    rng = np.random.default_rng(6)
    df = pd.DataFrame({
        "g": rng.choice(["a", "b", "c"], 30_000),
        "u": rng.integers(0, 5000, 30_000).astype(np.int64)})
    out = (grouped_hll_distinct(ray.data.from_pandas(df), "g", "u")
           .to_pandas().set_index("g"))
    for g, sub in df.groupby("g"):
        true = sub["u"].nunique()
        assert abs(out.loc[g, "approx_distinct"] - true) / true < 0.08


def test_pivot_counts_null_values_count_but_sum_zero():
    """SQL semantics pin for NULL values in pivot_counts: count(*)
    FILTER counts the row, SUM skips the NULL (== adds 0 cents).
    Without the validity mask np.floor(NaN).astype(int64) is undefined
    garbage (typically INT64_MIN) — the null class this repo already
    fixed in windows/rollup/left_outer_join."""
    from kgforge.stages.relational import pivot_counts
    t = pa.table({
        "user_id": pa.array([1, 1, 1, 2, 2], pa.int64()),
        "event_type": pa.array(["a", "a", "b", "a", "b"], pa.string()),
        "value": pa.array([1.25, None, 2.0, None, None], pa.float64())})
    out = (pivot_counts(ray.data.from_arrow(t), "user_id", "event_type",
                        "value", ["a", "b"])
           .to_pandas().sort_values("user_id").set_index("user_id"))
    assert out.loc[1, "n_a"] == 2 and out.loc[1, "cents_a"] == 125
    assert out.loc[1, "n_b"] == 1 and out.loc[1, "cents_b"] == 200
    # all-NULL group: rows counted, zero cents (COALESCE(SUM...,0))
    assert out.loc[2, "n_a"] == 1 and out.loc[2, "cents_a"] == 0
    assert out.loc[2, "n_b"] == 1 and out.loc[2, "cents_b"] == 0


def test_grouped_limit_preserves_arrow_payload_types():
    """grouped_limit must not round-trip payload columns through
    pandas: a nullable int64 payload would degrade to float64 and
    corrupt ids above 2^53."""
    from kgforge.stages.relational import grouped_limit
    big = (1 << 62) + 7                      # not float64-representable
    t = pa.table({
        "k": pa.array(["x", "x", "x", "y"], pa.string()),
        "o": pa.array(["1", "2", "3", "1"], pa.string()),
        "payload": pa.array([big, None, big + 1, big + 2], pa.int64())})
    out = grouped_limit(ray.data.from_arrow(t), "k", "o", k=2)
    schema = out.schema()
    assert schema.types[schema.names.index("payload")] == pa.int64()
    # assert Arrow-side: to_pandas() itself would degrade the nullable
    # int64 to float64 (the exact trap the operator must not hit)
    tbl = pa.concat_tables(
        ray.get(out.to_arrow_refs())).combine_chunks()
    kept = {(k, o): v for k, o, v in zip(
        tbl.column("k").to_pylist(), tbl.column("o").to_pylist(),
        tbl.column("payload").to_pylist())}
    assert kept[("x", "1")] == big          # bit-exact, no float round
    assert kept[("x", "2")] is None
    assert kept[("y", "1")] == big + 2
    assert ("x", "3") not in kept
