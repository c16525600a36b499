"""Round-5 session-G operators: grouped OLS trend, half-life decayed
sums, type-token ratio, domain-vocabulary Jaccard — plain-python
reference parity + edge cases (the DuckDB-exactness gates live in
test_entry_gate.py; these pin semantics against naive references)."""

import math
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray

from kgforge.functions.textstats import ttr_batch
from kgforge.stages.relational import grouped_ols_trend, host_vocab_jaccard
from kgforge.stages.windows import decayed_sum

_WS = re.compile(r"[ \t\n\f\r]+")


def _tokens(text) -> list[str]:
    return [t for t in _WS.split(text or "") if t]


@pytest.mark.usefixtures("ray_session")
def test_ols_trend_recovers_exact_line():
    # y = 3x + 700 cents on a perfect line -> exact slope/intercept
    base = 1_700_000_000_000_000  # µs
    xs = [base + i * 1_000_000_000_000 for i in range(6)]  # 1e6-sec steps
    ds = ray.data.from_arrow(pa.table({
        "g": pa.array(["a"] * 6, pa.string()),
        "ts": pa.array(xs, pa.timestamp("us")),
        # value in dollars; cents = 3 * epoch_sec + 700
        "value": pa.array([(3 * (x // 1_000_000) + 700) / 100.0
                           for x in xs], pa.float64())}))
    out = grouped_ols_trend(ds, "g", "ts", "value").to_pandas()
    assert len(out) == 1
    assert out["n"][0] == 6
    assert out["slope"][0] == pytest.approx(3.0, abs=1e-9)
    assert out["intercept"][0] == pytest.approx(700.0, rel=1e-9)


@pytest.mark.usefixtures("ray_session")
def test_ols_trend_zero_variance_and_nulls():
    ds = ray.data.from_arrow(pa.table({
        "g": pa.array(["z", "z", None, "z"], pa.string()),
        "ts": pa.array([1_000_000] * 4, pa.timestamp("us")),
        "value": pa.array([1.0, 2.0, 3.0, None], pa.float64())}))
    out = grouped_ols_trend(ds, "g", "ts", "value").to_pandas()
    # same x for every row -> zero variance -> slope = intercept = 0.0
    assert len(out) == 1 and out["n"][0] == 2
    assert out["slope"][0] == 0.0 and out["intercept"][0] == 0.0


@pytest.mark.usefixtures("ray_session")
def test_decayed_sum_halves_per_halflife():
    hl = 604_800_000_000
    anchor = 10 * hl
    ds = ray.data.from_arrow(pa.table({
        "user_id": pa.array([1, 1, 1, 2], pa.int64()),
        "ts": pa.array([anchor, anchor - hl, anchor - 2 * hl, anchor],
                       pa.timestamp("us")),
        "value": pa.array([4.0, 4.0, 4.0, 1.0], pa.float64())}))
    out = decayed_sum(ds).to_pandas().set_index("user_id")
    # user 1: 400 + 200 + 100 cents decayed
    assert out.loc[1, "decayed_cents"] == pytest.approx(700.0)
    assert out.loc[1, "n_events"] == 3
    assert out.loc[2, "decayed_cents"] == pytest.approx(100.0)


@pytest.mark.usefixtures("ray_session")
def test_decayed_sum_saturates_at_kmax():
    hl = 604_800_000_000
    anchor = 1_000 * hl
    ds = ray.data.from_arrow(pa.table({
        "user_id": pa.array([7, 7], pa.int64()),
        "ts": pa.array([anchor, anchor - 500 * hl], pa.timestamp("us")),
        "value": pa.array([1.0, 1.0], pa.float64())}))
    out = decayed_sum(ds).to_pandas()
    # the 500-half-life-old event contributes 100/2^40, not 0
    expected = 100.0 + 100.0 / float(1 << 40)
    assert out["decayed_cents"][0] == expected


@pytest.mark.usefixtures("ray_session")
def test_ttr_matches_reference_counts():
    texts = ["a b a c", "x x x", "", None, "solo"]
    t = pa.table({"doc_id": pa.array(range(5), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    out = ttr_batch(t).to_pandas().set_index("doc_id")
    # zero-token docs (idx 2, 3) are dropped
    assert sorted(out.index) == [0, 1, 4]
    assert out.loc[0, "n_tokens"] == 4 and out.loc[0, "n_types"] == 3
    assert out.loc[0, "ttr"] == 3.0 / 4.0
    assert out.loc[1, "ttr"] == 1.0 / 3.0
    assert out.loc[4, "ttr"] == 1.0


@pytest.mark.usefixtures("ray_session")
def test_host_vocab_jaccard_reference():
    urls = ["https://a.test/x/1", "https://a.test/x/2",
            "https://a.test/y/1", "https://b.test/x/1"]
    texts = ["apple banana", "banana cherry", "apple dates", "banana"]
    ds = ray.data.from_arrow(pa.table({
        "url": pa.array(urls, pa.string()),
        "text": pa.array(texts, pa.string())}))
    out = host_vocab_jaccard(ds).to_pandas()
    vocab = {}
    for u, txt in zip(urls, texts):
        m = re.match(r"^[a-z][a-z0-9+.-]*://([^/?#]+)(?:/([^/?#]*))?", u)
        dom = f"{m.group(1)}/{m.group(2) or ''}"
        vocab.setdefault(dom, set()).update(_tokens(txt))
    doms = sorted(vocab)
    expected = {}
    for i in range(len(doms)):
        for j in range(i + 1, len(doms)):
            common = vocab[doms[i]] & vocab[doms[j]]
            if common:
                expected[(doms[i], doms[j])] = (
                    len(common),
                    len(common) / len(vocab[doms[i]] | vocab[doms[j]]))
    got = {(r.domain_a, r.domain_b): (r.n_common, r.jaccard)
           for r in out.itertuples()}
    assert set(got) == set(expected)
    for k, (nc, jac) in expected.items():
        assert got[k][0] == nc
        assert got[k][1] == pytest.approx(jac)
    # sizes are the distinct-vocabulary cardinalities
    sizes = {r.domain_a: r.n_a for r in out.itertuples()}
    for d, n in sizes.items():
        assert n == len(vocab[d])


@pytest.mark.usefixtures("ray_session")
def test_char_entropy_reference():
    from kgforge.functions.textstats import char_entropy_batch
    texts = ["aab", "xxxx", "", None, "ab\ncé"]
    t = pa.table({"doc_id": pa.array(range(5), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    out = char_entropy_batch(t).to_pandas().set_index("doc_id")
    assert sorted(out.index) == [0, 1, 4]  # empty/null dropped
    # uniform single char -> entropy exactly 0
    assert out.loc[1, "entropy"] == 0.0 and out.loc[1, "h_e9n"] == 0
    # "aab": H = ln(3) - (2*ln2 + 1*ln1)/3, via quantized ints
    import math
    q = lambda x: math.floor(math.log(x) * 1e9 + 0.5)
    h = 3 * q(3) - (2 * q(2) + 1 * q(1))
    assert out.loc[0, "h_e9n"] == h
    assert out.loc[0, "entropy"] == h / (3.0 * 1e9)
    assert out.loc[4, "n_chars"] == 5 and out.loc[4, "n_distinct_chars"] == 5


@pytest.mark.usefixtures("ray_session")
def test_entity_pmi_reference():
    from kgforge.stages.graph import entity_pmi
    # pages: 1:{A,B} 2:{A,B} 3:{A,C} 4:{B}  (uint64 page ids)
    pages = [1, 1, 2, 2, 3, 3, 4]
    keys = ["A", "B", "A", "B", "A", "C", "B"]
    ds = ray.data.from_arrow(pa.table({
        "url_hash": pa.array(pages, pa.uint64()),
        "node_key": pa.array(keys, pa.string())}))
    out = entity_pmi(ds, "url_hash", "node_key").to_pandas()
    got = {(r.src_key, r.dst_key): r for r in out.itertuples()}
    assert set(got) == {("A", "B"), ("A", "C")}
    ab = got[("A", "B")]
    assert ab.n_pages == 2 and ab.n_src == 3 and ab.n_dst == 3
    assert ab.pmi_ratio == (2 * 4) / (3 * 3)
    ac = got[("A", "C")]
    assert ac.n_pages == 1 and ac.pmi_ratio == (1 * 4) / (3 * 1)


@pytest.mark.usefixtures("ray_session")
def test_bigram_surprisal_reference():
    import hashlib
    from kgforge.stages.retrieval import bigram_surprisal
    texts = ["a b c a b", "b c", "x", None]
    t = pa.table({"doc_id": pa.array(range(4), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    ds = ray.data.from_arrow(t)
    out = bigram_surprisal(ds).to_pandas().set_index("doc_id")

    def bucket(tok):
        return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % 256

    from collections import Counter
    cells = Counter()
    doc_cells = {}
    for i, txt in enumerate(texts):
        toks = (txt or "").split()
        cs = [bucket(a) * 256 + bucket(b)
              for a, b in zip(toks, toks[1:])]
        doc_cells[i] = cs
        cells.update(cs)
    ctx = Counter()
    for c, n in cells.items():
        ctx[c // 256] += n
    q = lambda x: math.floor(x * 1e9 + 0.5)
    for i in range(4):
        toks = (texts[i] or "").split()
        assert out.loc[i, "n_bigrams"] == max(len(toks) - 1, 0)
        exp = sum(q(math.log(float(ctx[c // 256] + 256))
                    - math.log(float(cells[c] + 1)))
                  for c in doc_cells[i])
        assert out.loc[i, "bigram_surprisal_e9"] == exp
    # repeated fluent bigrams score lower per transition than novel ones
    assert out.loc[0, "bigram_surprisal_e9"] > 0


@pytest.mark.usefixtures("ray_session")
def test_lang_quality_buckets_tercile_sizes():
    from kgforge.pipelines.queries import lang_quality_buckets_docs
    out = lang_quality_buckets_docs("/root/testdata/sf0.001").to_pandas()
    # every (lang) group splits 3-way with sizes differing by <= 1
    for lang, g in out.groupby("lang"):
        sizes = g["tile"].value_counts()
        assert set(sizes.index) <= {1, 2, 3}
        assert sizes.max() - sizes.min() <= 1


@pytest.mark.usefixtures("ray_session")
def test_grouped_order_rounds_reference():
    from kgforge.stages.relational import grouped_order_rounds
    # 7 rows for key A at rate 3 -> rounds 0,0,0,1,1,1,2
    ids = list(range(7)) + [100]
    keys = ["A"] * 7 + ["B"]
    ords = [f"{i:03d}" for i in range(7)] + ["000"]
    ds = ray.data.from_arrow(pa.table({
        "id": pa.array(ids, pa.int64()),
        "k": pa.array(keys, pa.string()),
        "o": pa.array(ords, pa.string())}))
    out = grouped_order_rounds(ds, "k", "o", rate=3).to_pandas()
    out = out.sort_values("id").reset_index(drop=True)
    assert out[out["k"] == "A"]["round"].tolist() == [0, 0, 0, 1, 1, 1, 2]
    assert out[out["k"] == "B"]["round"].tolist() == [0]
    # payload stays int64 (no pandas round-trip corruption)
    assert out["id"].dtype == np.int64


@pytest.mark.usefixtures("ray_session")
def test_grouped_order_rounds_big_uint64_payload_survives():
    from kgforge.stages.relational import grouped_order_rounds
    big = [2**63 + 5, 2**63 + 7]
    ds = ray.data.from_arrow(pa.table({
        "id": pa.array(big, pa.uint64()),
        "k": pa.array(["x", "x"], pa.string()),
        "o": pa.array(["a", "b"], pa.string())}))
    out = grouped_order_rounds(ds, "k", "o", rate=1)
    tbl = pa.concat_tables(ray.get(out.to_arrow_refs()))
    assert sorted(tbl.column("id").to_pylist()) == sorted(big)
    assert tbl.column("round").to_pylist() in ([0, 1], [1, 0])


@pytest.mark.usefixtures("ray_session")
def test_perceptual_dhash_reference():
    import hashlib
    from kgforge.stages.multimodal import (PerceptualDHash,
                                           formulaic_image_bytes)
    t = pa.table({"item_id": pa.array([0, 1, 37], pa.int64()),
                  "content": pa.array(
                      [formulaic_image_bytes(0),
                       formulaic_image_bytes(1),
                       formulaic_image_bytes(0)], pa.binary())})
    out = PerceptualDHash()(t).to_pandas().set_index("item_id")
    # same seed -> identical hash; different seed -> different
    assert out.loc[0, "dhash"] == out.loc[37, "dhash"]
    assert out.loc[0, "dhash"] != out.loc[1, "dhash"]
    assert len(out.loc[0, "dhash"]) == 16
    # plain-python reference for seed 0
    px = []
    for b in range(5):
        px.extend(hashlib.md5(f"0:{b}".encode()).digest())
    px = px[:72]
    hex_ref = ""
    for r in range(8):
        byte = 0
        for c in range(8):
            if px[r * 9 + c] > px[r * 9 + c + 1]:
                byte |= 1 << (7 - c)
        hex_ref += f"{byte:02x}"
    assert out.loc[0, "dhash"] == hex_ref


@pytest.mark.usefixtures("ray_session")
def test_image_dedup_groups_by_seed():
    from kgforge.pipelines.queries import multimodal_image_dedup
    out = multimodal_image_dedup("/root/testdata/sf0.001").to_pandas()
    # n = max(32, n_docs//4) items, seeds item_id % 37
    n = len(out)
    assert n >= 32
    full, rem = n // 37, n % 37
    for r in out.itertuples():
        assert r.canonical_id == r.item_id % 37
        assert r.n_copies == full + (1 if r.item_id % 37 < rem else 0)


@pytest.mark.usefixtures("ray_session")
def test_hourly_chi2_uniform_and_spike():
    from kgforge.stages.relational import grouped_hourly_chi2
    hr = 3_600_000_000
    # "flat": one event in every hour -> chi2 = 0
    ts_flat = [h * hr + 5 for h in range(24)]
    # "spike": all 24 events in hour 0 -> chi2 = 23*n = 552
    ts_spike = [0 + i for i in range(24)]
    ds = ray.data.from_arrow(pa.table({
        "event_type": pa.array(["flat"] * 24 + ["spike"] * 24),
        "ts": pa.array(ts_flat + ts_spike, pa.timestamp("us"))}))
    out = grouped_hourly_chi2(ds, "event_type", "ts").to_pandas()
    out = out.set_index("event_type")
    assert out.loc["flat", "chi2"] == 0.0
    # spike: num = (24*24-24)^2 + 23*(0-24)^2 = 552^2 + 23*576
    n = 24
    num = (24 * 24 - n) ** 2 + 23 * n ** 2
    assert out.loc["spike", "chi2"] == num / (24.0 * n)


@pytest.mark.usefixtures("ray_session")
def test_gini_extremes():
    from kgforge.stages.relational import grouped_gini
    # equal values -> gini 0; one-takes-all -> (n-1)/n
    vals = [5.0] * 4 + [0.0, 0.0, 0.0, 8.0]
    types = ["eq"] * 4 + ["all"] * 4
    ds = ray.data.from_arrow(pa.table({
        "event_type": pa.array(types, pa.string()),
        "value": pa.array(vals, pa.float64()),
        "event_id": pa.array(range(8), pa.int64())}))
    out = grouped_gini(ds, "event_type", "value",
                       "event_id").to_pandas().set_index("event_type")
    assert out.loc["eq", "gini"] == 0.0
    assert out.loc["all", "gini"] == 3.0 / 4.0


@pytest.mark.usefixtures("ray_session")
def test_daily_autocorr_alternating_series():
    from kgforge.stages.relational import grouped_daily_autocorr
    day = 86_400_000_000
    # 10,0,10,0,10,0 daily counts -> strong negative lag-1 autocorr
    ts = []
    for d in range(6):
        n = 10 if d % 2 == 0 else 0
        ts += [d * day + i for i in range(n)]
    ds = ray.data.from_arrow(pa.table({
        "event_type": pa.array(["alt"] * len(ts), pa.string()),
        "ts": pa.array(ts, pa.timestamp("us"))}))
    out = grouped_daily_autocorr(ds, "event_type", "ts").to_pandas()
    # series has a zero-count day 5? d runs 0..5 with counts
    # [10,0,10,0,10,0] but day 5 has no events -> span is 0..4
    # (max day with events = 4), series [10,0,10,0,10], pairs = 4
    assert out["n_pairs"][0] == 4
    assert out["autocorr"][0] == pytest.approx(-1.0)


@pytest.mark.usefixtures("ray_session")
def test_zipf_slope_exact_power_law():
    from kgforge.stages.retrieval import token_zipf_slope
    # craft corpus where token t_i appears 2^(8-i) times, i=1..4:
    # counts 128,64,32,16 -> ln n = ln 256 - i*ln 2: slope vs ln(rank)
    toks = []
    for i, c in enumerate([128, 64, 32, 16]):
        toks += [f"t{i}"] * c
    ds = ray.data.from_arrow(pa.table({
        "text": pa.array([" ".join(toks)], pa.string())}))
    out = token_zipf_slope(ds, k=4).to_pandas()
    assert out["k"][0] == 4
    # reference slope from the same quantized ints
    q = lambda x: math.floor(math.log(x) * 1e9 + 0.5)
    xs = [q(i) for i in [1.0, 2.0, 3.0, 4.0]]
    ys = [q(c) for c in [128.0, 64.0, 32.0, 16.0]]
    k = 4
    num = k * sum(a * b for a, b in zip(xs, ys)) - sum(xs) * sum(ys)
    den = k * sum(a * a for a in xs) - sum(xs) ** 2
    assert out["slope"][0] == float(num) / float(den)


@pytest.mark.usefixtures("ray_session")
def test_log_moments_constant_and_known():
    from kgforge.stages.relational import grouped_log_moments
    ds = ray.data.from_arrow(pa.table({
        "lang": pa.array(["en"] * 3 + ["de"] * 2, pa.string()),
        "n_chars": pa.array([100, 100, 100, 10, 1000], pa.int64())}))
    out = grouped_log_moments(ds, "lang", "n_chars").to_pandas()
    out = out.set_index("lang")
    # constant values -> zero variance
    assert out.loc["en", "var_log_e18"] == 0.0
    q = lambda x: math.floor(math.log(x) * 1e9 + 0.5)
    assert out.loc["en", "mean_log_e9"] == float(q(100))
    s = q(10) + q(1000)
    sq = q(10) ** 2 + q(1000) ** 2
    assert out.loc["de", "mean_log_e9"] == s / 2.0
    assert out.loc["de", "var_log_e18"] == float(2 * sq - s * s) / 4.0


def _brute_ktruss(edges, k):
    es = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    while True:
        adj = {}
        for a, b in es:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        sup = {e: len(adj[e[0]] & adj[e[1]]) for e in es}
        keep = {e for e, s in sup.items() if s >= k - 2}
        if keep == es:
            return {e: sup[e] for e in es}
        es = keep


@pytest.mark.usefixtures("ray_session")
def test_ktruss_reference_and_peel():
    from kgforge.stages.graph import ktruss_edges
    # K4 on 1-4 (every edge support 2) + a pendant triangle 4-5-6
    # (support 1 each) + a dangling edge 6-7: 4-truss = the K4 only
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
             (4, 5), (5, 6), (4, 6), (6, 7)]
    ref = _brute_ktruss(edges, 4)
    ds = ray.data.from_arrow(pa.table({
        "src_id": pa.array([e[0] for e in edges], pa.uint64()),
        "dst_id": pa.array([e[1] for e in edges], pa.uint64())}))
    out = ktruss_edges(ds, k=4).to_pandas()
    got = {(int(r.src_id), int(r.dst_id)): int(r.support)
           for r in out.itertuples()}
    assert got == ref
    assert set(got) == {(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)}
    assert all(s == 2 for s in got.values())


@pytest.mark.usefixtures("ray_session")
def test_ktruss_empty_fixpoint_and_constants():
    from kgforge.pipelines.queries import KTRUSS_SQL_ROUNDS
    from kgforge.stages.graph import KTRUSS_UNROLL, ktruss_edges
    # the oracle's unroll budget must equal the engine's runtime guard
    assert KTRUSS_SQL_ROUNDS == KTRUSS_UNROLL
    # triangle-free graph -> empty k-truss for k >= 3
    ds = ray.data.from_arrow(pa.table({
        "src_id": pa.array([1, 2, 3], pa.uint64()),
        "dst_id": pa.array([2, 3, 4], pa.uint64())}))
    out_ds = ktruss_edges(ds, k=3)
    assert out_ds.count() == 0
    # schema survives on the Arrow path (Ray to_pandas drops it on
    # empty datasets — the documented trap)
    assert out_ds.schema().names == ["src_id", "dst_id", "support"]


@pytest.mark.usefixtures("ray_session")
def test_ktruss_gate_converges_inside_budget():
    """The sf0.001 co-mention graph must converge with round margin
    (the k-core contract: engine rounds <= unroll budget)."""
    from kgforge.pipelines.queries import _comention_edges, kg_ktruss
    from kgforge.stages.graph import _canonical_edges, ktruss_edges
    import kgforge.stages.graph as G
    # run with a tight budget to measure rounds: patch max_rounds down
    # until failure is NOT observed at the real budget
    out = kg_ktruss("/root/testdata/sf0.001").to_pandas()
    assert (out["support"] >= 2).all()
    # peeled result is a subgraph of the co-mention edge set
    edges = _canonical_edges(_comention_edges("/root/testdata/sf0.001"),
                             "src_id", "dst_id").to_pandas()
    full = {(int(a), int(b)) for a, b in zip(edges["a"], edges["b"])}
    got = {(int(r.src_id), int(r.dst_id)) for r in out.itertuples()}
    assert got <= full


@pytest.mark.usefixtures("ray_session")
def test_ktruss_driver_distributed_parity():
    from kgforge.stages.graph import ktruss_edges
    # deterministic random-ish graph: edges from md5-free arithmetic
    srcs, dsts = [], []
    for i in range(200):
        srcs.append((i * 7919) % 43)
        dsts.append((i * 104729 + 13) % 43)
    # plant a K5 on 100-104 so the 4-truss is non-empty
    for x in range(100, 105):
        for y in range(x + 1, 105):
            srcs.append(x); dsts.append(y)
    ds = ray.data.from_arrow(pa.table({
        "src_id": pa.array(srcs, pa.uint64()),
        "dst_id": pa.array(dsts, pa.uint64())}))
    a = (ktruss_edges(ds, k=4, mode="driver").to_pandas()
         .sort_values(["src_id", "dst_id"]).reset_index(drop=True))
    b = (ktruss_edges(ds, k=4, mode="distributed").to_pandas()
         .sort_values(["src_id", "dst_id"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)
    assert len(a) > 0  # the peel must leave something to compare
