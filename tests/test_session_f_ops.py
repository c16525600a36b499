"""Round-5 session-F operators: unigram-LM surprisal, DSIR top-k
selection, per-host language entropy, preferential-attachment link
prediction, fixed-point Katz centrality — plain-python reference
parity + edge cases."""

import hashlib
import math
import re
from collections import Counter, defaultdict

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray

from kgforge.stages.graph import (degree_assortativity, katz_fixed,
                                  link_prediction_preferential,
                                  two_hop_reach)
from kgforge.stages.retrieval import importance_weights, unigram_surprisal

SF = "/root/testdata/sf0.001"

_WS = re.compile(r"[ \t\n\f\r]+")


def _tokens(text) -> list[str]:
    return [t for t in _WS.split(text or "") if t]


def _bucket(tok: str, dim: int = 256) -> int:
    return int(hashlib.md5(tok.encode("utf-8")).hexdigest()[:8], 16) % dim


@pytest.mark.usefixtures("ray_session")
def test_unigram_surprisal_matches_reference():
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    cnt: Counter = Counter()
    per_doc: dict[int, Counter] = {}
    for row in docs.itertuples():
        bs = Counter(_bucket(t) for t in _tokens(row.text))
        per_doc[row.doc_id] = bs
        cnt.update(bs)
    total = sum(cnt.values())
    w = {b: math.floor((math.log(total + 256)
                        - math.log(cnt.get(b, 0) + 1)) * 1e9 + 0.5)
         for b in range(256)}
    got = unigram_surprisal(
        ray.data.read_parquet(f"{SF}/documents.parquet",
                              columns=["doc_id", "text"])).to_pandas()
    assert len(got) == len(docs)
    for row in got.itertuples():
        bs = per_doc[row.doc_id]
        assert row.n_tokens == sum(bs.values())
        assert row.surprisal_e9 == sum(c * w[b] for b, c in bs.items())


@pytest.mark.usefixtures("ray_session")
def test_unigram_surprisal_empty_and_null_text():
    t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "text": pa.array(["alpha beta", "", None],
                                   pa.string())})
    got = (unigram_surprisal(ray.data.from_arrow(t))
           .to_pandas().set_index("doc_id"))
    assert got.loc[2, "n_tokens"] == 0
    assert got.loc[2, "surprisal_e9"] == 0
    assert got.loc[3, "n_tokens"] == 0
    assert got.loc[3, "surprisal_e9"] == 0
    assert got.loc[1, "n_tokens"] == 2
    assert got.loc[1, "surprisal_e9"] > 0  # weights are non-negative


@pytest.mark.usefixtures("ray_session")
def test_dsir_select_is_top_200_of_weights():
    docs = ray.data.read_parquet(f"{SF}/documents.parquet",
                                 columns=["doc_id", "lang", "text"])
    full = (importance_weights(docs, "lang", "en").to_pandas()
            .sort_values(["score_e9", "doc_id"],
                         ascending=[False, True], kind="mergesort")
            .head(200).reset_index(drop=True))
    sel = (importance_weights(docs, "lang", "en")
           .sort(["score_e9", "doc_id"], descending=[True, False])
           .limit(200).to_pandas())
    assert len(sel) == min(200, len(full))
    assert sel["doc_id"].tolist() == full["doc_id"].tolist()
    assert sel["score_e9"].tolist() == full["score_e9"].tolist()


@pytest.mark.usefixtures("ray_session")
def test_host_lang_entropy_multi_host_reference():
    from kgforge.stages.relational import host_lang_entropy
    rows = ([("https://a.test/x", "en")] * 4
            + [("https://a.test/y", "de")] * 4
            + [("https://b.test/", "en")] * 5          # single-lang
            + [("https://c.test/p", "en")] * 3
            + [("https://c.test/q", "fr")] * 2
            + [("https://c.test/r", "de")] * 1)
    t = pa.table({"url": pa.array([u for u, _ in rows], pa.string()),
                  "lang": pa.array([lg for _, lg in rows], pa.string())})
    got = (host_lang_entropy(ray.data.from_arrow(t))
           .to_pandas().set_index("host"))

    def q(x: int) -> int:
        return math.floor(math.log(x) * 1e9 + 0.5)

    by_host: dict[str, Counter] = defaultdict(Counter)
    for u, lg in rows:
        by_host[u.split("/")[2]][lg] += 1
    assert set(got.index) == set(by_host)
    for host, langs in by_host.items():
        n = sum(langs.values())
        h = n * q(n) - sum(c * q(c) for c in langs.values())
        assert got.loc[host, "n_pages"] == n
        assert got.loc[host, "n_langs"] == len(langs)
        assert got.loc[host, "h_e9n"] == h
        assert got.loc[host, "entropy"] == h / (float(n) * 1e9)
    # the single-language host has exactly zero entropy
    assert got.loc["b.test", "h_e9n"] == 0
    # the 4/4 two-language host is ln(2) in nats (to quantization)
    assert abs(got.loc["a.test", "entropy"] - math.log(2)) < 1e-8


def _brute_candidates(edges: list[tuple[int, int]]):
    """Distance-2 non-edge pairs with common-neighbor counts."""
    nbrs: dict[int, set[int]] = defaultdict(set)
    eset = set()
    for a, b in edges:
        if a == b:
            continue
        a, b = min(a, b), max(a, b)
        eset.add((a, b))
        nbrs[a].add(b)
        nbrs[b].add(a)
    cand = {}
    for w, nn in nbrs.items():
        for u in nn:
            for v in nn:
                if u < v and (u, v) not in eset:
                    cand[(u, v)] = cand.get((u, v), 0) + 1
    return nbrs, cand


@pytest.mark.usefixtures("ray_session")
def test_preferential_attachment_matches_brute_force():
    edges = [(1, 2), (1, 3), (2, 3), (3, 4), (4, 5), (5, 6), (2, 6),
             (6, 7), (7, 1), (4, 8)]
    ds = ray.data.from_arrow(pa.table({
        "src_id": pa.array([a for a, _ in edges], pa.uint64()),
        "dst_id": pa.array([b for _, b in edges], pa.uint64())}))
    nbrs, cand = _brute_candidates(edges)
    ref = sorted(
        ((len(nbrs[u]) * len(nbrs[v]), u, v, i)
         for (u, v), i in cand.items()),
        key=lambda r: (-r[0], r[1], r[2]))
    got = link_prediction_preferential(ds, k=len(ref) + 5).to_pandas()
    assert len(got) == len(ref)
    for row, (score, u, v, inter) in zip(got.itertuples(), ref):
        assert (row.src_id, row.dst_id) == (u, v)
        assert row.pa_score == score
        assert row.inter == inter


def _katz_reference(edges, n_iter=5, scale_bits=30):
    nbrs: dict[int, set[int]] = defaultdict(set)
    for a, b in edges:
        if a == b:
            continue
        nbrs[a].add(b)
        nbrs[b].add(a)
    den = 2 * max(len(v) for v in nbrs.values()) + 1
    S = 1 << scale_bits
    x = {u: S for u in nbrs}
    for _ in range(n_iter):
        x = {u: S + sum(x[v] // den for v in nbrs[u]) for u in nbrs}
    return den, x


@pytest.mark.usefixtures("ray_session")
def test_katz_fixed_matches_reference():
    edges = [(1, 2), (2, 3), (3, 4), (4, 5), (1, 5), (2, 5), (5, 6),
             (6, 7), (10, 11)]
    ds = ray.data.from_arrow(pa.table({
        "src_id": pa.array([a for a, _ in edges], pa.uint64()),
        "dst_id": pa.array([b for _, b in edges], pa.uint64())}))
    den, ref = _katz_reference(edges)
    got = katz_fixed(ds, n_iter=5).to_pandas().set_index("node_id")
    assert len(got) == len(ref)
    S = 1 << 30
    for u, xv in ref.items():
        assert got.loc[u, "den"] == den
        assert got.loc[u, "katz_fixed"] == xv
        assert got.loc[u, "katz"] == xv / float(S)
        assert xv < 2 * S  # the documented mass bound


@pytest.mark.usefixtures("ray_session")
def test_degree_assortativity_matches_reference():
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (4, 5), (5, 6), (6, 7),
             (7, 8), (2, 8)]
    ds = ray.data.from_arrow(pa.table({
        "src_id": pa.array([a for a, _ in edges], pa.uint64()),
        "dst_id": pa.array([b for _, b in edges], pa.uint64())}))
    nbrs, _ = _brute_candidates(edges)
    xs = []
    for a, b in edges:
        xs.append((len(nbrs[a]), len(nbrs[b])))
        xs.append((len(nbrs[b]), len(nbrs[a])))
    m = len(xs)
    sx = sum(x for x, _ in xs)
    sxx = sum(x * x for x, _ in xs)
    sxy = sum(x * y for x, y in xs)
    num = float(m * sxy - sx * sx)
    den = (math.sqrt(float(m * sxx - sx * sx))
           * math.sqrt(float(m * sxx - sx * sx)))
    got = degree_assortativity(ds).to_pandas()
    assert len(got) == 1
    assert got.loc[0, "n_nodes"] == len(nbrs)
    assert got.loc[0, "n_edges"] == len(edges)
    assert got.loc[0, "assortativity"] == num / den


@pytest.mark.usefixtures("ray_session")
def test_degree_assortativity_regular_graph_degenerate():
    # a cycle is 2-regular: zero variance -> the 0.0 guard fires
    edges = [(1, 2), (2, 3), (3, 4), (4, 1)]
    ds = ray.data.from_arrow(pa.table({
        "src_id": pa.array([a for a, _ in edges], pa.uint64()),
        "dst_id": pa.array([b for _, b in edges], pa.uint64())}))
    got = degree_assortativity(ds).to_pandas()
    assert got.loc[0, "assortativity"] == 0.0


@pytest.mark.usefixtures("ray_session")
def test_two_hop_reach_matches_brute_force():
    edges = [(1, 2), (1, 3), (2, 3), (3, 4), (4, 5), (5, 6), (2, 6),
             (6, 7), (7, 1), (4, 8), (10, 11)]
    ds = ray.data.from_arrow(pa.table({
        "src_id": pa.array([a for a, _ in edges], pa.uint64()),
        "dst_id": pa.array([b for _, b in edges], pa.uint64())}))
    nbrs, _ = _brute_candidates(edges)
    got = two_hop_reach(ds).to_pandas().set_index("node_id")
    assert len(got) == len(nbrs)
    for v, nn in nbrs.items():
        ball = set(nn)
        for u in nn:
            ball |= nbrs[u]
        ball.discard(v)
        assert got.loc[v, "degree"] == len(nn)
        assert got.loc[v, "reach2"] == len(ball)
        assert got.loc[v, "n_dist2"] == len(ball) - len(nn)


@pytest.mark.usefixtures("ray_session")
def test_katz_path_graph_center_dominates():
    # on a path a-b-c-d-e the center has the largest centrality
    edges = [(1, 2), (2, 3), (3, 4), (4, 5)]
    ds = ray.data.from_arrow(pa.table({
        "src_id": pa.array([a for a, _ in edges], pa.uint64()),
        "dst_id": pa.array([b for _, b in edges], pa.uint64())}))
    got = katz_fixed(ds, n_iter=8).to_pandas().set_index("node_id")
    assert got["katz_fixed"].idxmax() == 3
    assert got.loc[1, "katz_fixed"] == got.loc[5, "katz_fixed"]


@pytest.mark.usefixtures("ray_session")
def test_snapshot_diff_statuses():
    from kgforge.stages.joins import snapshot_diff
    v1 = ray.data.from_arrow(pa.table({
        "url": pa.array([f"https://a.test/{i}" for i in range(4)]
                        + ["https://b.test/x"], pa.string()),
        "th1": pa.array(["h0", "h1", "h2", "h3", "hb"], pa.string())}))
    # url 0 unchanged, url 1 changed, url 2 removed, url 3 unchanged,
    # b.test/x removed, b.test/y + a.test/new added
    v2 = ray.data.from_arrow(pa.table({
        "url": pa.array(["https://a.test/0", "https://a.test/1",
                         "https://a.test/3", "https://a.test/new",
                         "https://b.test/y"], pa.string()),
        "th2": pa.array(["h0", "h1x", "h3", "hn", "hy"], pa.string())}))
    got = snapshot_diff(v1, v2).to_pandas().set_index("host")
    assert got.loc["a.test", "n_unchanged"] == 2
    assert got.loc["a.test", "n_changed"] == 1
    assert got.loc["a.test", "n_removed"] == 1
    assert got.loc["a.test", "n_added"] == 1
    assert got.loc["b.test", "n_removed"] == 1
    assert got.loc["b.test", "n_added"] == 1
    assert got.loc["b.test", "n_changed"] == 0
    assert got.loc["b.test", "n_unchanged"] == 0


@pytest.mark.usefixtures("ray_session")
def test_vocab_coverage_matches_reference():
    from kgforge.stages.retrieval import vocab_coverage
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    cnt: Counter = Counter()
    for row in docs.itertuples():
        cnt.update(_tokens(row.text))
    vocab = set(t for t, _ in sorted(cnt.items(),
                                     key=lambda kv: (-kv[1], kv[0]))[:50])
    got = vocab_coverage(
        ray.data.read_parquet(f"{SF}/documents.parquet",
                              columns=["doc_id", "text"]),
        vocab_size=50).to_pandas().set_index("doc_id")
    assert len(got) == len(docs)
    for row in docs.itertuples():
        toks = _tokens(row.text)
        oov = sum(1 for t in toks if t not in vocab)
        assert got.loc[row.doc_id, "n_tokens"] == len(toks)
        assert got.loc[row.doc_id, "n_oov"] == oov
        expect = (oov / float(len(toks))) if toks else 0.0
        assert got.loc[row.doc_id, "oov_rate"] == expect


@pytest.mark.usefixtures("ray_session")
def test_host_lang_entropy_drops_null_lang():
    from kgforge.stages.relational import host_lang_entropy
    t = pa.table({
        "url": pa.array(["https://a.test/1", "https://a.test/2",
                         "https://a.test/3"], pa.string()),
        "lang": pa.array(["en", None, "en"], pa.string())})
    got = host_lang_entropy(ray.data.from_arrow(t)).to_pandas()
    # the NULL-lang row is dropped (repo-wide null-group convention,
    # mirrored by the oracle's lang IS NOT NULL)
    assert got.loc[0, "n_pages"] == 2
    assert got.loc[0, "n_langs"] == 1
    assert got.loc[0, "h_e9n"] == 0


@pytest.mark.usefixtures("ray_session")
def test_tfidf_top_terms_matches_reference():
    from kgforge.stages.retrieval import tfidf_top_terms
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    n = len(docs)
    dfc: Counter = Counter()
    per_doc: dict[int, Counter] = {}
    for row in docs.itertuples():
        tc = Counter(_tokens(row.text))
        per_doc[row.doc_id] = tc
        dfc.update(tc.keys())
    idf = {t: math.floor((math.log(n + 1) - math.log(d + 1)) * 1e9
                         + 0.5) for t, d in dfc.items()}
    got = tfidf_top_terms(
        ray.data.read_parquet(f"{SF}/documents.parquet",
                              columns=["doc_id", "text"]),
        k=3).to_pandas()
    by_doc = {d: g for d, g in got.groupby("doc_id", sort=False)}
    for row in docs.itertuples():
        tc = per_doc[row.doc_id]
        ref = sorted(((tf * idf[t], t, tf) for t, tf in tc.items()),
                     key=lambda r: (-r[0], r[1]))[:3]
        g = by_doc.get(row.doc_id)
        if not ref:
            assert g is None
            continue
        g = g.sort_values(["score_e9", "term"],
                          ascending=[False, True])
        assert len(g) == len(ref)
        for (score, term, tf), r in zip(ref, g.itertuples()):
            assert (r.term, r.tf, r.score_e9) == (term, tf, score)


@pytest.mark.usefixtures("ray_session")
def test_largest_remainder_allocation_exact():
    from kgforge.stages.relational import largest_remainder_allocation
    t = pa.table({"k": pa.array(["a", "b", "c", "d"], pa.string()),
                  "n": pa.array([1, 1, 1, 4], pa.int64())})
    got = (largest_remainder_allocation(
        ray.data.from_arrow(t), ["k"], "n", budget=10)
        .to_pandas().set_index("k"))
    # base = 10*n//7 -> a,b,c: 1 (rem 3), d: 5 (rem 5); leftover
    # 10-8=2 units go to d (rem 5) then a (rem 3, smallest key)
    assert got["allocated"].sum() == 10
    assert got.loc["d", "allocated"] == 6
    assert got.loc["a", "allocated"] == 2
    assert got.loc["b", "allocated"] == 1
    assert got.loc["c", "allocated"] == 1


def _bfs_reference(edges, n_hops=6):
    nbrs: dict[int, set[int]] = defaultdict(set)
    for a, b in edges:
        if a == b:
            continue
        nbrs[a].add(b)
        nbrs[b].add(a)
    seed = min(nbrs)
    dist = {seed: 0}
    frontier = {seed}
    for h in range(1, n_hops + 1):
        nxt = set()
        for u in frontier:
            for v in nbrs[u]:
                if v not in dist:
                    dist[v] = h
                    nxt.add(v)
        frontier = nxt
    return dist


@pytest.mark.usefixtures("ray_session")
def test_bfs_distances_matches_reference():
    from kgforge.stages.graph import bfs_distances
    edges = [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (6, 7), (7, 8),
             (8, 9), (2, 5), (20, 21)]   # 20-21 unreachable from 1
    ds = ray.data.from_arrow(pa.table({
        "src_id": pa.array([a for a, _ in edges], pa.uint64()),
        "dst_id": pa.array([b for _, b in edges], pa.uint64())}))
    ref = _bfs_reference(edges, n_hops=6)
    got = bfs_distances(ds, n_hops=6).to_pandas().set_index("node_id")
    assert set(got.index) == set(ref)
    for u, d in ref.items():
        assert got.loc[u, "dist"] == d
    assert 20 not in got.index and 21 not in got.index
    # boundary: via the 2-5 shortcut node 9 sits at exactly hop 6
    assert got.loc[9, "dist"] == 6
