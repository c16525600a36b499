"""Dedup / similarity-search / text-analysis / multimodal operator tests
over small synthetic tables with planted duplicates."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray

from kgforge.functions import hashing as H
from kgforge.functions.textstats import (LangIdScorer, fingerprint_batch,
                                         quality_stats_batch,
                                         token_stats_batch)
from kgforge.stages.ann import brute_force_topk, ivf_topk
from kgforge.stages.dedup import (embedding_pairs, exact_dedup,
                                  minhash_lsh_pairs, ngram_jaccard_pairs,
                                  simhash_pairs)
from kgforge.stages.multimodal import (ByteHistogramFeatures, DecodeImage,
                                       fake_image_bytes, frame_sample_stub)

BASE = ("the quick brown fox jumps over the lazy dog and runs far away "
        "into the deep green forest while birds sing loudly overhead")


@pytest.fixture(scope="module")
def docs_ds():
    texts = []
    for i in range(30):
        words = BASE.split()
        words = [f"w{i}_{j}" if j % 3 == 0 else w
                 for j, w in enumerate(words)]
        texts.append(" ".join(words))
    # planted near-dups: 30/31 near-identical, 32 = exact dup of 30
    texts.append(texts[0].replace("overhead", "above"))
    texts.append(texts[0])
    tbl = pa.table({"doc_id": list(range(len(texts))), "text": texts})
    return ray.data.from_arrow(tbl)


def test_exact_dedup(docs_ds):
    out = exact_dedup(docs_ds).to_pandas().sort_values("doc_id")
    assert len(out) == 31                       # 32 docs, one exact dup
    row = out[out["doc_id"] == 0].iloc[0]
    assert row["n_dups"] == 2                   # doc 0 + doc 31 (copy)
    assert 31 not in set(out["doc_id"])


def test_exact_dedup_fast_hash_parity(docs_ds):
    """oracle_mode=False (vectorized siphash64, the production path)
    must keep identical winners and duplicate counts; only the hash
    representation changes (uint64 instead of md5 hex)."""
    md5 = (exact_dedup(docs_ds, keep_text=False).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    fast = (exact_dedup(docs_ds, keep_text=False, oracle_mode=False)
            .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(md5[["doc_id", "n_dups"]],
                                  fast[["doc_id", "n_dups"]],
                                  check_exact=True)
    assert fast["text_hash"].dtype == np.uint64


def test_minhash_lsh_pairs(docs_ds):
    pairs = minhash_lsh_pairs(docs_ds, threshold=0.5).to_pandas()
    got = {(a, b) for a, b in zip(pairs["id_a"], pairs["id_b"])}
    assert (0, 31) in got                       # exact dup found
    assert (0, 30) in got                       # near dup found
    assert all(p[0] < p[1] for p in got)
    # distinct docs don't pair
    assert (1, 2) not in got


def test_simhash_pairs():
    # simhash needs long docs for small edits to stay within Hamming<=3
    # (the 4x16-bit band blocking guarantees recall only up to 3)
    texts = []
    for i in range(10):
        texts.append(" ".join(f"doc{i}tok{j}" for j in range(300)))
    near = texts[0].split()
    near[150] = "CHANGED"
    texts.append(" ".join(near))        # id 10: hamming 1-2 from id 0
    texts.append(texts[0])              # id 11: hamming 0 from id 0
    ds = ray.data.from_arrow(pa.table(
        {"doc_id": list(range(len(texts))), "text": texts}))
    pairs = simhash_pairs(ds, max_hamming=3).to_pandas()
    got = {(a, b): h for a, b, h in
           zip(pairs["id_a"], pairs["id_b"], pairs["hamming"])}
    assert got.get((0, 11)) == 0                # identical text
    assert (0, 10) in got and got[(0, 10)] <= 3
    assert (1, 2) not in got


def test_ngram_jaccard_pairs(docs_ds):
    pairs = ngram_jaccard_pairs(docs_ds, threshold=0.5).to_pandas()
    got = {(a, b): j for a, b, j in
           zip(pairs["id_a"], pairs["id_b"], pairs["jaccard"])}
    assert got.get((0, 31)) == 1.0
    assert 0.5 <= got.get((0, 30), 0) < 1.0


def test_ngram_jaccard_stop_shingle_guard_bounds_pairs():
    """Stress pin for the default-on max_shingle_df guard (the
    head-key-skew discipline of test_head_key_skew_bounded_by_combiner
    applied to the shingle index): ONE shingle present in EVERY doc
    must not emit O(n^2) candidate pairs when the cutoff trips, and the
    sub-cutoff pairs (the planted near-dup) must be unaffected."""
    stop = "common shared trigram"          # the universal stop-shingle
    texts = [f"{stop} unique{i}a unique{i}b unique{i}c unique{i}d"
             for i in range(40)]
    texts.append(texts[0] + " extraw")      # id 40: near-dup of id 0
    ds = ray.data.from_arrow(pa.table(
        {"doc_id": list(range(len(texts))), "text": texts}))
    guarded = ngram_jaccard_pairs(ds, threshold=0.5,
                                  max_shingle_df=8).to_pandas()
    got = {(a, b) for a, b in zip(guarded["id_a"], guarded["id_b"])}
    # the universal shingle (df=41 > 8) is skipped: unrelated docs that
    # ONLY share it never become candidates — pair count stays bounded
    # by the sub-cutoff postings, not n^2/2 = 820
    assert (0, 40) in got                   # near-dup still found
    assert len(got) <= 5
    # explicit opt-out (None) restores the exact unbounded semantics:
    # every doc pair shares the stop-shingle, so candidates explode —
    # but J >= 0.5 still only holds for the planted pair
    exact = ngram_jaccard_pairs(ds, threshold=0.5,
                                max_shingle_df=None).to_pandas()
    egot = {(a, b) for a, b in zip(exact["id_a"], exact["id_b"])}
    assert (0, 40) in egot
    # sub-threshold exact jaccards match on the surviving pair
    j_g = guarded.set_index(["id_a", "id_b"]).loc[(0, 40), "jaccard"]
    j_e = exact.set_index(["id_a", "id_b"]).loc[(0, 40), "jaccard"]
    # the guard undercounts I by the skipped shingles a pair shares, so
    # guarded J <= exact J; for this corpus both stay >= threshold
    assert j_g <= j_e and j_g >= 0.5


def test_jaccard_exact():
    a = H.shingle_hashes("a b c d e", 3)
    assert H.jaccard(a, a) == 1.0
    b = H.shingle_hashes("x y z w v", 3)
    assert H.jaccard(a, b) == 0.0


@pytest.fixture(scope="module")
def emb_ds():
    rng = np.random.default_rng(0)
    mat = rng.standard_normal((40, 16))
    mat[20] = mat[10] + 0.001 * rng.standard_normal(16)   # planted near-dup
    tbl = pa.table({"vec_id": list(range(40)),
                    "embedding": [r.tolist() for r in mat]})
    return ray.data.from_arrow(tbl), mat


def test_embedding_pairs(emb_ds):
    ds, mat = emb_ds
    pairs = embedding_pairs(ds, threshold=0.99).to_pandas()
    got = {(a, b) for a, b in zip(pairs["id_a"], pairs["id_b"])}
    assert (10, 20) in got


def test_embedding_pairs_exact_vs_numpy(emb_ds):
    from kgforge.stages.dedup import embedding_pairs_exact
    ds, mat = emb_ds
    out = embedding_pairs_exact(ds, threshold=0.9).to_pandas()
    unit = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = unit @ unit.T
    ia, ib = np.triu_indices(len(mat), k=1)
    want = {(int(a), int(b)) for a, b in zip(ia, ib)
            if sims[a, b] >= 0.9}
    got = {(a, b) for a, b in zip(out["id_a"], out["id_b"])}
    assert got == want


def test_embedding_lsh_recall_vs_exact(emb_ds):
    """The LSH scale path must find every exact pair on this fixture
    (8 planes + 1-bit multiprobe at cosine 0.99 — near-parallel vectors
    share a code or a 1-bit neighbor) and must never report a pair below
    threshold (exact verification)."""
    from kgforge.stages.dedup import embedding_pairs_exact
    ds, mat = emb_ds
    exact = embedding_pairs_exact(ds, threshold=0.99).to_pandas()
    lsh = embedding_pairs(ds, threshold=0.99).to_pandas()
    e = {(a, b) for a, b in zip(exact["id_a"], exact["id_b"])}
    l = {(a, b) for a, b in zip(lsh["id_a"], lsh["id_b"])}
    assert l <= e          # precision 1.0 (exact verification)
    assert len(l) >= len(e)  # recall 1.0 on the planted fixture


def test_brute_force_topk(emb_ds):
    ds, mat = emb_ds
    queries = mat[:2]
    out = brute_force_topk(ds, queries, k=5).to_pandas()
    assert len(out) == 10
    top_q0 = out[out["query_id"] == 0].sort_values(
        ["score", "vec_id"], ascending=[False, True])
    assert top_q0.iloc[0]["vec_id"] == 0        # self-match first
    assert top_q0.iloc[0]["score"] == pytest.approx(1.0)
    # oracle: exact numpy result
    unit = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = unit @ unit[0]
    expect = set(np.argsort(-sims)[:5].tolist())
    assert set(top_q0["vec_id"]) == expect


def test_ivf_topk_recall(emb_ds):
    ds, mat = emb_ds
    queries = mat[:4]
    exact = brute_force_topk(ds, queries, k=3).to_pandas()
    approx = ivf_topk(ds, queries, k=3, n_centroids=4, nprobe=3).to_pandas()
    # with nprobe ~ n_centroids, recall should be high; self-match always found
    for q in range(4):
        a = set(approx[approx["query_id"] == q]["vec_id"])
        assert q in a
        e = set(exact[exact["query_id"] == q]["vec_id"])
        assert len(a & e) >= 2


def test_token_and_quality_stats():
    tbl = pa.table({"doc_id": [1, 2], "text": ["Hello, world! Two", ""]})
    out = token_stats_batch(tbl)
    assert out.column("n_tokens").to_pylist() == [3, 0]
    assert out.column("n_tokens_bpe").to_pylist() == [5, 0]
    q = quality_stats_batch(tbl)
    assert q.column("n_punct").to_pylist() == [2, 0]
    assert q.column("n_upper").to_pylist() == [2, 0]


def test_langid_and_fingerprint():
    tbl = pa.table({"text": ["the cat and the dog is in a house for it",
                             "der Hund ist ein Tier und die Katze",
                             "le chat est un animal et les chiens"]})
    out = LangIdScorer()(tbl)
    assert out.column("lang_pred").to_pylist() == ["en", "de", "fr"]
    fp = fingerprint_batch(pa.table({"text": ["a b c", "a b c", "a b d"]}))
    vals = fp.column("fingerprint").to_pylist()
    assert vals[0] == vals[1] != vals[2]


def test_multimodal_decode_and_features():
    imgs = [fake_image_bytes(8, 6, seed=i) for i in range(3)]
    tbl = pa.table({"item_id": [0, 1, 2], "content": imgs})
    dec = DecodeImage()(tbl)
    assert dec.column("width").to_pylist() == [8, 8, 8]
    assert dec.column("height").to_pylist() == [6, 6, 6]
    assert all(dec.column("decode_ok").to_pylist())
    feats = ByteHistogramFeatures(n_bins=8)(tbl)
    v = feats.column("features").to_pylist()[0]
    assert len(v) == 8 and abs(sum(v) - 1.0) < 0.35  # header skews slightly
    frames = frame_sample_stub(tbl, every_n=10)
    assert frames.column("frame_idx").to_pylist()[:3] == [0, 10, 20]
    import pytest as _pt
    with _pt.raises(NotImplementedError):
        DecodeImage()(pa.table({"content": [b"\x89PNG fake"]}))


def test_multimodal_actor_pool_stage():
    """The plumbing as it runs in a pipeline: actor pool + small batches."""
    imgs = [fake_image_bytes(4, 4, seed=i) for i in range(20)]
    ds = ray.data.from_arrow(pa.table(
        {"item_id": list(range(20)), "content": imgs}))
    out = ds.map_batches(DecodeImage, batch_format="pyarrow", batch_size=8,
                         concurrency=2)
    df = out.to_pandas()
    assert len(df) == 20 and df["decode_ok"].all()


def test_shuffle_fallback_preserves_big_ids():
    """The >max_driver_pairs distributed co-location path must not
    corrupt 64-bit ids (null id slots once promoted the column to
    float64, rounding ids above 2^53)."""
    import functools

    from kgforge.stages import dedup as D
    big = 2**60 + 1          # not representable in float64
    tbl = pa.table({"doc_id": pa.array([big, big + 2, 7], pa.int64()),
                    "text": ["same words here"] * 2 + ["different"]})
    ds = ray.data.from_arrow(tbl)
    orig = D._join_pair_payloads
    D._join_pair_payloads = functools.partial(orig, max_driver_pairs=0)
    try:
        # broadcast_sig_limit=0 forces the candidate-first scale path
        # (the broadcast fast path would bypass _join_pair_payloads)
        pairs = D.minhash_lsh_pairs(ds, threshold=0.5,
                                    broadcast_sig_limit=0).to_pandas()
    finally:
        D._join_pair_payloads = orig
    assert set(zip(pairs["id_a"], pairs["id_b"])) == {(big, big + 2)}


def test_minhash_paths_agree(docs_ds):
    """The size-gated broadcast fast path and the candidate-first scale
    path must produce the identical verified pair set + estimates."""
    fast = minhash_lsh_pairs(docs_ds, threshold=0.5).to_pandas()
    slow = minhash_lsh_pairs(docs_ds, threshold=0.5,
                             broadcast_sig_limit=0).to_pandas()
    key = ["id_a", "id_b"]
    fast = fast.sort_values(key).reset_index(drop=True)
    slow = slow.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(fast[key + ["est_jaccard"]],
                                  slow[key + ["est_jaccard"]])


def test_as_of_join_date32_right_side():
    """A DATE right timestamp must normalize to microseconds, not day
    counts (day counts would make every right row 'before' every
    event)."""
    import datetime

    from kgforge.stages.relational import as_of_join
    left = ray.data.from_arrow(pa.table({
        "lid": pa.array([1, 2], pa.int64()),
        "k": pa.array([5, 5], pa.int64()),
        "ts": pa.array([datetime.datetime(2024, 1, 10),
                        datetime.datetime(2024, 3, 10)],
                       pa.timestamp("us"))}))
    right = ray.data.from_arrow(pa.table({
        "k": pa.array([5, 5], pa.int64()),
        "d": pa.array([datetime.date(2024, 1, 5),
                       datetime.date(2024, 2, 5)], pa.date32()),
        "v": pa.array([100.0, 200.0], pa.float64())}))
    out = (as_of_join(left, right, key="k", left_ts="ts", right_ts="d",
                      right_vals=["v"]).to_pandas()
           .set_index("lid")["v_asof"])
    assert out[1] == 100.0     # only the Jan 5 order is at-or-before
    assert out[2] == 200.0


def test_quantile_sketch_envelope():
    """Sketch quantiles stay within the documented rank-error envelope
    of the exact answer, for any merge split."""
    from kgforge.stages.sketches import QuantileSketch
    rng = np.random.default_rng(5)
    data = rng.exponential(10.0, size=20_000)
    exact_sorted = np.sort(data)

    def rank_of(v: float) -> float:
        return np.searchsorted(exact_sorted, v, side="right") / len(data)

    # two different merge shapes must agree within envelope
    k = 512
    whole = QuantileSketch(k).add_batch(data)
    parts = QuantileSketch(k)
    for chunk in np.array_split(data, 37):
        parts.merge(QuantileSketch(k).add_batch(chunk))
    for q in (0.1, 0.25, 0.5, 0.9, 0.99):
        for sk in (whole, parts):
            got = sk.query(q)
            assert abs(rank_of(got) - q) < 0.05, (q, got, rank_of(got))
    # serialization round-trip
    rt = QuantileSketch.from_bytes(parts.to_bytes(), k)
    assert rt.query(0.5) == parts.query(0.5)


def test_sketch_vs_exact_quantiles_on_testdata():
    """The sketch query tracks the exact distributed quantiles on the
    driver testdata within the rank-error envelope."""
    from kgforge.pipelines import queries as Q
    sf = "/root/testdata/sf0.001"
    exact = Q.events_value_quantiles(sf).to_pandas().set_index("q")["value"]
    approx = (Q.events_value_quantiles_sketch(sf).to_pandas()
              .set_index("q")["value"])
    import pyarrow.parquet as pq
    vals = np.sort(pq.read_table(f"{sf}/events.parquet",
                                 columns=["value"])
                   .column("value").to_numpy(zero_copy_only=False))
    for q in exact.index:
        rank_err = abs(np.searchsorted(vals, approx[q], side="right")
                       / len(vals) - q)
        assert rank_err < 0.05, (q, exact[q], approx[q], rank_err)


def test_histogram_quantiles_partitioning_invariant():
    """The deterministic histogram-CDF sketch must be bit-identical
    under ANY partitioning (order-free SUM/MAX partials) — the property
    that makes it SQL-oracle-able exactly, unlike the compaction-based
    QuantileSketch — and stay within the bin-population rank envelope
    of the exact answer."""
    from kgforge.stages.sketches import histogram_quantiles
    rng = np.random.default_rng(7)
    vals = np.round(rng.exponential(10.0, size=8_000), 2)
    qs = [(1, 4), (1, 2), (9, 10), (99, 100)]
    outs = []
    for blocks in (1, 7, 64):
        ds = ray.data.from_arrow(pa.table(
            {"value": pa.array(vals, pa.float64())})) \
            .repartition(blocks)
        outs.append(histogram_quantiles(ds, "value", qs).to_pandas())
    pd.testing.assert_frame_equal(outs[0], outs[1], check_exact=True)
    pd.testing.assert_frame_equal(outs[0], outs[2], check_exact=True)
    srt = np.sort(vals)
    for q, v in zip(outs[0]["q"], outs[0]["value"]):
        rank_err = abs(np.searchsorted(srt, v, side="right")
                       / len(srt) - q)
        assert rank_err < 0.02, (q, v, rank_err)


def test_sample_frames_fkvd_exact():
    """SampleFrames decodes FKVD payloads and emits one row per
    sampled frame with integer-exact features matching a direct
    recompute of the formulaic pixels."""
    from kgforge.stages.multimodal import SampleFrames, fake_video_bytes
    items = pa.table({
        "item_id": pa.array([3, 10], pa.int64()),
        "content": pa.array([fake_video_bytes(3), fake_video_bytes(10)],
                            pa.binary())})
    out = (ray.data.from_arrow(items)
           .map_batches(SampleFrames, batch_format="pyarrow",
                        batch_size=8, concurrency=(1, 2),
                        fn_constructor_kwargs={"every_n": 5})
           .to_pandas().sort_values(["item_id", "frame_idx"])
           .reset_index(drop=True))
    for item in (3, 10):
        n_frames = 24 + item % 7
        sub = out[out["item_id"] == item]
        assert sub["frame_idx"].tolist() == list(range(0, n_frames, 5))
        for _, row in sub.iterrows():
            i = np.arange(192, dtype=np.int64)
            px = (item * 13 + row["frame_idx"] * 17 + i * 5) % 256
            assert row["n_pixels"] == 192
            assert row["frame_sum"] == px.sum()
            assert row["frame_max"] == px.max()
    # real codecs absent: non-FKVD payloads fail loudly
    bad = pa.table({"item_id": pa.array([1], pa.int64()),
                    "content": pa.array([b"\x00\x01\x02\x03rest"],
                                        pa.binary())})
    with pytest.raises(Exception):
        (ray.data.from_arrow(bad)
         .map_batches(SampleFrames, batch_format="pyarrow",
                      concurrency=(1, 1)).to_pandas())


def test_frame_sample_stub():
    """Video frame-sampling plumbing: one row per sampled frame index,
    deterministic layout, runs as a Ray Data stage."""
    from kgforge.stages.multimodal import frame_sample_stub
    items = pa.table({"item_id": [7, 8]})
    out = (ray.data.from_arrow(items)
           .map_batches(frame_sample_stub, batch_format="pyarrow")
           .to_pandas())
    assert list(out.columns) == ["item_id", "frame_idx"]
    assert sorted(set(out["item_id"])) == [7, 8]
    per_item = out[out["item_id"] == 7]["frame_idx"].tolist()
    assert per_item == [0, 10, 20]


def test_sketches_distinct():
    import pyarrow as pa

    from kgforge.stages.sketches import (distinct_count_exact, hll_distinct,
                                         hll_estimate, hll_partial)
    import numpy as np
    vals = [i % 137 for i in range(5000)]
    ds = ray.data.from_arrow(pa.table({"k": vals}))
    assert distinct_count_exact(ds, "k") == 137
    est = hll_distinct(ds, "k")
    assert abs(est - 137) / 137 < 0.15
    # mergeability: union of partials == partial of union
    a = hll_partial(list(range(0, 3000)))
    b = hll_partial(list(range(2000, 6000)))
    merged = np.maximum(a, b)
    whole = hll_partial(list(range(0, 6000)))
    assert np.array_equal(merged, whole)
    assert abs(hll_estimate(whole) - 6000) / 6000 < 0.1


def test_minhash_matches_exact_pairs():
    """Premise of the dedup_minhash_docs SQL oracle: at threshold 0.5 on
    the driver testdata the estimator-selected pair set equals the
    exact-Jaccard pair set (planted dups sit far from the threshold;
    fixed-seed signatures are deterministic).  Checked at BOTH gate
    scales the driver/mirror use."""
    from kgforge.pipelines import queries as Q
    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        mh = Q.dedup_minhash_docs(sf).to_pandas()
        ng = (ngram_jaccard_pairs(
            ray.data.read_parquet(f"{sf}/documents.parquet",
                                  columns=["doc_id", "text"]),
            threshold=0.5).to_pandas())
        assert (set(zip(mh["id_a"], mh["id_b"]))
                == set(zip(ng["id_a"], ng["id_b"]))), sf


def test_ivf_trained_multiassign_recall():
    """The recommended approximate config (k-means-trained centroids +
    n_assign=2 multiple assignment) must hold recall >= 0.9 at
    nprobe=4 of 8 on the driver embeddings."""
    from kgforge.pipelines import queries as Q
    sf = "/root/testdata/sf0.01"
    emb = ray.data.read_parquet(f"{sf}/embeddings.parquet",
                                columns=["vec_id", "embedding"])
    qm = Q._query_matrix(sf)
    exact = brute_force_topk(emb, qm, k=10).to_pandas()
    approx = ivf_topk(emb, qm, k=10, n_centroids=8, nprobe=4,
                      n_assign=2).to_pandas()
    hits = tot = 0
    for qid in exact["query_id"].unique():
        e = set(exact[exact["query_id"] == qid]["vec_id"])
        a = set(approx[approx["query_id"] == qid]["vec_id"])
        hits += len(e & a)
        tot += len(e)
    assert hits / tot >= 0.9


def test_embedding_paths_agree():
    """The broadcast-verify fast path and the candidate-first scale path
    of embedding_pairs must produce identical pairs + cosines."""
    from kgforge.pipelines import queries as Q
    sf = "/root/testdata/sf0.01"
    emb = Q._augmented_embeddings(sf)
    fast = embedding_pairs(emb, threshold=0.95).to_pandas()
    slow = embedding_pairs(Q._augmented_embeddings(sf), threshold=0.95,
                           broadcast_vec_limit=0).to_pandas()
    key = ["id_a", "id_b"]
    fast = fast.sort_values(key).reset_index(drop=True)
    slow = slow.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(fast[key + ["cosine"]],
                                  slow[key + ["cosine"]])


def test_audio_decode_matches_formula():
    from kgforge.stages.multimodal import DecodeAudio, fake_audio_bytes
    import numpy as np
    import struct
    tbl = pa.table({"content": pa.array(
        [fake_audio_bytes(i) for i in (0, 3, 6)], pa.binary())})
    out = DecodeAudio()(tbl).to_pydict()
    for row, item in enumerate((0, 3, 6)):
        n = 1000 + (item % 7) * 100
        i = np.arange(n, dtype=np.int64)
        s = (item * 31 + i * 7) % 65536 - 32768
        assert out["n_samples"][row] == n
        assert out["energy"][row] == int((s * s).sum())
        assert out["peak"][row] == int(np.abs(s).max())
        assert out["decode_ok"][row] is True
    with pytest.raises(NotImplementedError):
        DecodeAudio()(pa.table({"content": [b"RIFF fake wav"]}))


def test_resize_image_nearest_neighbor():
    from kgforge.stages.multimodal import MAGIC, ResizeImage
    import struct
    # handmade 4x2 image: rows [0 1 2 3] / [10 11 12 13]
    px = bytes([0, 1, 2, 3, 10, 11, 12, 13])
    raw = MAGIC + struct.pack("<iii", 4, 2, 99) + px
    out = ResizeImage(out_w=2, out_h=1)(
        pa.table({"content": pa.array([raw, None], pa.binary())}))
    resized = out.column("resized")[0].as_py()
    w, h, seed = struct.unpack("<iii", resized[4:16])
    assert (w, h, seed) == (2, 1, 99)
    # ys = [0], xs = [0, 2] -> pixels (0, 2)
    assert list(resized[16:]) == [0, 2]
    assert out.column("resized_checksum")[0].as_py() == 2
    assert out.column("resized")[1].as_py() is None
