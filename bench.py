"""Benchmark harness.

Headline: the full KG-construction pipeline (extract → link →
canonicalize → materialize) over the synthesized CC-style pages corpus
sized to the scale factor (sf0.1 → 50,000 pages), reported as wall
seconds plus derived triples/sec.  Secondary: representative per-operator
pipelines over the testdata tables.

Usage::

    python bench.py               # one JSON line on stdout
    python bench.py --scaling     # fresh processes at 8 and 32 CPUs,
                                  # reports throughputs + efficiency

Env: ``GRAFT_SF_DIR`` (default /root/testdata/sf0.1),
``RAY_GRAFT_CPUS`` (default 32).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

SECONDARY = ["dedup_exact_docs", "dedup_minhash_docs", "dedup_ngram_docs",
             "dedup_embedding_pairs", "dedup_embedding_lsh",
             "ann_topk_cosine", "token_stats_docs", "tpch_q1_pricing",
             "events_hourly_window", "extract_entities_regex",
             "canonicalize_lww_events", "events_orders_asof",
             "token_frequencies_docs", "events_value_quantiles",
             "tpch_q3_revenue", "chunk_docs", "bigram_frequencies_docs",
             "orders_no_events", "events_type_quantiles",
             "repetition_stats_docs", "decontaminate_docs",
             "doc_frequencies_docs", "dedup_keep_best",
             "events_attribution_range", "distinctive_term_docs",
             "curate_training_docs", "events_user_sequence",
             "events_value_percent_rank", "customer_events_left_join",
             "bm25_topk_docs", "events_value_rank",
             "pmi_bigrams_docs", "events_scd2_intervals",
             "events_winsorized_stats",
             "kg_incremental_nodes",
             # kg_* secondary times include the mention-extraction /
             # KG-build prefix (fresh session each, no cached result)
             "kg_cooccurrence", "kg_pagerank",
             # wave 4-6 representatives (bloom/CMS sketches, exact
             # moments, windows, star join)
             "bloom_probe_customers", "events_zscore_by_type",
             "events_user_running_total", "cms_user_counts",
             "lineitem_corr", "tpch_q5_revenue",
             # round-4 representatives (ANN entity linking over the
             # extracted mention stream, URL canonicalization over the
             # pages corpus)
             "entity_link_ann", "url_canonical_pages",
             # corpus-hygiene additions (duplicate-span strip over
             # documents, per-host dup report over the pages corpus)
             "dedup_span_docs", "host_dedup_stats",
             # round-5 additions (deterministic k-means clustering,
             # label-propagation communities over the co-mention graph)
             "embedding_kmeans_clusters", "kg_communities",
             # round-5 session-C additions (SemDeDup, sequence packing,
             # signed random projection, canonical-URL dedup, HITS)
             "dedup_semantic_docs", "pack_training_docs",
             "embedding_random_projection", "dedup_url_pages",
             "kg_hits",
             # round-5 session-D additions (web link graph + PageRank
             # composition, postings build, KS drift, int8 codes)
             "web_link_edges", "web_pagerank_pages",
             "inverted_index_docs", "events_drift_ks",
             "embedding_quantize_int8",
             # round-5 session-E additions (inbound anchor texts,
             # co-citation, BPE pair stats, per-doc n-gram novelty,
             # walk skip-gram export)
             "web_anchor_texts", "web_cocitation", "bpe_pairs_docs",
             "ngram_novelty_docs", "kg_walk_pairs",
             # round-5 session-F additions (unigram-LM surprisal
             # scoring, Katz centrality, host language entropy)
             "surprisal_docs", "kg_katz", "host_lang_entropy_pages",
             # round-5 session-G additions (bigram-LM scoring, decay
             # weighting, dHash image dedup, frontier rounds, k-truss)
             "bigram_surprisal_docs", "events_decayed_value",
             "multimodal_image_dedup", "crawl_frontier_rounds",
             "kg_ktruss"]


def _ivf_recall(sf_dir: str, k: int = 10, nprobe: int = 2,
                n_centroids: int = 8, n_assign: int = 2) -> float:
    """Measured recall of the APPROXIMATE IVF setting vs brute force
    (the gate runs IVF exactly; this reports the scale-path tradeoff).
    The recommended approximate config is k-means-trained centroids +
    multiple assignment n_assign=2 (2x index size)."""
    import ray
    from kgforge.pipelines import queries as Q
    from kgforge.stages.ann import brute_force_topk, ivf_topk
    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                                columns=["vec_id", "embedding"])
    qm = Q._query_matrix(sf_dir)
    exact = brute_force_topk(emb, qm, k=k).to_pandas()
    approx = ivf_topk(emb, qm, k=k, n_centroids=n_centroids,
                      nprobe=nprobe, n_assign=n_assign).to_pandas()
    hits = total = 0
    for qid in exact["query_id"].unique():
        e = set(exact[exact["query_id"] == qid]["vec_id"])
        a = set(approx[approx["query_id"] == qid]["vec_id"])
        hits += len(e & a)
        total += len(e)
    return round(hits / total, 3) if total else 1.0


def _calibration_sec(reps: int = 5) -> float:
    """Fixed CPU-bound anchor timed each run: this VM's speed drifts
    ±35% between sessions (BASELINE.md), so raw cross-round per-query
    deltas are confounded.  Dividing any query time by ``calib_sec``
    from the same BENCH file gives a drift-normalized ratio.  Best-of-N
    single-process numpy matmul — deterministic input, no Ray."""
    import numpy as _np
    rng = _np.random.default_rng(0)
    a = rng.random((1024, 1024))
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        (a @ a).sum()
        best = min(best, time.time() - t0)
    return round(best, 4)


def run_bench() -> dict:
    import ray
    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    from kgforge.pipelines import queries as Q
    from kgforge.pipelines.kg_build import (KGBuildConfig, build_kg,
                                            read_pages)

    sf = Q.sf_value(SF_DIR)
    n_pages = int(os.environ.get("GRAFT_BENCH_PAGES", "0")) or \
        max(64, int(500_000 * sf))
    corpus_dir, pages_path = Q.pages_for_sf(SF_DIR, n_override=n_pages)
    with open(f"{corpus_dir}/ontology.json") as fh:
        ontology_json = fh.read()
    with open(f"{corpus_dir}/aliases.json") as fh:
        alias_map = json.load(fh)

    # warm the OS page cache with one untimed read, and the Ray worker
    # pool (process spawn + module imports) with one untimed parallel map
    ray.data.read_parquet(pages_path).count()

    def _warm(batch):
        import time as _t

        import kgforge.pipelines.kg_build  # noqa: F401
        import kgforge.stages.canonicalize  # noqa: F401
        _t.sleep(0.3)
        return batch
    (ray.data.range(NUM_CPUS, override_num_blocks=NUM_CPUS)
        .map_batches(_warm, batch_size=1).count())

    cfg = KGBuildConfig(ontology_json=ontology_json, alias_map=alias_map,
                        n_buckets=max(16, NUM_CPUS))
    t0 = time.time()
    pages = read_pages(pages_path, cfg)
    res = build_kg(pages, cfg)
    headline = time.time() - t0
    mentions = res.metrics.get("mentions", 0)
    triples = res.metrics.get("nodes", 0) + res.metrics.get("edges", 0)

    qtimes: dict[str, float] = {"kg_build": round(headline, 3)}
    from ray.data import Dataset
    qs = Q
    secondary = ([] if os.environ.get("GRAFT_BENCH_SKIP_SECONDARY")
                 else SECONDARY)
    for name in secondary:
        # each timed query gets a FRESH Ray session + warmed worker pool:
        # accumulated session state (object store fill, worker heaps)
        # made unchanged queries drift ~2x between rounds when all 15
        # shared one session (VERDICT r2), so cross-round deltas weren't
        # attributable to code
        ray.shutdown()
        # module-level memos (materialized Datasets, exported artifacts)
        # belong to the session that was just destroyed — a later kg_*
        # query ray.get-ing them would crash or silently reread stale
        # state, so drop them with the session
        Q._KG_RESULT_CACHE.clear()
        Q._KG_CURATED_CACHE.clear()
        Q._KG_INCR_CACHE.clear()
        Q._GATE_EXPORTED.clear()
        Q._GATE_PAGES_EXPORTED.clear()
        Q._GATE_EXPORT_SEC.clear()
        ray.init(address="local", num_cpus=NUM_CPUS,
                 include_dashboard=False, ignore_reinit_error=True,
                 logging_level="ERROR")
        DataContext.get_current().enable_progress_bars = False
        (ray.data.range(NUM_CPUS, override_num_blocks=NUM_CPUS)
            .map_batches(_warm, batch_size=1).count())
        fn = getattr(qs, name)
        t0 = time.time()
        r = fn(SF_DIR)
        if isinstance(r, Dataset):
            r.count()
        qtimes[name] = round(time.time() - t0, 3)
        # kg_* secondaries re-pay the mention-extraction / KG-build /
        # gate-artifact-export prefix in their fresh session (correct
        # hygiene, but ~60% of their wall time masks the actual
        # graph-op cost — VERDICT r4); report the op time NET of every
        # prefix this run actually paid so graph-code regressions are
        # visible
        if name.startswith("kg_"):
            prefix = Q._GATE_EXPORT_SEC.get(SF_DIR, 0.0)
            if SF_DIR in Q._KG_RESULT_CACHE:
                prefix += (Q._KG_RESULT_CACHE[SF_DIR]
                           .metrics.get("total_sec") or 0.0)
            if prefix:
                qtimes[name + "_net"] = round(
                    max(0.0, qtimes[name] - prefix), 3)

    out = {
        "metric": "kg_construct_end_to_end",
        "value": round(headline, 3),
        "unit": "sec",
        "calib_sec": _calibration_sec(),
        "queries": qtimes,
        "sf": sf,
        "num_cpus": NUM_CPUS,
        "n_pages": n_pages,
        "mentions": int(mentions),
        "triples": int(triples),
        "triples_per_sec": round(triples / headline, 1) if headline else None,
        "mentions_per_sec": round(mentions / headline, 1) if headline else None,
        "stages": {k: round(v, 2) for k, v in res.metrics.items()
                   if isinstance(v, float)},
    }
    if secondary:
        ray.shutdown()
        ray.init(address="local", num_cpus=NUM_CPUS,
                 include_dashboard=False, ignore_reinit_error=True,
                 logging_level="ERROR")
        DataContext.get_current().enable_progress_bars = False
        out["ivf_recall_nprobe2_of_8"] = _ivf_recall(SF_DIR, nprobe=2)
        out["ivf_recall_nprobe4_of_8"] = _ivf_recall(SF_DIR, nprobe=4)
    ray.shutdown()
    return out


def run_scaling() -> dict:
    # the scaling criterion needs enough work that compute dominates the
    # fixed per-run latency: a 2M-page corpus (~40x the sf0.1 default),
    # pre-generated here (untimed, parallel, cached) and identical for
    # both parallelism levels
    n_pages = int(os.environ.get("GRAFT_BENCH_PAGES", "2000000"))
    import ray
    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    from kgforge.testing.corpus import cached_corpus_dir
    cached_corpus_dir(n_pages, seed=42)
    ray.shutdown()

    def one(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu),
                   GRAFT_BENCH_PAGES=str(n_pages),
                   GRAFT_BENCH_SKIP_SECONDARY="1")
        proc = subprocess.run([sys.executable, __file__], env=env,
                              capture_output=True, text=True, check=True)
        return json.loads(proc.stdout.strip().splitlines()[-1])

    # default N=4 vs 4N=16: above ~16 concurrent workers this single box
    # saturates shared memory bandwidth (a one-machine artifact — cluster
    # nodes each bring their own); both pairs are reported in BASELINE.md
    lo_cpus = int(os.environ.get("GRAFT_SCALE_LO", "4"))
    hi_cpus = int(os.environ.get("GRAFT_SCALE_HI", str(lo_cpus * 4)))
    # median of GRAFT_SCALE_REPS runs per leg: single-leg efficiency
    # carried ±0.05 run-to-run variance on this shared VM (VERDICT r1)
    reps = int(os.environ.get("GRAFT_SCALE_REPS", "3"))
    lo_runs = [one(lo_cpus) for _ in range(reps)]
    hi_runs = [one(hi_cpus) for _ in range(reps)]

    def med_run(runs: list[dict]) -> dict:
        return sorted(runs, key=lambda r: r["value"])[len(runs) // 2]

    lo_med, hi_med = med_run(lo_runs), med_run(hi_runs)
    lo_sec, hi_sec = lo_med["value"], hi_med["value"]
    # throughput scaling efficiency: (T_lo / T_hi) / (hi/lo); 1.0 = linear
    eff = (lo_sec / hi_sec) / (hi_cpus / lo_cpus)
    return {
        "metric": "scaling_efficiency",
        f"sec_{lo_cpus}": lo_sec,
        f"sec_{hi_cpus}": hi_sec,
        f"runs_{lo_cpus}": [r["value"] for r in lo_runs],
        f"runs_{hi_cpus}": [r["value"] for r in hi_runs],
        # throughput from the SAME median runs as the latencies
        "mentions_per_sec_lo": lo_med["mentions_per_sec"],
        "mentions_per_sec_hi": hi_med["mentions_per_sec"],
        "num_cpus": [lo_cpus, hi_cpus],
        "sf": lo_runs[0]["sf"],
        "n_pages": lo_runs[0]["n_pages"],
        "reps": reps,
        "scaling_efficiency": round(eff, 3),
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
