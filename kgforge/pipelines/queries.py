"""Driver-gate query implementations.

One callable per implemented operator/pipeline (SURVEY.md §2 + the
training-data operators).  Each takes ``sf_dir`` and returns a Ray
Dataset / pandas DataFrame / pyarrow Table; the SQL oracles live in
``__ray_entry__.oracle_sql`` with IDENTICAL column names.

Float policy for hash-compared results: money-like sums are computed in
integer cents (``round(x*100)`` per row, then integer sums) so Ray and
DuckDB agree bit-for-bit regardless of summation order; cosine scores
are rounded to 6 decimals.
"""

from __future__ import annotations

import json
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray
from ray.data import Dataset
from ray.data.aggregate import Count, Sum

from ..functions.textstats import (BPE_RE, TOKEN_RE, LangIdScorer,
                                   fingerprint_batch, quality_stats_batch,
                                   token_stats_batch)
from ..stages.ann import brute_force_topk, ivf_topk
from ..stages.dedup import (embedding_pairs, embedding_pairs_exact,
                            exact_dedup, minhash_lsh_pairs,
                            ngram_jaccard_pairs, simhash_pairs)


def _read(sf_dir: str, table: str, columns=None) -> Dataset:
    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _cents(col: pa.ChunkedArray) -> pa.ChunkedArray:
    # DuckDB round() is half-AWAY-FROM-ZERO; pc.round defaults to
    # half-to-even — floor(x*100 + 0.5) matches DuckDB for the
    # non-negative money columns used here
    return pc.floor(pc.add(pc.multiply(col, 100), 0.5)).cast(pa.int64())


# ---------------------------------------------------------------------------
# KG construction over the synthesized CC-style pages corpus
# ---------------------------------------------------------------------------


def sf_value(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", sf_dir)
    return float(m.group(1)) if m else 0.001


def pages_for_sf(sf_dir: str, n_override: int | None = None) -> tuple:
    """Deterministic synthetic pages corpus sized to the scale factor
    (input_hint shape; no external data).  Cached under /tmp."""
    from ..testing.corpus import cached_corpus_dir
    n_pages = n_override or max(64, int(200_000 * sf_value(sf_dir)))
    corpus_dir = cached_corpus_dir(n_pages, seed=42)
    return corpus_dir, f"{corpus_dir}/pages"


_KG_RESULT_CACHE: dict = {}
_KG_CURATED_CACHE: dict = {}
_GATE_EXPORTED: set = set()
_GATE_PAGES_EXPORTED: set = set()
# wall seconds the LAST _ensure_gate_artifact export took, keyed by sf:
# bench subtracts this prefix (mention re-extraction + artifact write)
# from kg_* query times so the reported _net isolates the graph op
_GATE_EXPORT_SEC: dict = {}


def _ensure_gate_pages(sf_dir: str) -> None:
    """Export ONLY the pages artifact (for oracles that need the raw
    corpus but not the mention extraction — domain stats/caps): a
    fraction of :func:`_ensure_gate_artifact`'s cost."""
    if sf_dir in _GATE_PAGES_EXPORTED or sf_dir in _GATE_EXPORTED:
        return
    from .oracle_export import export_gate_pages
    _, pages_path = pages_for_sf(sf_dir)
    export_gate_pages(ray.data.read_parquet(
        pages_path, columns=["url", "warc_ts", "text", "lang"]))
    # overwriting the pages artifact invalidates any OTHER sf's full
    # export (its kg oracles would read this sf's pages) — both memos
    # must agree on the single on-disk artifact
    _GATE_EXPORTED.clear()
    _GATE_PAGES_EXPORTED.clear()
    _GATE_PAGES_EXPORTED.add(sf_dir)


def _ensure_gate_artifact(sf_dir: str) -> None:
    """Write the per-mention oracle artifact (and pages) for this sf to
    the fixed gate path, once per process per sf.  The kg_nodes/kg_edges
    /html_text_pages oracle SQL reads these files — the driver runs each
    Ray query before its oracle, so the artifact is in place."""
    if sf_dir in _GATE_EXPORTED:
        return
    import time as _time
    from .kg_build import KGBuildConfig, extract_mentions, read_pages
    from .oracle_export import export_gate_mentions, export_gate_pages
    _t0 = _time.time()
    corpus_dir, pages_path = pages_for_sf(sf_dir)
    with open(f"{corpus_dir}/ontology.json") as fh:
        ontology_json = fh.read()
    with open(f"{corpus_dir}/aliases.json") as fh:
        alias_map = json.load(fh)
    pages = read_pages(pages_path)
    mentions = extract_mentions(pages, KGBuildConfig(
        ontology_json=ontology_json))
    export_gate_mentions(mentions, ontology_json, alias_map)
    export_gate_pages(ray.data.read_parquet(
        pages_path, columns=["url", "warc_ts", "text", "lang"]))
    _GATE_EXPORT_SEC.clear()
    _GATE_EXPORT_SEC[sf_dir] = _time.time() - _t0
    _GATE_EXPORTED.clear()
    _GATE_EXPORTED.add(sf_dir)
    # the pages artifact now belongs to THIS sf — keep the pages memo
    # coherent with the on-disk state
    _GATE_PAGES_EXPORTED.clear()
    _GATE_PAGES_EXPORTED.add(sf_dir)


def _kg_result(sf_dir: str):
    # size-1 memo: kg_nodes and kg_edges are separate gate queries but
    # share one pipeline run (the materialized result pins only the small
    # node/edge tables)
    if sf_dir in _KG_RESULT_CACHE:
        return _KG_RESULT_CACHE[sf_dir]
    from .kg_build import KGBuildConfig, build_kg, read_pages
    corpus_dir, pages_path = pages_for_sf(sf_dir)
    with open(f"{corpus_dir}/ontology.json") as fh:
        ontology_json = fh.read()
    with open(f"{corpus_dir}/aliases.json") as fh:
        alias_map = json.load(fh)
    pages = read_pages(pages_path)
    cfg = KGBuildConfig(ontology_json=ontology_json, alias_map=alias_map)
    res = build_kg(pages, cfg)
    _KG_RESULT_CACHE.clear()
    _KG_RESULT_CACHE[sf_dir] = res
    return res


def kg_nodes(sf_dir: str):
    """Flagship node table — SQL-oracled via the per-mention artifact
    (LWW merge expressed as a DuckDB window query; see oracle_export)."""
    _ensure_gate_artifact(sf_dir)
    return _kg_result(sf_dir).nodes


def kg_edges(sf_dir: str):
    """Flagship edge table — SQL-oracled via the per-mention artifact
    (dedup + endpoint semi-join expressed in DuckDB)."""
    _ensure_gate_artifact(sf_dir)
    return _kg_result(sf_dir).edges


def kg_mentions(sf_dir: str):
    """Raw extracted mention table — SQL-oracled: the deterministic
    grammar extractor is re-derived in DuckDB as regexes over the
    exported pages (url, warc_ts_us, text)."""
    _ensure_gate_artifact(sf_dir)
    from .kg_build import KGBuildConfig, extract_mentions, read_pages
    corpus_dir, pages_path = pages_for_sf(sf_dir)
    with open(f"{corpus_dir}/ontology.json") as fh:
        ontology_json = fh.read()
    pages = read_pages(pages_path)
    cfg = KGBuildConfig(ontology_json=ontology_json)
    return extract_mentions(pages, cfg)


def _ann_link_inputs(sf_dir: str):
    """Shared setup for BOTH linker gate queries (they must stay
    output-identical — one surface-extraction body, not two copies):
    (distinct pre-alias Person surfaces Dataset, canonical people)."""
    from ..stages.linker import distinct_strings
    from ..testing.corpus import build_pools
    from .kg_build import KGBuildConfig, extract_mentions, read_pages
    from .oracle_export import export_gate_canon
    _ensure_gate_pages(sf_dir)  # oracle re-derives surfaces from pages
    corpus_dir, pages_path = pages_for_sf(sf_dir)
    m = re.search(r"_n(\d+)_s(\d+)$", corpus_dir)
    people = build_pools(int(m.group(1)), seed=int(m.group(2)))["people"]
    export_gate_canon(people)

    with open(f"{corpus_dir}/ontology.json") as fh:
        ontology_json = fh.read()
    mentions = extract_mentions(
        read_pages(pages_path),
        KGBuildConfig(ontology_json=ontology_json))

    def person_surfaces(batch: pa.Table) -> pa.Table:
        mask = pc.and_(pc.equal(batch.column("kind"), "entity"),
                       pc.equal(batch.column("label"), "Person"))
        names = [json.loads(a).get("name") for a in
                 batch.filter(mask).column("attrs").to_pylist()]
        return pa.table({"surface": pa.array(
            [s for s in names if s is not None], pa.string())})

    surf = distinct_strings(
        mentions.map_batches(person_surfaces, batch_format="pyarrow"),
        "surface")
    return surf, people


def entity_link_ann(sf_dir: str):
    """Embedding-ANN entity-linking candidate generation (the north-star
    "alias dictionary + embedding ANN" second half; reference links only
    by exact unique attrs, ``extract_data_step.py:201-226``): distinct
    pre-alias Person surface forms from the real extraction path are
    linked to the canonical-people catalog by hashed char-3-gram cosine.
    Everything is exact small integers, so the SQL oracle re-derives
    every embedding, the argmax and the threshold bit-exactly."""
    from ..stages.linker import AnnLinker
    surf, people = _ann_link_inputs(sf_dir)
    cref = [ray.put(people)]
    out = surf.map_batches(
        AnnLinker, batch_format="pyarrow", batch_size=8192,
        concurrency=(1, 2), fn_constructor_kwargs={"catalog": cref})
    return out.sort("surface")


def entity_link_ann_bucketed(sf_dir: str):
    """The linker's catalog-as-Dataset scale path over the same
    surfaces and catalog — output-identical to ``entity_link_ann``
    (shares its oracle, the streaming-sessionize pattern): candidates
    from the shared-dim co-partition, min-dim ownership, distributed
    argmax, anti-join rejoin for no-candidate surfaces."""
    from ..stages.linker import ann_link_bucketed
    surf, people = _ann_link_inputs(sf_dir)
    catalog = ray.data.from_arrow(pa.table({
        "canon": pa.array(sorted(set(people)), pa.string())}))
    return ann_link_bucketed(surf, catalog).sort("surface")


def html_text_pages(sf_dir: str):
    """The byte-identical invariant stage over the html column: re-extract
    text and compare with the shipped text column per url.  SQL-oracled:
    the oracle reads the exported (url, text) pages and asserts every row
    re-extracted byte-identically with the same char count."""
    from ..functions.html_text import extract_text_batch
    _ensure_gate_artifact(sf_dir)
    _, pages_path = pages_for_sf(sf_dir)
    pages = ray.data.read_parquet(pages_path,
                                  columns=["url", "html", "text"])

    def check(batch: pa.Table) -> pa.Table:
        expected = batch.column("text")
        batch = batch.rename_columns(["url", "html", "expected"])
        out = extract_text_batch(batch, out_col="text")
        match = pc.equal(out.column("text").cast(pa.string()),
                         out.column("expected"))
        return pa.Table.from_arrays(
            [out.column("url"),
             pc.utf8_length(out.column("text")).cast(pa.int64()),
             match],
            names=["url", "n_chars", "byte_identical"])

    return pages.map_batches(check, batch_format="pyarrow")


def kg_ontology_detect(sf_dir: str):
    from .ontology_detect import detect_ontology
    _, pages_path = pages_for_sf(sf_dir)
    pages = ray.data.read_parquet(pages_path, columns=["url", "text"])
    ont = detect_ontology(pages, sample_frac=0.5, seed=42)
    rows = ([("entity", e.label, a.name, a.type, a.unique)
             for e in ont.entities for a in e.attributes]
            + [("relation", r.label, a.name, a.type, a.unique)
               for r in ont.relations for a in r.attributes]
            + [("relation", r.label, "", "", False)
               for r in ont.relations if not r.attributes])
    rows.sort()
    return pa.table({
        "kind": [r[0] for r in rows], "label": [r[1] for r in rows],
        "attr": [r[2] for r in rows], "attr_type": [r[3] for r in rows],
        "is_unique": [r[4] for r in rows]})


# ---------------------------------------------------------------------------
# SQL-oracled operators over the TPC-H-ish testdata tables
# ---------------------------------------------------------------------------

ENTITY_PATTERN = r"\b(spark|table|join|merge|filter)\b"


def extract_entities_regex(sf_dir: str):
    """Regex mention extraction + canonicalizing groupby — the KG extract
    dataflow in an oracle-checkable guise."""
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    pat = re.compile(ENTITY_PATTERN)

    def mentions(batch: pa.Table) -> pa.Table:
        ids, ents = [], []
        for doc_id, text in zip(batch.column("doc_id").to_pylist(),
                                batch.column("text").to_pylist()):
            for m in pat.findall(text or ""):
                ids.append(doc_id)
                ents.append(m)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "entity": pa.array(ents, pa.string())})

    def per_doc_partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = (df.groupby(["entity"])
               .agg(n_mentions=("doc_id", "size"),
                    docs=("doc_id", lambda s: set(s))))
        return pa.table({
            "entity": g.index.tolist(),
            "n_mentions": pa.array(g["n_mentions"].tolist(), pa.int64()),
            "doc_set": pa.array([json.dumps(sorted(x)) for x in g["docs"]],
                                pa.string())})

    def finalize(group: pd.DataFrame) -> pd.DataFrame:
        docs: set = set()
        for s in group["doc_set"]:
            docs.update(json.loads(s))
        return pd.DataFrame({
            "entity": [group["entity"].iloc[0]],
            "n_mentions": np.array([group["n_mentions"].sum()], dtype=np.int64),
            "n_docs": np.array([len(docs)], dtype=np.int64)})

    return (docs.map_batches(mentions, batch_format="pyarrow")
                .map_batches(per_doc_partial, batch_format="pyarrow")
                .groupby("entity")
                .map_groups(finalize, batch_format="pandas"))


def canonicalize_lww_events(sf_dir: str):
    """Deterministic last-writer-wins per user over the events stream —
    the node-canonicalize merge rule, SQL-checkable."""
    events = _read(sf_dir, "events",
                   columns=["event_id", "ts", "user_id", "event_type", "value"])

    def bucket(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "bucket", pc.cast(pc.bit_wise_and(batch.column("user_id"), 63),
                              pa.int64()))

    def lww(group: pd.DataFrame) -> pd.DataFrame:
        # coarse-bucketed fold: one call per bucket, vectorized inside
        g = group.sort_values(["ts", "event_id"])
        last = g.groupby("user_id", as_index=False).tail(1)
        counts = g.groupby("user_id", as_index=False).size()
        out = last.merge(counts, on="user_id").sort_values("user_id")
        return pd.DataFrame({
            "user_id": out["user_id"].astype(np.int64),
            "last_event_type": out["event_type"],
            "last_value_cents": np.floor(out["value"] * 100 + 0.5).astype(
                np.int64),
            "n_events": out["size"].astype(np.int64)})

    return (events.map_batches(bucket, batch_format="pyarrow")
                  .groupby("bucket").map_groups(lww, batch_format="pandas"))


def edge_semijoin_events(sf_dir: str):
    """Endpoint semi-join semantics (dangling rows dropped) + grouped
    aggregate, over events × customer."""
    from ..stages.joins import _broadcast_value_array
    events = _read(sf_dir, "events", columns=["user_id", "value"])
    customers = _read(sf_dir, "customer", columns=["c_custkey"])
    keys = set()
    for b in customers.iter_batches(batch_size=65536, batch_format="pyarrow"):
        keys.update(b.column("c_custkey").to_pylist())
    kref = ray.put(sorted(keys))

    def prep(batch: pa.Table) -> pa.Table:
        value_set = _broadcast_value_array(kref)
        mask = pc.fill_null(
            pc.is_in(batch.column("user_id"), value_set=value_set), False)
        batch = batch.filter(mask)
        return pa.table({
            "user_id": batch.column("user_id"),
            "value_cents": _cents(batch.column("value"))})

    out = (events.map_batches(prep, batch_format="pyarrow")
                 .groupby("user_id")
                 .aggregate(Count(alias_name="n_events"),
                            Sum("value_cents", alias_name="total_cents")))
    return out


def dedup_exact_docs(sf_dir: str):
    return exact_dedup(_read(sf_dir, "documents", columns=["doc_id", "text"]))


def dedup_exact_hash_docs(sf_dir: str):
    """Text-free exact dedup (the 100-TB shuffle mode): only
    ``(doc_id, md5)`` rides the exchange; SQL-oracled via DuckDB
    ``md5()``."""
    return exact_dedup(_read(sf_dir, "documents",
                             columns=["doc_id", "text"]), keep_text=False)


def dedup_exact_streaming(sf_dir: str):
    """Exact dedup as an unbounded-stream operator (hash-partitioned
    stateful actors, driver as message bus) — output IDENTICAL to the
    batch ``dedup_exact_hash_docs`` (min-id wins is order-free), so it
    shares that query's SQL oracle; batch ≡ stream pinned in pytest."""
    from ..stages.streaming import streaming_exact_dedup
    return streaming_exact_dedup(
        _read(sf_dir, "documents", columns=["doc_id", "text"]))


def dedup_minhash_docs(sf_dir: str):
    """Minhash-LSH near-dup PAIR SET at threshold 0.5 — SQL-oracled
    against the exact-Jaccard pair set: on this corpus the planted
    duplicates sit far from the threshold, so the signature estimator
    (fixed seed, deterministic) selects exactly the exact-Jaccard pairs
    (asserted in tests/test_dedup_ann.py::test_minhash_matches_exact_
    pairs).  The gate compares the SET; ``est_jaccard`` stays available
    on the operator but is dropped here (only exact Jaccard is
    SQL-derivable)."""
    out = minhash_lsh_pairs(_read(sf_dir, "documents",
                                  columns=["doc_id", "text"]), threshold=0.5)
    return out.select_columns(["id_a", "id_b"])


def dedup_minhash_scalepath(sf_dir: str):
    """The minhash operator's candidate-first SCALE path forced
    externally (``broadcast_sig_limit=0`` disables the broadcast-verify
    fast path) — output-identical pair set, shares dedup_minhash_docs'
    oracle (path parity as external gate signal)."""
    out = minhash_lsh_pairs(_read(sf_dir, "documents",
                                  columns=["doc_id", "text"]),
                            threshold=0.5, broadcast_sig_limit=0)
    return out.select_columns(["id_a", "id_b"])


def dedup_simhash_docs(sf_dir: str):
    return simhash_pairs(_read(sf_dir, "documents",
                               columns=["doc_id", "text"]), max_hamming=3)


def dedup_ngram_docs(sf_dir: str):
    """EXACT n-gram Jaccard pairs (shared-shingle candidate index,
    recall 1.0 by construction) — SQL-oracled."""
    return ngram_jaccard_pairs(_read(sf_dir, "documents",
                                     columns=["doc_id", "text"]),
                               threshold=0.5)


N_PLANTED_NEAR_DUPS = 12
PLANT_ID_BASE = 10_000_000


def _augmented_embeddings(sf_dir: str):
    """Embeddings table + planted near-duplicate vectors.

    The driver testdata ships no pair above cosine 0.51, so a 0.95
    threshold would be trivially green on an empty result (VERDICT r1
    #6).  Since /root/testdata is read-only, the near-dups are DERIVED
    deterministically from the table itself: for the 12 smallest ids
    ``w_i = 0.95*v_i + 0.05*v_{i+1}`` (float64 elementwise — the SQL
    oracle replicates the identical IEEE ops), appended with id
    ``10_000_000 + i``.  cosine(v_i, w_i) ≈ 0.999 — far from both the
    0.95 threshold and the 0.51 background, so no boundary sensitivity.
    """
    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet",
                        columns=["vec_id", "embedding"])
    ids = tbl.column("vec_id").to_pylist()
    by_id = {int(i): np.asarray(v, dtype=np.float64)
             for i, v in zip(ids, tbl.column("embedding").to_pylist())}
    p_ids, p_vecs = [], []
    for i in range(N_PLANTED_NEAR_DUPS):
        if i in by_id and (i + 1) in by_id:
            p_ids.append(PLANT_ID_BASE + i)
            p_vecs.append(0.95 * by_id[i] + 0.05 * by_id[i + 1])
    planted = pa.table({
        "vec_id": pa.array(p_ids, pa.int64()),
        "embedding": pa.array([v.tolist() for v in p_vecs],
                              pa.list_(pa.float64()))})
    base = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def to_f64(t: pa.Table) -> pa.Table:
        return pa.table({
            "vec_id": t.column("vec_id"),
            "embedding": t.column("embedding").cast(pa.list_(pa.float64()))})

    return base.map_batches(to_f64, batch_format="pyarrow").union(
        ray.data.from_arrow(planted))


def dedup_embedding_pairs(sf_dir: str):
    """Exact all-pairs cosine >= 0.95 over the augmented embeddings —
    SQL-oracled (DuckDB self-join with list_cosine_similarity)."""
    out = embedding_pairs_exact(_augmented_embeddings(sf_dir),
                                threshold=0.95)
    return out.map_batches(
        lambda t: t.set_column(t.schema.get_field_index("cosine"), "cosine",
                               pc.round(t.column("cosine"), 6)),
        batch_format="pyarrow")


def embedding_kmeans_clusters(sf_dir: str):
    """Deterministic integer-arithmetic k-means corpus clustering
    (k=8, 3 Lloyd iterations, floor-1e6 quantization) over the
    embeddings table — the data-mixing / SemDeDup partitioning
    primitive.  EXACTLY SQL-oracled: integer squared-L2 distances,
    argmin tie-broken by centroid index, and centroid updates computed
    as ``floor(double(sum)/count)`` (the identical IEEE ops in DuckDB —
    its integer ``//`` TRUNCATES while numpy floors, so neither side
    uses it).  See :func:`kgforge.stages.ann.kmeans_assign_fixed`."""
    from ..stages.ann import kmeans_assign_fixed
    return kmeans_assign_fixed(
        _read(sf_dir, "embeddings", columns=["vec_id", "embedding"]),
        k=8, n_iter=3)


MIXTURE_BUDGETS = {"en": 10_000, "de": 4_000, "es": 4_000,
                   "fr": 4_000, "zh": 4_000}


def mixture_token_budget_docs(sf_dir: str):
    """Token-budget mixture curation: per-language integer token
    budgets consumed in deterministic md5(id) order (keep while the
    running total INCLUDING the doc fits) — the data-mixing allocator
    that cuts a training mix to target proportions.  SQL-oracled via a
    per-language running-SUM window."""
    from ..stages.relational import token_budget_select
    return token_budget_select(
        _read(sf_dir, "documents", columns=["doc_id", "text", "lang"]),
        budgets=MIXTURE_BUDGETS)


def dedup_semantic_docs(sf_dir: str):
    """SemDeDup over the augmented embeddings (planted near-dups make
    the pruning bite): deterministic integer k-means clusters, then
    within-cluster cosine-dominance drop (kept = no smaller-id
    cluster-mate with cosine >= 0.95).  SQL-oracled end to end — the
    k-means CTE chain extended with an EXISTS over
    ``list_cosine_similarity`` pairs."""
    from ..stages.dedup import semantic_dedup
    return semantic_dedup(_augmented_embeddings(sf_dir),
                          k=8, n_iter=3, threshold=0.95)


def embedding_random_projection(sf_dir: str):
    """Deterministic ±1 random projection of the embeddings table down
    to 8 integer components — the dimensionality-reduction step before
    ANN/LSH at scale.  Integer-exact (floor-1e6 quantize, md5-parity
    sign matrix), so the oracle re-derives every component in SQL."""
    from ..stages.ann import random_projection_fixed
    return random_projection_fixed(
        _read(sf_dir, "embeddings", columns=["vec_id", "embedding"]),
        out_dim=8)


def pack_training_docs(sf_dir: str):
    """Training-sequence packing: per language, documents laid
    end-to-end in deterministic md5(id) order, each assigned the
    512-token context window its first token lands in
    (pack_id = tokens-before // 512, pack_offset = the remainder) —
    the pretraining-export primitive.  SQL-oracled via a per-language
    running-SUM window with a 1-PRECEDING frame."""
    from ..stages.relational import pack_sequences_by_lang
    return pack_sequences_by_lang(
        _read(sf_dir, "documents", columns=["doc_id", "text", "lang"]),
        seq_len=512)


def embedding_cluster_medoids(sf_dir: str):
    """Per-cluster medoid (member closest to its final k-means
    centroid, integer squared-L2, ties to the smallest id) — the
    cluster-representative / "typical example" primitive, exactly
    SQL-oracled by extending the k-means CTE chain with the distance
    argmin.  See :func:`kgforge.stages.ann.kmeans_medoids`."""
    from ..stages.ann import kmeans_medoids
    return kmeans_medoids(
        _read(sf_dir, "embeddings", columns=["vec_id", "embedding"]),
        k=8, n_iter=3)


def dedup_cluster_docs(sf_dir: str):
    """Near-dup cluster assignment over the exact ngram pair graph —
    every doc tagged with its component's smallest id (SQL-oracled via
    a recursive reachability CTE)."""
    from ..stages.dedup import dedup_clusters
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    pairs = ngram_jaccard_pairs(docs, threshold=0.5)
    return dedup_clusters(_read(sf_dir, "documents", columns=["doc_id"]),
                          pairs)


def dedup_embedding_lsh(sf_dir: str):
    """Hyperplane-LSH scale path over the same augmented input —
    SQL-oracled with the SAME exact all-pairs oracle as
    ``dedup_embedding_pairs``: the 12-plane + 1-bit-multiprobe candidate
    set provably covers every pair within 2 differing plane bits, and on
    this deterministic corpus (fixed seed) it recalls all planted pairs;
    verification is exact cosine on the same float64 unit vectors, so
    the rounded output equals the exact query's (recall also pinned in
    tests/test_dedup_ann.py)."""
    out = embedding_pairs(_augmented_embeddings(sf_dir), threshold=0.95)
    return out.map_batches(
        lambda t: t.set_column(t.schema.get_field_index("cosine"), "cosine",
                               pc.round(t.column("cosine"), 6)),
        batch_format="pyarrow")


def dedup_embedding_scalepath(sf_dir: str):
    """The embedding near-dup operator's bucketed SCALE path forced
    externally (``broadcast_vec_limit=0``) — exact-cosine verification
    makes it output-identical; shares dedup_embedding_lsh's oracle."""
    out = embedding_pairs(_augmented_embeddings(sf_dir),
                          threshold=0.95, broadcast_vec_limit=0)
    return out.map_batches(
        lambda t: t.set_column(t.schema.get_field_index("cosine"),
                               "cosine",
                               pc.round(t.column("cosine"), 6)),
        batch_format="pyarrow")


def _query_matrix(sf_dir: str, n: int = 4) -> np.ndarray:
    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet",
                        columns=["vec_id", "embedding"])
    df = tbl.to_pandas().sort_values("vec_id").head(n)
    return np.array(df["embedding"].tolist(), dtype=np.float64)


def ann_topk_cosine(sf_dir: str):
    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    out = brute_force_topk(emb, _query_matrix(sf_dir), k=10)
    return out.map_batches(
        lambda t: t.set_column(t.schema.get_field_index("score"), "score",
                               pc.round(t.column("score"), 6)),
        batch_format="pyarrow")


def ann_ivf_topk(sf_dir: str):
    """IVF dataflow in its EXACT configuration (``nprobe = n_centroids``
    probes every bucket), so the brute-force SQL oracle applies — the
    bucketed shuffle/search/merge machinery is what's verified.  The
    approximate setting's recall is measured in bench (``--ivf-recall``)
    and by ``tests/test_dedup_ann.py``."""
    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    out = ivf_topk(emb, _query_matrix(sf_dir), k=10, n_centroids=8, nprobe=8)
    return out.map_batches(
        lambda t: t.set_column(t.schema.get_field_index("score"), "score",
                               pc.round(t.column("score"), 6)),
        batch_format="pyarrow")


def token_stats_docs(sf_dir: str):
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return (docs.map_batches(token_stats_batch, batch_format="pyarrow")
                .select_columns(["doc_id", "n_tokens", "n_tokens_bpe",
                                 "n_chars_text"]))


def quality_stats_docs(sf_dir: str):
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return (docs.map_batches(quality_stats_batch, batch_format="pyarrow")
                .select_columns(["doc_id", "n_punct", "n_upper", "n_words",
                                 "n_stopwords", "punct_ratio"]))


_LANGID_SINGLETON: list = []


def _langid_task(batch: pa.Table) -> pa.Table:
    # stateless task form: the scorer's profile tables build once per
    # worker process (an actor pool for this light state starves sibling
    # operators on small clusters — VERDICT r1)
    if not _LANGID_SINGLETON:
        _LANGID_SINGLETON.append(LangIdScorer())
    return _LANGID_SINGLETON[0](batch)


def langid_docs(sf_dir: str):
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return (docs.map_batches(_langid_task, batch_format="pyarrow")
                .select_columns(["doc_id", "lang_pred", "lang_score"]))


def fingerprint_docs(sf_dir: str):
    """Winnowing document fingerprints — SQL-oracled (min of md5-hex
    token-5-gram hashes; see ``fingerprint_batch``)."""
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return (docs.map_batches(fingerprint_batch, batch_format="pyarrow")
                .select_columns(["doc_id", "fingerprint", "n_grams"]))


def normalize_docs(sf_dir: str):
    """NFC + lowercase + whitespace-collapse text normalization (pure
    pyarrow kernels) with the normalized char count."""
    from ..functions.textstats import normalize_text_batch
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def norm(batch: pa.Table) -> pa.Table:
        out = normalize_text_batch(batch)
        return pa.table({
            "doc_id": out.column("doc_id"),
            "text_norm": out.column("text_norm"),
            "n_chars_norm": pc.utf8_length(out.column("text_norm"))
            .cast(pa.int64())})

    return docs.map_batches(norm, batch_format="pyarrow")


def redact_docs(sf_dir: str):
    """PII-style redaction (emails → [EMAIL], long digit runs → [NUM])
    with per-doc match counts."""
    from ..functions.textstats import redact_batch
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return (docs.map_batches(redact_batch, batch_format="pyarrow")
                .select_columns(["doc_id", "redacted", "n_emails",
                                 "n_longnums"]))


def lang_distribution(sf_dir: str):
    docs = _read(sf_dir, "documents", columns=["lang"])
    return docs.groupby("lang").aggregate(Count(alias_name="n"))


def tpch_q1_pricing(sf_dir: str):
    """Pricing-summary aggregate with per-batch partial aggregation (the
    combiner pattern) before the small groupby shuffle."""
    li = _read(sf_dir, "lineitem",
               columns=["l_returnflag", "l_linestatus", "l_quantity",
                        "l_extendedprice", "l_shipdate"])
    cutoff = pa.scalar(np.datetime64("1998-09-02T00:00:00", "us"))

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.less_equal(batch.column("l_shipdate"), cutoff))
        df = pa.table({
            "l_returnflag": batch.column("l_returnflag"),
            "l_linestatus": batch.column("l_linestatus"),
            "qty_cents": _cents(batch.column("l_quantity")),
            "price_cents": _cents(batch.column("l_extendedprice")),
        }).to_pandas()
        g = (df.groupby(["l_returnflag", "l_linestatus"], as_index=False)
               .agg(sum_qty_cents=("qty_cents", "sum"),
                    sum_price_cents=("price_cents", "sum"),
                    n=("qty_cents", "size")))
        return pa.Table.from_pandas(g, preserve_index=False)

    return (li.map_batches(partial, batch_format="pyarrow")
              .groupby(["l_returnflag", "l_linestatus"])
              .aggregate(Sum("sum_qty_cents", alias_name="sum_qty_cents"),
                         Sum("sum_price_cents", alias_name="sum_price_cents"),
                         Sum("n", alias_name="n")))


def top_spenders(sf_dir: str):
    """Grouped aggregate → broadcast dimension join → sort/limit."""
    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    customers = pq.read_table(f"{sf_dir}/customer.parquet",
                              columns=["c_custkey", "c_name"])
    name_by_key = dict(zip(customers.column("c_custkey").to_pylist(),
                           customers.column("c_name").to_pylist()))
    nref = ray.put(name_by_key)

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table({"o_custkey": batch.column("o_custkey"),
                         "price_cents": _cents(batch.column("o_totalprice"))})

    agg = (orders.map_batches(prep, batch_format="pyarrow")
                 .groupby("o_custkey")
                 .aggregate(Sum("price_cents", alias_name="total_cents"),
                            Count(alias_name="n_orders")))

    def attach(batch: pa.Table) -> pa.Table:
        names = ray.get(nref)
        keys = batch.column("o_custkey").to_pylist()
        return batch.append_column(
            "c_name", pa.array([names.get(k) for k in keys], pa.string()))

    out = agg.map_batches(attach, batch_format="pyarrow")
    out = out.sort(["total_cents", "o_custkey"], descending=[True, False])
    return out.limit(10).select_columns(
        ["o_custkey", "c_name", "total_cents", "n_orders"])


def events_hourly_window(sf_dir: str):
    """Tumbling-window aggregate: batch-level partials on
    (event_type, hour) then one small groupby (streaming-shaped workload
    on the ordered events log)."""
    events = _read(sf_dir, "events", columns=["ts", "event_type", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        micros = batch.column("ts").cast(pa.int64())
        hour = pc.multiply(pc.divide(micros, 3_600_000_000).cast(pa.int64()),
                           3600)
        df = pa.table({
            "event_type": batch.column("event_type"),
            "hour_epoch": hour,
            "value_cents": _cents(batch.column("value")),
        }).to_pandas()
        g = (df.groupby(["event_type", "hour_epoch"], as_index=False)
               .agg(n=("value_cents", "size"),
                    value_cents=("value_cents", "sum")))
        return pa.Table.from_pandas(g, preserve_index=False)

    return (events.map_batches(partial, batch_format="pyarrow")
                  .groupby(["event_type", "hour_epoch"])
                  .aggregate(Sum("n", alias_name="n"),
                             Sum("value_cents", alias_name="value_cents")))


def curate_documents(sf_dir: str):
    """Training-data curation pipeline: exact dedup (keep smallest id) →
    token-count band → punctuation-ratio cap, composed from the dedup and
    textstats stages — the kind of filter chain a pretraining corpus runs
    before tokenization.  Exact SQL oracle."""
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    kept = exact_dedup(docs)            # doc_id, n_dups, text

    def gate(batch: pa.Table) -> pa.Table:
        stats = token_stats_batch(batch)
        n_tok = stats.column("n_tokens")
        n_chars = pc.utf8_length(stats.column("text")).cast(pa.int64())
        n_punct = pc.count_substring_regex(stats.column("text"),
                                           r"[^\w\s]").cast(pa.int64())
        ratio = pc.divide(n_punct.cast(pa.float64()),
                          pc.max_element_wise(n_chars.cast(pa.float64()),
                                              1.0))
        keep = pc.and_(pc.and_(pc.greater_equal(n_tok, 10),
                               pc.less_equal(n_tok, 500)),
                       pc.less(ratio, 0.1))
        out = stats.filter(keep)
        return pa.table({
            "doc_id": out.column("doc_id"),
            "n_dups": out.column("n_dups"),
            "n_tokens": out.column("n_tokens"),
        })

    return kept.map_batches(gate, batch_format="pyarrow")


def distinct_users_exact(sf_dir: str):
    """Exact distinct-count via per-batch partial sets (mergeable-sketch
    shape, exact variant)."""
    from ..stages.sketches import distinct_count_exact
    events = _read(sf_dir, "events", columns=["user_id"])
    n = distinct_count_exact(events, "user_id")
    return pa.table({"n_distinct_users": pa.array([n], pa.int64())})


def distinct_users_hll(sf_dir: str):
    """HyperLogLog distinct estimate — EXACTLY SQL-oracled: the md5
    register construction, the integer-Z harmonic mean and the branch
    choice are all re-derived in DuckDB; the estimate gates quantized
    to milli-units (ln's last ulp is the only cross-engine float risk).
    pytest additionally pins the ~2% accuracy envelope vs exact."""
    from ..stages.sketches import (hll_estimate, hll_merged_registers,
                                   hll_zero_registers)
    events = _read(sf_dir, "events", columns=["user_id"])
    regs = hll_merged_registers(events, "user_id")
    milli = int(np.floor(hll_estimate(regs) * 1000 + 0.5))
    return pa.table({
        "approx_distinct": pa.array([milli / 1000.0], pa.float64()),
        "est_milli": pa.array([milli], pa.int64()),
        "n_zero_regs": pa.array([hll_zero_registers(regs)], pa.int64())})


def events_sliding_window(sf_dir: str):
    """Per-event trailing 1h window (count + cents sum) per user."""
    from ..stages.windows import sliding_count
    events = _read(sf_dir, "events",
                   columns=["event_id", "ts", "user_id", "value"])
    return sliding_count(events)


def events_hopping_window(sf_dir: str):
    """Overlapping hopping windows (1h window, 15min hop) per event
    type — every event lands in four windows."""
    from ..stages.windows import hopping_window
    events = _read(sf_dir, "events", columns=["ts", "event_type", "value"])
    return hopping_window(events, key_col="event_type",
                          window_s=3600, hop_s=900)


def top_users_by_type(sf_dir: str):
    """Heavy hitters per group: top-5 users by event count within each
    event type (per-batch count combiner, bucket fold, per-group
    head-k)."""
    from ..stages.windows import grouped_top_k
    events = _read(sf_dir, "events", columns=["event_type", "user_id"])
    return grouped_top_k(events, "event_type", "user_id", k=5)


def events_sessionize(sf_dir: str):
    """Gap-based sessions (30 min) per user over the event log."""
    from ..stages.windows import sessionize
    events = _read(sf_dir, "events", columns=["event_id", "ts", "user_id"])
    return sessionize(events)


def events_orders_asof(sf_dir: str):
    """As-of join: each event picks the customer's LATEST order at or
    before the event timestamp (ties on date break on o_orderkey) —
    the temporal-dimension attach a feature pipeline runs."""
    from ..stages.relational import as_of_join
    events = _read(sf_dir, "events", columns=["event_id", "ts", "user_id"])
    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_custkey", "o_orderdate",
                            "o_totalprice"])
    out = as_of_join(events, orders, key="user_id", left_ts="ts",
                     right_ts="o_orderdate", right_vals=["o_totalprice"],
                     right_key="o_custkey", right_order="o_orderkey")

    def finish(t: pa.Table) -> pa.Table:
        price = t.column("o_totalprice_asof")
        cents = pc.floor(pc.add(pc.multiply(price, 100), 0.5)).cast(
            pa.int64())
        return pa.table({"event_id": t.column("event_id"),
                         "user_id": t.column("user_id"),
                         "last_order_cents": cents})

    return out.map_batches(finish, batch_format="pyarrow")


def token_frequencies_docs(sf_dir: str):
    """Global top-100 token frequencies (wordcount with a per-batch
    combiner and ONE bucket fold)."""
    from ..stages.relational import token_frequencies
    return token_frequencies(_read(sf_dir, "documents",
                                   columns=["doc_id", "text"]), k=100)


def split_documents(sf_dir: str):
    """Deterministic hash train/test split + per-split aggregate."""
    from ..stages.relational import hash_split
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    tagged = hash_split(docs, "doc_id", n_buckets=10, train_buckets=8)

    def partial(t: pa.Table) -> pa.Table:
        stats = token_stats_batch(t)
        df = pa.table({"split": stats.column("split"),
                       "n_tokens": stats.column("n_tokens")}).to_pandas()
        g = (df.groupby("split", as_index=False)
               .agg(n_docs=("n_tokens", "size"),
                    n_tokens=("n_tokens", "sum")))
        g["n_docs"] = g["n_docs"].astype(np.int64)
        g["n_tokens"] = g["n_tokens"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    return (tagged.map_batches(partial, batch_format="pyarrow")
                  .groupby("split")
                  .aggregate(Sum("n_docs", alias_name="n_docs"),
                             Sum("n_tokens", alias_name="n_tokens")))


def events_type_quantiles(sf_dir: str):
    """Per-group EXACT discrete quantiles (one coarse-bucket shuffle,
    vectorized per-group rank gather) — grouped complement of
    ``events_value_quantiles``."""
    from ..stages.relational import grouped_quantiles
    events = _read(sf_dir, "events", columns=["event_type", "value"])
    return grouped_quantiles(events, "event_type", "value",
                             [0.25, 0.5, 0.9])


def orders_no_events(sf_dir: str):
    """Anti-join: orders whose customer generated NO event (broadcast
    negated key filter; tag-union shuffle fallback above the gate), then
    a grouped aggregate."""
    from ..stages.joins import anti_join_keys
    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_custkey", "o_totalprice"])
    events = _read(sf_dir, "events", columns=["user_id"])
    out = anti_join_keys(orders, events, "o_custkey", "user_id")

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table({
            "o_custkey": batch.column("o_custkey"),
            "price_cents": _cents(batch.column("o_totalprice"))})

    return (out.map_batches(prep, batch_format="pyarrow")
               .groupby("o_custkey")
               .aggregate(Count(alias_name="n_orders"),
                          Sum("price_cents", alias_name="total_cents")))


def chunk_docs(sf_dir: str):
    """RAG-style overlapping character chunking (200 chars, 50 overlap)
    — pure flat map, chunk grid re-derived exactly in SQL."""
    from ..stages.relational import chunk_documents
    return chunk_documents(_read(sf_dir, "documents",
                                 columns=["doc_id", "text"]),
                           chunk_chars=200, overlap=50)


def bigram_frequencies_docs(sf_dir: str):
    """Global top-100 word bigrams (collocation counts): combiner →
    bucket fold → sort/limit."""
    from ..stages.relational import ngram_frequencies
    return ngram_frequencies(_read(sf_dir, "documents",
                                   columns=["doc_id", "text"]), n=2, k=100)


TPCH_Q3_CUTOFF = np.datetime64("1998-06-30T00:00:00", "us")


def tpch_q3_revenue(sf_dir: str):
    """Shipping-priority-style 3-table join (customer ⋈ orders ⋈
    lineitem): segment filter → broadcast semi-join into orders → date
    filters → per-batch revenue combiner on lineitem → grouped sum →
    broadcast order-date attach → sort/limit.  The two dimension
    broadcasts are size-bounded by segment+date selectivity; beyond the
    gate the semi-join flips to the tag-union shuffle
    (``joins.semi_join_keys``)."""
    from ..stages.joins import _broadcast_cache
    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_mktsegment"])
    building = set(cust.filter(
        pc.equal(cust.column("c_mktsegment"), "BUILDING"))
        .column("c_custkey").to_pylist())
    cutoff = pa.scalar(TPCH_Q3_CUTOFF)

    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_custkey", "o_orderdate"])
    date_by_order: dict[int, int] = {}
    for b in orders.iter_batches(batch_size=65536, batch_format="pyarrow"):
        b = b.filter(pc.and_(pc.less(b.column("o_orderdate"), cutoff),
                             pc.is_in(b.column("o_custkey"),
                                      value_set=pa.array(
                                          sorted(building), pa.int64()))))
        date_by_order.update(zip(
            b.column("o_orderkey").to_pylist(),
            pc.divide(b.column("o_orderdate").cast(pa.int64()),
                      1_000_000).to_pylist()))
    oref = ray.put(date_by_order)
    okeys_ref = ray.put(pa.array(sorted(date_by_order), pa.int64()))

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_extendedprice", "l_discount",
                        "l_shipdate"])

    def partial(batch: pa.Table) -> pa.Table:
        from ..stages.joins import _broadcast_value_array
        batch = batch.filter(pc.and_(
            pc.greater(batch.column("l_shipdate"), cutoff),
            pc.fill_null(pc.is_in(batch.column("l_orderkey"),
                                  value_set=_broadcast_value_array(
                                      okeys_ref)), False)))
        rev = pc.multiply(batch.column("l_extendedprice"),
                          pc.subtract(pa.scalar(1.0),
                                      batch.column("l_discount")))
        df = pa.table({"l_orderkey": batch.column("l_orderkey"),
                       "rev_cents": _cents(rev)}).to_pandas()
        g = df.groupby("l_orderkey", as_index=False)["rev_cents"].sum()
        g["rev_cents"] = g["rev_cents"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = (li.map_batches(partial, batch_format="pyarrow")
             .groupby("l_orderkey")
             .aggregate(Sum("rev_cents", alias_name="revenue_cents")))

    def attach(batch: pa.Table) -> pa.Table:
        dates = _broadcast_cache(oref)
        keys = batch.column("l_orderkey").to_pylist()
        return pa.table({
            "l_orderkey": batch.column("l_orderkey"),
            "revenue_cents": batch.column("revenue_cents").cast(pa.int64()),
            "o_orderdate_epoch": pa.array([dates[k] for k in keys],
                                          pa.int64())})

    out = agg.map_batches(attach, batch_format="pyarrow")
    return (out.sort(["revenue_cents", "l_orderkey"],
                     descending=[True, False]).limit(10))


def sample_documents(sf_dir: str):
    """Deterministic hash sample (1 of 5 id-buckets, ~20%) with a
    per-language aggregate — resumable sampling (same rows every run,
    unlike random_shuffle) composed from hash_split."""
    from ..stages.relational import hash_split
    docs = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])
    tagged = hash_split(docs, "doc_id", n_buckets=5, train_buckets=1)

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("split"), "train"))
        stats = token_stats_batch(t)
        df = pa.table({"lang": stats.column("lang"),
                       "n_tokens": stats.column("n_tokens")}).to_pandas()
        g = (df.groupby("lang", as_index=False)
               .agg(n_docs=("n_tokens", "size"),
                    n_tokens=("n_tokens", "sum")))
        g["n_docs"] = g["n_docs"].astype(np.int64)
        g["n_tokens"] = g["n_tokens"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    return (tagged.map_batches(partial, batch_format="pyarrow")
                  .groupby("lang")
                  .aggregate(Sum("n_docs", alias_name="n_docs"),
                             Sum("n_tokens", alias_name="n_tokens")))


def events_value_quantiles(sf_dir: str):
    """Distributed EXACT discrete quantiles of events.value (sort +
    rank-split; sketch is the 100-TB path, this is its oracle)."""
    from ..stages.relational import exact_quantiles
    events = _read(sf_dir, "events", columns=["value"])
    return exact_quantiles(events, "value", [0.25, 0.5, 0.9, 0.99])


def events_value_quantiles_kmv(sf_dir: str):
    """Deterministic APPROXIMATE quantiles: quantile_disc over the
    bottom-k (k=500) md5 sample — the oracled companion of the
    rows-only mergeable sketch (a deterministic sample makes the
    approximation itself SQL-exact; rank error vs the exact quantiles
    is pinned in pytest)."""
    from ..stages.relational import bottom_k_sample, exact_quantiles
    events = _read(sf_dir, "events", columns=["event_id", "value"])
    samp = bottom_k_sample(events, "event_id", k=500)
    return exact_quantiles(samp, "value", [0.25, 0.5, 0.9, 0.99])


def pack_documents(sf_dir: str):
    """GPT-style sequence packing over the documents table: token counts
    → distributed exclusive prefix sum (concat layout) → fixed 2048-token
    sequence assignment.  Exact at any parallelism; SQL-oracled via a
    window cumsum."""
    from ..stages.relational import pack_sequences
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    counted = (docs.map_batches(token_stats_batch, batch_format="pyarrow")
                   .select_columns(["doc_id", "n_tokens"]))
    return pack_sequences(counted, "doc_id", "n_tokens", seq_len=2048)


def events_value_quantiles_sketch(sf_dir: str):
    """DETERMINISTIC mergeable quantile sketch: integer-cents histogram
    CDF (sketches.histogram_quantiles).  Bin counts SUM and bin maxima
    MAX — order-free partials, so unlike the compaction-based
    QuantileSketch the result is bit-identical under ANY merge tree,
    which is what lets this be SQL-oracled EXACTLY (integer bin width,
    integer ceil rank — the KMV-oracle pattern).  Quantiles are exact
    rationals so the rank target is integer on both sides."""
    from ..stages.sketches import histogram_quantiles
    events = _read(sf_dir, "events", columns=["value"])
    return histogram_quantiles(events, "value",
                               [(1, 4), (1, 2), (9, 10), (99, 100)])


def multimodal_decode(sf_dir: str):
    """Fake-image decode + feature plumbing (SQL-oracled: planted FKIM
    payloads are 16x12 and must all decode).  Items are generated
    distributed — ``ray.data.range`` + map, not a driver-side list."""
    from ..stages.multimodal import (ByteHistogramFeatures, DecodeImage,
                                     fake_image_bytes)
    n = max(32, _read(sf_dir, "documents", columns=["doc_id"]).count() // 4)

    def gen(batch: dict) -> pa.Table:
        ids = [int(i) for i in batch["id"]]
        return pa.table({
            "item_id": pa.array(ids, pa.int64()),
            "content": pa.array([fake_image_bytes(16, 12, seed=i)
                                 for i in ids], pa.binary())})

    ds = (ray.data.range(n, override_num_blocks=max(2, n // 64))
          .map_batches(gen, batch_format="numpy"))
    ds = ds.map_batches(DecodeImage, batch_format="pyarrow", batch_size=64,
                        concurrency=(1, 2))
    ds = ds.map_batches(ByteHistogramFeatures, batch_format="pyarrow",
                        batch_size=64, concurrency=(1, 2))
    return ds.select_columns(["item_id", "width", "height", "decode_ok"])


# ---------------------------------------------------------------------------
# round-3 training-data operators
# ---------------------------------------------------------------------------


def repetition_stats_docs(sf_dir: str):
    """Gopher-style repetition quality signals (dup-line fraction,
    top-bigram fraction) — one streaming vectorized pass."""
    from ..functions.textstats import repetition_stats_batch
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return (docs.map_batches(repetition_stats_batch, batch_format="pyarrow")
                .select_columns(["doc_id", "n_lines", "n_dup_lines",
                                 "dup_line_frac", "top_bigram_frac"]))


def decontaminate_docs(sf_dir: str):
    """Benchmark decontamination: docs with ``doc_id % 97 == 0`` play
    the held-out test set; every remaining doc is flagged when it shares
    any word 5-gram with the benchmark.  Benchmark gram set broadcast
    once; corpus side streams, zero shuffle."""
    from ..stages.decontam import benchmark_ngram_set, flag_contaminated
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def _split(keep_bench: bool):
        def f(t: pa.Table) -> pa.Table:
            ids = t.column("doc_id").to_numpy(zero_copy_only=False)
            is_bench = (ids % 97) == 0
            return t.filter(pa.array(is_bench if keep_bench
                                     else ~is_bench))
        return f

    grams = benchmark_ngram_set(docs.map_batches(
        _split(True), batch_format="pyarrow"), n=5)
    rest = docs.map_batches(_split(False), batch_format="pyarrow")
    return (flag_contaminated(rest, grams, n=5)
            .select_columns(["doc_id", "n_hits", "contaminated"]))


def doc_frequencies_docs(sf_dir: str):
    """Document-frequency table (token, df, tf) — top 100 by df."""
    from ..stages.relational import doc_frequencies
    docs = _read(sf_dir, "documents", columns=["text"])
    return doc_frequencies(docs, k=100)


def embedding_quantize_int8(sf_dir: str):
    """Scalar int8 quantization of the embeddings (the ANN-serving
    memory compression, 4 bytes/dim → 1): per-dim min/max fold, then
    integer code assignment — vectors never shuffle.  The operator's
    native output is the packed ``codes`` list (the serving layout);
    this gate query flattens it to long ``(vec_id, dim, code)`` rows so
    the DuckDB oracle (unnest + per-dim min/max join) compares scalar
    columns."""
    from ..stages.ann import scalar_quantize_int8
    codes = scalar_quantize_int8(
        _read(sf_dir, "embeddings", columns=["vec_id", "embedding"]))

    def flatten(t: pa.Table) -> pa.Table:
        col = t.column("codes")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        n, d = len(col), col.type.list_size
        ids = t.column("vec_id").to_numpy(zero_copy_only=False)
        return pa.table({
            "vec_id": pa.array(np.repeat(ids, d), pa.int64()),
            "dim": pa.array(np.tile(np.arange(1, d + 1, dtype=np.int64),
                                    n), pa.int64()),
            "code": col.flatten()})

    return codes.map_batches(flatten,
                             batch_format="pyarrow").sort(["vec_id",
                                                           "dim"])


def events_drift_ks(sf_dir: str):
    """Distribution-drift monitor: per event type, the two-sample
    Kolmogorov-Smirnov statistic between the early and late halves of
    the stream (split at the midpoint of the time range).  The CDF gap
    is cross-multiplied so the max is integer-exact; ``ks_stat`` is one
    IEEE division on identical operands both sides."""
    from ..stages.relational import grouped_ks_drift
    ev = _read(sf_dir, "events", columns=["event_type", "value", "ts"])
    return grouped_ks_drift(ev, "event_type", "value",
                            "ts").sort("event_type")


def inverted_index_docs(sf_dir: str):
    """Postings-list construction over the documents table:
    ``(token, df, postings)`` with postings = ascending comma-joined
    doc ids.  One token-bucketed exchange of distinct (token, doc_id)
    pairs; text never shuffles.  SQL-oracled via DISTINCT-unnest +
    ordered string_agg."""
    from ..stages.retrieval import inverted_index
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return inverted_index(docs).sort("token")


def docs_above_p90(sf_dir: str):
    """Quantile-threshold curation: keep docs whose whitespace-token
    count exceeds the corpus P90.  Composes the distributed exact
    quantile (one sort, rank-rows-only fetch) with a broadcast-scalar
    filter; the token-count pass streams twice (once under the sort,
    once under the filter) — at 100 TB the first pass's output is the
    thing to checkpoint, or swap in the mergeable quantile sketch."""
    from ..stages.relational import exact_quantiles
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    stats = (docs.map_batches(token_stats_batch, batch_format="pyarrow")
                 .select_columns(["doc_id", "n_tokens"]))
    thr = int(exact_quantiles(stats, "n_tokens",
                              [0.9]).column("value")[0].as_py())
    return stats.map_batches(
        lambda t: t.filter(pc.greater(t.column("n_tokens"), thr)),
        batch_format="pyarrow")


def dedup_keep_best(sf_dir: str):
    """End-to-end near-dedup curation: exact-ngram pair graph →
    connected components → keep the highest-token-count doc per cluster
    (tie: smallest doc_id).  The grouped argmax runs on ONE coarse
    bucket shuffle of the (tiny) per-doc stat rows — never on text."""
    from ..stages.dedup import dedup_clusters
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    pairs = ngram_jaccard_pairs(docs, threshold=0.5)
    stats = (docs.map_batches(token_stats_batch, batch_format="pyarrow")
                 .select_columns(["doc_id", "n_tokens"]))
    tagged = dedup_clusters(stats, pairs, keep_cols=["n_tokens"])

    def bucket(t: pa.Table) -> pa.Table:
        return t.append_column(
            "_bucket", pc.cast(pc.bit_wise_and(t.column("cluster_id"), 255),
                               pa.int64()))

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cluster_id", "n_tokens", "doc_id"],
                          ascending=[True, False, True], kind="mergesort")
        sizes = g.groupby("cluster_id", sort=False).size()
        best = g.drop_duplicates("cluster_id", keep="first")
        return pd.DataFrame({
            "cluster_id": best["cluster_id"].to_numpy(np.int64),
            "kept_doc_id": best["doc_id"].to_numpy(np.int64),
            "kept_tokens": best["n_tokens"].to_numpy(np.int64),
            "n_members": sizes.loc[best["cluster_id"]].to_numpy(np.int64)})

    return (tagged.map_batches(bucket, batch_format="pyarrow")
                  .groupby("_bucket")
                  .map_groups(fold, batch_format="pandas"))


def events_attribution_range(sf_dir: str):
    """Attribution-style range join: for every 'click' event, all
    'purchase' events by the same user within the following 6 hours.
    ONE (key, time-bucket) co-partitioned shuffle; the purchase side
    lands in exactly one bucket, clicks replicate <= 2x — see
    relational.range_join."""
    from ..stages.relational import range_join
    ev = _read(sf_dir, "events",
               columns=["event_id", "ts", "user_id", "event_type",
                        "value"])

    def clicks(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("event_type"), "click"))
        return t.select(["event_id", "user_id", "ts"])

    def purchases(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("event_type"), "purchase"))
        cents = _cents(t.column("value"))   # half-away-from-zero (DuckDB)
        return pa.table({"event_id": t.column("event_id"),
                         "user_id": t.column("user_id"),
                         "ts": t.column("ts"),
                         "purchase_cents": cents})

    out = range_join(ev.map_batches(clicks, batch_format="pyarrow"),
                     ev.map_batches(purchases, batch_format="pyarrow"),
                     key="user_id", left_ts="ts", right_ts="ts",
                     right_vals=["event_id", "purchase_cents"],
                     lo_us=0, hi_us=6 * 3600 * 10**6)
    return out.select_columns(["event_id", "user_id", "event_id_r",
                               "purchase_cents_r"])


def distinctive_term_docs(sf_dir: str):
    """Per-document most DISTINCTIVE term: the in-doc token with the
    smallest global document frequency (ties: higher in-doc count, then
    token asc) — the integer-exact core of TF-IDF scoring (rarest-term
    argmax needs no float idf, so the oracle stays bit-exact).

    Dataflow: ONE bucket fold builds the global (token, df) table
    (`relational.doc_frequencies`); the vocabulary broadcasts once via
    ``ray.put``; every batch then resolves its per-doc argmax locally
    (documents never span rows) — no second shuffle.  Driver/broadcast
    bound: the corpus vocabulary (documented; at open-vocabulary 100-TB
    scale ship the df table through the existing tag-union join
    instead)."""
    from ..stages.joins import _broadcast_cache
    from ..stages.relational import doc_frequencies
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    df_map: dict = {}
    for t in doc_frequencies(docs, k=None).iter_batches(
            batch_size=65536, batch_format="pyarrow"):
        df_map.update(zip(t.column("token").to_pylist(),
                          t.column("df").to_pylist()))
    ref = ray.put(df_map)

    def argmax(t: pa.Table) -> pa.Table:
        dfm = _broadcast_cache(ref)
        col = t.column("text")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        lists = pc.split_pattern_regex(pc.fill_null(col, ""),
                                       pattern="[ \t\n\f\r]+")
        nl = pc.list_value_length(lists).to_numpy(zero_copy_only=False)
        rows = np.repeat(np.arange(len(t), dtype=np.int64), nl)
        flat = lists.flatten()
        keep = pc.greater(pc.utf8_length(flat), 0).to_numpy(
            zero_copy_only=False)
        toks = np.asarray(flat.to_pylist(), dtype=object)[keep]
        rows = rows[keep]
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        if not len(toks):
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "term": pa.array([], pa.string()),
                             "df": pa.array([], pa.int64()),
                             "tf": pa.array([], pa.int64())})
        d = (pd.DataFrame({"r": rows, "t": toks})
               .groupby(["r", "t"], as_index=False).size()
               .rename(columns={"size": "tf"}))
        d["df"] = d["t"].map(dfm)
        d = d.sort_values(["r", "df", "tf", "t"],
                          ascending=[True, True, False, True],
                          kind="mergesort").drop_duplicates("r")
        return pa.table({
            "doc_id": pa.array(ids[d["r"].to_numpy()], pa.int64()),
            "term": pa.array(d["t"].to_numpy(object), pa.string()),
            "df": pa.array(d["df"].to_numpy(np.int64), pa.int64()),
            "tf": pa.array(d["tf"].to_numpy(np.int64), pa.int64())})

    return docs.map_batches(argmax, batch_format="pyarrow")


def multimodal_audio_energy(sf_dir: str):
    """Audio decode + integer-exact features (FKAU formulaic PCM —
    SQL-oracled because every int16 sample is re-derivable): items are
    generated distributed, decoded by an actor pool, and summarized as
    (n_samples, energy, peak)."""
    from ..stages.multimodal import DecodeAudio, fake_audio_bytes
    n = max(32, _read(sf_dir, "documents", columns=["doc_id"]).count() // 4)

    def gen(batch: dict) -> pa.Table:
        ids = [int(i) for i in batch["id"]]
        return pa.table({
            "item_id": pa.array(ids, pa.int64()),
            "content": pa.array([fake_audio_bytes(i) for i in ids],
                                pa.binary())})

    ds = (ray.data.range(n, override_num_blocks=max(2, n // 64))
          .map_batches(gen, batch_format="numpy"))
    ds = ds.map_batches(DecodeAudio, batch_format="pyarrow", batch_size=64,
                        concurrency=(1, 2))
    return ds.select_columns(["item_id", "n_samples", "energy", "peak",
                              "decode_ok"])


def multimodal_frame_sample(sf_dir: str):
    """Video decode + frame sampling (FKVD formulaic pixels — the FKAU
    trick, so SQL re-derives every sampled frame's features): items are
    generated distributed, an actor pool decodes and emits one row per
    sampled frame (every 5th) with integer-exact (frame_sum,
    frame_max)."""
    from ..stages.multimodal import SampleFrames, fake_video_bytes
    n = max(24, _read(sf_dir, "documents", columns=["doc_id"]).count() // 8)

    def gen(batch: dict) -> pa.Table:
        ids = [int(i) for i in batch["id"]]
        return pa.table({
            "item_id": pa.array(ids, pa.int64()),
            "content": pa.array([fake_video_bytes(i) for i in ids],
                                pa.binary())})

    ds = (ray.data.range(n, override_num_blocks=max(2, n // 32))
          .map_batches(gen, batch_format="numpy"))
    return ds.map_batches(SampleFrames, batch_format="pyarrow",
                          batch_size=32, concurrency=(1, 2),
                          fn_constructor_kwargs={"every_n": 5})


def dsir_weights_docs(sf_dir: str):
    """DSIR-style importance weights for mixture construction: target =
    English docs, background = full corpus, md5-hashed 256-bucket
    unigram LM with add-1 smoothing; per-bucket log-ratios quantized to
    integer nano-units so document scores are ORDER-FREE INTEGER SUMS —
    the oracle matches hash-exactly (no BM25-style rank gate needed)."""
    from ..stages.retrieval import importance_weights
    docs = _read(sf_dir, "documents", columns=["doc_id", "lang", "text"])
    return importance_weights(docs, "lang", "en").sort("doc_id")


def pdf_extract_docs(sf_dir: str):
    """PDF source loader through the vendored minimal extractor
    (reference ``document_loaders/pdf.py:26-37`` shape: one row per
    page): deterministic two-page PDFs (page 2 Flate-compressed) are
    written to a scratch dir, read back via the real path-based loader,
    and every extracted line is re-derived by the SQL oracle from the
    formulaic text.  PDF synthesis is driver-side test scaffolding
    (n≈dozens); the loader dataflow is the distributed part."""
    import os
    import shutil

    from ..functions.pdf_text import make_simple_pdf
    from ..sources.loaders import read_pdf_source
    n = max(12, _read(sf_dir, "documents", columns=["doc_id"]).count() // 40)
    d = "/tmp/kgforge_gate_pdfs"
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d)
    paths = []
    for i in range(n):
        page1 = [f"Doc {i} alpha", f"line two {i * 7 % 13}"]
        page2 = [f"Doc {i} beta (compressed)"]
        p = os.path.join(d, f"doc-{i:05d}.pdf")
        with open(p, "wb") as fh:
            fh.write(make_simple_pdf([page1, page2], compress={1}))
        paths.append(p)
    out = read_pdf_source(paths)
    return out.sort(["doc_path", "doc_index"])


def curate_training_docs(sf_dir: str):
    """FULL training-corpus curation chain — the pipeline a pretraining
    corpus runs end-to-end: benchmark decontamination (broadcast 5-gram
    set) → language gate → repetition gates (dup-line / top-bigram) →
    token-count band → exact dedup keeping the smallest id.  One corpus
    stream + the single dedup exchange; every stage is the composable
    form of an individually-oracled operator."""
    from ..stages.decontam import benchmark_ngram_set, flag_contaminated
    from ..functions.textstats import repetition_stats_batch
    docs = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])

    def _split(keep_bench: bool):
        def f(t: pa.Table) -> pa.Table:
            ids = t.column("doc_id").to_numpy(zero_copy_only=False)
            is_bench = (ids % 97) == 0
            return t.filter(pa.array(is_bench if keep_bench
                                     else ~is_bench))
        return f

    grams = benchmark_ngram_set(docs.map_batches(
        _split(True), batch_format="pyarrow"), n=5)
    flagged = flag_contaminated(
        docs.map_batches(_split(False), batch_format="pyarrow"),
        grams, n=5)

    def gates(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.invert(t.column("contaminated")),
                             pc.equal(t.column("lang"), "en")))
        t = repetition_stats_batch(t)
        t = token_stats_batch(t)
        keep = pc.and_(
            pc.and_(pc.greater_equal(t.column("n_tokens"), 30),
                    pc.less_equal(t.column("n_tokens"), 2000)),
            pc.and_(pc.less_equal(t.column("dup_line_frac"), 0.5),
                    pc.less(t.column("top_bigram_frac"), 0.2)))
        return t.filter(keep).select(["doc_id", "text"])

    kept = exact_dedup(flagged.map_batches(gates, batch_format="pyarrow"))

    def finish(t: pa.Table) -> pa.Table:
        stats = token_stats_batch(t)
        return pa.table({"doc_id": stats.column("doc_id"),
                         "n_dups": stats.column("n_dups"),
                         "n_tokens": stats.column("n_tokens")})

    return kept.map_batches(finish, batch_format="pyarrow")


def events_sessionize_streaming(sf_dir: str):
    """The STREAMING form of events_sessionize: watermark-driven
    incremental session emission from key-partitioned stateful actors
    (stages/streaming.py) — identical output to the batch operator, so
    it shares its exact SQL oracle."""
    from ..stages.streaming import streaming_sessionize
    events = _read(sf_dir, "events", columns=["event_id", "ts", "user_id"])
    return streaming_sessionize(events)


def events_value_percent_rank(sf_dir: str):
    """percent_rank of each event's value within its event type."""
    from ..stages.windows import grouped_percent_rank
    events = _read(sf_dir, "events",
                   columns=["event_id", "event_type", "value"])
    return grouped_percent_rank(events, "event_type", "value", "event_id")


def events_user_sequence(sf_dir: str):
    """Per-user ordered sequence features: row_number, lag gap, running
    cents sum — three SQL window functions in one keyed pass."""
    from ..stages.windows import grouped_sequence_features
    events = _read(sf_dir, "events",
                   columns=["event_id", "user_id", "ts", "value"])
    return grouped_sequence_features(events, "user_id", "ts",
                                     "event_id", "value")


def _entity_page_mentions(sf_dir: str):
    """(url_hash, node_key) per entity mention — the per-record
    normalization (alias resolution, key rendering) is the same
    pytest-pinned pure-function transform the gate artifact uses; the
    distributed pair/degree machinery downstream is what the SQL
    oracles independently re-derive."""
    import pyarrow.compute as pc
    from .kg_build import KGBuildConfig, extract_mentions, read_pages
    from .oracle_export import MentionOracleRows
    corpus_dir, pages_path = pages_for_sf(sf_dir)
    with open(f"{corpus_dir}/ontology.json") as fh:
        ontology_json = fh.read()
    with open(f"{corpus_dir}/aliases.json") as fh:
        alias_map = json.load(fh)
    pages = read_pages(pages_path)
    mentions = extract_mentions(pages, KGBuildConfig(
        ontology_json=ontology_json))
    fn = MentionOracleRows(ontology_json, alias_map)

    def markers(t):
        t = fn(t)
        mask = pc.and_(pc.equal(t.column("kind"), "entity"),
                       pc.equal(t.column("attr"), ""))
        return t.filter(mask).select(["url_hash", "node_key"])

    return mentions.map_batches(markers, batch_format="pyarrow")


def kg_cooccurrence(sf_dir: str):
    """Entity co-mention pair weights over the page corpus (distinct
    pages mentioning both entities; unordered pairs src_key < dst_key)."""
    from ..stages.graph import entity_cooccurrence
    _ensure_gate_artifact(sf_dir)
    return entity_cooccurrence(_entity_page_mentions(sf_dir),
                               "url_hash", "node_key")


def kg_degree(sf_dir: str):
    """Per-node in/out/total degree of the built KG edge table."""
    from ..stages.graph import degree_table
    _ensure_gate_artifact(sf_dir)
    return degree_table(_kg_result(sf_dir).edges)


def kg_pagerank(sf_dir: str):
    """Fixed-point damped PageRank over the built KG.  Integer
    arithmetic makes the distributed result bit-exact and therefore
    DuckDB-oracle-able (the gate mirrors the identical recurrence as
    an unrolled CTE chain over the exported mention artifact); the
    float ``pagerank`` column is ``pr_fixed / 2^40``, exactly
    representable on both sides.  Ranking parity vs the float
    :func:`kgforge.stages.graph.pagerank` is pinned in pytest."""
    from ..stages.graph import pagerank_fixed
    _ensure_gate_artifact(sf_dir)
    return pagerank_fixed(_kg_result(sf_dir).edges, n_iter=20)


def kg_hits(sf_dir: str):
    """Fixed-point HITS hubs/authorities over the built KG — integer
    L1-normalized half-steps make the distributed result bit-exact and
    DuckDB-oracle-able (unrolled CTE chain, HUGEINT-safe sums); the
    float hub/authority columns are exact dyadics (fixed / 2^20)."""
    from ..stages.graph import hits_fixed
    _ensure_gate_artifact(sf_dir)
    return hits_fixed(_kg_result(sf_dir).edges, n_iter=5)


def kg_hits_distributed(sf_dir: str):
    """Forced keyed-Dataset scale path of :func:`kg_hits` — no
    node-sized driver vector; gated against the SAME oracle (the two
    paths are bit-identical, also pinned in pytest)."""
    from ..stages.graph import hits_fixed
    _ensure_gate_artifact(sf_dir)
    return hits_fixed(_kg_result(sf_dir).edges, n_iter=5,
                      mode="distributed")


def kg_components(sf_dir: str):
    """Undirected connected components of the built KG (component_id =
    min reachable node id) — distributed min-label propagation."""
    from ..stages.graph import connected_components
    _ensure_gate_artifact(sf_dir)
    return connected_components(_kg_result(sf_dir).edges)


def customer_events_left_join(sf_dir: str):
    """Customers LEFT OUTER JOIN their per-user event rollup: every
    customer survives; the ~90% without events get zero-filled activity
    columns.  Exercises the general size-gated 1:N left join
    (stages/joins.left_outer_join) on its shuffle path — the broadcast
    path is parity-tested in tests/test_round3_ops.py."""
    from ..stages.joins import left_outer_join
    customers = _read(sf_dir, "customer",
                      columns=["c_custkey", "c_mktsegment"])
    events = _read(sf_dir, "events", columns=["user_id", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table({"user_id": batch.column("user_id"),
                         "value_cents": _cents(batch.column("value"))})

    agg = (events.map_batches(prep, batch_format="pyarrow")
                 .groupby("user_id")
                 .aggregate(Count(alias_name="n_events"),
                            Sum("value_cents", alias_name="sum_cents")))
    joined = left_outer_join(customers, agg, "c_custkey", "user_id",
                             ["n_events", "sum_cents"],
                             strategy="join", suffix="")

    def fill(t: pa.Table) -> pa.Table:
        return pa.table({
            "c_custkey": t.column("c_custkey"),
            "c_mktsegment": t.column("c_mktsegment"),
            "n_events": pc.fill_null(t.column("n_events"), 0)
                          .cast(pa.int64()),
            "sum_cents": pc.fill_null(t.column("sum_cents"), 0)
                           .cast(pa.int64())})

    return joined.map_batches(fill, batch_format="pyarrow")


def events_value_ntile(sf_dir: str):
    """ntile(4) of each event's value within its event type (value +
    event_id deterministic ordering)."""
    from ..stages.windows import grouped_ntile
    events = _read(sf_dir, "events",
                   columns=["event_id", "event_type", "value"])
    return grouped_ntile(events, "event_type", "value", "event_id", 4)


def line_dedup_docs(sf_dir: str):
    """CCNet-style corpus-wide line dedup over documents: strip every
    line that appears more than once across the corpus (web
    boilerplate removal).  SQL-oracled: split/unnest + global count +
    order-preserving string_agg rebuild."""
    from ..stages.dedup import line_dedup
    return line_dedup(_read(sf_dir, "documents",
                            columns=["doc_id", "text"]))


def dedup_span_docs(sf_dir: str):
    """Exact duplicate-SPAN removal over documents (Lee et al. 2022
    ExactSubstr): strip every token covered by a word 5-gram occurring
    >= 2 times corpus-wide.  SQL-oracled: the oracle re-derives
    positional 5-grams with a windowed string_agg, counts them
    globally, and rebuilds the covered-token-free text with an
    order-preserving string_agg."""
    from ..stages.dedup import span_dedup
    return span_dedup(_read(sf_dir, "documents",
                            columns=["doc_id", "text"])).sort("doc_id")


def _loader_fixture(sf_dir: str, ext: str) -> str:
    """Deterministic loader fixture derived from the documents table
    (one line per doc, ordered by doc_id) so the reference loader
    quirks (remainder-drop chunking, ``loaders.py:75-87``; reference
    ``csv.py:19-31`` / ``jsonl.py:14-27``) are externally verifiable:
    the oracle re-derives the same lines from the ``documents`` view
    and mirrors the chunk arithmetic in SQL."""
    import os
    docs = (_read(sf_dir, "documents", columns=["doc_id", "lang"])
            .to_pandas().sort_values("doc_id"))
    os.makedirs("/tmp/kgforge_gate/loader", exist_ok=True)
    tag = os.path.basename(os.path.normpath(sf_dir))
    path = f"/tmp/kgforge_gate/loader/{tag}.{ext}"
    with open(path, "w") as fh:
        for did, lang in zip(docs["doc_id"], docs["lang"]):
            if ext == "csv":
                fh.write(f"doc,{did},{lang}\n")
            else:
                fh.write('{"doc_id": %d, "lang": "%s"}\n' % (did, lang))
    return path


def csv_loader_chunks(sf_dir: str):
    """Reference CSV loader semantics end-to-end: rows re-joined with
    commas, 7 rows per document, the trailing partial chunk DROPPED
    (the reference's floor-division quirk, ``csv.py:19-31``) — the
    oracle mirrors the chunk arithmetic over the documents view with
    row_number // 7 + a full-chunk filter."""
    from ..sources.loaders import read_csv_source
    path = _loader_fixture(sf_dir, "csv")
    return (read_csv_source(path, rows_per_document=7)
            .select_columns(["doc_index", "content"]))


def jsonl_loader_chunks(sf_dir: str):
    """Reference JSONL loader semantics end-to-end: raw lines keep
    their newline terminators (``readlines`` quirk) and are joined
    with another newline, 7 lines per document, remainder dropped."""
    from ..sources.loaders import read_jsonl_source
    path = _loader_fixture(sf_dir, "jsonl")
    return (read_jsonl_source(path, rows_per_document=7)
            .select_columns(["doc_index", "content"]))


def domain_stats_pages(sf_dir: str):
    """Per-(host, section) page counts and character volume over the
    CC-style pages corpus — the domain-level quality/size priors a
    web-curation pass aggregates before sampling.  Vectorized arrow
    regex url parsing (functions/web.py), per-batch combiner, one tiny
    bucket fold; the oracle mirrors the regex over the exported pages
    artifact."""
    import zlib as _z

    from ..functions.web import url_host_section
    _ensure_gate_pages(sf_dir)
    _, pages_path = pages_for_sf(sf_dir)
    pages = ray.data.read_parquet(pages_path, columns=["url", "text"])

    def partial(t: pa.Table) -> pa.Table:
        host, sec, ok = url_host_section(t.column("url"))
        tt = pa.table({"host": host, "section": sec,
                       "chars": pc.utf8_length(t.column("text"))
                       .cast(pa.int64())}).filter(ok)
        df = tt.to_pandas()
        agg = (df.groupby(["host", "section"], as_index=False)
                 .agg(n=("chars", "size"), s=("chars", "sum")))
        b = [_z.crc32(f"{h}\x1f{x}".encode()) % 16
             for h, x in zip(agg["host"], agg["section"])]
        return pa.table({
            "host": pa.array(agg["host"], pa.string()),
            "section": pa.array(agg["section"], pa.string()),
            "n": pa.array(agg["n"].to_numpy(np.int64), pa.int64()),
            "s": pa.array(agg["s"].to_numpy(np.int64), pa.int64()),
            "_b": pa.array(b, pa.int64())})

    def fold(g: pd.DataFrame) -> pa.Table:
        agg = (g.groupby(["host", "section"], as_index=False)
                .agg(n=("n", "sum"), s=("s", "sum")))
        return pa.table({
            "host": pa.array(agg["host"], pa.string()),
            "section": pa.array(agg["section"], pa.string()),
            "n_pages": pa.array(agg["n"].to_numpy(np.int64), pa.int64()),
            "sum_chars": pa.array(agg["s"].to_numpy(np.int64),
                                  pa.int64())})

    return (pages.map_batches(partial, batch_format="pyarrow")
                 .groupby("_b")
                 .map_groups(fold, batch_format="pandas"))


def domain_cap_pages(sf_dir: str):
    """Per-(host, section) document cap — keep at most 40 pages per
    section in deterministic md5(url) order (the unbiased per-domain
    downsample that stops giant hosts dominating a training mix).
    Built on the generic :func:`kgforge.stages.relational.grouped_limit`
    (in-batch combiner bounds shuffle volume to k rows per key per
    block); oracle = QUALIFY row_number() <= k over the exported
    pages."""
    import hashlib as _h

    from ..functions.web import url_host_section
    from ..stages.relational import grouped_limit
    _ensure_gate_pages(sf_dir)
    _, pages_path = pages_for_sf(sf_dir)
    pages = ray.data.read_parquet(pages_path, columns=["url"])

    def prep(t: pa.Table) -> pa.Table:
        host, sec, ok = url_host_section(t.column("url"))
        tt = pa.table({"url": t.column("url"), "host": host,
                       "section": sec}).filter(ok)
        key = pc.binary_join_element_wise(tt.column("host"),
                                          tt.column("section"), "\x1f")
        ordh = [_h.md5(u.encode()).hexdigest()
                for u in tt.column("url").to_pylist()]
        return tt.append_column("key", key).append_column(
            "ord", pa.array(ordh, pa.string()))

    capped = grouped_limit(pages.map_batches(prep, batch_format="pyarrow"),
                           "key", "ord", k=40)
    return capped.select_columns(["url", "host", "section"])


def url_canonical_pages(sf_dir: str):
    """URL canonicalization (crawl dedup's first line of defense):
    deterministic noisy variants of every page url (tracking params,
    WWW/case, default port, trailing slash, fragments — variant chosen
    by md5(url) so the oracle re-derives it) are normalized back by the
    vectorized canonicalizer; the oracle mirrors every rule in SQL with
    the SAME RE2 pattern."""
    import hashlib as _h

    from ..functions.web import canonicalize_url
    _ensure_gate_pages(sf_dir)
    _, pages_path = pages_for_sf(sf_dir)
    pages = ray.data.read_parquet(pages_path, columns=["url"])

    def mutate_and_canon(t: pa.Table) -> pa.Table:
        urls = t.column("url").to_pylist()
        variants, kinds = [], []
        for u in urls:
            k = int(_h.md5(u.encode()).hexdigest()[:2], 16) % 6
            if k == 0:
                v = u + "?utm_source=news&b=2&a=1#top"
            elif k == 1:
                v = u.replace("https://", "https://www.")
            elif k == 2:
                v = u.replace("https://fixture.test",
                              "https://FIXTURE.TEST:443")
            elif k == 3:
                v = u + "/"
            elif k == 4:
                v = u + "?z=1&a=2&utm_campaign=c&gclid=g"
            else:
                v = u + "#section-2"
            variants.append(v)
            kinds.append(k)
        canon, ok = canonicalize_url(pa.array(variants, pa.string()))
        return pa.table({"url": t.column("url"),
                         "variant": pa.array(variants, pa.string()),
                         "kind": pa.array(kinds, pa.int64()),
                         "canonical": canon,
                         "matched": ok})

    return pages.map_batches(mutate_and_canon,
                             batch_format="pyarrow").sort("url")


def dedup_url_pages(sf_dir: str):
    """Crawl URL-level dedup (the cheapest dedup pass, run before any
    content hashing): the page urls UNION their deterministic noisy
    variants (same md5-kind rule as ``url_canonical_pages``) collapse
    onto canonical urls — keep the lexicographically-smallest raw url
    per canonical plus the collapse count.  Only (canonical, min-raw,
    count) combiner rows ride the one exchange; SQL re-derives the
    variants, every canonicalization rule, and the group fold."""
    import hashlib as _h

    from ..functions.web import canonicalize_url
    from ..stages.joins import str_bucket
    _ensure_gate_pages(sf_dir)
    _, pages_path = pages_for_sf(sf_dir)
    pages = ray.data.read_parquet(pages_path, columns=["url"])

    def explode(t: pa.Table) -> pa.Table:
        urls = t.column("url").to_pylist()
        variants = []
        for u in urls:
            k = int(_h.md5(u.encode()).hexdigest()[:2], 16) % 6
            if k == 0:
                v = u + "?utm_source=news&b=2&a=1#top"
            elif k == 1:
                v = u.replace("https://", "https://www.")
            elif k == 2:
                v = u.replace("https://fixture.test",
                              "https://FIXTURE.TEST:443")
            elif k == 3:
                v = u + "/"
            elif k == 4:
                v = u + "?z=1&a=2&utm_campaign=c&gclid=g"
            else:
                v = u + "#section-2"
            variants.append(v)
        raws = urls + variants
        canon, _ok = canonicalize_url(pa.array(raws, pa.string()))
        df = pd.DataFrame({"canonical": canon.to_pylist(), "raw": raws})
        g = (df.groupby("canonical", as_index=False)
             .agg(kept_url=("raw", "min"), n_urls=("raw", "size")))
        return pa.table({
            "canonical": pa.array(g["canonical"], pa.string()),
            "kept_url": pa.array(g["kept_url"], pa.string()),
            "n_urls": pa.array(g["n_urls"].astype(np.int64),
                               pa.int64()),
            "bucket": pa.array(str_bucket(g["canonical"], 16),
                               pa.int64())})

    def fold(g: pd.DataFrame) -> pa.Table:
        if len(g) == 0 or "canonical" not in g.columns:
            return pa.table({
                "canonical": pa.array([], pa.string()),
                "kept_url": pa.array([], pa.string()),
                "n_urls": pa.array([], pa.int64())})
        gg = (g.groupby("canonical", as_index=False)
              .agg(kept_url=("kept_url", "min"),
                   n_urls=("n_urls", "sum")))
        return pa.table({
            "canonical": pa.array(gg["canonical"], pa.string()),
            "kept_url": pa.array(gg["kept_url"], pa.string()),
            "n_urls": pa.array(gg["n_urls"].astype(np.int64),
                               pa.int64())})

    return (pages.map_batches(explode, batch_format="pyarrow")
            .groupby("bucket").map_groups(fold, batch_format="pandas")
            .sort("canonical"))


_LINK_CATS = ("movies", "people", "news")


def _synth_link_html(urls: list[str], n_pages: int) -> list[str]:
    """Deterministic outlink fixture (same discipline as the url-variant
    and multimodal fixtures: synthesized IDENTICALLY in the engine and
    the SQL oracle, no external data): page url → 0-3 ``<a href>``
    anchors, target page index = md5(url:j) % n_pages, one anchor per
    line.  The corpus generator's html carries no links, so the link
    graph gets its own input layer."""
    import hashlib as _h
    out = []
    for u in urls:
        k = int(_h.md5(u.encode()).hexdigest()[:2], 16) % 4
        lines = []
        for j in range(k):
            d = int(_h.md5(f"{u}:{j}".encode()).hexdigest()[:15],
                    16) % n_pages
            lines.append(
                f'<a href="https://fixture.test/{_LINK_CATS[d % 3]}'
                f'/page-{d:06d}">link-{j}</a>')
        out.append("\n".join(lines))
    return out


_PAGE_NUM_RE = r"page-(?P<num>\d{6})"


def _web_link_edges_ds(sf_dir: str):
    """Page-level outlink edge list: synthesize the anchor fixture,
    extract hrefs with the vectorized RE2 kernel, map both endpoints
    to page ids.  All anchors of a src page live in ONE row, so the
    per-batch pair-distinct IS the global distinct — the edge build is
    a single embarrassingly-parallel pass with ZERO exchange."""
    from ..functions.web import extract_hrefs
    _ensure_gate_pages(sf_dir)
    _, pages_path = pages_for_sf(sf_dir)
    pages = ray.data.read_parquet(pages_path, columns=["url"])
    n_pages = pages.count()
    if n_pages > 10 ** 6:
        # the FIXTURE's 6-digit page-number format (url slug +
        # _PAGE_NUM_RE on both engine and oracle sides) caps this
        # synthetic graph at 10^6 pages; the operator itself
        # (extract_hrefs + distinct) has no such bound
        raise ValueError("web link fixture is defined for <= 1e6 pages")

    def links(t: pa.Table) -> pa.Table:
        urls = t.column("url").combine_chunks() \
            if isinstance(t.column("url"), pa.ChunkedArray) \
            else t.column("url")
        html = pa.array(_synth_link_html(urls.to_pylist(), n_pages),
                        pa.string())
        href, idx = extract_hrefs(html)
        src_url = pc.take(urls, idx)

        def page_id(col) -> pa.Array:
            return pc.cast(pc.struct_field(
                pc.extract_regex(col, _PAGE_NUM_RE), "num"), pa.int64())

        pairs = pa.table({"src_id": page_id(src_url),
                          "dst_id": page_id(href)})
        return pairs.group_by(["src_id", "dst_id"]).aggregate([])

    return pages.map_batches(links, batch_format="pyarrow")


def web_link_edges(sf_dir: str):
    """Host/page-level web link graph construction (outlink extraction
    → distinct (src, dst) page edges) — the Common-Crawl web-graph
    primitive the reference has no counterpart for.  The SQL oracle
    re-derives the anchor fixture with string_agg, extracts with
    ``regexp_extract_all`` over the SAME RE2 pattern, and re-maps urls
    to page ids."""
    return _web_link_edges_ds(sf_dir).sort(["src_id", "dst_id"])


def web_pagerank_pages(sf_dir: str):
    """Fixed-point PageRank over the extracted web link graph (the
    Google use case: host/page reputation from crawl structure) —
    composition external signal: link extraction feeds
    :func:`kgforge.stages.graph.pagerank_fixed`, and the oracle chains
    the link-edge SQL into the same unrolled integer CTE recurrence as
    ``kg_pagerank``."""
    from ..stages.graph import pagerank_fixed
    return pagerank_fixed(_web_link_edges_ds(sf_dir), n_iter=10)


def web_components(sf_dir: str):
    """Undirected weakly-connected components over the extracted web
    link graph (crawl-frontier / mirror-cluster analysis) — the same
    distributed min-label propagation as ``kg_components``, composed
    onto the link-extraction output; oracle = the recursive
    min-reachable CTE over the link-edge SQL."""
    from ..stages.graph import connected_components
    return connected_components(_web_link_edges_ds(sf_dir))


def web_section_rank(sf_dir: str):
    """Crawl-section reputation rollup: PageRank mass and page count
    per site section (the per-host/per-section quality prior used to
    steer crawl budgets).  Integer pr_fixed sums are order-free, so the
    composition (extract links → PageRank → rollup) stays bit-exact
    end-to-end."""
    from ..stages.graph import pagerank_fixed
    pr = pagerank_fixed(_web_link_edges_ds(sf_dir), n_iter=10)

    def partial(t: pa.Table) -> pa.Table:
        nid = t.column("node_id").to_numpy(zero_copy_only=False)
        sec = pc.take(pa.array(list(_LINK_CATS), pa.string()),
                      pa.array(nid % 3, pa.int64()))
        df = pd.DataFrame({"section": sec.to_pylist(),
                           "pr_fixed": t.column("pr_fixed").to_numpy(
                               zero_copy_only=False)})
        g = df.groupby("section", as_index=False).agg(
            n_pages=("pr_fixed", "size"), rank_mass=("pr_fixed", "sum"))
        return pa.table({
            "section": pa.array(g["section"], pa.string()),
            "n_pages": pa.array(g["n_pages"].to_numpy(np.int64),
                                pa.int64()),
            "rank_mass": pa.array(g["rank_mass"].to_numpy(np.int64),
                                  pa.int64())})

    def fold(g: pd.DataFrame) -> pa.Table:
        if len(g) == 0 or "section" not in g.columns:
            return pa.table({"section": pa.array([], pa.string()),
                             "n_pages": pa.array([], pa.int64()),
                             "rank_mass": pa.array([], pa.int64())})
        gg = g.groupby("section", as_index=False).agg(
            n_pages=("n_pages", "sum"), rank_mass=("rank_mass", "sum"))
        return pa.table({
            "section": pa.array(gg["section"], pa.string()),
            "n_pages": pa.array(gg["n_pages"].to_numpy(np.int64),
                                pa.int64()),
            "rank_mass": pa.array(gg["rank_mass"].to_numpy(np.int64),
                                  pa.int64())})

    return (pr.map_batches(partial, batch_format="pyarrow")
              .groupby("section").map_groups(fold, batch_format="pandas")
              .sort("section"))


def web_anchor_texts(sf_dir: str):
    """Inbound anchor-text aggregation per target page — the classic
    web-KG entity-linking signal (what OTHER pages call a url):
    ``(dst_id, n_inlinks, n_src_pages, anchors)`` with ``anchors`` =
    comma-joined DISTINCT anchor texts in ascending order.

    Shape: the two-group RE2 link extraction
    (:func:`kgforge.functions.web.extract_links`) runs per batch; ONE
    dst-bucketed exchange moves only (dst, src, anchor) short rows
    (html never shuffles); the per-bucket fold counts, distinct-counts
    sources and joins each target's sorted anchor vocabulary.  The SQL
    oracle re-derives the anchor fixture, extracts both regex groups
    with ``regexp_extract_all(snippet, LINK_RE, 1|2)`` and zips them
    positionally."""
    from ..functions.web import extract_links
    _ensure_gate_pages(sf_dir)
    _, pages_path = pages_for_sf(sf_dir)
    pages = ray.data.read_parquet(pages_path, columns=["url"])
    n_pages = pages.count()
    if n_pages > 10 ** 6:
        raise ValueError("web link fixture is defined for <= 1e6 pages")

    def links(t: pa.Table) -> pa.Table:
        urls = t.column("url").combine_chunks() \
            if isinstance(t.column("url"), pa.ChunkedArray) \
            else t.column("url")
        html = pa.array(_synth_link_html(urls.to_pylist(), n_pages),
                        pa.string())
        href, anchor, idx = extract_links(html)
        src_url = pc.take(urls, idx)
        dst_id = pc.cast(pc.struct_field(
            pc.extract_regex(href, _PAGE_NUM_RE), "num"), pa.int64())
        bucket = pc.cast(pc.bit_wise_and(dst_id, 63), pa.int64())
        return pa.table({"dst_id": dst_id, "src_url": src_url,
                         "anchor": anchor, "_bucket": bucket})

    def fold(g: pd.DataFrame) -> pa.Table:
        if len(g) == 0 or "dst_id" not in g.columns:
            return pa.table({"dst_id": pa.array([], pa.int64()),
                             "n_inlinks": pa.array([], pa.int64()),
                             "n_src_pages": pa.array([], pa.int64()),
                             "anchors": pa.array([], pa.string())})
        gg = g.groupby("dst_id", as_index=False).agg(
            n_inlinks=("anchor", "size"),
            n_src_pages=("src_url", "nunique"),
            anchors=("anchor",
                     lambda s: ",".join(sorted(set(s)))))
        return pa.table({
            "dst_id": pa.array(gg["dst_id"].to_numpy(np.int64),
                               pa.int64()),
            "n_inlinks": pa.array(gg["n_inlinks"].to_numpy(np.int64),
                                  pa.int64()),
            "n_src_pages": pa.array(gg["n_src_pages"].to_numpy(np.int64),
                                    pa.int64()),
            "anchors": pa.array(gg["anchors"], pa.string())})

    return (pages.map_batches(links, batch_format="pyarrow")
                 .groupby("_bucket")
                 .map_groups(fold, batch_format="pandas")
                 .sort("dst_id"))


def web_cocitation(sf_dir: str):
    """Co-citation pair counts over the extracted web link graph:
    pages cited together by the same source (``(a_id, b_id,
    n_shared_src)``) — the link-structure similarity signal behind
    related-page discovery and mirror detection.

    Shape: ZERO exchange for pair generation — every src page's
    outlinks live in one batch (one html row → one batch), so the
    per-src self-merge and the in-batch pair combiner run locally;
    ONE pair-bucketed exchange moves only combined (a, b, n) rows.
    Pair fan-out is bounded by out-degree² per src (real crawls cap
    outlinks per page the same way).  Oracle: self-join of the
    link-edge SQL on src with ``dst_a < dst_b``."""
    edges = _web_link_edges_ds(sf_dir)
    MIX = np.uint64(0x9E3779B97F4A7C15)

    def pairs(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        m = df.merge(df, on="src_id")
        m = m[m["dst_id_x"] < m["dst_id_y"]]
        if len(m) == 0:
            return pa.table({"a_id": pa.array([], pa.int64()),
                             "b_id": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "_pb": pa.array([], pa.int64())})
        c = m.groupby(["dst_id_x", "dst_id_y"], as_index=False).size()
        a = c["dst_id_x"].to_numpy(np.uint64)
        b = c["dst_id_y"].to_numpy(np.uint64)
        bk = ((a * MIX + b) & np.uint64(63)).astype(np.int64)
        return pa.table({
            "a_id": pa.array(a.astype(np.int64), pa.int64()),
            "b_id": pa.array(b.astype(np.int64), pa.int64()),
            "n": pa.array(c["size"].to_numpy(np.int64), pa.int64()),
            "_pb": pa.array(bk, pa.int64())})

    def fold(g: pd.DataFrame) -> pa.Table:
        if len(g) == 0 or "a_id" not in g.columns:
            return pa.table({"a_id": pa.array([], pa.int64()),
                             "b_id": pa.array([], pa.int64()),
                             "n_shared_src": pa.array([], pa.int64())})
        gg = g.groupby(["a_id", "b_id"], as_index=False)["n"].sum()
        return pa.table({
            "a_id": pa.array(gg["a_id"].to_numpy(np.int64), pa.int64()),
            "b_id": pa.array(gg["b_id"].to_numpy(np.int64), pa.int64()),
            "n_shared_src": pa.array(gg["n"].to_numpy(np.int64),
                                     pa.int64())})

    return (edges.map_batches(pairs, batch_format="pyarrow")
                 .groupby("_pb")
                 .map_groups(fold, batch_format="pandas")
                 .sort(["a_id", "b_id"]))


def host_dedup_stats(sf_dir: str):
    """Per-host duplication report (which hosts are boilerplate/mirror
    farms — the crawl-curation signal that drives per-domain caps):
    ``(host, n_pages, n_distinct_texts)``.  Page counts fold from
    per-batch combiners; distinct text hashes ride ONE text-free
    exchange of (host, md5) pairs already deduped per batch — the
    exact_dedup keep_text=False discipline."""
    from ..functions import hashing as H
    from ..functions.web import url_host_section
    _ensure_gate_pages(sf_dir)
    _, pages_path = pages_for_sf(sf_dir)
    pages = ray.data.read_parquet(pages_path, columns=["url", "text"])

    def partial(t: pa.Table) -> pa.Table:
        host, _sec, ok = url_host_section(t.column("url"))
        tt = pa.table({"host": host,
                       "text": t.column("text")}).filter(ok)
        hs = tt.column("host").to_pylist()
        md5s = [H.text_md5(x or "")
                for x in tt.column("text").to_pylist()]
        df = pd.DataFrame({"host": hs, "h": md5s})
        pairs = df.drop_duplicates()                       # combiner
        counts = df.groupby("host", as_index=False).size()
        hb = pd.util.hash_array(
            pairs["host"].to_numpy(object)) % 16
        return pa.table({
            "host": pa.array(pairs["host"].tolist() +
                             counts["host"].tolist(), pa.string()),
            "h": pa.array(pairs["h"].tolist() +
                          [None] * len(counts), pa.string()),
            "n": pa.array([0] * len(pairs) +
                          counts["size"].astype(int).tolist(),
                          pa.int64()),
            "bucket": pa.array(
                np.concatenate([hb.astype(np.int64),
                                (pd.util.hash_array(
                                    counts["host"].to_numpy(object))
                                 % 16).astype(np.int64)]))})

    def fold(g: pd.DataFrame) -> pa.Table:
        pairs = g[g["h"].notna()][["host", "h"]].drop_duplicates()
        nd = pairs.groupby("host").size()
        np_ = g[g["h"].isna()].groupby("host")["n"].sum()
        hosts = sorted(set(nd.index) | set(np_.index))
        return pa.table({
            "host": pa.array(hosts, pa.string()),
            "n_pages": pa.array([int(np_.get(h, 0)) for h in hosts],
                                pa.int64()),
            "n_distinct_texts": pa.array([int(nd.get(h, 0))
                                          for h in hosts], pa.int64())})

    return (pages.map_batches(partial, batch_format="pyarrow")
            .groupby("bucket").map_groups(fold, batch_format="pandas")
            .sort("host"))


def docs_shuffle_shards(sf_dir: str):
    """Deterministic global shuffle + shard assignment over documents
    (training-export primitive): md5 shuffle key, hex-prefix shard,
    dense per-shard position.  Fully SQL-oracled (md5 + strpos hex
    arithmetic + row_number per shard)."""
    from ..stages.relational import deterministic_shuffle
    return deterministic_shuffle(
        _read(sf_dir, "documents", columns=["doc_id"]), n_shards=8)


def kg_khop(sf_dir: str):
    """2-hop BFS neighborhood of the 5 smallest node ids in the built
    KG — distributed frontier expansion (one edge scan per hop)."""
    from ..stages.graph import k_hop
    _ensure_gate_artifact(sf_dir)
    return k_hop(_kg_result(sf_dir).edges, n_seeds=5, k=2)


def kg_walks(sf_dir: str):
    """Deterministic DeepWalk-style walk corpus over the built KG
    (2 walks x 3 steps from every node): hash-seeded neighbor choice
    makes the output byte-identical across re-runs/partitionings and
    SQL-re-derivable (the oracle unrolls one join per step)."""
    from ..stages.graph import deterministic_walks
    _ensure_gate_artifact(sf_dir)
    return deterministic_walks(_kg_result(sf_dir).edges,
                               n_walks=2, walk_len=3)


EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def kg_curated_nodes(sf_dir: str):
    """Composed curation → KG build (the end-to-end web-corpus story):
    quality-gate pages (≥ 64 text chars), exact text-dedup (keep the
    min-md5(url) page per distinct md5(text)), cap every
    (host, section) stratum at 50 pages in md5(url) order (bites at
    every gate scale: the corpus carries ~67 pages/section at
    sf0.001), then run the flagship build over the survivors.  The
    oracle re-derives the curated url set IN SQL from the exported
    pages — independent of the engine's curation — and filters the
    full per-mention artifact to it: valid because mention extraction
    is per-page deterministic, so the full-corpus mentions restricted
    to curated urls ARE the curated-corpus mentions, and
    canonicalization replays as the same LWW window query."""
    from ..functions import hashing as H
    from ..functions.web import url_host_section
    from ..stages.relational import grouped_limit
    from .kg_build import KGBuildConfig, build_kg, read_pages
    _ensure_gate_artifact(sf_dir)
    corpus_dir, pages_path = pages_for_sf(sf_dir)
    with open(f"{corpus_dir}/ontology.json") as fh:
        ontology_json = fh.read()
    with open(f"{corpus_dir}/aliases.json") as fh:
        alias_map = json.load(fh)
    pages = read_pages(pages_path)
    # typed empties for the group shuffle's schema-less empty
    # partitions (the _canonical_edges lesson) — grouped_limit sorts
    # on key/ord in EVERY block, so empties must carry the schema
    sch = pages.schema()
    page_fields = list(zip(sch.names, sch.types))
    empty_pages = pa.table({nm: pa.array([], tp)
                            for nm, tp in page_fields})
    empty_cap = pa.table({**{nm: pa.array([], tp)
                             for nm, tp in page_fields},
                          "key": pa.array([], pa.string()),
                          "ord": pa.array([], pa.string())})

    def prep(t: pa.Table) -> pa.Table:
        txt = pc.fill_null(t.column("text"), "")
        t = t.filter(pc.greater_equal(pc.utf8_length(txt), 64))
        tm = [H.text_md5(x or "")
              for x in t.column("text").to_pylist()]
        um = [H.text_md5(u) for u in t.column("url").to_pylist()]
        t = t.append_column("_tmd5", pa.array(tm, pa.string()))
        t = t.append_column("_umd5", pa.array(um, pa.string()))
        bk = pd.util.hash_array(np.asarray(tm, object)) % 32
        return t.append_column(
            "bucket", pa.array(bk.astype(np.int64), pa.int64()))

    def dedup_fold(g: pd.DataFrame):
        if len(g) == 0:
            return empty_pages
        g = (g.sort_values(["_tmd5", "_umd5"])
             .groupby("_tmd5", sort=False).head(1))
        return g.drop(columns=["bucket", "_tmd5", "_umd5"])

    deduped = (pages.map_batches(prep, batch_format="pyarrow")
               .groupby("bucket")
               .map_groups(dedup_fold, batch_format="pandas"))

    def cap_prep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "url" not in t.column_names:
            return empty_cap
        host, sec, ok = url_host_section(t.column("url"))
        t = (t.append_column("_host", host)
             .append_column("_sec", sec).filter(ok))
        key = pc.binary_join_element_wise(
            t.column("_host"), t.column("_sec"), "\x1f")
        ordh = [H.text_md5(u) for u in t.column("url").to_pylist()]
        t = t.drop_columns(["_host", "_sec"])
        return (t.append_column("key", key)
                .append_column("ord", pa.array(ordh, pa.string())))

    curated = grouped_limit(
        deduped.map_batches(cap_prep, batch_format="pyarrow"),
        "key", "ord", k=50).drop_columns(["key", "ord"])
    cfg = KGBuildConfig(ontology_json=ontology_json,
                        alias_map=alias_map)
    res = build_kg(curated, cfg)
    _KG_CURATED_CACHE.clear()
    _KG_CURATED_CACHE[sf_dir] = res
    return res.nodes


def kg_curated_edges(sf_dir: str):
    """Edge table of the curated build (see :func:`kg_curated_nodes`) —
    the dedup + endpoint semi-join replayed in SQL over the mention
    artifact restricted to the SQL-re-derived curated url set."""
    if sf_dir not in _KG_CURATED_CACHE:
        kg_curated_nodes(sf_dir)
    return _KG_CURATED_CACHE[sf_dir].edges


def lang_stratified_sample(sf_dir: str):
    """Per-language fixed-size (k=20) deterministic sample over
    documents — the stratified training-mix slice.  SQL-oracled via a
    QUALIFY row_number over the same md5 key."""
    from ..stages.relational import grouped_bottom_k_sample
    docs = _read(sf_dir, "documents",
                 columns=["doc_id", "lang", "n_chars"])
    return (grouped_bottom_k_sample(docs, "lang", "doc_id", k=20)
            .sort(["lang", "sample_rank"]))


def supplier_fuzzy_pairs(sf_dir: str):
    """Fuzzy record linkage: all supplier-name pairs within Levenshtein
    distance 1 via deletion-neighborhood blocking (recall exactly 1,
    final exact verify).  SQL-oracled against a brute-force
    levenshtein cross join."""
    from ..stages.dedup import fuzzy_pairs_editdist1
    sup = _read(sf_dir, "supplier", columns=["s_suppkey", "s_name"])
    return (fuzzy_pairs_editdist1(sup, "s_suppkey", "s_name")
            .sort(["a_id", "b_id"]))


def events_user_pivot(sf_dir: str):
    """Per-user crosstab over event types — one (n_<type>,
    cents_<type>) column pair per type (the per-entity feature-table
    layout).  SQL-oracled as a FILTER conditional aggregation."""
    from ..stages.relational import pivot_counts
    events = _read(sf_dir, "events",
                   columns=["user_id", "event_type", "value"])
    return pivot_counts(events, "user_id", "event_type", "value",
                        EVENT_TYPES).sort("user_id")


def kg_walks_bucketed(sf_dir: str):
    """The walk generator's DISTRIBUTED path (two tag-union bucket
    joins per step, no driver state) forced externally — output
    identical to kg_walks by construction, so it shares that query's
    oracle (the entity_link_ann_bucketed pattern: path parity as
    external gate signal, not just a pytest claim)."""
    from ..stages.graph import deterministic_walks
    _ensure_gate_artifact(sf_dir)
    return deterministic_walks(_kg_result(sf_dir).edges,
                               n_walks=2, walk_len=3,
                               mode="distributed")


def kg_ppr(sf_dir: str):
    """Personalized (seed-restart) PageRank over the built KG from the
    5 smallest node ids — the GraphRAG-style "which entities matter to
    this seed set" primitive.  Integer fixed point => bit-exact and
    SQL-oracled as an unrolled CTE chain (the kg_pagerank trick with a
    seeds table)."""
    from ..stages.graph import personalized_pagerank_fixed
    _ensure_gate_artifact(sf_dir)
    return personalized_pagerank_fixed(_kg_result(sf_dir).edges,
                                       n_seeds=5, n_iter=10)


def events_value_rank(sf_dir: str):
    """rank() and dense_rank() of each event's value within its event
    type — integer-exact under ties (no tie-break needed)."""
    from ..stages.windows import grouped_rank
    events = _read(sf_dir, "events",
                   columns=["event_id", "event_type", "value"])
    return grouped_rank(events, "event_type", "value", "event_id")


def _comention_edges(sf_dir: str):
    """(src_id, dst_id) co-mention pair list: two entities adjacent
    iff some page mentions both (the KG edge table itself is bipartite
    Person->Movie, so density analytics run on this projection)."""
    import pyarrow.compute as pc
    from .kg_build import KGBuildConfig, extract_mentions, read_pages
    from .oracle_export import MentionOracleRows
    corpus_dir, pages_path = pages_for_sf(sf_dir)
    with open(f"{corpus_dir}/ontology.json") as fh:
        ontology_json = fh.read()
    with open(f"{corpus_dir}/aliases.json") as fh:
        alias_map = json.load(fh)
    pages = read_pages(pages_path)
    mentions = extract_mentions(pages, KGBuildConfig(
        ontology_json=ontology_json))
    fn = MentionOracleRows(ontology_json, alias_map)

    def markers(t):
        t = fn(t)
        mask = pc.and_(pc.equal(t.column("kind"), "entity"),
                       pc.equal(t.column("attr"), ""))
        return t.filter(mask).select(["url_hash", "node_id"])

    pm = mentions.map_batches(markers, batch_format="pyarrow")

    def bucket(t: pa.Table) -> pa.Table:
        pg = t.column("url_hash").to_numpy(zero_copy_only=False)
        return t.append_column(
            "bucket", pa.array((pg % 64).astype(np.int64), pa.int64()))

    def pairs(g: pd.DataFrame) -> pa.Table:
        # pages never span buckets -> per-bucket distinct is global;
        # vectorized within-page self-merge, a < b
        pk = g[["url_hash", "node_id"]].drop_duplicates()
        m = pk.merge(pk, on="url_hash")
        m = m[m["node_id_x"] < m["node_id_y"]]
        m = m[["node_id_x", "node_id_y"]].drop_duplicates()
        return pa.table({
            "src_id": pa.array(m["node_id_x"].to_numpy(np.uint64),
                               pa.uint64()),
            "dst_id": pa.array(m["node_id_y"].to_numpy(np.uint64),
                               pa.uint64())})

    return (pm.map_batches(bucket, batch_format="pyarrow")
              .groupby("bucket").map_groups(pairs,
                                            batch_format="pandas"))


def _comention_weighted_edges(sf_dir: str):
    """(src_id, dst_id, w) weighted co-mention pairs — w = number of
    distinct pages mentioning both entities (the weight kg_cooccurrence
    reports per key pair, here on node ids for the graph ops)."""
    import pyarrow.compute as pc
    from .kg_build import KGBuildConfig, extract_mentions, read_pages
    from .oracle_export import MentionOracleRows
    corpus_dir, pages_path = pages_for_sf(sf_dir)
    with open(f"{corpus_dir}/ontology.json") as fh:
        ontology_json = fh.read()
    with open(f"{corpus_dir}/aliases.json") as fh:
        alias_map = json.load(fh)
    pages = read_pages(pages_path)
    mentions = extract_mentions(pages, KGBuildConfig(
        ontology_json=ontology_json))
    fn = MentionOracleRows(ontology_json, alias_map)
    MIX = np.uint64(0x9E3779B97F4A7C15)

    def markers(t):
        t = fn(t)
        mask = pc.and_(pc.equal(t.column("kind"), "entity"),
                       pc.equal(t.column("attr"), ""))
        return t.filter(mask).select(["url_hash", "node_id"])

    pm = mentions.map_batches(markers, batch_format="pyarrow")

    def bucket(t: pa.Table) -> pa.Table:
        pg = t.column("url_hash").to_numpy(zero_copy_only=False)
        return t.append_column(
            "bucket", pa.array((pg % 64).astype(np.int64), pa.int64()))

    def pairs(g: pd.DataFrame) -> pa.Table:
        pk = g[["url_hash", "node_id"]].drop_duplicates()
        m = pk.merge(pk, on="url_hash")
        m = m[m["node_id_x"] < m["node_id_y"]]
        c = (m.groupby(["node_id_x", "node_id_y"], as_index=False)
             .size())
        a = c["node_id_x"].to_numpy(np.uint64)
        b = c["node_id_y"].to_numpy(np.uint64)
        with np.errstate(over="ignore"):
            pb = ((a * MIX + b) % np.uint64(64)).astype(np.int64)
        return pa.table({
            "src_id": pa.array(a, pa.uint64()),
            "dst_id": pa.array(b, pa.uint64()),
            "n": pa.array(c["size"].to_numpy(np.int64), pa.int64()),
            "pair_bucket": pa.array(pb, pa.int64())})

    def fold(g: pd.DataFrame) -> pa.Table:
        if len(g) == 0:
            return pa.table({"src_id": pa.array([], pa.uint64()),
                             "dst_id": pa.array([], pa.uint64()),
                             "w": pa.array([], pa.int64())})
        agg = (g.groupby(["src_id", "dst_id"], as_index=False)["n"]
               .sum())
        return pa.table({
            "src_id": pa.array(agg["src_id"].to_numpy(np.uint64),
                               pa.uint64()),
            "dst_id": pa.array(agg["dst_id"].to_numpy(np.uint64),
                               pa.uint64()),
            "w": pa.array(agg["n"].to_numpy(np.int64), pa.int64())})

    return (pm.map_batches(bucket, batch_format="pyarrow")
              .groupby("bucket").map_groups(pairs,
                                            batch_format="pandas")
              .groupby("pair_bucket").map_groups(
                  fold, batch_format="pandas"))


def kg_mention_timeseries(sf_dir: str):
    """Temporal KG signal: per-entity mention counts per UTC day
    (crawl-time trend of every node) — per-batch combiner over the
    mention stream, one coarse-bucket fold."""
    import pyarrow.compute as pc
    from .kg_build import KGBuildConfig, extract_mentions, read_pages
    from .oracle_export import MentionOracleRows
    _ensure_gate_artifact(sf_dir)
    corpus_dir, pages_path = pages_for_sf(sf_dir)
    with open(f"{corpus_dir}/ontology.json") as fh:
        ontology_json = fh.read()
    with open(f"{corpus_dir}/aliases.json") as fh:
        alias_map = json.load(fh)
    mentions = extract_mentions(
        read_pages(pages_path),
        KGBuildConfig(ontology_json=ontology_json))
    fn = MentionOracleRows(ontology_json, alias_map)
    DAY_US = 86_400_000_000

    def partial(t: pa.Table) -> pa.Table:
        t = fn(t)
        t = t.filter(pc.and_(pc.equal(t.column("kind"), "entity"),
                             pc.equal(t.column("attr"), "")))
        node = t.column("node_id").to_numpy(zero_copy_only=False)
        day = (t.column("ts").to_numpy(zero_copy_only=False)
               // DAY_US).astype(np.int64)
        df = (pd.DataFrame({"node_id": node, "day": day})
              .groupby(["node_id", "day"], as_index=False).size())
        nd = df["node_id"].to_numpy(np.uint64)
        return pa.table({
            "node_id": pa.array(nd, pa.uint64()),
            "day": pa.array(df["day"].to_numpy(np.int64), pa.int64()),
            "n": pa.array(df["size"].to_numpy(np.int64), pa.int64()),
            "bucket": pa.array((nd % np.uint64(32)).astype(np.int64),
                               pa.int64())})

    def fold(g: pd.DataFrame) -> pa.Table:
        if len(g) == 0:
            return pa.table({"node_id": pa.array([], pa.uint64()),
                             "day": pa.array([], pa.int64()),
                             "n_mentions": pa.array([], pa.int64())})
        agg = (g.groupby(["node_id", "day"], as_index=False)["n"]
               .sum())
        return pa.table({
            "node_id": pa.array(agg["node_id"].to_numpy(np.uint64),
                                pa.uint64()),
            "day": pa.array(agg["day"].to_numpy(np.int64), pa.int64()),
            "n_mentions": pa.array(agg["n"].to_numpy(np.int64),
                                   pa.int64())})

    return (mentions.map_batches(partial, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(fold, batch_format="pandas")
            .sort(["node_id", "day"]))


def kg_degree_histogram(sf_dir: str):
    """Degree-distribution histogram of the KG edge table (the classic
    scale-free sanity plot): fixed-width buckets over total degree,
    composed from degree_table + the histogram fold."""
    from ..stages.graph import degree_table
    _ensure_gate_artifact(sf_dir)
    deg = degree_table(_kg_result(sf_dir).edges)

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "degree" not in t.column_names:
            # schema-less empty partition from degree_table's fold
            return pa.table({"bin": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        d = t.column("degree").to_numpy(zero_copy_only=False)
        b = np.minimum(d // 4, 15).astype(np.int64)   # width 4, 16 bins
        u, c = np.unique(b, return_counts=True)
        return pa.table({"bin": pa.array(u, pa.int64()),
                         "n": pa.array(c.astype(np.int64), pa.int64())})

    out = (deg.map_batches(partial, batch_format="pyarrow")
           .to_pandas().groupby("bin", as_index=True)["n"].sum())
    bins = np.arange(16, dtype=np.int64)
    return pa.table({
        "bin": pa.array(bins, pa.int64()),
        "lo": pa.array(bins * 4, pa.int64()),
        "n_nodes": pa.array([int(out.get(b, 0)) for b in bins],
                            pa.int64())})


def kg_pagerank_weighted(sf_dir: str):
    """Weighted fixed-point PageRank over the co-mention graph (mass
    flows in proportion to shared-page counts) — integer recurrence,
    bit-exact, oracled as an unrolled CTE chain with weighted
    contributions."""
    from ..stages.graph import pagerank_weighted_fixed
    _ensure_gate_artifact(sf_dir)
    return pagerank_weighted_fixed(_comention_weighted_edges(sf_dir),
                                   n_iter=10)


def kg_triangles(sf_dir: str):
    """Per-node triangle participation counts over the entity
    co-mention graph — degree-ordered orientation, wedge/edge
    tag-union closing join (stages/graph.triangle_counts)."""
    from ..stages.graph import triangle_counts
    _ensure_gate_artifact(sf_dir)
    return triangle_counts(_comention_edges(sf_dir))


def kg_communities(sf_dir: str):
    """Deterministic label-propagation communities over the entity
    co-mention graph (5 synchronous rounds, most-frequent-neighbour
    label, ties to the smallest label — no RNG, no visit order) —
    EXACTLY SQL-oracled via an unrolled MATERIALIZED CTE chain."""
    from ..stages.graph import label_propagation_fixed
    _ensure_gate_artifact(sf_dir)
    return label_propagation_fixed(_comention_edges(sf_dir), n_iter=5)


def kg_communities_distributed(sf_dir: str):
    """The keyed-Dataset scale path of :func:`kg_communities`, forced
    (mode="distributed") against the SAME oracle — path parity as
    external gate signal, like kg_walks_bucketed."""
    from ..stages.graph import label_propagation_fixed
    _ensure_gate_artifact(sf_dir)
    return label_propagation_fixed(_comention_edges(sf_dir), n_iter=5,
                                   mode="distributed")


def kg_community_stats(sf_dir: str):
    """Exact per-community quality stats over the LPA communities of
    the co-mention graph — size, intra-edge count, total degree and
    the INTEGER modularity numerator q_num = 4*m*e_in - d_tot^2 (the
    float modularity_term is one IEEE division of exact ints, bit-
    equal vs DuckDB)."""
    from ..stages.graph import community_stats, label_propagation_fixed
    _ensure_gate_artifact(sf_dir)
    edges = _comention_edges(sf_dir).materialize()
    comms = label_propagation_fixed(edges, n_iter=5, mode="driver")
    return community_stats(edges, comms)


def kg_clustering(sf_dir: str):
    """Per-node local clustering coefficient of the co-mention graph
    (nodes with degree >= 2; 2T/(d(d-1)) — one IEEE division of exact
    integers, bit-exact vs the oracle)."""
    from ..stages.graph import clustering_coefficient
    _ensure_gate_artifact(sf_dir)
    return clustering_coefficient(_comention_edges(sf_dir))


def events_funnel(sf_dir: str):
    """view -> click -> purchase conversion funnel (greedy
    earliest-completion, strictly-later steps) — per-step user
    counts, integer-exact."""
    from ..stages.windows import funnel_counts
    events = _read(sf_dir, "events",
                   columns=["user_id", "event_type", "ts"])
    return funnel_counts(events, "user_id", "event_type", "ts",
                         ["view", "click", "purchase"])


def events_winsorized_stats(sf_dir: str):
    """Per-event-type winsorized (P5/P95-clipped) count, integer-cents
    sum and mean — grouped exact quantiles broadcast back over one
    clipping scan."""
    from ..stages.relational import winsorized_group_stats
    events = _read(sf_dir, "events", columns=["event_type", "value"])
    return winsorized_group_stats(events, "event_type", "value")


_KG_INCR_CACHE: dict = {}


def _kg_incremental(sf_dir: str):
    """Two-batch incremental build: snapshot state from the even-url
    half of the corpus, then the odd half applied as a delta.  Because
    the LWW state merge is associative/commutative, the result is
    bit-identical to the full rebuild — the gate reuses the full
    kg_nodes/kg_edges oracles to prove it."""
    if sf_dir in _KG_INCR_CACHE:
        return _KG_INCR_CACHE[sf_dir]
    from ..keys import hash64
    from .kg_build import KGBuildConfig, _fused_normalized, read_pages
    from .kg_update import apply_delta, compact_state
    corpus_dir, pages_path = pages_for_sf(sf_dir)
    with open(f"{corpus_dir}/ontology.json") as fh:
        ontology_json = fh.read()
    with open(f"{corpus_dir}/aliases.json") as fh:
        alias_map = json.load(fh)
    cfg = KGBuildConfig(ontology_json=ontology_json, alias_map=alias_map)

    def half(parity: int):
        def f(t: pa.Table) -> pa.Table:
            urls = t.column("url").to_pylist()
            keep = [hash64(u) % 2 == parity for u in urls]
            return t.filter(pa.array(keep))
        return f

    pages = read_pages(pages_path)
    state = compact_state(
        _fused_normalized(pages.map_batches(half(0),
                                            batch_format="pyarrow"),
                          cfg), cfg).materialize()
    delta = _fused_normalized(pages.map_batches(half(1),
                                                batch_format="pyarrow"),
                              cfg)
    nodes, edges, _new_state = apply_delta(state, delta, cfg)
    res = (nodes, edges.materialize())
    _KG_INCR_CACHE.clear()
    _KG_INCR_CACHE[sf_dir] = res
    return res


def kg_incremental_nodes(sf_dir: str):
    """Node table from the two-batch incremental build — must equal
    the full-rebuild kg_nodes oracle exactly."""
    _ensure_gate_artifact(sf_dir)
    return _kg_incremental(sf_dir)[0]


def kg_incremental_edges(sf_dir: str):
    """Edge table from the two-batch incremental build — must equal
    the full-rebuild kg_edges oracle exactly."""
    _ensure_gate_artifact(sf_dir)
    return _kg_incremental(sf_dir)[1]


def pmi_bigrams_docs(sf_dir: str):
    """Top-100 collocations by PMI ratio (the log-free monotone
    equivalent — bit-exact against DuckDB, unlike ln-based scores)."""
    from ..stages.relational import pmi_collocations
    return pmi_collocations(_read(sf_dir, "documents",
                                  columns=["doc_id", "text"]),
                            min_count=5, k=100)


def kg_link_prediction(sf_dir: str):
    """Top-20 predicted links of the built KG by neighborhood Jaccard
    (non-edge distance-2 pairs; inter/union integer-exact, jaccard is
    one IEEE division so the oracle matches bit-for-bit)."""
    from ..stages.graph import neighborhood_jaccard
    _ensure_gate_artifact(sf_dir)
    return neighborhood_jaccard(_kg_result(sf_dir).edges, k=20)


def kg_adamic_adar(sf_dir: str):
    """Top-20 predicted links of the built KG by Adamic-Adar
    (hub-discounted common neighbors).  The per-center weight
    ``1/ln(deg)`` is quantized once to integer nano-units (the DSIR
    discipline), so pair scores are order-free integer sums and the
    DuckDB oracle matches hash-exactly; the float ``aa`` column is one
    IEEE division on identical operands."""
    from ..stages.graph import link_prediction_adamic_adar
    _ensure_gate_artifact(sf_dir)
    return link_prediction_adamic_adar(_kg_result(sf_dir).edges, k=20)


def events_scd2_intervals(sf_dir: str):
    """SCD2 validity intervals of each user's event_type runs —
    gaps-and-islands collapsed to (user, state, from, to, n) with
    integer microsecond bounds (-1 = open interval)."""
    from ..stages.windows import scd2_intervals
    events = _read(sf_dir, "events",
                   columns=["event_id", "ts", "user_id", "event_type"])
    return scd2_intervals(events, "user_id", "event_type", "ts",
                          "event_id")


def bm25_topk_docs(sf_dir: str):
    """BM25 top-10 documents for three fixed keyword queries —
    distributed two-pass scoring (stats scan + score scan).  The gate
    compares (query_id, doc_id, rnk): every float op except ln is
    IEEE-mirrored against the SQL, but DuckDB's ln and libm round the
    last ulp differently, so raw scores can differ by ~2 ulp.  Rank is
    still exact: structurally identical docs tie bit-exactly on both
    sides (same ops each side) and break by doc_id; structurally
    different docs differ by far more than ulp.  Score VALUES are
    pinned in tests/test_round3_ops.py against an independent
    reference."""
    from ..stages.retrieval import bm25_topk
    out = bm25_topk(
        _read(sf_dir, "documents", columns=["doc_id", "text"]),
        queries={"q_join": ["hash", "join"],
                 "q_sort": ["merge", "sort"],
                 "q_stream": ["batch", "stream", "window"]})
    return out[["query_id", "doc_id", "rnk"]]


# ---------------------------------------------------------------------------
# wave-4 operators: bloom membership, feature normalization, rollup,
# histogram, robust stats, running totals, full outer join
# ---------------------------------------------------------------------------


def bloom_probe_customers(sf_dir: str):
    """Bloom-filter membership: build over ``orders.o_custkey``
    (mergeable per-block bitmaps, fixed m/8 bytes each), probe every
    ``customer.c_custkey``.  md5-derived bit positions make the whole
    filter SQL-re-derivable, so the gate checks the exact verdict
    per key (false positives included)."""
    from ..stages.sketches import bloom_build, bloom_probe
    bm = bloom_build(_read(sf_dir, "orders", columns=["o_custkey"]),
                     "o_custkey")
    return (bloom_probe(_read(sf_dir, "customer", columns=["c_custkey"]),
                        "c_custkey", bm)
            .select_columns(["c_custkey", "bloom_hit"]))


def events_zscore_by_type(sf_dir: str):
    """Per-event-type z-score feature normalization (exact integer
    moments, IEEE-mirrored mean/std/z expression tree)."""
    from ..stages.relational import grouped_zscore
    events = _read(sf_dir, "events",
                   columns=["event_id", "event_type", "value"])
    return grouped_zscore(events, "event_type", "value",
                          keep_cols=["event_id"])


def events_rollup(sf_dir: str):
    """GROUP BY ROLLUP(event_type, hour) counts + exact cents sums;
    sentinel 'ALL' / -1 marks the rolled-up levels."""
    from ..stages.relational import rollup_aggregate
    events = _read(sf_dir, "events",
                   columns=["ts", "event_type", "value"])

    def with_hour(t: pa.Table) -> pa.Table:
        return t.append_column("hour",
                               pc.hour(t.column("ts")).cast(pa.int64()))

    return rollup_aggregate(
        events.map_batches(with_hour, batch_format="pyarrow"),
        [("event_type", "ALL"), ("hour", -1)], "value")


def events_value_histogram(sf_dir: str):
    """Fixed-width (5.00) histogram of event values: per-bin count and
    exact cents sum."""
    from ..stages.relational import fixed_width_histogram
    return fixed_width_histogram(
        _read(sf_dir, "events", columns=["value"]), "value",
        width_cents=500)


def events_mad_by_type(sf_dir: str):
    """Per-type median + MAD on integer cents — exact discrete
    quantiles both passes."""
    from ..stages.relational import grouped_mad
    out = grouped_mad(_read(sf_dir, "events",
                            columns=["event_type", "value"]),
                      "event_type", "value")
    # one row per group (grouped_quantiles emits one row per (g, q))
    return out


def events_user_running_total(sf_dir: str):
    """Per-user running value total ordered by (ts, event_id) — the
    cumulative-sum window on exact cents."""
    from ..stages.windows import grouped_running_sum
    return grouped_running_sum(
        _read(sf_dir, "events",
              columns=["event_id", "user_id", "ts", "value"]))


def customer_events_full_outer(sf_dir: str):
    """FULL OUTER join of the customer dimension with per-user event
    counts: customers with no events keep n_events = 0, event users
    with no customer row keep c_name = '' — both sides survive.  The
    per-user counts pre-aggregate with the usual combiner → bucket
    fold, so the join's right side is user-count-sized, not
    event-count-sized."""
    from ..stages.joins import full_outer_join
    events = _read(sf_dir, "events", columns=["user_id"])

    def partial(t: pa.Table) -> pa.Table:
        import pandas as _pd
        vc = _pd.Series(t.column("user_id").to_pylist()).value_counts()
        return pa.table({
            "user_id": pa.array(vc.index.to_numpy(np.int64), pa.int64()),
            "n": pa.array(vc.to_numpy(np.int64), pa.int64())})

    def bucket(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        return t.append_column("_bucket",
                               pa.array(u % 32, pa.int64()))

    def fold(g: pd.DataFrame) -> pa.Table:
        agg = g.groupby("user_id")["n"].sum()
        return pa.table({
            "user_id": pa.array(agg.index.to_numpy(np.int64), pa.int64()),
            "n_events": pa.array(agg.to_numpy(np.int64), pa.int64())})

    counts = (events.map_batches(partial, batch_format="pyarrow")
                    .map_batches(bucket, batch_format="pyarrow")
                    .groupby("_bucket")
                    .map_groups(fold, batch_format="pandas"))
    joined = full_outer_join(
        _read(sf_dir, "customer", columns=["c_custkey", "c_name"]),
        counts, "c_custkey", "user_id", ["c_name"], ["n_events"],
        key_name="cust_key")

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "cust_key": t.column("cust_key"),
            "c_name": t.column("c_name").fill_null(""),
            "n_events": t.column("n_events").fill_null(0)})

    return joined.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# wave-5 operators: correlation, cohorts, journeys, grouped vocab,
# sentence segmentation, weighted sampling, count-min sketch
# ---------------------------------------------------------------------------


def lineitem_corr(sf_dir: str):
    """Per-returnflag Pearson correlation of quantity vs extended
    price — exact integer moments, mirrored IEEE finish."""
    from ..stages.relational import grouped_corr
    return grouped_corr(
        _read(sf_dir, "lineitem",
              columns=["l_returnflag", "l_quantity", "l_extendedprice"]),
        "l_returnflag", "l_quantity", "l_extendedprice")


def events_retention_cohorts(sf_dir: str):
    """Weekly cohort retention matrix (cohort week × week offset ×
    distinct active users) — integer week arithmetic end to end."""
    from ..stages.windows import retention_cohorts
    return retention_cohorts(_read(sf_dir, "events",
                                   columns=["user_id", "ts"]))


def events_user_journey(sf_dir: str):
    """Per-user ordered event-type journey string (ordered STRING_AGG
    with (ts, event_id) ordering) + event count."""
    from ..stages.windows import grouped_journey
    return grouped_journey(_read(
        sf_dir, "events",
        columns=["event_id", "user_id", "event_type", "ts"]))


def lang_token_frequencies(sf_dir: str):
    """Top-10 tokens per language by (count DESC, token ASC) — the
    grouped vocabulary profile."""
    from ..stages.relational import grouped_token_frequencies
    return grouped_token_frequencies(
        _read(sf_dir, "documents", columns=["lang", "text"]),
        "lang", "text", k=10)


def sentences_docs(sf_dir: str):
    """Sentence segmentation with 1-based ordinals — RE2 pattern
    shared verbatim with the oracle's regexp_extract_all."""
    from ..functions.textstats import sentences_batch
    return _read(sf_dir, "documents",
                 columns=["doc_id", "text"]).map_batches(
        sentences_batch, batch_format="pyarrow")


def weighted_sample_docs(sf_dir: str):
    """Deterministic weighted Bernoulli sample: keep probability
    min(1, n_chars/4000), decided by pure-integer comparison of an
    md5-derived 52-bit uniform — no float boundary, SQL-exact."""
    from ..stages.relational import weighted_bernoulli_sample
    return weighted_bernoulli_sample(
        _read(sf_dir, "documents", columns=["doc_id", "n_chars"]),
        "doc_id", "n_chars", scale=4000)


def cms_user_counts(sf_dir: str):
    """Count-min sketch frequency estimates for every distinct user —
    the mergeable-counter-matrix sketch, estimates SQL-re-derived
    EXACTLY (deterministic md5 cells make even the collision
    overcounts reproducible)."""
    from ..stages.sketches import cms_build, cms_estimate
    events = _read(sf_dir, "events", columns=["user_id"])
    mat = cms_build(events, "user_id")

    def part(t: pa.Table) -> pa.Table:
        return pa.table({"user_id": pc.unique(t.column("user_id"))})

    def bucket(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        return t.append_column("_b", pa.array(u % 32, pa.int64()))

    def fold(g: pd.DataFrame) -> pa.Table:
        return pa.table({"user_id": pa.array(
            sorted(set(g["user_id"])), pa.int64())})

    distinct = (events.map_batches(part, batch_format="pyarrow")
                      .map_batches(bucket, batch_format="pyarrow")
                      .groupby("_b")
                      .map_groups(fold, batch_format="pandas"))
    return (cms_estimate(distinct, "user_id", mat)
            .select_columns(["user_id", "cms_count"]))


def events_cube(sf_dir: str):
    """GROUP BY CUBE(event_type, hour) — all four grouping sets via the
    derive-coarse-from-fine expansion."""
    from ..stages.relational import rollup_aggregate
    events = _read(sf_dir, "events",
                   columns=["ts", "event_type", "value"])

    def with_hour(t: pa.Table) -> pa.Table:
        return t.append_column("hour",
                               pc.hour(t.column("ts")).cast(pa.int64()))

    return rollup_aggregate(
        events.map_batches(with_hour, batch_format="pyarrow"),
        [("event_type", "ALL"), ("hour", -1)], "value", mode="cube")


def events_mode_by_type(sf_dir: str):
    """Per-type modal value (cents) with (count DESC, value ASC)
    tie-break."""
    from ..stages.relational import grouped_mode
    return grouped_mode(_read(sf_dir, "events",
                              columns=["event_type", "value"]),
                        "event_type", "value")


def events_type_distinct_users(sf_dir: str):
    """Exact COUNT(DISTINCT user_id) per event type via disjoint
    pair-bucket partial counts."""
    from ..stages.relational import grouped_distinct_count
    return grouped_distinct_count(
        _read(sf_dir, "events", columns=["event_type", "user_id"]),
        "event_type", "user_id")


KCORE_K = 12
KCORE_SQL_ROUNDS = 10     # unroll budget of the __ray_entry__ oracle


def kg_kcore(sf_dir: str):
    """k-core (k=12) of the entity co-mention graph — iterative
    distributed peel; the oracle replays the same fixpoint as a
    bounded-unroll SQL chain.  The unroll is only exact if the engine
    converges inside it, so the rounds-used count is CHECKED here (and
    on the gate graph in tests/test_wave5_ops.py), not assumed."""
    from ..stages.graph import k_core
    _ensure_gate_artifact(sf_dir)
    out, rounds = k_core(_comention_edges(sf_dir), k=KCORE_K)
    if rounds > KCORE_SQL_ROUNDS:
        raise RuntimeError(
            f"k-core peel took {rounds} rounds; the SQL oracle unrolls "
            f"only {KCORE_SQL_ROUNDS} — raise KCORE_SQL_ROUNDS to keep "
            "the gate exact")
    return out


def tpch_q5_revenue(sf_dir: str):
    """TPC-H Q5-style local-supplier revenue: per (region, nation)
    revenue over customer⋈orders⋈lineitem⋈supplier⋈nation⋈region where
    the customer's and supplier's nations match — the canonical
    star-join showcase.  All four dimension sides (nation/region maps,
    customer→nation, supplier→nation, orders→customer) broadcast once
    via ``ray.put``; the ONE fact scan over lineitem does vectorized
    map lookups + the locality filter + a cents combiner, so the only
    exchange is the nation-sized partial fold (same bound note as
    tpch_q3's order-date broadcast: at 10^9+ orders the orders map
    becomes a tag-union shuffle join instead, dataflow otherwise
    unchanged)."""
    import pyarrow.parquet as _pq
    from ..stages.joins import _broadcast_cache

    nat = _pq.read_table(f"{sf_dir}/nation.parquet")
    reg = _pq.read_table(f"{sf_dir}/region.parquet")
    cust = _pq.read_table(f"{sf_dir}/customer.parquet",
                          columns=["c_custkey", "c_nationkey"])
    supp = _pq.read_table(f"{sf_dir}/supplier.parquet",
                          columns=["s_suppkey", "s_nationkey"])
    orders = _pq.read_table(f"{sf_dir}/orders.parquet",
                            columns=["o_orderkey", "o_custkey"])
    r_name = dict(zip(reg.column("r_regionkey").to_pylist(),
                      reg.column("r_name").to_pylist()))
    n_info = {int(k): (nm, r_name[int(rk)])
              for k, nm, rk in zip(nat.column("n_nationkey").to_pylist(),
                                   nat.column("n_name").to_pylist(),
                                   nat.column("n_regionkey").to_pylist())}
    maps_ref = ray.put((
        pd.Series(cust.column("c_nationkey").to_numpy().astype(np.int64),
                  index=cust.column("c_custkey").to_numpy()),
        pd.Series(supp.column("s_nationkey").to_numpy().astype(np.int64),
                  index=supp.column("s_suppkey").to_numpy()),
        pd.Series(orders.column("o_custkey").to_numpy(),
                  index=orders.column("o_orderkey").to_numpy())))

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_suppkey",
                        "l_extendedprice", "l_discount"])

    def partial(batch: pa.Table) -> pa.Table:
        cust_nat, supp_nat, ord_cust = _broadcast_cache(maps_ref)
        ok = pd.Series(batch.column("l_orderkey").to_numpy(
            zero_copy_only=False))
        sk = pd.Series(batch.column("l_suppkey").to_numpy(
            zero_copy_only=False))
        cnat = ok.map(ord_cust).map(cust_nat)
        snat = sk.map(supp_nat)
        keep = (cnat == snat) & cnat.notna()
        rev = pc.multiply(batch.column("l_extendedprice"),
                          pc.subtract(pa.scalar(1.0),
                                      batch.column("l_discount")))
        df = pd.DataFrame({
            "natkey": cnat[keep].astype(np.int64).to_numpy(),
            "cents": _cents(rev).to_numpy(
                zero_copy_only=False)[keep.to_numpy()]})
        agg = df.groupby("natkey", as_index=False)["cents"].sum()
        return pa.table({
            "natkey": pa.array(agg["natkey"].to_numpy(np.int64),
                               pa.int64()),
            "cents": pa.array(agg["cents"].to_numpy(np.int64),
                              pa.int64())})

    agg = (li.map_batches(partial, batch_format="pyarrow")
             .groupby("natkey")
             .aggregate(Sum("cents", alias_name="revenue_cents")))

    def finish(t: pa.Table) -> pa.Table:
        ks = t.column("natkey").to_pylist()
        return pa.table({
            "r_name": pa.array([n_info[int(k)][1] for k in ks],
                               pa.string()),
            "n_name": pa.array([n_info[int(k)][0] for k in ks],
                               pa.string()),
            "revenue_cents": t.column("revenue_cents").cast(pa.int64())})

    return finish(pa.Table.from_pandas(agg.to_pandas(),
                                       preserve_index=False))


NEG_SAMPLE_K = 5     # shared with the __ray_entry__ oracle's range()


def kg_negative_samples(sf_dir: str):
    """Deterministic negative-edge samples (k proposals per node,
    md5-derived, existing-edge/self drops) over the co-mention graph —
    the contrastive-training counterpart of kg_link_prediction.
    Identical output at any parallelism (pure-function sampling), and
    the whole sample — drops included — re-derives in SQL."""
    from ..stages.graph import negative_edge_samples
    _ensure_gate_artifact(sf_dir)
    return negative_edge_samples(_comention_edges(sf_dir),
                                 k=NEG_SAMPLE_K)


def embedding_label_centroids(sf_dir: str):
    """Per-label embedding centroids on QUANTIZED integers — the
    per-cluster statistics pass of a data-mixing/curriculum pipeline,
    kept bit-exact: each float32 component quantizes as
    ``floor(x*1e6 + 0.5)`` (floor form on BOTH engine and oracle — no
    round-half asymmetry), per-batch combiners emit (label, dim)
    integer partial sums (64 rows/label/batch, never vectors), and the
    centroid is ONE mirrored IEEE division."""
    emb = _read(sf_dir, "embeddings", columns=["label", "embedding"])

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"label": pa.array([], pa.int64()),
                             "dim": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "s": pa.array([], pa.int64())})
        labels = t.column("label").to_numpy(zero_copy_only=False)
        arr = t.column("embedding")
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        dim = len(arr[0])
        flat = arr.flatten().to_numpy(zero_copy_only=False)
        mat = np.floor(flat.astype(np.float64) * 1_000_000 + 0.5) \
                .astype(np.int64).reshape(len(labels), dim)
        out_l, out_d, out_n, out_s = [], [], [], []
        for lb in np.unique(labels):
            sel = mat[labels == lb]
            out_l.extend([int(lb)] * dim)
            out_d.extend(range(dim))
            out_n.extend([sel.shape[0]] * dim)
            out_s.extend(sel.sum(axis=0).tolist())
        return pa.table({
            "label": pa.array(out_l, pa.int64()),
            "dim": pa.array(out_d, pa.int64()),
            "n": pa.array(out_n, pa.int64()),
            "s": pa.array(out_s, pa.int64())})

    def bucket(t: pa.Table) -> pa.Table:
        d = t.column("dim").to_numpy(zero_copy_only=False)
        return t.append_column("_b", pa.array(d % 16, pa.int64()))

    def fold(g: pd.DataFrame) -> pa.Table:
        agg = g.groupby(["label", "dim"], as_index=False).agg(
            n=("n", "sum"), s=("s", "sum"))
        n = agg["n"].to_numpy(np.int64)
        s = agg["s"].to_numpy(np.int64)
        return pa.table({
            "label": pa.array(agg["label"].to_numpy(np.int64), pa.int64()),
            "dim": pa.array(agg["dim"].to_numpy(np.int64), pa.int64()),
            "n": pa.array(n, pa.int64()),
            "sum_q": pa.array(s, pa.int64()),
            "centroid_q": pa.array(s.astype(np.float64)
                                   / n.astype(np.float64), pa.float64())})

    return (emb.map_batches(partial, batch_format="pyarrow")
               .map_batches(bucket, batch_format="pyarrow")
               .groupby("_b")
               .map_groups(fold, batch_format="pandas"))


def mixture_sample_docs(sf_dir: str):
    """Source-mixture sampling: per-source keep rates (1..4)/4 derived
    from the source's numeric suffix, decided per doc by the same
    pure-integer md5 comparison as weighted_bernoulli_sample (salt
    'mix') — the deterministic data-mixing pass that reweights corpus
    composition without a shuffle."""
    from ..stages.relational import weighted_bernoulli_sample
    docs = _read(sf_dir, "documents", columns=["doc_id", "source"])

    def with_w(t: pa.Table) -> pa.Table:
        # a source participates iff its suffix is ASCII [0-9]+ — the
        # oracle guards with the same regexp before TRY_CAST, so both
        # sides drop null / signed / padded / unicode-digit suffixes
        # identically (bare isdigit() accepted unicode digits int()
        # can't parse; bare TRY_CAST accepted '-3' whose DuckDB % is
        # truncated, unlike Python's floor %)
        ws, keep = [], []
        for s in t.column("source").to_pylist():
            suffix = s[3:] if isinstance(s, str) else ""
            ok = bool(suffix) and suffix.isascii() and suffix.isdigit()
            keep.append(ok)
            ws.append(int(suffix) % 4 + 1 if ok else 0)
        t = t.append_column("w", pa.array(ws, pa.int64()))
        return t.filter(pa.array(keep, pa.bool_()))

    out = weighted_bernoulli_sample(
        docs.map_batches(with_w, batch_format="pyarrow"),
        "doc_id", "w", scale=4, salt="mix")
    return out.select_columns(["doc_id", "source"])


def lincls_score_docs(sf_dir: str):
    """Hash-feature linear classifier scoring over documents — the
    batched-model-inference stage shape (weight table builds once per
    ACTOR in __init__, scoring is vectorized per batch).  The md5
    hashing-trick model is exact-integer end to end, so even the model
    scores gate bit-for-bit against SQL."""
    from ..functions.textstats import HashLinearScorer
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return (docs.map_batches(HashLinearScorer, concurrency=2,
                             batch_size=256, num_cpus=1,
                             batch_format="pyarrow")
                .select_columns(["doc_id", "score_q",
                                 "n_tokens_scored"]))


def bottomk_sample_docs(sf_dir: str):
    """Deterministic fixed-size (k=50) uniform sample via bottom-k
    md5 hashes — the mergeable reservoir-sampling equivalent."""
    from ..stages.relational import bottom_k_sample
    return (bottom_k_sample(_read(sf_dir, "documents",
                                  columns=["doc_id", "n_chars"]),
                            "doc_id", k=50)
            .select_columns(["doc_id", "n_chars", "sample_rank"]))


def events_json_stats(sf_dir: str):
    """Semi-structured processing: parse the ``props`` JSON column,
    extract ``k``, aggregate per event type (n with a k, exact
    sum/min/max).  Parsing is a map-side linear pass with a compiled
    stdlib decoder (the flatten step of any log/Common-Crawl metadata
    pipeline); malformed / missing keys drop exactly as the oracle's
    NULL-propagating ``json_extract`` + TRY_CAST drop them."""
    import json as _json
    events = _read(sf_dir, "events", columns=["event_type", "props"])

    def partial(t: pa.Table) -> pa.Table:
        types = t.column("event_type").to_pylist()
        ks, gs = [], []
        for g, p in zip(types, t.column("props").to_pylist()):
            if g is None or p is None:
                continue
            try:
                v = _json.loads(p).get("k")
            except (ValueError, AttributeError):
                continue
            if isinstance(v, bool) or not isinstance(v, int) \
                    or not (-(1 << 63) <= v < (1 << 63)):
                continue
            gs.append(g)
            ks.append(v)
        if not ks:
            return pa.table({"event_type": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64()),
                             "s": pa.array([], pa.int64()),
                             "mn": pa.array([], pa.int64()),
                             "mx": pa.array([], pa.int64())})
        df = pd.DataFrame({"g": gs, "k": np.asarray(ks, np.int64)})
        agg = df.groupby("g")["k"].agg(n="size", s="sum",
                                       mn="min", mx="max")
        return pa.table({
            "event_type": pa.array(agg.index.tolist(), pa.string()),
            "n": pa.array(agg["n"].to_numpy(np.int64), pa.int64()),
            "s": pa.array(agg["s"].to_numpy(np.int64), pa.int64()),
            "mn": pa.array(agg["mn"].to_numpy(np.int64), pa.int64()),
            "mx": pa.array(agg["mx"].to_numpy(np.int64), pa.int64())})

    def fold(g: pd.DataFrame) -> pa.Table:
        agg = g.groupby("event_type").agg(
            n=("n", "sum"), s=("s", "sum"), mn=("mn", "min"),
            mx=("mx", "max"))
        return pa.table({
            "event_type": pa.array(agg.index.tolist(), pa.string()),
            "n_k": pa.array(agg["n"].to_numpy(np.int64), pa.int64()),
            "sum_k": pa.array(agg["s"].to_numpy(np.int64), pa.int64()),
            "min_k": pa.array(agg["mn"].to_numpy(np.int64), pa.int64()),
            "max_k": pa.array(agg["mx"].to_numpy(np.int64), pa.int64())})

    def bucket(t: pa.Table) -> pa.Table:
        import zlib as _z
        bs = [_z.crc32(x.encode("utf-8")) % 16
              for x in t.column("event_type").to_pylist()]
        return t.append_column("_b", pa.array(bs, pa.int64()))

    return (events.map_batches(partial, batch_format="pyarrow")
                  .map_batches(bucket, batch_format="pyarrow")
                  .groupby("_b")
                  .map_groups(fold, batch_format="pandas"))


def events_type_distinct_users_hll(sf_dir: str):
    """Per-type APPROXIMATE distinct users (grouped HLL) — the
    open-cardinality companion of events_type_distinct_users.  EXACTLY
    SQL-oracled: md5 registers + integer-Z harmonic mean re-derived
    per group in DuckDB, estimate gated in milli-units; pytest
    additionally pins the accuracy envelope vs the exact variant."""
    from ..stages.sketches import grouped_hll_distinct
    return grouped_hll_distinct(
        _read(sf_dir, "events", columns=["event_type", "user_id"]),
        "event_type", "user_id")


def events_markov_transitions(sf_dir: str):
    """Per-user first-order Markov transition counts over the event
    stream (``(prev_type, next_type, n_transitions)``) — the
    next-action / session-graph primitive.  One key-bucket shuffle,
    transition-matrix-sized output; oracle = window ``lag`` over
    ``(user ORDER BY ts, event_id)`` + GROUP BY."""
    from ..stages.windows import grouped_transitions
    return grouped_transitions(
        _read(sf_dir, "events",
              columns=["user_id", "event_type", "ts", "event_id"])
    ).sort(["prev_type", "next_type"])


def token_spectrum_docs(sf_dir: str):
    """Good-Turing frequency spectrum of the corpus vocabulary
    (``(freq, n_tokens)``) — the count-of-counts table LM smoothing
    estimates discounts from.  One token-bucketed exchange of
    per-batch count partials; spectrum-sized thereafter."""
    from ..stages.retrieval import token_count_of_counts
    docs = _read(sf_dir, "documents", columns=["text"])
    return token_count_of_counts(docs).sort("freq")


def bpe_pairs_docs(sf_dir: str):
    """BPE first-iteration merge statistics: adjacent codepoint-pair
    counts weighted by word frequency (``(pair, n_occurrences)``) —
    tokenizer-training support.  Pair expansion runs per batch over
    UNIQUE words only (one vectorized slice per character offset);
    ONE pair-bucketed exchange of combined counts."""
    from ..stages.retrieval import bpe_pair_counts
    docs = _read(sf_dir, "documents", columns=["text"])
    return bpe_pair_counts(docs).sort("pair")


def dedup_containment_docs(sf_dir: str):
    """EXACT n-gram CONTAINMENT pairs (``I / min(|A|, |B|)``) — the
    asymmetric near-dup metric that catches subset duplication (short
    docs quoted whole inside longer ones) which symmetric Jaccard
    dilutes.  Same candidate index and exchanges as dedup_ngram_docs;
    only the final vectorized ratio differs."""
    return ngram_jaccard_pairs(_read(sf_dir, "documents",
                                     columns=["doc_id", "text"]),
                               threshold=0.5, metric="containment")


def ngram_novelty_docs(sf_dir: str):
    """Per-doc n-gram novelty (fraction of distinct 3-grams unique to
    the doc corpus-wide) — the diversity-preference curation signal.
    One gram-bucketed exchange; df never leaves its bucket."""
    from ..stages.dedup import ngram_novelty
    return ngram_novelty(_read(sf_dir, "documents",
                               columns=["doc_id", "text"])).sort("doc_id")


def web_bibcoupling(sf_dir: str):
    """Bibliographic-coupling pair counts over the extracted web link
    graph: source pages sharing outlink targets (``(a_id, b_id,
    n_shared_dst)``) — the structural twin of co-citation, but the
    pair expansion groups by DST, whose in-degree is NOT batch-local:
    ONE dst-bucketed exchange of (dst, src) edge rows co-locates each
    target's citers, then per-dst pair expansion + in-bucket combiner
    → ONE pair-bucketed fold.  In-degree is the skew axis here (a hub
    page cited by 10^6 sources would emit O(indeg²) pairs) — at web
    scale cap per-dst expansion exactly like ngram_jaccard's
    ``max_shingle_df`` stop-shingle guard; exact at fixture densities.
    Oracle: self-join of the link-edge SQL on dst."""
    edges = _web_link_edges_ds(sf_dir)
    MIX = np.uint64(0x9E3779B97F4A7C15)

    def dst_bucket(t: pa.Table) -> pa.Table:
        return t.append_column(
            "_db", pc.cast(pc.bit_wise_and(t.column("dst_id"), 63),
                           pa.int64()))

    def pairs(g: pd.DataFrame) -> pa.Table:
        if len(g) == 0 or "dst_id" not in g.columns:
            return pa.table({"a_id": pa.array([], pa.int64()),
                             "b_id": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "_pb": pa.array([], pa.int64())})
        e = g[["dst_id", "src_id"]]
        m = e.merge(e, on="dst_id")
        m = m[m["src_id_x"] < m["src_id_y"]]
        if len(m) == 0:
            return pa.table({"a_id": pa.array([], pa.int64()),
                             "b_id": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "_pb": pa.array([], pa.int64())})
        c = m.groupby(["src_id_x", "src_id_y"], as_index=False).size()
        a = c["src_id_x"].to_numpy(np.uint64)
        b = c["src_id_y"].to_numpy(np.uint64)
        bk = ((a * MIX + b) & np.uint64(63)).astype(np.int64)
        return pa.table({
            "a_id": pa.array(a.astype(np.int64), pa.int64()),
            "b_id": pa.array(b.astype(np.int64), pa.int64()),
            "n": pa.array(c["size"].to_numpy(np.int64), pa.int64()),
            "_pb": pa.array(bk, pa.int64())})

    def fold(g: pd.DataFrame) -> pa.Table:
        if len(g) == 0 or "a_id" not in g.columns:
            return pa.table({"a_id": pa.array([], pa.int64()),
                             "b_id": pa.array([], pa.int64()),
                             "n_shared_dst": pa.array([], pa.int64())})
        gg = g.groupby(["a_id", "b_id"], as_index=False)["n"].sum()
        return pa.table({
            "a_id": pa.array(gg["a_id"].to_numpy(np.int64), pa.int64()),
            "b_id": pa.array(gg["b_id"].to_numpy(np.int64), pa.int64()),
            "n_shared_dst": pa.array(gg["n"].to_numpy(np.int64),
                                     pa.int64())})

    return (edges.map_batches(dst_bucket, batch_format="pyarrow")
                 .groupby("_db")
                 .map_groups(pairs, batch_format="pandas")
                 .groupby("_pb")
                 .map_groups(fold, batch_format="pandas")
                 .sort(["a_id", "b_id"]))


def domain_lang_pivot_pages(sf_dir: str):
    """Per-host language profile over the CC-style pages corpus
    (``(host, n_en, n_de, n_fr, n_pages)``) — the per-domain language
    mix a multilingual curation pass keys crawl budgets and lang-ID
    escalation off.  Vectorized host extraction (shared RE2), in-batch
    (host, lang) combiner, one tiny host-bucket fold into a fixed-
    column crosstab; oracle = FILTER-aggregation over the exported
    pages artifact."""
    from ..functions.web import url_host_section
    _ensure_gate_pages(sf_dir)
    _, pages_path = pages_for_sf(sf_dir)
    pages = ray.data.read_parquet(pages_path, columns=["url", "lang"])
    langs = ["en", "de", "fr"]

    def partial(t: pa.Table) -> pa.Table:
        host, _, ok = url_host_section(t.column("url"))
        df = pa.table({"host": host,
                       "lang": t.column("lang")}).filter(ok).to_pandas()
        agg = df.groupby(["host", "lang"], as_index=False).size()
        import zlib as _z
        bs = [_z.crc32(h.encode("utf-8")) % 16 for h in agg["host"]]
        return pa.table({
            "host": pa.array(agg["host"], pa.string()),
            "lang": pa.array(agg["lang"], pa.string()),
            "n": pa.array(agg["size"].to_numpy(np.int64), pa.int64()),
            "_b": pa.array(bs, pa.int64())})

    def fold(g: pd.DataFrame) -> pa.Table:
        if len(g) == 0 or "host" not in g.columns:
            return pa.table(
                {"host": pa.array([], pa.string())}
                | {f"n_{lg}": pa.array([], pa.int64()) for lg in langs}
                | {"n_pages": pa.array([], pa.int64())})
        piv = g.pivot_table(index="host", columns="lang", values="n",
                            aggfunc="sum", fill_value=0)
        hosts = piv.index.tolist()
        cols = {"host": pa.array(hosts, pa.string())}
        for lg in langs:
            v = (piv[lg].to_numpy(np.int64) if lg in piv.columns
                 else np.zeros(len(hosts), np.int64))
            cols[f"n_{lg}"] = pa.array(v, pa.int64())
        # n_pages counts EVERY page of the host (langs beyond the
        # fixed pivot columns still count toward the total)
        tot = g.groupby("host")["n"].sum().loc[hosts]
        cols["n_pages"] = pa.array(tot.to_numpy(np.int64), pa.int64())
        return pa.table(cols)

    return (pages.map_batches(partial, batch_format="pyarrow")
                 .groupby("_b")
                 .map_groups(fold, batch_format="pandas")
                 .sort("host"))


def kg_walk_pairs(sf_dir: str):
    """Skip-gram (center, context) pair counts from the deterministic
    walk corpus (window 2) — the graph-embedding training-data export
    step of DeepWalk.  One start-bucket exchange + one pair-bucket
    fold; oracle = self-join of the unrolled walk CTE on step
    distance <= 2."""
    from ..stages.graph import deterministic_walks, walk_skipgram_pairs
    _ensure_gate_artifact(sf_dir)
    walks = deterministic_walks(_kg_result(sf_dir).edges,
                                n_walks=2, walk_len=3)
    return walk_skipgram_pairs(walks, window=2).sort(
        ["center_id", "context_id"])


def tfidf_terms_docs(sf_dir: str):
    """Per-document top-3 TF-IDF keywords
    (``retrieval.tfidf_top_terms``): integer ``tf * idf_e9`` scores
    with the idf quantized once (DSIR discipline) — hash-exact
    oracle."""
    from ..stages.retrieval import tfidf_top_terms
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return tfidf_top_terms(docs, k=3).sort(
        ["doc_id", "score_e9", "term"], descending=[False, True, False])


def crawl_budget_sections(sf_dir: str):
    """Hamilton-apportioned crawl budget (10,000 fetch slots) across
    (host, section) proportional to current page counts — the
    recrawl-planning step downstream of ``domain_stats_pages``.
    Pure integer arithmetic (``relational.largest_remainder_
    allocation``); the allocation always sums exactly to the
    budget."""
    from ..stages.relational import largest_remainder_allocation
    counts = domain_stats_pages(sf_dir)
    return largest_remainder_allocation(
        counts, ["host", "section"], "n_pages", budget=10_000).sort(
        ["host", "section"])


def vocab_coverage_docs(sf_dir: str):
    """Per-document OOV rate against the corpus' own top-1000 token
    vocabulary (``retrieval.vocab_coverage``) — the tokenizer-vocab QA
    pass.  Counts exact; rate one mirrored IEEE division."""
    from ..stages.retrieval import vocab_coverage
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return vocab_coverage(docs).sort("doc_id")


def surprisal_docs(sf_dir: str):
    """Per-document unigram-LM surprisal over the corpus-fitted hashed
    LM (``retrieval.unigram_surprisal``) — the cheap pre-neural quality
    score: boilerplate scores low, rare-vocabulary docs high.  The
    per-bucket weight is quantized once to nano-units on the driver, so
    doc scores are order-free integer sums and the oracle is
    hash-exact."""
    from ..stages.retrieval import unigram_surprisal
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return unigram_surprisal(docs).sort("doc_id")


def dsir_select_docs(sf_dir: str):
    """The SELECTION step DSIR's importance weights exist for: keep
    the top-200 documents by quantized log-likelihood ratio (target =
    English), deterministic tie-break on doc_id — i.e. importance
    resampling's greedy-deterministic variant, the last stage of a
    target-domain mixture build.  Composition of the already-oracled
    ``importance_weights`` with ONE integer-keyed sort+limit; no new
    float surface."""
    from ..stages.retrieval import importance_weights
    docs = _read(sf_dir, "documents", columns=["doc_id", "lang", "text"])
    w = importance_weights(docs, "lang", "en")
    return w.sort(["score_e9", "doc_id"],
                  descending=[True, False]).limit(200)


def host_lang_entropy_pages(sf_dir: str):
    """Gate wrapper over ``relational.host_lang_entropy`` for the
    CC-style pages corpus (column-pruned read: only url + lang leave
    storage)."""
    from ..stages.relational import host_lang_entropy
    _ensure_gate_pages(sf_dir)
    _, pages_path = pages_for_sf(sf_dir)
    pages = ray.data.read_parquet(pages_path, columns=["url", "lang"])
    return host_lang_entropy(pages)


def kg_preferential_attachment(sf_dir: str):
    """Top-20 predicted links of the built KG by preferential
    attachment (``deg(u)*deg(v)`` over the distance-2 non-edge
    candidates) — the degree-product baseline next to Adamic-Adar and
    Jaccard.  All-integer scores; bit-exact oracle."""
    from ..stages.graph import link_prediction_preferential
    _ensure_gate_artifact(sf_dir)
    return link_prediction_preferential(_kg_result(sf_dir).edges, k=20)


def kg_katz(sf_dir: str):
    """Fixed-point Katz centrality of the built KG (attenuation
    ``1/(2*max_degree+1)``, 5 iterations) — reach-weighted centrality
    without PageRank's out-degree normalization.  Integer recurrence
    unrolled as a MATERIALIZED CTE chain in the oracle, bit-exact."""
    from ..stages.graph import katz_fixed
    _ensure_gate_artifact(sf_dir)
    return katz_fixed(_kg_result(sf_dir).edges, n_iter=5).sort("node_id")


def crawl_refresh_diff(sf_dir: str):
    """Snapshot diff over the pages corpus vs a DETERMINISTICALLY
    synthesized recrawl (md5(url) bucket rules, so the SQL oracle
    re-derives v2 independently): bucket 0 pages vanish, bucket 1
    pages change text (content hash moves), bucket 2 pages gain a new
    ``?v2`` sibling url.  Content hashes are md5 (the oracle-able
    choice; swap ``pd.util.hash_array`` at production scale — the
    ``oracle_mode`` idiom of exact dedup)."""
    import hashlib

    from ..stages.joins import snapshot_diff
    _ensure_gate_pages(sf_dir)
    _, pages_path = pages_for_sf(sf_dir)
    pages = ray.data.read_parquet(pages_path, columns=["url", "text"])

    def mk(side: int, col: str):
        def f(t: pa.Table) -> pa.Table:
            urls = t.column("url").to_pylist()
            texts = t.column("text").to_pylist()
            out_u: list[str] = []
            out_h: list[str] = []
            for u, x in zip(urls, texts):
                x = x or ""
                if side == 0:
                    # v1 never consults the url bucket — skip its md5
                    out_u.append(u)
                    out_h.append(hashlib.md5(
                        x.encode("utf-8")).hexdigest())
                    continue
                hb = int(hashlib.md5(
                    u.encode("utf-8")).hexdigest()[:8], 16) % 10
                if hb == 0:
                    continue                           # removed in v2
                xt = x + " [rev2]" if hb == 1 else x
                out_u.append(u)
                out_h.append(hashlib.md5(
                    xt.encode("utf-8")).hexdigest())
                if hb == 2:                            # new sibling
                    out_u.append(u + "?v2")
                    out_h.append(hashlib.md5(
                        x.encode("utf-8")).hexdigest())
            return pa.table({"url": pa.array(out_u, pa.string()),
                             col: pa.array(out_h, pa.string())})
        return f

    v1 = pages.map_batches(mk(0, "th1"), batch_format="pyarrow")
    v2 = pages.map_batches(mk(1, "th2"), batch_format="pyarrow")
    return snapshot_diff(v1, v2)


def kg_bfs_distances(sf_dir: str):
    """Hop-labeled BFS distances of the built KG from the smallest
    node id, 6 hops (``graph.bfs_distances``) — all-integer; oracle is
    an unrolled LEFT-JOIN CTE chain, bit-exact."""
    from ..stages.graph import bfs_distances
    _ensure_gate_artifact(sf_dir)
    return bfs_distances(_kg_result(sf_dir).edges,
                         n_hops=6).sort("node_id")


def kg_assortativity(sf_dir: str):
    """Degree assortativity of the built KG — one scalar (hubs-attach-
    to-hubs vs hubs-attach-to-leaves).  Exact integer moments over
    both edge orientations + the mirrored IEEE Pearson finish
    (``grouped_corr`` discipline), bit-exact oracle."""
    from ..stages.graph import degree_assortativity
    _ensure_gate_artifact(sf_dir)
    return degree_assortativity(_kg_result(sf_dir).edges)


def kg_two_hop_reach(sf_dir: str):
    """Per-node 2-hop reach (friend-of-friend audience size) of the
    built KG — ``deg(v)`` + distinct distance-2 non-neighbors, a pure
    composition over the wedge-candidate machinery.  All integers;
    bit-exact oracle."""
    from ..stages.graph import two_hop_reach
    _ensure_gate_artifact(sf_dir)
    return two_hop_reach(_kg_result(sf_dir).edges).sort("node_id")


def events_value_trend(sf_dir: str):
    """Per-event-type OLS trend (slope cents/second + intercept) of
    value against event time — exact integer moments, mirrored IEEE
    finish (the grouped_corr recipe applied to regression)."""
    from ..stages.relational import grouped_ols_trend
    return grouped_ols_trend(
        _read(sf_dir, "events", columns=["event_type", "ts", "value"]),
        "event_type", "ts", "value")


def events_decayed_value(sf_dir: str):
    """Per-user half-life (7-day) time-decayed value sum — dyadic
    weights ``2^-k`` keep the fold an exact big-int sum; ONE mirrored
    division by ``2^40`` finishes."""
    from ..stages.windows import decayed_sum
    return decayed_sum(
        _read(sf_dir, "events", columns=["user_id", "ts", "value"]))


def ttr_docs(sf_dir: str):
    """Per-document type-token ratio (lexical diversity) — pure map
    stage, exact int counts, one mirrored division."""
    from ..functions.textstats import ttr_batch
    return _read(sf_dir, "documents",
                 columns=["doc_id", "text"]).map_batches(
        ttr_batch, batch_format="pyarrow")


def host_vocab_jaccard_pages(sf_dir: str):
    """Pairwise host-vocabulary Jaccard over the CC-style pages corpus
    (mirror/syndication detection at host granularity) — distinct
    (host, token) combiner, one token-bucket exchange."""
    from ..stages.relational import host_vocab_jaccard
    _ensure_gate_pages(sf_dir)
    _, pages_path = pages_for_sf(sf_dir)
    pages = ray.data.read_parquet(pages_path, columns=["url", "text"])
    return host_vocab_jaccard(pages)


def kg_entity_pmi(sf_dir: str):
    """PMI-normalized entity co-mention strength (log-free exact
    ratio, the pmi_collocations trick over the KG mention graph)."""
    from ..stages.graph import entity_pmi
    _ensure_gate_artifact(sf_dir)
    return entity_pmi(_entity_page_mentions(sf_dir),
                      "url_hash", "node_key")


def char_entropy_docs(sf_dir: str):
    """Per-document character-distribution entropy (mojibake/garbage
    detector) — quantized-ln integer core, pure map stage."""
    from ..functions.textstats import char_entropy_batch
    return _read(sf_dir, "documents",
                 columns=["doc_id", "text"]).map_batches(
        char_entropy_batch, batch_format="pyarrow")


def bigram_surprisal_docs(sf_dir: str):
    """Per-doc bigram-LM conditional surprisal (hashed 256²-cell
    transition model, add-1 smoothing) — integer-quantized scores."""
    from ..stages.retrieval import bigram_surprisal
    return bigram_surprisal(
        _read(sf_dir, "documents", columns=["doc_id", "text"]))


def lang_quality_buckets_docs(sf_dir: str):
    """CCNet-style head/middle/tail quality terciles per language:
    docs ranked by unigram surprisal (integer-exact) and split by
    ntile(3) with doc_id tie-break — deterministic, SQL-exact."""
    from ..stages.retrieval import unigram_surprisal
    from ..stages.windows import grouped_ntile
    docs = _read(sf_dir, "documents",
                 columns=["doc_id", "text", "lang"])
    scored = unigram_surprisal(docs, keep_cols=["lang"])
    return grouped_ntile(scored, "lang", "surprisal_e9", "doc_id", 3)


def crawl_frontier_rounds(sf_dir: str):
    """Politeness-scheduled crawl frontier: every URL gets a 0-based
    fetch round within its (host, section) domain — at most 10 fetches
    per domain per round, deterministic md5(url) order."""
    import hashlib as _h

    from ..functions.web import url_host_section
    from ..stages.relational import grouped_order_rounds
    _ensure_gate_pages(sf_dir)
    _, pages_path = pages_for_sf(sf_dir)
    pages = ray.data.read_parquet(pages_path, columns=["url"])

    def prep(t: pa.Table) -> pa.Table:
        host, sec, ok = url_host_section(t.column("url"))
        tt = pa.table({"url": t.column("url"), "host": host,
                       "section": sec}).filter(ok)
        key = pc.binary_join_element_wise(tt.column("host"),
                                          tt.column("section"), "\x1f")
        ordh = [_h.md5(u.encode()).hexdigest()
                for u in tt.column("url").to_pylist()]
        return tt.append_column("key", key).append_column(
            "ord", pa.array(ordh, pa.string()))

    out = grouped_order_rounds(
        pages.map_batches(prep, batch_format="pyarrow"),
        "key", "ord", rate=10)
    return out.select_columns(["url", "host", "section", "round"])


def kg_cooccurrence_capped(sf_dir: str):
    """Degree-capped co-mention graph (sparsification before the
    expensive graph ops): at most 5 neighbors kept per src_key, chosen
    in deterministic md5(dst_key) order — the per-node cap that bounds
    hub fan-out at web scale."""
    import hashlib as _h

    from ..stages.graph import entity_cooccurrence
    from ..stages.relational import grouped_limit
    _ensure_gate_artifact(sf_dir)
    pairs = entity_cooccurrence(_entity_page_mentions(sf_dir),
                                "url_hash", "node_key")

    def prep(t: pa.Table) -> pa.Table:
        ordh = [_h.md5(d.encode()).hexdigest()
                for d in t.column("dst_key").to_pylist()]
        return t.append_column("ord", pa.array(ordh, pa.string()))

    capped = grouped_limit(pairs.map_batches(prep,
                                             batch_format="pyarrow"),
                           "src_key", "ord", k=5)
    return capped.select_columns(["src_key", "dst_key", "n_pages"])


def multimodal_image_dedup(sf_dir: str):
    """Image-level exact dedup via perceptual dHash over md5-formulaic
    FKIM payloads (seed = item_id % 37 plants duplicates): decode +
    hash in an actor pool, then one dhash-bucket exchange assigns each
    item its group canonical (min item_id) and copy count."""
    from ..stages.joins import str_bucket
    from ..stages.multimodal import PerceptualDHash, formulaic_image_bytes
    n = max(32, _read(sf_dir, "documents", columns=["doc_id"]).count() // 4)

    def gen(batch: dict) -> pa.Table:
        ids = [int(i) for i in batch["id"]]
        return pa.table({
            "item_id": pa.array(ids, pa.int64()),
            "content": pa.array([formulaic_image_bytes(i % 37)
                                 for i in ids], pa.binary())})

    ds = (ray.data.range(n, override_num_blocks=max(2, n // 64))
          .map_batches(gen, batch_format="numpy"))
    hashed = ds.map_batches(PerceptualDHash, batch_format="pyarrow",
                            batch_size=64, concurrency=(1, 2))

    def add_bucket(t: pa.Table) -> pa.Table:
        import pandas as pd
        b = str_bucket(pd.Series(t.column("dhash").to_pylist(),
                                 dtype=object), 16)
        return t.append_column("_b", pa.array(b, pa.int64()))

    def fold(g):
        if len(g) == 0 or "dhash" not in g.columns:
            return pa.table({"item_id": pa.array([], pa.int64()),
                             "dhash": pa.array([], pa.string()),
                             "canonical_id": pa.array([], pa.int64()),
                             "n_copies": pa.array([], pa.int64())})
        g = g.sort_values("item_id", kind="mergesort")
        canon = g.groupby("dhash")["item_id"].transform("min")
        n_copies = g.groupby("dhash")["item_id"].transform("size")
        return pa.table({
            "item_id": pa.array(g["item_id"].to_numpy("int64")),
            "dhash": pa.array(g["dhash"], pa.string()),
            "canonical_id": pa.array(canon.to_numpy("int64")),
            "n_copies": pa.array(n_copies.to_numpy("int64"))})

    return (hashed.map_batches(add_bucket, batch_format="pyarrow")
                  .groupby("_b")
                  .map_groups(fold, batch_format="pandas"))


def kg_attr_completeness(sf_dir: str):
    """KG-QA audit: per (label, attribute) the fraction of canonical
    nodes carrying the attribute after LWW merge — the completeness
    report a KG-construction pipeline ships with every build.  One
    combiner pass over the node table (labels × attrs partials), ONE
    mirrored division."""
    _ensure_gate_artifact(sf_dir)
    nodes = _kg_result(sf_dir).nodes
    meta = {"node_id", "node_key", "label", "n_mentions"}
    attr_cols = sorted(c for c in nodes.schema().names if c not in meta)

    def partial(t: pa.Table) -> pa.Table:
        df = t.select(["label"] + attr_cols).to_pandas()
        g = df.groupby("label")
        labels, attrs, n_nodes, n_present = [], [], [], []
        sizes = g.size()
        for a in attr_cols:
            cnt = g[a].count()
            labels += cnt.index.tolist()
            attrs += [a] * len(cnt)
            n_nodes += [int(v) for v in sizes.to_numpy()]
            n_present += [int(v) for v in cnt.to_numpy()]
        return pa.table({
            "label": pa.array(labels, pa.string()),
            "attr": pa.array(attrs, pa.string()),
            "n_nodes": pa.array(n_nodes, pa.int64()),
            "n_present": pa.array(n_present, pa.int64())})

    folded: dict = {}
    for row in nodes.map_batches(partial,
                                 batch_format="pyarrow").take_all():
        e = folded.setdefault((row["label"], row["attr"]), [0, 0])
        e[0] += int(row["n_nodes"]); e[1] += int(row["n_present"])
    keys = sorted(folded)
    return ray.data.from_arrow(pa.table({
        "label": pa.array([k[0] for k in keys], pa.string()),
        "attr": pa.array([k[1] for k in keys], pa.string()),
        "n_nodes": pa.array([folded[k][0] for k in keys], pa.int64()),
        "n_present": pa.array([folded[k][1] for k in keys], pa.int64()),
        "completeness": pa.array(
            [float(folded[k][1]) / float(folded[k][0]) for k in keys],
            pa.float64())}))


def events_hourly_chi2(sf_dir: str):
    """Per-event-type diurnal seasonality: chi-square of the 24-bin
    hour histogram vs uniform — integer numerator, one division."""
    from ..stages.relational import grouped_hourly_chi2
    return grouped_hourly_chi2(
        _read(sf_dir, "events", columns=["event_type", "ts"]),
        "event_type", "ts")


def events_value_gini(sf_dir: str):
    """Per-event-type Gini coefficient of the value distribution —
    rank-weighted integer sums, deterministic (value, event_id) tie
    order, one mirrored division."""
    from ..stages.relational import grouped_gini
    return grouped_gini(
        _read(sf_dir, "events", columns=["event_type", "value",
                                         "event_id"]),
        "event_type", "value", "event_id")


def events_daily_autocorr(sf_dir: str):
    """Per-event-type lag-1 autocorrelation of zero-filled daily
    counts — integer moments over the driver-folded day series."""
    from ..stages.relational import grouped_daily_autocorr
    return grouped_daily_autocorr(
        _read(sf_dir, "events", columns=["event_type", "ts"]),
        "event_type", "ts")


def token_zipf_slope_docs(sf_dir: str):
    """Zipf slope of the corpus token spectrum (OLS on quantized
    log rank / log count over the deterministic top-100)."""
    from ..stages.retrieval import token_zipf_slope
    return token_zipf_slope(
        _read(sf_dir, "documents", columns=["text"]))


def doc_length_lognormal(sf_dir: str):
    """Per-language lognormal fit of document length: mean/variance of
    quantized ln(n_chars) — the outlier-threshold audit."""
    from ..stages.relational import grouped_log_moments
    return grouped_log_moments(
        _read(sf_dir, "documents", columns=["lang", "n_chars"]),
        "lang", "n_chars")


def kg_ktruss(sf_dir: str):
    """4-truss of the entity co-mention graph — iterative per-edge
    support peel (every surviving edge closes ≥ 2 triangles within the
    subgraph), the cohesion filter above k-core.  Convergence is
    pinned inside the oracle's unrolled-CTE budget."""
    from ..stages.graph import ktruss_edges
    _ensure_gate_artifact(sf_dir)
    return ktruss_edges(_comention_edges(sf_dir), k=4).sort(
        ["src_id", "dst_id"])


# k-truss contract constants: the oracle unrolls KTRUSS_SQL_ROUNDS peel
# rounds; pytest pins KTRUSS_SQL_ROUNDS == graph.KTRUSS_UNROLL (the
# engine's runtime budget) so they cannot drift apart
KTRUSS_K = 4
KTRUSS_SQL_ROUNDS = 6
