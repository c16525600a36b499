"""Incremental KG update: merge a new crawl batch into an existing
snapshot WITHOUT reprocessing old pages.

The reference's FalkorDB sink is incremental by construction — every
extraction batch is MERGE-upserted into the live graph
(`/root/reference/graphrag_sdk/steps/extract_data_step.py:195-230`),
so "add a crawl batch" is its normal mode of operation.  This engine
materializes Parquet snapshots instead, so incrementality needs an
explicit mergeable state.  That state already exists in the dataflow:
the normalized mention rows (``NORMALIZED_SCHEMA``) carry a per-attr
LWW state whose merge (`canonicalize._merge_state`) is associative and
commutative, and mention counts are sums — therefore

    fold(compact(norm(A)) ∪ norm(B))  ==  fold(norm(A ∪ B))

bit-for-bit: an incremental run equals a full rebuild, which is
exactly what the driver gate checks (the incremental queries share the
full-rebuild kg_nodes/kg_edges SQL oracles).

Dataflow per delta batch (sized by the DELTA, not the corpus):
- the snapshot state is a compacted Dataset — ONE row per entity /
  relation key holding the folded LWW state (the compaction fold is
  the same coarse-bucket shuffle every canonicalize exchange uses);
- ``apply_delta`` unions the state with the delta's normalized rows
  (state rows are just another mergeable partial), compacts once, and
  renders nodes/edges with the unchanged ``build_nodes``/
  ``build_edges`` stages — no special-case merge code path to drift
  out of sync with the batch pipeline.

At 100 TB the state table is node+edge-key-sized (not corpus-sized),
lives in partitioned Parquet via ``write_state``/``read_state``, and
each delta re-shuffles only state + delta rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset

from ..keys import KEY_SEP, compose_edge_key, split_edge_key
from ..stages.canonicalize import NORMALIZED_SCHEMA, _fold_group, add_bucket
from ..stages.joins import filter_kind
from .kg_build import KGBuildConfig, build_edges, build_nodes


def _entity_state_fold(df: pd.DataFrame) -> pa.Table:
    acc = _fold_group(df, "node_key", with_unique=True)
    keys = sorted(acc)
    import json
    kind, label, uniq, state, n = [], [], [], [], []
    for k in keys:
        u, st, cnt = acc[k]
        kind.append("entity")
        label.append(k.split(KEY_SEP, 1)[0])
        uniq.append(u)
        state.append(json.dumps(st))
        n.append(cnt)
    return pa.Table.from_arrays(
        [pa.array(kind, pa.string()), pa.array(label, pa.string()),
         pa.array(keys, pa.string()), pa.array(uniq, pa.string()),
         pa.array(state, pa.string()),
         pa.array([None] * len(keys), pa.string()),
         pa.array([None] * len(keys), pa.string()),
         pa.array(n, pa.int64())],
        schema=NORMALIZED_SCHEMA)


def _relation_state_fold(df: pd.DataFrame) -> pa.Table:
    acc = _fold_group(df, "edge_key", with_unique=False)
    keys = sorted(acc)
    import json
    kind, label, sk, dk, state, n = [], [], [], [], [], []
    for k in keys:
        _u, st, cnt = acc[k]
        lb, s, d = split_edge_key(k)
        kind.append("relation")
        label.append(lb)
        sk.append(s)
        dk.append(d)
        state.append(json.dumps(st))
        n.append(cnt)
    return pa.Table.from_arrays(
        [pa.array(kind, pa.string()), pa.array(label, pa.string()),
         pa.array([None] * len(keys), pa.string()),
         pa.array([None] * len(keys), pa.string()),
         pa.array(state, pa.string()), pa.array(sk, pa.string()),
         pa.array(dk, pa.string()), pa.array(n, pa.int64())],
        schema=NORMALIZED_SCHEMA)


def compact_state(normalized: Dataset, cfg: KGBuildConfig) -> Dataset:
    """Fold normalized mention rows to ONE row per entity/relation key
    (the persistent snapshot state).  Two coarse-bucket folds — the
    same exchanges `build_nodes`/`build_edges` run, just emitting
    mergeable ``NORMALIZED_SCHEMA`` rows instead of final tables."""
    ents = filter_kind(normalized, "entity")
    ents = ents.map_batches(
        lambda t: add_bucket(t, "node_key", cfg.n_buckets),
        batch_format="pyarrow")
    ents = ents.groupby("bucket").map_groups(_entity_state_fold,
                                             batch_format="pandas")

    rels = filter_kind(normalized, "relation")

    def with_edge_key(t: pa.Table) -> pa.Table:
        keys = [compose_edge_key(lb, s, d)
                for lb, s, d in zip(t.column("label").to_pylist(),
                                    t.column("src_key").to_pylist(),
                                    t.column("dst_key").to_pylist())]
        t = t.append_column("edge_key", pa.array(keys, pa.string()))
        return add_bucket(t, "edge_key", cfg.n_buckets)

    rels = rels.map_batches(with_edge_key, batch_format="pyarrow")
    rels = rels.groupby("bucket").map_groups(_relation_state_fold,
                                             batch_format="pandas")
    return ents.union(rels)


def apply_delta(state: Dataset, delta_normalized: Dataset,
                cfg: KGBuildConfig):
    """Merge a delta batch into the snapshot: returns
    ``(nodes, edges, new_state)``.  State rows union with the delta's
    normalized rows as ordinary mergeable partials; one compaction
    shuffle, then the unchanged batch finalizers render the tables —
    bit-identical to a full rebuild over all pages."""
    merged = state.union(delta_normalized)
    new_state = compact_state(merged, cfg).materialize()
    nodes = build_nodes(new_state, cfg).materialize()
    edges = build_edges(new_state, nodes, cfg,
                        node_count=nodes.count())
    return nodes, edges, new_state


def write_state(state: Dataset, path: str) -> None:
    """Persist the snapshot state as partitioned Parquet (resumable:
    the next delta run reads it back instead of reprocessing)."""
    state.write_parquet(path)


def read_state(path: str):
    import ray
    return ray.data.read_parquet(path, schema=NORMALIZED_SCHEMA)
