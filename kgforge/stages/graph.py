"""Graph analytics over the built knowledge graph.

The reference stops at graph *construction* (nodes/edges upserted into
FalkorDB, ``extract_data_step.py``); any analysis happens inside the
graph DB.  Here the KG is a pair of Datasets, so the classic read-side
operators are expressed Ray-Data-first:

- :func:`degree_table`: per-node in/out/total degree — one combiner
  pass over edges, ONE coarse-bucket fold (never a per-node group).
- :func:`entity_cooccurrence`: co-mention pair weights — pages are the
  natural partition key, pairs are emitted per page and counted with a
  bucketed fold.
- :func:`pagerank`: fixed-iteration damped PageRank with dangling-mass
  redistribution.  The edge list stays distributed and is indexed ONCE
  (src/dst positions in a sorted node vector); each iteration is one
  ``map_batches`` over the materialized edge blocks with the rank
  vector broadcast via ``ray.put`` (8 B/node — ~80 MB at 10M nodes,
  the documented driver bound) and a node-sized partial-sum collect.
  At billions of nodes the same loop runs with ranks co-partitioned by
  dst bucket instead of broadcast; the per-iteration dataflow
  (edge-parallel contribution scatter + keyed reduce) is unchanged.
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
from ray.data import Dataset


def degree_table(edges: Dataset, src_col: str = "src_id",
                 dst_col: str = "dst_id", n_buckets: int = 64) -> Dataset:
    """Per-node (out_degree, in_degree, degree) from an edge list.
    Per-batch ``value_counts`` combiner on both endpoint columns →
    one bucketed fold; a node appearing only as src (or only dst)
    gets 0 for the other side."""

    def partial(batch: pa.Table) -> pa.Table:
        src = batch.column(src_col).to_numpy(zero_copy_only=False)
        dst = batch.column(dst_col).to_numpy(zero_copy_only=False)
        su, sc = np.unique(src, return_counts=True)
        du, dc = np.unique(dst, return_counts=True)
        node = np.concatenate([su, du])
        out_n = np.concatenate([sc, np.zeros(len(du), np.int64)])
        in_n = np.concatenate([np.zeros(len(su), np.int64), dc])
        return pa.table({
            "node_id": pa.array(node, pa.uint64()),
            "out_degree": pa.array(out_n, pa.int64()),
            "in_degree": pa.array(in_n, pa.int64()),
            "bucket": pa.array((node % n_buckets).astype(np.int64),
                               pa.int64())})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("node_id", as_index=False).agg(
            out_degree=("out_degree", "sum"), in_degree=("in_degree", "sum"))
        agg["out_degree"] = agg["out_degree"].astype(np.int64)
        agg["in_degree"] = agg["in_degree"].astype(np.int64)
        agg["degree"] = agg["out_degree"] + agg["in_degree"]
        return agg[["node_id", "out_degree", "in_degree", "degree"]]

    return (edges.map_batches(partial, batch_format="pyarrow")
                 .groupby("bucket")
                 .map_groups(fold, batch_format="pandas"))


def entity_cooccurrence(page_entities: Dataset, page_col: str,
                        key_col: str, min_pages: int = 1,
                        n_buckets: int = 64) -> Dataset:
    """Entity co-mention pairs: for every unordered pair of distinct
    entities mentioned on the same page, the number of distinct pages
    mentioning both.  ``groupby(page)`` collects one page's mentions on
    one worker (pages are small — the bounded-group contract), emits
    each pair once per page, then a bucketed fold sums page counts.
    Output: (src_key, dst_key, n_pages) with src_key < dst_key."""

    def page_bucket(batch: pa.Table) -> pa.Table:
        pages = batch.column(page_col).to_numpy(zero_copy_only=False)
        return batch.append_column(
            "bucket", pa.array((pages % n_buckets).astype(np.int64),
                               pa.int64()))

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        # pages never span buckets, so in-bucket dedupe is global; the
        # self-merge builds every within-page pair vectorized
        pk = (g[[page_col, key_col]]
              .drop_duplicates([page_col, key_col]))
        m = pk.merge(pk, on=page_col, suffixes=("_a", "_b"))
        m = m[m[f"{key_col}_a"] < m[f"{key_col}_b"]]
        c = (m.groupby([f"{key_col}_a", f"{key_col}_b"], as_index=False)
              .size())
        buckets = [zlib.crc32(f"{a}\x1f{b}".encode()) % n_buckets
                   for a, b in zip(c[f"{key_col}_a"], c[f"{key_col}_b"])]
        return pd.DataFrame({
            "src_key": c[f"{key_col}_a"].astype(str),
            "dst_key": c[f"{key_col}_b"].astype(str),
            "n": c["size"].astype(np.int64),
            "pair_bucket": np.asarray(buckets, np.int64)})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby(["src_key", "dst_key"], as_index=False)["n"].sum()
        agg = agg[agg["n"] >= min_pages]
        agg = agg.rename(columns={"n": "n_pages"})
        agg["n_pages"] = agg["n_pages"].astype(np.int64)
        return agg

    return (page_entities.map_batches(page_bucket, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(pairs, batch_format="pandas")
            .groupby("pair_bucket")
            .map_groups(fold, batch_format="pandas"))


def pagerank(edges: Dataset, src_col: str = "src_id",
             dst_col: str = "dst_id", damping: float = 0.85,
             n_iter: int = 20) -> pd.DataFrame:
    """Damped PageRank with uniform dangling-mass redistribution, fixed
    ``n_iter`` power iterations.  Returns a pandas DataFrame
    (node_id, pagerank) — node-sized, like every rank vector here.

    Dataflow: the node universe and out-degrees are derived from the
    edge list with one :func:`degree_table` pass (node-sized collect);
    edges are re-indexed to positions ONCE and materialized; each
    iteration broadcasts the per-node outgoing contribution (rank /
    out_degree) and scatters it edge-parallel with ``np.bincount``
    partials folded per block, so only node-sized vectors ever cross
    the driver boundary — never the edge list."""
    if n_iter < 1:
        raise ValueError("n_iter must be >= 1")

    deg = degree_table(edges, src_col, dst_col).to_pandas()
    nodes = np.sort(deg["node_id"].to_numpy(np.uint64))
    outdeg = np.zeros(len(nodes), np.int64)
    pos = np.searchsorted(nodes, deg["node_id"].to_numpy(np.uint64))
    outdeg[pos] = deg["out_degree"].to_numpy(np.int64)
    n = len(nodes)
    if n == 0:
        return pd.DataFrame({"node_id": pd.Series([], dtype=np.uint64),
                             "pagerank": pd.Series([], dtype=np.float64)})
    nodes_ref = ray.put(nodes)

    def index_edges(batch: pa.Table) -> pa.Table:
        nds = ray.get(nodes_ref)
        s = np.searchsorted(nds, batch.column(src_col)
                            .to_numpy(zero_copy_only=False))
        d = np.searchsorted(nds, batch.column(dst_col)
                            .to_numpy(zero_copy_only=False))
        return pa.table({"si": pa.array(s, pa.int64()),
                         "di": pa.array(d, pa.int64())})

    indexed = (edges.select_columns([src_col, dst_col])
               .map_batches(index_edges, batch_format="pyarrow")
               .materialize())

    rank = np.full(n, 1.0 / n, np.float64)
    safe_out = np.maximum(outdeg, 1)
    for _ in range(n_iter):
        contrib_ref = ray.put(rank / safe_out)

        def scatter(batch: pa.Table) -> pa.Table:
            c = ray.get(contrib_ref)
            si = batch.column("si").to_numpy()
            di = batch.column("di").to_numpy()
            sums = np.bincount(di, weights=c[si], minlength=len(c))
            nz = np.flatnonzero(sums)
            return pa.table({"i": pa.array(nz, pa.int64()),
                             "s": pa.array(sums[nz], pa.float64())})

        parts = indexed.map_batches(scatter,
                                    batch_format="pyarrow").to_pandas()
        incoming = np.zeros(n, np.float64)
        np.add.at(incoming, parts["i"].to_numpy(np.int64),
                  parts["s"].to_numpy(np.float64))
        dangling = rank[outdeg == 0].sum()
        rank = ((1.0 - damping) / n
                + damping * (incoming + dangling / n))

    return pd.DataFrame({"node_id": nodes, "pagerank": rank})


def connected_components(edges: Dataset, src_col: str = "src_id",
                         dst_col: str = "dst_id",
                         max_sweeps: int = 64) -> pd.DataFrame:
    """Undirected connected components by distributed min-label
    propagation: ``component_id`` = the minimum node id reachable from
    each node.  Returns a node-sized pandas DataFrame
    (node_id, component_id) over the edge-connected node universe
    (isolated nodes never appear in an edge list).

    Unlike the driver union-find in ``dedup.dedup_clusters`` (bounded
    by PAIR count), the edge list here stays distributed: per sweep,
    each edge block emits sparse (node_pos, min_label) partials
    (vectorized two-sided minimum + in-block reduce) and only
    node-sized vectors reach the driver, where labels are
    path-compressed (label := label-of-label until stable) so sweeps
    converge in O(log n), not graph diameter."""
    deg = degree_table(edges, src_col, dst_col).to_pandas()
    nodes = np.sort(deg["node_id"].to_numpy(np.uint64))
    n = len(nodes)
    if n == 0:
        return pd.DataFrame({
            "node_id": pd.Series([], dtype=np.uint64),
            "component_id": pd.Series([], dtype=np.uint64)})
    nodes_ref = ray.put(nodes)

    def index_edges(batch: pa.Table) -> pa.Table:
        nds = ray.get(nodes_ref)
        s = np.searchsorted(nds, batch.column(src_col)
                            .to_numpy(zero_copy_only=False))
        d = np.searchsorted(nds, batch.column(dst_col)
                            .to_numpy(zero_copy_only=False))
        keep = s != d
        return pa.table({"si": pa.array(s[keep], pa.int64()),
                         "di": pa.array(d[keep], pa.int64())})

    indexed = (edges.select_columns([src_col, dst_col])
               .map_batches(index_edges, batch_format="pyarrow")
               .materialize())

    labels = nodes.copy()                      # label = own id initially
    for _ in range(max_sweeps):
        lab_ref = ray.put(labels)

        def sweep(batch: pa.Table) -> pa.Table:
            lab = ray.get(lab_ref)
            si = batch.column("si").to_numpy()
            di = batch.column("di").to_numpy()
            m = np.minimum(lab[si], lab[di])
            idx = np.concatenate([si, di])
            cand = np.concatenate([m, m])
            df = pd.DataFrame({"i": idx, "m": cand})
            g = df.groupby("i", as_index=False)["m"].min()
            return pa.table({"i": pa.array(g["i"], pa.int64()),
                             "m": pa.array(g["m"].to_numpy(np.uint64),
                                           pa.uint64())})

        parts = indexed.map_batches(sweep,
                                    batch_format="pyarrow").to_pandas()
        new = labels.copy()
        np.minimum.at(new, parts["i"].to_numpy(np.int64),
                      parts["m"].to_numpy(np.uint64))
        # driver path compression: labels are node ids, so chase them
        # through the label vector until fixed (O(log n) chases)
        while True:
            chased = new[np.searchsorted(nodes, new)]
            if np.array_equal(chased, new):
                break
            new = np.minimum(new, chased)
        if np.array_equal(new, labels):
            break
        labels = new

    return pd.DataFrame({"node_id": nodes, "component_id": labels})


def k_hop(edges: Dataset, n_seeds: int = 5, k: int = 2,
          src_col: str = "src_id", dst_col: str = "dst_id",
          seeds: "np.ndarray | None" = None) -> pd.DataFrame:
    """Undirected k-hop neighborhood (BFS) from a seed set: returns
    (node_id, hops) where hops = minimum number of edges from any seed
    (0 for the seeds themselves), restricted to hops <= k.  Default
    seed rule — the ``n_seeds`` smallest node ids in the edge-connected
    universe — is deterministic and SQL-expressible, so the driver gate
    can oracle it with a bounded recursive CTE.

    Scale shape: the edge list stays distributed and is scanned once
    per hop (k scans total); each scan is a vectorized ``pc.is_in``
    against the broadcast frontier and returns only per-block DISTINCT
    neighbor ids.  Driver state is the visited/frontier vectors —
    bounded by the k-hop neighborhood size, the same node-sized driver
    bound as :func:`pagerank` / :func:`connected_components` (at
    billions of reached nodes the frontier would instead stay a keyed
    Dataset and the dedup-vs-visited becomes an anti-join; per-hop
    dataflow unchanged).

    Reference: graph traversal happens inside FalkorDB via generated
    Cypher (graphrag_sdk/kg.py ask/query path); here it is a native
    Ray dataflow over the edge table."""
    deg = degree_table(edges, src_col, dst_col).to_pandas()
    universe = np.sort(deg["node_id"].to_numpy(np.uint64))
    if len(universe) == 0:
        return pd.DataFrame({
            "node_id": pd.Series([], dtype=np.uint64),
            "hops": pd.Series([], dtype=np.int64)})
    if seeds is None:
        seeds = universe[:n_seeds]
    seeds = np.unique(np.asarray(seeds, dtype=np.uint64))

    pruned = edges.select_columns([src_col, dst_col]).materialize()
    hops = {int(s): 0 for s in seeds}
    frontier = seeds
    for hop in range(1, k + 1):
        fr_ref = ray.put(frontier)

        def expand(batch: pa.Table) -> pa.Table:
            fr = ray.get(fr_ref)
            s = batch.column(src_col).to_numpy(zero_copy_only=False)
            d = batch.column(dst_col).to_numpy(zero_copy_only=False)
            out = np.concatenate([
                d[np.isin(s, fr)], s[np.isin(d, fr)]])
            return pa.table({"n": pa.array(np.unique(out), pa.uint64())})

        reached = pruned.map_batches(
            expand, batch_format="pyarrow").to_pandas()
        nxt = np.unique(reached["n"].to_numpy(np.uint64)) \
            if len(reached) else np.array([], dtype=np.uint64)
        fresh = np.array([n for n in nxt if int(n) not in hops],
                         dtype=np.uint64)
        for n in fresh:
            hops[int(n)] = hop
        if len(fresh) == 0:
            break
        frontier = fresh

    ids = np.array(sorted(hops), dtype=np.uint64)
    return pd.DataFrame({
        "node_id": ids,
        "hops": np.array([hops[int(i)] for i in ids], dtype=np.int64)})
