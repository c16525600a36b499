"""Endpoint-resolution semi-join.

The reference resolves edge endpoints with ``MATCH src MATCH dst MERGE``
(``graphrag_sdk/steps/extract_data_step.py:266``): an inner semi-join of
edges against the node set on the unique-attr identity, where dangling
edges silently no-op.

Two exact strategies, picked by node-table size:

- ``broadcast``: collect the node-key set once, ``ray.put`` it, and
  filter inside ``map_batches`` — no shuffle; right-sized for node
  tables up to ~10^7 keys.
- ``join``: hash-partitioned ``Dataset.join`` (Ray >= 2.46) on the key —
  both sides shuffle once; the scale path when the node set outgrows a
  single worker's heap.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray
from ray.data import Dataset

_BCAST_CACHE: dict[str, object] = {}


def _broadcast_cache(ref):
    """Resolve a broadcast ObjectRef once per worker process (bounded)."""
    key = ref.hex()
    if key not in _BCAST_CACHE:
        if len(_BCAST_CACHE) >= 4:
            _BCAST_CACHE.clear()
        _BCAST_CACHE[key] = ray.get(ref)
    return _BCAST_CACHE[key]


def collect_key_set(ds: Dataset, col: str) -> set:
    """Driver-side streaming collect of one key column into a set."""
    keys: set = set()
    for batch in ds.select_columns([col]).iter_batches(
            batch_size=65536, batch_format="pyarrow"):
        keys.update(batch.column(col).to_pylist())
    return keys


def filter_keys_in_broadcast(left: Dataset, key_set_ref,
                             cols: list[str]) -> Dataset:
    """Keep rows where EVERY column in ``cols`` hits the broadcast key set
    — the endpoint existence check for src and dst in ONE pass."""

    def _filter(batch: pa.Table) -> pa.Table:
        key_set = _broadcast_cache(key_set_ref)
        n = batch.num_rows
        mask = [True] * n
        for col in cols:
            vals = batch.column(col).to_pylist()
            mask = [m and (v in key_set) for m, v in zip(mask, vals)]
        return batch.filter(pa.array(mask))

    return left.map_batches(_filter, batch_format="pyarrow")


def semi_join_keys(left: Dataset, right_keys: Dataset, left_col: str,
                   right_col: str, strategy: str = "auto",
                   num_partitions: int = 32,
                   broadcast_limit: int = 2_000_000,
                   right_count: int | None = None) -> Dataset:
    """Rows of ``left`` whose ``left_col`` exists in ``right_keys[right_col]``."""
    if strategy == "auto":
        n = right_count if right_count is not None else right_keys.count()
        strategy = "broadcast" if n <= broadcast_limit else "join"

    if strategy == "broadcast":
        keys: set[str] = set()
        for batch in right_keys.select_columns([right_col]).iter_batches(
                batch_size=65536, batch_format="pyarrow"):
            keys.update(batch.column(right_col).to_pylist())
        ref = ray.put(keys)

        def _filter(batch: pa.Table) -> pa.Table:
            # stateless task (no actor pool — a pool could starve sibling
            # operators on small clusters); the broadcast set is fetched
            # zero-copy-ish from the local object store and cached per
            # worker process.
            key_set = _broadcast_cache(ref)
            mask = pa.array([k in key_set
                             for k in batch.column(left_col).to_pylist()])
            return batch.filter(mask)

        return left.map_batches(_filter, batch_format="pyarrow")

    if strategy == "join":
        # PRECONDITION: right_keys must be distinct on right_col — an
        # inner join emits one row per matching right row, so duplicate
        # keys would duplicate left rows (the broadcast branch is a true
        # semi-join).  The canonicalized node table satisfies this by
        # construction.
        right = right_keys.select_columns([right_col])
        joined = left.join(right, join_type="inner",
                           num_partitions=num_partitions,
                           on=(left_col,), right_on=(right_col,),
                           left_suffix="", right_suffix="_r")
        drop = [c for c in joined.schema().names
                if c == right_col or c == f"{right_col}_r"]
        # guard: joining on same-named columns keeps only the left one
        drop = [c for c in drop if c != left_col]
        if drop:
            joined = joined.drop_columns(drop)
        return joined

    raise ValueError(f"unknown semi-join strategy {strategy!r}")


def filter_kind(ds: Dataset, kind: str) -> Dataset:
    """Vectorized branch filter on the normalized-mention ``kind`` column."""
    return ds.map_batches(
        lambda t: t.filter(pc.equal(t.column("kind"), kind)),
        batch_format="pyarrow")
