"""Streaming-shaped window operators over an ordered, keyed event log.

Ray Data has no event-time watermarks; the equivalent batch semantics
(ray_guide: treat the log as partitioned by key, sorted by ts within
the partition) are implemented as ``groupby(key).map_groups`` with the
windowing done vectorized inside each sorted group:

- :func:`tumbling_window`: fixed buckets (also in queries.py inline).
- :func:`sliding_count`: per-event trailing-window aggregates via a
  two-pointer sweep (O(n) per key, no self-join).
- :func:`sessionize`: gap-based session assignment.

Each carries an exact SQL oracle (range frames / lag-gap cumulative
sums) in ``__ray_entry__.oracle_sql``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset


def _bucketed(ds: Dataset, key_col: str, n_buckets: int = 64) -> Dataset:
    def add(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return batch.append_column(
            "bucket", pc.cast(pc.bit_wise_and(batch.column(key_col),
                                              n_buckets - 1), pa.int64()))
    return ds.map_batches(add, batch_format="pyarrow")


def sliding_count(ds: Dataset, key_col: str = "user_id", ts_col: str = "ts",
                  id_col: str = "event_id", value_col: str = "value",
                  window_us: int = 3_600_000_000) -> Dataset:
    """Per event: count + cents-sum of this key's events in
    ``[ts - window, ts]`` (trailing window, inclusive both ends —
    matching SQL ``RANGE BETWEEN <w> PRECEDING AND CURRENT ROW``)."""

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        out_frames = []
        for _, g in group.groupby(key_col, sort=False):
            g = g.sort_values([ts_col, id_col]).reset_index(drop=True)
            ts = g[ts_col].astype("int64").to_numpy()
            # half-away-from-zero to match DuckDB round() (values >= 0)
            cents = np.floor(g[value_col].to_numpy() * 100 + 0.5).astype(
                np.int64)
            csum = np.concatenate([[0], np.cumsum(cents)])
            # SQL RANGE-frame semantics: the window is [ts-w, ts] by
            # VALUE, so rows tied on ts (peers) are all included — ends
            # use side="right" on the current ts, not the row position
            starts = np.searchsorted(ts, ts - window_us, side="left")
            ends = np.searchsorted(ts, ts, side="right")
            out_frames.append(pd.DataFrame({
                id_col: g[id_col].astype(np.int64),
                key_col: g[key_col].astype(np.int64),
                "n_in_window": (ends - starts).astype(np.int64),
                "cents_in_window": (csum[ends] - csum[starts]).astype(
                    np.int64),
            }))
        return (pd.concat(out_frames, ignore_index=True) if out_frames
                else pd.DataFrame({id_col: [], key_col: [],
                                   "n_in_window": [], "cents_in_window": []}))

    return (_bucketed(ds, key_col).groupby("bucket")
            .map_groups(per_bucket, batch_format="pandas"))


def sessionize(ds: Dataset, key_col: str = "user_id", ts_col: str = "ts",
               id_col: str = "event_id",
               gap_us: int = 1_800_000_000) -> Dataset:
    """Gap-based sessions: a new session starts when the inter-event gap
    within a key EXCEEDS ``gap_us``.  Output: one row per session
    ``(key, session_start_epoch, session_end_epoch, n_events)``."""

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        rows = {key_col: [], "session_start_epoch": [],
                "session_end_epoch": [], "n_events": []}
        for key, g in group.groupby(key_col, sort=False):
            g = g.sort_values([ts_col, id_col])
            ts = g[ts_col].astype("int64").to_numpy()
            new = np.concatenate([[True], np.diff(ts) > gap_us])
            session_ids = np.cumsum(new)
            for _, idxs in pd.Series(range(len(ts))).groupby(session_ids):
                i = idxs.to_numpy()
                rows[key_col].append(int(key))
                rows["session_start_epoch"].append(int(ts[i[0]] // 1_000_000))
                rows["session_end_epoch"].append(int(ts[i[-1]] // 1_000_000))
                rows["n_events"].append(len(i))
        out = pd.DataFrame(rows)
        for c in rows:
            out[c] = out[c].astype(np.int64)
        return out

    return (_bucketed(ds, key_col).groupby("bucket")
            .map_groups(per_bucket, batch_format="pandas"))
