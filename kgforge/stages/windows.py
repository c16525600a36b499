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
import pyarrow.compute as pc

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


def hopping_window(ds: Dataset, ts_col: str = "ts",
                   key_col: str = "event_type", value_col: str = "value",
                   window_s: int = 3600, hop_s: int = 900) -> Dataset:
    """Overlapping (hopping) windows: every event is counted in each of
    the ``window_s/hop_s`` windows covering it.  Per-batch flat-map to
    (key, window_start) partial aggregates — the combiner — then one
    small groupby; shuffle volume is O(distinct (key, window) ×
    batches), never O(events × windows)."""
    import pyarrow.compute as pc

    n_hops = -(-window_s // hop_s)

    def partial(batch: pa.Table) -> pa.Table:
        micros = batch.column(ts_col).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        secs = micros // 1_000_000
        keys = np.asarray(batch.column(key_col).to_pylist(), dtype=object)
        cents = pc.floor(pc.add(pc.multiply(
            batch.column(value_col), 100), 0.5)).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        rows = {"key": [], "window_start": [], "n": [], "value_cents": []}
        for h in range(n_hops):
            # window start covering the event at hop offset h
            ws = ((secs - h * hop_s) // hop_s) * hop_s
            live = ws + window_s > secs          # event inside [ws, ws+W)
            df = pd.DataFrame({"key": keys[live], "ws": ws[live],
                               "c": cents[live]})
            g = (df.groupby(["key", "ws"], as_index=False)
                   .agg(n=("c", "size"), value_cents=("c", "sum")))
            rows["key"].extend(g["key"])
            rows["window_start"].extend(g["ws"])
            rows["n"].extend(g["n"])
            rows["value_cents"].extend(g["value_cents"])
        return pa.table({
            "key": pa.array(rows["key"], pa.string()),
            "window_start": pa.array(rows["window_start"], pa.int64()),
            "n": pa.array(rows["n"], pa.int64()),
            "value_cents": pa.array(rows["value_cents"], pa.int64())})

    from ray.data.aggregate import Sum
    return (ds.map_batches(partial, batch_format="pyarrow")
              .groupby(["key", "window_start"])
              .aggregate(Sum("n", alias_name="n"),
                         Sum("value_cents", alias_name="value_cents"))
              .map_batches(lambda t: t.set_column(
                  t.schema.get_field_index("n"), "n",
                  t.column("n").cast(pa.int64())).set_column(
                  t.schema.get_field_index("value_cents"), "value_cents",
                  t.column("value_cents").cast(pa.int64())),
                  batch_format="pyarrow"))


def grouped_top_k(ds: Dataset, group_col: str, key_col: str,
                  k: int = 5, n_buckets: int = 64) -> Dataset:
    """Top-k ``key_col`` values by count within each ``group_col`` —
    heavy hitters per group.  Per-batch count combiner → bucket fold on
    (group, key) → per-group vectorized head-k (ties: ascending key)."""

    def partial(batch: pa.Table) -> pa.Table:
        # type-preserving: carry the INPUT column types explicitly — an
        # empty batch must not emit null-typed 'g'/'k' columns that clash
        # with typed blocks at the downstream groupby
        g_type = batch.schema.field(group_col).type
        k_type = batch.schema.field(key_col).type
        df = pd.DataFrame({
            "g": batch.column(group_col).to_pylist(),
            "k": batch.column(key_col).to_pylist()})
        c = df.groupby(["g", "k"], as_index=False).size()
        from .joins import str_bucket
        buckets = str_bucket(c["g"].astype(str) + "\x1f"
                             + c["k"].astype(str), n_buckets)
        return pa.table({"g": pa.array(c["g"].tolist(), g_type),
                         "k": pa.array(c["k"].tolist(), k_type),
                         "n": pa.array(c["size"].tolist(), pa.int64()),
                         "bucket": pa.array(buckets, pa.int64())})

    def fold(group: pd.DataFrame) -> pd.DataFrame:
        g = group.groupby(["g", "k"], as_index=False)["n"].sum()
        g["n"] = g["n"].astype(np.int64)
        return g[["g", "k", "n"]]

    counts = (ds.map_batches(partial, batch_format="pyarrow")
                .groupby("bucket")
                .map_groups(fold, batch_format="pandas"))

    def topk(group: pd.DataFrame) -> pd.DataFrame:
        return (group.sort_values(["n", "k"], ascending=[False, True],
                                  kind="mergesort").head(k))

    return (counts.groupby("g").map_groups(topk, batch_format="pandas")
            .map_batches(lambda t: t.rename_columns(
                [group_col, key_col, "n"]), batch_format="pyarrow"))


def grouped_percent_rank(ds: Dataset, group_col: str, value_col: str,
                         id_col: str) -> Dataset:
    """SQL ``percent_rank() OVER (PARTITION BY group ORDER BY value)``:
    ``(min_rank - 1) / (n - 1)`` per group, 0.0 for singleton groups —
    both sides integer-exact before ONE IEEE division, so the DuckDB
    oracle matches bit-for-bit.  One coarse-bucket shuffle (groups
    hash-bucketed, many groups per fold — never a per-group task); the
    fold ranks ALL of its groups in one vectorized pandas
    ``groupby().rank(method="min")``.  Null values and null group keys
    are dropped up front (mirrored by the oracle, the running-total
    convention) — a NaN value makes pandas ``rank()`` emit NaN, which
    the int64 cast silently garbles.  Partitioning assumption: one
    group fits one worker (the keyed-window contract); for a single
    giant group use the sort + ``split_at_indices`` rank machinery of
    ``exact_quantiles`` instead."""

    def add_bucket(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(t.column(value_col).is_valid(),
                             t.column(group_col).is_valid()))
        from .joins import key_bucket
        return t.append_column(
            "bucket", key_bucket(t.column(group_col), 16))

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            # typed empty frame: pandas groupby on empty drops columns,
            # which degrades the downstream schema union
            return pd.DataFrame({
                id_col: pd.Series([], dtype=np.int64),
                group_col: g[group_col] if group_col in g else
                pd.Series([], dtype=object),
                "pct_rank": pd.Series([], dtype=np.float64)})
        grp = g.groupby(group_col)[value_col]
        ranks = grp.rank(method="min").to_numpy(np.int64)
        n = grp.transform("size").to_numpy(np.int64)
        pct = ((ranks - 1).astype(np.float64)
               / np.maximum(n - 1, 1).astype(np.float64))
        return pd.DataFrame({
            id_col: g[id_col].to_numpy(np.int64),
            group_col: g[group_col].to_numpy(),
            "pct_rank": pct})

    return (ds.select_columns([id_col, group_col, value_col])
              .map_batches(add_bucket, batch_format="pyarrow")
              .groupby("bucket")
              .map_groups(fold, batch_format="pandas"))


def grouped_sequence_features(ds: Dataset, key_col: str, ts_col: str,
                              id_col: str, value_col: str) -> Dataset:
    """Per-key ordered sequence features — the per-user signals a
    training-data featurizer derives from an event log: 1-based
    ``seq_no`` (SQL ``row_number()``), microsecond gap to the previous
    event (``delta_us``, -1 for the first event — SQL
    ``COALESCE(epoch_us(ts) - lag(...), -1)``), and the running
    integer-cents sum of ``value_col`` (``run_cents``).  One
    coarse-bucket shuffle (keys hash-bucketed, many keys per fold —
    the per-tiny-group trap avoided); the fold sorts its bucket ONCE by
    (key, ts, id) and derives all three features with key-boundary
    masks, vectorized across every key at once.  Outputs are
    integer-exact so the DuckDB window oracle matches bit-for-bit.
    Null values and null keys are dropped up front (mirrored by the
    oracle, the running-total convention) — a NaN value would poison
    the running cents cumsum.
    Partitioning assumption: one key's history fits one worker (the
    keyed-window contract shared by :func:`sliding_count` /
    :func:`sessionize`)."""

    def drop_null(t: pa.Table) -> pa.Table:
        return t.filter(pc.and_(t.column(value_col).is_valid(),
                                t.column(key_col).is_valid()))

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({
                id_col: pd.Series([], dtype=np.int64),
                key_col: pd.Series([], dtype=np.int64),
                "seq_no": pd.Series([], dtype=np.int64),
                "delta_us": pd.Series([], dtype=np.int64),
                "run_cents": pd.Series([], dtype=np.int64)})
        g = g.sort_values([key_col, ts_col, id_col], kind="mergesort")
        ts_us = g[ts_col].to_numpy("datetime64[us]").astype(np.int64)
        key = g[key_col].to_numpy(np.int64)
        n = len(g)
        new_key = np.empty(n, np.bool_)
        new_key[0] = True
        new_key[1:] = key[1:] != key[:-1]
        starts = np.flatnonzero(new_key)
        # seq_no: position minus the start of this key's run, 1-based
        run_start = np.maximum.accumulate(
            np.where(new_key, np.arange(n), 0))
        seq = np.arange(n, dtype=np.int64) - run_start + 1
        delta = np.empty(n, np.int64)
        delta[0] = -1
        delta[1:] = ts_us[1:] - ts_us[:-1]
        delta[starts] = -1
        cents = np.floor(g[value_col].to_numpy(np.float64) * 100
                         + 0.5).astype(np.int64)
        csum = np.cumsum(cents)
        # subtract the cumsum just before each key's first row
        base = np.where(starts > 0, csum[starts - 1], 0)
        run = csum - np.repeat(base, np.diff(
            np.append(starts, n)))
        return pd.DataFrame({
            id_col: g[id_col].to_numpy(np.int64),
            key_col: key,
            "seq_no": seq,
            "delta_us": delta,
            "run_cents": run})

    return (_bucketed(ds.select_columns(
                [id_col, key_col, ts_col, value_col])
                .map_batches(drop_null, batch_format="pyarrow"), key_col)
            .groupby("bucket")
            .map_groups(fold, batch_format="pandas"))


def grouped_ntile(ds: Dataset, group_col: str, value_col: str,
                  id_col: str, n_tiles: int) -> Dataset:
    """SQL ``ntile(k) OVER (PARTITION BY group ORDER BY value, id)``:
    rows of each group split into ``k`` ordered buckets, the first
    ``n % k`` buckets one row larger — the id tie-break makes the
    assignment deterministic, so the DuckDB oracle matches exactly
    (bare ``ORDER BY value`` ntile is tie-order-dependent and
    un-oracleable).  Same dataflow as :func:`grouped_percent_rank`:
    one coarse-bucket shuffle, the fold ranks ALL of its groups in one
    vectorized pandas sort + per-group positional arithmetic.
    Null values and null group keys are dropped up front (mirrored by
    the oracle, the running-total convention).
    Partitioning assumption: one group fits one worker."""
    if n_tiles < 1:
        raise ValueError("n_tiles must be >= 1")

    def add_bucket(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(t.column(value_col).is_valid(),
                             t.column(group_col).is_valid()))
        from .joins import key_bucket
        return t.append_column(
            "bucket", key_bucket(t.column(group_col), 16))

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({
                id_col: pd.Series([], dtype=np.int64),
                group_col: g[group_col] if group_col in g else
                pd.Series([], dtype=object),
                "tile": pd.Series([], dtype=np.int64)})
        g = g.sort_values([group_col, value_col, id_col],
                          kind="mergesort")
        # 0-based position within group + group size, both vectorized
        sizes = g.groupby(group_col, sort=False)[id_col] \
                 .transform("size").to_numpy(np.int64)
        pos = np.arange(len(g), dtype=np.int64)
        starts = np.zeros(len(g), dtype=np.int64)
        grp_change = np.empty(len(g), dtype=bool)
        keys = g[group_col].to_numpy()
        grp_change[0] = True
        grp_change[1:] = keys[1:] != keys[:-1]
        starts[grp_change] = pos[grp_change]
        starts = np.maximum.accumulate(starts)
        i = pos - starts                       # 0-based rank in group
        q, r = sizes // n_tiles, sizes % n_tiles
        big = (q + 1) * r                      # rows in the larger tiles
        in_big = i < big
        tile = np.where(
            in_big,
            i // np.maximum(q + 1, 1),
            r + (i - big) // np.maximum(q, 1)) + 1
        return pd.DataFrame({
            id_col: g[id_col].to_numpy(np.int64),
            group_col: keys,
            "tile": tile.astype(np.int64)})

    return (ds.select_columns([id_col, group_col, value_col])
              .map_batches(add_bucket, batch_format="pyarrow")
              .groupby("bucket")
              .map_groups(fold, batch_format="pandas"))


def grouped_rank(ds: Dataset, group_col: str, value_col: str,
                 id_col: str) -> Dataset:
    """SQL ``rank()`` and ``dense_rank() OVER (PARTITION BY group
    ORDER BY value)`` in one keyed pass.  Both are integer-exact and
    well-defined under ties (no tie-break column needed, unlike
    ntile), so the DuckDB oracle matches bit-for-bit.  Same dataflow
    as :func:`grouped_percent_rank`: one coarse-bucket shuffle, the
    fold ranks ALL of its groups with vectorized pandas kernels.
    Null values and null group keys are dropped up front (mirrored by
    the oracle, the running-total convention) — NaN poisons the rank
    int64 cast.  Partitioning assumption: one group fits one worker."""

    def add_bucket(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(t.column(value_col).is_valid(),
                             t.column(group_col).is_valid()))
        from .joins import key_bucket
        return t.append_column(
            "bucket", key_bucket(t.column(group_col), 16))

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({
                id_col: pd.Series([], dtype=np.int64),
                group_col: pd.Series([], dtype=object),
                "rnk": pd.Series([], dtype=np.int64),
                "dense_rnk": pd.Series([], dtype=np.int64)})
        grp = g.groupby(group_col, sort=False)[value_col]
        rnk = grp.rank(method="min").to_numpy(np.int64)
        dense = grp.rank(method="dense").to_numpy(np.int64)
        return pd.DataFrame({
            id_col: g[id_col].to_numpy(np.int64),
            group_col: g[group_col].to_numpy(),
            "rnk": rnk,
            "dense_rnk": dense})

    return (ds.select_columns([id_col, group_col, value_col])
              .map_batches(add_bucket, batch_format="pyarrow")
              .groupby("bucket")
              .map_groups(fold, batch_format="pandas"))


def scd2_intervals(ds: Dataset, key_col: str, state_col: str,
                   ts_col: str, id_col: str) -> Dataset:
    """Slowly-changing-dimension (type 2) intervalization of an event
    stream: per key, collapse consecutive runs of the same state into
    validity intervals ``(key, state, valid_from_us, valid_to_us,
    n_events)`` where ``valid_to_us`` is the start of the next run
    (-1 for the currently-open interval — kept integer, never a null
    that pandas would promote to float).  The reference has no
    read-side analytics (`graphrag_sdk/kg.py` stops at upsert); this
    is the standard dimension-history operator a warehouse derives
    from the same event log.  One coarse-bucket shuffle; the fold
    sorts its bucket once by (key, ts, id) and derives run boundaries
    with vectorized masks across ALL keys at once (gaps-and-islands
    without per-key groups).  Integer-exact (epoch-us), so the DuckDB
    lag/lead window oracle matches bit-for-bit.  Partitioning
    assumption: one key's history fits one worker."""

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({
                key_col: pd.Series([], dtype=np.int64),
                state_col: pd.Series([], dtype=object),
                "valid_from_us": pd.Series([], dtype=np.int64),
                "valid_to_us": pd.Series([], dtype=np.int64),
                "n_events": pd.Series([], dtype=np.int64)})
        g = g.sort_values([key_col, ts_col, id_col], kind="mergesort")
        ts_us = g[ts_col].to_numpy("datetime64[us]").astype(np.int64)
        key = g[key_col].to_numpy(np.int64)
        st = g[state_col].to_numpy()
        n = len(g)
        brk = np.empty(n, np.bool_)
        brk[0] = True
        brk[1:] = (key[1:] != key[:-1]) | (st[1:] != st[:-1])
        starts = np.flatnonzero(brk)
        seg_key = key[starts]
        seg_from = ts_us[starts]
        seg_n = np.diff(np.append(starts, n)).astype(np.int64)
        to_us = np.full(len(starts), -1, np.int64)
        same_key = seg_key[1:] == seg_key[:-1]
        to_us[:-1][same_key] = seg_from[1:][same_key]
        return pd.DataFrame({
            key_col: seg_key,
            state_col: st[starts],
            "valid_from_us": seg_from,
            "valid_to_us": to_us,
            "n_events": seg_n})

    return (_bucketed(ds.select_columns(
                [key_col, state_col, ts_col, id_col]), key_col)
            .groupby("bucket")
            .map_groups(fold, batch_format="pandas"))


def funnel_counts(ds: Dataset, key_col: str, type_col: str,
                  ts_col: str, steps: list[str]) -> Dataset:
    """Ordered conversion funnel: for each step i, the number of keys
    that performed ``steps[0]``, then ``steps[1]`` STRICTLY later,
    then ``steps[2]`` strictly later than that, ... (greedy
    earliest-completion semantics — the standard product-analytics
    funnel).  Output: one row per step (step, event_type, n_users).

    One coarse-bucket shuffle co-locates each key's events; the fold
    resolves every step for ALL its keys with vectorized pandas
    merges (min-ts per key, filter ts > previous step's ts, min
    again — no per-key loop) and emits per-bucket partial counts;
    the 3-row final fold is trivial.  Partitioning assumption: one
    key's history fits one worker."""
    if not steps:
        raise ValueError("steps must be non-empty")

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        out_n = []
        cur = None            # DataFrame [key, _ts] of keys at step i
        for i, s in enumerate(steps):
            ev = g[g[type_col] == s][[key_col, ts_col]]
            if cur is not None:
                ev = ev.merge(cur, on=key_col, suffixes=("", "_prev"))
                ev = ev[ev[ts_col] > ev[f"{ts_col}_prev"]]
                ev = ev[[key_col, ts_col]]
            cur = (ev.groupby(key_col, as_index=False)[ts_col].min()
                   if len(ev) else ev.iloc[:0])
            out_n.append(len(cur))
        return pd.DataFrame({
            "step": np.arange(1, len(steps) + 1, dtype=np.int64),
            "event_type": steps,
            "n_users": np.asarray(out_n, np.int64)})

    def final(g: pd.DataFrame) -> pd.DataFrame:
        a = g.groupby(["step", "event_type"], as_index=False)[
            "n_users"].sum()
        a["step"] = a["step"].astype(np.int64)
        a["n_users"] = a["n_users"].astype(np.int64)
        return a

    return (_bucketed(ds.select_columns(
                [key_col, type_col, ts_col]), key_col)
            .groupby("bucket")
            .map_groups(fold, batch_format="pandas")
            .groupby("step")
            .map_groups(final, batch_format="pandas"))


def grouped_running_sum(ds: Dataset, key_col: str = "user_id",
                        ts_col: str = "ts", value_col: str = "value",
                        id_col: str = "event_id",
                        n_buckets: int = 64) -> Dataset:
    """Per-key running (cumulative) sum ordered by ``(ts, id)`` — the
    ``SUM(x) OVER (PARTITION BY key ORDER BY ts, id ROWS UNBOUNDED
    PRECEDING)`` window, on exact integer cents.  One key-bucket
    shuffle co-locates each key's history; the in-bucket fold is one
    vectorized sort + ``groupby().cumsum()`` (same one-key-fits-one-
    worker contract as every keyed window here).  The ``id`` tie-break
    makes equal-timestamp ordering deterministic on both the engine and
    the oracle.  Null values AND null keys are dropped up front
    (mirrored by the oracle's ``WHERE value IS NOT NULL AND key IS NOT
    NULL``) — a NaN value would poison every later running sum of its
    key, and a null key would crash the int cast after pandas groupby
    silently dropped it."""
    import pyarrow.compute as pc

    from .relational import _cents

    def drop_null(t: pa.Table) -> pa.Table:
        return t.filter(pc.and_(t.column(value_col).is_valid(),
                                t.column(key_col).is_valid()))

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, ts_col, id_col], kind="mergesort")
        g = g.assign(_c=_cents(g[value_col].to_numpy(np.float64)))
        run = g.groupby(key_col, sort=False)["_c"].cumsum()
        return pd.DataFrame({
            id_col: g[id_col].to_numpy(np.int64),
            key_col: g[key_col].to_numpy(np.int64),
            "running_cents": run.to_numpy(np.int64)})

    return (_bucketed(ds.select_columns(
                [id_col, key_col, ts_col, value_col])
                .map_batches(drop_null, batch_format="pyarrow"),
                key_col, n_buckets)
            .groupby("bucket")
            .map_groups(fold, batch_format="pandas"))


_WEEK_US = 604_800_000_000


def retention_cohorts(ds: Dataset, key_col: str = "user_id",
                      ts_col: str = "ts",
                      n_buckets: int = 64) -> Dataset:
    """Weekly cohort retention: users cohort by their FIRST active week
    (floor of epoch-µs / week — integer floor division on both the
    engine and the oracle, no float week boundaries), and each
    (cohort_week, week_offset) cell counts the distinct users active
    ``offset`` weeks after joining.  One key-bucket shuffle co-locates
    each user's history; the per-bucket fold is vectorized (min-week
    per user + dedup of (user, offset)); a second tiny fold sums the
    per-bucket partial cells — each user lives in exactly one bucket so
    the partial counts are disjoint and SUM is exact.  Null keys /
    timestamps drop (oracle mirror: ``WHERE user_id IS NOT NULL``) —
    the int64 casts below would otherwise crash on NaN."""
    import pyarrow.compute as pc

    def drop_null(t: pa.Table) -> pa.Table:
        return t.filter(pc.and_(t.column(key_col).is_valid(),
                                t.column(ts_col).is_valid()))

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        us = g[key_col].to_numpy(np.int64)
        wk = (g[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
              // _WEEK_US)
        df = pd.DataFrame({"u": us, "wk": wk})
        cohort = df.groupby("u")["wk"].transform("min")
        cells = (pd.DataFrame({"cw": cohort, "off": df["wk"] - cohort,
                               "u": us})
                 .drop_duplicates()
                 .groupby(["cw", "off"]).size().reset_index(name="n"))
        return pd.DataFrame({"cohort_week": cells["cw"].astype(np.int64),
                             "week_offset": cells["off"].astype(np.int64),
                             "n": cells["n"].astype(np.int64)})

    def final(g: pd.DataFrame) -> pd.DataFrame:
        agg = (g.groupby(["cohort_week", "week_offset"], as_index=False)
                ["n"].sum())
        agg["n_users"] = agg.pop("n").astype(np.int64)
        return agg

    return (_bucketed(ds.select_columns([key_col, ts_col])
                      .map_batches(drop_null, batch_format="pyarrow"),
                      key_col, n_buckets)
            .groupby("bucket")
            .map_groups(fold, batch_format="pandas")
            .groupby("cohort_week")
            .map_groups(final, batch_format="pandas"))


def grouped_journey(ds: Dataset, key_col: str = "user_id",
                    type_col: str = "event_type", ts_col: str = "ts",
                    id_col: str = "event_id", sep: str = ">",
                    n_buckets: int = 64) -> Dataset:
    """Per-key ordered event-type journey string (the ordered
    ``collect_list``/``STRING_AGG(x, sep ORDER BY ts, id)`` aggregate)
    plus the event count.  One key-bucket shuffle; in-bucket the rows
    sort once by ``(key, ts, id)`` and each key's types join into one
    string — output is key-sized, not event-sized.  Null keys AND null
    types drop (oracle mirror: ``WHERE user_id IS NOT NULL AND
    event_type IS NOT NULL``; pandas groupby would drop null keys
    silently while SQL GROUP BY keeps a NULL group, and a null type
    would crash the string join where STRING_AGG merely skips it)."""
    import pyarrow.compute as pc

    def drop_null(t: pa.Table) -> pa.Table:
        return t.filter(pc.and_(t.column(key_col).is_valid(),
                                t.column(type_col).is_valid()))

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, ts_col, id_col], kind="mergesort")
        agg = g.groupby(key_col, sort=False)[type_col].agg(
            journey=sep.join, n_events="size").reset_index()
        return pd.DataFrame({
            key_col: agg[key_col].to_numpy(np.int64),
            "journey": agg["journey"].astype(str),
            "n_events": agg["n_events"].to_numpy(np.int64)})

    return (_bucketed(ds.select_columns(
                [key_col, type_col, ts_col, id_col])
                .map_batches(drop_null, batch_format="pyarrow"),
                key_col, n_buckets)
            .groupby("bucket")
            .map_groups(fold, batch_format="pandas"))


def grouped_transitions(ds: Dataset, key_col: str = "user_id",
                        type_col: str = "event_type", ts_col: str = "ts",
                        id_col: str = "event_id",
                        n_buckets: int = 64) -> Dataset:
    """First-order Markov transition counts over each key's ordered
    event stream: ``(prev_type, next_type, n_transitions)`` — the
    next-action model / session-graph primitive (page-transition
    matrices, funnel discovery).

    Shape: ONE key-bucket shuffle co-locates each key's rows; the
    in-bucket fold sorts once by ``(key, ts, id)``, pairs consecutive
    rows with a vectorized shift (pairs never cross keys), and emits
    per-bucket (prev, next) count partials — output leaving the fold
    is transition-matrix-sized (|types|²), not event-sized — then a
    tiny final fold sums partials.  Null keys, null types AND null
    timestamps drop on both sides (oracle mirror: ``WHERE … IS NOT
    NULL``; a null type inside the lag chain would otherwise fabricate
    NULL-endpoint transitions that SQL's lag would count differently).
    """

    def drop_null(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return t.filter(pc.and_(
            pc.and_(t.column(key_col).is_valid(),
                    t.column(type_col).is_valid()),
            t.column(ts_col).is_valid()))

    def fold(g: pd.DataFrame) -> pa.Table:
        if len(g) == 0 or type_col not in g.columns:
            return pa.table({"prev_type": pa.array([], pa.string()),
                             "next_type": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64()),
                             "_fb": pa.array([], pa.int64())})
        g = g.sort_values([key_col, ts_col, id_col], kind="mergesort")
        # positional compare on the raw int keys — a pandas .shift()
        # would promote int64 keys to float64 (the >2^53 id trap)
        k = g[key_col].to_numpy()
        same = np.zeros(len(k), dtype=bool)
        same[1:] = k[1:] == k[:-1]
        types = g[type_col].to_numpy()
        pairs = pd.DataFrame({
            "prev_type": np.concatenate(([None], types[:-1])),
            "next_type": types})[same]
        if len(pairs) == 0:
            return pa.table({"prev_type": pa.array([], pa.string()),
                             "next_type": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64()),
                             "_fb": pa.array([], pa.int64())})
        c = pairs.groupby(["prev_type", "next_type"],
                          as_index=False).size()
        from .joins import str_bucket
        return pa.table({
            "prev_type": pa.array(c["prev_type"], pa.string()),
            "next_type": pa.array(c["next_type"], pa.string()),
            "n": pa.array(c["size"].to_numpy(np.int64), pa.int64()),
            "_fb": pa.array(str_bucket(c["prev_type"], 8), pa.int64())})

    def final(g: pd.DataFrame) -> pa.Table:
        if len(g) == 0 or "prev_type" not in g.columns:
            return pa.table({"prev_type": pa.array([], pa.string()),
                             "next_type": pa.array([], pa.string()),
                             "n_transitions": pa.array([], pa.int64())})
        gg = g.groupby(["prev_type", "next_type"], as_index=False)[
            "n"].sum()
        return pa.table({
            "prev_type": pa.array(gg["prev_type"], pa.string()),
            "next_type": pa.array(gg["next_type"], pa.string()),
            "n_transitions": pa.array(gg["n"].to_numpy(np.int64),
                                      pa.int64())})

    return (_bucketed(ds.select_columns(
                [key_col, type_col, ts_col, id_col])
                .map_batches(drop_null, batch_format="pyarrow"),
                key_col, n_buckets)
            .groupby("bucket")
            .map_groups(fold, batch_format="pandas")
            .groupby("_fb")
            .map_groups(final, batch_format="pandas"))


def decayed_sum(ds: Dataset, key_col: str = "user_id", ts_col: str = "ts",
                value_col: str = "value",
                halflife_us: int = 604_800_000_000, kmax: int = 40,
                n_buckets: int = 64) -> Dataset:
    """Half-life time-decayed value sum per key — the freshness
    weighting a crawl scheduler / recency-biased sampler applies to
    activity counts (a 7-day-old event counts half, 14-day-old a
    quarter, ...).

    EXACT by staying dyadic: with ``k = min((anchor - ts) //
    halflife, kmax)`` (anchor = the corpus max timestamp, integer µs
    both sides), every event contributes ``cents << (kmax - k)`` — an
    integer — so the per-key sum is an order-free big-int fold
    (``decimal128`` carrier; cents·2^40 overflows int64 after a few
    rows) and the float finish is ONE mirrored division by ``2^kmax``.
    Events older than ``kmax`` half-lives saturate at weight
    ``2^-kmax`` (≈1e-12 — below any curation threshold).

    Scale shape: per-batch combiner → ONE coarse key-bucket exchange of
    O(blocks × keys) partial rows; values/timestamps never shuffle."""
    import ray

    dec = pa.decimal128(38, 0)

    def ts_max(t: pa.Table) -> pa.Table:
        col = t.column(ts_col).cast(pa.int64())
        m = pc.max(col).as_py()
        return pa.table({"m": pa.array(
            [] if m is None else [m], pa.int64())})

    anchors = [r["m"] for r in
               ds.select_columns([ts_col])
                 .map_batches(ts_max, batch_format="pyarrow").take_all()]
    if not anchors:
        return ray.data.from_arrow(pa.table({
            key_col: pa.array([], pa.int64()),
            "n_events": pa.array([], pa.int64()),
            "decayed_cents": pa.array([], pa.float64())}))
    anchor = max(anchors)

    from .relational import _cents

    def partial(t: pa.Table) -> pa.Table:
        t = t.select([key_col, ts_col, value_col])
        t = t.filter(pc.and_(
            pc.and_(t.column(ts_col).is_valid(),
                    t.column(value_col).is_valid()),
            t.column(key_col).is_valid()))
        if t.num_rows == 0:
            return pa.table({key_col: pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "s": pa.array([], dec),
                             "_b": pa.array([], pa.int64())})
        us = t.column(ts_col).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        k = np.minimum((anchor - us) // halflife_us, kmax)
        cents = _cents(t.column(value_col).to_numpy(zero_copy_only=False))
        w = cents.astype(object) * [1 << int(kmax - ki) for ki in k]
        df = pd.DataFrame({
            key_col: t.column(key_col).to_numpy(zero_copy_only=False),
            "w": w})
        agg = df.groupby(key_col)["w"].agg(["size", "sum"]).reset_index()
        keys = agg[key_col].to_numpy(np.int64)
        return pa.table({
            key_col: pa.array(keys, pa.int64()),
            "n": pa.array(agg["size"].to_numpy(np.int64), pa.int64()),
            "s": pa.array([int(v) for v in agg["sum"]], dec),
            "_b": pa.array(keys % n_buckets, pa.int64())})

    def fold(g: pd.DataFrame) -> pa.Table:
        if len(g) == 0 or key_col not in g.columns:
            return pa.table({key_col: pa.array([], pa.int64()),
                             "n_events": pa.array([], pa.int64()),
                             "decayed_cents": pa.array([], pa.float64())})
        agg = g.groupby(key_col).agg(
            n=("n", "sum"), s=("s", "sum")).reset_index()
        scale = float(1 << kmax)
        dc = [float(int(v)) / scale for v in agg["s"]]
        return pa.table({
            key_col: pa.array(agg[key_col].to_numpy(np.int64), pa.int64()),
            "n_events": pa.array(agg["n"].to_numpy(np.int64), pa.int64()),
            "decayed_cents": pa.array(dc, pa.float64())})

    return (ds.map_batches(partial, batch_format="pyarrow")
              .groupby("_b")
              .map_groups(fold, batch_format="pandas")
              .sort(key_col))
