"""Streaming windowed aggregation — the one operator class the Dataset
API genuinely cannot express (ordered, stateful, incremental
consumption), so this is a RAW Ray actor stage per the last-resort rule.

``streaming_sessionize`` reproduces ``windows.sessionize`` (gap-based
sessions, identical output and tie-breaks — the two are pinned equal in
pytest and share one SQL oracle) but executes as a stream: the driver
plays the message bus, feeding time-ordered micro-batches to
``n_workers`` key-partitioned stateful actors together with the current
WATERMARK (max event time ingested so far).  A worker's state is only
its OPEN sessions; a session is emitted the moment the watermark proves
no future event can extend it (``watermark - last_ts > gap``), so
memory is bounded by concurrently-open sessions, not by history — the
property that lets this run forever on an unbounded stream.

Deployment note: in production the driver loop is replaced by a real
bus (Kafka consumer groups → one actor per partition); the actor
protocol (``ingest(batch, watermark)`` / ``flush()``) is unchanged.
The actors declare ``num_cpus=0`` — they are state holders doing tiny
vectorized merges, and reserving whole CPUs would starve the upstream
sort on small clusters (the round-1 actor-pool deadlock lesson).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
from ray.data import Dataset

_EMPTY = {"user_id": pa.array([], pa.int64()),
          "session_start_epoch": pa.array([], pa.int64()),
          "session_end_epoch": pa.array([], pa.int64()),
          "n_events": pa.array([], pa.int64())}


def _sessions_table(rows: list[tuple]) -> pa.Table:
    if not rows:
        return pa.table(_EMPTY)
    k, s, e, n = zip(*rows)
    return pa.table({"user_id": pa.array(k, pa.int64()),
                     "session_start_epoch": pa.array(s, pa.int64()),
                     "session_end_epoch": pa.array(e, pa.int64()),
                     "n_events": pa.array(n, pa.int64())})


@ray.remote(num_cpus=0)
class SessionWorker:
    """Holds open sessions for one key partition.  ``ingest`` merges a
    time-ordered micro-batch (vectorized intra-batch sessionization,
    per-SESSION — not per-event — state merge) and returns the sessions
    the watermark closed."""

    def __init__(self, gap_us: int):
        self.gap_us = gap_us
        # key -> [start_us, last_us, n_events]
        self.open: dict[int, list] = {}

    def ingest(self, keys: np.ndarray, ts_us: np.ndarray,
               watermark_us: int) -> pa.Table:
        out: list[tuple] = []
        if len(keys):
            # rows arrive globally ts-ordered; a STABLE sort by key
            # alone keeps each key's rows ts-ordered while making the
            # shift-based boundary detection valid across interleaves
            df = (pd.DataFrame({"k": keys, "t": ts_us})
                  .sort_values("k", kind="mergesort"))
            new = (df["k"].ne(df["k"].shift())
                   | df["t"].sub(df["t"].shift()).gt(self.gap_us))
            df["sid"] = np.cumsum(new.to_numpy())
            agg = df.groupby(["k", "sid"], sort=False).agg(
                start=("t", "first"), end=("t", "last"),
                n=("t", "size")).reset_index()
            for k, sub in agg.groupby("k", sort=False):
                k = int(k)
                st = self.open.get(k)
                first = sub.iloc[0]
                rest = sub.iloc[1:]
                if st is not None:
                    if int(first["start"]) - st[1] > self.gap_us:
                        out.append((k, st[0] // 1_000_000,
                                    st[1] // 1_000_000, st[2]))
                        st = [int(first["start"]), int(first["end"]),
                              int(first["n"])]
                    else:
                        st = [st[0], int(first["end"]), st[2]
                              + int(first["n"])]
                else:
                    st = [int(first["start"]), int(first["end"]),
                          int(first["n"])]
                for _, r in rest.iterrows():
                    out.append((k, st[0] // 1_000_000,
                                st[1] // 1_000_000, st[2]))
                    st = [int(r["start"]), int(r["end"]), int(r["n"])]
                self.open[k] = st
        # watermark pass: no future event (ts >= watermark) can extend
        # a session whose gap to the watermark already exceeds gap_us
        for k in [k for k, st in self.open.items()
                  if watermark_us - st[1] > self.gap_us]:
            st = self.open.pop(k)
            out.append((k, st[0] // 1_000_000, st[1] // 1_000_000, st[2]))
        return _sessions_table(out)

    def flush(self) -> pa.Table:
        out = [(k, st[0] // 1_000_000, st[1] // 1_000_000, st[2])
               for k, st in sorted(self.open.items())]
        self.open.clear()
        return _sessions_table(out)


def streaming_sessionize(ds: Dataset, key_col: str = "user_id",
                         ts_col: str = "ts", id_col: str = "event_id",
                         gap_us: int = 1_800_000_000,
                         n_workers: int = 4,
                         batch_size: int = 16384) -> Dataset:
    """Gap-based sessions computed INCREMENTALLY over a time-ordered
    stream (see module docstring).  Equivalent by construction to
    ``windows.sessionize`` — strict ``gap > gap_us`` boundary, ties on
    ``(ts, id)``."""
    workers = [SessionWorker.remote(gap_us) for _ in range(n_workers)]
    stream = ds.select_columns([key_col, ts_col, id_col]).sort(
        [ts_col, id_col])
    futures = []
    for batch in stream.iter_batches(batch_size=batch_size,
                                     batch_format="pyarrow"):
        if batch.num_rows == 0:
            continue
        keys = batch.column(key_col).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        ts_us = batch.column(ts_col).cast(pa.timestamp("us")).cast(
            pa.int64()).to_numpy(zero_copy_only=False)
        wm = int(ts_us[-1])
        part = keys % n_workers
        for w in range(n_workers):
            m = part == w
            if m.any():
                futures.append(workers[w].ingest.remote(
                    keys[m], ts_us[m], wm))
    futures.extend(w.flush.remote() for w in workers)
    tables = [t for t in ray.get(futures) if t.num_rows]
    return ray.data.from_arrow(tables or [pa.table(_EMPTY)])


_DEDUP_EMPTY = {"doc_id": pa.array([], pa.int64()),
                "n_dups": pa.array([], pa.int64()),
                "text_hash": pa.array([], pa.string())}


@ray.remote(num_cpus=0)
class DedupWorker:
    """Streaming exact-dedup state for one hash partition: per text
    hash, the smallest id seen so far and the running duplicate count.
    Min-id + count merging is ORDER-FREE, so the final emission is
    deterministic regardless of arrival order / micro-batch boundaries
    — which is what lets the streaming operator share the batch
    operator's oracle.  State is bounded by DISTINCT texts in the
    partition (the honest streaming-dedup memory reality; production
    backends spill this map to RocksDB or TTL it)."""

    def __init__(self):
        self.state: dict[str, list] = {}   # hash -> [min_id, n]

    def ingest(self, t: pa.Table) -> int:
        df = pd.DataFrame({"i": t.column("i").to_numpy(
                               zero_copy_only=False),
                           "h": t.column("h").to_pylist()})
        agg = df.groupby("h")["i"].agg(["min", "size"])
        st = self.state
        for h, mn, n in zip(agg.index, agg["min"], agg["size"]):
            cur = st.get(h)
            if cur is None:
                st[h] = [int(mn), int(n)]
            else:
                if mn < cur[0]:
                    cur[0] = int(mn)
                cur[1] += int(n)
        return len(st)

    def flush(self) -> pa.Table:
        if not self.state:
            return pa.table(dict(_DEDUP_EMPTY))
        hs = list(self.state)
        ids = [self.state[h][0] for h in hs]
        ns = [self.state[h][1] for h in hs]
        # hash keys are md5 hex strings (oracle mode) or uint64 ints
        # (fast siphash mode) — type follows what ingest routed
        htype = pa.string() if isinstance(hs[0], str) else pa.uint64()
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "n_dups": pa.array(ns, pa.int64()),
                         "text_hash": pa.array(hs, htype)})


def streaming_exact_dedup(docs: Dataset, id_col: str = "doc_id",
                          text_col: str = "text", n_workers: int = 4,
                          batch_rows: int = 4096,
                          max_in_flight: int = 32,
                          oracle_mode: bool = True) -> Dataset:
    """Exact dedup as an UNBOUNDED-STREAM operator: hash+route runs
    INSIDE parallel ``map_batches`` tasks that hold the state-actor
    handles, so ingest parallelism scales with the cluster — the
    driver never touches row data (it only launches the consuming pass
    and the final flush; on a real bus each Kafka partition's consumer
    plays the map task).  The final flush emits one
    ``(doc_id, n_dups, text_hash)`` winner per distinct text —
    IDENTICAL to ``dedup.exact_dedup(keep_text=False)`` (min-id wins;
    pinned in pytest, shares its SQL oracle): the actors' min-id +
    count merge is ORDER-FREE, so concurrent multi-task ingest cannot
    change the result.  Text never leaves the ingest tasks: only
    (id, hash) crosses to the state holders — the same 100-TB
    discipline as the batch operator's shuffle.

    Per-task backpressure: each ingest task bounds its un-acked sends
    with ``ray.wait`` (``max_in_flight``), the streaming analogue of
    the batch executor's backpressure; global in-flight is that window
    x concurrent map tasks, which Ray Data already bounds.

    ``oracle_mode=True`` (gate default) hashes with per-row md5 so
    DuckDB can re-derive ``text_hash`` exactly; production passes
    ``False`` for the vectorized siphash64 path
    (:func:`kgforge.functions.hashing.fast_text_hash64` — no per-row
    Python in the hot loop; hex text_hash formatted only on the
    result-sized flush)."""
    from ..functions import hashing as H
    workers = [DedupWorker.remote() for _ in range(n_workers)]

    def route(t: pa.Table) -> pa.Table:
        texts = t.column(text_col)
        if oracle_mode:
            hashes = np.asarray(
                [H.text_md5(x or "") for x in texts.to_pylist()],
                dtype=object)
            part = np.fromiter(
                (int(h[:8], 16) % n_workers for h in hashes),
                dtype=np.int64, count=len(hashes))
            harr = pa.array(hashes, pa.string())
        else:
            h64 = H.fast_text_hash64(texts.to_pylist())
            part = (h64 % np.uint64(n_workers)).astype(np.int64)
            harr = pa.array(h64, pa.uint64())
        routed = pa.table({"i": t.column(id_col), "h": harr})
        pending: list = []
        for w in range(n_workers):
            mask = part == w
            if not mask.any():
                continue
            sub = routed.take(pa.array(np.flatnonzero(mask),
                                       pa.int64()))
            pending.append(workers[w].ingest.remote(sub))
            while len(pending) > max_in_flight:
                done, pending = ray.wait(pending, num_returns=1)
                ray.get(done)   # surface ingest errors loudly
        if pending:
            ray.get(pending)    # task completes only once acked
        return pa.table({"n": pa.array([t.num_rows], pa.int64())})

    # the consuming count() drives the stream; rows never reach the
    # driver (each block reduces to one ack row)
    (docs.select_columns([id_col, text_col])
         .map_batches(route, batch_size=batch_rows,
                      batch_format="pyarrow").count())
    tables = ray.get([w.flush.remote() for w in workers])
    if not oracle_mode:
        # hex-format the result-sized output so both modes share one
        # schema (text_hash: string)
        tables = [
            tb.set_column(
                tb.column_names.index("text_hash"), "text_hash",
                pa.array([format(v, "016x")
                          for v in tb.column("text_hash").to_pylist()],
                         pa.string()))
            for tb in tables]
    import ray.data as rd
    return rd.from_arrow([tb for tb in tables])
