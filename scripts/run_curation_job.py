#!/usr/bin/env python
"""Cluster job entrypoint for the training-corpus curation pipeline —
the resumable-partitioned-output counterpart of ``run_kg_job.py``.

On a real fixed-size cluster::

    ray job submit --address http://<head>:8265 \
        --working-dir /root/repo -- \
        python scripts/run_curation_job.py \
            --input s3://bucket/documents/ --output s3://bucket/curated/ \
            --n-shards 256 --resume

Design notes (the 100-TB contract):

- **Shard key = content hash** (``hash(text) % n_shards``): exact
  duplicates always share a shard, so per-shard dedup IS global dedup
  and a shard is a self-contained unit of work.  The hash fn is part
  of the checkpoint contract (manifests record it; resume verifies):
  default ``fast`` = vectorized siphash64
  (``kgforge.functions.hashing.fast_text_hash64`` — no per-row Python
  md5 loop at 10^12 docs); ``--hash md5`` keeps the oracle-parity md5.
- **Resume in ONE scan**: completed-shard ids broadcast into the first
  ``map_batches``; their rows drop at the filter, so a resumed run
  streams the corpus once and pays gates/dedup only for unfinished
  shards (no per-shard rescan loop).
- **Duplicate-safe completion**: each shard directory gets a
  ``_manifest.json`` (row count + file inventory) written after the
  run's parquet lands; ``clear_incomplete_shards`` removes partial
  output before rework, so the stale-uuid-file append hazard of
  re-running ``write_parquet`` into a half-written directory cannot
  duplicate rows.  Commit granularity is per-ATTEMPT (manifests follow
  the single ``write_parquet``): a crash mid-write recomputes the
  attempt's unfinished shards on resume — never duplicates them.

The script owns the Ray session (guarded — under ``ray job submit`` it
already exists); the library never calls ``ray.init``.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True,
                   help="documents parquet file/dir (doc_id,text,lang)")
    p.add_argument("--output", required=True)
    p.add_argument("--n-shards", type=int, default=16)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--num-cpus", type=int,
                   default=int(os.environ.get("RAY_GRAFT_CPUS", "8")))
    p.add_argument("--lang", default="en",
                   help="language gate ('' disables)")
    p.add_argument("--hash", choices=["fast", "md5"], default="fast",
                   help="content-hash fn (checkpoint contract; fast = "
                        "vectorized siphash64, md5 = oracle parity)")
    args = p.parse_args()

    import ray
    if not ray.is_initialized():
        # honour the cluster address under `ray job submit`; "local"
        # only as the single-box fallback (same pattern as run_kg_job)
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from kgforge.functions.hashing import fast_text_hash64
    from kgforge.functions.textstats import (repetition_stats_batch,
                                             token_stats_batch)
    from kgforge.stages.dedup import exact_dedup
    from kgforge.state.checkpoint import (clear_incomplete_shards,
                                          completed_shards,
                                          write_shard_manifest)

    t0 = time.time()
    n_shards = args.n_shards
    done: set[int] = set()
    if args.resume:
        done = completed_shards(args.output, expect_n_shards=n_shards)
        clear_incomplete_shards(args.output, done)
        # the hash fn is part of the shard layout: resuming with a
        # different one would misroute rows (the expect_n_shards
        # discipline) — verify against any completed manifest
        import glob as _glob
        for mp in _glob.glob(os.path.join(args.output, "shard=*",
                                          "_manifest.json")):
            with open(mp) as fh:
                recorded = json.load(fh).get("hash_fn", "md5")
            if recorded != args.hash:
                raise SystemExit(
                    f"checkpoint at {args.output} was sharded with "
                    f"hash_fn={recorded!r}; rerun with --hash {recorded}")
            break
    done_ref = ray.put(frozenset(done))

    def shard_and_skip(t: pa.Table) -> pa.Table:
        skip = ray.get(done_ref)
        if not skip:            # fresh run: no per-row hashing needed
            return t
        texts = t.column("text").to_pylist()
        if args.hash == "md5":
            shards = np.fromiter(
                (int(hashlib.md5((x or "").encode("utf-8"))
                     .hexdigest()[:8], 16) % n_shards for x in texts),
                dtype=np.int64, count=len(texts))
        else:
            shards = (fast_text_hash64(texts)
                      % np.uint64(n_shards)).astype(np.int64)
        keep = ~np.isin(shards, np.fromiter(skip, dtype=np.int64))
        return t.filter(pa.array(keep, pa.bool_()))

    def gates(t: pa.Table) -> pa.Table:
        if args.lang:
            t = t.filter(pc.equal(t.column("lang"), args.lang))
        t = repetition_stats_batch(t)
        t = token_stats_batch(t)
        keep = pc.and_(
            pc.and_(pc.greater_equal(t.column("n_tokens"), 30),
                    pc.less_equal(t.column("n_tokens"), 2000)),
            pc.and_(pc.less_equal(t.column("dup_line_frac"), 0.5),
                    pc.less(t.column("top_bigram_frac"), 0.2)))
        return t.filter(keep).select(["doc_id", "text"])

    def reshard(t: pa.Table) -> pa.Table:
        # shard derives from the text_hash the dedup fold already
        # computed — no second hash pass over document bodies
        if args.hash == "md5":
            shards = np.fromiter(
                (int(h[:8], 16) % n_shards
                 for h in t.column("text_hash").to_pylist()),
                dtype=np.int64, count=t.num_rows)
        else:
            h64 = t.column("text_hash").to_numpy(zero_copy_only=False)
            shards = (h64.astype(np.uint64)
                      % np.uint64(n_shards)).astype(np.int64)
        t = t.append_column("shard", pa.array(shards, pa.int64()))
        return t.drop_columns(["text_hash"])

    ds = (ray.data.read_parquet(args.input,
                                columns=["doc_id", "text", "lang"])
          .map_batches(shard_and_skip, batch_format="pyarrow")
          .map_batches(gates, batch_format="pyarrow"))
    # duplicates share a text hash -> share a shard, so the global
    # dedup exchange only moves rows of unfinished shards on resume
    kept = (exact_dedup(ds, keep_hash=True,
                        oracle_mode=args.hash == "md5")
            .map_batches(reshard, batch_format="pyarrow"))
    kept.write_parquet(args.output, partition_cols=["shard"])

    new_shards = sorted(set(range(n_shards)) - done)
    total_rows = 0
    for s in new_shards:
        man = write_shard_manifest(
            args.output, s,
            extra={"n_shards": n_shards, "hash_fn": args.hash})
        total_rows += man["rows"]
    metrics = {
        "metric": "curation_job",
        "unit": "sec",
        "value": round(time.time() - t0, 3),
        "n_shards": n_shards,
        "resumed_skipped": sorted(done),
        "recomputed": new_shards,
        "rows_written": total_rows,
    }
    print(json.dumps(metrics))
    return 0


if __name__ == "__main__":
    rc = main()
    import ray
    ray.shutdown()
    sys.exit(rc)
