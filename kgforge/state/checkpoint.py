"""Partition-level checkpoint manifests.

The reference has no checkpointing (re-running re-pays every LLM call;
SURVEY §4).  Here every expensive phase writes partitioned Parquet plus a
per-partition ``_manifest.json`` recording row counts, file inventory and
lineage; a resumed run skips partitions whose manifest validates, so only
un-finished shards re-pay extraction.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import time

import pyarrow.dataset as pads

MANIFEST_NAME = "_manifest.json"


class ShardCountMismatch(ValueError):
    """Resume requested with a different shard count than the checkpoint
    was written with — a hard error (pages would silently misroute)."""


def shard_dir(root: str, shard: int) -> str:
    return os.path.join(root, f"shard={shard}")


def write_shard_manifest(root: str, shard: int, extra: dict | None = None) -> dict:
    """Scan the written shard partition (parquet footers only) and commit
    its manifest — the atomic 'this shard is done' marker."""
    d = shard_dir(root, shard)
    files = sorted(glob.glob(os.path.join(d, "*.parquet")))
    rows = 0
    for f in files:
        rows += pads.dataset(f).count_rows()
    manifest = {
        "shard": shard,
        "rows": rows,
        "files": [os.path.basename(f) for f in files],
        "written_at": time.time(),
        **(extra or {}),
    }
    tmp = os.path.join(d, MANIFEST_NAME + ".tmp")
    os.makedirs(d, exist_ok=True)
    with open(tmp, "w") as fh:
        json.dump(manifest, fh)
    os.replace(tmp, os.path.join(d, MANIFEST_NAME))
    return manifest


def write_table_manifest(table_dir: str, rows: int,
                         extra: dict | None = None) -> dict:
    """Run-level manifest for a final output table directory."""
    files = sorted(os.path.basename(f)
                   for f in glob.glob(os.path.join(table_dir, "*.parquet")))
    manifest = {"rows": int(rows), "files": files,
                "written_at": time.time(), **(extra or {})}
    tmp = os.path.join(table_dir, MANIFEST_NAME + ".tmp")
    os.makedirs(table_dir, exist_ok=True)
    with open(tmp, "w") as fh:
        json.dump(manifest, fh)
    os.replace(tmp, os.path.join(table_dir, MANIFEST_NAME))
    return manifest


def completed_shards(root: str,
                     expect_n_shards: int | None = None) -> set[int]:
    """Shards whose manifest exists and matches the files on disk.

    ``expect_n_shards`` guards resume correctness: a checkpoint written
    with a different shard count would silently misroute pages (pages
    hashed to out-of-range shards never recompute), so a mismatch is a
    hard error, not a skip.
    """
    done: set[int] = set()
    for path in glob.glob(os.path.join(root, "shard=*", MANIFEST_NAME)):
        try:
            with open(path) as fh:
                m = json.load(fh)
            if (expect_n_shards is not None and "n_shards" in m
                    and int(m["n_shards"]) != expect_n_shards):
                raise ShardCountMismatch(
                    f"checkpoint at {root} was written with "
                    f"n_shards={m['n_shards']}, resume requested "
                    f"{expect_n_shards}; use the original shard count or "
                    f"start a fresh output directory")
            d = os.path.dirname(path)
            files = sorted(os.path.basename(f)
                           for f in glob.glob(os.path.join(d, "*.parquet")))
            if files == sorted(m.get("files", [])):
                done.add(int(m["shard"]))
        except ShardCountMismatch:
            raise
        except (OSError, KeyError, ValueError):
            # a truncated/corrupt manifest (json.JSONDecodeError is a
            # ValueError) or a non-int "shard" field means the shard is
            # incomplete — recompute it, don't crash the resume
            continue
    return done


def manifest_field(root: str, key: str, shards: set[int] | None = None):
    """Read one extra field from any completed shard manifest (they are
    written uniformly per run).  ``shards`` restricts to known-valid
    shards; returns None when no manifest carries the key — which for
    ``shard_fn`` means a pre-versioned (legacy) checkpoint."""
    for path in glob.glob(os.path.join(root, "shard=*", MANIFEST_NAME)):
        try:
            with open(path) as fh:
                m = json.load(fh)
            if shards is not None and int(m.get("shard", -1)) not in shards:
                continue
            if key in m:
                return m[key]
        except (OSError, ValueError):
            continue
    return None


def clear_incomplete_shards(root: str, done: set[int]) -> list[int]:
    """Delete partition dirs without a valid manifest (partial writes from
    a killed run) so recomputation can't duplicate rows."""
    cleared = []
    for d in glob.glob(os.path.join(root, "shard=*")):
        try:
            shard = int(os.path.basename(d).split("=", 1)[1])
        except ValueError:
            continue
        if shard not in done:
            shutil.rmtree(d, ignore_errors=True)
            cleared.append(shard)
    return cleared
