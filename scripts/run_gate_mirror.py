"""Local mirror of the external driver's correctness gate: run EVERY
``__ray_entry__.queries()`` entry at the given scale factor and compare
the SQL-oracled ones against DuckDB exactly (sorted columns, sorted
rows, exact values) — the same normalization as
``tests/test_entry_gate.py``, at any sf and over the whole registry.

Usage::

    PYTHONPATH=/root/repo python scripts/run_gate_mirror.py \
        [sf_dir] [--only name1,name2] [--num-cpus N]

Owns a Ray session (script entry point, per CLAUDE.md).  Prints one
line per query and a final JSON summary; exit code 1 on any mismatch.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _normalize(df):
    import numpy as np
    import pandas as pd
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            # same cast as tests/test_entry_gate.py — uint64 above
            # 2^63 wraps identically on both sides
            df[c] = df[c].astype(np.int64)
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype(np.float64)
    return (df.sort_values(by=list(df.columns))
              .reset_index(drop=True))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?",
                    default="/root/testdata/sf0.01")
    ap.add_argument("--only", default="")
    ap.add_argument("--num-cpus", type=int, default=8)
    args = ap.parse_args()

    import duckdb
    import pandas as pd
    import pyarrow as pa

    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext, Dataset
    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    only = {q for q in args.only.split(",") if q}

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{args.sf_dir}/{t}.parquet')")

    n_pass = n_fail = n_rows_only = 0
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            res = fn(args.sf_dir)
            if isinstance(res, Dataset):
                res = res.to_pandas()
            elif isinstance(res, pa.Table):
                res = res.to_pandas()
            if name not in oracles:
                n_rows_only += 1
                print(f"ROWS-ONLY {name}: {len(res)} rows "
                      f"({time.time() - t0:.1f}s)")
                continue
            odf = con.execute(oracles[name]).fetchdf()
            pd.testing.assert_frame_equal(
                _normalize(res), _normalize(odf),
                check_exact=True, check_dtype=False)
            n_pass += 1
            print(f"PASS {name}: {len(res)} rows "
                  f"({time.time() - t0:.1f}s)")
        except Exception as e:  # noqa: BLE001 — report and continue
            n_fail += 1
            failures.append(name)
            msg = str(e).replace("\n", " | ")[:300]
            print(f"FAIL {name}: {msg}")
    print(json.dumps({"sf_dir": args.sf_dir, "pass": n_pass,
                      "fail": n_fail, "rows_only": n_rows_only,
                      "failures": failures}))
    ray.shutdown()
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
