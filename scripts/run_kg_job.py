#!/usr/bin/env python
"""Cluster job entrypoint for the KG-construction pipeline.

On a real fixed-size cluster::

    ray job submit --address http://<head>:8265 \
        --working-dir /root/repo -- \
        python scripts/run_kg_job.py \
            --input s3://bucket/pages/ --output s3://bucket/kg_run1/ \
            --ontology ontology.json --aliases aliases.json --resume

Locally (the sandbox proxy) it runs the same code under
``ray.init(address="local")``.  The script owns the Ray session (guarded
— under ``ray job submit`` the session already exists); the library
never calls ``ray.init``.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True,
                   help="pages parquet path/dir (url, warc_ts, html, text, lang)")
    p.add_argument("--output", required=True, help="output root directory")
    p.add_argument("--ontology", required=True, help="ontology JSON file")
    p.add_argument("--aliases", default=None, help="alias-map JSON file")
    p.add_argument("--resume", action="store_true",
                   help="skip shards with valid manifests")
    p.add_argument("--n-shards", type=int, default=64)
    p.add_argument("--n-buckets", type=int, default=64)
    p.add_argument("--from-html", action="store_true",
                   help="re-extract text from the html column")
    p.add_argument("--num-cpus", type=int,
                   default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    args = p.parse_args()

    import ray
    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 num_cpus=args.num_cpus, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from kgforge.pipelines.kg_build import (KGBuildConfig, build_kg,
                                            read_pages)
    with open(args.ontology) as fh:
        ontology_json = fh.read()
    alias_map = None
    if args.aliases:
        with open(args.aliases) as fh:
            alias_map = json.load(fh)

    cfg = KGBuildConfig(ontology_json=ontology_json, alias_map=alias_map,
                        use_text_column=not args.from_html,
                        n_shards=args.n_shards, n_buckets=args.n_buckets)
    t0 = time.time()
    pages = read_pages(args.input, cfg)
    res = build_kg(pages, cfg, output_dir=args.output, resume=args.resume)
    out = {k: v for k, v in res.metrics.items() if not isinstance(v, dict)}
    out["wall_sec"] = round(time.time() - t0, 2)
    print(json.dumps(out, default=str))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
