"""Smoke test for the cluster job entrypoint (the ``ray job submit``
surface the north rule cites): a fresh subprocess with its OWN Ray
session runs the script end-to-end over a small corpus, writes the
node/edge tables + manifests, and a ``--resume`` rerun skips every
completed shard."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args: list[str]) -> dict:
    env = dict(os.environ, PYTHONPATH=REPO, RAY_GRAFT_CPUS="4")
    # unset the session's address so the subprocess starts its own
    env.pop("RAY_ADDRESS", None)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "run_kg_job.py"),
         *args],
        capture_output=True, text=True, timeout=300, env=env, cwd=REPO)
    assert proc.returncode == 0, proc.stderr[-2000:]
    return json.loads(proc.stdout.strip().splitlines()[-1])


def test_run_kg_job_cli_and_resume(tmp_path):
    from kgforge.testing.corpus import write_corpus
    corpus_dir = str(tmp_path / "corpus")
    write_corpus(corpus_dir, n_pages=200, seed=7, n_files=2)
    out_dir = str(tmp_path / "kg_out")

    metrics = _run(["--input", f"{corpus_dir}/pages",
                    "--output", out_dir,
                    "--ontology", f"{corpus_dir}/ontology.json",
                    "--aliases", f"{corpus_dir}/aliases.json",
                    "--n-shards", "4", "--n-buckets", "4",
                    "--num-cpus", "4"])
    assert metrics["nodes"] > 0 and metrics["edges"] > 0
    assert os.path.exists(os.path.join(out_dir, "nodes", "_manifest.json"))
    assert os.path.exists(os.path.join(out_dir, "metrics.json"))

    resumed = _run(["--input", f"{corpus_dir}/pages",
                    "--output", out_dir,
                    "--ontology", f"{corpus_dir}/ontology.json",
                    "--aliases", f"{corpus_dir}/aliases.json",
                    "--n-shards", "4", "--n-buckets", "4",
                    "--num-cpus", "4", "--resume"])
    assert resumed["resume_recomputed_shards"] == []
    assert resumed["nodes"] == metrics["nodes"]
    assert resumed["edges"] == metrics["edges"]
