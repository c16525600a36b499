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


def _run_curation(args: list[str]) -> dict:
    env = dict(os.environ, PYTHONPATH=REPO, RAY_GRAFT_CPUS="4")
    env.pop("RAY_ADDRESS", None)
    proc = subprocess.run(
        [sys.executable,
         os.path.join(REPO, "scripts", "run_curation_job.py"), *args],
        capture_output=True, text=True, timeout=300, env=env, cwd=REPO)
    assert proc.returncode == 0, proc.stderr[-2000:]
    return json.loads(proc.stdout.strip().splitlines()[-1])


def test_run_curation_job_cli_and_resume(tmp_path):
    out_dir = str(tmp_path / "curated")
    src = "/root/testdata/sf0.001/documents.parquet"
    m1 = _run_curation(["--input", src, "--output", out_dir,
                        "--n-shards", "4", "--num-cpus", "4"])
    assert m1["rows_written"] > 0
    assert m1["recomputed"] == [0, 1, 2, 3]
    assert os.path.exists(os.path.join(out_dir, "shard=0",
                                       "_manifest.json"))

    import duckdb
    con = duckdb.connect()
    fresh = con.execute(
        f"SELECT count(*), count(DISTINCT doc_id) "
        f"FROM read_parquet('{out_dir}/shard=*/*.parquet')").fetchone()
    assert fresh[0] == fresh[1]        # dedup held globally

    # kill one shard's manifest: a resume recomputes ONLY that shard
    # and the final table is unchanged (no duplicate rows appended)
    os.remove(os.path.join(out_dir, "shard=2", "_manifest.json"))
    m2 = _run_curation(["--input", src, "--output", out_dir,
                        "--n-shards", "4", "--num-cpus", "4",
                        "--resume"])
    assert m2["recomputed"] == [2]
    assert sorted(m2["resumed_skipped"]) == [0, 1, 3]
    after = con.execute(
        f"SELECT count(*), count(DISTINCT doc_id) "
        f"FROM read_parquet('{out_dir}/shard=*/*.parquet')").fetchone()
    assert after == fresh
