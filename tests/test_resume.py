"""Checkpoint/resume: a rerun skips manifested shards and produces
byte-identical final tables (BASELINE.md resumability criterion)."""

import json
import os

import ray

from kgforge.pipelines.kg_build import KGBuildConfig, build_kg
from kgforge.state import checkpoint as ckpt
from kgforge.testing.corpus import ONTOLOGY_JSON, write_corpus


def _cfg(corpus):
    return KGBuildConfig(ontology_json=json.dumps(ONTOLOGY_JSON),
                         alias_map=corpus.alias_map,
                         extract_concurrency=2, normalize_concurrency=2,
                         n_buckets=4, n_shards=4)


def _hashes(out):
    import duckdb
    con = duckdb.connect()
    n = con.execute(f"SELECT * FROM read_parquet('{out}/nodes/*.parquet') "
                    "ORDER BY node_key").fetchall()
    e = con.execute(f"SELECT * FROM read_parquet('{out}/edges/*.parquet') "
                    "ORDER BY edge_id, src_id, dst_id").fetchall()
    return n, e


def test_resume_skips_and_matches(tmp_path):
    corpus = write_corpus(str(tmp_path / "corpus"), n_pages=120, seed=9,
                          n_files=4)
    pages = ray.data.read_parquet(str(tmp_path / "corpus" / "pages"))
    out = str(tmp_path / "out")

    res1 = build_kg(pages, _cfg(corpus), output_dir=out)
    assert res1.metrics["resume_recomputed_shards"] == [0, 1, 2, 3]
    nodes1, edges1 = _hashes(out)
    assert len(nodes1) == res1.metrics["nodes"]

    # crash simulation: one shard incomplete
    os.remove(os.path.join(out, "mentions", "shard=2", "_manifest.json"))
    res2 = build_kg(pages, _cfg(corpus), output_dir=out, resume=True)
    assert res2.metrics["resume_skipped_shards"] == [0, 1, 3]
    assert res2.metrics["resume_recomputed_shards"] == [2]
    assert _hashes(out) == (nodes1, edges1)

    # fully complete: nothing recomputed, tables still identical
    res3 = build_kg(pages, _cfg(corpus), output_dir=out, resume=True)
    assert res3.metrics["resume_recomputed_shards"] == []
    assert _hashes(out) == (nodes1, edges1)


def test_partial_shard_dir_cleared(tmp_path):
    corpus = write_corpus(str(tmp_path / "corpus"), n_pages=60, seed=4,
                          n_files=2)
    pages = ray.data.read_parquet(str(tmp_path / "corpus" / "pages"))
    out = str(tmp_path / "out")
    build_kg(pages, _cfg(corpus), output_dir=out)
    nodes1, edges1 = _hashes(out)
    # orphan files without manifest must be cleared, not double-counted
    mdir = os.path.join(out, "mentions")
    os.remove(os.path.join(mdir, "shard=1", "_manifest.json"))
    done = ckpt.completed_shards(mdir)
    assert 1 not in done
    build_kg(pages, _cfg(corpus), output_dir=out, resume=True)
    assert _hashes(out) == (nodes1, edges1)
