"""Embedding-ANN entity-linking candidate generation."""

import json

import pyarrow as pa

import ray

from kgforge.pipelines.kg_build import KGBuildConfig, build_kg
from kgforge.stages.linking import (ann_alias_map, char_ngram_embedding,
                                    link_surfaces_to_canonicals)
from kgforge.testing.corpus import ONTOLOGY_JSON


def test_char_ngram_embedding_similarity():
    import numpy as np
    a = char_ngram_embedding("John Doe")
    b = char_ngram_embedding("Jon Doe")       # small edit → high cosine
    c = char_ngram_embedding("Rita Okafor")
    assert float(a @ b) > 0.7
    assert float(a @ c) < 0.4
    assert np.isclose(np.linalg.norm(a), 1.0)


def test_link_surfaces():
    canonicals = ["John Doe", "Mary Stone", "Rita Okafor"]
    links = link_surfaces_to_canonicals(
        ["Jon Doe", "Mary Stone", "Zzz Qqq"], canonicals)
    assert links.get("Jon Doe") == "John Doe"
    assert "Mary Stone" not in links      # identity links are dropped
    assert "Zzz Qqq" not in links         # below threshold


def test_ambiguity_guard():
    links = link_surfaces_to_canonicals(
        ["John Do"], ["John Doe", "John Dot"])
    assert links == {}                    # two near-equal candidates


def test_ann_alias_map_feeds_pipeline(small_corpus):
    """ANN-generated aliases flow through the same broadcast path and
    fold typo'd mentions into the canonical node."""
    surfaces = pa.table({"surface": ["Jon Doe", "John Doe", "Nobody Xyz"]})
    alias_map = ann_alias_map(ray.data.from_arrow(surfaces),
                              "Person", "name", ["John Doe", "Mary Stone"])
    assert alias_map["Person"]["name"].get("Jon Doe") == "John Doe"

    class TypoExtractor:
        def extract(self, text, instruction=""):
            return {"entities": [
                        {"label": "Person", "attributes": {"name": "Jon Doe"}},
                        {"label": "Person", "attributes": {"name": "John Doe"}}],
                    "relations": []}

    pages = ray.data.from_arrow(small_corpus.pages.slice(0, 6))
    cfg = KGBuildConfig(ontology_json=json.dumps(ONTOLOGY_JSON),
                        alias_map=alias_map, model_factory=TypoExtractor,
                        fused_concurrency=1, n_buckets=2)
    res = build_kg(pages, cfg)
    nodes = res.nodes.to_pandas()
    assert list(nodes["name"]) == ["John Doe"]   # one canonical node
    assert int(nodes["n_mentions"].iloc[0]) >= 10
