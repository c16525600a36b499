"""Ontology auto-detection pipeline + chat-model extraction through the
full KG pipeline (the reference's two LLM-driven entry points,
``ontology.py:35-58`` and ``kg.py:88-106``, with deterministic models)."""

import json

import ray

from kgforge.models import FinishReason, GenerationResponse, StaticReplayModel
from kgforge.ontology import Ontology
from kgforge.pipelines.kg_build import KGBuildConfig, build_kg
from kgforge.pipelines.ontology_detect import detect_ontology, fix_ontology
from kgforge.stages.extract import ChatModelExtractor
from kgforge.testing.corpus import ONTOLOGY_JSON


def test_detect_ontology_recovers_schema(small_corpus):
    pages = ray.data.from_arrow(small_corpus.pages)
    ont = detect_ontology(pages, sample_frac=0.5, seed=42, concurrency=2)
    expected = Ontology.from_json(ONTOLOGY_JSON)
    assert {e.label for e in ont.entities} == \
        {e.label for e in expected.entities}
    assert {r.label for r in ont.relations} == \
        {r.label for r in expected.relations}
    person = ont.get_entity_with_label("Person")
    assert {a.name for a in person.attributes} >= {"name"}
    assert person.unique_attributes()[0].name == "name"
    assert ont.validate_entities()


def test_detect_ontology_deterministic(small_corpus):
    pages = ray.data.from_arrow(small_corpus.pages)
    a = detect_ontology(pages, sample_frac=0.3, seed=7, concurrency=2)
    b = detect_ontology(pages, sample_frac=0.3, seed=7, concurrency=2)
    assert a.to_json() == b.to_json()


def test_fix_ontology_prunes():
    from kgforge.ontology import Attribute, Entity, Relation
    ont = Ontology([Entity("A", [Attribute("k", "string", True)])],
                   [Relation("R", "A", "Missing")])
    fixed = fix_ontology(ont)
    assert fixed.relations == []


def test_fix_ontology_with_model():
    ont = Ontology.from_json(ONTOLOGY_JSON)
    reply = json.dumps(ont.to_json())
    model = StaticReplayModel([
        ("Review and fix", [GenerationResponse(reply, FinishReason.STOP)])])
    fixed = fix_ontology(ont, model=model)
    assert fixed.to_json() == ont.to_json()


def test_chat_model_extraction_through_pipeline(small_corpus):
    """Full build_kg with a chat-backed extractor (actor-pool path): the
    canned model emits one fenced payload split across a MAX_TOKENS
    continuation — the reference's whole LLM call path inside the
    distributed pipeline."""
    payload = {
        "entities": [
            {"label": "Person", "attributes": {"name": "Chat Person"}},
            {"label": "Movie", "attributes": {"title": "Chat Movie",
                                              "release_year": 2001}}],
        "relations": [
            {"label": "ACTED_IN",
             "source": {"label": "Person",
                        "attributes": {"name": "Chat Person"}},
             "target": {"label": "Movie",
                        "attributes": {"title": "Chat Movie"}},
             "attributes": {"role": "Lead"}}],
    }
    text = json.dumps(payload)
    # responses are rejoined with a single space (extract_data_step.py:156)
    # — split at an existing space, as a real model stopping at a token
    # boundary would
    split = text.index(" ", len(text) // 2)
    part1 = "```json\n" + text[:split]
    part2 = text[split + 1:] + "\n```"

    def factory():
        model = StaticReplayModel([
            ("Extract entities",
             [GenerationResponse(part1, FinishReason.MAX_TOKENS)]),
            ("continue", [GenerationResponse(part2, FinishReason.STOP)]),
        ])
        return ChatModelExtractor(model)

    pages = ray.data.from_arrow(small_corpus.pages.slice(0, 12))
    cfg = KGBuildConfig(ontology_json=json.dumps(ONTOLOGY_JSON),
                        model_factory=factory, fused_concurrency=2,
                        n_buckets=4)
    res = build_kg(pages, cfg)
    nodes = res.nodes.to_pandas()
    assert set(nodes["label"]) == {"Person", "Movie"}
    assert "Chat Person" in set(nodes[nodes.label == "Person"]["name"])
    edges = res.edges.to_pandas()
    assert list(edges["label"].unique()) == ["ACTED_IN"]
    assert edges.iloc[0]["role"] == "Lead"
    # every non-empty page emitted the same payload → n_mentions counts
    assert nodes["n_mentions"].max() >= 10
