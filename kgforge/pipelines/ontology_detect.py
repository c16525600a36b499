"""Ontology auto-detection pipeline.

Re-expresses ``Ontology.from_sources`` (reference ``ontology.py:35-58`` →
``steps/create_ontology_step.py:55-84``) as: optional sample →
per-batch partial-ontology proposal (actor pool; one tiny JSON row per
batch) → deterministic driver-side fold (partials are O(#blocks), each
a few KB — the aggregate is metadata-sized by construction) → prune +
validate (``ontology.py:168-253``).

The reference prompts an LLM per document; the sandbox model is a
deterministic rule-based proposer over the fixture grammar.  A chat
model can be slotted in through the same ``propose(text) -> Ontology``
protocol.
"""

from __future__ import annotations

import json

import pyarrow as pa

from ray.data import Dataset

from ..ontology import Attribute, Entity, Ontology, Relation
from ..stages.extract import ACTED_RE, AGE_RE, DIRECTED_RE, SEQUEL_RE


class RuleBasedOntologyProposer:
    """Proposes entity/relation types from grammar-matched sentences —
    the deterministic analog of CREATE_ONTOLOGY prompting
    (``fixtures/prompts.py:171-188``)."""

    def propose(self, text: str) -> Ontology:
        ont = Ontology()
        for line in text.split("\n"):
            line = line.strip()
            if ACTED_RE.match(line):
                ont.merge_with(Ontology(
                    [Entity("Person", [Attribute("name", "string", True, True)]),
                     Entity("Movie", [Attribute("title", "string", True, True),
                                      Attribute("release_year", "number", False)])],
                    [Relation("ACTED_IN", "Person", "Movie",
                              [Attribute("role", "string", False)])]))
            elif DIRECTED_RE.match(line):
                ont.merge_with(Ontology(
                    [Entity("Movie", [Attribute("title", "string", True, True),
                                      Attribute("release_year", "number", False)]),
                     Entity("Person", [Attribute("name", "string", True, True)])],
                    [Relation("DIRECTED", "Person", "Movie")]))
            elif AGE_RE.match(line):
                ont.merge_with(Ontology(
                    [Entity("Person", [Attribute("name", "string", True, True),
                                       Attribute("age", "number", False)])], []))
            elif SEQUEL_RE.match(line):
                ont.merge_with(Ontology(
                    [Entity("Movie", [Attribute("title", "string", True, True),
                                      Attribute("release_year", "number", False),
                                      Attribute("is_sequel", "boolean", False)])],
                    []))
        return ont


class _ProposeBatch:
    """Actor-pool stage: one partial-ontology JSON row per input batch."""

    def __init__(self, proposer_factory=None):
        self.proposer = (proposer_factory or RuleBasedOntologyProposer)()

    def __call__(self, batch: pa.Table) -> pa.Table:
        partial = Ontology()
        urls = batch.column("url").to_pylist()
        for text in batch.column("text").to_pylist():
            if text:
                partial.merge_with(self.proposer.propose(text))
        order_key = min(urls) if urls else ""
        return pa.Table.from_arrays(
            [pa.array([order_key], pa.string()),
             pa.array([json.dumps(partial.to_json())], pa.string())],
            names=["order_key", "partial"])


def detect_ontology(pages: Dataset, sample_frac: float = 1.0,
                    seed: int = 42, proposer_factory=None,
                    concurrency=(1, 4), prune: bool = True) -> Ontology:
    """Sampling mirrors the reference's UFC demo (``random.sample`` of 10%
    feeding ontology detection, ``examples/ufc/demo-ufc.ipynb``)."""
    ds = pages.select_columns(
        [c for c in ("url", "text") if c in pages.schema().names])
    if sample_frac < 1.0:
        ds = ds.random_sample(sample_frac, seed=seed)
    partials = ds.map_batches(
        _ProposeBatch,
        fn_constructor_kwargs={"proposer_factory": proposer_factory},
        batch_format="pyarrow", batch_size=256,
        concurrency=concurrency).take_all()
    merged = Ontology()
    # deterministic fold order regardless of task completion order
    for row in sorted(partials, key=lambda r: r["order_key"]):
        merged.merge_with(Ontology.from_json(json.loads(row["partial"])))
    if not merged.entities:
        raise ValueError("Failed to create ontology: no entities detected")
    if prune:
        merged.discard_entities_without_relations()
        merged.discard_relations_without_entities()
    merged.validate_entities()
    return merged


def fix_ontology(ontology: Ontology, model=None) -> Ontology:
    """Final review pass over the merged ontology (reference
    ``create_ontology_step.py:150-203`` sends it through one more LLM
    round).  With no model, applies the deterministic parts the reference
    prompt asks for — prune dangling relations, re-validate — and returns
    the result; with a ``GenerativeModel``, round-trips the JSON through
    one chat call (``FIX_ONTOLOGY``-style) and parses the reply."""
    if model is None:
        ontology.discard_relations_without_entities()
        ontology.validate_entities()
        return ontology
    from ..functions.json_repair import extract_json
    session = model.start_chat({"response_validation": False})
    reply = session.send_message(
        "Review and fix this ontology JSON; respond with JSON only:\n"
        + json.dumps(ontology.to_json()))
    return Ontology.from_json(json.loads(extract_json(reply.text)))
