"""Ontology-consistency checks for generated graph queries.

Port of the reference's query-path validators
(``graphrag_sdk/helpers.py:69-213``): fence stripping, entity/relation
label existence, and relation direction checks — reused here as the
ontology-consistency checker for externally generated Cypher (the
LLM generation itself is out of construction scope)."""

from __future__ import annotations

import re

from ..ontology import Ontology


def extract_cypher(text: str) -> str:
    """Strip markdown fences (reference ``helpers.py:69-77``)."""
    if not text.startswith("```"):
        return text
    matches = re.findall(r"```(?:cypher)?(.*?)```", text, re.DOTALL)
    return "".join(matches)


def validate_cypher(cypher: str, ontology: Ontology) -> list[str] | None:
    """None = valid; else the list of errors
    (reference ``helpers.py:80-104``)."""
    if not cypher:
        return ["Cypher statement is empty"]
    errors = []
    errors.extend(validate_cypher_entities_exist(cypher, ontology))
    errors.extend(validate_cypher_relations_exist(cypher, ontology))
    errors.extend(validate_cypher_relation_directions(cypher, ontology))
    return errors or None


def _clean_label(label: str) -> str:
    label = label.split(":")[1] if ":" in label else label
    return label.split("{")[0].strip() if "{" in label else label


def validate_cypher_entities_exist(cypher: str,
                                   ontology: Ontology) -> list[str]:
    """Reference ``helpers.py:107-119``."""
    missing = []
    for label in re.findall(r"\(:(.*?)\)", cypher):
        label = _clean_label(label)
        if not ontology.has_entity_with_label(label):
            missing.append(label)
    return [f"Entity {label} not found in ontology" for label in missing]


def validate_cypher_relations_exist(cypher: str,
                                    ontology: Ontology) -> list[str]:
    """Reference ``helpers.py:122-134``."""
    missing = []
    for label in re.findall(r"\[:(.*?)\]", cypher):
        label = _clean_label(label)
        if not ontology.has_relation_with_label(label):
            missing.append(label)
    return [f"Relation {label} not found in ontology" for label in missing]


def validate_cypher_relation_directions(cypher: str,
                                        ontology: Ontology) -> list[str]:
    """Direction check (reference ``helpers.py:137-213``): for each
    ``-[:REL]->`` / ``<-[:REL]-`` occurrence, some ontology relation with
    that label must connect the adjacent entity labels in that order."""
    errors = []
    relations = list(re.finditer(r"\[.*?\]", cypher))
    for i, relation in enumerate(relations):
        try:
            m = re.search(r"(?:\[)(?:\w)*(?:\:)([^{\]]+)", relation.group(0))
            if m is None:
                continue
            relation_label = m.group(1).strip()
            prev_rel = relations[i - 1] if i > 0 else None
            next_rel = relations[i + 1] if i < len(relations) - 1 else None
            before = (cypher[prev_rel.end():relation.start()] if prev_rel
                      else cypher[:relation.start()])
            if "," in before:
                before = before.split(",")[-1]
            rel_before = re.search(r"([^\)\],]+)",
                                   before[::-1]).group(0)[::-1]
            after = (cypher[relation.end():next_rel.start()] if next_rel
                     else cypher[relation.end():])
            rel_after = re.search(r"([^\(\[,]+)", after).group(0)
            entity_before = re.search(r"\(.+:(.*?)\)", before).group(0)
            entity_after = re.search(r"\(([^\),]+)(\)?)", after).group(0)
            if rel_before == "-" and rel_after == "->":
                source, target = entity_before, entity_after
            elif rel_before == "<-" and rel_after == "-":
                source, target = entity_after, entity_before
            else:
                continue
            source_label = re.search(r"(?:\:)([^\)\{]+)", source).group(1).strip()
            target_label = re.search(r"(?:\:)([^\)\{]+)", target).group(1).strip()
            candidates = ontology.get_relations_with_label(relation_label)
            if not candidates:
                errors.append(
                    f"Relation {relation_label} not found in ontology")
                continue
            if not any(r.source == source_label and r.target == target_label
                       for r in candidates):
                valid = "\n".join(str(r) for r in candidates)
                errors.append(
                    f"Relation {relation_label} does not connect "
                    f"{source_label} to {target_label}. Make sure the "
                    f"relation direction is correct. Valid relations:\n"
                    f"{valid}")
        except Exception:  # noqa: BLE001 — mirror reference's per-item skip
            continue
    return errors
