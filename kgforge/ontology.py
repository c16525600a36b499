"""Ontology schema objects.

From-scratch re-expression of the reference SDK's schema model
(`/root/reference/graphrag_sdk/{ontology,entity,relation,attribute}.py`)
with identical sanitization / merge / validation semantics:

- Entity labels: characters outside ``[a-zA-Z0-9_]`` are *removed*
  (``entity.py:39``).
- Relation labels: uppercased, then same removal (``relation.py:125``).
- Attribute names: characters outside ``[a-zA-Z0-9_]`` become ``_``
  (``attribute.py:68``).
- Attribute types: string | number | boolean only (``attribute.py:9-38``).
- ``merge``/``combine`` add attributes by name if absent
  (``entity.py:102-122``, ``relation.py:222-240``); ontology
  ``merge_with`` unions entities/relations by label
  (``ontology.py:134-166``).
- Pruning and validation per ``ontology.py:168-253``.
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field
from typing import Iterable

_STRIP_RE = re.compile(r"[^a-zA-Z0-9_]")
_UNDERSCORE_RE = re.compile(r"[^a-zA-Z0-9_]")

STRING = "string"
NUMBER = "number"
BOOLEAN = "boolean"
_VALID_TYPES = (STRING, NUMBER, BOOLEAN)


def sanitize_entity_label(label: str) -> str:
    """Reference ``entity.py:39`` / ``relation.py:34`` (removal)."""
    return _STRIP_RE.sub("", label)


def sanitize_relation_label(label: str) -> str:
    """Reference ``relation.py:125`` (uppercase + removal)."""
    return _STRIP_RE.sub("", label.upper())


def sanitize_attr_name(name: str) -> str:
    """Reference ``attribute.py:68`` (non-alnum → ``_``)."""
    return _UNDERSCORE_RE.sub("_", name)


def attr_type_from_string(txt: str) -> str:
    """Reference ``attribute.py:18-38`` (case-insensitive, strict)."""
    low = txt.lower()
    if low in _VALID_TYPES:
        return low
    raise ValueError(f"Invalid attribute type: {txt}")


@dataclass
class Attribute:
    name: str
    type: str
    unique: bool
    required: bool = False

    def __post_init__(self) -> None:
        self.name = sanitize_attr_name(self.name)
        self.type = attr_type_from_string(self.type)

    @staticmethod
    def from_json(txt: dict | str) -> "Attribute":
        d = txt if isinstance(txt, dict) else json.loads(txt)
        return Attribute(d["name"], d["type"], d["unique"],
                         d.get("required", False))

    @staticmethod
    def from_string(txt: str) -> "Attribute":
        """``name:type!*`` codec — ``!`` unique, ``*`` required
        (reference ``attribute.py:94-127``)."""
        name = txt.split(":")[0].strip()
        attr_type = txt.split(":")[1].split("!")[0].split("*")[0].strip()
        return Attribute(name, attr_type_from_string(attr_type),
                         "!" in txt, "*" in txt)

    def to_json(self) -> dict:
        return {"name": self.name, "type": self.type,
                "unique": self.unique, "required": self.required}

    def __str__(self) -> str:
        return (f"{self.name}: \"{self.type}"
                f"{'!' if self.unique else ''}{'*' if self.required else ''}\"")


@dataclass
class Entity:
    label: str
    attributes: list[Attribute] = field(default_factory=list)
    description: str = ""

    def __post_init__(self) -> None:
        self.label = sanitize_entity_label(self.label)

    @staticmethod
    def from_json(txt: dict | str) -> "Entity":
        d = txt if isinstance(txt, dict) else json.loads(txt)
        return Entity(d["label"],
                      [Attribute.from_json(a) for a in d.get("attributes", [])],
                      d.get("description", ""))

    def to_json(self) -> dict:
        return {"label": self.label,
                "attributes": [a.to_json() for a in self.attributes],
                "description": self.description}

    def merge(self, other: "Entity") -> "Entity":
        """Add-if-absent by attribute name (reference ``entity.py:102-122``)."""
        if self.label != other.label:
            raise ValueError("Entities must have the same label to be combined")
        have = {a.name for a in self.attributes}
        for attr in other.attributes:
            if attr.name not in have:
                self.attributes.append(attr)
                have.add(attr.name)
        return self

    def unique_attributes(self) -> list[Attribute]:
        return [a for a in self.attributes if a.unique]

    def __str__(self) -> str:
        return f"(:{self.label} {{{', '.join(str(a) for a in self.attributes)}}})"


@dataclass
class Relation:
    label: str
    source: str
    target: str
    attributes: list[Attribute] = field(default_factory=list)

    def __post_init__(self) -> None:
        self.label = sanitize_relation_label(self.label)
        # endpoint labels sanitize like entity labels (relation.py:34)
        self.source = sanitize_entity_label(
            self.source if isinstance(self.source, str) else self.source["label"])
        self.target = sanitize_entity_label(
            self.target if isinstance(self.target, str) else self.target["label"])

    @staticmethod
    def from_json(txt: dict | str) -> "Relation":
        d = txt if isinstance(txt, dict) else json.loads(txt)
        src = d["source"]
        dst = d["target"]
        return Relation(
            d["label"],
            src["label"] if isinstance(src, dict) else src,
            dst["label"] if isinstance(dst, dict) else dst,
            [Attribute.from_json(a) for a in d.get("attributes", [])])

    def to_json(self) -> dict:
        return {"label": self.label,
                "source": {"label": self.source},
                "target": {"label": self.target},
                "attributes": [a.to_json() for a in self.attributes]}

    def combine(self, other: "Relation") -> "Relation":
        """Add-if-absent by attribute name (reference ``relation.py:222-240``)."""
        if self.label != other.label:
            raise ValueError("Relations must have the same label to be combined")
        have = {a.name for a in self.attributes}
        for attr in other.attributes:
            if attr.name not in have:
                self.attributes.append(attr)
                have.add(attr.name)
        return self

    def __str__(self) -> str:
        return (f"(:{self.source})-[:{self.label} "
                f"{{{', '.join(str(a) for a in self.attributes)}}}]->(:{self.target})")


class Ontology:
    """Collection of entity and relation types (reference ``ontology.py:15``)."""

    def __init__(self, entities: Iterable[Entity] | None = None,
                 relations: Iterable[Relation] | None = None):
        self.entities: list[Entity] = list(entities or [])
        self.relations: list[Relation] = list(relations or [])

    # -- codec ------------------------------------------------------------
    @staticmethod
    def from_json(txt: dict | str) -> "Ontology":
        d = txt if isinstance(txt, dict) else json.loads(txt)
        return Ontology([Entity.from_json(e) for e in d["entities"]],
                        [Relation.from_json(r) for r in d["relations"]])

    def to_json(self) -> dict:
        return {"entities": [e.to_json() for e in self.entities],
                "relations": [r.to_json() for r in self.relations]}

    def dumps(self) -> str:
        return json.dumps(self.to_json(), indent=2)

    # -- merge (used by ontology auto-detection aggregation) ---------------
    def merge_with(self, other: "Ontology") -> "Ontology":
        """Union by label, merging attribute lists
        (reference ``ontology.py:134-166``)."""
        by_label = {e.label: e for e in self.entities}
        for entity in other.entities:
            if entity.label in by_label:
                by_label[entity.label].merge(entity)
            else:
                self.entities.append(entity)
                by_label[entity.label] = entity
        rel_by_label = {r.label: r for r in self.relations}
        for relation in other.relations:
            if relation.label in rel_by_label:
                rel_by_label[relation.label].combine(relation)
            else:
                self.relations.append(relation)
                rel_by_label[relation.label] = relation
        return self

    # -- pruning / validation ---------------------------------------------
    def discard_entities_without_relations(self) -> "Ontology":
        """Reference ``ontology.py:168-202``."""
        used = {r.source for r in self.relations} | {r.target for r in self.relations}
        discard = {e.label for e in self.entities if e.label not in used}
        self.entities = [e for e in self.entities if e.label not in discard]
        self.relations = [r for r in self.relations
                          if r.source not in discard and r.target not in discard]
        return self

    def discard_relations_without_entities(self) -> "Ontology":
        """Reference ``ontology.py:204-227``."""
        labels = {e.label for e in self.entities}
        bad = {r.label for r in self.relations
               if r.source not in labels or r.target not in labels}
        self.relations = [r for r in self.relations if r.label not in bad]
        return self

    def validate_entities(self) -> bool:
        """Every entity needs >= 1 unique attribute
        (reference ``ontology.py:229-253``)."""
        return all(len(e.unique_attributes()) > 0 for e in self.entities)

    # -- lookups -----------------------------------------------------------
    def get_entity_with_label(self, label: str) -> Entity | None:
        return next((e for e in self.entities if e.label == label), None)

    def get_relations_with_label(self, label: str) -> list[Relation]:
        return [r for r in self.relations if r.label == label]

    def has_entity_with_label(self, label: str) -> bool:
        return any(e.label == label for e in self.entities)

    def has_relation_with_label(self, label: str) -> bool:
        return any(r.label == label for r in self.relations)

    def __str__(self) -> str:
        return "Entities:\n- {e}\n\nEdges:\n- {r}".format(
            e="\n- ".join(str(x) for x in self.entities),
            r="\n- ".join(str(x) for x in self.relations))
