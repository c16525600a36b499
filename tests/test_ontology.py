"""Ontology / identity-semantics unit tests (reference parity:
``graphrag_sdk/{entity,relation,attribute,ontology,helpers}.py``)."""

import pytest

from kgforge.keys import (cypher_literal, node_key, render_properties,
                          unique_attr_dict, coerce_value)
from kgforge.ontology import (Attribute, Entity, Ontology, Relation,
                              sanitize_attr_name, sanitize_entity_label,
                              sanitize_relation_label)
from kgforge.testing.corpus import ONTOLOGY_JSON


def test_label_sanitizers():
    # entity: strip (entity.py:39); relation: upper+strip (relation.py:125);
    # attribute: non-alnum → _ (attribute.py:68)
    assert sanitize_entity_label("Person Name!") == "PersonName"
    assert sanitize_relation_label("acted-in") == "ACTEDIN"
    assert sanitize_attr_name("release-year") == "release_year"


def test_attribute_string_codec():
    a = Attribute.from_string("name:string!*")
    assert (a.name, a.type, a.unique, a.required) == ("name", "string", True, True)
    assert str(a) == 'name: "string!*"'
    with pytest.raises(ValueError):
        Attribute.from_string("x:datetime")


def test_ontology_json_roundtrip():
    ont = Ontology.from_json(ONTOLOGY_JSON)
    again = Ontology.from_json(ont.to_json())
    assert again.to_json() == ont.to_json()
    assert ont.get_entity_with_label("Person").unique_attributes()[0].name == "name"
    assert [r.label for r in ont.get_relations_with_label("ACTED_IN")] == ["ACTED_IN"]


def test_merge_add_if_absent():
    e1 = Entity("Person", [Attribute("name", "string", True)])
    e2 = Entity("Person", [Attribute("name", "string", False),
                           Attribute("age", "number", False)])
    e1.merge(e2)
    # existing attr NOT overwritten; new attr appended (entity.py:117-121)
    assert [(a.name, a.unique) for a in e1.attributes] == [
        ("name", True), ("age", False)]


def test_ontology_merge_and_prune():
    o1 = Ontology([Entity("A", [Attribute("k", "string", True)])], [])
    o2 = Ontology([Entity("B", [Attribute("k", "string", True)])],
                  [Relation("R", "A", "B")])
    o1.merge_with(o2)
    assert {e.label for e in o1.entities} == {"A", "B"}
    o1.discard_entities_without_relations()
    assert {e.label for e in o1.entities} == {"A", "B"}
    o3 = Ontology([Entity("C", [Attribute("k", "string", True)]),
                   Entity("D", [])],
                  [Relation("R", "C", "C")])
    o3.discard_entities_without_relations()
    assert [e.label for e in o3.entities] == ["C"]
    o4 = Ontology([Entity("X", [Attribute("k", "string", True)])],
                  [Relation("R", "X", "Gone")])
    o4.discard_relations_without_entities()
    assert o4.relations == []
    assert o3.validate_entities() is True
    assert Ontology([Entity("N", [])], []).validate_entities() is False


def test_cypher_literal_reference_quirks():
    # helpers.py:31-47: escape unescaped quotes; "None" → ""; str() others
    assert cypher_literal('say "hi"') == '"say \\"hi\\""'
    assert cypher_literal("it's") == '"it\\\'s"'
    assert cypher_literal('pre\\"escaped') == '"pre\\"escaped"'
    assert cypher_literal("None") == '""'
    assert cypher_literal(None) == '""'
    assert cypher_literal(True) == "True"
    assert cypher_literal(30) == "30"
    assert cypher_literal(1.5) == "1.5"


def test_render_properties_order_and_list_quirk():
    assert render_properties({"a": 1, "b": "x"}) == '{a: 1, b: "x"}'
    assert render_properties([]) == "{}"
    assert render_properties(["x", "y"]) == "{0: x, 1: y}"


def test_node_key_unique_defaults():
    ont = Ontology.from_json(ONTOLOGY_JSON)
    person = ont.get_entity_with_label("Person")
    # missing unique attr defaults to "" (extract_data_step.py:201-207)
    assert unique_attr_dict(person, {}) == {"name": ""}
    k1 = node_key("Person", person, {"name": "John Doe", "age": 44})
    k2 = node_key("Person", person, {"name": "John Doe"})
    assert k1 == k2  # non-unique attrs are not identity
    assert "John Doe" in k1
    # number vs string distinctness (Cypher literal semantics)
    movie = ont.get_entity_with_label("Movie")
    assert (node_key("Movie", movie, {"title": "30"})
            != node_key("Movie", movie, {"title": 30}))


def test_coerce_value():
    assert coerce_value("7", "number") == 7.0
    assert coerce_value("x", "number") is None
    assert coerce_value(True, "boolean") is True
    assert coerce_value("false", "boolean") is False
    assert coerce_value("maybe", "boolean") is None
    assert coerce_value(3, "string") == "3"
    assert coerce_value(None, "string") is None
