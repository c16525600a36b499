"""ReferenceSim: sequential plain-Python oracle of the reference's upsert
semantics (``graphrag_sdk/steps/extract_data_step.py:195-269``).

Both engines share the sandbox's deterministic extraction model (SURVEY
§7.0 — no live LLMs), so comparing the distributed Ray pipeline against
this oracle isolates the *dataflow* fidelity: link → canonicalize →
materialize.  The oracle processes documents strictly in
``(warc_ts, url)`` order and mentions in payload order, i.e. the
deterministic serialization of the reference's thread pool.

Semantics reproduced:

- ``MERGE (n:label {unique attrs}) SET n += {non-unique attrs}``:
  node keyed by rendered unique attrs (schema order, ``""`` defaults),
  non-unique attrs last-writer-wins per attribute.
- unknown entity/relation labels silently dropped.
- edges keyed by (label, src node, dst node); attrs ``SET r +=``
  unfiltered; dangling edges (endpoint not in the final node set)
  silently dropped — matching the engine's end-of-run join, and the
  reference whenever relation mentions co-occur with their endpoint
  entities (which the extraction prompt and our extractor guarantee).

P/R is computed on triple identity: nodes ``(label, unique attrs)``,
edges ``(label, src identity, dst identity)``; attribute agreement is
scored separately (BASELINE.md: P/R >= 0.95 target).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

from ..keys import (KEY_SEP, coerce_value, node_key, non_unique_attr_dict,
                    render_properties, unique_attr_dict)
from ..ontology import Ontology
from ..stages.canonicalize import edge_attr_schema, node_attr_schema


def _resolve(label: str, attrs: dict, alias_map: dict | None) -> dict:
    if not alias_map or label not in alias_map:
        return attrs
    out = dict(attrs)
    for name, table in alias_map[label].items():
        v = out.get(name)
        if isinstance(v, str) and v in table:
            out[name] = table[v]
    return out


@dataclass
class SimResult:
    nodes: dict = field(default_factory=dict)   # key -> row dict
    edges: dict = field(default_factory=dict)   # (label, skey, dkey) -> row


def simulate(docs: list[tuple[int, str, dict]], ontology: Ontology,
             alias_map: dict | None = None) -> SimResult:
    """``docs``: (warc_ts_us, url, payload) triples; payload is the
    reference extraction JSON (entities + relations)."""
    from ..keys import hash64
    # the engine's deterministic write order is (warc_ts, hash64(url), seq)
    # — the url hash keeps shuffled state compact; the oracle serializes
    # documents in exactly that order
    ordered = sorted(docs, key=lambda d: (d[0], hash64(d[1])))
    nodes: dict[str, dict] = {}
    n_schema = node_attr_schema(ontology)
    e_schema = edge_attr_schema(ontology)

    # pass 1: entity upserts (MERGE ... SET +=), sequential
    for _ts, _url, payload in ordered:
        for ent in payload.get("entities", []):
            label = ent.get("label")
            entity = ontology.get_entity_with_label(label)
            if entity is None:
                continue
            attrs = _resolve(label, ent.get("attributes", {}), alias_map)
            uniq = unique_attr_dict(entity, attrs)
            key = label + KEY_SEP + render_properties(uniq)
            row = nodes.setdefault(key, {"label": label, "unique": uniq,
                                         "attrs": {}, "n_mentions": 0})
            row["attrs"].update(non_unique_attr_dict(entity, attrs))
            row["n_mentions"] += 1

    # pass 2: relation upserts against the final node set
    edges: dict[tuple, dict] = {}
    for _ts, _url, payload in ordered:
        for rel in payload.get("relations", []):
            label = rel.get("label")
            if not ontology.has_relation_with_label(label):
                continue
            src = rel.get("source") or {}
            dst = rel.get("target") or {}
            s_ent = ontology.get_entity_with_label(src.get("label"))
            d_ent = ontology.get_entity_with_label(dst.get("label"))
            if s_ent is None or d_ent is None:
                continue
            skey = node_key(src["label"], s_ent,
                            _resolve(src["label"], src.get("attributes", {}),
                                     alias_map))
            dkey = node_key(dst["label"], d_ent,
                            _resolve(dst["label"], dst.get("attributes", {}),
                                     alias_map))
            if skey not in nodes or dkey not in nodes:
                continue  # dangling: MATCH no-op
            row = edges.setdefault((label, skey, dkey),
                                   {"attrs": {}, "n_mentions": 0})
            row["attrs"].update(rel.get("attributes", {}) or {})
            row["n_mentions"] += 1

    # typed views (same coercion rules as the engine sink)
    for key, row in nodes.items():
        typed = {}
        merged = {**row["attrs"], **row["unique"]}
        for name, typ in n_schema.items():
            typed[name] = (coerce_value(merged[name], typ)
                           if name in merged else None)
        row["typed"] = typed
    for k, row in edges.items():
        row["typed"] = {name: (coerce_value(row["attrs"][name], typ)
                               if name in row["attrs"] else None)
                        for name, typ in e_schema.items()}
    return SimResult(nodes, edges)


def simulate_corpus(corpus, ontology: Ontology | None = None) -> SimResult:
    """Convenience: run the oracle over a ``kgforge.testing.corpus.Corpus``
    (only non-empty texts, mirroring the pipeline's empty filter)."""
    ontology = ontology or corpus.ontology
    urls = corpus.pages.column("url").to_pylist()
    tss = corpus.pages.column("warc_ts").cast("int64").to_pylist()
    texts = corpus.pages.column("text").to_pylist()
    docs = [(ts, url, corpus.truth[url])
            for ts, url, text in zip(tss, urls, texts)
            if text is not None and len(text) > 0]
    return simulate(docs, ontology, corpus.alias_map)


def compare(engine_nodes, engine_edges, sim: SimResult,
            ontology: Ontology) -> dict:
    """P/R + attribute agreement between engine output tables (pandas
    DataFrames) and the oracle."""
    n_schema = node_attr_schema(ontology)
    e_schema = edge_attr_schema(ontology)

    eng_nodes = {}
    for _, r in engine_nodes.iterrows():
        eng_nodes[r["node_key"]] = r
    sim_keys = set(sim.nodes)
    eng_keys = set(eng_nodes)
    inter = sim_keys & eng_keys
    node_precision = len(inter) / max(1, len(eng_keys))
    node_recall = len(inter) / max(1, len(sim_keys))

    attr_ok = 0
    attr_total = 0
    for key in inter:
        srow = sim.nodes[key]
        erow = eng_nodes[key]
        for name, typ in n_schema.items():
            attr_total += 1
            sv = srow["typed"].get(name)
            ev = erow.get(name)
            if _eq(sv, ev):
                attr_ok += 1
        attr_total += 1
        if int(srow["n_mentions"]) == int(erow["n_mentions"]):
            attr_ok += 1

    # edges: map engine ids back to keys through the nodes table
    id_to_key = {int(r["node_id"]): r["node_key"]
                 for _, r in engine_nodes.iterrows()}
    eng_edges = {}
    for _, r in engine_edges.iterrows():
        ident = (r["label"], id_to_key.get(int(r["src_id"])),
                 id_to_key.get(int(r["dst_id"])))
        eng_edges[ident] = r
    sim_e = set(sim.edges)
    eng_e = set(eng_edges)
    inter_e = sim_e & eng_e
    edge_precision = len(inter_e) / max(1, len(eng_e))
    edge_recall = len(inter_e) / max(1, len(sim_e))
    for ident in inter_e:
        srow = sim.edges[ident]
        erow = eng_edges[ident]
        for name, typ in e_schema.items():
            attr_total += 1
            if _eq(srow["typed"].get(name), erow.get(name)):
                attr_ok += 1
        attr_total += 1
        if int(srow["n_mentions"]) == int(erow["n_mentions"]):
            attr_ok += 1

    return {
        "node_precision": node_precision, "node_recall": node_recall,
        "edge_precision": edge_precision, "edge_recall": edge_recall,
        "attr_agreement": attr_ok / max(1, attr_total),
        "nodes_engine": len(eng_keys), "nodes_oracle": len(sim_keys),
        "edges_engine": len(eng_e), "edges_oracle": len(sim_e),
    }


def _eq(a, b) -> bool:
    import math

    import pandas as pd
    a_null = a is None or (isinstance(a, float) and math.isnan(a))
    b_null = b is None or b is pd.NA or (isinstance(b, float) and math.isnan(b))
    if a_null or b_null:
        return a_null and b_null
    if isinstance(a, float) or isinstance(b, float):
        return float(a) == float(b)
    return a == b
