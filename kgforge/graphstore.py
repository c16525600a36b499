"""Materialized-graph store API.

The reference's ``KnowledgeGraph`` fronts a live FalkorDB; our graph is
deduplicated node/edge Parquet.  This module supplies the non-LLM API
surface a reference user relies on:

- ``GraphStore.add_node`` / ``add_add_edge``-equivalent manual inserts
  with the reference's attribute validation (``kg.py:189-296``:
  ontology membership, required-attribute presence, string/number/boolean
  isinstance checks with the same error messages' intent).
- ``GraphStore.query(sql)``: DuckDB over the node/edge tables (views
  ``nodes`` and ``edges``) — the analog of ``kg.ask``'s graph querying
  with SQL instead of generated Cypher.
- ``ask(question)``: the reference's Cypher-generation/QA loop is
  LLM-dependent (``kg.py:121-168``); the hook validates a supplied
  generated query against the ontology (reusing the reference's
  ``validate_cypher`` semantics via :mod:`kgforge.functions.cypher_check`)
  and raises ``NotImplementedError`` for the generation step itself.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq

from .keys import EDGE_SEP, KEY_SEP, coerce_value, hash64, render_properties
from .ontology import Ontology
from .stages.canonicalize import edge_attr_schema, node_attr_schema


class GraphStore:
    def __init__(self, output_dir: str, ontology: Ontology | None = None):
        self.output_dir = output_dir
        if ontology is None:
            with open(os.path.join(output_dir, "ontology.json")) as fh:
                ontology = Ontology.from_json(json.load(fh))
        self.ontology = ontology
        self._extra_nodes: list[dict] = []
        self._extra_edges: list[dict] = []
        # materialized-key caches: loaded from parquet ONCE per store and
        # updated incrementally — per-insert re-reads made manual bulk
        # ingestion O(inserts × table size).  SINGLE-WRITER assumption:
        # rows written to output_dir by another process after first use
        # are invisible until refresh() (same contract as any cached
        # handle over files)
        self._node_key_cache: set[str] | None = None
        self._edge_id_cache: set[int] | None = None

    def refresh(self) -> None:
        """Drop the materialized-key caches (call after another writer —
        e.g. a pipeline run — appends to this store's output_dir)."""
        self._node_key_cache = None
        self._edge_id_cache = None

    # -- validation (reference kg.py:271-296) ------------------------------
    def _validate_attributes(self, attributes: list, payload: dict) -> None:
        schema_names = {a.name for a in attributes}
        for key in payload:
            if key not in schema_names:
                raise ValueError(f"Invalid attribute {key}")
        for attr in attributes:
            if attr.required and attr.name not in payload:
                raise ValueError(f"Missing required attribute {attr.name}")
            if attr.name not in payload:
                continue
            v = payload[attr.name]
            if attr.type == "string" and not isinstance(v, str):
                raise ValueError(f"Attribute {attr.name} must be a string")
            if attr.type == "number" and (isinstance(v, bool)
                                          or not isinstance(v, (int, float))):
                raise ValueError(f"Attribute {attr.name} must be a number")
            if attr.type == "boolean" and not isinstance(v, bool):
                raise ValueError(f"Attribute {attr.name} must be a boolean")

    def add_node(self, label: str, attributes: dict) -> int:
        """Validated manual node upsert (reference ``kg.py:189-237``).

        Mirrors the reference's idempotent ``MERGE (n) SET n += {...}``:
        a key already pending in this session is updated in place
        (provided attributes overwrite); a key already materialized on
        disk is a MERGE match — no duplicate row is appended (attribute
        updates to already-materialized nodes are not rewritten into the
        parquet; rebuild or use the pipeline for bulk updates).  Unique
        attribute columns are populated from the ``""``-defaulted unique
        dict so manual rows agree with the pipeline sink's values.
        """
        entity = self.ontology.get_entity_with_label(label)
        if entity is None:
            raise ValueError(f"Entity {label} not found in ontology")
        self._validate_attributes(entity.attributes, attributes)
        uniq = {a.name: attributes.get(a.name, "")
                for a in entity.attributes if a.unique}
        key = label + KEY_SEP + render_properties(uniq)
        node_id = hash64(key)
        values = dict(attributes)
        values.update(uniq)  # "" defaults, same as the pipeline finalizer
        for pending in self._extra_nodes:
            if pending["node_key"] == key:  # session upsert: SET +=
                for name, typ in node_attr_schema(self.ontology).items():
                    if name in values:
                        pending[name] = coerce_value(values[name], typ)
                return node_id
        if key in self._known_node_keys():
            return node_id  # MERGE match against materialized table
        row = {"node_id": node_id, "node_key": key, "label": label,
               "n_mentions": 1}
        for name, typ in node_attr_schema(self.ontology).items():
            row[name] = (coerce_value(values[name], typ)
                         if name in values else None)
        self._extra_nodes.append(row)
        self._known_node_keys().add(key)
        return node_id

    def add_edge(self, label: str, src_label: str, src_attrs: dict,
                 dst_label: str, dst_attrs: dict,
                 attributes: dict | None = None) -> int:
        """Validated manual edge insert; endpoints must resolve against
        the materialized node set (MATCH no-op semantics)."""
        rels = self.ontology.get_relations_with_label(label)
        if not rels:
            raise ValueError(f"Relation {label} not found in ontology")
        attributes = attributes or {}
        self._validate_attributes(rels[0].attributes, attributes)
        s_ent = self.ontology.get_entity_with_label(src_label)
        d_ent = self.ontology.get_entity_with_label(dst_label)
        if s_ent is None or d_ent is None:
            raise ValueError("Edge endpoints must be ontology entities")
        skey = src_label + KEY_SEP + render_properties(
            {a.name: src_attrs.get(a.name, "") for a in s_ent.attributes
             if a.unique})
        dkey = dst_label + KEY_SEP + render_properties(
            {a.name: dst_attrs.get(a.name, "") for a in d_ent.attributes
             if a.unique})
        known = self._known_node_keys()
        if skey not in known or dkey not in known:
            raise ValueError("Edge endpoints do not exist in the graph")
        from .keys import compose_edge_key
        # same identity as the pipeline: edge_key = label‖src_key‖dst_key
        edge_id = hash64(compose_edge_key(label, skey, dkey))
        # idempotent MERGE like add_node: a pending edge with the same
        # identity is updated (SET r +=); a materialized one is a match
        for pending in self._extra_edges:
            if pending["edge_id"] == edge_id:
                for name, typ in edge_attr_schema(self.ontology).items():
                    if name in attributes:
                        pending[name] = coerce_value(attributes[name], typ)
                return edge_id
        if edge_id in self._known_edge_ids():
            return edge_id
        row = {"edge_id": edge_id,
               "label": label, "src_id": hash64(skey), "dst_id": hash64(dkey),
               "n_mentions": 1}
        for name, typ in edge_attr_schema(self.ontology).items():
            row[name] = (coerce_value(attributes[name], typ)
                         if name in attributes else None)
        self._extra_edges.append(row)
        self._known_edge_ids().add(edge_id)
        return edge_id

    def _known_node_keys(self) -> set[str]:
        if self._node_key_cache is None:
            self._node_key_cache = set(
                self._read_column("nodes", "node_key"))
            self._node_key_cache.update(r["node_key"]
                                        for r in self._extra_nodes)
        return self._node_key_cache

    def _known_edge_ids(self) -> set[int]:
        if self._edge_id_cache is None:
            self._edge_id_cache = set(self._read_column("edges", "edge_id"))
            self._edge_id_cache.update(r["edge_id"]
                                       for r in self._extra_edges)
        return self._edge_id_cache

    def _read_column(self, table: str, col: str) -> list:
        import glob
        d = os.path.join(self.output_dir, table)
        if glob.glob(os.path.join(d, "*.parquet")):
            return pq.ParquetDataset(d).read(columns=[col]) \
                .column(col).to_pylist()
        return []

    def _node_keys(self) -> list[str]:
        return list(self._known_node_keys())

    def flush(self) -> None:
        """Append manual inserts as an extra parquet part per table (a
        fresh uuid-named part each time — never clobbers earlier parts)."""
        import uuid
        if self._extra_nodes:
            tbl = pa.Table.from_pylist(
                self._extra_nodes, schema=self._node_schema())
            pq.write_table(tbl, os.path.join(
                self.output_dir, "nodes",
                f"manual-{uuid.uuid4().hex[:12]}.parquet"))
            self._extra_nodes = []
        if self._extra_edges:
            tbl = pa.Table.from_pylist(
                self._extra_edges, schema=self._edge_schema())
            pq.write_table(tbl, os.path.join(
                self.output_dir, "edges",
                f"manual-{uuid.uuid4().hex[:12]}.parquet"))
            self._extra_edges = []

    @staticmethod
    def _attr_type(t: str) -> pa.DataType:
        return {"string": pa.string(), "number": pa.float64(),
                "boolean": pa.bool_()}[t]

    def _node_schema(self) -> pa.Schema:
        fields = [("node_id", pa.uint64()), ("node_key", pa.string()),
                  ("label", pa.string())]
        fields += [(n, self._attr_type(t))
                   for n, t in node_attr_schema(self.ontology).items()]
        fields.append(("n_mentions", pa.int64()))
        return pa.schema(fields)

    def _edge_schema(self) -> pa.Schema:
        fields = [("edge_id", pa.uint64()), ("label", pa.string()),
                  ("src_id", pa.uint64()), ("dst_id", pa.uint64())]
        fields += [(n, self._attr_type(t))
                   for n, t in edge_attr_schema(self.ontology).items()]
        fields.append(("n_mentions", pa.int64()))
        return pa.schema(fields)

    # -- querying ----------------------------------------------------------
    def query(self, sql: str):
        """SQL over ``nodes`` / ``edges`` views (DuckDB)."""
        import duckdb
        con = duckdb.connect()
        con.execute(f"CREATE VIEW nodes AS SELECT * FROM read_parquet("
                    f"'{self.output_dir}/nodes/*.parquet')")
        con.execute(f"CREATE VIEW edges AS SELECT * FROM read_parquet("
                    f"'{self.output_dir}/edges/*.parquet')")
        return con.execute(sql).fetch_arrow_table()

    @staticmethod
    def stringify_result(table: pa.Table) -> str:
        """Query-result → LLM-context string — the analog of the
        reference's ``stringify_falkordb_response`` (``helpers.py:52-66``:
        nested result lists stringified row-wise)."""
        rows = [[str(v) for v in row.values()] for row in table.to_pylist()]
        return str(rows).strip()

    def ask(self, question: str, model_config=None, executor=None,
            translate=None):
        """Reference ``kg.ask`` (``kg.py:121-168``): with a
        ``KnowledgeGraphModelConfig`` (any ``GenerativeModel`` backend —
        no live LLM ships in this sandbox, but ``StaticReplayModel``
        drives the full path in tests), runs the Cypher-gen retry loop +
        QA via :mod:`kgforge.querypath`.  Without one, raises — use
        ``query(sql)`` directly."""
        if model_config is None:
            raise NotImplementedError(
                "ask() requires a model_config with a GenerativeModel "
                "backend for query generation; use query(sql) over the "
                "nodes/edges views, or pass a KnowledgeGraphModelConfig")
        from .querypath import ChatSession, graphstore_sql_executor
        if executor is None:
            if translate is None:
                raise ValueError("pass executor=... or translate=... to "
                                 "run generated Cypher against the store")
            executor = graphstore_sql_executor(self, translate)
        session = ChatSession(model_config, self.ontology, executor,
                              stringify=self.stringify_result)
        return session.send_message(question)
