"""Triple-extraction stage: actor-pool ``map_batches`` over Arrow batches.

Re-expresses the reference's per-document extraction
(``graphrag_sdk/steps/extract_data_step.py:93-176``) as a stateful Ray
Data stage: the model / compiled patterns / ontology are built ONCE per
actor in ``__init__``; each ``__call__`` processes one Arrow batch of
pages and emits one row per extracted entity/relation *mention*.

Mention schema (flat Arrow, JSON-encoded attribute payloads because the
ontology — and therefore the attribute set — is run-time data):

    url: string, warc_ts: int64 (µs), seq: int32,
    kind: string ("entity" | "relation"), label: string,
    attrs: string (JSON), src_label/src_attrs/dst_label/dst_attrs: string

The default model is :class:`RuleBasedExtractor` — a deterministic,
ontology-constrained pattern extractor (the sandbox stand-in for the
reference's LLM; see SURVEY.md §7.0).  Any ``GenerativeModel`` chat
backend can be plugged in via :class:`ChatModelExtractor`, which preserves
the reference's full prompt/continue/repair call path.
"""

from __future__ import annotations

import json
import re
from typing import Protocol

import pyarrow as pa

from ..models import RateLimiter, chat_extract_payload
from ..ontology import Ontology

MENTION_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("warc_ts", pa.int64()),
    ("seq", pa.int32()),
    ("kind", pa.string()),
    ("label", pa.string()),
    ("attrs", pa.string()),
    ("src_label", pa.string()),
    ("src_attrs", pa.string()),
    ("dst_label", pa.string()),
    ("dst_attrs", pa.string()),
])


class ExtractorModel(Protocol):
    """Produces the reference's extraction payload
    (``fixtures/prompts.py:248-331`` JSON schema) for one document.
    ``instruction`` carries the per-source LLM instruction string
    (reference ``source.py:44-45``; flows as an optional ``instruction``
    column on the pages table)."""

    def extract(self, text: str, instruction: str = "") -> dict: ...


# person: Capitalized words or single-capital initials ("J. Doe")
_PERSON = r"(?:[A-Z][a-z]+|[A-Z]\.)(?: (?:[A-Z][a-z]+|[A-Z]\.))*"

ACTED_RE = re.compile(
    rf"^({_PERSON}) starred in (.+?) \((\d{{4}})\) as ([A-Za-z]+)\.$")
DIRECTED_RE = re.compile(
    rf"^(.+?) \((\d{{4}})\) was directed by ({_PERSON})\.$")
AGE_RE = re.compile(rf"^({_PERSON}) is (\d+) years old\.$")
SEQUEL_RE = re.compile(r"^(.+?) \((\d{4})\) is a sequel\.$")


class RuleBasedExtractor:
    """Deterministic grammar extractor over the fixture corpus sentences
    (FIXTURES.md F1).  One payload per document, reference JSON shape."""

    def extract(self, text: str, instruction: str = "") -> dict:
        entities: list[dict] = []
        relations: list[dict] = []
        for line in text.split("\n"):
            line = line.strip()
            # cheap substring gate before the anchored regexes — most
            # lines (boilerplate, titles) match none of the templates
            if " starred in " in line:
                m = ACTED_RE.match(line)
            else:
                m = None
            if m:
                person, title, year, role = m.groups()
                entities.append({"label": "Person", "attributes": {"name": person}})
                entities.append({"label": "Movie", "attributes": {
                    "title": title, "release_year": int(year)}})
                relations.append({
                    "label": "ACTED_IN",
                    "source": {"label": "Person", "attributes": {"name": person}},
                    "target": {"label": "Movie", "attributes": {"title": title}},
                    "attributes": {"role": role}})
                continue
            m = DIRECTED_RE.match(line) if " was directed by " in line else None
            if m:
                title, year, person = m.groups()
                entities.append({"label": "Movie", "attributes": {
                    "title": title, "release_year": int(year)}})
                entities.append({"label": "Person", "attributes": {"name": person}})
                relations.append({
                    "label": "DIRECTED",
                    "source": {"label": "Person", "attributes": {"name": person}},
                    "target": {"label": "Movie", "attributes": {"title": title}},
                    "attributes": {}})
                continue
            m = AGE_RE.match(line) if " years old." in line else None
            if m:
                person, age = m.groups()
                entities.append({"label": "Person", "attributes": {
                    "name": person, "age": int(age)}})
                continue
            m = SEQUEL_RE.match(line) if " is a sequel." in line else None
            if m:
                title, year = m.groups()
                entities.append({"label": "Movie", "attributes": {
                    "title": title, "release_year": int(year),
                    "is_sequel": True}})
        return {"entities": entities, "relations": relations}


class ChatModelExtractor:
    """Adapter running the reference's chat call path
    (``extract_data_step.py:119-176``) against any ``GenerativeModel``."""

    def __init__(self, model, instructions: str = "",
                 rate_limit_calls: int | None = None,
                 rate_limit_period: float = 60.0):
        self.model = model
        self.instructions = instructions
        self.limiter = (RateLimiter(rate_limit_calls, rate_limit_period)
                        if rate_limit_calls else None)

    def extract(self, text: str, instruction: str = "") -> dict:
        return chat_extract_payload(self.model, text,
                                    source_instructions=instruction,
                                    instructions=self.instructions,
                                    limiter=self.limiter)


def payload_to_mention_rows(url: str, warc_ts: int, payload: dict) -> list[tuple]:
    """Flatten one document payload into mention rows.

    ``seq`` preserves the reference's per-document processing order —
    entities first, then relations (``extract_data_step.py:177-189``) —
    which defines deterministic last-writer-wins attribute merge order
    downstream.
    """
    def _attrs(obj: dict, key: str = "attributes") -> dict | None:
        # reference swallows bad per-item payloads (extract_data_step.py
        # ~180-189, per-item try/except-continue); a null or non-dict
        # "attributes" must not crash the task — treat null as {} and any
        # other non-dict as a skip signal.
        val = obj.get(key) or {}
        return val if isinstance(val, dict) else None

    rows = []
    seq = 0
    for ent in payload.get("entities", []):
        if not isinstance(ent, dict) or "label" not in ent:
            continue
        attrs = _attrs(ent)
        if attrs is None:
            continue
        rows.append((url, warc_ts, seq, "entity", str(ent["label"]),
                     json.dumps(attrs, sort_keys=False),
                     None, None, None, None))
        seq += 1
    for rel in payload.get("relations", []):
        if not isinstance(rel, dict) or "label" not in rel:
            continue
        src = rel.get("source")
        dst = rel.get("target")
        src = src if isinstance(src, dict) else {}
        dst = dst if isinstance(dst, dict) else {}
        attrs, src_attrs, dst_attrs = _attrs(rel), _attrs(src), _attrs(dst)
        if attrs is None or src_attrs is None or dst_attrs is None:
            continue
        rows.append((url, warc_ts, seq, "relation", str(rel["label"]),
                     json.dumps(attrs),
                     str(src.get("label", "")),
                     json.dumps(src_attrs),
                     str(dst.get("label", "")),
                     json.dumps(dst_attrs)))
        seq += 1
    return rows


# task-based variant for light models: stateless tasks reuse warm worker
# processes; the extractor lives in a per-process module cache (see the
# same pattern in canonicalize.fused_extract_normalize_task)
_EXTRACT_STATE: dict = {}


def triple_extract_task(batch: pa.Table, *, ontology_json: str | None = None,
                        max_input_chars: int = 500_000) -> pa.Table:
    key = hash(ontology_json)
    ex = _EXTRACT_STATE.get(key)
    if ex is None:
        if len(_EXTRACT_STATE) > 4:
            _EXTRACT_STATE.clear()
        ex = TripleExtractor(ontology_json=ontology_json,
                             max_input_chars=max_input_chars)
        _EXTRACT_STATE[key] = ex
    return ex(batch)


class TripleExtractor:
    """Actor-pool stage: pages batch → mention rows batch.

    Usage::

        ds.map_batches(TripleExtractor,
                       fn_constructor_kwargs={"ontology_json": ont.dumps()},
                       batch_format="pyarrow", batch_size=64,
                       concurrency=(2, 8))
    """

    def __init__(self, ontology_json: str | None = None,
                 model_factory=None, max_input_chars: int = 500_000):
        # once-per-actor setup (model build / regex compile)
        self.ontology = (Ontology.from_json(ontology_json)
                         if ontology_json else None)
        self.model: ExtractorModel = (model_factory() if model_factory
                                      else RuleBasedExtractor())
        # reference input truncation (extract_data_step.py:119, config :42-46)
        self.max_input_chars = max_input_chars

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        ts = batch.column("warc_ts")
        if pa.types.is_timestamp(ts.type):
            ts = ts.cast(pa.int64())
        ts = ts.to_pylist()
        texts = batch.column("text").to_pylist()
        instructions = (batch.column("instruction").to_pylist()
                        if "instruction" in batch.column_names
                        else [""] * len(urls))
        rows: list[tuple] = []
        for url, t, text, instr in zip(urls, ts, texts, instructions):
            if text is None or len(text) == 0:
                # empty-document filter (extract_data_step.py:67-74)
                continue
            payload = self.model.extract(text[: self.max_input_chars],
                                         instr or "")
            if "entities" not in payload or "relations" not in payload:
                # shape check (extract_data_step.py:170-176): dead-letter
                continue
            rows.extend(payload_to_mention_rows(url, t, payload))
        cols = list(zip(*rows)) if rows else [[] for _ in MENTION_SCHEMA.names]
        arrays = [pa.array(col, type=f.type)
                  for col, f in zip(cols, MENTION_SCHEMA)]
        return pa.Table.from_arrays(arrays, schema=MENTION_SCHEMA)
