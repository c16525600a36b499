"""Identity semantics for canonicalization.

The reference dedupes by FalkorDB ``MERGE``:

- Node identity = ``MERGE (n:label {unique attrs}) SET n += {rest}``
  (``graphrag_sdk/steps/extract_data_step.py:195-225``).  The property map
  is rendered by ``map_dict_to_cypher_properties``
  (``graphrag_sdk/helpers.py:22-49``) over the entity's *unique* attributes
  in ontology schema order, with missing values defaulting to ``""``
  (``extract_data_step.py:201-207``).
- Edge identity = (label, source node, target node)
  (``extract_data_step.py:227-269``); endpoint nodes are looked up by their
  unique attributes, and a missing endpoint silently drops the edge.

We therefore key nodes by the *rendered Cypher property text* — the exact
string the reference's MERGE would match on — so two payload values are the
same node for us iff they are the same node for the reference (including
quirks like ``None → ""`` and number-vs-string distinctness).
"""

from __future__ import annotations

import hashlib
import re
from typing import Any

from .ontology import Entity

_UNESCAPED_QUOTE = re.compile(r"((?<!\\)(\"))|((?<!\\)(\'))")

# unit separator / record separator — cannot appear in rendered literals' role
KEY_SEP = "\x1f"
# edge keys join (label, src node_key, dst node_key); node keys already
# contain KEY_SEP, so edge components use the next separator up.
# Attribute VALUES can contain any byte (real web text), so node keys are
# escaped bijectively before composing an edge key — the composed key
# then splits unambiguously on EDGE_SEP.
EDGE_SEP = "\x1e"


def escape_component(s: str) -> str:
    """Bijective escaping that removes EDGE_SEP from a key component."""
    return s.replace("\x00", "\x00\x01").replace(EDGE_SEP, "\x00\x02")


def unescape_component(s: str) -> str:
    return s.replace("\x00\x02", EDGE_SEP).replace("\x00\x01", "\x00")


def compose_edge_key(label: str, src_key: str, dst_key: str) -> str:
    return (label + EDGE_SEP + escape_component(src_key)
            + EDGE_SEP + escape_component(dst_key))


def split_edge_key(edge_key: str) -> tuple[str, str, str]:
    label, skey, dkey = edge_key.split(EDGE_SEP)
    return label, unescape_component(skey), unescape_component(dkey)


def compose_edge_key_column(labels, src_keys, dst_keys):
    """Vectorized :func:`compose_edge_key` over arrow string columns —
    the flagship edge path runs this per batch (the per-row Python
    zip-loop it replaces was a top-5 hot spot in VERDICT r3); parity
    with the scalar fn is pinned in tests/test_properties.py."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def esc(col):
        col = pc.replace_substring(col, "\x00", "\x00\x01")
        return pc.replace_substring(col, EDGE_SEP, "\x00\x02")

    return pc.binary_join_element_wise(
        pc.cast(labels, pa.string()), esc(src_keys), esc(dst_keys),
        EDGE_SEP)


def cypher_literal(value: Any) -> str:
    """Render one property value exactly like the reference's
    ``map_dict_to_cypher_properties`` (``helpers.py:31-47``):

    - strings: backslash-escape unescaped single/double quotes, wrap in
      double quotes; the literal string ``"None"`` renders as ``""``.
    - everything else: ``str(value)``; ``None`` renders as ``""``.
    """
    if isinstance(value, str):
        if '"' not in value and "'" not in value:
            # fast path: nothing to escape (the overwhelmingly common case)
            return '""' if value == "None" else f'"{value}"'
        out = []
        prev = ""
        for ch in value:
            if ch in "\"'" and prev != "\\":
                out.append("\\")
            out.append(ch)
            prev = ch
        escaped = "".join(out)
        return '""' if escaped == "None" else f'"{escaped}"'
    s = str(value)
    return '""' if s == "None" else s


def render_properties(d: dict) -> str:
    """Reference ``map_dict_to_cypher_properties`` (``helpers.py:22-49``):
    ``{k: literal, ...}`` in dict insertion order."""
    if isinstance(d, list):  # quirk branch helpers.py:24-30
        if not d:
            return "{}"
        inner = ", ".join(f"{i}: {item}" for i, item in enumerate(d))
        return "{" + inner + "}"
    inner = ", ".join(f"{k}: {cypher_literal(v)}" for k, v in d.items())
    return "{" + inner + "}"


def unique_attr_dict(entity: Entity, payload_attrs: dict) -> dict:
    """Unique attributes in schema order with ``""`` defaults
    (reference ``extract_data_step.py:201-207``)."""
    return {a.name: payload_attrs.get(a.name, "")
            for a in entity.attributes if a.unique}


def non_unique_attr_dict(entity: Entity, payload_attrs: dict) -> dict:
    """Present non-unique attributes in schema order
    (reference ``extract_data_step.py:209-213``) — unknown payload
    attributes are silently dropped."""
    return {a.name: payload_attrs[a.name]
            for a in entity.attributes
            if not a.unique and a.name in payload_attrs}


def node_key(label: str, entity: Entity, payload_attrs: dict) -> str:
    """Canonical node identity string: label + rendered unique-attr
    property map (what the reference's ``MERGE`` matches on,
    ``extract_data_step.py:222``)."""
    return label + KEY_SEP + render_properties(unique_attr_dict(entity, payload_attrs))


def hash64(text: str) -> int:
    """Deterministic 64-bit id from a key string (blake2b-8)."""
    return int.from_bytes(hashlib.blake2b(text.encode("utf-8"),
                                          digest_size=8).digest(), "big")


def edge_id(label: str, src_id: int, dst_id: int) -> int:
    return hash64(f"{label}{KEY_SEP}{src_id}{KEY_SEP}{dst_id}")


def coerce_value(value: Any, attr_type: str):
    """Coerce a payload value to the typed output column.

    The reference performs no type validation on the LLM payload at upsert
    time (only the manual ``add_node`` API validates, ``kg.py:271-296``);
    FalkorDB stores whatever arrives.  Our sink is typed Arrow, so we
    coerce: failures become NULL (documented deviation).
    """
    if value is None:
        return None
    if attr_type == "string":
        return value if isinstance(value, str) else str(value)
    if attr_type == "number":
        if isinstance(value, bool):
            return float(value)
        try:
            return float(value)
        except (TypeError, ValueError):
            return None
    if attr_type == "boolean":
        if isinstance(value, bool):
            return value
        if isinstance(value, str):
            low = value.strip().lower()
            if low in ("true", "1", "yes"):
                return True
            if low in ("false", "0", "no"):
                return False
            return None
        if isinstance(value, (int, float)):
            return bool(value)
        return None
    raise ValueError(f"unknown attribute type {attr_type}")
