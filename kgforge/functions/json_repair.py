"""JSON extraction + repair for model responses.

Mirrors the reference's ``extract_json`` (``graphrag_sdk/helpers.py:9-19``):
strip markdown code fences with the same regex, then attempt repair.  The
reference delegates repair to the ``fix_busted_json`` package (not
installable here); we implement a pragmatic repair covering the common LLM
JSON defects: code fences, trailing commas, single-quoted strings,
unquoted ``True/False/None`` Python literals.
"""

from __future__ import annotations

import json
import re

_FENCE_RE = re.compile(r"(?:```)?(?:json)?([^`]*)(?:\\n)?(?:```)?", re.DOTALL)
_TRAILING_COMMA_RE = re.compile(r",\s*([}\]])")


def extract_json(text: str, skip_repair: bool = False) -> str:
    """Reference ``helpers.py:9-19``: concatenate non-fence spans, repair."""
    if not isinstance(text, str):
        text = str(text)
    joined = "".join(_FENCE_RE.findall(text))
    return joined if skip_repair else repair_json(joined)


def repair_json(text: str) -> str:
    """Return a parseable JSON string, or the input unchanged if repair
    fails (the reference logs and returns the raw join on failure)."""
    candidate = text.strip()
    try:
        json.loads(candidate)
        return candidate
    except Exception:
        pass
    fixed = _TRAILING_COMMA_RE.sub(r"\1", candidate)
    fixed = re.sub(r"\bTrue\b", "true", fixed)
    fixed = re.sub(r"\bFalse\b", "false", fixed)
    fixed = re.sub(r"\bNone\b", "null", fixed)
    try:
        json.loads(fixed)
        return fixed
    except Exception:
        pass
    # single-quoted keys/strings → double-quoted (best effort)
    fixed2 = re.sub(r"'([^'\\\"]*)'", r'"\1"', fixed)
    try:
        json.loads(fixed2)
        return fixed2
    except Exception:
        return text
