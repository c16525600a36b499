"""Extraction model protocol.

Re-expresses the reference's pluggable LLM backend surface
(``graphrag_sdk/models/model.py:75-113``: ``GenerativeModel`` /
``GenerativeModelChatSession`` / ``GenerationResponse`` / ``FinishReason``)
plus the call-side behaviors of ``ExtractDataStep``:

- prompt assembly (``extract_data_step.py:119-128``),
- the MAX_TOKENS "continue" loop joining responses with a space
  (``extract_data_step.py:133-156``),
- JSON extraction + repair with a FIX_JSON retry
  (``extract_data_step.py:158-168``),
- payload shape check (``extract_data_step.py:170-176``),
- a 15-calls/60 s rate limiter with 6 quota retries × 10 s
  (``extract_data_step.py:271-290``).

The default production model in this engine is deterministic and
rule-based (``kgforge.stages.extract.RuleBasedExtractor``); the chat
protocol here exists so a real LLM backend can be plugged into the same
actor-pool stage, and so tests can exercise the full fenced-JSON /
continue-loop path with :class:`StaticReplayModel`.
"""

from __future__ import annotations

import json
import threading
import time
from collections import deque
from dataclasses import dataclass
from typing import Protocol

from .functions.json_repair import extract_json

# ---------------------------------------------------------------------------
# protocol (mirrors models/model.py)
# ---------------------------------------------------------------------------


class FinishReason:
    MAX_TOKENS = "MAX_TOKENS"
    STOP = "STOP"
    OTHER = "OTHER"


@dataclass
class GenerationResponse:
    text: str
    finish_reason: str = FinishReason.STOP


class GenerativeModelChatSession(Protocol):
    def send_message(self, message: str) -> GenerationResponse: ...


class GenerativeModel(Protocol):
    def with_system_instruction(self, instruction: str) -> "GenerativeModel": ...
    def start_chat(self, args: dict | None = None) -> GenerativeModelChatSession: ...


# ---------------------------------------------------------------------------
# prompts (functional equivalents of fixtures/prompts.py:340-364)
# ---------------------------------------------------------------------------

EXTRACT_DATA_SYSTEM = (
    "You are a knowledge graph extractor. Extract entities and relations "
    "from the text below, constrained to this ontology:\n#ONTOLOGY\n"
    'Respond with JSON: {"entities": [{"label": ..., "attributes": {...}}], '
    '"relations": [{"label": ..., "source": {"label": ..., "attributes": '
    '{...}}, "target": {"label": ..., "attributes": {...}}, '
    '"attributes": {...}}]}'
)

EXTRACT_DATA_PROMPT = "Extract entities and relations from:\n{text}\n{instructions}"

FIX_JSON_PROMPT = "The following JSON is invalid ({error}). Fix it:\n{json}"


# ---------------------------------------------------------------------------
# rate limiter (extract_data_step.py:271-290 semantics, per-actor)
# ---------------------------------------------------------------------------


class RateLimiter:
    """Sliding-window limiter: at most ``calls`` within ``period`` seconds,
    sleeping until a slot frees (like ``ratelimit.sleep_and_retry``)."""

    def __init__(self, calls: int = 15, period: float = 60.0):
        self.calls = calls
        self.period = period
        self._times: deque[float] = deque()
        self._lock = threading.Lock()

    def acquire(self) -> None:
        while True:
            with self._lock:
                now = time.monotonic()
                while self._times and now - self._times[0] >= self.period:
                    self._times.popleft()
                if len(self._times) < self.calls:
                    self._times.append(now)
                    return
                wait = self.period - (now - self._times[0])
            time.sleep(max(wait, 0.01))


def call_model(session: GenerativeModelChatSession, prompt: str,
               limiter: RateLimiter | None = None, retry: int = 6,
               quota_sleep: float = 10.0) -> GenerationResponse:
    """Rate-limited model call with quota retries
    (reference ``extract_data_step.py:271-290``)."""
    if limiter is not None:
        limiter.acquire()
    try:
        return session.send_message(prompt)
    except Exception as e:  # noqa: BLE001
        if "Quota exceeded" in str(e) and retry > 0:
            time.sleep(quota_sleep)
            return call_model(session, prompt, limiter, retry - 1, quota_sleep)
        raise


def chat_extract_payload(model: GenerativeModel, text: str,
                         source_instructions: str = "",
                         instructions: str = "",
                         limiter: RateLimiter | None = None) -> dict:
    """Full reference extraction call path for one document
    (``extract_data_step.py:119-176``): prompt → continue-loop →
    extract_json → FIX_JSON retry → shape check."""
    session = model.start_chat({"response_validation": False})
    user_message = EXTRACT_DATA_PROMPT.format(
        text=text,
        instructions="\n".join([source_instructions or "", instructions or ""]))
    responses = [call_model(session, user_message, limiter)]
    while responses[-1].finish_reason == FinishReason.MAX_TOKENS:
        responses.append(call_model(session, "continue", limiter))
    if responses[-1].finish_reason != FinishReason.STOP:
        raise RuntimeError(
            f"Model stopped unexpectedly: {responses[-1].finish_reason}")
    combined = " ".join(r.text for r in responses)
    try:
        data = json.loads(extract_json(combined))
    except Exception as e:  # noqa: BLE001
        fix = call_model(model.start_chat({"response_validation": False}),
                         FIX_JSON_PROMPT.format(json=combined, error=str(e)),
                         limiter)
        data = json.loads(extract_json(fix.text))
    if "entities" not in data or "relations" not in data:
        raise ValueError(
            "Invalid data format. Missing 'entities' or 'relations' in JSON.")
    return data


# ---------------------------------------------------------------------------
# deterministic test backend
# ---------------------------------------------------------------------------


class _ReplaySession:
    def __init__(self, responses_by_prompt):
        self._responses = responses_by_prompt
        self._queues: dict[str, int] = {}

    def send_message(self, message: str) -> GenerationResponse:
        for needle, replies in self._responses:
            if needle in message:
                idx = self._queues.get(needle, 0)
                self._queues[needle] = min(idx + 1, len(replies) - 1)
                return replies[min(idx, len(replies) - 1)]
        return GenerationResponse('{"entities": [], "relations": []}')


class StaticReplayModel:
    """GenerativeModel implementation replaying canned responses; supports
    multi-part MAX_TOKENS continuations and fenced JSON, for exercising the
    chat path deterministically in tests."""

    def __init__(self, responses_by_prompt: list[tuple[str, list[GenerationResponse]]]):
        self._responses = responses_by_prompt
        self.system_instruction = ""

    def with_system_instruction(self, instruction: str) -> "StaticReplayModel":
        self.system_instruction = instruction
        return self

    def start_chat(self, args: dict | None = None) -> _ReplaySession:
        return _ReplaySession(self._responses)

    # JSON codec in the reference's per-backend shape
    # (models/model.py:105-113 from_json/to_json dispatch)
    def to_json(self) -> dict:
        return {"kind": "StaticReplayModel",
                "responses": [
                    [needle, [{"text": r.text,
                               "finish_reason": r.finish_reason}
                              for r in replies]]
                    for needle, replies in self._responses]}

    @staticmethod
    def from_json(data: dict) -> "StaticReplayModel":
        return StaticReplayModel([
            (needle, [GenerationResponse(r["text"], r["finish_reason"])
                      for r in replies])
            for needle, replies in data["responses"]])
