"""Query path: Cypher-generation retry loop, QA step, chat session, and
per-step model routing.

Model-pluggable re-expression of the reference's second-most-used API —
``kg.ask`` / ``ChatSession.send_message`` (``graphrag_sdk/kg.py:121-168``,
``chat_session.py:56-83``) and its two steps:

- :class:`GraphQueryStep` = ``steps/graph_query_step.py:40-82``: up to
  ``retries`` rounds of generate → ``extract_cypher`` →
  ``validate_cypher`` vs ontology → execute → stringify; ANY error
  (validation list or executor exception) re-prompts the SAME chat
  session with the error text; an empty generated statement short-
  circuits to ``(None, None)``; exhausted retries raise.
- :class:`QAStep` = ``steps/qa_step.py:24-33``: one QA prompt over
  (context, cypher, question).
- :class:`ChatSession` = ``chat_session.py``: seeds a cypher-gen chat
  with the system prompt + ontology JSON and a QA chat, and falls back
  to the reference's sorry-string when no statement was produced.
- :class:`KnowledgeGraphModelConfig` = ``model_config.py:1-81``:
  per-step model routing (extract_data / cypher_generation / qa) with
  the reference's JSON round-trip shape.

Execution backend: the reference runs the statement on FalkorDB; here
``executor`` is any callable ``(cypher: str) -> rows`` — tests drive it
with a stub over :class:`kgforge.graphstore.GraphStore`-shaped results,
and a SQL-translating executor can be plugged without changing the
state machine.  Prompts are functional equivalents (not copies) of
``fixtures/prompts.py:366-427``.
"""

from __future__ import annotations

import json
from typing import Callable

from .functions.cypher_check import extract_cypher, validate_cypher
from .graphstore import GraphStore
from .models import GenerativeModel, GenerativeModelChatSession
from .ontology import Ontology

CYPHER_GEN_SYSTEM = (
    "Generate an OpenCypher statement answering the user's question, "
    "using ONLY the entities, relation types and properties in this "
    "ontology. Return only the statement in triple backticks.\n"
    "Ontology:\n#ONTOLOGY\n"
)

CYPHER_GEN_PROMPT = (
    "Generate an OpenCypher statement for the question below; return an "
    "empty string if you cannot.\nQuestion: {question}\n"
)

CYPHER_GEN_PROMPT_WITH_ERROR = (
    "The previous Cypher statement failed with this error:\n\"{error}\"\n"
    "Generate a new valid OpenCypher statement, only the statement in "
    "triple backticks.\nQuestion: {question}\n"
)

GRAPH_QA_SYSTEM = (
    "Answer the user's question from the provided graph query context "
    "only; do not invent facts."
)

GRAPH_QA_PROMPT = (
    "Context: {context}\nQuery: {cypher}\nQuestion: {question}\nAnswer: "
)

NO_ANSWER = "I am sorry, I could not find the answer to your question"


class GraphQueryStep:
    """Cypher-gen retry state machine (``graph_query_step.py:40-82``)."""

    def __init__(self, ontology: Ontology,
                 chat_session: GenerativeModelChatSession,
                 executor: Callable[[str], object],
                 stringify: Callable[[object], str] | None = None):
        self.ontology = ontology
        self.chat_session = chat_session
        self.executor = executor
        self.stringify = stringify or (lambda rows: str(rows).strip())

    def run(self, question: str, retries: int = 5):
        error: object = False
        cypher = ""
        while error is not None and retries > 0:
            try:
                prompt = (CYPHER_GEN_PROMPT.format(question=question)
                          if error is False
                          else CYPHER_GEN_PROMPT_WITH_ERROR.format(
                              question=question, error=error))
                response = self.chat_session.send_message(prompt)
                cypher = extract_cypher(response.text)
                if not cypher:
                    # model declined: reference returns (None, None)
                    return (None, None)
                validation_errors = validate_cypher(cypher, self.ontology)
                if validation_errors is not None:
                    raise ValueError("\n".join(validation_errors))
                rows = self.executor(cypher)
                return (self.stringify(rows), cypher)
            except Exception as e:  # noqa: BLE001 — any error re-prompts
                error = e
                retries -= 1
        raise RuntimeError(f"Failed to generate Cypher query: {error}")


class QAStep:
    """One QA round over (question, cypher, context)
    (``qa_step.py:24-33``)."""

    def __init__(self, chat_session: GenerativeModelChatSession):
        self.chat_session = chat_session

    def run(self, question: str, cypher: str, context: str) -> str:
        return self.chat_session.send_message(GRAPH_QA_PROMPT.format(
            context=context, cypher=cypher, question=question)).text


class ChatSession:
    """Reference ``chat_session.py``: cypher-gen chat (system prompt
    seeded with the ontology JSON) + QA chat over one graph."""

    def __init__(self, model_config: "KnowledgeGraphModelConfig",
                 ontology: Ontology, executor: Callable[[str], object],
                 stringify: Callable[[object], str] | None = None):
        self.ontology = ontology
        self.executor = executor
        self.stringify = stringify
        self.cypher_chat_session = (
            model_config.cypher_generation.with_system_instruction(
                CYPHER_GEN_SYSTEM.replace(
                    "#ONTOLOGY", json.dumps(ontology.to_json()))
            ).start_chat())
        self.qa_chat_session = (model_config.qa.with_system_instruction(
            GRAPH_QA_SYSTEM).start_chat())

    def send_message(self, message: str) -> str:
        context, cypher = GraphQueryStep(
            self.ontology, self.cypher_chat_session, self.executor,
            self.stringify).run(message)
        if not cypher:
            return NO_ANSWER
        return QAStep(self.qa_chat_session).run(message, cypher, context)


def graphstore_sql_executor(store: GraphStore,
                            translate: Callable[[str], str]):
    """Executor adapter: generated Cypher → (pluggable) SQL translation
    → DuckDB over the materialized node/edge tables."""

    def execute(cypher: str):
        return store.query(translate(cypher))

    return execute


class KnowledgeGraphModelConfig:
    """Per-step model routing (reference ``model_config.py:1-81``)."""

    def __init__(self, extract_data: GenerativeModel,
                 cypher_generation: GenerativeModel, qa: GenerativeModel):
        self.extract_data = extract_data
        self.cypher_generation = cypher_generation
        self.qa = qa

    @staticmethod
    def with_model(model: GenerativeModel) -> "KnowledgeGraphModelConfig":
        return KnowledgeGraphModelConfig(extract_data=model,
                                         cypher_generation=model, qa=model)

    @staticmethod
    def from_json(data: dict) -> "KnowledgeGraphModelConfig":
        return KnowledgeGraphModelConfig(
            model_from_json(data["extract_data"]),
            model_from_json(data["cypher_generation"]),
            model_from_json(data["qa"]))

    def to_json(self) -> dict:
        return {"extract_data": model_to_json(self.extract_data),
                "cypher_generation": model_to_json(self.cypher_generation),
                "qa": model_to_json(self.qa)}


# -- model JSON codec --------------------------------------------------------
# The reference serializes each backend as {"model_name": ..., plus
# backend config} and dispatches on the implementing class.  This engine
# has no live LLM SDKs, so the registry starts with the deterministic
# backends; a real client class registers itself the same way.

_MODEL_REGISTRY: dict[str, Callable[[dict], GenerativeModel]] = {}


def _register_builtin_models() -> None:
    from .models import StaticReplayModel
    from .models_backends import (GeminiGenerativeModel,
                                  OllamaGenerativeModel,
                                  OpenAiGenerativeModel)
    _MODEL_REGISTRY.setdefault("StaticReplayModel",
                               StaticReplayModel.from_json)
    _MODEL_REGISTRY.setdefault("OpenAiGenerativeModel",
                               OpenAiGenerativeModel.from_json)
    _MODEL_REGISTRY.setdefault("GeminiGenerativeModel",
                               GeminiGenerativeModel.from_json)
    _MODEL_REGISTRY.setdefault("OllamaGenerativeModel",
                               OllamaGenerativeModel.from_json)


def register_model(kind: str,
                   factory: Callable[[dict], GenerativeModel]) -> None:
    _MODEL_REGISTRY[kind] = factory


def model_to_json(model: GenerativeModel) -> dict:
    if hasattr(model, "to_json"):
        return model.to_json()
    return {"kind": type(model).__name__}


def model_from_json(data: dict) -> GenerativeModel:
    _register_builtin_models()
    kind = data.get("kind")
    if kind is None:
        # reference backend JSON ({model_name, generation_config,
        # system_instruction}) carries no discriminator — infer the
        # backend from the model-name convention
        from .models_backends import infer_backend_kind
        kind = infer_backend_kind(data)
    factory = _MODEL_REGISTRY.get(kind)
    if factory is None:
        raise ValueError(f"unknown model kind {kind!r}; "
                         f"registered: {sorted(_MODEL_REGISTRY)}")
    return factory(data)
