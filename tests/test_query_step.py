"""Query-path tests: the Cypher-gen retry state machine end-to-end
against GraphStore.query, plus KnowledgeGraphModelConfig round-trip.

Reference semantics: ``steps/graph_query_step.py:40-82`` (5-retry loop
re-prompting with the error), ``chat_session.py:56-83`` (sorry-string
fallback), ``model_config.py:1-81`` (per-step routing + JSON shape).
"""

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kgforge.graphstore import GraphStore  # noqa: E402
from kgforge.models import (FinishReason, GenerationResponse,  # noqa: E402
                            StaticReplayModel)
from kgforge.ontology import Ontology  # noqa: E402
from kgforge.querypath import (NO_ANSWER, ChatSession,  # noqa: E402
                               GraphQueryStep, KnowledgeGraphModelConfig,
                               graphstore_sql_executor)

ONTOLOGY = Ontology.from_json({
    "entities": [
        {"label": "Person", "attributes": [
            {"name": "name", "type": "string", "unique": True,
             "required": True}]},
        {"label": "Movie", "attributes": [
            {"name": "title", "type": "string", "unique": True,
             "required": True}]},
    ],
    "relations": [
        {"label": "ACTED_IN", "source": {"label": "Person"},
         "target": {"label": "Movie"}, "attributes": []},
    ],
})

VALID_CYPHER = "MATCH (p:Person)-[a:ACTED_IN]->(m:Movie) RETURN p, m"
INVALID_CYPHER = "MATCH (d:Director)-[x:FILMED]->(m:Movie) RETURN d"


@pytest.fixture()
def store(tmp_path):
    out = tmp_path / "graph"
    (out / "nodes").mkdir(parents=True)
    (out / "edges").mkdir(parents=True)
    s = GraphStore(str(out), ONTOLOGY)
    s.add_node("Person", {"name": "Joseph Scotto"})
    s.add_node("Movie", {"title": "Madoff"})
    s.add_edge("ACTED_IN", "Person", {"name": "Joseph Scotto"},
               "Movie", {"title": "Madoff"})
    s.flush()
    return s


def _executor(store):
    # pluggable Cypher -> SQL translation: the state machine under test
    # only needs a deterministic mapping for the valid statement
    return graphstore_sql_executor(store, lambda cypher: (
        "SELECT n.label, n.name, n.title FROM nodes n ORDER BY n.label"))


def test_retry_loop_recovers_from_invalid_cypher(store):
    model = StaticReplayModel([
        ("failed with this error",
         [GenerationResponse(f"```{VALID_CYPHER}```", FinishReason.STOP)]),
        ("Question:",
         [GenerationResponse(f"```{INVALID_CYPHER}```", FinishReason.STOP)]),
    ])
    step = GraphQueryStep(ONTOLOGY, model.start_chat(), _executor(store),
                          stringify=GraphStore.stringify_result)
    context, cypher = step.run("Who acted in Madoff?", retries=5)
    assert cypher == VALID_CYPHER
    assert "Joseph Scotto" in context and "Madoff" in context


def test_retry_exhaustion_raises(store):
    model = StaticReplayModel([
        ("Question:",
         [GenerationResponse(f"```{INVALID_CYPHER}```", FinishReason.STOP)]),
    ])
    step = GraphQueryStep(ONTOLOGY, model.start_chat(), _executor(store))
    with pytest.raises(RuntimeError, match="Failed to generate"):
        step.run("Who acted in Madoff?", retries=3)


def test_empty_cypher_short_circuits(store):
    model = StaticReplayModel([
        ("Question:", [GenerationResponse("``````", FinishReason.STOP)]),
    ])
    step = GraphQueryStep(ONTOLOGY, model.start_chat(), _executor(store))
    assert step.run("Unanswerable?", retries=5) == (None, None)


def test_chat_session_end_to_end(store):
    cypher_model = StaticReplayModel([
        ("Question:",
         [GenerationResponse(f"```{VALID_CYPHER}```", FinishReason.STOP)]),
    ])
    qa_model = StaticReplayModel([
        ("Answer:",
         [GenerationResponse("Joseph Scotto acted in Madoff.",
                             FinishReason.STOP)]),
    ])
    config = KnowledgeGraphModelConfig(extract_data=cypher_model,
                                       cypher_generation=cypher_model,
                                       qa=qa_model)
    session = ChatSession(config, ONTOLOGY, _executor(store),
                          stringify=GraphStore.stringify_result)
    assert "#ONTOLOGY" not in cypher_model.system_instruction
    assert "Person" in cypher_model.system_instruction  # ontology seeded
    answer = session.send_message("Who acted in Madoff?")
    assert answer == "Joseph Scotto acted in Madoff."


def test_chat_session_no_answer_fallback(store):
    declining = StaticReplayModel([
        ("Question:", [GenerationResponse("``````", FinishReason.STOP)]),
    ])
    config = KnowledgeGraphModelConfig.with_model(declining)
    session = ChatSession(config, ONTOLOGY, _executor(store))
    assert session.send_message("Unanswerable?") == NO_ANSWER


def test_model_config_json_round_trip():
    model = StaticReplayModel([
        ("hello", [GenerationResponse("world", FinishReason.STOP)]),
    ])
    config = KnowledgeGraphModelConfig.with_model(model)
    data = config.to_json()
    # reference JSON shape: one entry per routed step (model_config.py:73-81)
    assert set(data) == {"extract_data", "cypher_generation", "qa"}
    restored = KnowledgeGraphModelConfig.from_json(
        json.loads(json.dumps(data)))
    reply = restored.qa.start_chat().send_message("hello there")
    assert reply.text == "world"


# -- live backend adapters (import-gated; SDKs absent in this sandbox) ------


def test_backend_registry_round_trip():
    from kgforge.querypath import model_from_json, model_to_json
    from kgforge.models_backends import (GeminiGenerativeModel,
                                         GenerativeModelConfig,
                                         OllamaGenerativeModel,
                                         OpenAiGenerativeModel)
    models = [
        OpenAiGenerativeModel("gpt-4o", GenerativeModelConfig(
            temperature=0.1, max_output_tokens=256)),
        GeminiGenerativeModel("gemini-1.5-pro"),
        OllamaGenerativeModel("llama3", host="http://localhost:11434"),
    ]
    for m in models:
        back = model_from_json(model_to_json(m))
        assert type(back) is type(m)
        assert back.model_name == m.model_name
        assert model_to_json(back) == model_to_json(m)


def test_backend_reference_json_shapes():
    """KnowledgeGraphModelConfig.from_json must accept the reference's
    backend JSON (no 'kind' discriminator — models/openai.py:70-85
    shape), inferring the backend from the model-name convention."""
    from kgforge.querypath import KnowledgeGraphModelConfig
    from kgforge.models_backends import (GeminiGenerativeModel,
                                         OllamaGenerativeModel,
                                         OpenAiGenerativeModel)
    gc = {"temperature": 0.0, "top_p": None, "top_k": None,
          "max_output_tokens": 1024, "stop_sequences": None}
    cfg = KnowledgeGraphModelConfig.from_json({
        "extract_data": {"model_name": "gpt-4o-mini",
                         "generation_config": gc,
                         "system_instruction": "x"},
        "cypher_generation": {"model_name": "gemini-2.0-flash",
                              "generation_config": gc,
                              "system_instruction": None},
        "qa": {"model_name": "llama3.1", "generation_config": gc,
               "system_instruction": None, "host": None},
    })
    assert isinstance(cfg.extract_data, OpenAiGenerativeModel)
    assert isinstance(cfg.cypher_generation, GeminiGenerativeModel)
    assert isinstance(cfg.qa, OllamaGenerativeModel)
    assert cfg.extract_data.generation_config.max_output_tokens == 1024


def test_backend_sdk_absent_raises_cleanly():
    import pytest
    from kgforge.models_backends import (GeminiGenerativeModel,
                                         OllamaGenerativeModel,
                                         OpenAiGenerativeModel)
    for cls, pkg in [(OpenAiGenerativeModel, "openai"),
                     (GeminiGenerativeModel, "google.generativeai"),
                     (OllamaGenerativeModel, "ollama")]:
        m = cls("some-model")            # construction is config-only
        with pytest.raises(RuntimeError, match=pkg):
            m.ask("hello")
        with pytest.raises(RuntimeError, match=pkg):
            m.start_chat().send_message("hello")
