"""Orchestrator tests: plan JSON round-trip, parallel fan-out, decision
loop (continue / end / update_step), forced summary, KG agent adapter.

Reference semantics: ``orchestrator/orchestrator.py:18-67``,
``orchestrator_runner.py:40-178``, ``steps/parallel.py:100-110``.
Everything runs deterministically under StaticReplayModel.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kgforge.models import (FinishReason, GenerationResponse,  # noqa: E402
                            StaticReplayModel)
from kgforge.orchestrator import (ExecutionPlan, KGAgent,  # noqa: E402
                                  Orchestrator, PlanStep)


def _resp(payload) -> GenerationResponse:
    text = payload if isinstance(payload, str) else json.dumps(payload)
    return GenerationResponse(f"```json{text}```", FinishReason.STOP)


PLAN = [
    {"id": "fan", "block": "parallel", "properties": {"steps": [
        {"id": "cities", "block": "agent",
         "properties": {"agent_id": "cities",
                        "payload": {"question": "Largest city?"}}},
        {"id": "food", "block": "agent",
         "properties": {"agent_id": "restaurants",
                        "payload": {"question": "Best restaurant?"}}},
    ]}},
    {"id": "sum", "block": "summary", "properties": {}},
]


def _agents():
    return [
        KGAgent("cities", "city facts", lambda q: f"cities says: {q}"),
        KGAgent("restaurants", "food facts", lambda q: f"food says: {q}"),
    ]


def test_plan_json_round_trip():
    plan = ExecutionPlan.from_json(PLAN)
    assert [s.block for s in plan.steps] == ["parallel", "summary"]
    again = ExecutionPlan.from_json(plan.to_json())
    assert again.to_json() == plan.to_json()


def test_orchestrator_end_to_end_with_parallel_and_summary():
    model = StaticReplayModel([
        ("execution plan", [_resp(PLAN)]),
        ("run log so far", [_resp({"code": "continue"}),
                            _resp({"code": "end"})]),
        ("Summarize the run log",
         [GenerationResponse("Both agents answered.", FinishReason.STOP)]),
    ])
    orch = Orchestrator(model, backstory="test run")
    for agent in _agents():
        orch.register_agent(agent)
    result = orch.ask("Tell me about city food.")
    assert result.output == "Both agents answered."
    runner = orch.runner("Tell me about city food.")
    # plan step 1 is the parallel fan-out over both agents
    fan = runner.plan.steps[0]
    assert fan.block == "parallel"
    assert len(fan.properties["steps"]) == 2


def test_parallel_step_runs_all_agents():
    model = StaticReplayModel([
        ("execution plan", [_resp(PLAN)]),
        ("run log so far", [_resp({"code": "end"})]),
        ("Summarize the run log",
         [GenerationResponse("done", FinishReason.STOP)]),
    ])
    orch = Orchestrator(model)
    for agent in _agents():
        orch.register_agent(agent)
    runner = orch.runner("q")
    result = runner.run()
    assert result.output == "done"
    fan_result = runner.runner_log[0][1]
    assert "cities says: Largest city?" in fan_result.output
    assert "food says: Best restaurant?" in fan_result.output


def test_update_step_decision_and_forced_summary():
    new_step = {"id": "extra", "block": "agent",
                "properties": {"agent_id": "cities",
                               "payload": {"question": "Population?"}}}
    model = StaticReplayModel([
        ("execution plan", [_resp([PLAN[0]])]),   # plan with NO summary
        ("run log so far", [_resp({"code": "update_step",
                                   "new_step": new_step}),
                            _resp({"code": "end"}),
                            _resp({"code": "end"})]),
        ("Summarize the run log",
         [GenerationResponse("forced summary", FinishReason.STOP)]),
    ])
    orch = Orchestrator(model)
    for agent in _agents():
        orch.register_agent(agent)
    runner = orch.runner("q")
    result = runner.run()
    # END after a non-summary step forces a summary (runner.py:119-133)
    assert result.output == "forced summary"
    blocks = [s.block for s, _ in runner.runner_log]
    assert blocks == ["parallel", "agent", "summary"]
    assert runner.runner_log[1][1].output == "cities says: Population?"


def test_empty_plan():
    model = StaticReplayModel([("execution plan", [_resp([])])])
    orch = Orchestrator(model)
    assert orch.ask("anything").output == "No steps to run"


def test_user_input_step():
    plan = [{"id": "u", "block": "user_input",
             "properties": {"question": "Which year?"}},
            {"id": "s", "block": "summary", "properties": {}}]
    model = StaticReplayModel([
        ("execution plan", [_resp(plan)]),
        ("run log so far", [_resp({"code": "continue"}),
                            _resp({"code": "end"})]),
        ("Summarize the run log",
         [GenerationResponse("year noted", FinishReason.STOP)]),
    ])
    orch = Orchestrator(model)
    runner = orch.runner("q", user_input=lambda q: "1999")
    result = runner.run()
    assert runner.runner_log[0][1].output == "1999"
    assert result.output == "year noted"


def test_malformed_decisions_fall_back_to_end():
    """Junk decision JSON (unknown code, update_step without/with a
    malformed new_step) must terminate gracefully via the forced
    summary, not crash the run."""
    for bad in ({"nonsense": 1},
                {"code": "update_step"},
                {"code": "update_step", "new_step": {"bogus": 1}}):
        model = StaticReplayModel([
            ("execution plan", [_resp([PLAN[0]])]),
            ("run log so far", [_resp(bad), _resp({"code": "end"})]),
            ("Summarize the run log",
             [GenerationResponse("ended safely", FinishReason.STOP)]),
        ])
        orch = Orchestrator(model)
        for agent in _agents():
            orch.register_agent(agent)
        assert orch.ask("q").output == "ended safely"


def test_unknown_agent_raises():
    plan = [{"id": "a", "block": "agent",
             "properties": {"agent_id": "nope", "payload": {}}}]
    model = StaticReplayModel([("execution plan", [_resp(plan)])])
    orch = Orchestrator(model)
    import pytest
    with pytest.raises(ValueError, match="not found"):
        orch.ask("q")
