"""Multi-agent orchestrator (query-time), model-pluggable.

Independent re-implementation of the reference's orchestration surface —
``orchestrator/orchestrator.py:18-67``, ``orchestrator_runner.py:40-178``,
``orchestrator/step.py``, ``steps/{agent,parallel,summary,user_input}.py``,
``orchestrator_decision.py``, ``agents/agent.py`` / ``kg_agent.py`` —
completing the API map that round 1 declared out of construction scope.

Same structure and JSON shapes as the reference:

- An :class:`ExecutionPlan` is a list of :class:`PlanStep` blocks
  (``agent`` / ``parallel`` / ``summary`` / ``user_input``), round-
  trippable through the reference's plan JSON.
- :class:`Orchestrator` asks its model for a plan, then hands it to an
  :class:`OrchestratorRunner`, which runs step 1 and enters the decision
  loop: after every step the model is asked CONTINUE / END / UPDATE_STEP
  over the run log (``orchestrator_runner.py:106-117``); END without a
  trailing summary step forces one (``:119-133``).
- ``parallel`` fans its sub-steps over a thread pool of
  ``parallel_max_workers`` (16, ``steps/parallel.py:100-110``) — the
  agents are I/O-bound query calls, same as the reference.
- :class:`KGAgent` adapts a :class:`kgforge.graphstore.GraphStore` (via
  ``ask``) as an agent; any object with ``agent_id`` and
  ``run(payload, session)`` participates.

All model calls go through the ``GenerativeModel`` protocol, so the
whole loop runs deterministically under ``StaticReplayModel`` in tests;
no live LLM is required.  Prompts are functional equivalents, not
copies.
"""

from __future__ import annotations

import json
from concurrent.futures import ThreadPoolExecutor, wait
from typing import Any, Callable

from .functions.json_repair import extract_json
from .models import GenerativeModel, GenerativeModelChatSession

ORCHESTRATOR_SYSTEM = (
    "You orchestrate specialized agents to answer the user.\n"
    "Backstory: #BACKSTORY\nAgents: #AGENTS\n"
    "Respond only with the JSON asked for."
)

EXECUTION_PLAN_PROMPT = (
    "Produce a JSON execution plan (a list of steps, each "
    '{"id": ..., "block": "agent|parallel|summary|user_input", '
    '"properties": {...}}) answering: #QUESTION'
)

DECISION_PROMPT = (
    "Given the run log so far:\n#LOG_HISTORY\nand the proposed next "
    "step:\n#NEXT_STEP\nrespond with JSON "
    '{"code": "continue|end|update_step", "new_step": {...}?}'
)

SUMMARY_PROMPT = (
    "Summarize the run log below into a final answer for the user "
    "question.\nQuestion: #QUESTION\nLog: #LOG"
)


class StepBlockType:
    PARALLEL = "parallel"
    AGENT = "agent"
    SUMMARY = "summary"
    USER_INPUT = "user_input"

    _ALL = (PARALLEL, AGENT, SUMMARY, USER_INPUT)

    @staticmethod
    def from_str(text: str) -> str:
        if text not in StepBlockType._ALL:
            raise ValueError(f"Unknown step block type: {text}")
        return text


class StepResult:
    """Uniform step result: ``output`` string + JSON payload."""

    def __init__(self, output: str, payload: dict | None = None):
        self._output = output
        self.payload = payload or {}

    @property
    def output(self) -> str:
        return self._output

    def to_json(self) -> dict:
        return {"output": self._output, "payload": self.payload}

    def __repr__(self) -> str:
        return f"StepResult(output={self._output!r})"


class PlanStep:
    """One plan block.  Reference JSON shape:
    ``{"id": ..., "block": ..., "properties": {...}}``."""

    def __init__(self, step_id: str, block: str, properties: dict):
        self.id = step_id
        self.block = StepBlockType.from_str(block)
        self.properties = properties

    @staticmethod
    def from_json(data: dict | str) -> "PlanStep":
        data = data if isinstance(data, dict) else json.loads(data)
        return PlanStep(data["id"], data["block"],
                        data.get("properties", {}) or {})

    def to_json(self) -> dict:
        return {"id": self.id, "block": self.block,
                "properties": self.properties}

    def __repr__(self) -> str:
        return (f"PlanStep(id={self.id!r}, block={self.block!r}, "
                f"properties={self.properties!r})")

    # -- execution ---------------------------------------------------------
    def run(self, runner: "OrchestratorRunner",
            config: dict | None = None) -> StepResult:
        config = config or {}
        if self.block == StepBlockType.AGENT:
            agent = runner.get_agent(self.properties["agent_id"])
            session = runner.get_session(self.properties.get("session_id"))
            response, session = agent.run(
                self.properties.get("payload") or {}, session)
            if self.properties.get("session_id"):
                runner.set_session(self.properties["session_id"], session)
            return StepResult(str(response), {"agent_id": agent.agent_id})
        if self.block == StepBlockType.PARALLEL:
            sub = [PlanStep.from_json(s)
                   for s in self.properties.get("steps", [])]
            workers = config.get("parallel_max_workers", 16)
            with ThreadPoolExecutor(max_workers=workers) as pool:
                futures = [pool.submit(s.run, runner, config) for s in sub]
                wait(futures)
            results = [f.result() for f in futures]
            return StepResult("\n".join(r.output for r in results),
                              {"results": [r.to_json() for r in results]})
        if self.block == StepBlockType.SUMMARY:
            text = runner.chat.send_message(
                SUMMARY_PROMPT
                .replace("#QUESTION", runner.user_question)
                .replace("#LOG", runner.log_text())).text
            return StepResult(text)
        if self.block == StepBlockType.USER_INPUT:
            answer = runner.get_user_input(
                self.properties.get("question", ""))
            return StepResult(answer)
        raise ValueError(f"unrunnable block {self.block}")


class ExecutionPlan:
    def __init__(self, steps: list[PlanStep]):
        self.steps = steps

    @staticmethod
    def from_json(data: str | dict | list) -> "ExecutionPlan":
        if isinstance(data, str):
            data = json.loads(data)
        if isinstance(data, dict):
            data = data.get("steps", [])
        return ExecutionPlan([PlanStep.from_json(s) for s in data])

    def to_json(self) -> dict:
        return {"steps": [s.to_json() for s in self.steps]}


class OrchestratorDecisionCode:
    END = "end"
    CONTINUE = "continue"
    UPDATE_STEP = "update_step"


class OrchestratorDecision:
    def __init__(self, code: str, new_step: PlanStep | None = None):
        self.code = code
        self.new_step = new_step

    @staticmethod
    def from_json(data: dict | str) -> "OrchestratorDecision":
        if isinstance(data, str):
            data = json.loads(data)
        code = data.get("code")
        if code not in (OrchestratorDecisionCode.END,
                        OrchestratorDecisionCode.CONTINUE,
                        OrchestratorDecisionCode.UPDATE_STEP):
            # model emitted junk: the safe terminal state is END (the
            # runner then summarizes whatever ran) rather than crashing
            # the whole orchestration on a malformed decision
            return OrchestratorDecision(OrchestratorDecisionCode.END)
        try:
            new_step = (PlanStep.from_json(data["new_step"])
                        if data.get("new_step") else None)
        except (KeyError, ValueError, TypeError):
            # malformed replacement step: same safe-END fallback
            return OrchestratorDecision(OrchestratorDecisionCode.END)
        return OrchestratorDecision(code, new_step)


class KGAgent:
    """Agent over a materialized knowledge graph (reference
    ``agents/kg_agent.py``: wraps ``kg.ask``).  ``ask`` is any callable
    ``(question) -> answer`` — e.g. a closure over
    :meth:`kgforge.graphstore.GraphStore.ask` with its model config."""

    def __init__(self, agent_id: str, introduction: str,
                 ask: Callable[[str], str]):
        self.agent_id = agent_id
        self.introduction = introduction
        self._ask = ask

    def run(self, payload: dict, session: Any = None):
        question = payload.get("question", "") if payload else ""
        return self._ask(question), session

    def __str__(self) -> str:
        return (f"Agent(id={self.agent_id!r}, "
                f"introduction={self.introduction!r})")


class OrchestratorRunner:
    """Executes a plan under the model's step-by-step decisions
    (reference ``orchestrator_runner.py:40-178``)."""

    def __init__(self, chat: GenerativeModelChatSession, agents: list,
                 plan: ExecutionPlan, user_question: str = "",
                 config: dict | None = None,
                 user_input: Callable[[str], str] | None = None,
                 max_decisions: int = 32):
        self.chat = chat
        self._agents = agents
        self.plan = plan
        self.user_question = user_question
        self._config = config or {"parallel_max_workers": 16}
        self._sessions: dict[str, Any] = {}
        self.runner_log: list[tuple[PlanStep, StepResult]] = []
        self._user_input = user_input or (lambda q: input(q))
        # hard cap on model decisions per run: a live model that keeps
        # answering update_step (or never ENDs after the forced summary)
        # would otherwise loop forever
        self._max_decisions = max_decisions

    def get_agent(self, agent_id: str):
        for agent in self._agents:
            if agent.agent_id == agent_id:
                return agent
        raise ValueError(f"Agent with id {agent_id} not found")

    def get_session(self, session_id: str | None):
        return self._sessions.get(session_id) if session_id else None

    def set_session(self, session_id: str, session: Any) -> None:
        self._sessions[session_id] = session

    def get_user_input(self, question: str) -> str:
        return self._user_input(question)

    def log_text(self) -> str:
        return str([(s.to_json(), r.to_json()) for s, r in self.runner_log])

    def run(self) -> StepResult:
        if not self.plan.steps:
            return StepResult("No steps to run")
        first = self.plan.steps[0]
        self.runner_log.append((first, first.run(self, self._config)))
        return self._run_loop(self.plan.steps[1:])

    def _run_loop(self, steps: list[PlanStep]) -> StepResult:
        # iterative (not recursive) with a decision cap: the loop shape
        # is decide → act → decide …; an adversarial/looping model ends
        # at the cap with the forced summary instead of recursing forever
        steps = list(steps)
        for _ in range(self._max_decisions):
            decision = self._decide(steps[0] if steps else None)
            if decision.code == OrchestratorDecisionCode.CONTINUE and steps:
                nxt = steps.pop(0)
                self.runner_log.append((nxt, nxt.run(self, self._config)))
                continue
            if decision.code == OrchestratorDecisionCode.UPDATE_STEP \
                    and decision.new_step is not None:
                step = decision.new_step
                self.runner_log.append((step, step.run(self, self._config)))
                steps = []
                continue
            if decision.code not in (OrchestratorDecisionCode.END,
                                     OrchestratorDecisionCode.CONTINUE,
                                     OrchestratorDecisionCode.UPDATE_STEP):
                raise ValueError(f"unknown decision code {decision.code}")
            # END (or CONTINUE past the last step / update without a
            # step, both treated as END)
            done = self._handle_end()
            if done is not None:
                return done
            steps = []          # summary was forced — ask once more
        return self._forced_summary()

    def _handle_end(self) -> StepResult | None:
        """Finish if the log already ends in a summary; otherwise force
        one (reference runner.py:119-133) and return ``None`` so the
        decision loop runs again."""
        if not self.runner_log:
            return StepResult("No steps to run")
        last_step, last_result = self.runner_log[-1]
        if last_step.block != StepBlockType.SUMMARY:
            summary = PlanStep("summary", StepBlockType.SUMMARY, {})
            self.runner_log.append((summary,
                                    summary.run(self, self._config)))
            return None
        return StepResult(last_result.output)

    def _forced_summary(self) -> StepResult:
        """Decision cap exceeded: return the latest summary, running one
        final summary step if the log doesn't end in one."""
        if self.runner_log:
            last_step, last_result = self.runner_log[-1]
            if last_step.block == StepBlockType.SUMMARY:
                return StepResult(last_result.output)
        summary = PlanStep("summary", StepBlockType.SUMMARY, {})
        result = summary.run(self, self._config)
        self.runner_log.append((summary, result))
        return StepResult(result.output)

    def _decide(self, next_step: PlanStep | None) -> OrchestratorDecision:
        response = self.chat.send_message(
            DECISION_PROMPT
            .replace("#LOG_HISTORY", self.log_text())
            .replace("#NEXT_STEP",
                     json.dumps(next_step.to_json()) if next_step
                     else "null"))
        return OrchestratorDecision.from_json(extract_json(response.text))


class Orchestrator:
    """Plan-then-run entry point (reference
    ``orchestrator/orchestrator.py:18-67``)."""

    def __init__(self, model: GenerativeModel, backstory: str = ""):
        self._model = model
        self._backstory = backstory
        self._agents: list = []
        self._chat: GenerativeModelChatSession | None = None

    def register_agent(self, agent) -> None:
        self._agents.append(agent)

    def _get_chat(self) -> GenerativeModelChatSession:
        if self._chat is None:
            self._chat = self._model.with_system_instruction(
                ORCHESTRATOR_SYSTEM
                .replace("#BACKSTORY", self._backstory)
                .replace("#AGENTS",
                         ",".join(str(a) for a in self._agents))
            ).start_chat({"response_validation": False})
        return self._chat

    def ask(self, question: str, **runner_kwargs) -> StepResult:
        return self.runner(question, **runner_kwargs).run()

    def runner(self, question: str, **runner_kwargs) -> OrchestratorRunner:
        plan = self._create_execution_plan(question)
        return OrchestratorRunner(self._get_chat(), self._agents, plan,
                                  user_question=question, **runner_kwargs)

    def _create_execution_plan(self, question: str) -> ExecutionPlan:
        response = self._get_chat().send_message(
            EXECUTION_PLAN_PROMPT.replace("#QUESTION", question))
        return ExecutionPlan.from_json(extract_json(response.text))
