"""Live LLM backend adapters — OpenAI / Gemini / Ollama client classes
behind lazy imports (reference ``graphrag_sdk/models/openai.py:1-131``,
``models/gemini.py:1-113``, ``models/ollama.py:1-119``).

This sandbox has no LLM SDKs and no network, so these classes import
their SDK lazily on the FIRST call: construction and JSON round-trips
always work (they're pure config), and ``ask``/``send_message`` raise a
clear ``RuntimeError`` naming the missing package when the SDK is
absent.  A user with a real key gets working clients; the engine's
deterministic paths (``StaticReplayModel``) never touch this module.

JSON shapes accepted match the reference's ``to_json`` output
(``{"model_name", "generation_config", "system_instruction"}``); this
engine's own ``to_json`` additionally writes a ``"kind"`` discriminator
because the reference dispatches per-class while our registry dispatches
from data (see ``querypath.model_from_json``).
"""

from __future__ import annotations

import importlib

from .models import FinishReason, GenerationResponse


class GenerativeModelConfig:
    """Sampling configuration (reference ``models/model.py:10-60``)."""

    def __init__(self, temperature: float | None = None,
                 top_p: float | None = None, top_k: int | None = None,
                 max_output_tokens: int | None = None,
                 stop_sequences: list[str] | None = None):
        self.temperature = temperature
        self.top_p = top_p
        self.top_k = top_k
        self.max_output_tokens = max_output_tokens
        self.stop_sequences = stop_sequences

    def to_json(self) -> dict:
        return {"temperature": self.temperature, "top_p": self.top_p,
                "top_k": self.top_k,
                "max_output_tokens": self.max_output_tokens,
                "stop_sequences": self.stop_sequences}

    @staticmethod
    def from_json(data: dict | None) -> "GenerativeModelConfig":
        data = data or {}
        return GenerativeModelConfig(
            temperature=data.get("temperature"),
            top_p=data.get("top_p"), top_k=data.get("top_k"),
            max_output_tokens=data.get("max_output_tokens"),
            stop_sequences=data.get("stop_sequences"))


class _HistoryChatSession:
    """Shared chat session: accumulates alternating user/assistant turns
    and delegates each send to the owning model's completion call."""

    def __init__(self, model: "_LiveBackendModel",
                 args: dict | None = None):
        self._model = model
        self._args = args or {}
        self._history: list[dict] = []

    def send_message(self, message: str) -> GenerationResponse:
        response = self._model._chat_completion(self._history, message)
        self._history.append({"role": "user", "content": message})
        self._history.append({"role": "assistant",
                              "content": response.text})
        return response


class _LiveBackendModel:
    """Common skeleton for the three live backends: config-only
    construction, lazy SDK import, JSON codec with a ``kind`` tag."""

    SDK_MODULE = ""          # import name, e.g. "openai"
    SDK_HINT = ""            # pip-install hint for the error message

    def __init__(self, model_name: str,
                 generation_config: GenerativeModelConfig | None = None,
                 system_instruction: str | None = None):
        self.model_name = model_name
        self.generation_config = (generation_config
                                  or GenerativeModelConfig())
        self.system_instruction = system_instruction
        self._client = None

    # -- protocol ---------------------------------------------------------
    def with_system_instruction(self, instruction: str):
        self.system_instruction = instruction
        self._client = None
        return self

    def start_chat(self, args: dict | None = None) -> _HistoryChatSession:
        return _HistoryChatSession(self, args)

    def ask(self, message: str) -> GenerationResponse:
        return self._chat_completion([], message)

    # -- SDK plumbing -----------------------------------------------------
    def _sdk(self):
        try:
            return importlib.import_module(self.SDK_MODULE)
        except ImportError as exc:
            raise RuntimeError(
                f"{type(self).__name__} needs the {self.SDK_MODULE!r} "
                f"package ({self.SDK_HINT}); it is not installed in "
                f"this environment") from exc

    def _chat_completion(self, history: list[dict],
                         message: str) -> GenerationResponse:
        raise NotImplementedError

    # -- JSON codec -------------------------------------------------------
    def to_json(self) -> dict:
        return {"kind": type(self).__name__,
                "model_name": self.model_name,
                "generation_config": self.generation_config.to_json(),
                "system_instruction": self.system_instruction}

    @classmethod
    def from_json(cls, data: dict):
        return cls(
            data["model_name"],
            generation_config=GenerativeModelConfig.from_json(
                data.get("generation_config")),
            system_instruction=data.get("system_instruction"))


class OpenAiGenerativeModel(_LiveBackendModel):
    """OpenAI chat-completions backend (reference
    ``models/openai.py:11-131``)."""

    SDK_MODULE = "openai"
    SDK_HINT = "pip install openai"

    def _get_client(self):
        if self._client is None:
            self._client = self._sdk().OpenAI()
        return self._client

    def _chat_completion(self, history: list[dict],
                         message: str) -> GenerationResponse:
        cfg = self.generation_config
        messages = []
        if self.system_instruction:
            messages.append({"role": "system",
                             "content": self.system_instruction})
        messages.extend(history)
        messages.append({"role": "user", "content": message})
        response = self._get_client().chat.completions.create(
            model=self.model_name, messages=messages,
            temperature=cfg.temperature, top_p=cfg.top_p,
            max_tokens=cfg.max_output_tokens, stop=cfg.stop_sequences)
        choice = response.choices[0]
        reason = {"stop": FinishReason.STOP,
                  "length": FinishReason.MAX_TOKENS}.get(
                      choice.finish_reason, FinishReason.OTHER)
        return GenerationResponse(text=choice.message.content or "",
                                  finish_reason=reason)


class GeminiGenerativeModel(_LiveBackendModel):
    """Google Gemini backend (reference ``models/gemini.py:18-113``)."""

    SDK_MODULE = "google.generativeai"
    SDK_HINT = "pip install google-generativeai"

    def _get_client(self):
        if self._client is None:
            genai = self._sdk()
            cfg = self.generation_config
            self._client = genai.GenerativeModel(
                self.model_name,
                generation_config=genai.GenerationConfig(
                    temperature=cfg.temperature, top_p=cfg.top_p,
                    top_k=cfg.top_k,
                    max_output_tokens=cfg.max_output_tokens,
                    stop_sequences=cfg.stop_sequences),
                system_instruction=self.system_instruction)
        return self._client

    def _chat_completion(self, history: list[dict],
                         message: str) -> GenerationResponse:
        # Gemini's chat API wants its own history type; replay ours
        gem_history = [{"role": ("user" if h["role"] == "user"
                                 else "model"),
                        "parts": [h["content"]]} for h in history]
        chat = self._get_client().start_chat(history=gem_history)
        response = chat.send_message(message)
        candidate = response.candidates[0]
        reason = {1: FinishReason.STOP, 2: FinishReason.MAX_TOKENS}.get(
            int(getattr(candidate, "finish_reason", 0)),
            FinishReason.OTHER)
        return GenerationResponse(text=response.text,
                                  finish_reason=reason)


class OllamaGenerativeModel(_LiveBackendModel):
    """Ollama local-server backend (reference
    ``models/ollama.py:5-119``)."""

    SDK_MODULE = "ollama"
    SDK_HINT = "pip install ollama"

    def __init__(self, model_name: str,
                 generation_config: GenerativeModelConfig | None = None,
                 system_instruction: str | None = None,
                 host: str | None = None):
        super().__init__(model_name, generation_config,
                         system_instruction)
        self.host = host

    def _get_client(self):
        if self._client is None:
            self._client = self._sdk().Client(host=self.host)
        return self._client

    def _chat_completion(self, history: list[dict],
                         message: str) -> GenerationResponse:
        cfg = self.generation_config
        messages = []
        if self.system_instruction:
            messages.append({"role": "system",
                             "content": self.system_instruction})
        messages.extend(history)
        messages.append({"role": "user", "content": message})
        response = self._get_client().chat(
            model=self.model_name, messages=messages,
            options={"temperature": cfg.temperature, "top_p": cfg.top_p,
                     "num_predict": cfg.max_output_tokens,
                     "stop": cfg.stop_sequences})
        # ollama reports no machine finish reason; done=True → STOP
        done = bool(response.get("done", True)) \
            if isinstance(response, dict) else True
        return GenerationResponse(
            text=(response["message"]["content"]
                  if isinstance(response, dict)
                  else response.message.content),
            finish_reason=FinishReason.STOP if done
            else FinishReason.OTHER)

    def to_json(self) -> dict:
        out = super().to_json()
        out["host"] = self.host
        return out

    @classmethod
    def from_json(cls, data: dict):
        return cls(
            data["model_name"],
            generation_config=GenerativeModelConfig.from_json(
                data.get("generation_config")),
            system_instruction=data.get("system_instruction"),
            host=data.get("host"))


def infer_backend_kind(data: dict) -> str | None:
    """Reference JSON carries NO class discriminator (each backend's
    ``from_json`` is a per-class static method) — infer it the way the
    ecosystem names models: gpt-*/o* → OpenAI, gemini-* → Gemini, a
    ``host`` key or anything else → Ollama (its registry hosts
    arbitrary names)."""
    name = (data.get("model_name") or "").lower()
    if "host" in data:
        return "OllamaGenerativeModel"
    if name.startswith(("gpt", "o1", "o3", "o4", "chatgpt")):
        return "OpenAiGenerativeModel"
    if name.startswith("gemini"):
        return "GeminiGenerativeModel"
    if name:
        return "OllamaGenerativeModel"
    return None
