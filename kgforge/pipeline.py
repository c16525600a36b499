"""Pipeline-step extension surface.

The reference exposes a ``Step`` base class
(``graphrag_sdk/steps/Step.py``; concrete steps at
``steps/{create_ontology_step,extract_data_step,graph_query_step,
qa_step}.py``).  The Ray-Data-native equivalent is a ``Stage``: any
callable ``(Dataset, PipelineCtx) -> Dataset``, composed front-to-back
by :func:`compose`.  ``build_kg`` itself is expressible as such a chain;
users add custom stages (filters, scorers, redaction, …) between the
built-ins without touching the engine.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Protocol, runtime_checkable

from ray.data import Dataset


@dataclass
class PipelineCtx:
    """Shared read-only context threaded through stages (the analog of
    the reference step constructors' ontology/model/config arguments)."""

    ontology_json: str = ""
    config: dict = field(default_factory=dict)
    artifacts: dict = field(default_factory=dict)  # stage outputs by name


@runtime_checkable
class Stage(Protocol):
    def __call__(self, ds: Dataset, ctx: PipelineCtx) -> Dataset: ...


def compose(*stages: Stage) -> Callable[[Dataset, PipelineCtx], Dataset]:
    """Left-to-right composition; each stage sees the previous output."""

    def run(ds: Dataset, ctx: PipelineCtx) -> Dataset:
        for stage in stages:
            ds = stage(ds, ctx)
        return ds

    return run


def stage(fn: Callable[..., Dataset], **bound: Any) -> Stage:
    """Adapt a plain ``fn(ds, **kwargs)`` into a Stage with bound args."""

    def wrapped(ds: Dataset, ctx: PipelineCtx) -> Dataset:
        return fn(ds, **bound)

    return wrapped
