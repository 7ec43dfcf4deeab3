"""User extension surface (SURVEY.md §2.6 X1): Step protocol + Pipeline.

A Step is a named Dataset->Dataset transform with declared input/output
schemas; a Pipeline is an ordered Step list that validates schema
compatibility at BUILD time (M9 guard) before any data moves — the
explicit replacement for the reference's implicit CSV schemas.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Protocol, runtime_checkable

import pyarrow as pa

from engine.ops.schema import validate
from engine.ops.util import arrow_schema


@runtime_checkable
class Step(Protocol):
    name: str
    input_schema: pa.Schema | None   # None = any
    output_schema: pa.Schema | None

    def apply(self, ds):  # Dataset -> Dataset
        ...


@dataclass
class FnStep:
    """Adapter: wrap a plain Dataset->Dataset function as a Step."""

    name: str
    fn: Callable
    input_schema: pa.Schema | None = None
    output_schema: pa.Schema | None = None

    def apply(self, ds):
        return self.fn(ds)


@dataclass
class Pipeline:
    steps: list = field(default_factory=list)

    def validate_plan(self) -> None:
        """Chain-compatibility: each step's declared output must satisfy
        the next step's declared input (by name+type subset)."""
        prev_out = None
        for s in self.steps:
            if s.input_schema is not None and prev_out is not None:
                validate(prev_out, s.input_schema, where=f"step {s.name!r} input")
            if s.output_schema is not None:
                prev_out = s.output_schema
            elif s.input_schema is not None:
                prev_out = None  # unknown until runtime

    def run(self, ds, check_runtime_schemas: bool = False):
        self.validate_plan()
        for s in self.steps:
            if check_runtime_schemas and s.input_schema is not None:
                validate(arrow_schema(ds), s.input_schema, where=f"step {s.name!r} runtime input")
            ds = s.apply(ds)
        return ds
