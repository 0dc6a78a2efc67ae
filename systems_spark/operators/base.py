"""Operator kernel: composable DataFrame→DataFrame transforms.

Reference semantics: operators subclass ``BaseOperator`` with
``transform(col_selector, transformable)`` plus schema-propagation hooks, and
compose into a DAG with ``>>`` (chain) and ``+`` (parallel branches)
(reference: merlin/systems/dag/ensemble.py:29-78, README.md:26-30,
tests/unit/systems/dag/test_graph.py:52-61).

Spark-first design: an :class:`Operator` is a *plan builder* — ``transform``
takes a lazy DataFrame and returns a lazy DataFrame built from native
``pyspark.sql.functions`` expressions wherever possible. Composition does not
need its own scheduler: chaining operators chains Catalyst logical plans, so
analysis/optimization/execution are Spark's. ``>>`` and ``+`` are provided as
thin sugar for parity with the reference's graph-building style.
"""

from __future__ import annotations

from typing import Iterable, Optional

from pyspark.sql import DataFrame

from systems_spark.schema import Schema, validate_columns


class Operator:
    """Base class: one declarative transform step.

    Subclasses implement :meth:`transform`; optionally :meth:`fit` (for
    vocabulary-building ops like Categorify — SURVEY.md §2.3) and
    :meth:`compute_output_schema` (friendly schema preview without running).
    """

    #: column names this op requires on its input (validated pre-transform)
    requires: tuple = ()

    def fit(self, df: DataFrame) -> "Operator":
        """Learn state from data (vocabularies, normalization stats).

        Default: stateless. Mirrors fit-time workflow semantics
        (reference: NVTabular workflows run inside TransformWorkflow,
        merlin/systems/dag/ops/workflow.py:86-112)."""
        return self

    def transform(self, df: DataFrame) -> DataFrame:
        raise NotImplementedError

    def compute_output_schema(self, input_schema: Schema) -> Schema:
        """Best-effort declared output schema. Default: unknown → input."""
        return input_schema

    # -- composition sugar -------------------------------------------------
    def __rshift__(self, other) -> "Pipeline":
        from systems_spark.pipeline import Pipeline

        return Pipeline([self]) >> other

    def __rrshift__(self, other) -> "Pipeline":
        """Reference graph-building sugar: ``["user_id"] >> op`` selects
        columns as the chain's root (README.md:26, selection-node lifting
        at session_filter.py:45)."""
        from systems_spark.operators.selection import SelectColumns
        from systems_spark.pipeline import Pipeline

        if isinstance(other, (list, tuple)) and all(
            isinstance(c, str) for c in other
        ):
            return Pipeline([SelectColumns(list(other)), self])
        return NotImplemented

    def __call__(self, df: DataFrame) -> DataFrame:
        self._validate(df)
        return self.transform(df)

    def _validate(self, df: DataFrame) -> None:
        if self.requires:
            validate_columns(df, self.requires, type(self).__name__)

    def __repr__(self) -> str:
        return f"{type(self).__name__}()"


class LambdaOp(Operator):
    """Wrap a plain ``DataFrame -> DataFrame`` function as an operator
    (custom-op analog: reference tests/unit/systems/utils/ops.py:26-48
    ``PlusTwoOp``)."""

    def __init__(self, fn, name: Optional[str] = None, requires: Iterable[str] = ()):
        self.fn = fn
        self.name = name or getattr(fn, "__name__", "lambda")
        self.requires = tuple(requires)

    def transform(self, df: DataFrame) -> DataFrame:
        return self.fn(df)

    def __repr__(self) -> str:
        return f"LambdaOp({self.name})"
