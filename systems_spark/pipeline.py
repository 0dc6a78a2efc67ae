"""Pipeline: ordered operator composition with fit/transform/save/load.

Reference semantics: ``Ensemble(graph, schema)`` wraps an operator DAG, runs
schema propagation, executes with ``transform``, persists with
``save``/``load`` (cloudpickle + version-checked metadata.json)
(reference: merlin/systems/dag/ensemble.py:35-153).

Spark-first design: the "DAG" is the composed lazy DataFrame; a Pipeline is
just the ordered operator list. Parallel branches in the reference
(``branch_a + branch_b`` concatenated column-wise,
tests/unit/systems/dag/test_graph.py:56-61) are expressed here by operators
that add columns to one flowing DataFrame — column-wise concat of branches
sharing a row order is exactly ``withColumns`` on shared lineage, which keeps
Catalyst free to prune/pushdown across "branches".

Persistence: a JSON plan (operator class + constructor params) plus per-op
artifact directories (vocab parquet, model files) — the same layout idea as
the reference's exported ensembles, minus pickling: artifacts are data, the
plan is declarative, so saved pipelines are portable across engine versions
(version-check warning mirrors ensemble.py:126-141).
"""

from __future__ import annotations

import importlib
import json
import os
import warnings
from typing import Iterable, List

from pyspark.sql import DataFrame

from systems_spark.schema import Schema

_PLAN_FILE = "pipeline.json"


class Pipeline:
    """Ordered operator chain. ``p = op_a >> op_b`` or ``Pipeline([a, b])``.

    ``sparse_max``: serve-time dense-padding knob ``{column: max_len}`` —
    after all operators run, each listed ragged list column is padded (and
    truncated) to its fixed length with ``sparse_fill``. Mirrors the
    fitted-workflow boundary option of the reference
    (merlin/systems/dag/ops/workflow.py:31-61 ``sparse_max``); implemented
    with the same JVM-only expression as :class:`Padding`."""

    def __init__(self, operators: Iterable = (), sparse_max: dict = None,
                 sparse_fill=0):
        self.operators: List = list(operators)
        self.sparse_max = dict(sparse_max) if sparse_max else None
        self.sparse_fill = sparse_fill

    # -- composition -------------------------------------------------------
    def __rshift__(self, other) -> "Pipeline":
        from systems_spark.operators.base import Operator

        kw = dict(sparse_max=self.sparse_max, sparse_fill=self.sparse_fill)
        if isinstance(other, Pipeline):
            return Pipeline(self.operators + other.operators,
                            **(dict(sparse_max=other.sparse_max,
                                    sparse_fill=other.sparse_fill)
                               if other.sparse_max else kw))
        if isinstance(other, Operator):
            return Pipeline(self.operators + [other], **kw)
        if callable(other):
            from systems_spark.operators.base import LambdaOp

            return Pipeline(self.operators + [LambdaOp(other)], **kw)
        raise TypeError(f"cannot compose Pipeline with {type(other)}")

    # -- execution ---------------------------------------------------------
    def fit(self, df: DataFrame) -> "Pipeline":
        """Fit stateful ops in order, flowing each op's transform into the
        next op's fit (the NVTabular fit protocol — SURVEY.md §2.3)."""
        current = df
        for op in self.operators:
            op.fit(current)
            current = op(current)
        return self

    def transform(self, df: DataFrame) -> DataFrame:
        current = df
        for op in self.operators:
            current = op(current)
        if self.sparse_max:
            from systems_spark.operators.padding import Padding

            for col, n in self.sparse_max.items():
                current = Padding(col, n, fill=self.sparse_fill)(current)
        return current

    def fit_transform(self, df: DataFrame) -> DataFrame:
        return self.fit(df).transform(df)

    def __call__(self, df: DataFrame) -> DataFrame:
        return self.transform(df)

    def compute_output_schema(self, input_schema: Schema) -> Schema:
        current = input_schema
        for op in self.operators:
            current = op.compute_output_schema(current)
        if self.sparse_max:
            from systems_spark.schema import ColumnSchema

            cols = []
            for c in current:
                if c.name in self.sparse_max:
                    cols.append(ColumnSchema(
                        c.name, c.dtype, is_list=True,
                        dims=(None, self.sparse_max[c.name]),
                        tags=c.tags, properties=c.properties,
                    ))
                else:
                    cols.append(c)
            current = Schema(cols)
        return current

    # -- persistence -------------------------------------------------------
    def save(self, path: str) -> None:
        """Write a declarative plan + per-op artifacts.

        Each operator contributes ``get_params()`` (JSON-serializable ctor
        args) and optionally ``save_artifacts(dir)`` (reference analog:
        merlin/systems/dag/ops/faiss.py:59-78 load/save_artifacts)."""
        from systems_spark import __version__

        os.makedirs(path, exist_ok=True)
        plan = {"engine_version": __version__, "operators": []}
        if self.sparse_max:
            plan["sparse_max"] = self.sparse_max
            plan["sparse_fill"] = self.sparse_fill
        for i, op in enumerate(self.operators):
            entry = {
                "module": type(op).__module__,
                "cls": type(op).__qualname__,
                "params": op.get_params() if hasattr(op, "get_params") else {},
            }
            if hasattr(op, "save_artifacts"):
                art_dir = os.path.join(path, f"op_{i:03d}")
                os.makedirs(art_dir, exist_ok=True)
                op.save_artifacts(art_dir)
                entry["artifacts"] = f"op_{i:03d}"
            plan["operators"].append(entry)
        with open(os.path.join(path, _PLAN_FILE), "w") as f:
            json.dump(plan, f, indent=2)

    def export(self, path: str, input_schema=None) -> None:
        """Serving export: ``save()`` plus a ``metadata.json`` recording the
        declared input/output schemas (incl. list-ness and tags), mirroring
        the reference's exported-ensemble schema contract
        (merlin/systems/dag/ensemble.py:147-153, triton export schema at
        runtimes/triton/runtime.py:145-219). A server wraps ``Pipeline.load``
        + ``transform`` — e.g. the streaming runtime's serve_pipeline."""
        import json as _json

        self.save(path)
        meta = {}
        if input_schema is not None:
            out_schema = self.compute_output_schema(input_schema)
            meta["input_schema"] = input_schema.to_struct_type().jsonValue()
            meta["output_schema"] = out_schema.to_struct_type().jsonValue()
        with open(os.path.join(path, "metadata.json"), "w") as f:
            _json.dump(meta, f, indent=2)

    @classmethod
    def load(cls, path: str, spark=None) -> "Pipeline":
        from systems_spark import __version__

        with open(os.path.join(path, _PLAN_FILE)) as f:
            plan = json.load(f)
        if plan.get("engine_version") != __version__:
            warnings.warn(
                f"pipeline saved with engine {plan.get('engine_version')}, "
                f"loading with {__version__}"
            )
        ops = []
        for entry in plan["operators"]:
            mod = importlib.import_module(entry["module"])
            op_cls = getattr(mod, entry["cls"])
            op = op_cls(**entry["params"])
            if "artifacts" in entry and hasattr(op, "load_artifacts"):
                op.load_artifacts(os.path.join(path, entry["artifacts"]), spark=spark)
            ops.append(op)
        return cls(ops, sparse_max=plan.get("sparse_max"),
                   sparse_fill=plan.get("sparse_fill", 0))

    def __repr__(self) -> str:
        return "Pipeline(" + " >> ".join(repr(op) for op in self.operators) + ")"
