"""Branch composition — the reference's ``+`` (parallel branches, column-wise
concat) and named Subgraphs.

Reference semantics: ``branch_a + branch_b`` runs two operator chains on the
same upstream and concatenates their output columns, relying on shared row
order (tests/unit/systems/dag/test_graph.py:56-61; README.md:26-30).

Spark-first: row order is not a contract in a distributed engine, so the
implicit shared-row-order concat becomes an EXPLICIT equi-join on a row key
— the same generalization this engine applies to per-request batch
semantics (SURVEY.md §7.3). Each branch runs against the same upstream
DataFrame; outputs join on ``key``. Catalyst dedups the shared upstream
subtree (ReusedExchange / scan reuse), and the joins broadcast when small.
Collisions are right-biased like the reference's concat.

``Pipeline`` objects ARE Subgraphs (named sub-DAGs usable as nodes,
tests/unit/systems/ops/tf/test_ensemble.py:263-265): any Pipeline can be a
branch here, and ``Pipeline >> Pipeline`` splices them inline.
"""

from __future__ import annotations

import os
from typing import Iterable

from pyspark.sql import DataFrame

from systems_spark.operators.base import Operator


class BranchConcat(Operator):
    """Run each branch (Operator or Pipeline) on the same input; join their
    outputs column-wise on ``key``. ``key`` must uniquely identify rows and
    be preserved by every branch."""

    def __init__(self, branches: Iterable, key: str):
        self.branches = list(branches)
        self.key = key
        self.requires = (key,)

    def fit(self, df: DataFrame) -> "BranchConcat":
        for b in self.branches:
            if hasattr(b, "fit"):
                b.fit(df)
        return self

    def transform(self, df: DataFrame) -> DataFrame:
        out = None
        for branch in self.branches:
            res = branch.transform(df) if hasattr(branch, "transform") else branch(df)
            if self.key not in res.columns:
                raise ValueError(
                    f"BranchConcat: branch {branch!r} dropped key column {self.key!r}"
                )
            if out is None:
                out = res
                continue
            collisions = [c for c in res.columns if c in out.columns and c != self.key]
            out = out.drop(*collisions).join(res, on=self.key, how="inner")
        return out if out is not None else df

    # -- persistence: each branch saved as a nested pipeline ---------------
    def get_params(self):
        return {"branches": [], "key": self.key}  # branches come from artifacts

    def save_artifacts(self, path: str) -> None:
        from systems_spark.pipeline import Pipeline

        for i, b in enumerate(self.branches):
            nested = b if isinstance(b, Pipeline) else Pipeline([b])
            nested.save(os.path.join(path, f"branch_{i:03d}"))

    def load_artifacts(self, path: str, spark=None) -> None:
        from systems_spark.pipeline import Pipeline

        dirs = sorted(d for d in os.listdir(path) if d.startswith("branch_"))
        self.branches = [
            Pipeline.load(os.path.join(path, d), spark=spark) for d in dirs
        ]


class Subgraph(Operator):
    """A NAMED sub-DAG usable as a single node (reference:
    tests/unit/systems/ops/tf/test_ensemble.py:263-265 — ``Subgraph`` wraps
    an operator chain under a name). Delegates fit/transform/schema to the
    wrapped Pipeline; persists it as a nested pipeline directory, so deep
    graphs round-trip through ``Pipeline.save``/``load``."""

    def __init__(self, name: str, pipeline=None):
        self.name = name
        self.pipeline = pipeline

    def fit(self, df: DataFrame) -> "Subgraph":
        self.pipeline.fit(df)
        return self

    def transform(self, df: DataFrame) -> DataFrame:
        return self.pipeline.transform(df)

    def compute_output_schema(self, input_schema):
        return self.pipeline.compute_output_schema(input_schema)

    def get_params(self):
        return {"name": self.name}  # pipeline comes from artifacts

    def save_artifacts(self, path: str) -> None:
        self.pipeline.save(os.path.join(path, "pipeline"))

    def load_artifacts(self, path: str, spark=None) -> None:
        from systems_spark.pipeline import Pipeline

        self.pipeline = Pipeline.load(os.path.join(path, "pipeline"), spark=spark)

    def __repr__(self) -> str:
        return f"Subgraph({self.name!r}, {self.pipeline!r})"
