"""Padding — pad/truncate ragged list columns to a fixed length.

Reference semantics: ``Padding(length, fill)`` densifies a ragged column
(reference usage: tests/unit/systems/ops/padding_op.py:25-41 — values
[1,2,3] offsets [0,1,3] padded to 2×5 with 0s); also the ``sparse_max``
dense-padding knob of TransformWorkflow
(merlin/systems/dag/ops/workflow.py:30-47).

Spark-first: a single JVM expression —
``slice(concat(col, array_repeat(fill, n)), 1, n)`` — no Python, no shuffle,
codegen-friendly. Truncates rows longer than ``n`` (slice semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from systems_spark.operators.base import Operator


class Padding(Operator):
    def __init__(self, column: str, length: int, fill=0, output_col: str = None):
        self.column = column
        self.length = int(length)
        self.fill = fill
        self.output_col = output_col or column
        self.requires = (column,)

    def transform(self, df: DataFrame) -> DataFrame:
        padded = F.slice(
            F.concat(
                F.coalesce(F.col(self.column), F.array()),
                F.array_repeat(F.lit(self.fill), self.length),
            ),
            1,
            self.length,
        )
        return df.withColumn(self.output_col, padded)

    def get_params(self):
        return {"column": self.column, "length": self.length,
                "fill": self.fill, "output_col": self.output_col}
