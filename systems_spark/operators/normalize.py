"""Fitted feature transforms: Normalize (standardize) and FillMissing.

Reference context: NVTabular workflow ops fitted inside ``TransformWorkflow``
(merlin/systems/dag/ops/workflow.py:86-112 runs the fitted workflow; the
test workflows use Categorify/Rename — SURVEY.md §2.3; normalization is the
canonical continuous-feature op of that family).

Spark-first: fit = ONE distributed aggregation over all columns at once
(single job, map-side partial aggregation — not one pass per column);
transform = pure column expressions. State is a tiny plain dict →
JSON-serializable artifacts.
"""

from __future__ import annotations

import json
import os
from typing import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from systems_spark.operators.base import Operator


class Normalize(Operator):
    """(x - mean) / std per column; std==0 → 0. One fit job for all columns."""

    def __init__(self, columns: Iterable[str], out_suffix: str = ""):
        self.columns = [columns] if isinstance(columns, str) else list(columns)
        self.out_suffix = out_suffix
        self.stats = {}  # col -> (mean, std)
        self.requires = tuple(self.columns)

    def fit(self, df: DataFrame) -> "Normalize":
        aggs = []
        for c in self.columns:
            aggs += [F.avg(c).alias(f"avg_{c}"), F.stddev_pop(c).alias(f"std_{c}")]
        row = df.agg(*aggs).collect()[0]
        self.stats = {
            c: (row[f"avg_{c}"], row[f"std_{c}"]) for c in self.columns
        }
        return self

    def transform(self, df: DataFrame) -> DataFrame:
        if not self.stats:
            raise RuntimeError("Normalize.transform called before fit")
        out = df
        for c in self.columns:
            mean, std = self.stats[c]
            expr = (
                (F.col(c) - F.lit(mean)) / F.lit(std)
                if std
                else F.lit(0.0)
            )
            out = out.withColumn(f"{c}{self.out_suffix}", expr)
        return out

    def get_params(self):
        return {"columns": self.columns, "out_suffix": self.out_suffix}

    def save_artifacts(self, path: str) -> None:
        with open(os.path.join(path, "stats.json"), "w") as f:
            json.dump(self.stats, f)

    def load_artifacts(self, path: str, spark=None) -> None:
        with open(os.path.join(path, "stats.json")) as f:
            self.stats = {k: tuple(v) for k, v in json.load(f).items()}


class FillMissing(Operator):
    """Replace nulls with a constant or the fitted per-column mean."""

    def __init__(self, columns: Iterable[str], value=None, strategy: str = "constant"):
        self.columns = [columns] if isinstance(columns, str) else list(columns)
        self.value = value
        self.strategy = strategy
        self.fill_values = {}
        self.requires = tuple(self.columns)

    def fit(self, df: DataFrame) -> "FillMissing":
        if self.strategy == "mean":
            row = df.agg(*[F.avg(c).alias(c) for c in self.columns]).collect()[0]
            self.fill_values = {c: row[c] for c in self.columns}
        else:
            self.fill_values = {c: self.value for c in self.columns}
        return self

    def transform(self, df: DataFrame) -> DataFrame:
        if not self.fill_values:
            self.fit(df) if self.strategy == "constant" else None
        if not self.fill_values:
            raise RuntimeError("FillMissing.transform called before fit")
        return df.fillna(self.fill_values)

    def get_params(self):
        return {"columns": self.columns, "value": self.value, "strategy": self.strategy}

    def save_artifacts(self, path: str) -> None:
        with open(os.path.join(path, "fill.json"), "w") as f:
            json.dump(self.fill_values, f)

    def load_artifacts(self, path: str, spark=None) -> None:
        with open(os.path.join(path, "fill.json")) as f:
            self.fill_values = json.load(f)
