"""Projection / rename / row-filter operators.

Reference: column selection via ``ColumnSelector`` / node subselect
(reference: README.md:26,80; tests/unit/systems/dag/test_graph.py:58-60),
``Rename`` workflow op (tests/unit/systems/dag/test_graph.py:37), label-column
removal (merlin/systems/dag/ops/workflow.py:60-61).

Spark-first: these are pure Catalyst projections — they cost nothing at
runtime (column pruning folds them into the scan; ``ReadSchema`` in
``explain`` shrinks accordingly).
"""

from __future__ import annotations

from typing import Iterable, Mapping, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from systems_spark.operators.base import Operator
from systems_spark.schema import Schema


class SelectColumns(Operator):
    """Projection by name or tag. ``SelectColumns(["a", "b"])`` or
    ``SelectColumns(tag=Tags.CATEGORICAL)`` (tag selection reads
    StructField.metadata written by this engine's schema layer)."""

    def __init__(self, columns: Iterable[str] = (), tag=None):
        self.columns = list(columns)
        self.tag = str(tag) if tag is not None else None
        self.requires = tuple(self.columns)

    def transform(self, df: DataFrame) -> DataFrame:
        cols = list(self.columns)
        if self.tag is not None:
            tagged = [
                f.name
                for f in df.schema.fields
                if self.tag in (f.metadata or {}).get("tags", [])
            ]
            cols.extend(c for c in tagged if c not in cols)
        return df.select(*cols)

    def compute_output_schema(self, input_schema: Schema) -> Schema:
        s = input_schema.select(self.columns) if self.columns else Schema()
        if self.tag is not None:
            s = s + input_schema.select_by_tag(self.tag)
        return s

    def get_params(self):
        return {"columns": self.columns, "tag": self.tag}


class DropColumns(Operator):
    """Drop columns (label-column removal: merlin/systems/dag/ops/workflow.py:60-61)."""

    def __init__(self, columns: Iterable[str]):
        self.columns = list(columns)

    def transform(self, df: DataFrame) -> DataFrame:
        return df.drop(*self.columns)

    def compute_output_schema(self, input_schema: Schema) -> Schema:
        return input_schema.excluding(self.columns)

    def get_params(self):
        return {"columns": self.columns}


class Rename(Operator):
    """Rename columns by mapping, prefix or postfix
    (reference Rename(postfix=...): tests/unit/systems/dag/test_graph.py:37)."""

    def __init__(self, mapping: Mapping[str, str] = None, prefix: str = "", postfix: str = "",
                 columns: Iterable[str] = None):
        self.mapping = dict(mapping or {})
        self.prefix = prefix
        self.postfix = postfix
        self.columns = list(columns) if columns is not None else None

    def _new_name(self, name: str) -> str:
        if self.mapping:
            return self.mapping.get(name, name)
        if self.columns is not None and name not in self.columns:
            return name
        return f"{self.prefix}{name}{self.postfix}"

    def transform(self, df: DataFrame) -> DataFrame:
        return df.withColumnsRenamed({c: self._new_name(c) for c in df.columns})

    def compute_output_schema(self, input_schema: Schema) -> Schema:
        return Schema(c.with_name(self._new_name(c.name)) for c in input_schema)

    def get_params(self):
        return {"mapping": self.mapping, "prefix": self.prefix,
                "postfix": self.postfix, "columns": self.columns}


class FilterRows(Operator):
    """General row predicate — the reference has no predicate language (its
    only row filter is the np.isin anti-join, session_filter.py:161); Spark
    ``F.col`` expressions subsume it and push down to the scan."""

    def __init__(self, condition: Union[str, Column]):
        self.condition = condition

    def transform(self, df: DataFrame) -> DataFrame:
        cond = F.expr(self.condition) if isinstance(self.condition, str) else self.condition
        return df.where(cond)

    def get_params(self):
        if not isinstance(self.condition, str):
            raise TypeError("only string conditions are persistable")
        return {"condition": self.condition}
