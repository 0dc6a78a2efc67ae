"""Optimizer fence: force one-time evaluation of expensive columns.

Catalyst's ProjectCollapsing merges adjacent projections by substituting
aliases with their defining expressions. For a cheap expression that is
pure win; for an expensive expression referenced N times downstream (e.g.
a tokenization feeding a higher-order-function lambda, or a 32-counter
fold read by 32 bit extractors) it multiplies the work N× — measured 23×
on the shingle path at sf0.1 (11.7s → 0.75s).

``fence_columns`` materializes such expressions behind a ``Generate``
node: ``explode(array(expr))`` yields exactly one row per input row, and a
generator's output is a runtime attribute, which alias substitution cannot
reach through. Unlike ``repartition`` (a full shuffle) or ``localCheckpoint``
(materialization), the fence is free: no exchange, no storage, row count
and order preserved.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fence_columns(df: DataFrame, **cols) -> DataFrame:
    """Return ``df`` with each ``name=expr`` added as a fenced column that
    downstream projections reference as an attribute (single evaluation),
    never inline. Null values are preserved (the 1-element array always
    explodes to one row)."""
    out = df
    for name, c in cols.items():
        out = out.withColumn(name, F.explode(F.array(c)))
    return out
