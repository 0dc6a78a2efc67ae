"""Vector similarity expressions over ``array<float>`` columns — pure JVM.

Reference context: QueryFaiss computes inner-product top-k over embedding
vectors (reference: merlin/systems/dag/ops/faiss.py:90-112, metric at :194).

Spark-first: `F.zip_with` + `F.aggregate` keep the dot product inside
whole-stage codegen (no Python). We cast to double before accumulating so the
result is order-stable IEEE arithmetic (arrays have a fixed element order, so
unlike a groupBy-sum the fold order is deterministic → oracle-safe when the
oracle folds in the same left-to-right order).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot_product(a: Column, b: Column) -> Column:
    """Σ a[i]*b[i] as double; deterministic left-to-right fold."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    return dot_product(a, b) / (l2_norm(a) * l2_norm(b))


def dot_product_sql(a: str, b: str) -> str:
    """DuckDB oracle twin of :func:`dot_product` — list_inner_product folds
    left-to-right over the same element order."""
    return f"list_inner_product({a}::DOUBLE[], {b}::DOUBLE[])"


def cosine_similarity_sql(a: str, b: str) -> str:
    return f"list_cosine_similarity({a}::DOUBLE[], {b}::DOUBLE[])"
