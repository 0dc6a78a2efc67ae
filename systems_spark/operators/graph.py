"""Shared graph-edge normalization for the iterative graph operators.

kcore and label_propagation both iterate over the SYMMETRIZED distinct
edge set (every undirected edge present in both directions, self-loops
dropped); triangles uses the complementary low→high orientation
(`triangles._oriented`). One definition here keeps the normalization —
null handling, dedup strategy — in one place (review r5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def symmetrize(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Symmetrized distinct edges (a, b), self-loops dropped. NULL
    endpoints drop with the self-loop filter (NULL != NULL is NULL)."""
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    return (e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
            .where(F.col("a") != F.col("b"))
            .distinct())
