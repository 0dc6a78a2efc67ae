"""AsofJoin — point-in-time join (for each left row, the most recent right
row at-or-before its timestamp, per key).

The reference has no as-of machinery (its joins are point lookups —
SURVEY.md §2.2), but any feature-store-shaped system needs point-in-time
correctness for training-data generation (no feature leakage from the
future); Feast's offline retrieval is exactly this join. We add it as a
first-class operator.

Spark-first implementation — the union-window trick, ONE shuffle total:
tag left rows 1 and right rows 0, union them, sort within each key by
``(ts, tag)`` and carry the right payload forward with
``last(ignorenulls=True)``; keep left rows. Equal timestamps: right sorts
before left (inclusive semantics) or after (strict). This scales to any
left/right size ratio — no range-explosion, no per-key collect, and AQE
handles key skew. A broadcast-range variant isn't needed because the window
is already the minimal-shuffle plan.

Oracle twin: DuckDB's native ``ASOF JOIN``.
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from systems_spark.operators.base import Operator


class AsofJoin(Operator):
    def __init__(self, right_df: DataFrame, on: Iterable[str],
                 left_ts: str, right_ts: str, right_cols: Iterable[str],
                 strict: bool = False, suffix: str = "_asof"):
        self.right_df = right_df
        self.on = [on] if isinstance(on, str) else list(on)
        self.left_ts = left_ts
        self.right_ts = right_ts
        self.right_cols = list(right_cols)
        self.strict = strict
        self.suffix = suffix
        self.requires = tuple(self.on) + (left_ts,)

    def transform(self, df: DataFrame) -> DataFrame:
        out_names = [f"{c}{self.suffix}" if c in df.columns else c for c in self.right_cols]
        left_cols = [c for c in df.columns]

        left = df.select(
            *left_cols,
            F.col(self.left_ts).alias("_ts"),
            F.lit(1).alias("_tag"),
            *[F.lit(None).cast(self.right_df.schema[c].dataType).alias(o)
              for c, o in zip(self.right_cols, out_names)],
        )
        right = self.right_df.select(
            *[F.lit(None).cast(df.schema[c].dataType).alias(c)
              for c in left_cols if c not in self.on],
            *[F.col(k) for k in self.on],
            F.col(self.right_ts).alias("_ts"),
            F.lit(0).alias("_tag"),
            *[F.col(c).alias(o) for c, o in zip(self.right_cols, out_names)],
        ).select(*left_cols, "_ts", "_tag", *out_names)

        # inclusive: right (tag 0) sorts before left (tag 1) at equal ts, so
        # last() sees it; strict: flip so equal-ts right rows are NOT visible
        tag_order = F.col("_tag").asc() if not self.strict else F.col("_tag").desc()
        w = (
            Window.partitionBy(*self.on)
            .orderBy(F.col("_ts").asc(), tag_order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        carried = left.unionByName(right)
        for o in out_names:
            carried = carried.withColumn(o, F.last(o, ignorenulls=True).over(w))
        return carried.where(F.col("_tag") == 1).drop("_ts", "_tag")
