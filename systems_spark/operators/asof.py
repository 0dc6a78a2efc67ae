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
                 strict: bool = False, suffix: str = "_asof",
                 direction: str = "backward", tolerance=None):
        """``direction="backward"`` (default): most recent right row
        at-or-before the left timestamp; ``"forward"``: earliest right row
        at-or-after it (pandas ``merge_asof`` surface). ``tolerance``: max
        allowed |left_ts − right_ts| in timestamp units — matches outside
        it are nulled (no leakage from stale features)."""
        if direction not in ("backward", "forward"):
            raise ValueError(f"direction must be backward|forward, got {direction}")
        self.right_df = right_df
        self.on = [on] if isinstance(on, str) else list(on)
        self.left_ts = left_ts
        self.right_ts = right_ts
        self.right_cols = list(right_cols)
        self.strict = strict
        self.suffix = suffix
        self.direction = direction
        self.tolerance = tolerance
        self.requires = tuple(self.on) + (left_ts,)

    def compute_output_schema(self, input_schema):
        from systems_spark.schema import ColumnSchema, Schema

        rt = Schema.of(self.right_df)
        added = []
        for c in self.right_cols:
            out = f"{c}{self.suffix}" if c in input_schema else c
            rc = rt[c]
            added.append(ColumnSchema(out, rc.dtype, is_list=rc.is_list,
                                      dims=rc.dims, tags=rc.tags))
        return input_schema + Schema(added)

    def transform(self, df: DataFrame) -> DataFrame:
        out_names = [f"{c}{self.suffix}" if c in df.columns else c for c in self.right_cols]
        left_cols = [c for c in df.columns]
        carry_rts = self.tolerance is not None

        left = df.select(
            *left_cols,
            F.col(self.left_ts).alias("_ts"),
            F.lit(1).alias("_tag"),
            *[F.lit(None).cast(self.right_df.schema[c].dataType).alias(o)
              for c, o in zip(self.right_cols, out_names)],
            *([F.lit(None).cast(self.right_df.schema[self.right_ts].dataType)
               .alias("_rts")] if carry_rts else []),
        )
        right = self.right_df.select(
            *[F.lit(None).cast(df.schema[c].dataType).alias(c)
              for c in left_cols if c not in self.on],
            *[F.col(k) for k in self.on],
            F.col(self.right_ts).alias("_ts"),
            F.lit(0).alias("_tag"),
            *[F.col(c).alias(o) for c, o in zip(self.right_cols, out_names)],
            *([F.col(self.right_ts).alias("_rts")] if carry_rts else []),
        ).select(*left_cols, "_ts", "_tag", *out_names,
                 *(["_rts"] if carry_rts else []))

        # traversal order: backward walks time ascending (carry the most
        # recent right row forward); forward walks descending (carry the
        # earliest upcoming right row backward). In BOTH, at equal ts the
        # right row (tag 0) is visible iff inclusive, so it sorts first
        # unless strict.
        ts_order = (F.col("_ts").asc() if self.direction == "backward"
                    else F.col("_ts").desc())
        tag_order = F.col("_tag").asc() if not self.strict else F.col("_tag").desc()
        w = (
            Window.partitionBy(*self.on)
            .orderBy(ts_order, tag_order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        carried = left.unionByName(right)
        carry_cols = out_names + (["_rts"] if carry_rts else [])
        for o in carry_cols:
            carried = carried.withColumn(o, F.last(o, ignorenulls=True).over(w))
        out = carried.where(F.col("_tag") == 1)
        if carry_rts:
            gap = (F.col("_ts") - F.col("_rts") if self.direction == "backward"
                   else F.col("_rts") - F.col("_ts"))
            within = F.col("_rts").isNotNull() & (gap <= F.lit(self.tolerance))
            for o in out_names:
                out = out.withColumn(o, F.when(within, F.col(o)))
            out = out.drop("_rts")
        return out.drop("_ts", "_tag")
