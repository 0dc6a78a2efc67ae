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

    @staticmethod
    def _ts_number(col, dtype):
        """Normalize a timestamp-ish column for gap arithmetic: real
        TimestampType subtracts to a DayTimeIntervalType (not comparable to
        a numeric tolerance), so convert to epoch microseconds; numeric
        epoch columns pass through. ``tolerance`` is therefore in
        MICROSECONDS for TimestampType inputs and in the column's own units
        for numeric inputs."""
        from pyspark.sql.types import DateType, TimestampNTZType, TimestampType

        if isinstance(dtype, TimestampType):
            return F.unix_micros(col)
        if isinstance(dtype, TimestampNTZType):
            return F.unix_micros(col.cast("timestamp"))
        if isinstance(dtype, DateType):
            return F.unix_micros(col.cast("timestamp"))
        return col

    def transform(self, df: DataFrame) -> DataFrame:
        from pyspark.sql.types import StructField, StructType

        out_names = [f"{c}{self.suffix}" if c in df.columns else c for c in self.right_cols]
        left_cols = [c for c in df.columns]
        rschema = self.right_df.schema

        # the matched right row travels as ONE struct with ONE
        # last(ignorenulls=True): per-column carries would stitch fields
        # from DIFFERENT right rows whenever the matched row holds a NULL
        # payload value but an older row doesn't — true as-of semantics
        # (and DuckDB's ASOF JOIN) keep the matched row's NULLs
        struct_fields = [
            StructField(o, rschema[c].dataType) for c, o in zip(self.right_cols, out_names)
        ] + [StructField("_rts", rschema[self.right_ts].dataType)]
        struct_type = StructType(struct_fields)
        rstruct = F.struct(
            *[F.col(c).alias(o) for c, o in zip(self.right_cols, out_names)],
            F.col(self.right_ts).alias("_rts"),
        )

        left = df.select(
            *left_cols,
            F.col(self.left_ts).alias("_ts"),
            F.lit(1).alias("_tag"),
            F.lit(None).cast(struct_type).alias("_r"),
        )
        right = self.right_df.select(
            *[F.lit(None).cast(df.schema[c].dataType).alias(c)
              for c in left_cols if c not in self.on],
            *[F.col(k) for k in self.on],
            F.col(self.right_ts).alias("_ts"),
            F.lit(0).alias("_tag"),
            rstruct.alias("_r"),
        ).select(*left_cols, "_ts", "_tag", "_r")

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
        out = (
            left.unionByName(right)
            .withColumn("_r", F.last("_r", ignorenulls=True).over(w))
            .where(F.col("_tag") == 1)
        )
        if self.tolerance is not None:
            lnum = self._ts_number(F.col("_ts"), df.schema[self.left_ts].dataType)
            rnum = self._ts_number(F.col("_r._rts"), rschema[self.right_ts].dataType)
            gap = lnum - rnum if self.direction == "backward" else rnum - lnum
            within = F.col("_r").isNotNull() & (gap <= F.lit(self.tolerance))
            for o in out_names:
                out = out.withColumn(o, F.when(within, F.col(f"_r.{o}")))
        else:
            for o in out_names:
                out = out.withColumn(o, F.col(f"_r.{o}"))
        return out.drop("_r", "_ts", "_tag")
