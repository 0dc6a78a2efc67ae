"""RangeJoin — join a value column into interval ranges [lo, hi).

Spark's default plan for ``ON v >= lo AND v < hi`` is a broadcast nested
loop (fine for small range tables) or, worse, a cartesian product. This
operator implements the scalable pattern: discretize both sides into
buckets — the left row into its value's bucket, each right range into EVERY
bucket it overlaps (a ``sequence`` explode) — equi-join on the narrow
bucket key, then refine with the exact predicate. The equi-join shuffles
hash-partitioned like any other join; no quadratic blowup, AQE handles
skewed buckets.

``bucket_size`` should be on the order of typical range width: too small
explodes the right side, too large degrades the refine selectivity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from systems_spark.operators.base import Operator


class RangeJoin(Operator):
    def __init__(self, ranges_df: DataFrame, value_col: str,
                 lo_col: str = "lo", hi_col: str = "hi",
                 bucket_size: float = 10.0, how: str = "inner",
                 broadcast: bool = False):
        self.ranges_df = ranges_df
        self.value_col = value_col
        self.lo_col = lo_col
        self.hi_col = hi_col
        self.bucket_size = float(bucket_size)
        self.how = how
        self.broadcast = broadcast
        self.requires = (value_col,)

    def transform(self, df: DataFrame) -> DataFrame:
        bs = self.bucket_size
        left = df.withColumn("_bucket", F.floor(F.col(self.value_col) / bs).cast("long"))
        # each range covers buckets floor(lo/bs) .. floor(hi/bs) — hi is
        # exclusive but its bucket may still contain values < hi
        ranges = self.ranges_df.withColumn(
            "_bucket",
            F.explode(
                F.sequence(
                    F.floor(F.col(self.lo_col) / bs).cast("long"),
                    F.floor(F.col(self.hi_col) / bs).cast("long"),
                )
            ),
        )
        if self.broadcast:
            ranges = F.broadcast(ranges)
        joined = left.join(ranges, on="_bucket", how="inner").where(
            (F.col(self.value_col) >= F.col(self.lo_col))
            & (F.col(self.value_col) < F.col(self.hi_col))
        ).drop("_bucket")
        if self.how == "inner":
            return joined
        raise ValueError(f"unsupported how={self.how!r}")

    def compute_output_schema(self, input_schema):
        from systems_spark.schema import Schema

        return input_schema + Schema.of(self.ranges_df)

    def get_params(self):
        raise TypeError("RangeJoin persists via save_artifacts (ranges are data)")

    def save_artifacts(self, path: str) -> None:
        self.ranges_df.write.mode("overwrite").parquet(f"{path}/ranges.parquet")
