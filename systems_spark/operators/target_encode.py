"""Target encoding — smoothed per-category target statistics.

The NVTabular fit-time feature-engineering family beyond Categorify
(reference: NVTabular's TargetEncoding op is the standard companion of
Categorify in its workflows; the serving system runs such fitted
workflows inside TransformWorkflow — merlin/systems/dag/ops/
workflow.py:86-112). Replaces a high-cardinality categorical with the
m-estimate-smoothed mean of a numeric target:

    te(c) = (sum_target(c) + m · prior) / (count(c) + m)

where ``prior`` is the global target mean and ``m`` the smoothing weight
(categories with few rows shrink toward the prior; the classic leakage-
robust encoding for tree/linear models).

Determinism contract: the target is quantized to integer micros per row
at fit time (``round(target · 1e6)`` BIGINT — double multiply + HALF_UP
round are engine-identical), so category sums are exact integer sums,
``prior = total div n`` is integral, and

    te_micros(c) = (sum_micros(c) + m · prior_micros) div (count(c) + m)

is all-int64 (positive integral division: Spark ``div`` == DuckDB
``//``). Unseen categories at transform time encode to the prior.

100 TB shape: fit is ONE map-side-combined aggregation per encoded
column (shuffle carries (category, sum, count) — bounded by cardinality,
not rows); transform is a broadcast join per column (category stat
tables are small by definition of the encoding; a >100M-category column
should be hashed down with Categorify's ``num_buckets`` first).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from systems_spark.operators.base import Operator

_M = 1_000_000


class TargetEncode(Operator):
    """``fit`` on rows carrying ``target_col``; ``transform`` appends
    ``<col>_te`` (integer micros of the smoothed mean) per encoded col."""

    def __init__(self, columns, target_col: str, smoothing: int = 20,
                 out_suffix: str = "_te"):
        if smoothing < 0:
            raise ValueError("smoothing must be >= 0")
        self.columns = list(columns)
        self.target_col = target_col
        self.m = int(smoothing)
        self.out_suffix = out_suffix
        self._stats = None   # {col: DataFrame(cat, te_micros)}
        self._prior = None   # 1-row DataFrame(prior_micros)
        self.requires = tuple(self.columns)

    def fit(self, df: DataFrame) -> "TargetEncode":
        t = F.round(F.col(self.target_col) * _M).cast("long")
        base = df.select(*self.columns, t.alias("_t"))
        # count(_t), not count(*): a NULL target must not enter the
        # denominator (it would deflate the mean toward 0 instead of
        # shrinking the category toward the prior)
        glob = base.agg(
            F.expr("sum(_t) div count(_t)").alias("prior_micros"))
        self._prior = glob
        self._stats = {}
        for c in self.columns:
            agg = (base.groupBy(F.col(c).alias("_cat"))
                   .agg(F.sum("_t").alias("_sum"),
                        F.count(F.col("_t")).alias("_n")))
            self._stats[c] = (
                agg.crossJoin(F.broadcast(glob))
                .select("_cat", F.expr(
                    f"(coalesce(_sum, 0) + {self.m} * prior_micros) div (_n + {self.m})"
                ).alias("_te")))
        return self

    def transform(self, df: DataFrame) -> DataFrame:
        if self._stats is None:
            raise ValueError("fit() before transform()")
        out = df.crossJoin(F.broadcast(self._prior))
        for c in self.columns:
            stats = F.broadcast(self._stats[c].withColumnRenamed("_cat", c)
                                .withColumnRenamed("_te", f"_te_{c}"))
            out = (out.join(stats, on=c, how="left")
                   .withColumn(f"{c}{self.out_suffix}",
                               F.coalesce(F.col(f"_te_{c}"),
                                          F.col("prior_micros")))
                   .drop(f"_te_{c}"))
        return out.drop("prior_micros")

    def oracle_sql(self, fit_sql: str, apply_sql: str) -> str:
        """DuckDB twin: ``fit_sql`` yields the training rows (encoded cols
        + target), ``apply_sql`` the rows to encode (all its columns are
        passed through + the ``<col>_te`` outputs appended)."""
        m = self.m
        cats = []
        joins = []
        tes = []
        for c in self.columns:
            cats.append(
                f"s_{c} AS (SELECT {c} AS _cat, "
                f"(coalesce(sum(_t), 0) + {m} * (SELECT prior_micros FROM gp)) // (count(_t) + {m}) AS _te "
                f"FROM base GROUP BY 1)")
            joins.append(f"LEFT JOIN s_{c} ON s_{c}._cat = a.{c}")
            tes.append(
                f"coalesce(s_{c}._te, (SELECT prior_micros FROM gp)) AS {c}{self.out_suffix}")
        return f"""
WITH fit AS ({fit_sql}),
base AS (SELECT *, round({self.target_col} * {_M})::BIGINT AS _t FROM fit),
gp AS (SELECT sum(_t) // count(_t) AS prior_micros FROM base),
{",".join(cats)},
apply AS ({apply_sql})
SELECT a.*, {", ".join(tes)}
FROM apply a {" ".join(joins)}
"""
