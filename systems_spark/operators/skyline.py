"""2-D Pareto skyline (preference query) — distributed staircase.

"Best trade-offs" queries — cheapest part for its size, fastest route
for its cost — return the PARETO FRONT: rows no other row strictly
dominates (at least as good on both dimensions, strictly better on
one). Börzsönyi et al. (ICDE 2001) introduced SKYLINE as a relational
operator; Spark has no native equivalent, so this is genuinely new
surface, built scale-first.

Algorithm — per-x reduction + two-level prefix max
--------------------------------------------------
For the canonical orientation (minimize x, maximize y) a row survives
iff   y  >  M(x)  :=  max{ y' : x' < x }      (staircase test)
and   y  =  max{ y' : x' = x }                (same-x test),
duplicates of a frontier point all survive (no STRICT dominator).

The insight that makes it distribute: M(x) only needs the PER-X
maxima, so the corpus first reduces to one row per distinct x (one
map-side-combined aggregation — the only pass over the full data
besides the final filter-join). The strict-prefix max over that
reduced, x-sorted table is computed WITHOUT a global-sort window:
range-bucket by x (deterministic Greenwald–Khanna boundaries, no RNG),
within-bucket strict-prefix max via a window partitioned by bucket
(bounded rows per bucket), and an exclusive cross-bucket max from the
B-row bucket-maxima table joined on bucket < bucket — a broadcast
nested-loop over B² ≤ 4096 cells, scale-independent. No
Exchange SinglePartition anywhere; no driver collect of data rows.

Orientation flags negate the respective column (exact for int64 away
from LONG_MIN); ties and NULLs: rows with NULL in either dimension are
excluded up front in both engines (a NULL preference is not
comparable).

The DuckDB twin is the textbook NOT EXISTS strict-dominance scan —
deliberately brute force, so the oracle grades the pruned plan against
ground truth (the dedup_editdist losslessness pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_NEG_INF = -(1 << 62)


def skyline2d(df: DataFrame, x_col: str, y_col: str,
              x_min: bool = True, y_max: bool = True,
              n_buckets: int = 64) -> DataFrame:
    """Rows of ``df`` on the 2-D Pareto front. Orientation:
    ``x_min=True`` prefers smaller x (else larger), ``y_max=True``
    prefers larger y (else smaller). Duplicate frontier points all
    survive; NULL x or y rows are dropped."""
    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")
    base = df.where(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
    xx = F.col(x_col) if x_min else -F.col(x_col)
    yy = F.col(y_col) if y_max else -F.col(y_col)
    gx = (base.select(xx.cast("long").alias("_x"),
                      yy.cast("long").alias("_y"))
          .groupBy("_x").agg(F.max("_y").alias("_my")))
    bounds = gx.stat.approxQuantile(
        "_x", [i / n_buckets for i in range(1, n_buckets)],
        1.0 / (2 * n_buckets))
    uniq = []
    for b in bounds:
        if b is not None and (not uniq or b > uniq[-1]):
            uniq.append(b)
    if uniq:
        arr = F.array(*[F.lit(int(b)).cast("long") for b in uniq])
        bkt = F.size(F.filter(arr, lambda b: F.col("_x") >= b))
    else:
        bkt = F.lit(0)
    from systems_spark.functions.fence import fence_columns

    gxb = fence_columns(gx, _bkt=bkt)
    w = (Window.partitionBy("_bkt").orderBy(F.col("_x").asc())
         .rowsBetween(Window.unboundedPreceding, -1))
    local = gxb.withColumn("_pre_local", F.max("_my").over(w))
    bm = gxb.groupBy("_bkt").agg(F.max("_my").alias("_bmax"))
    pre_b = (bm.alias("lo").join(
        bm.alias("hi"),
        F.col("lo._bkt") < F.col("hi._bkt"), "inner")
        .groupBy(F.col("hi._bkt").alias("_bkt"))
        .agg(F.max(F.col("lo._bmax")).alias("_pre_bucket")))
    staircase = (local.join(F.broadcast(pre_b), on="_bkt", how="left")
                 .select("_x", "_my",
                         F.greatest(
                             F.coalesce(F.col("_pre_local"),
                                        F.lit(_NEG_INF)),
                             F.coalesce(F.col("_pre_bucket"),
                                        F.lit(_NEG_INF))).alias("_m")))
    return (base.join(staircase,
                      (xx.cast("long") == F.col("_x"))
                      & (yy.cast("long") > F.col("_m"))
                      & (yy.cast("long") == F.col("_my")))
            .drop("_x", "_my", "_m"))


def skyline2d_sql(rows_sql: str, x_col: str, y_col: str,
                  x_min: bool = True, y_max: bool = True) -> str:
    """Brute-force strict-dominance twin (NOT EXISTS) — ground truth
    for grading the pruned Spark plan."""
    xo = "<" if x_min else ">"
    yo = ">" if y_max else "<"
    return f"""
WITH t AS MATERIALIZED (
  SELECT * FROM ({rows_sql})
  WHERE {x_col} IS NOT NULL AND {y_col} IS NOT NULL
)
SELECT * FROM t
WHERE NOT EXISTS (
  SELECT 1 FROM t o
  WHERE (o.{x_col} {xo} t.{x_col} OR o.{x_col} = t.{x_col})
    AND (o.{y_col} {yo} t.{y_col} OR o.{y_col} = t.{y_col})
    AND (o.{x_col} {xo} t.{x_col} OR o.{y_col} {yo} t.{y_col})
)
"""
