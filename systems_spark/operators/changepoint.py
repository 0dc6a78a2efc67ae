"""Mean-shift change-point detection — exact CUSUM-style localization.

The first step of binary segmentation (Scott & Knott 1974; the same
statistic CUSUM monitors sequentially): for an ordered series
x_1..x_n, find the split i maximizing the between-segment mean gap

    shift(i) = | mean(x_1..x_i) − mean(x_{i+1}..x_n) |
             = | S_i·(n−i) − (S_n−S_i)·i | / (i·(n−i))

— the point where a level change most plausibly happened. The
monitoring companion of profile_drift: drift says two snapshots
differ, the change point says WHEN the series moved — source volume
drops, quality-score regressions, demand level shifts.

Exactness discipline: prefix sums are decimal(38,0)/HUGEINT-widened
integer sums, the score is quantized by one truncating integer
division per candidate split (``(N_i · 10⁶) DIV D_i`` — exact and
identical in both engines), and the argmax is a deterministic
(score desc, split asc) rank — no floating point anywhere.

100 TB shape: one per-group window pass (rank + prefix sum + total
share the group partitioning — many-small-groups regime), then a
per-group rank to pick the winner. Series should be PRE-AGGREGATED to
the monitoring grain (e.g. weekly sums) before calling — the scan is
O(series length) per group, which is exactly what a monitoring grain
bounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_M = 1_000_000


def mean_shift_point(df: DataFrame, group_cols: "list[str]",
                     order_cols: "list[str]", value_col: str) -> DataFrame:
    """(group..., n_points, split_idx, split_at, shift_micros): per
    group, the split AFTER position ``split_idx`` (1-based; prefix =
    the first split_idx points) with the maximal absolute prefix/suffix
    mean gap, in integer millionths of a value unit. ``split_at`` is
    the FIRST order column's value at the last prefix point.
    ``order_cols`` MUST form a total order per group (add a unique
    tiebreaker like an id column otherwise) — with ties the prefix
    sums, and therefore the chosen split, would depend on arbitrary
    rank assignment (review r6; the cusum_chart contract). Groups with
    fewer than 2 points have no valid split and are omitted; NULL
    order/value rows are excluded before ranking. Score ties break
    toward the earliest split."""
    pruned = df.select(*group_cols, *order_cols, value_col)         .where(F.col(value_col).isNotNull())
    for c in order_cols:
        pruned = pruned.where(F.col(c).isNotNull())
    wo = Window.partitionBy(*group_cols).orderBy(
        *[F.col(c).asc() for c in order_cols])
    wcum = wo.rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy(*group_cols)
    d = F.col(value_col).cast("decimal(38,0)")
    staged = (pruned
              .withColumn("_i", F.row_number().over(wo).cast("long"))
              .withColumn("_si", F.sum(d).over(wcum))
              .withColumn("_n", F.count(F.lit(1)).over(wall)
                          .cast("long"))
              .withColumn("_sn", F.sum(d).over(wall))
              .where(F.col("_i") < F.col("_n")))
    scored = (staged
              .withColumn("_num", F.expr(
                  "abs(_si * CAST(_n - _i AS DECIMAL(38,0))"
                  " - (_sn - _si) * CAST(_i AS DECIMAL(38,0)))"))
              .withColumn("_den", F.expr(
                  "CAST(_i AS DECIMAL(38,0))"
                  " * CAST(_n - _i AS DECIMAL(38,0))"))
              .withColumn("_shift", F.expr(
                  f"CAST((_num * {_M}) DIV _den AS BIGINT)")))
    wr = Window.partitionBy(*group_cols).orderBy(
        F.col("_shift").desc(), F.col("_i").asc())
    return (scored.withColumn("_r", F.row_number().over(wr))
            .where(F.col("_r") == 1)
            .select(*group_cols, F.col("_n").alias("n_points"),
                    F.col("_i").alias("split_idx"),
                    F.col(order_cols[0]).alias("split_at"),
                    F.col("_shift").alias("shift_micros")))


def mean_shift_point_sql(source_sql: str, group_names: "list[str]",
                         order_exprs: "list[str]", value_expr: str) -> str:
    """DuckDB twin of :func:`mean_shift_point` — ``group_names`` are
    plain identifiers selectable from ``source_sql``; ``order_exprs``
    must form a total order per group (same contract)."""
    gsel = "".join(g + ", " for g in group_names)
    part = ("PARTITION BY " + ", ".join(group_names)) if group_names \
        else ""
    oa = [f"_o{i}" for i in range(len(order_exprs))]
    osel_src = ", ".join(f"({e}) AS {a}"
                         for e, a in zip(order_exprs, oa))
    osel = ", ".join(oa)
    oby = ", ".join(f"{a} ASC" for a in oa)
    notnull = " AND ".join(f"({e}) IS NOT NULL" for e in order_exprs)
    return f"""
WITH src AS (
  SELECT {gsel}{osel_src}, ({value_expr})::HUGEINT AS _v
  FROM ({source_sql})
  WHERE {notnull} AND ({value_expr}) IS NOT NULL
),
staged AS (
  SELECT {gsel}{osel},
         row_number() OVER ({part} ORDER BY {oby}) AS _i,
         sum(_v) OVER ({part} ORDER BY {oby}
                       ROWS UNBOUNDED PRECEDING) AS _si,
         count(*) OVER ({part}) AS _n,
         sum(_v) OVER ({part}) AS _sn
  FROM src
),
scored AS (
  SELECT {gsel}{oa[0]}, _i, _n,
         ((abs(_si * (_n - _i)::HUGEINT - (_sn - _si) * _i::HUGEINT)
           * {_M}) // (_i::HUGEINT * (_n - _i)::HUGEINT))::BIGINT
           AS _shift
  FROM staged WHERE _i < _n
),
ranked AS (
  SELECT *, row_number() OVER ({part} ORDER BY _shift DESC, _i ASC)
           AS _r
  FROM scored
)
SELECT {gsel}_n::BIGINT AS n_points, _i::BIGINT AS split_idx,
       {oa[0]} AS split_at, _shift AS shift_micros
FROM ranked WHERE _r = 1
"""
