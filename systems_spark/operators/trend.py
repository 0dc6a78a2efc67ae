"""Per-group OLS trend features — closed-form simple linear regression.

The feature-engineering companion of trailing_features: where a
trailing window answers "what was the recent level", the least-squares
slope answers "which way is it moving" — per-entity demand trends,
engagement decay, price drift. Closed form over sufficient statistics:

    slope     = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)
    intercept = (Σy·Σx² − Σx·Σxy) / (n·Σx² − (Σx)²)

so the whole fit is ONE map-side-combined aggregation per group — five
sums — no iteration, no matrix solve, no per-group state beyond five
numbers. That is the 100 TB shape: a million entity groups fit in a
single shuffle of five-column rows.

Exactness discipline: x and y are int64 (the repo's micros
convention); every product is widened to decimal(38,0) BEFORE summing
(Spark) / HUGEINT (DuckDB) so the sufficient statistics are exact, and
the final slope/intercept are emitted as integer MILLIONTHS via exact
integer division — `(num · 1,000,000) DIV den` — which truncates
toward zero identically in both engines (verified: Spark `DIV` and
DuckDB `//` both yield −3 for −7/2). No floating point anywhere.

Magnitude budget (documented, not silent): num·10⁶ must fit
decimal(38,0) — with |y| ≤ 10¹² (a million units in micros), |x| ≤ 10⁴
steps and 10⁸ rows per group, n·Σxy ≈ 10³² stays under 10³⁸ with the
10⁶ factor. Beyond that Spark's decimal overflow yields NULL (non-ANSI)
while DuckDB's HUGEINT raises — the same loud-ish boundary contract as
item_cf_recommend.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SCALE = 1_000_000


def ols_trend(df: DataFrame, x_col: str, y_col: str,
              group_cols: "list[str]") -> DataFrame:
    """(group..., n_points, sum_x, sum_y, slope_micros,
    intercept_micros): per-group least-squares line of integer ``y``
    over integer ``x``. slope/intercept are in millionths of a y-unit
    (per x-step / at x = 0). Rows where x or y is NULL are excluded;
    groups with a degenerate x (all equal, den = 0) emit NULL slope
    and intercept."""
    d = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    pruned = (df.select(*group_cols, x_col, y_col)
              .where(F.col(x_col).isNotNull() & F.col(y_col).isNotNull()))
    sums = pruned.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_points"),
        F.sum(d(x_col)).alias("_sx"),
        F.sum(d(y_col)).alias("_sy"),
        F.sum(d(x_col) * d(y_col)).alias("_sxy"),
        F.sum(d(x_col) * d(x_col)).alias("_sxx"))
    dec = "CAST(n_points AS DECIMAL(38,0))"
    withd = (sums
             .withColumn("_den", F.expr(f"{dec} * _sxx - _sx * _sx"))
             .withColumn("_numb", F.expr(f"{dec} * _sxy - _sx * _sy"))
             .withColumn("_numa", F.expr("_sy * _sxx - _sx * _sxy"))
             .withColumn("_sden",
                         F.expr("CASE WHEN _den <> 0 THEN _den END")))
    return withd.select(
        *group_cols, "n_points",
        F.col("_sx").cast("long").alias("sum_x"),
        F.col("_sy").cast("long").alias("sum_y"),
        F.expr(f"CAST((_numb * {_SCALE}) DIV _sden AS BIGINT)")
        .alias("slope_micros"),
        F.expr(f"CAST((_numa * {_SCALE}) DIV _sden AS BIGINT)")
        .alias("intercept_micros"))


def ols_trend_sql(source_sql: str, x_expr: str, y_expr: str,
                  group_names: "list[str]") -> str:
    """DuckDB twin of :func:`ols_trend` — ``group_names`` are plain
    identifiers selectable from ``source_sql``; an empty list fits one
    global line, like the Spark side's global aggregation."""
    gsel = "".join(g + ", " for g in group_names)
    gby = (("GROUP BY " + ", ".join(str(i + 1)
                                    for i in range(len(group_names))))
           if group_names else "")
    return f"""
WITH src AS (
  SELECT {gsel}({x_expr})::HUGEINT AS _x, ({y_expr})::HUGEINT AS _y
  FROM ({source_sql})
  WHERE ({x_expr}) IS NOT NULL AND ({y_expr}) IS NOT NULL
),
sums AS (
  SELECT {gsel}count(*)::HUGEINT AS n,
         sum(_x) AS sx, sum(_y) AS sy,
         sum(_x * _y) AS sxy, sum(_x * _x) AS sxx
  FROM src {gby}
)
SELECT {gsel}n::BIGINT AS n_points, sx::BIGINT AS sum_x,
       sy::BIGINT AS sum_y,
       ((n * sxy - sx * sy) * {_SCALE}
        // nullif(n * sxx - sx * sx, 0))::BIGINT AS slope_micros,
       ((sy * sxx - sx * sxy) * {_SCALE}
        // nullif(n * sxx - sx * sx, 0))::BIGINT AS intercept_micros
FROM sums
"""
