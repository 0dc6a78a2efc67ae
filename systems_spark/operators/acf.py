"""Exact lag-k autocorrelation (ACF) over integer series.

The time-series diagnostic next to demand_shift (WHERE did the level
move) and cusum_alerts (WHEN did it drift): the ACF says whether a
series is momentum-driven, mean-reverting, or periodic — a weekly
seasonality shows as a spike at lag 7, and the lag-1 coefficient is
the feature every forecasting baseline starts from.

Estimator: the standard biased ACF with the full-series mean and
variance,

    r(k) = Σ_t (x_t − x̄)(x_{t+k} − x̄) / Σ_t (x_t − x̄)²

computed EXACTLY by clearing denominators: with n = count and
S = Σx, each centered factor scales by n (n·x_t − S), the n² factors
cancel in the ratio, and everything is integer arithmetic —
decimal(38,0) products in Spark, HUGEINT in DuckDB, one truncating
division per lag (Spark DIV == DuckDB // toward zero, the trend.py
verified contract). r(k) is emitted in MICROS.

Gaps: the series is indexed by an integer grid column t; a pair
contributes to lag k only when both t and t+k exist, so a gap simply
drops its pairs in BOTH engines (no imputation). A lag with zero
pairs emits no row; a constant series (zero variance) emits NULL
coefficients.

100 TB shape: per-group stats and the denominator are two map-side-
combined aggregations; the pair stage is ONE equi-join of the series
against itself on (group, t + lag) after a sequence-explode of the
lag range — max_lag × n rows of longs, no window over a single
partition, no collect. Magnitude budget (loud, not silent): each
factor |n·x − S| ≲ n·|x| must keep products·10⁶ under 10³⁸ — at
n = 10⁸ rows per group and |x| ≤ 10¹² micros that bound holds with
room; past it Spark's non-ANSI decimal yields NULL while DuckDB
raises (the ols_trend boundary contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SCALE = 1_000_000


def acf(df: DataFrame, group_cols: "list[str]", t_col: str, x_col: str,
        max_lag: int) -> DataFrame:
    """(group..., lag, n_pairs, acf_micros) for lag 1..max_lag over the
    integer series (t_col, x_col) within each group (global when
    ``group_cols`` is empty). Rows with NULL t or x are excluded."""
    if max_lag < 1:
        raise ValueError("max_lag must be >= 1")
    d = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    s = (df.select(*group_cols, F.col(t_col).alias("_t"),
                   F.col(x_col).alias("_x"))
         .where(F.col(t_col).isNotNull() & F.col(x_col).isNotNull()))
    stats = s.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("_n"),
        F.sum(d("_x")).alias("_s"))

    def _attach(frame, small):
        # group-keyed join, or the bm25 1-row broadcast when global
        if group_cols:
            return frame.join(small, on=list(group_cols))
        return frame.crossJoin(F.broadcast(small))

    den = (_attach(s, stats)
           .select(*group_cols, F.expr("_n * _x - _s").alias("_dev"))
           .groupBy(*group_cols)
           .agg(F.sum(F.expr("_dev * _dev")).alias("_den")))

    a = (s.withColumn("_lag0", F.explode(F.expr(
            f"sequence(1, {int(max_lag)})")))
         .select(*group_cols, F.col("_lag0").cast("long").alias("lag"),
                 F.col("_t").alias("_ta"), F.col("_x").alias("_xa")))
    b = s.select(*[F.col(g).alias(f"_g_{g}") for g in group_cols],
                 F.col("_t").alias("_tb"), F.col("_x").alias("_xb"))
    cond = [F.col(f"_g_{g}") == F.col(g) for g in group_cols]
    cond.append(F.col("_tb") == F.col("_ta") + F.col("lag"))
    num = (_attach(a.join(b, on=cond), stats)
           .groupBy(*group_cols, "lag")
           .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"),
                F.sum(F.expr("(_n * _xa - _s) * (_n * _xb - _s)"))
                .alias("_num")))
    return (_attach(num, den)
            .select(*group_cols, "lag", "n_pairs",
                    F.expr(f"CAST((_num * {_SCALE}) DIV "
                           "(CASE WHEN _den <> 0 THEN _den END) AS BIGINT)")
                    .alias("acf_micros")))


def acf_sql(source_sql: str, group_names: "list[str]", t_expr: str,
            x_expr: str, max_lag: int) -> str:
    """DuckDB twin of :func:`acf` — same clearing-of-denominators
    arithmetic in HUGEINT, same truncating division."""
    if max_lag < 1:
        raise ValueError("max_lag must be >= 1")
    g = group_names
    gsel = "".join(f"{c}, " for c in g)
    gby = ("GROUP BY " + ", ".join(str(i + 1) for i in range(len(g)))
           ) if g else ""
    srcsel = "".join(f"src.{c}, " for c in g)
    asel = "".join(f"a.{c}, " for c in g)
    psel = "".join(f"p.{c}, " for c in g)
    pair_gby = "GROUP BY " + "".join(f"a.{c}, " for c in g) + "l.lag"
    on_ab = "".join(f"b.{c} = a.{c} AND " for c in g)
    st_a = ("JOIN stats st ON " + " AND ".join(f"st.{c} = a.{c}" for c in g)
            ) if g else "CROSS JOIN stats st"
    st_src = ("JOIN stats st ON "
              + " AND ".join(f"st.{c} = src.{c}" for c in g)
              ) if g else "CROSS JOIN stats st"
    dn_p = ("JOIN den dn ON " + " AND ".join(f"dn.{c} = p.{c}" for c in g)
            ) if g else "CROSS JOIN den dn"
    return f"""
WITH src AS MATERIALIZED (
  SELECT {gsel}({t_expr})::BIGINT AS _t, ({x_expr})::HUGEINT AS _x
  FROM ({source_sql})
  WHERE ({t_expr}) IS NOT NULL AND ({x_expr}) IS NOT NULL
),
stats AS MATERIALIZED (
  SELECT {gsel}count(*)::HUGEINT AS _n, sum(_x) AS _s
  FROM src {gby}
),
den AS (
  SELECT {srcsel}sum((st._n * src._x - st._s) * (st._n * src._x - st._s))
           AS _den
  FROM src {st_src}
  {gby}
),
lags AS (SELECT unnest(range(1, {int(max_lag)} + 1))::BIGINT AS lag),
pairs AS (
  SELECT {asel}l.lag, count(*)::BIGINT AS n_pairs,
         sum((st._n * a._x - st._s) * (st._n * b._x - st._s)) AS _num
  FROM src a
  CROSS JOIN lags l
  JOIN src b ON {on_ab}b._t = a._t + l.lag
  {st_a}
  {pair_gby}
)
SELECT {psel}p.lag, p.n_pairs,
       ((p._num * {_SCALE}) // nullif(dn._den, 0))::BIGINT AS acf_micros
FROM pairs p {dn_p}
"""
