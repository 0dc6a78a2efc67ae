"""Kaplan–Meier / Nelson–Aalen survival tables over censored durations.

The censoring-aware extension of plain retention curves (the
``user_retention`` lane counts who came back; survival analysis answers
*how long until the event*, using subjects who haven't had it yet —
right-censored rows — correctly instead of dropping them): churn time,
time-to-second-order, session lifetime, hardware failure.

Kaplan–Meier (JASA 1958) at each distinct event time t:
    n_t = subjects still at risk (duration ≥ t)
    d_t = events at exactly t
    per-step survival factor 1 − d_t/n_t;  S(t) = Π_{s≤t} (1 − d_s/n_s)
Nelson–Aalen cumulative hazard: H(t) = Σ_{s≤t} d_s/n_s.

Exactness discipline: the table is emitted in INTEGER MICROS —
``survival_factor_micros = (n−d)·1e6 div n`` and the cumulative hazard
as the running SUM of integer-div terms — every column replays
bit-for-bit in SQL. The continuous S(t) (a running float PRODUCT) is
deliberately NOT emitted: cross-engine float-product parity depends on
reduction order guarantees neither engine documents; compute it
downstream from the exact factors when a plot needs it.

Scale shape: one (group, t) aggregation (map-side combined: events +
total exits per time), then ONE ordered window per group over the
DISTINCT-TIME table — window rows = distinct durations per group, not
subjects, so a billion-subject cohort with second-resolution durations
windows over ≤86400·days rows. At-risk counts come from the
total-minus-running-exits identity: no per-subject self-join, subjects
never shuffle twice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_M = 1_000_000


def kaplan_meier(df: DataFrame, duration_col: str, event_col: str,
                 group_cols=None) -> DataFrame:
    """KM/NA table: one row per (group…, time) where ≥1 subject exits —
    by event OR censoring (censored-only times carry d=0 rows so at-risk
    accounting is visible and exact): (time, at_risk, events, censored,
    survival_factor_micros, cum_hazard_micros). ``event_col`` is 1 for
    an observed event, 0 for right-censored at ``duration_col``."""
    group_cols = [] if group_cols is None else (
        [group_cols] if isinstance(group_cols, str) else list(group_cols))
    ev = F.col(event_col).cast("long")
    per_t = (df.groupBy(*group_cols,
                        F.col(duration_col).cast("long").alias("time"))
             .agg(F.sum(ev).alias("events"),
                  F.sum(1 - ev).alias("censored"),
                  F.count(F.lit(1)).alias("_exits")))
    w = (Window.partitionBy(*group_cols) if group_cols
         else Window.partitionBy(F.lit(1)))
    w_ord = w.orderBy("time")
    # at-risk at t = total − exits strictly before t (standard KM: a
    # subject censored AT t is still at risk for events at t)
    prior = F.coalesce(
        F.sum("_exits").over(
            w_ord.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0).cast("long"))
    out = (per_t
           .withColumn("at_risk",
                       F.sum("_exits").over(w).cast("long") - prior)
           .withColumn(
               "survival_factor_micros",
               F.expr(f"CAST((at_risk - events) * {_M} DIV at_risk"
                      " AS BIGINT)"))
           .withColumn(
               "cum_hazard_micros",
               F.sum(F.expr(f"CAST(events * {_M} DIV at_risk AS BIGINT)"))
               .over(w_ord.rowsBetween(Window.unboundedPreceding, 0))
               .cast("long")))
    return out.select(*group_cols, "time",
                      F.col("at_risk").cast("long").alias("at_risk"),
                      F.col("events").cast("long").alias("events"),
                      F.col("censored").cast("long").alias("censored"),
                      "survival_factor_micros", "cum_hazard_micros")


def kaplan_meier_sql(source_sql: str, duration_expr: str, event_expr: str,
                     group_cols=None) -> str:
    """DuckDB twin of :func:`kaplan_meier` — same per-time aggregation,
    same total-minus-running-exits at-risk identity, same integer
    micros."""
    group_cols = [] if group_cols is None else (
        [group_cols] if isinstance(group_cols, str) else list(group_cols))
    gsel = "".join(f"{c}, " for c in group_cols)
    part = ("PARTITION BY " + ", ".join(group_cols)) if group_cols else ""
    return f"""
WITH per_t AS (
  SELECT {gsel}({duration_expr})::BIGINT AS time,
         sum(({event_expr})::BIGINT) AS events,
         sum(1 - ({event_expr})::BIGINT) AS censored,
         count(*) AS _exits
  FROM ({source_sql})
  GROUP BY {gsel}({duration_expr})::BIGINT
), risk AS (
  SELECT *,
         (sum(_exits) OVER ({part})
          - coalesce(sum(_exits) OVER ({part} ORDER BY time
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         )::BIGINT AS at_risk
  FROM per_t
)
SELECT {gsel}time, at_risk, events::BIGINT AS events,
       censored::BIGINT AS censored,
       ((at_risk - events) * {_M} // at_risk)::BIGINT
         AS survival_factor_micros,
       (sum((events * {_M} // at_risk)) OVER ({part} ORDER BY time
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT
         AS cum_hazard_micros
FROM risk
"""
