"""Exact time-weighted average (TWAP) over irregularly-sampled series.

A plain mean over-weights bursts: ten readings in one hot minute count
ten times, the quiet hour after them once. For state-like series
(price, queue depth, sensor level, feature value between updates) the
right average weights each sample by HOW LONG IT HELD:

    twap = Σ value_i · (ts_{i+1} − ts_i)  /  Σ (ts_{i+1} − ts_i)

— the piecewise-constant integral divided by the span. The classic
finance/IoT primitive, and the irregular-sampling companion of
trailing_features' row-count windows.

Shape: ONE lead-window pass per group (per-entity windows — the
many-small-groups safe regime used repo-wide) to get each sample's
holding duration, then one map-side-combined aggregation of
(Σ v·dur, Σ dur) per group. Products widen to decimal(38,0) /
HUGEINT; the final value is ONE truncating division, so the result is
exact integer arithmetic in the value's own unit and replays
bit-for-bit in the twin.

Semantics pinned (identically in both engines):
- the LAST sample of a group holds until ``end_ts_us`` when given
  (a query horizon), else it has no duration and drops out;
- duplicate timestamps: every tied sample except the LAST in tie
  order gets zero duration, and the last carries the hold to the next
  distinct timestamp — so WHICH value holds that interval depends on
  tie order. Pass ``order_cols`` (e.g. an event id) whenever ties are
  possible; without a tiebreaker, tied-ts groups are order-dependent
  (exactly like every window in this repo);
- rows with NULL ts or value are excluded up front;
- a group with zero total duration (single sample and no horizon, or
  all-tied timestamps) yields NULL via nullif;
- an ``end_ts_us`` EARLIER than a group's last sample produces a
  negative final duration, deliberately NOT clamped (greatest(0, ·)
  would silently hide a mis-set horizon) — filter samples to the
  horizon first; both engines mis-behave identically, so even misuse
  is oracle-consistent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def time_weighted_avg(df: DataFrame, group_cols: "list[str]",
                      ts_col: str, value_col: str,
                      end_ts_us: "int | None" = None,
                      order_cols: "list[str]" = ()) -> DataFrame:
    """(group..., n_samples, span_us, twap): exact time-weighted
    average of integer ``value_col`` over integer-µs ``ts_col`` within
    each group. ``end_ts_us`` extends the last sample to a horizon;
    ``order_cols`` break timestamp ties deterministically."""
    if not group_cols:
        raise ValueError("group_cols must be non-empty")
    s = (df.select(*group_cols, *order_cols, F.col(ts_col).alias("_ts"),
                   F.col(value_col).alias("_v"))
         .where(F.col(ts_col).isNotNull() & F.col(value_col).isNotNull()))
    w = Window.partitionBy(*group_cols).orderBy(
        F.col("_ts").asc(), *[F.col(c).asc() for c in order_cols])
    nxt = F.lead("_ts").over(w)
    if end_ts_us is not None:
        nxt = F.coalesce(nxt, F.lit(int(end_ts_us)).cast("long"))
    dur = (nxt - F.col("_ts"))
    return (s.withColumn("_dur", dur)
            .groupBy(*group_cols)
            .agg(F.count(F.lit(1)).cast("long").alias("n_samples"),
                 F.sum(F.col("_dur").cast("decimal(38,0)")).alias("_sd"),
                 F.sum(F.col("_v").cast("decimal(38,0)")
                       * F.col("_dur").cast("decimal(38,0)")).alias("_sv"))
            .select(*group_cols, "n_samples",
                    F.col("_sd").cast("long").alias("span_us"),
                    F.expr("CAST(_sv DIV (CASE WHEN _sd <> 0 THEN _sd END)"
                           " AS BIGINT)").alias("twap")))


def time_weighted_avg_sql(rows_sql: str, group_names: "list[str]",
                          ts_expr: str, value_expr: str,
                          end_ts_us: "int | None" = None,
                          order_names: "list[str]" = ()) -> str:
    """DuckDB twin of :func:`time_weighted_avg`."""
    if not group_names:
        raise ValueError("group_names must be non-empty")
    gsel = "".join(g + ", " for g in group_names)
    osel = "".join(o + ", " for o in order_names)
    part = ", ".join(group_names)
    order = "_ts ASC" + "".join(f", {o} ASC" for o in order_names)
    nxt = (f"lead(_ts) OVER (PARTITION BY {part} ORDER BY {order})")
    if end_ts_us is not None:
        nxt = f"coalesce({nxt}, {int(end_ts_us)})"
    gby = "GROUP BY " + ", ".join(str(i + 1)
                                  for i in range(len(group_names)))
    return f"""
WITH s AS (
  SELECT {gsel}{osel}({ts_expr})::BIGINT AS _ts,
         ({value_expr})::HUGEINT AS _v
  FROM ({rows_sql})
  WHERE ({ts_expr}) IS NOT NULL AND ({value_expr}) IS NOT NULL
),
d AS (
  SELECT {gsel}_v, ({nxt}) - _ts AS _dur FROM s
)
SELECT {gsel}count(*)::BIGINT AS n_samples,
       sum(_dur)::BIGINT AS span_us,
       (sum(_v * _dur::HUGEINT) // nullif(sum(_dur::HUGEINT), 0))::BIGINT
         AS twap
FROM d {gby}
"""
