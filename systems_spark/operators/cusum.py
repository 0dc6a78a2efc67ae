"""CUSUM monitoring — sequential level-shift detection, exact integers.

Page, "Continuous inspection schemes" (Biometrika 1954). The SEQUENTIAL
companion of the retrospective mean-shift locator
(operators/changepoint.py): two one-sided cumulative sums accumulate
deviations beyond a slack band around a target level,

    S⁺_n = max(0, S⁺_{n−1} + (x_n − target − slack))
    S⁻_n = max(0, S⁻_{n−1} + (target − slack − x_n))

and a statistic exceeding the decision interval ``h`` signals a
sustained up/down shift — the classic quality-control chart, here for
pipeline monitoring (source volume collapse, score drift, demand
surge).

The recursion is window-expressible via the running-minimum identity
``max(0, prev + d)  ≡  C_n − min(0, min_{j≤n} C_j)`` with C the plain
prefix sum of d — so the BATCH operator is one window pass (cumsum +
running min per side, sharing one per-group sort) and the whole chart
replays bit-for-bit in DuckDB. No auto-reset after an alert (resets
make the recursion depend on its own output and kill window form);
consumers wanting first-crossing-only dedupe on the emitted flags.
The STREAMING twin (streaming/stateful.py StreamingCusum) carries
(S⁺, S⁻) per key and is bit-equal to the batch chart on any in-order
replay — CUSUM state is forward-only, so unlike the funnel machine,
MULTI-batch in-order drains are exactly comparable.

All arithmetic is int64 micros (document the budget: |deviation| ≤
10¹² per point over 10⁶ points per key stays far from wrap).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _check_cusum(slack_micros: int, h_micros: int) -> None:
    if slack_micros < 0:
        raise ValueError("slack_micros must be >= 0")
    if h_micros <= 0:
        raise ValueError("h_micros must be > 0")


def cusum_chart(df: DataFrame, group_cols: "list[str]", order_cols:
                "list[str]", value_col: str, target_micros: int,
                slack_micros: int = 0,
                h_micros: int = 1) -> DataFrame:
    """(group..., order..., value, s_pos_micros, s_neg_micros,
    alert_up, alert_down): the full two-sided CUSUM chart of integer
    ``value_col`` (micros) per group, ordered by ``order_cols`` (must
    form a total order per group for determinism). NULL values are
    excluded; alert flags are 0/1 longs marking statistic > h."""
    _check_cusum(slack_micros, h_micros)
    wo = Window.partitionBy(*group_cols).orderBy(
        *[F.col(c).asc() for c in order_cols])
    wcum = wo.rowsBetween(Window.unboundedPreceding, 0)
    pruned = df.select(*group_cols, *order_cols, value_col) \
        .where(F.col(value_col).isNotNull())
    d_pos = F.col(value_col) - F.lit(target_micros + slack_micros)
    d_neg = F.lit(target_micros - slack_micros) - F.col(value_col)
    staged = (pruned
              .withColumn("_cp", F.sum(d_pos).over(wcum))
              .withColumn("_cn", F.sum(d_neg).over(wcum))
              .withColumn("_mp", F.min(F.least(F.lit(0).cast("long"),
                                               F.col("_cp"))).over(wcum))
              .withColumn("_mn", F.min(F.least(F.lit(0).cast("long"),
                                               F.col("_cn"))).over(wcum)))
    s_pos = (F.col("_cp") - F.col("_mp")).alias("s_pos_micros")
    s_neg = (F.col("_cn") - F.col("_mn")).alias("s_neg_micros")
    return staged.select(
        *group_cols, *order_cols, value_col, s_pos, s_neg
    ).withColumn("alert_up",
                 (F.col("s_pos_micros") > h_micros).cast("long")) \
     .withColumn("alert_down",
                 (F.col("s_neg_micros") > h_micros).cast("long"))


def cusum_chart_sql(source_sql: str, group_names: "list[str]",
                    order_names: "list[str]", value_name: str,
                    target_micros: int, slack_micros: int = 0,
                    h_micros: int = 1) -> str:
    """DuckDB twin of :func:`cusum_chart` — all names plain
    identifiers selectable from ``source_sql``."""
    _check_cusum(slack_micros, h_micros)
    gsel = "".join(g + ", " for g in group_names)
    osel = ", ".join(order_names)
    part = ("PARTITION BY " + ", ".join(group_names)) if group_names \
        else ""
    frame = (f"OVER ({part} ORDER BY {osel}"
             f" ROWS UNBOUNDED PRECEDING)")
    return f"""
WITH src AS (
  SELECT {gsel}{osel}, {value_name}
  FROM ({source_sql}) WHERE {value_name} IS NOT NULL
),
staged AS (
  SELECT {gsel}{osel}, {value_name},
         sum({value_name} - {target_micros + slack_micros}) {frame}
           AS _cp,
         sum({target_micros - slack_micros} - {value_name}) {frame}
           AS _cn
  FROM src
),
mins AS (
  SELECT *, min(least(0, _cp)) {frame} AS _mp,
            min(least(0, _cn)) {frame} AS _mn
  FROM staged
)
SELECT {gsel}{osel}, {value_name},
       (_cp - _mp)::BIGINT AS s_pos_micros,
       (_cn - _mn)::BIGINT AS s_neg_micros,
       ((_cp - _mp) > {h_micros})::BIGINT AS alert_up,
       ((_cn - _mn) > {h_micros})::BIGINT AS alert_down
FROM mins
"""
