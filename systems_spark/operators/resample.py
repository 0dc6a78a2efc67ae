"""Time-grid resampling with forward fill — the point-in-time feature
matrix builder.

Training pipelines need entity features AT REGULAR TIMESTAMPS (one row
per (entity, grid tick) for windowed models, staleness-aware serving
parity, gap-free sequence inputs), while raw events land at irregular
times. ``resample_ffill`` produces, per key, the regular grid spanning
that key's own observation range and carries the LAST observation at or
before each tick forward — optionally nulled out past a staleness bound
(the feature-store TTL semantic; compare FeatureTable.as_of in
sources/, which answers ONE timestamp — this materializes the whole
grid).

Shape, one narrow shuffle end-to-end: per-key spans come from a
map-side-combined min/max agg; each key EXPLODES its own grid (span ÷
step rows — bounded by the key's activity window, not the global one);
grid ticks union with the raw observations and a single per-key
ordered window forward-fills with ``last(..., ignorenulls=True)`` —
observations sort BEFORE the tick at equal timestamps, so a reading
exactly on the grid is picked up by its own tick. Values are COPIED,
never recomputed, so doubles survive bit-exactly into the SQL twin.

Determinism: ties among equal-timestamp observations of one key are
broken by ``tiebreak_cols`` (required when duplicates are possible —
"last write wins" is undefined without an order).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["resample_ffill", "resample_ffill_sql"]


def resample_ffill(df: DataFrame, key_cols, ts_col: str, value_cols,
                   step: int, tiebreak_cols=(),
                   max_staleness: "int | None" = None) -> DataFrame:
    """(key…, grid_ts, value…, last_obs_ts) — one row per key per grid
    tick (tick = ⌊ts/step⌋·step over the key's own [min, max] span),
    values forward-filled from the latest observation with ts ≤ tick;
    ``last_obs_ts`` says how stale the carried value is, and with
    ``max_staleness`` set, values older than the bound become NULL
    (the gap is real — surface it, don't fabricate freshness).
    ``ts_col`` must be an integral epoch column (any unit; ``step`` and
    ``max_staleness`` share it); rows with a NULL ``ts_col`` are
    dropped — an observation without a time can't be placed on a
    grid."""
    key_cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    value_cols = [value_cols] if isinstance(value_cols, str) \
        else list(value_cols)
    tiebreak_cols = list(tiebreak_cols)
    if step < 1:
        raise ValueError("step must be >= 1")
    if max_staleness is not None and max_staleness < 0:
        raise ValueError("max_staleness must be >= 0")
    # a NULL timestamp is an unplaceable observation: it would sort first
    # in the per-key window (nulls first) and forward-fill its values
    # into every tick while being invisible to the span min/max —
    # fabricated freshness, exactly what this module refuses to do
    df = df.where(F.col(ts_col).isNotNull())

    # integer DIV, never double division: int64 epochs past 2^53 would
    # lose precision through a float detour (ts must be non-negative —
    # DIV and DuckDB // both truncate toward zero)
    tick = lambda c: F.expr(f"(({c}) div {step}) * {step}").cast("long")
    grid = (df.groupBy(*key_cols)
            .agg(F.min(ts_col).alias("_lo"), F.max(ts_col).alias("_hi"))
            .select(*key_cols,
                    F.explode(F.sequence(
                        tick("_lo"), tick("_hi"),
                        F.lit(step).cast("long"))).alias("grid_ts"))
            .withColumn("_is_grid", F.lit(1)))
    obs = (df.select(*key_cols, F.col(ts_col).cast("long").alias("grid_ts"),
                     *value_cols, *[c for c in tiebreak_cols
                                    if c not in value_cols])
           .withColumn("_is_grid", F.lit(0)))
    g = grid
    for c in obs.columns:
        if c not in g.columns:
            g = g.withColumn(c, F.lit(None))
    u = obs.unionByName(g.select(*obs.columns))

    w = (Window.partitionBy(*key_cols)
         .orderBy("grid_ts", "_is_grid",
                  *[F.col(c).asc_nulls_first() for c in tiebreak_cols])
         .rowsBetween(Window.unboundedPreceding, 0))
    filled = u.select(
        *key_cols, "grid_ts", "_is_grid",
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in value_cols],
        F.last(F.when(F.col("_is_grid") == 0, F.col("grid_ts")),
               ignorenulls=True).over(w).alias("last_obs_ts"))
    out = filled.where(F.col("_is_grid") == 1).drop("_is_grid")
    if max_staleness is not None:
        fresh = (F.col("grid_ts") - F.col("last_obs_ts")) <= max_staleness
        out = out.select(
            *key_cols, "grid_ts",
            *[F.when(fresh, F.col(c)).alias(c) for c in value_cols],
            F.when(fresh, F.col("last_obs_ts")).alias("last_obs_ts"))
    return out


def resample_ffill_sql(source_sql: str, key_cols, ts_expr: str, value_cols,
                       step: int, tiebreak_cols=(),
                       max_staleness: "int | None" = None) -> str:
    """DuckDB twin — the same union + IGNORE NULLS window construction
    (values are copied, so even doubles hash-match)."""
    key_cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    value_cols = [value_cols] if isinstance(value_cols, str) \
        else list(value_cols)
    tiebreak_cols = list(tiebreak_cols)
    keys = ", ".join(key_cols)
    extra_tb = [c for c in tiebreak_cols if c not in value_cols]
    vals = ", ".join(value_cols + extra_tb)
    null_vals = ", ".join(f"NULL AS {c}" for c in value_cols + extra_tb)
    order_tb = "".join(f", {c} ASC NULLS FIRST" for c in tiebreak_cols)
    filled = ", ".join(
        f"last_value({c} IGNORE NULLS) OVER w AS {c}" for c in value_cols)
    if max_staleness is None:
        stale_sel = f"{keys}, grid_ts, {vals}, last_obs_ts"
    else:
        guarded = ", ".join(
            f"CASE WHEN grid_ts - last_obs_ts <= {int(max_staleness)} "
            f"THEN {c} END AS {c}" for c in value_cols)
        stale_sel = (f"{keys}, grid_ts, {guarded}, "
                     f"CASE WHEN grid_ts - last_obs_ts <= "
                     f"{int(max_staleness)} THEN last_obs_ts END "
                     f"AS last_obs_ts")
    return f"""
WITH src AS (SELECT {keys}, {ts_expr} AS _ts, {vals} FROM ({source_sql})
             WHERE {ts_expr} IS NOT NULL),
grid AS (
  SELECT {keys},
         unnest(range((min(_ts) // {step}) * {step},
                      (max(_ts) // {step}) * {step} + 1,
                      {step}::BIGINT)) AS grid_ts,
         1 AS _is_grid
  FROM src GROUP BY {keys}
),
u AS (
  SELECT {keys}, _ts AS grid_ts, {vals}, 0 AS _is_grid FROM src
  UNION ALL
  SELECT {keys}, grid_ts, {null_vals}, _is_grid FROM grid
),
filled AS (
  SELECT {keys}, grid_ts, _is_grid, {filled},
         last_value(CASE WHEN _is_grid = 0 THEN grid_ts END IGNORE NULLS)
           OVER w AS last_obs_ts
  FROM u
  WINDOW w AS (PARTITION BY {keys}
               ORDER BY grid_ts, _is_grid{order_tb}
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT {stale_sel} FROM filled WHERE _is_grid = 1
"""
