"""SCD Type-2 interval build — change-log → versioned validity history.

The canonical warehouse transform (Kimball's slowly-changing-dimension
type 2): given an append-only change log of (entity, observed state)
rows, collapse consecutive observations of the SAME state into one
version and emit validity intervals

    (entity, version, state, valid_from, valid_to, n_events)

where ``valid_to`` is the next version's ``valid_from`` (NULL = the
current open version). The reference's feature-store read path
(reference: merlin/systems/dag/ops/feast.py — point-in-time feature
retrieval) consumes exactly this shape; the as-of join
(operators/asof.py) is its query-side twin, and this operator is the
build side.

Determinism contract: observation order is the lexicographic
(order column(s), tiebreaker id) total order; a change point is
``state <> lag(state)`` (NULL-safe: the first observation always opens
version 1), and the version number is the running count of change
points — every step is a per-entity window over a total order, so both
engines agree bit-for-bit.

100 TB shape: two per-entity window passes (lag + running sum) and one
(entity, version) aggregation, all sharing the entity-hash
partitioning — many small groups, no single-task stage, and the only
shuffled payload is (entity, ts, state). The ``valid_to`` lead runs on
the AGGREGATED version table (≤ one row per version), not on raw
events.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_intervals(df: DataFrame, key_cols: Sequence[str], state_col: str,
                   ts_col: str, id_col: str,
                   current_flag: bool = True) -> DataFrame:
    """One row per (entity, version): ``valid_from`` = first observation
    of a run of equal states, ``valid_to`` = next run's start (NULL for
    the open version), ``n_events`` = observations inside the run."""
    keys = list(key_cols)
    if not keys:
        raise ValueError("scd2_intervals needs at least one key column")

    w = Window.partitionBy(*keys).orderBy(ts_col, id_col)
    # NULL-safe change test (eqNullSafe / IS DISTINCT FROM): a NULL
    # state is a real observed state — NULL→'A', 'A'→NULL open new
    # versions, NULL→NULL does not (review: the plain <> comparison
    # silently folded NULL observations into the preceding run). The
    # first observation needs its own marker: lag(state) IS NULL cannot
    # distinguish "no previous row" from "previous state was NULL", so
    # first-row detection lags a constant instead.
    first = F.lag(F.lit(1)).over(w).isNull()
    chg = (first
           | ~F.col(state_col).eqNullSafe(F.lag(state_col).over(w))) \
        .cast("int")
    versioned = df.select(*keys, state_col, ts_col, id_col) \
        .withColumn("_chg", chg) \
        .withColumn("version", F.sum("_chg").over(
            w.rowsBetween(Window.unboundedPreceding, 0)).cast("long"))
    runs = versioned.groupBy(*keys, "version").agg(
        # state is constant within a run by construction; min = that state
        F.min(state_col).alias("state"),
        F.min(ts_col).alias("valid_from"),
        F.count(F.lit(1)).alias("n_events"))
    wv = Window.partitionBy(*keys).orderBy("version")
    out = runs.withColumn("valid_to", F.lead("valid_from").over(wv))
    cols = [*keys, "version", "state", "valid_from", "valid_to", "n_events"]
    if current_flag:
        out = out.withColumn(
            "is_current", F.col("valid_to").isNull().cast("long"))
        cols.append("is_current")
    return out.select(*cols)


def scd2_intervals_sql(source_sql: str, key_exprs: Sequence[str],
                       state_expr: str, ts_expr: str, id_expr: str,
                       current_flag: bool = True) -> str:
    """DuckDB twin of :func:`scd2_intervals`. ``key_exprs`` are plain
    column names in ``source_sql``'s output."""
    if not list(key_exprs):
        raise ValueError("scd2_intervals_sql needs at least one key column")
    keys = ", ".join(key_exprs)
    cur = ",\n       (valid_to IS NULL)::BIGINT AS is_current" \
        if current_flag else ""
    return f"""
WITH obs AS (
  SELECT {keys}, {state_expr} AS state, {ts_expr} AS ts, {id_expr} AS id
  FROM ({source_sql})
),
versioned AS (
  SELECT {keys}, state, ts,
         sum(CASE WHEN first_mark IS NULL
                    OR state IS DISTINCT FROM prev
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY {keys} ORDER BY ts, id
                 ROWS UNBOUNDED PRECEDING)::BIGINT AS version
  FROM (SELECT *,
               lag(state) OVER (PARTITION BY {keys} ORDER BY ts, id)
                 AS prev,
               lag(1) OVER (PARTITION BY {keys} ORDER BY ts, id)
                 AS first_mark
        FROM obs)
),
runs AS (
  SELECT {keys}, version, min(state) AS state,
         min(ts) AS valid_from, count(*)::BIGINT AS n_events
  FROM versioned GROUP BY {keys}, version
)
SELECT {keys}, version, state, valid_from,
       lead(valid_from) OVER (PARTITION BY {keys} ORDER BY version)
         AS valid_to,
       n_events{cur}
FROM runs
"""
