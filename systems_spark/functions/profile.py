"""One-pass table profiling: per-column row/null/distinct counts.

The operational primitive behind schema drift detection, join-key
cardinality checks, and Categorify sizing — and at 100 TB the constraint
is doing it in ONE scan. ``profile_table`` folds every column's counters
into a single aggregation: Spark plans the multi-column distinct counts
via one Expand + partial aggregation (one pass over the data, one
shuffle whose width is the sum of per-column distinct cardinalities, not
the row count), then the single result row unpivots to one row per
column. No per-column jobs, no driver loops.

Counts are exact (``count(distinct)``, not HLL): the profile is also the
oracle-checkable variant; swap ``approx_count_distinct`` in via
``exact=False`` when a ±2% answer is worth a narrower shuffle.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(df: DataFrame, columns: Sequence[str],
                  exact: bool = True) -> DataFrame:
    """One row per profiled column: (column, n_rows, n_null, n_distinct).

    ``n_distinct`` excludes NULL (SQL ``count(distinct col)`` semantics).
    ``exact=False`` switches to ``approx_count_distinct`` (HLL±~2%) —
    the right default above ~1B distinct values; the shape of the plan
    (one scan, one aggregation) is identical.
    """
    cols = list(columns)
    if not cols:
        raise ValueError("profile_table needs at least one column")
    distinct = (
        (lambda c: F.count_distinct(F.col(c))) if exact
        else (lambda c: F.approx_count_distinct(c))
    )
    aggs = [F.count(F.lit(1)).alias("_n_rows")]
    for c in cols:
        aggs.append(
            F.sum(F.col(c).isNull().cast("long")).alias(f"_null_{c}")
        )
        aggs.append(distinct(c).alias(f"_dist_{c}"))
    row = df.agg(*aggs)
    # unpivot the single result row: stack(...) is evaluated on ONE row,
    # so this adds no data movement
    stack_args = ", ".join(
        f"'{c}', _null_{c}, _dist_{c}" for c in cols
    )
    return row.selectExpr(
        f"stack({len(cols)}, {stack_args}) AS (column, n_null, n_distinct)",
        "_n_rows AS n_rows",
    ).select(
        "column",
        F.col("n_rows").cast("long"),
        F.col("n_null").cast("long"),
        F.col("n_distinct").cast("long"),
    )
