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


def profile_diff(old: DataFrame, new: DataFrame,
                 null_ratio_threshold: float = 0.01,
                 distinct_ratio_threshold: float = 0.10) -> DataFrame:
    """Drift report between two ``profile_table`` outputs (yesterday's
    partition vs today's): per column, the old/new counts, the null-ratio
    delta, the distinct-cardinality ratio, and a ``drifted`` flag when
    either moves past its threshold — the cheap gate that catches a
    broken upstream join (nulls spike) or an id-space change (cardinality
    jump) before a 100 TB training run consumes the data.

    Columns present in only one profile appear with the other side's
    counts null and ``drifted = true`` (schema drift IS drift). Both
    inputs are tiny (one row per column), so the join is trivial."""
    o = old.select(F.col("column"),
                   F.col("n_rows").alias("old_rows"),
                   F.col("n_null").alias("old_null"),
                   F.col("n_distinct").alias("old_distinct"))
    n = new.select(F.col("column"),
                   F.col("n_rows").alias("new_rows"),
                   F.col("n_null").alias("new_null"),
                   F.col("n_distinct").alias("new_distinct"))
    j = o.join(n, on="column", how="full")
    null_ratio = lambda nl, nr: (F.col(nl) / F.greatest(F.col(nr), F.lit(1)))  # noqa: E731
    d_null = null_ratio("new_null", "new_rows") - null_ratio("old_null", "old_rows")
    r_dist = F.col("new_distinct") / F.greatest(F.col("old_distinct"), F.lit(1))
    missing = F.col("old_rows").isNull() | F.col("new_rows").isNull()
    return j.select(
        "column", "old_rows", "new_rows", "old_null", "new_null",
        "old_distinct", "new_distinct",
        F.round(d_null, 6).alias("null_ratio_delta"),
        F.round(r_dist, 6).alias("distinct_ratio"),
        (missing
         | (F.abs(d_null) > null_ratio_threshold)
         | (F.abs(r_dist - 1.0) > distinct_ratio_threshold)
         ).alias("drifted"),
    )


def skew_report(df: DataFrame, col: str, top_n: int = 10) -> DataFrame:
    """Hot-key diagnosis for a join/groupBy key: the ``top_n`` heaviest
    values with their row counts, share of the table, and the ratio to a
    perfectly uniform key (share × distinct-count). Ratios ≫ 1 mean the
    shuffle partition holding that key does that many times the average
    task's work — the number that decides between plain shuffle, AQE
    skew-split, and explicit salting (``plans.salted_join``).

    Lazy, one plan: the totals ride a broadcast crossJoin of the same
    key aggregation, so Catalyst reuses the aggregation exchange
    (ReusedExchange) instead of scanning the table twice — and nothing
    executes until the caller does. NULL keys are reported as a row
    (NULL joins nothing but still lands in one partition of an
    aggregation)."""
    counts = df.groupBy(F.col(col).alias("value")).agg(
        F.count(F.lit(1)).alias("n"))
    stats = counts.agg(F.sum("n").alias("_t"),
                       F.count(F.lit(1)).alias("_d"))
    return (
        counts.orderBy(F.col("n").desc(), F.col("value").asc()).limit(top_n)
        .crossJoin(F.broadcast(stats))
        # re-sort: the join does not preserve the pre-limit order
        .orderBy(F.col("n").desc(), F.col("value").asc())
        .select(
            "value", "n",
            F.round(F.col("n") / F.greatest(F.col("_t"), F.lit(1)), 6)
            .alias("share"),
            F.round(F.col("n") * F.greatest(F.col("_d"), F.lit(1))
                    / F.greatest(F.col("_t"), F.lit(1)), 2)
            .alias("x_uniform"),
        )
    )


def psi_drift(old: DataFrame, new: DataFrame, value_col: str,
              n_bins: int = 10) -> DataFrame:
    """Population stability index between two samples of ``value_col``
    — the DISTRIBUTION-shift companion of :func:`profile_diff` (which
    compares null ratios and cardinalities but not shape):

        PSI = Σ_bins (p_new − p_old) · ln(p_new / p_old)

    with bins = the OLD sample's fitted quantile edges
    (operators/binning.py QuantileBin — the fit/serve discipline: new
    data is binned against the baseline's edges, never re-ranked
    against itself) and Laplace-smoothed (+1) bin counts so empty bins
    stay finite. Industry reading: < 0.1 stable, 0.1–0.25 shifting,
    > 0.25 drifted.

    Output: one row per bin — (bin, n_old, n_new, p_old_micros,
    p_new_micros, term_micros) — plus the total ``psi_micros`` repeated
    on every row. Exactness: shares and the log-ratio are quantized to
    micros from exact integer counts (the products inside the ln are
    decimal-widened before ONE double division, the PMI pattern), the
    per-bin term is an exact int64 product, and the final PSI is one
    truncating division of the term sum. NULL values are excluded
    (they are profile_diff's department).

    100 TB shape: one fit (exact_quantiles, no single-task stage) +
    two zero-shuffle binning projections + two ≤ n_bins-row count
    aggregations; everything after the counts touches ≤ n_bins rows.
    """
    from systems_spark.operators.binning import QuantileBin

    if n_bins < 2:
        raise ValueError("n_bins must be >= 2")
    op = QuantileBin(value_col, n_bins=n_bins).fit(old)
    bcol = value_col + "_bin"

    def _counts(df, out):
        return (op.transform(df.where(F.col(value_col).isNotNull()))
                .groupBy(F.col(bcol).alias("bin"))
                .agg(F.count(F.lit(1)).alias(out)))

    spark = old.sparkSession
    bins = spark.range(n_bins).select(F.col("id").alias("bin"))
    counts = (bins
              .join(_counts(old, "n_old"), on="bin", how="left")
              .join(_counts(new, "n_new"), on="bin", how="left")
              .select("bin",
                      F.coalesce("n_old", F.lit(0)).alias("n_old"),
                      F.coalesce("n_new", F.lit(0)).alias("n_new")))
    # (r12 perf note: pinning `counts` measured neutral-to-slower — the
    # two count aggregations behind it are cheap scans, and the pin's
    # job-structure serialization costs more than the saved recompute.)
    tots = counts.agg(F.sum("n_old").alias("_to"),
                      F.sum("n_new").alias("_tn"))
    w = counts.crossJoin(F.broadcast(tots))
    p_old = F.expr(f"CAST((n_old + 1) * 1000000 DIV (_to + {n_bins})"
                   f" AS BIGINT)")
    p_new = F.expr(f"CAST((n_new + 1) * 1000000 DIV (_tn + {n_bins})"
                   f" AS BIGINT)")
    lnr = F.expr(
        f"CAST(round(ln(CAST(CAST(n_new + 1 AS DECIMAL(38,0))"
        f" * (_to + {n_bins}) AS DOUBLE)"
        f" / CAST(CAST(n_old + 1 AS DECIMAL(38,0))"
        f" * (_tn + {n_bins}) AS DOUBLE)) * 1000000) AS BIGINT)")
    perbin = w.select(
        "bin", "n_old", "n_new",
        p_old.alias("p_old_micros"), p_new.alias("p_new_micros"),
        ((p_new - p_old) * lnr).alias("_term_full"),
    ).withColumn("term_micros",
                 F.expr("CAST(_term_full DIV 1000000 AS BIGINT)"))
    psi = perbin.agg(F.expr("CAST(sum(_term_full) DIV 1000000 AS BIGINT)")
                     .alias("psi_micros"))
    return (perbin.crossJoin(F.broadcast(psi))
            .select("bin", "n_old", "n_new", "p_old_micros",
                    "p_new_micros", "term_micros", "psi_micros"))
