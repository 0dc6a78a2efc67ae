"""A/B experiment readout — exact 2×2 chi-square independence test.

The experimentation primitive next to the monitoring family
(psi_drift watches distributions, cusum_alerts watches levels; this
answers "did the treatment move the conversion rate, beyond what
chance explains?"). One map-side-combined aggregation over unit-level
(variant, converted) rows produces the 2×2 table; the statistic is
Pearson's chi-square with one degree of freedom.

Exactness discipline: with observed o, column total c (variant size),
row total r (outcome total) and grand total T, each cell contributes

    (o·T − c·r)² · 10⁶  div  (c·r·T)

— an exact integer per cell (decimal(38,0) in Spark, HUGEINT in
DuckDB; the statistic is DEFINED as the sum of the four truncated
per-cell micros, identical in both engines). No float anywhere, so
the readout replays bit-for-bit under oracle checking. A p-value
needs the chi-square CDF (float); instead the 95%/99% critical
values of χ²(1) — 3.841459, 6.634897 — are quantized to micros at
PLAN-BUILD time (the BM25 idf-literal pattern) and compared as
integers.

Degenerate margins (a variant with zero units, or an outcome nobody /
everybody hit) make the test undefined: those emit NULL stat and NULL
verdicts via nullif in both engines.

Magnitude budget (loud, not silent): per-cell (o·T − c·r)² · 10⁶ must
fit 38 digits — holds for T up to ~10⁸ units; beyond that Spark's
non-ANSI decimal yields NULL while DuckDB raises (the ols_trend
boundary contract). Experiments with more than 10⁸ units should
pre-aggregate per (bucketed) unit anyway.

100 TB shape: rows never shuffle — the whole table reduces map-side
to four longs; variant assignment upstream should be the portable
hash of the unit key (functions/hashing.py) so the split is
deterministic, retry-safe, and replayable in the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_M = 1_000_000
# chi2(1) critical values, quantized once at plan-build time
CHI2_1DF_95_MICROS = 3_841_459   # 3.8414588206941245
CHI2_1DF_99_MICROS = 6_634_897   # 6.6348966010212145


def _cell(o: str, c: str, r: str) -> str:
    """Exact per-cell micros: (o·T − c·r)²·1e6 div (c·r·T), decimal."""
    return (f"(CAST({o} AS DECIMAL(38,0)) * _tt - CAST({c} AS DECIMAL(38,0))"
            f" * {r}) * (CAST({o} AS DECIMAL(38,0)) * _tt -"
            f" CAST({c} AS DECIMAL(38,0)) * {r}) * {_M}"
            f" DIV (CAST({c} AS DECIMAL(38,0)) * {r} * _tt)")


def ab_chisq(df: DataFrame, variant_col: str, converted_col: str,
             a_value, b_value) -> DataFrame:
    """One-row readout of a two-variant experiment over unit-level rows:
    (n_a, n_b, conv_a, conv_b, rate_a_micros, rate_b_micros,
    chisq_micros, significant_95, significant_99). ``converted_col``
    is truthy per unit; rows whose variant is neither ``a_value`` nor
    ``b_value`` are ignored (canary/holdout slices)."""
    v = F.col(variant_col)
    conv = F.col(converted_col).cast("boolean").cast("long")
    base = df.where(v.isin([a_value, b_value]))
    counts = base.agg(
        F.sum(F.when(v == a_value, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(v == b_value, 1).otherwise(0)).alias("n_b"),
        F.sum(F.when(v == a_value, conv).otherwise(0)).alias("conv_a"),
        F.sum(F.when(v == b_value, conv).otherwise(0)).alias("conv_b"))
    cells = " + ".join([
        _cell("conv_a", "n_a", "_r1"),
        _cell("conv_b", "n_b", "_r1"),
        _cell("(n_a - conv_a)", "n_a", "_r0"),
        _cell("(n_b - conv_b)", "n_b", "_r0")])
    return (counts
            .withColumn("_r1", F.expr(
                "CAST(conv_a + conv_b AS DECIMAL(38,0))"))
            .withColumn("_r0", F.expr(
                "CAST(n_a + n_b - conv_a - conv_b AS DECIMAL(38,0))"))
            .withColumn("_tt", F.expr("CAST(n_a + n_b AS DECIMAL(38,0))"))
            .withColumn("chisq_micros", F.expr(
                f"CASE WHEN n_a > 0 AND n_b > 0 AND _r1 > 0 AND _r0 > 0"
                f" THEN CAST({cells} AS BIGINT) END"))
            .select(
                "n_a", "n_b", "conv_a", "conv_b",
                F.expr(f"CAST(CAST(conv_a AS DECIMAL(38,0)) * {_M}"
                       " DIV nullif(n_a, 0) AS BIGINT)")
                .alias("rate_a_micros"),
                F.expr(f"CAST(CAST(conv_b AS DECIMAL(38,0)) * {_M}"
                       " DIV nullif(n_b, 0) AS BIGINT)")
                .alias("rate_b_micros"),
                "chisq_micros",
                (F.col("chisq_micros") > CHI2_1DF_95_MICROS)
                .alias("significant_95"),
                (F.col("chisq_micros") > CHI2_1DF_99_MICROS)
                .alias("significant_99")))


def _cell_sql(o: str, c: str, r: str) -> str:
    return (f"(({o})::HUGEINT * _tt - ({c})::HUGEINT * {r})"
            f" * (({o})::HUGEINT * _tt - ({c})::HUGEINT * {r})"
            f" * {_M} // (({c})::HUGEINT * {r} * _tt)")


def ab_chisq_sql(rows_sql: str, variant_col: str, converted_col: str,
                 a_value: str, b_value: str) -> str:
    """DuckDB twin of :func:`ab_chisq`; ``a_value``/``b_value`` are SQL
    literals (quote strings yourself)."""
    cells = " + ".join([
        _cell_sql("conv_a", "n_a", "_r1"),
        _cell_sql("conv_b", "n_b", "_r1"),
        _cell_sql("(n_a - conv_a)", "n_a", "_r0"),
        _cell_sql("(n_b - conv_b)", "n_b", "_r0")])
    return f"""
WITH counts AS (
  SELECT sum(CASE WHEN {variant_col} = {a_value} THEN 1 ELSE 0 END)::BIGINT
           AS n_a,
         sum(CASE WHEN {variant_col} = {b_value} THEN 1 ELSE 0 END)::BIGINT
           AS n_b,
         sum(CASE WHEN {variant_col} = {a_value}
                  THEN ({converted_col})::BOOLEAN::BIGINT ELSE 0 END)::BIGINT
           AS conv_a,
         sum(CASE WHEN {variant_col} = {b_value}
                  THEN ({converted_col})::BOOLEAN::BIGINT ELSE 0 END)::BIGINT
           AS conv_b
  FROM ({rows_sql})
  WHERE {variant_col} IN ({a_value}, {b_value})
),
wide AS (
  SELECT *, (conv_a + conv_b)::HUGEINT AS _r1,
         (n_a + n_b - conv_a - conv_b)::HUGEINT AS _r0,
         (n_a + n_b)::HUGEINT AS _tt
  FROM counts
),
stat AS (
  SELECT *, CASE WHEN n_a > 0 AND n_b > 0 AND _r1 > 0 AND _r0 > 0
                 THEN ({cells})::BIGINT END AS chisq_micros
  FROM wide
)
SELECT n_a, n_b, conv_a, conv_b,
       (conv_a::HUGEINT * {_M} // nullif(n_a, 0))::BIGINT AS rate_a_micros,
       (conv_b::HUGEINT * {_M} // nullif(n_b, 0))::BIGINT AS rate_b_micros,
       chisq_micros,
       chisq_micros > {CHI2_1DF_95_MICROS} AS significant_95,
       chisq_micros > {CHI2_1DF_99_MICROS} AS significant_99
FROM stat
"""
