"""Categorical feature–label association scoring — χ² and mutual
information for MANY features in one pass.

The feature-selection stage of a training-data pipeline: given a label
column and a set of categorical feature columns, score every feature's
association with the label. The scale shape matters more than the
formulas — scoring F features must NOT be F table scans. Here the
features MELT into (feature, value) rows via one posexplode, and the
whole scoreboard is two map-side-combined aggregations plus
broadcast-sized joins (label marginals ≤ |labels| rows; per-feature
marginals ≤ Σ cardinalities):

- χ² via the expanded form  χ² = N·(Σ_cells n_xy²/(n_x·n_y) − 1),
  computed per cell in exact integer arithmetic:
  term = ⌊n_xy²·N·1e6 / (n_x·n_y)⌋ (decimal(38,0) — exact below
  n_xy²·N·1e6 < 1e38; at web scale partition the input and sum the
  per-partition counts first), summed, minus N·1e6. Truncating division
  is identical in Spark (`div`) and DuckDB (`//`), so the score replays
  bit-for-bit.
- mutual information in integer micro-nats:
  mi = ⌊Σ_cells n_xy · round(1e6·ln(N·n_xy/(n_x·n_y))) / N⌋ — the same
  rounded-log-micros discipline the BM25 idf uses (ln of the SAME
  double ratio in both engines; the only float op is one libm ln per
  CELL, and its rounding is pinned before the exact integer sum).

NULL feature/label values are excluded per feature (the standard
contingency-table convention); ``n`` reports each feature's non-null
row count so a sparse feature's score is read in context.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["feature_association", "feature_association_sql"]

_M = 1_000_000


def feature_association(df: DataFrame, feature_cols,
                        label_col: str) -> DataFrame:
    """(feature, n, chi2_micros, mi_micros) — one row per feature column,
    higher = more associated with ``label_col``. Feature and label
    values are compared as strings (categorical semantics)."""
    feature_cols = ([feature_cols] if isinstance(feature_cols, str)
                    else list(feature_cols))
    if not feature_cols:
        raise ValueError("feature_cols must not be empty")
    melted = df.select(
        F.col(label_col).cast("string").alias("_y"),
        F.explode(F.array(*[
            F.struct(F.lit(c).alias("_f"),
                     F.col(c).cast("string").alias("_x"))
            for c in feature_cols])).alias("_fx")) \
        .select("_y", F.col("_fx._f").alias("_f"), F.col("_fx._x").alias("_x")) \
        .where(F.col("_x").isNotNull() & F.col("_y").isNotNull())

    cells = melted.groupBy("_f", "_x", "_y").agg(
        F.count(F.lit(1)).alias("_nxy"))
    nx = cells.groupBy("_f", "_x").agg(F.sum("_nxy").alias("_nx"))
    ny = cells.groupBy("_f", "_y").agg(F.sum("_nxy").alias("_ny"))
    nn = cells.groupBy("_f").agg(F.sum("_nxy").alias("_n"))

    scored = (cells
              .join(nx, on=["_f", "_x"])
              .join(ny, on=["_f", "_y"])
              .join(F.broadcast(nn), on="_f")
              .withColumn("_chi_term", F.expr(
                  f"cast(_nxy as decimal(38,0)) * _nxy * _n * {_M}"
                  f" div (cast(_nx as decimal(38,0)) * _ny)"))
              # round() half-up on the log micros, the idf discipline
              .withColumn("_ln_micros", F.round(
                  F.log((F.col("_n").cast("double") * F.col("_nxy"))
                        / (F.col("_nx").cast("double") * F.col("_ny")))
                  * _M).cast("long")))
    return (scored.groupBy(F.col("_f").alias("feature"))
            .agg(F.max("_n").cast("long").alias("n"),
                 (F.sum("_chi_term")
                  - F.max("_n").cast("decimal(38,0)") * _M)
                 .cast("long").alias("chi2_micros"),
                 F.expr(f"cast(sum(cast(_nxy as decimal(38,0)) * _ln_micros)"
                        f" div max(_n) as bigint)").alias("mi_micros")))


def feature_association_sql(source_sql: str, feature_cols,
                            label_col: str) -> str:
    """DuckDB twin — same melt, same exact integer χ², same rounded
    log-micros MI."""
    feature_cols = ([feature_cols] if isinstance(feature_cols, str)
                    else list(feature_cols))
    melt = "\nUNION ALL\n".join(
        f"SELECT '{c}' AS _f, {c}::VARCHAR AS _x, "
        f"{label_col}::VARCHAR AS _y FROM src "
        f"WHERE {c} IS NOT NULL AND {label_col} IS NOT NULL"
        for c in feature_cols)
    return f"""
WITH src AS ({source_sql}),
melted AS ({melt}),
cells AS (SELECT _f, _x, _y, count(*) AS _nxy FROM melted GROUP BY 1, 2, 3),
nx AS (SELECT _f, _x, sum(_nxy) AS _nx FROM cells GROUP BY 1, 2),
ny AS (SELECT _f, _y, sum(_nxy) AS _ny FROM cells GROUP BY 1, 2),
nn AS (SELECT _f, sum(_nxy) AS _n FROM cells GROUP BY 1),
scored AS (
  SELECT c._f, c._nxy, x._nx, y._ny, t._n
  FROM cells c
  JOIN nx x ON x._f = c._f AND x._x = c._x
  JOIN ny y ON y._f = c._f AND y._y = c._y
  JOIN nn t ON t._f = c._f
)
SELECT _f AS feature, max(_n)::BIGINT AS n,
       (sum(_nxy::HUGEINT * _nxy * _n * {_M} // (_nx::HUGEINT * _ny))
        - max(_n) * {_M})::BIGINT AS chi2_micros,
       (sum(_nxy::HUGEINT
            * round(ln((_n::DOUBLE * _nxy) / (_nx::DOUBLE * _ny))
                    * {_M})::BIGINT)
        // max(_n))::BIGINT AS mi_micros
FROM scored GROUP BY 1
"""
