"""Distributed table diff / reconciliation — Merkle-style bucket compare.

Verifying that two copies of a table agree (a cross-cluster replica, a
backfill vs the original, an incremental pipeline vs its full-recompute
twin) must not cost a full-table join at 100 TB when the expected
difference is tiny. The standard fix is the Merkle/anti-entropy shape
(Dynamo, Cassandra repair): summarize each side into B content buckets
(order-independent checksum per bucket), compare the B-row summaries,
and do ROW-level work only inside buckets whose checksums disagree —
cost proportional to the DIFFERENCE, not the table.

Determinism: buckets come from the portable md5 hash of the key
(functions/hashing — stable across engines and runs); the bucket
checksum is the exact decimal(38,0) SUM of per-row xxhash64 over all
compared columns (the ``write_manifest_parquet`` integrity discipline:
order- and partition-independent, sensitive to any changed, missing,
or duplicated row).

Output contract (one row per differing key):
``(key…, diff)`` where diff ∈ ``left_only | right_only | changed``.
Identical tables → empty frame, after ONE map-side-combined
aggregation per side and a B-row join — no row ever shuffles.

Caveat (documented, inherent to checksum-sum schemes): a bucket whose
rows changed such that the xxhash64 SUM collides reads as clean —
probability ~2⁻⁶⁴ per bucket, the same trust level as the export
manifests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from systems_spark.functions.hashing import hash64


def _bucketed_summary(df: DataFrame, key_cols, compare_cols, buckets: int):
    key = F.concat_ws("\x1f", *[F.col(c).cast("string") for c in key_cols])
    h = F.xxhash64(*[F.col(c) for c in list(key_cols) + list(compare_cols)]) \
        .cast("decimal(38,0)")
    return (df
            .withColumn("_bkt", F.pmod(hash64(key), F.lit(buckets)))
            .groupBy("_bkt")
            .agg(F.count(F.lit(1)).alias("_rows"),
                 F.coalesce(F.sum(h), F.lit(0).cast("decimal(38,0)"))
                 .alias("_sum")))


def table_diff(left: DataFrame, right: DataFrame, key_cols,
               compare_cols=None, buckets: int = 4096) -> DataFrame:
    """Rows that differ between ``left`` and ``right``: one row per key
    present or different on either side, labeled ``left_only`` /
    ``right_only`` / ``changed``. ``key_cols`` must identify rows
    uniquely on each side; ``compare_cols`` defaults to every shared
    non-key column. The row-level comparison runs ONLY inside buckets
    whose (rows, checksum) summaries disagree — the dirty-bucket set is
    tiny for near-identical tables and broadcasts into both sides as a
    semi-join, so the full tables never shuffle."""
    key_cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    if compare_cols is None:
        shared = [c for c in left.columns if c in set(right.columns)]
        compare_cols = [c for c in shared if c not in key_cols]
    compare_cols = list(compare_cols)
    if not key_cols:
        raise ValueError("key_cols must not be empty")
    if buckets < 1:
        raise ValueError("buckets must be >= 1")

    ls = _bucketed_summary(left, key_cols, compare_cols, buckets)
    rs = _bucketed_summary(right, key_cols, compare_cols, buckets)
    dirty = (ls.alias("L").join(rs.alias("R"), on="_bkt", how="full")
             .where(~(F.col("L._rows").eqNullSafe(F.col("R._rows"))
                      & F.col("L._sum").eqNullSafe(F.col("R._sum"))))
             .select("_bkt"))

    key = F.concat_ws("\x1f", *[F.col(c).cast("string") for c in key_cols])

    content = (F.xxhash64(*[F.col(c) for c in compare_cols])
               if compare_cols else F.lit(0).cast("long"))

    def side(df, tag):
        return (df.withColumn("_bkt", F.pmod(hash64(key), F.lit(buckets)))
                .join(F.broadcast(dirty), on="_bkt", how="semi")
                .select(*key_cols, content.alias(f"_h_{tag}")))

    # null-SAFE key equality (ADVICE r7): a NULL key value is a real key
    # — the bucket stage already treats it as one (hash of the concat) —
    # so the row stage must match it too, or a changed NULL-key row
    # splits into a spurious left_only + right_only pair. Presence is
    # judged by the _h_* columns (never NULL on an existing row: xxhash64
    # is null-tolerant and the no-compare-cols form is a literal), NOT by
    # key nullity.
    l_rows, r_rows = side(left, "l").alias("L"), side(right, "r").alias("R")
    joined = l_rows.join(
        r_rows,
        on=[F.col(f"L.{c}").eqNullSafe(F.col(f"R.{c}")) for c in key_cols],
        how="full")
    return (joined.select(
        *[F.when(F.col("_h_l").isNotNull(), F.col(f"L.{c}"))
          .otherwise(F.col(f"R.{c}")).alias(c) for c in key_cols],
        F.when(F.col("_h_r").isNull(), F.lit("left_only"))
        .when(F.col("_h_l").isNull(), F.lit("right_only"))
        .when(F.col("_h_l") != F.col("_h_r"), F.lit("changed"))
        .alias("diff"))
        .where(F.col("diff").isNotNull()))


def table_diff_sql(left_sql: str, right_sql: str, key_cols,
                   compare_cols) -> str:
    """DuckDB twin — deliberately the BRUTE-FORCE full outer join (no
    bucket shortcut), so the parity check grades the Merkle filter's
    losslessness, not a replay of the same shortcut. Side presence is
    judged by non-null marker columns, never by key nullity (ADVICE r7:
    ``r.key IS NULL`` mislabels a MATCHED NULL-key row as one-sided)."""
    key_cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    compare_cols = list(compare_cols)
    on = " AND ".join(f"l.{c} IS NOT DISTINCT FROM r.{c}" for c in key_cols)
    keys = ", ".join(
        f"CASE WHEN l._p THEN l.{c} ELSE r.{c} END AS {c}" for c in key_cols)
    changed = " OR ".join(
        f"(l.{c} IS DISTINCT FROM r.{c})" for c in compare_cols)
    return f"""
WITH l AS (SELECT *, TRUE AS _p FROM ({left_sql})),
     r AS (SELECT *, TRUE AS _p FROM ({right_sql}))
SELECT * FROM (
  SELECT {keys},
         CASE WHEN r._p IS NULL THEN 'left_only'
              WHEN l._p IS NULL THEN 'right_only'
              WHEN {changed} THEN 'changed' END AS diff
  FROM l FULL OUTER JOIN r ON {on}
) WHERE diff IS NOT NULL
"""
