"""GlobalRank — distributed EXACT global row numbering / ntile / quantiles.

The naive exact forms funnel everything through one task:

- ``ntile(k) OVER (ORDER BY x)`` — Spark plans a single-partition window
  (every row moves to ONE task; dead at 100 TB).
- ``percentile(x, p)`` — one task per group materializes the whole group.

This operator computes the same EXACT answer with no single-task stage:

1. Derive a DETERMINISTIC order-preserving bucket column from the first
   order key: boundaries via ``approxQuantile`` (numeric) or a
   seeded-sample quantile sweep (other orderable types), embedded as
   literals. Boundary quality affects only balance, never correctness.
   We deliberately do NOT use ``repartitionByRange``: its range bounds
   come from a sample seeded by the RDD id, so two executions of the same
   plan can partition differently — any rank bookkeeping tied to physical
   partitions silently corrupts when a downstream action (or a task retry
   lineage recompute) re-runs the exchange. A bucket that is a pure
   function of the row is re-execution-proof.
2. One tiny map-side-combined aggregation collects per-(bucket, group) row
   counts straight off the scan (no wide shuffle) and turns them into
   prefix offsets on the driver.
3. Hash-repartition on the bucket column, sort within partitions by
   (bucket, group, order), then an Arrow-batched ``mapInPandas`` appends
   rank = offset[bucket, group] + local position. No second wide shuffle;
   the kernel only appends two long columns.

Use this when the ORDER spans the whole table (or a handful of huge
groups). When there are MANY small groups, a plain
``Window.partitionBy(group)`` is already scale-safe — use that instead.

Reference anchor: ranking semantics in the reference are per-request top-k
(merlin/systems/dag/ops/softmax_sampling.py:104-113); this operator is the
engine-side generalization needed for dataset-scale quantile bucketing.
"""

from __future__ import annotations

import math
from typing import Iterable, List, Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    NumericType,
    StructField,
    StructType,
)

from systems_spark.operators.base import Operator


def ntile_expr(rank_col: str, total_col: str, k: int) -> Column:
    """SQL-standard ntile from a 1-based rank and the partition row count:
    the first ``total % k`` buckets get ``total//k + 1`` rows, the rest
    ``total//k`` — identical to ``ntile(k)`` in Spark and DuckDB."""
    r, n = F.col(rank_col), F.col(total_col)
    base = (n / k).cast("long")  # floor: both operands non-negative
    rem = n % k
    big = base + 1
    in_big = r <= rem * big
    # guard base==0 (k > n): then rem == n and every row is in a big bucket,
    # so the otherwise-branch never selects — greatest() only avoids a
    # speculative division by zero
    return (
        F.when(in_big, ((r - 1) / big).cast("long") + 1)
        .otherwise(rem + ((r - rem * big - 1) / F.greatest(base, F.lit(1))).cast("long") + 1)
    )


class GlobalRank(Operator):
    """Append exact global ``rank_col`` (1-based row_number) and
    ``total_col`` (group row count) ordered by ``order_cols`` ascending
    (nulls first, matching window defaults) within each ``group_cols``
    combination (empty = whole dataset).

    Ties: rows equal on the full (group, order) key receive distinct
    arbitrary consecutive ranks — include a unique tiebreaker in
    ``order_cols`` when rank assignment must be reproducible row-for-row
    (ntile aggregates and quantile interpolation only need value-level
    determinism, which ties already guarantee).
    """

    def __init__(self, order_cols: Sequence[str], group_cols: Sequence[str] = (),
                 rank_col: str = "rank", total_col: str = "grp_total",
                 num_partitions: Optional[int] = None, sample_seed: int = 42,
                 max_layout_rows: int = 1_000_000):
        self.order_cols = list(order_cols)
        self.group_cols = list(group_cols)
        self.rank_col = rank_col
        self.total_col = total_col
        self.num_partitions = num_partitions
        self.sample_seed = int(sample_seed)
        self.max_layout_rows = int(max_layout_rows)
        self.requires = tuple(self.group_cols + self.order_cols)
        #: populated by transform(): {group tuple: total rows} — lets
        #: callers (exact_quantiles) reuse the counts without another job
        self.group_totals_: dict = {}

    # -- deterministic order-preserving bucketing --------------------------
    def _boundaries(self, df: DataFrame, n_buckets: int) -> List:
        col0 = self.order_cols[0]
        dtype = df.schema[col0].dataType
        probs = [i / n_buckets for i in range(1, n_buckets)]
        if isinstance(dtype, NumericType):
            # single pass, deterministic (Greenwald-Khanna, no RNG)
            bounds = df.stat.approxQuantile(col0, probs, 1.0 / (2 * n_buckets))
        else:
            # orderable non-numeric (string/date/timestamp): seeded sample
            cnt = df.count()
            if cnt == 0:
                return []
            frac = min(1.0, (n_buckets * 200.0) / cnt)
            sample = [
                r[0]
                for r in df.select(col0).where(F.col(col0).isNotNull())
                .sample(False, frac, seed=self.sample_seed).collect()
            ]
            if not sample:
                return []
            sample.sort()
            bounds = [sample[int(p * (len(sample) - 1))] for p in probs]
        out: List = []
        for b in bounds:
            if b is not None and (not out or b > out[-1]):
                out.append(b)
        return out

    def _bucket_expr(self, boundaries: List, col0: str) -> Column:
        if not boundaries:
            return F.lit(0)
        arr = F.array(*[F.lit(b) for b in boundaries])
        # bucket = #boundaries <= value; NULL value → predicate NULL → kept
        # out of the filter → bucket 0, consistent with nulls-first ordering
        return F.size(F.filter(arr, lambda b: F.col(col0) >= b))

    def bucket_counts(self, df: DataFrame):
        """Bucket the frame and collect the per-(bucket, group) layout.

        Returns ``(withb, offsets, totals, sizes, n_buckets)`` where
        ``withb`` is ``df`` plus the deterministic ``_gr_bkt`` column,
        ``offsets[(bkt, grp)]`` is the number of group rows in LOWER
        buckets (the rank offset), ``totals[grp]`` the group row count and
        ``sizes[(bkt, grp)]`` the bucket's own row count. One tiny
        aggregation job: map-side combine off the scan, the shuffle
        carries ≤ n_buckets × #groups rows."""
        spark = df.sparkSession
        n_buckets = self.num_partitions or int(
            spark.conf.get("spark.sql.shuffle.partitions", "200")
        )
        boundaries = self._boundaries(df, n_buckets)
        # FENCED, not aliased: _gr_bkt is an ArrayFilter HOF over the
        # value column, and downstream joins key on it — without the
        # fence, constraint inference can substitute the HOF expression
        # into filters that land on the OTHER join side, where the value
        # attribute doesn't exist (INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND,
        # reproduced on LocalRelation inputs; parquet scans dodged it by
        # plan shape, review r6). The fence also keeps the HOF from
        # re-evaluating per consumer, per the repo-wide discipline.
        from systems_spark.functions.fence import fence_columns

        withb = fence_columns(
            df, _gr_bkt=self._bucket_expr(boundaries, self.order_cols[0])
        )
        # LIMIT bound+1 caps what reaches the driver: the layout is
        # n_buckets × #groups rows, and nothing else stops a caller passing
        # a high-cardinality group_cols and OOMing the driver. The limit
        # costs nothing when under the bound and turns the overflow case
        # into a loud error instead of a dead driver.
        counts = (
            withb.groupBy("_gr_bkt", *self.group_cols)
            .agg(F.count(F.lit(1)).alias("_n"))
            .limit(self.max_layout_rows + 1)
            .collect()
        )
        if len(counts) > self.max_layout_rows:
            raise ValueError(
                f"GlobalRank layout exceeds max_layout_rows="
                f"{self.max_layout_rows} (bucket, group) combinations — "
                f"group_cols={self.group_cols} is high-cardinality. "
                "GlobalRank targets a global order or a few HUGE groups; "
                "for many small groups use grouped_rank / "
                "Window.partitionBy(*group_cols) (already scale-safe), or "
                "raise max_layout_rows explicitly."
            )
        offsets: dict = {}
        totals: dict = {}
        sizes: dict = {}
        for row in sorted(counts, key=lambda r: r["_gr_bkt"]):
            grp = tuple(row[c] for c in self.group_cols)
            offsets[(row["_gr_bkt"], grp)] = totals.get(grp, 0)
            sizes[(row["_gr_bkt"], grp)] = row["_n"]
            totals[grp] = totals.get(grp, 0) + row["_n"]
        self.group_totals_ = totals
        return withb, offsets, totals, sizes, n_buckets

    def transform(self, df: DataFrame) -> DataFrame:
        """Entirely JVM-side since r3 (previously an Arrow kernel pushed
        every row's full width through Python): the tiny (bucket, group)
        layout broadcasts back as a join, and rank = offset + row_number
        over a window partitioned by (bucket, group) — a distribution the
        bucket hash-repartition ALREADY satisfies (partitioning keys are a
        subset of the window keys), so the window adds a sort but NO second
        exchange. One wide shuffle total, whole-stage codegen end to end."""
        from pyspark.sql import Window

        withb, offsets, totals, _sizes, n_buckets = self.bucket_counts(df)
        spark = df.sparkSession
        group_cols = list(self.group_cols)

        layout_rows = [
            (int(bkt), *grp, int(off), int(totals[grp]))
            for (bkt, grp), off in offsets.items()
        ]
        layout_schema = StructType(
            [StructField("_gr_bkt", LongType(), False)]
            + [StructField(c, df.schema[c].dataType, True) for c in group_cols]
            + [StructField("_gr_off", LongType(), False),
               StructField("_gr_tot", LongType(), False)]
        )
        layout = spark.createDataFrame(layout_rows, schema=layout_schema)

        ranged = withb.withColumn("_gr_bkt", F.col("_gr_bkt").cast("long")).repartition(
            n_buckets, F.col("_gr_bkt")
        )
        # eqNullSafe on group keys: NULL is a real group for groupBy and
        # must keep matching its layout row through the join
        cond = ranged["_gr_bkt"] == layout["_gr_bkt"]
        for c in group_cols:
            cond = cond & ranged[c].eqNullSafe(layout[c])
        # LEFT join + in-expression raise_error: an inner join would
        # SILENTLY DROP any row whose (bucket, group) combo is missing
        # from the collected layout — which happens exactly when the input
        # is non-deterministic between the counts job and the rank job
        # (unseeded sample, source files changing underneath). Silent row
        # loss is worse than a wrong rank, so fail loudly instead; the
        # check lives inside the _gr_off value expression (feeds rank_col)
        # so pruning can never optimize it away. (ADVICE r3)
        joined = ranged.join(F.broadcast(layout), on=cond, how="left").drop(
            layout["_gr_bkt"]
        )
        for c in group_cols:
            joined = joined.drop(layout[c])
        joined = joined.withColumn(
            "_gr_off",
            F.when(F.col("_gr_off").isNotNull(), F.col("_gr_off")).otherwise(
                F.raise_error(F.concat(
                    F.lit("GlobalRank: row has no layout entry for its "
                          "(bucket, group) — the input changed between the "
                          "counts job and the rank job (non-deterministic "
                          "source?); cache/checkpoint the input or seed its "
                          "randomness, then re-run"),
                )).cast("long")
            ),
        )

        w = Window.partitionBy("_gr_bkt", *group_cols).orderBy(
            *[F.col(c).asc_nulls_first() for c in self.order_cols]
        )
        out_cols = [c for c in withb.columns if c != "_gr_bkt"]
        return (
            joined.withColumn(
                self.rank_col, (F.col("_gr_off") + F.row_number().over(w)).cast("long")
            )
            .withColumn(self.total_col, F.col("_gr_tot"))
            .select(*out_cols, self.rank_col, self.total_col)
        )

    def with_ntile(self, df: DataFrame, k: int, ntile_col: str = "bucket") -> DataFrame:
        """Exact distributed ``ntile(k)`` — same answer as the single-task
        global window, no single-task stage."""
        ranked = self(df)
        return ranked.withColumn(
            ntile_col, ntile_expr(self.rank_col, self.total_col, k)
        ).drop(self.rank_col, self.total_col)

    def get_params(self):
        return {
            "order_cols": self.order_cols, "group_cols": self.group_cols,
            "rank_col": self.rank_col, "total_col": self.total_col,
            "num_partitions": self.num_partitions, "sample_seed": self.sample_seed,
            "max_layout_rows": self.max_layout_rows,
        }


def grouped_rank(df: DataFrame, order_cols: Sequence[str],
                 group_cols: Sequence[str], rank_col: str = "rank",
                 total_col: str = "grp_total") -> DataFrame:
    """The MANY-SMALL-GROUPS twin of :class:`GlobalRank`: a plain
    per-group window rank + group count. Scale-safe exactly when no single
    group outgrows one task — the opposite regime from GlobalRank (global
    order / few huge groups), whose high-cardinality guard points here.
    Same output contract (1-based rank ascending nulls-first, group row
    count) so callers can swap between the two as the data shape dictates."""
    from pyspark.sql import Window

    if not group_cols:
        raise ValueError(
            "grouped_rank needs group_cols — for a global order use "
            "GlobalRank (a global window is a single-task stage)"
        )
    w = Window.partitionBy(*group_cols).orderBy(
        *[F.col(c).asc_nulls_first() for c in order_cols]
    )
    wt = Window.partitionBy(*group_cols)
    return (
        df.withColumn(rank_col, F.row_number().over(w).cast("long"))
        .withColumn(total_col, F.count(F.lit(1)).over(wt).cast("long"))
    )


def _p_label(p: float) -> str:
    """Column name for quantile ``p``: 0.5 → p5, 0.95 → p95, 0.05 → p05.
    The bare digit-strip collides at the endpoints (0.1 and 1.0 would
    both yield 'p1'), so p=0 → p0 and p=1 → p100 explicitly."""
    if p == 0:
        return "p0"
    if p == 1:
        return "p100"
    return "p" + f"{p:g}".replace("0.", "").replace(".", "_")


def exact_quantiles(df: DataFrame, value_col: str, ps: Iterable[float],
                    group_cols: Sequence[str] = (),
                    num_partitions: Optional[int] = None) -> DataFrame:
    """Exact linear-interpolated quantiles (the ``percentile`` /
    DuckDB ``quantile_cont`` definition: position ``p*(n-1)`` 0-based,
    interpolate between the two straddling order statistics) computed
    WITHOUT materializing any group on a single task — and without
    ranking any row.

    Plan: bucket counts (one tiny map-side-combined aggregation) locate
    which bucket holds each needed order statistic; a broadcast semi-join
    keeps ONLY those buckets (≤ 2·|ps| buckets per group, each ~1/n_buckets
    of the group); a per-(bucket, group) window finds the statistic inside
    them. Everything stays JVM-side — no Arrow pass, and the wide shuffle
    moves only the needed buckets, not the table. NULL values are excluded
    (``percentile`` / ``quantile_cont`` semantics).

    Output: one row per group, one double column per p named ``p<digits>``
    (0.5 → p5, 0.99 → p99).
    """
    from pyspark.sql import Window

    ps = list(ps)
    # prune BEFORE bucketing: only (group, value) participate — at sf0.1
    # the unpruned events table (wide props JSON column) made this query
    # 2-3× slower. NULLs never contribute to percentile.
    df = df.select(*group_cols, value_col).where(F.col(value_col).isNotNull())
    gr = GlobalRank([value_col], group_cols=group_cols,
                    num_partitions=num_partitions)
    withb, offsets, totals, sizes, _nb = gr.bucket_counts(df)
    spark = df.sparkSession

    # per-group bucket layout, ascending: (bucket, rank offset, size)
    layout: dict = {}
    for (bkt, grp), off in offsets.items():
        layout.setdefault(grp, []).append((bkt, off, sizes[(bkt, grp)]))
    for rows in layout.values():
        rows.sort()

    def locate(grp, rank):
        """Bucket holding global order statistic ``rank`` + local rank."""
        for bkt, off, n in layout[grp]:
            if off < rank <= off + n:
                return bkt, rank - off
        raise AssertionError(f"rank {rank} outside group layout {grp}")

    # one row per NEEDED order statistic: (group, p, role lo/hi, bucket,
    # local rank within bucket, interpolation fraction)
    need_rows = []
    for grp, n in totals.items():
        if n == 0:
            continue
        for p in ps:
            pos = p * (n - 1)  # same IEEE double product DuckDB computes
            lo = int(math.floor(pos))
            hi = int(math.ceil(pos))
            for role, rank in ((0, lo + 1), (1, hi + 1)):
                b, local = locate(grp, rank)
                need_rows.append((*grp, float(p), role, b, local, pos - lo))
    # explicit schema: empty inputs (need_rows == []) cannot infer types
    need_schema = StructType(
        [StructField(c, df.schema[c].dataType, True) for c in group_cols]
        + [
            StructField("_gq_p", DoubleType(), False),
            StructField("_gq_role", LongType(), False),
            StructField("_gr_bkt", LongType(), False),
            StructField("_gq_local", LongType(), False),
            StructField("_gq_frac", DoubleType(), False),
        ]
    )
    need = spark.createDataFrame([tuple(r) for r in need_rows], schema=need_schema)
    withb = withb.withColumn("_gr_bkt", F.col("_gr_bkt").cast("long"))

    keys = ["_gr_bkt"] + list(group_cols)
    # semi-join drops every bucket that holds no needed statistic BEFORE
    # the sort shuffle; a needed bucket is ~group/n_buckets rows
    hit_buckets = need.select(*keys).distinct()
    filt = withb.join(F.broadcast(hit_buckets), on=keys, how="semi")
    w = Window.partitionBy(*keys).orderBy(F.col(value_col).asc())
    local = filt.withColumn("_gq_local", F.row_number().over(w))
    hits = local.join(F.broadcast(need), on=keys + ["_gq_local"], how="inner")

    v = F.col(value_col).cast("double")
    agg = (
        hits.groupBy(*group_cols, "_gq_p")
        .agg(
            F.max(F.when(F.col("_gq_role") == 0, v)).alias("_v_lo"),
            F.max(F.when(F.col("_gq_role") == 1, v)).alias("_v_hi"),
            F.first("_gq_frac").alias("_frac"),
        )
        .withColumn(
            "_q",
            F.col("_v_lo")
            + (F.coalesce(F.col("_v_hi"), F.col("_v_lo")) - F.col("_v_lo"))
            * F.col("_frac"),
        )
    )

    return agg.groupBy(*group_cols).agg(
        *[
            F.max(F.when(F.col("_gq_p") == p, F.col("_q"))).alias(_p_label(p))
            for p in ps
        ]
    )


def approx_quantiles(df: DataFrame, value_col: str, ps: Iterable[float],
                     group_cols: Sequence[str] = (),
                     accuracy: int = 10000) -> DataFrame:
    """Sketch-based quantiles (``percentile_approx``, Greenwald–Khanna):
    ONE map-side-combined aggregation whose shuffled state is the
    O(accuracy) sketch per group — no bucket pass, no row movement at all
    beyond sketch merges. Rank error ≤ n/accuracy (default 1e-4·n).

    The 100 TB default when a bounded rank error is acceptable (monitoring,
    banding, skew diagnosis); ``exact_quantiles`` stays the path when a
    downstream contract needs the exact interpolated statistic. Returns
    the same shape as ``exact_quantiles`` (one row per group, one double
    ``p<digits>`` column per p) so callers can swap between them, except
    that the sketch returns an OBSERVED value (no interpolation between
    order statistics)."""
    ps = list(ps)
    df = df.select(*group_cols, value_col).where(F.col(value_col).isNotNull())

    aggs = [
        F.percentile_approx(F.col(value_col).cast("double"), p, accuracy)
        .alias(_p_label(p))
        for p in ps
    ]
    return df.groupBy(*group_cols).agg(*aggs) if group_cols else df.agg(*aggs)
