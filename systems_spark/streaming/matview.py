"""Incrementally maintained MATERIALIZED AGGREGATE VIEWS over CDC
tables — the Materialize / Delta-Live-Tables role on the repo's own
transaction log.

A ``MaterializedAggView`` stores the result of ``GROUP BY g AGG …``
over a :class:`~systems_spark.streaming.sinks.CdcTable` (either
layout, either write mode) together with the table version it
reflects. ``refresh()`` advances it to the table's latest version by
reading ONLY the change feed between the two versions — classic
differential view maintenance (Gupta & Mumick, "Maintenance of
Materialized Views: Problems, Techniques, and Applications", IEEE
Data Eng. Bulletin 1995):

- the feed (``changes_between(..., preimages=True)``, Delta CDF's
  four-type shape) signs every row: insert / update_postimage add a
  contribution, delete / update_preimage retract one — a row moving
  BETWEEN groups is automatically one retraction in the old group and
  one addition in the new;
- the signed contributions fold into per-group deltas in one
  aggregation over the CHANGE SET;
- the stored view absorbs the deltas through one NULL-safe full outer
  join on the group keys; groups whose maintained live-row count hits
  zero drop out.

Refresh aggregation cost is O(|changes| + |view|), and the base table
is never re-AGGREGATED after the initial build (a test pins that
refresh uses only the change feed — ``snapshot()``/``current()`` are
made unreadable). The feed itself costs whatever the table's
``changes_between`` costs: on a merge-on-read PartitionedCdcTable
with the window's change files retained it is served from the delta
log with both endpoint reads pruned to touched buckets ⋉ touched keys
— O(|changes| + touched buckets), the true 100 TB path; otherwise it
falls back to the two-endpoint snapshot diff (one pass over each
endpoint, still independent of how many epochs separate them), so
refresh cadence is a freshness/cost knob, not a correctness one.

Only SELF-MAINTAINABLE aggregates are offered: ``count`` (live rows),
``sum`` (any expression; use DECIMAL expressions for bit-exact parity
with a from-scratch recompute — float addition is not associative),
``avg`` derived as sum/count at read, and ``var``/``std`` (population
moments: a sum of squares is exactly as self-maintainable as a sum,
and variance derives as E[x²] − E[x]² at read). ``min``/``max`` are
rejected: deleting the extremal row makes them non-maintainable
without re-reading the group (the standard IVM limitation — a future
per-group recompute fallback would reintroduce exactly the base-table
read this class exists to avoid, so it must be explicit, not silent).

Storage is marker-last and versioned: a refresh writes a new result
directory, then atomically publishes a pointer recording the table
version it reflects; a crash mid-refresh leaves the previous result
intact, and a replayed refresh of an already-reflected version is a
no-op.

>>> view = MaterializedAggView(
...     table, "/lake/orders_by_status",
...     group_cols=["o_orderstatus"],
...     aggs={"n_orders": ("count", None),
...           "total": ("sum", "CAST(o_totalprice AS DECIMAL(18,2))")})
>>> view.refresh(spark)     # initial build: one table scan
>>> ...                     # table absorbs change epochs
>>> view.refresh(spark)     # incremental: reads only the change feed
>>> view.result(spark)
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["MaterializedAggView"]

_COUNT = "_mv_live_rows"


class MaterializedAggView:
    def __init__(self, table, store_path: str, group_cols, aggs: dict,
                 dim: "DataFrame | None" = None,
                 dim_on: "list | None" = None):
        """``dim``/``dim_on`` turn this into a STAR-SCHEMA view:
        the fact table's rows (and its change feed's rows — pre- and
        postimages carry the full payload, so the foreign key is
        always present) are enriched by a broadcast LEFT join with the
        dimension before grouping, so ``group_cols`` and aggregate
        expressions may reference dimension columns (revenue by
        nation, maintained from the orders feed). The dimension is a
        FIT-TIME CONSTANT: differential maintenance subtracts old
        contributions computed under the dimension the view was built
        with, so a changed dimension requires a rebuild (drop the
        store) — the same contract every broadcast dim join in this
        repo has, stated rather than silently violated."""
        self.table = table
        self.store = store_path.rstrip("/")
        self.group_cols = ([group_cols] if isinstance(group_cols, str)
                           else list(group_cols))
        self.aggs = dict(aggs)
        if (dim is None) != (dim_on is None):
            raise ValueError("dim and dim_on come together")
        self.dim = dim
        self.dim_on = ([dim_on] if isinstance(dim_on, str)
                       else list(dim_on or []))
        for name, (kind, expr) in self.aggs.items():
            if kind in ("min", "max"):
                raise NotImplementedError(
                    f"{name}: {kind} is not self-maintainable under "
                    f"deletes (retracting the extremum needs a group "
                    f"re-read) — maintain a sum/count view and compute "
                    f"extrema on demand, or recompute the view")
            if kind not in ("count", "sum", "avg", "var", "std"):
                raise ValueError(
                    f"{name}: unsupported aggregate {kind!r} "
                    f"(count/sum/avg/var/std)")
            if kind in ("sum", "avg", "var", "std") and not expr:
                raise ValueError(f"{name}: {kind} needs an expression")

    # -- store (marker-last pointer, same discipline as the tables) -------
    def _pointer_path(self) -> str:
        return f"{self.store}/_current.json"

    def _pointer(self) -> "dict | None":
        try:
            with open(self._pointer_path()) as fh:
                return json.load(fh)
        except (OSError, ValueError):
            return None

    def _publish(self, spark: SparkSession, table_version: int,
                 refresh_no: int) -> None:
        ptr = {"table_version": int(table_version),
               "refresh": int(refresh_no),
               "dir": f"r{int(refresh_no)}"}
        tmp = f"{self._pointer_path()}.{os.getpid()}.tmp"
        os.makedirs(self.store, exist_ok=True)
        with open(tmp, "w") as fh:
            json.dump(ptr, fh)
        os.replace(tmp, self._pointer_path())

    # -- aggregation pieces ------------------------------------------------
    def _sum_cols(self):
        """(internal column, source expression) for every maintained
        sum — avg maintains the same (sum, shared live-count) state,
        and var/std additionally maintain a sum of SQUARES (below):
        second moments are as self-maintainable as first ones."""
        out = []
        for name, (kind, expr) in self.aggs.items():
            if kind in ("sum", "avg", "var", "std"):
                out.append((f"_mv_sum_{name}", expr))
        return out

    def _sq_cols(self):
        return [(f"_mv_sq_{name}", expr)
                for name, (kind, expr) in self.aggs.items()
                if kind in ("var", "std")]

    def _enrich(self, df: DataFrame) -> DataFrame:
        if self.dim is None:
            return df
        return df.join(F.broadcast(self.dim), on=self.dim_on,
                       how="left")

    def _initial(self, spark: SparkSession, snap: DataFrame) -> DataFrame:
        live = self._enrich(snap.where(~F.col(self.table.DELETED)))
        aggs = [F.count(F.lit(1)).alias(_COUNT)]
        for col, expr in self._sum_cols():
            aggs.append(F.sum(F.expr(expr)).alias(col))
        for col, expr in self._sq_cols():
            aggs.append(F.sum(F.expr(expr) * F.expr(expr)).alias(col))
        return live.groupBy(*self.group_cols).agg(*aggs)

    def _delta(self, changes: DataFrame) -> DataFrame:
        sign = F.when(
            F.col("_change_type").isin("insert", "update_postimage"),
            F.lit(1)).otherwise(F.lit(-1))
        enriched = self._enrich(changes)
        aggs = [F.sum(sign).alias(_COUNT)]
        for col, expr in self._sum_cols():
            aggs.append(F.sum(sign * F.expr(expr)).alias(col))
        for col, expr in self._sq_cols():
            aggs.append(F.sum(sign * F.expr(expr) * F.expr(expr))
                        .alias(col))
        return enriched.groupBy(*self.group_cols).agg(*aggs)

    def _absorb(self, cur: DataFrame, delta: DataFrame) -> DataFrame:
        a, b = cur.alias("MV"), delta.alias("D")
        cond = [F.col(f"MV.{g}").eqNullSafe(F.col(f"D.{g}"))
                for g in self.group_cols]
        state_cols = [_COUNT] + [c for c, _ in self._sum_cols()] \
            + [c for c, _ in self._sq_cols()]
        # pin every absorbed column to the STORED schema's type: decimal
        # addition otherwise widens precision on each refresh and the
        # state schema would drift release-to-release
        types = {f.name: f.dataType for f in cur.schema.fields}
        merged = a.join(b, on=cond, how="full").select(
            *[F.coalesce(F.col(f"MV.{g}"), F.col(f"D.{g}")).alias(g)
              for g in self.group_cols],
            *[(F.coalesce(F.col(f"MV.{c}"), F.lit(0))
               + F.coalesce(F.col(f"D.{c}"), F.lit(0)))
              .cast(types[c]).alias(c)
              for c in state_cols])
        return merged.where(F.col(_COUNT) > 0)

    # -- API ---------------------------------------------------------------
    def refresh(self, spark: SparkSession) -> int:
        """Advance the view to the table's latest version. Initial call
        scans the table once; every later call reads only the change
        feed. Idempotent: a refresh at an already-reflected version is
        a no-op. Returns the table version the view now reflects."""
        latest = self.table._latest_version(spark)
        if latest is None:
            raise ValueError("table has no committed versions")
        ptr = self._pointer()
        if ptr is None:
            state = self._initial(spark,
                                  self.table.at_version(spark, latest))
            self._write(spark, state, latest, 0)
            return int(latest)
        if int(ptr["table_version"]) >= int(latest):
            return int(ptr["table_version"])
        cur = spark.read.parquet(f"{self.store}/{ptr['dir']}")
        changes = self.table.changes_between(
            spark, int(ptr["table_version"]), int(latest),
            preimages=True)
        state = self._absorb(cur, self._delta(changes))
        self._write(spark, state, latest, int(ptr["refresh"]) + 1)
        return int(latest)

    def _write(self, spark: SparkSession, state: DataFrame,
               table_version: int, refresh_no: int) -> None:
        target = f"{self.store}/r{int(refresh_no)}"
        state.write.mode("overwrite").parquet(target)
        prev = self._pointer()
        self._publish(spark, table_version, refresh_no)
        if prev and prev.get("dir") and prev["dir"] != f"r{refresh_no}":
            import shutil
            shutil.rmtree(f"{self.store}/{prev['dir']}",
                          ignore_errors=True)

    def result(self, spark: SparkSession) -> DataFrame:
        """The maintained aggregate: group cols + one column per
        declared aggregate (avg derived as sum/count; var/std —
        POPULATION moments — derived as E[x²] − E[x]², double)."""
        ptr = self._pointer()
        if ptr is None:
            raise ValueError("refresh() before reading the view")
        state = spark.read.parquet(f"{self.store}/{ptr['dir']}")
        cols = list(self.group_cols)
        for name, (kind, _expr) in self.aggs.items():
            if kind == "count":
                cols.append(F.col(_COUNT).alias(name))
            elif kind == "sum":
                cols.append(F.col(f"_mv_sum_{name}").alias(name))
            elif kind == "avg":
                cols.append((F.col(f"_mv_sum_{name}")
                             / F.col(_COUNT)).alias(name))
            else:  # var / std over exactly-maintained moments
                mean = (F.col(f"_mv_sum_{name}").cast("double")
                        / F.col(_COUNT))
                var = (F.col(f"_mv_sq_{name}").cast("double")
                       / F.col(_COUNT)) - mean * mean
                var = F.greatest(var, F.lit(0.0))  # fp guard at var≈0
                cols.append((var if kind == "var"
                             else F.sqrt(var)).alias(name))
        return state.select(*cols)

    def reflected_version(self) -> "int | None":
        ptr = self._pointer()
        return int(ptr["table_version"]) if ptr else None

    def serve(self, spark: SparkSession, checkpoint: str,
              trigger: "dict | None" = None):
        """CONTINUOUSLY maintained view: subscribe to the table's
        change-feed streaming source and refresh on every committed
        delta — the view follows the table at change-stream cost with
        no polling loop. The feed is used purely as a commit
        NOTIFICATION: each micro-batch triggers ``refresh()``, which
        reads the authoritative window from the log and is idempotent
        by reflected version, so replayed or coalesced triggers are
        harmless and no exactly-once plumbing is needed beyond the
        view's own marker-last store. Requires the producing table to
        be ``write_mode="merge_on_read"`` (the change-feed source's
        contract). Returns the StreamingQuery."""
        from systems_spark.streaming.cdf_source import \
            CdcChangeFeedDataSource

        spark.dataSource.register(CdcChangeFeedDataSource)
        feed = (spark.readStream.format("cdc_change_feed")
                .option("path", self.table.path)
                .option("op_col", self.table.op_col)
                .option("deleted_col", self.table.DELETED).load())

        def absorb(batch_df, batch_id):
            self.refresh(batch_df.sparkSession)

        w = (feed.writeStream.foreachBatch(absorb)
             .option("checkpointLocation", checkpoint))
        w = w.trigger(**trigger) if trigger else w
        return w.start()
