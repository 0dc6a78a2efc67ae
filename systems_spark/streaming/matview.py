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
import shutil
import threading

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["MaterializedAggView"]

_COUNT = "_mv_live_rows"

# staged result dirs must be unique PER ATTEMPT, not just per writer:
# pid+thread alone collides when one thread's lost refresh and the
# interleaved winner staged under the same name — the loser's cleanup
# would then delete the winner's published data
_stage_counter = __import__("itertools").count()


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
        if "://" in store_path:
            # the pointer store uses local-filesystem I/O (open /
            # os.link / shutil.rmtree); silently treating a remote URI
            # as a local relative dir would scatter state — refuse up
            # front, exactly like the change-feed source does
            raise NotImplementedError(
                f"MaterializedAggView stores its pointer with "
                f"local-filesystem I/O; "
                f"{store_path.split('://')[0]}:// paths need the "
                f"pyarrow filesystem hookup")
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

    # -- store (put-if-absent pointer markers, same OCC discipline as
    # the tables: a refresh publishes marker ``_ptr_{N}`` by hard-link
    # CAS, so two concurrent refreshes computing the same refresh
    # number can never both publish — the loser keeps its own
    # writer-unique result dir out of the pointer and retries against
    # the winner's state) ---------------------------------------------------
    def _marker(self, refresh_no: int) -> str:
        return f"{self.store}/_ptr_{int(refresh_no):012d}.json"

    def _pointer(self) -> "dict | None":
        try:
            names = os.listdir(self.store)
        except OSError:
            return None
        nums = sorted((int(m[5:-5]) for m in names
                       if m.startswith("_ptr_") and m.endswith(".json")),
                      reverse=True)
        for n in nums:
            # a racing winner may prune markers between our listing and
            # the open — fall through to the next-newest
            try:
                with open(self._marker(n)) as fh:
                    return json.load(fh)
            except (OSError, ValueError):
                continue
        try:  # pre-marker stores published a single replaced pointer
            with open(f"{self.store}/_current.json") as fh:
                return json.load(fh)
        except (OSError, ValueError):
            return None

    def _publish_exclusive(self, table_version: int, refresh_no: int,
                           dir_name: str) -> bool:
        """First-writer-wins pointer publish: full content staged to a
        writer-unique tmp, then ``os.link`` — the marker either appears
        complete or EEXIST, never half-written (the same CAS shape as
        the tables' ``fs_publish_text_exclusive``)."""
        os.makedirs(self.store, exist_ok=True)
        tmp = (f"{self._marker(refresh_no)}"
               f".{os.getpid()}.{threading.get_ident()}.tmp")
        with open(tmp, "w") as fh:
            json.dump({"table_version": int(table_version),
                       "refresh": int(refresh_no),
                       "dir": dir_name}, fh)
        try:
            os.link(tmp, self._marker(refresh_no))
            return True
        except FileExistsError:
            return False
        finally:
            os.unlink(tmp)

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

    def _n_cols(self):
        """Per-aggregate NON-NULL counts for avg/var/std: SQL AVG and
        VAR ignore NULL inputs, so their denominator must be the count
        of non-null contributions, not the group's live-row count —
        and a signed non-null count is exactly as self-maintainable as
        a sum."""
        return [(f"_mv_n_{name}", expr)
                for name, (kind, expr) in self.aggs.items()
                if kind in ("avg", "var", "std")]

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
        for col, expr in self._n_cols():
            aggs.append(F.count(F.expr(expr)).alias(col))
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
        for col, expr in self._n_cols():
            aggs.append(F.sum(F.when(F.expr(expr).isNotNull(), sign)
                              .otherwise(F.lit(0))).alias(col))
        return enriched.groupBy(*self.group_cols).agg(*aggs)

    def _absorb(self, cur: DataFrame, delta: DataFrame) -> DataFrame:
        a, b = cur.alias("MV"), delta.alias("D")
        cond = [F.col(f"MV.{g}").eqNullSafe(F.col(f"D.{g}"))
                for g in self.group_cols]
        state_cols = [_COUNT] + [c for c, _ in self._sum_cols()] \
            + [c for c, _ in self._sq_cols()] \
            + [c for c, _ in self._n_cols()]
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
    _REFRESH_RETRIES = 6

    def refresh(self, spark: SparkSession) -> int:
        """Advance the view to the table's latest version. Initial call
        scans the table once; every later call reads only the change
        feed. Idempotent: a refresh at an already-reflected version is
        a no-op; two CONCURRENT refreshes race on the pointer CAS and
        the loser rebases against the winner's published state instead
        of clobbering it. Returns the reflected table version."""
        for _attempt in range(self._REFRESH_RETRIES):
            latest = self.table._latest_version(spark)
            if latest is None:
                raise ValueError("table has no committed versions")
            ptr = self._pointer()
            if ptr is None:
                state = self._initial(
                    spark, self.table.at_version(spark, latest))
                if self._write(spark, state, latest, 0, None):
                    return int(latest)
                continue  # a concurrent refresh built first: rebase
            if int(ptr["table_version"]) >= int(latest):
                return int(ptr["table_version"])
            try:
                cur = spark.read.parquet(f"{self.store}/{ptr['dir']}")
                expected = [c for c, _ in self._n_cols()]
                if any(c not in cur.columns for c in expected):
                    # a store written before per-aggregate non-null
                    # counts existed: its avg/var state carries the old
                    # live-row denominator, semantically incompatible
                    # with the null-excluding one — rebuild from the
                    # table instead of absorbing into stale state
                    state = self._initial(
                        spark, self.table.at_version(spark, latest))
                else:
                    changes = self.table.changes_between(
                        spark, int(ptr["table_version"]), int(latest),
                        preimages=True)
                    state = self._absorb(cur, self._delta(changes))
                won = self._write(spark, state, latest,
                                  int(ptr["refresh"]) + 1, ptr)
            except Exception:
                # a racing winner may have pruned ptr['dir'] under our
                # in-flight read — only a LOST race reads as progress;
                # anything else re-raises
                now = self._pointer()
                if now and int(now["refresh"]) > int(ptr["refresh"]):
                    continue
                raise
            if won:
                return int(latest)
        raise RuntimeError(
            f"refresh lost the pointer race {self._REFRESH_RETRIES} "
            f"times on {self.store}")

    def _write(self, spark: SparkSession, state: DataFrame,
               table_version: int, refresh_no: int,
               prev: "dict | None") -> bool:
        """Stage the state under a WRITER-UNIQUE dir, then CAS-publish
        the refresh-numbered pointer marker. On a lost CAS the staged
        dir is removed and nothing published — the caller rebases. The
        winner prunes the superseded result dir and markers older than
        the previous one (kept so a reader holding a stale listing can
        still resolve)."""
        dir_name = (f"r{int(refresh_no)}"
                    f".{os.getpid()}.{threading.get_ident()}"
                    f".{next(_stage_counter)}")
        target = f"{self.store}/{dir_name}"
        state.write.mode("overwrite").parquet(target)
        if not self._publish_exclusive(table_version, refresh_no,
                                       dir_name):
            shutil.rmtree(target, ignore_errors=True)
            return False
        if prev and prev.get("dir") and prev["dir"] != dir_name:
            shutil.rmtree(f"{self.store}/{prev['dir']}",
                          ignore_errors=True)
        for n in range(max(0, int(refresh_no) - 8), int(refresh_no) - 1):
            try:
                os.unlink(self._marker(n))
            except OSError:
                pass
        return True

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
            n = F.col(f"_mv_n_{name}") if kind in ("avg", "var", "std") \
                else None
            if kind == "count":
                cols.append(F.col(_COUNT).alias(name))
            elif kind == "sum":
                cols.append(F.col(f"_mv_sum_{name}").alias(name))
            elif kind == "avg":
                # SQL AVG: NULL inputs excluded from the denominator;
                # an all-NULL group is NULL, not a division error
                cols.append(F.when(n > 0, F.col(f"_mv_sum_{name}") / n)
                            .alias(name))
            else:  # var / std over exactly-maintained moments
                mean = F.col(f"_mv_sum_{name}").cast("double") / n
                var = (F.col(f"_mv_sq_{name}").cast("double") / n
                       - mean * mean)
                var = F.greatest(var, F.lit(0.0))  # fp guard at var≈0
                cols.append(F.when(n > 0, var if kind == "var"
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
        # skip_restores: the feed is a NOTIFICATION here, never applied
        # rows — refresh() re-reads the authoritative window from the
        # log (whose net-diff fallback handles a restore correctly), so
        # the served view may follow the table across a RESTORE instead
        # of failing the stream like an applying consumer must
        feed = (spark.readStream.format("cdc_change_feed")
                .option("path", self.table.path)
                .option("op_col", self.table.op_col)
                .option("skip_restores", "true")
                .option("deleted_col", self.table.DELETED).load())

        def absorb(batch_df, batch_id):
            self.refresh(batch_df.sparkSession)

        w = (feed.writeStream.foreachBatch(absorb)
             .option("checkpointLocation", checkpoint))
        w = w.trigger(**trigger) if trigger else w
        return w.start()
