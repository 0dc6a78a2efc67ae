"""Replication behavior under source REBUCKET and RESTORE (VERDICT
r10 item 5): a replica fed by the change-feed streaming source
(streaming/cdf_source.py) must either stay correct or fail LOUDLY —
never silently diverge.

- ``rebucket()`` is content-identical (same rows, new bucket layout):
  the feed emits nothing for it and the stream continues; the replica
  keeps matching the source.
- ``restore()`` rolls live content back with NO change file — no
  stream of changes can express it, so an APPLYING consumer's stream
  raises; recovery = resync the replica from the restored snapshot and
  restart from a new checkpoint at ``start_version=<restore version>``.
- a NOTIFICATION-only consumer (the continuously served materialized
  view, which re-reads authoritative windows from the log on every
  trigger) opts into ``skip_restores`` and follows the table across
  the restore via the net-diff fallback.
"""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from systems_spark.streaming import (CdcChangeFeedDataSource, CdcTable,
                                     MaterializedAggView,
                                     PartitionedCdcTable)

PAY = "k long, grp string, v long"
CH_SCHEMA = PAY + ", seq long, op string"


def _ch(spark, rows):
    return spark.createDataFrame(rows, CH_SCHEMA)


def _seed(spark):
    return spark.createDataFrame(
        [(k, "x" if k % 2 else "y", k * 10) for k in range(1, 9)], PAY)


def _snap(table, spark):
    return sorted(tuple(r) for r in
                  table.current(spark).select("k", "grp", "v").collect())


def _replicate(spark, src_path, replica, ckpt, start_version=None):
    spark.dataSource.register(CdcChangeFeedDataSource)
    r = (spark.readStream.format("cdc_change_feed")
         .option("path", src_path))
    if start_version is not None:
        r = r.option("start_version", str(start_version))
    q = (r.load().writeStream.foreachBatch(replica)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    return q


def test_replica_survives_source_rebucket(spark, tmp_path):
    src = PartitionedCdcTable(str(tmp_path / "src"), "k", app_id="w",
                              num_buckets=4, write_mode="merge_on_read")
    src.initialize(_seed(spark))
    src(_ch(spark, [(1, "x", 11, 1, "update")]), 0)
    replica = CdcTable(str(tmp_path / "replica"), "k", app_id="r")
    replica.initialize(_seed(spark))
    ckpt = str(tmp_path / "ck")
    _replicate(spark, str(tmp_path / "src"), replica, ckpt)
    assert _snap(replica, spark) == _snap(src, spark)

    # content-identical relayout mid-stream, then more changes
    src.rebucket(spark, 8)
    src(_ch(spark, [(9, "z", 90, 2, "insert"),
                    (2, "y", 20, 2, "delete")]), 1)
    _replicate(spark, str(tmp_path / "src"), replica, ckpt)
    assert _snap(replica, spark) == _snap(src, spark)


def test_applying_stream_raises_on_restore_then_resyncs(spark, tmp_path):
    src = PartitionedCdcTable(str(tmp_path / "src"), "k", app_id="w",
                              num_buckets=4, write_mode="merge_on_read")
    src.initialize(_seed(spark))
    src(_ch(spark, [(1, "x", 11, 1, "update")]), 0)          # v0
    replica = CdcTable(str(tmp_path / "replica"), "k", app_id="r")
    replica.initialize(_seed(spark))
    ckpt = str(tmp_path / "ck")
    _replicate(spark, str(tmp_path / "src"), replica, ckpt)
    assert _snap(replica, spark) == _snap(src, spark)

    restore_v = src.restore(spark, -1)       # roll back to the seed
    src(_ch(spark, [(9, "z", 90, 5, "insert")]), 1)
    with pytest.raises(Exception, match="RESTORE"):
        q = _replicate(spark, str(tmp_path / "src"), replica, ckpt)
        raise AssertionError(
            f"stream must fail on a restore commit, got {q.status}")
    # the replica was NOT silently diverged-and-continued: it still
    # holds the pre-restore state it last applied
    assert _snap(replica, spark) != _snap(src, spark)

    # recovery: resync from the restored snapshot, NEW checkpoint,
    # start_version at the restore commit — catches up and re-matches
    replica2 = CdcTable(str(tmp_path / "replica2"), "k", app_id="r2")
    replica2.initialize(src.at_version(spark, restore_v)
                        .where(~F.col(src.DELETED))
                        .drop(src.seq_col, src.DELETED))
    _replicate(spark, str(tmp_path / "src"), replica2,
               str(tmp_path / "ck2"), start_version=restore_v)
    assert _snap(replica2, spark) == _snap(src, spark)


def test_served_view_follows_across_restore(spark, tmp_path):
    """The notification-only consumer: serve() skips the restore
    commit and its refresh applies the rollback through the net-diff
    fallback — the view keeps matching a recompute."""
    t = PartitionedCdcTable(str(tmp_path / "t"), "k", app_id="w",
                            num_buckets=4, write_mode="merge_on_read")
    t.initialize(_seed(spark))
    view = MaterializedAggView(
        t, str(tmp_path / "mv"), group_cols=["grp"],
        aggs={"n": ("count", None),
              "total": ("sum", "CAST(v AS DECIMAL(18,2))")})
    view.refresh(spark)
    t(_ch(spark, [(1, "x", 11, 1, "update"),
                  (9, "z", 90, 1, "insert")]), 0)
    ckpt = str(tmp_path / "ck")
    q = view.serve(spark, ckpt, trigger={"availableNow": True})
    q.awaitTermination(120)

    t.restore(spark, -1)                       # roll back to the seed
    t(_ch(spark, [(5, "q", 55, 9, "insert")]), 1)
    q = view.serve(spark, ckpt, trigger={"availableNow": True})
    q.awaitTermination(120)
    assert view.reflected_version() == t._latest_version(spark)
    got = {r.grp: (r.n, float(r.total))
           for r in view.result(spark).collect()}
    want = {r.grp: (r.n, float(r.total)) for r in
            t.current(spark).groupBy("grp")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.expr("CAST(v AS DECIMAL(18,2))"))
                 .alias("total")).collect()}
    assert got == want
