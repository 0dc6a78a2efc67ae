"""CdcChangeFeedDataSource: the change feed of a merge-on-read CDC
table served as a PySpark 4 Python streaming data source — offsets are
table versions (exactly-once across restarts via the stream's own
offset log), each committed delta is one partition-local file read,
maintenance commits emit nothing, and copy-on-write merges / vacuumed
gaps error rather than serve silently-wrong feeds.
"""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from systems_spark.streaming import (CdcChangeFeedDataSource,
                                     PartitionedCdcTable)

PAY = "k long, s string, v long"
CH_SCHEMA = PAY + ", seq long, op string"


def _ch(spark, rows):
    return spark.createDataFrame(rows, CH_SCHEMA)


def _mor(spark, tmp_path, name="feedsrc", **kw):
    t = PartitionedCdcTable(str(tmp_path / name), key_cols="k",
                            app_id=name, num_buckets=4,
                            write_mode="merge_on_read", **kw)
    t.initialize(spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20)], PAY))
    return t


def _drain(spark, path, ckpt, sink_name, start_version=None):
    spark.dataSource.register(CdcChangeFeedDataSource)
    reader = spark.readStream.format("cdc_change_feed").option("path",
                                                               path)
    if start_version is not None:
        reader = reader.option("start_version", start_version)
    q = (reader.load().writeStream.outputMode("append")
         .format("memory").queryName(sink_name)
         .option("checkpointLocation", ckpt).start())
    q.processAllAvailable()
    return q


def test_feed_streams_committed_deltas_exactly_once(spark, tmp_path):
    t = _mor(spark, tmp_path)
    path = str(tmp_path / "feedsrc")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    t(_ch(spark, [(1, "a1", 11, 1, "update"),
                  (3, "c", 30, 1, "insert")]), 0)
    t(_ch(spark, [(2, "x", 0, 2, "delete")]), 1)

    spark.dataSource.register(CdcChangeFeedDataSource)

    def start():
        return (spark.readStream.format("cdc_change_feed")
                .option("path", path).load()
                .writeStream.outputMode("append").format("parquet")
                .option("path", out)
                .option("checkpointLocation", ckpt).start())

    q = start()
    q.processAllAvailable()
    got = {(r.k, r.s, r.seq, r.op)
           for r in spark.read.parquet(out).collect()}
    assert got == {(1, "a1", 1, "update"), (3, "c", 1, "insert"),
                   (2, "x", 2, "delete")}

    # a new commit while the stream is live is picked up incrementally
    t(_ch(spark, [(3, "c2", 31, 3, "update")]), 2)
    q.processAllAvailable()
    assert spark.read.parquet(out).count() == 4
    q.stop()

    # restart from the SAME checkpoint: nothing re-emits (offsets are
    # table versions in the stream's own offset log) — only NEW
    # commits flow after the restart
    q2 = start()
    q2.processAllAvailable()
    assert spark.read.parquet(out).count() == 4
    t(_ch(spark, [(9, "nine", 90, 4, "insert")]), 3)
    q2.processAllAvailable()
    rows = spark.read.parquet(out)
    assert rows.count() == 5
    assert {(r.k, r.op) for r in rows.collect()} >= {(9, "insert")}
    q2.stop()


def test_feed_skips_maintenance_commits(spark, tmp_path):
    t = _mor(spark, tmp_path)
    path = str(tmp_path / "feedsrc")
    t(_ch(spark, [(5, "e", 50, 1, "insert")]), 0)
    t.compact_deltas(spark)          # maintenance: emits nothing
    t(_ch(spark, [(5, "e2", 51, 2, "update")]), 1)

    q = _drain(spark, path, str(tmp_path / "ck2"), "feed3")
    got = [(r.k, r.s, r.op) for r in
           spark.table("feed3").orderBy("seq").collect()]
    assert got == [(5, "e", "insert"), (5, "e2", "update")]
    q.stop()


def test_feed_refuses_copy_on_write_merges(spark, tmp_path):
    t = PartitionedCdcTable(str(tmp_path / "cowsrc"), key_cols="k",
                            app_id="cowsrc", num_buckets=4)
    t.initialize(spark.createDataFrame([(1, "a", 10)], PAY))
    t(_ch(spark, [(1, "a1", 11, 1, "update")]), 0)

    spark.dataSource.register(CdcChangeFeedDataSource)
    q = (spark.readStream.format("cdc_change_feed")
         .option("path", str(tmp_path / "cowsrc")).load()
         .writeStream.format("memory").queryName("cowfeed")
         .option("checkpointLocation", str(tmp_path / "ck3")).start())
    with pytest.raises(Exception, match="merge_on_read"):
        q.processAllAvailable()
        raise AssertionError("stream should have failed")
    q.stop()


def test_feed_fails_loud_on_mid_stream_evolution(spark, tmp_path):
    """Columns added AFTER the stream pinned its schema must fail the
    stream (a restart re-pins) — silently dropping them would violate
    the feed contract."""
    t = _mor(spark, tmp_path, schema_evolution="merge")
    path = str(tmp_path / "feedsrc")
    t(_ch(spark, [(1, "a1", 11, 1, "update")]), 0)

    q = _drain(spark, path, str(tmp_path / "ck5"), "feed5")
    assert spark.table("feed5").count() == 1
    wide = spark.createDataFrame(
        [(2, "b1", 21, "extra", 2, "update")],
        "k long, s string, v long, w string, seq long, op string")
    t(wide, 1)  # evolves AFTER the pin
    with pytest.raises(Exception, match="restart the stream"):
        q.processAllAvailable()
        raise AssertionError("stream should have failed")
    q.stop()


def test_feed_rejects_flat_table_with_clear_error(spark, tmp_path):
    from systems_spark.streaming import CdcTable

    flat = CdcTable(str(tmp_path / "flat"), key_cols="k", app_id="f")
    flat.initialize(spark.createDataFrame([(1, "a", 10)], PAY))
    spark.dataSource.register(CdcChangeFeedDataSource)
    with pytest.raises(Exception, match="merge_on_read"):
        (spark.readStream.format("cdc_change_feed")
         .option("path", str(tmp_path / "flat")).load())


def test_mor_strict_rejects_malformed_batch_at_write(spark, tmp_path):
    t = _mor(spark, tmp_path)  # schema_evolution defaults to strict
    bad = spark.createDataFrame(
        [(1, 11, 1, "update")], "k long, v long, seq long, op string")
    with pytest.raises(ValueError, match="missing.*\\['s'\\]"):
        t(bad, 0)  # column s absent: rejected AT THE WRITE
    extra = spark.createDataFrame(
        [(1, "a", 11, "x", 1, "update")],
        "k long, s string, v long, bogus string, seq long, op string")
    with pytest.raises(ValueError, match="unexpected.*\\['bogus'\\]"):
        t(extra, 0)
    # nothing was committed, the table still reads fine
    assert t.current(spark).count() == 2


def test_feed_schema_evolution_null_fills_old_deltas(spark, tmp_path):
    t = _mor(spark, tmp_path, schema_evolution="merge")
    path = str(tmp_path / "feedsrc")
    t(_ch(spark, [(1, "a1", 11, 1, "update")]), 0)
    wide = spark.createDataFrame(
        [(2, "b1", 21, "extra", 2, "update")],
        "k long, s string, v long, w string, seq long, op string")
    t(wide, 1)  # manifest schema widens; the v0 delta lacks w

    q = _drain(spark, path, str(tmp_path / "ck4"), "feed4")
    rows = {r.k: r.w for r in spark.table("feed4").collect()}
    assert rows == {1: None, 2: "extra"}
    assert "w" in spark.table("feed4").columns
    q.stop()

def test_replicate_table_via_change_feed(spark, tmp_path):
    """The full replication loop, nothing but existing machinery: a
    merge-on-read source table's change feed streams into a REPLICA
    CdcTable through foreachBatch — the feed rows ARE change rows, the
    replica's fenced merge applies them, and exactly-once holds twice
    over (source offsets = versions; replica txn = (app, batch)). A
    fresh-checkpoint replay re-delivers everything and must change
    nothing."""
    from systems_spark.streaming import CdcTable

    seed = spark.createDataFrame([(1, "a", 10), (2, "b", 20)], PAY)
    src = _mor(spark, tmp_path)
    src(_ch(spark, [(1, "a1", 11, 1, "update"),
                    (3, "c", 30, 1, "insert")]), 0)
    src(_ch(spark, [(2, "x", 0, 2, "delete")]), 1)

    replica = CdcTable(str(tmp_path / "replica"), key_cols="k",
                       app_id="rep")
    replica.initialize(seed)
    spark.dataSource.register(CdcChangeFeedDataSource)

    def run(ckpt):
        q = (spark.readStream.format("cdc_change_feed")
             .option("path", str(tmp_path / "feedsrc")).load()
             .writeStream.foreachBatch(replica)
             .option("checkpointLocation", str(tmp_path / ckpt))
             .trigger(availableNow=True).start())
        assert q.awaitTermination(300)

    run("rck1")

    def live(t):
        return sorted((r.k, r.s, r.v) for r in t.current(spark).collect())

    assert live(replica) == live(src)
    n_versions = len(replica.versions(spark))

    # crash-replay shape: a FRESH checkpoint re-delivers every delta;
    # the replica's (app, batch) idempotence makes it all a no-op
    run("rck2")
    assert len(replica.versions(spark)) == n_versions
    assert live(replica) == live(src)

    # a new source commit flows through incrementally
    src(_ch(spark, [(5, "e", 50, 3, "insert")]), 2)
    run("rck1")
    assert live(replica) == live(src)


def test_feed_survives_auto_compaction_mid_stream(spark, tmp_path):
    """r12: auto_compact_pending folds the pending list DURING normal
    writes — to a live change-feed stream the fold must look like any
    maintenance commit (emits nothing, kills nothing), and every real
    change before/after it must arrive exactly once."""
    t = _mor(spark, tmp_path, name="acfeed", auto_compact_pending=2)
    path = str(tmp_path / "acfeed")
    q = _drain(spark, path, str(tmp_path / "ckac"), "acfeed_sink")
    t(_ch(spark, [(1, "a1", 11, 1, "update")]), 0)
    t(_ch(spark, [(3, "c", 30, 2, "insert")]), 1)   # triggers the fold
    assert t._latest_manifest(spark).get("pending", []) == []
    t(_ch(spark, [(3, "c2", 31, 3, "update")]), 2)  # post-fold epoch
    q.processAllAvailable()
    assert q.isActive  # the fold never killed the stream
    got = [(r.k, r.s, r.op) for r in
           spark.table("acfeed_sink").orderBy("seq").collect()]
    assert got == [(1, "a1", "update"), (3, "c", "insert"),
                   (3, "c2", "update")]
    q.stop()
