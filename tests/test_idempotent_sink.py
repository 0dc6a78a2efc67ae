"""IdempotentParquetSink: the exactly-once foreachBatch sink.

The contract under test is the replay semantics the honesty notes in
``streaming_cms_counters``/``StreamingCusum`` defer to: replaying an
already-committed (app_id, batch_id) leaves the sink state BYTE-
identical, uncommitted data directories are invisible to readers, and a
real restarted StreamingQuery re-delivering its epochs does not
duplicate a single row."""

import glob
import json
import os
import sys
import time

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from systems_spark.streaming import IdempotentParquetSink


def _frame(spark, ids):
    return spark.createDataFrame([(i, f"v{i}") for i in ids],
                                 "id long, payload string")


def _state(spark, sink):
    df = sink.committed_frame(spark)
    if df is None:
        return []
    return sorted((r.id, r.payload, r.batch_id) for r in df.collect())


def test_replay_is_noop(spark, tmp_path):
    """Calling the sink twice with the same batch_id (the crash-replay
    shape: same epoch, same data) changes nothing the second time."""
    sink = IdempotentParquetSink(str(tmp_path / "out"), app_id="q1")
    sink(_frame(spark, [1, 2, 3]), 0)
    before = _state(spark, sink)
    files_before = sorted(glob.glob(str(tmp_path / "out" / "**" / "*"),
                                    recursive=True))
    mtimes_before = [os.path.getmtime(f) for f in files_before]

    sink(_frame(spark, [1, 2, 3]), 0)  # replay
    assert _state(spark, sink) == before
    files_after = sorted(glob.glob(str(tmp_path / "out" / "**" / "*"),
                                   recursive=True))
    # not just logically equal: the replay wrote NOTHING (same files,
    # same mtimes)
    assert files_after == files_before
    assert [os.path.getmtime(f) for f in files_after] == mtimes_before


def test_batches_accumulate_and_manifest_attests(spark, tmp_path):
    sink = IdempotentParquetSink(str(tmp_path / "out"), app_id="q1")
    sink(_frame(spark, [1, 2]), 0)
    sink(_frame(spark, [3]), 1)
    assert _state(spark, sink) == [(1, "v1", 0), (2, "v2", 0), (3, "v3", 1)]
    commits = sink.commits(spark)
    assert sorted(commits) == [0, 1]
    assert commits[0]["rows"] == 2 and commits[1]["rows"] == 1
    # checksum is the exact decimal sum of per-row xxhash64
    got = spark.read.parquet(str(tmp_path / "out" / "batch_id=0"))
    want = got.agg(F.sum(F.xxhash64(*[F.col(c) for c in got.columns])
                         .cast("decimal(38,0)"))).collect()[0][0]
    assert commits[0]["checksum"] == str(want)


def test_uncommitted_data_is_invisible_until_retried(spark, tmp_path):
    """Crash between data write and marker: the orphan directory is
    excluded from the read view; the epoch's retry commits it (and
    clobbers the half-written attempt, not merges with it)."""
    out = str(tmp_path / "out")
    sink = IdempotentParquetSink(out, app_id="q1")
    sink(_frame(spark, [1]), 0)
    # simulate the crashed attempt of batch 1: data lands, no marker —
    # and the attempt was even WRONG/partial (id 99)
    _frame(spark, [99]).write.mode("overwrite").parquet(out + "/batch_id=1")
    assert _state(spark, sink) == [(1, "v1", 0)]
    assert not sink.is_committed(spark, 1)
    # the engine replays epoch 1 with the true data
    sink(_frame(spark, [2]), 1)
    assert _state(spark, sink) == [(1, "v1", 0), (2, "v2", 1)]


def test_two_apps_share_a_sink_without_colliding(spark, tmp_path):
    out = str(tmp_path / "out")
    a = IdempotentParquetSink(out, app_id="qa")
    b = IdempotentParquetSink(out, app_id="qb")
    a(_frame(spark, [1]), 0)
    # same batch_id, different app → NOT a replay for b
    assert not b.is_committed(spark, 0)
    with pytest.raises(ValueError):
        IdempotentParquetSink(out, app_id="")


def test_restarted_streaming_query_does_not_duplicate(spark, tmp_path):
    """End-to-end replay: a file-source StreamingQuery writes through the
    sink with a checkpoint, is stopped, and restarted over the same
    checkpoint after MORE files arrive — re-delivered epochs no-op, new
    epochs land, and the final state equals the batch ground truth."""
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    os.makedirs(src)
    sink = IdempotentParquetSink(out, app_id="e2e")

    def run_once():
        stream = (spark.readStream.schema("id long, payload string")
                  .option("maxFilesPerTrigger", "1").parquet(src + "/*"))
        q = (stream.writeStream.foreachBatch(sink)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    _frame(spark, [1, 2]).coalesce(1).write.mode("overwrite") \
        .parquet(src + "/f0.parquet")
    run_once()
    first = _state(spark, sink)
    assert sorted(r[0] for r in first) == [1, 2]

    time.sleep(1.1)  # distinct mtime so the file source orders f1 after f0
    _frame(spark, [3]).coalesce(1).write.mode("overwrite") \
        .parquet(src + "/f1.parquet")
    run_once()  # restart over the same checkpoint
    final = _state(spark, sink)
    assert sorted(r[0] for r in final) == [1, 2, 3]
    # every committed batch's manifest rows sum to the total — nothing
    # delivered twice ever landed twice
    assert sum(m["rows"] for m in sink.commits(spark).values()) == 3
