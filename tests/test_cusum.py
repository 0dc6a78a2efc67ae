"""CUSUM monitoring (operators/cusum.py + streaming StreamingCusum)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from systems_spark.operators.cusum import cusum_chart, cusum_chart_sql

TARGET, SLACK, H = 100, 10, 50


def _py_cusum(vals):
    """Independent direct-recursion reference (the definition, not the
    running-min identity the operator uses)."""
    s_pos = s_neg = 0
    out = []
    for v in vals:
        s_pos = max(0, s_pos + (v - TARGET - SLACK))
        s_neg = max(0, s_neg + (TARGET - SLACK - v))
        out.append((s_pos, s_neg, int(s_pos > H), int(s_neg > H)))
    return out


def _df(spark, rows):
    return spark.createDataFrame(rows, "g string, t long, v long")


def test_identity_matches_direct_recursion(spark):
    """The running-min window identity equals the textbook max(0, .)
    recursion point-for-point, including resets to zero."""
    vals = [100, 180, 90, 20, 20, 200, 200, 100, 5, 5, 5, 150]
    rows = [("a", i, v) for i, v in enumerate(vals)]
    got = [(r.s_pos_micros, r.s_neg_micros, r.alert_up, r.alert_down)
           for r in cusum_chart(_df(spark, rows), ["g"], ["t"], "v",
                                TARGET, SLACK, H)
           .orderBy("t").collect()]
    assert got == _py_cusum(vals)


def test_sustained_shift_alerts_spike_does_not(spark):
    """A single sub-h spike never alerts (and decays by the slack); a
    SUSTAINED +40 run accumulates 30/step past h and stays alerted —
    the whole point of the statistic."""
    vals = [100] * 5 + [140] + [100] * 5      # spike: s peaks at 30 < h
    vals2 = [100] * 5 + [140] * 5             # sustained: 30/step
    rows = ([("spike", i, v) for i, v in enumerate(vals)]
            + [("sust", i, v) for i, v in enumerate(vals2)])
    chart = cusum_chart(_df(spark, rows), ["g"], ["t"], "v",
                        TARGET, SLACK, H)
    spike_alerts = chart.where((F.col("g") == "spike")
                               & (F.col("alert_up") == 1)).count()
    sust = chart.where((F.col("g") == "sust")
                       & (F.col("alert_up") == 1)).count()
    assert spike_alerts == 0  # 30 < h, then decays 20, 10, 0
    assert sust >= 3          # 30, 60, 90, 120, 150 — alerts from 60 on
    down = cusum_chart(_df(spark, [("d", i, 30) for i in range(5)]),
                       ["g"], ["t"], "v", TARGET, SLACK, H)
    assert down.agg(F.sum("alert_down")).collect()[0][0] >= 4


def test_matches_duckdb_bit_for_bit(spark):
    import duckdb

    rows = [(f"g{i % 2}", i, ((i * 37) % 250)) for i in range(80)]
    got = sorted(map(tuple, cusum_chart(
        _df(spark, rows), ["g"], ["t"], "v", TARGET, SLACK, H).collect()))
    vals = ",".join(f"('{g}', {t}, {v})" for g, t, v in rows)
    want = sorted(map(tuple, duckdb.connect().execute(cusum_chart_sql(
        f"SELECT * FROM (VALUES {vals}) t(g, t, v)", ["g"], ["t"], "v",
        TARGET, SLACK, H)).fetchall()))
    assert got == want


def test_validation(spark):
    with pytest.raises(ValueError):
        cusum_chart(_df(spark, [("a", 1, 1)]), ["g"], ["t"], "v",
                    100, slack_micros=-1)
    with pytest.raises(ValueError):
        cusum_chart_sql("SELECT 1", ["g"], ["t"], "v", 100, h_micros=0)


def test_streaming_matches_batch_across_three_batch_split(spark, tmp_path):
    """CUSUM state is forward-only, so an in-order MULTI-batch replay
    is bit-equal to the batch chart — stronger than the funnel's
    single-batch-only parity."""
    import uuid

    from systems_spark.streaming.stateful import StreamingCusum

    rows = [(f"k{i % 2}", 1_700_000_000_000_000 + i * 1_000_000, i,
             ((i * 53) % 240)) for i in range(60)]
    src = str(tmp_path / "stream")
    os.makedirs(src)
    # three files in ts order; file stream reads them as 3 micro-batches
    for b in range(3):
        spark.createDataFrame(
            rows[b * 20:(b + 1) * 20],
            "key string, ts_us long, event_id long, value_micros long") \
            .coalesce(1).write.parquet(f"{src}/b{b}")
    batch_in = spark.read.parquet(f"{src}/b*").select(
        "key", "ts_us", "event_id", "value_micros")
    batch = sorted(map(tuple, cusum_chart(
        batch_in, ["key"], ["ts_us", "event_id"], "value_micros",
        TARGET, SLACK, H).collect()))

    stream = (spark.readStream
              .schema("key string, ts_us long, event_id long,"
                      " value_micros long")
              .option("maxFilesPerTrigger", 1)
              .parquet(f"{src}/b*")
              .withColumn("ts_ts", F.timestamp_micros(F.col("ts_us"))))
    mon = StreamingCusum("key", "ts_ts", "event_id", "value_micros",
                         TARGET, SLACK, H)
    name = "t_cusum_" + uuid.uuid4().hex[:8]
    q = (mon(stream).writeStream.outputMode("append").format("memory")
         .queryName(name).trigger(availableNow=True).start())
    assert q.awaitTermination(120)
    drained = sorted(
        (r.key, r.ts_us, r.event_id, r.value_micros, r.s_pos_micros,
         r.s_neg_micros, r.alert_up, r.alert_down)
        for r in spark.table(name).collect())
    assert drained == batch
