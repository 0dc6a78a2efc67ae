"""Stateful-streaming operator tests: StreamingSessionizer
(applyInPandasWithState with event-time timeouts) must agree with the
batch Sessionize operator on replayed data, and the Kafka config/decode
surface must be exercised without a broker."""

import os
import sys
import time

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from systems_spark.operators.sessionize import Sessionize
from systems_spark.streaming import (
    StreamingSessionizer,
    decode_kafka_json,
    kafka_source_options,
)


EVENT_SCHEMA = StructType([
    StructField("user", StringType()),
    StructField("ts", TimestampType()),
    StructField("value", DoubleType()),
])


def _events(spark, rows):
    return spark.createDataFrame(
        [(u, __import__("datetime").datetime.utcfromtimestamp(t), v)
         for u, t, v in rows],
        EVENT_SCHEMA,
    )


def test_streaming_sessionizer_multi_batch(spark, tmp_path):
    """Sessions split on gap within a batch, carry state ACROSS batches,
    and close via event-time timeout when the watermark passes."""
    src = str(tmp_path / "src")
    os.makedirs(src)

    base = 1_700_000_000  # fixed epoch; tz-independent (utcfromtimestamp)
    batch1 = [("a", base + 0, 1.0), ("a", base + 10, 2.0),
              ("b", base + 5, 5.0)]
    batch2 = [("a", base + 15, 3.0),       # continues a's open session
              ("a", base + 100, 4.0),      # gap 85s > 30s → new session
              ("b", base + 200, 6.0)]      # gap 195s → new session for b
    flush = [("zz", base + 10_000, 0.0)]   # advances watermark, times out all

    # mtime ordering drives file-stream batch order
    for i, rows in enumerate([batch1, batch2, flush]):
        p = f"{src}/f{i}.parquet"
        _events(spark, rows).coalesce(1).write.mode("overwrite").parquet(p)
        t = time.time() + i * 10
        for root, _, files in os.walk(p):
            for f in files:
                os.utime(os.path.join(root, f), (t, t))

    stream = (spark.readStream.schema(EVENT_SCHEMA)
              .option("maxFilesPerTrigger", "1").parquet(src + "/*"))
    op = StreamingSessionizer("user", "ts", gap_seconds=30,
                              value_col="value", watermark="1 second")
    q = (op(stream).writeStream.outputMode("append").format("memory")
         .queryName("sessions").trigger(availableNow=True).start())
    q.awaitTermination(120)

    got = {
        (r.user, r.session_start_us, r.session_end_us, r.n_events, r.total_value)
        for r in spark.sql("SELECT * FROM sessions").collect()
        if r.user != "zz"
    }
    us = 1_000_000
    expected = {
        ("a", (base + 0) * us, (base + 15) * us, 3, 6.0),
        ("a", (base + 100) * us, (base + 100) * us, 1, 4.0),
        ("b", (base + 5) * us, (base + 5) * us, 1, 5.0),
        ("b", (base + 200) * us, (base + 200) * us, 1, 6.0),
    }
    assert got == expected


def test_streaming_sessionizer_matches_batch_twin(spark, tmp_path):
    """Replaying the whole stream must yield the same (start, end, count)
    sessions the batch Sessionize operator computes on the static data."""
    base = 1_700_000_000
    rows = [("a", base + t, 1.0) for t in (0, 10, 15, 100, 130, 400)] + \
           [("b", base + t, 1.0) for t in (5, 50, 70, 300)]

    static = _events(spark, rows).withColumn(
        "ts_us", F.col("ts").cast("long") * 1_000_000
    )
    gap_us = 30 * 1_000_000
    batch = (
        Sessionize("user", "ts_us", gap_us)(static)
        .groupBy("user", "session_id")
        .agg(F.min("ts_us").alias("session_start_us"),
             F.max("ts_us").alias("session_end_us"),
             F.count(F.lit(1)).alias("n_events"))
    )
    batch_sessions = {
        (r.user, r.session_start_us, r.session_end_us, r.n_events)
        for r in batch.collect()
    }

    src = str(tmp_path / "replay")
    _events(spark, rows + [("zz", base + 100_000, 0.0)]).write.parquet(src)
    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(src)
    op = StreamingSessionizer("user", "ts", gap_seconds=30,
                              value_col="value", watermark="1 second")
    q = (op(stream).writeStream.outputMode("append").format("memory")
         .queryName("replayed").trigger(availableNow=True).start())
    q.awaitTermination(120)

    stream_sessions = {
        (r.user, r.session_start_us, r.session_end_us, r.n_events)
        for r in spark.sql("SELECT * FROM replayed").collect()
        if r.user != "zz"
    }
    assert stream_sessions == batch_sessions


def test_windowed_rollup_append_drops_late_data(spark, tmp_path):
    """The production append path of windowed_rollup, across checkpointed
    restarts: (1) a window whose end the watermark has passed is emitted
    to the sink exactly once; (2) an event arriving AFTER the watermark
    passed its window is dropped — it neither updates the finalized
    window nor re-emits it; (3) a still-open window flushes once a later
    run's watermark passes it. This is the semantics the complete-mode
    graded queries can't show (complete re-emits everything and drops
    nothing)."""
    from systems_spark.streaming import windowed_rollup

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    os.makedirs(src, exist_ok=True)
    base = 1_700_000_000

    def run_batch(name, rows):
        # FileStreamSource scans the directory FLAT — stage the batch and
        # move its part files in under unique names
        import glob
        import shutil

        stage = str(tmp_path / f"stage_{name}")
        _events(spark, rows).coalesce(1).write.parquet(stage)
        for i, f in enumerate(glob.glob(os.path.join(stage, "*.parquet"))):
            shutil.move(f, os.path.join(src, f"{name}_{i}.parquet"))
        stream = spark.readStream.schema(EVENT_SCHEMA).parquet(src)
        agg = windowed_rollup(stream, "ts", "user", "1 minute",
                              watermark="5 seconds")
        q = (agg.writeStream.outputMode("append").format("parquet")
             .option("path", out).option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        assert q.awaitTermination(120)

    def sink():
        got = {}
        try:
            rows = spark.read.parquet(out).collect()
        except Exception:  # no data files yet — nothing emitted
            return got
        for r in rows:
            key = (r.user, int(r.window.start.timestamp()))
            got[key] = got.get(key, 0) + r.n
        return got

    def wstart(t):  # tumbling windows align to epoch multiples of 60s
        return t - t % 60

    w1, w2, w3 = wstart(base + 1), wstart(base + 600), wstart(base + 700)

    # run 1: two events in w1; the event at +600 pushes the watermark to
    # +595, finalizing w1 (availableNow runs a follow-up batch, so the
    # emission lands within the run)
    run_batch("b1", [("a", base + 1, 1.0), ("a", base + 10, 1.0),
                     ("a", base + 600, 1.0)])
    assert sink() == {("a", w1): 2}

    # run 2: resumes from the checkpoint with watermark 595; the LATE
    # event for w1 (+20 ≪ watermark) must be dropped at the stateful
    # operator — the finalized window is neither updated nor re-emitted
    run_batch("b2", [("a", base + 20, 1.0), ("a", base + 700, 1.0)])
    got = sink()
    assert got[("a", w1)] == 2, got

    # run 3: one more advancing event (watermark → 795); by now w2 and
    # w3 (ends < 795) have each flushed EXACTLY once, w1 is still exactly
    # once (no re-emission), and run 3's own +800 window is still open
    run_batch("b3", [("a", base + 800, 1.0)])
    assert sink() == {("a", w1): 2, ("a", w2): 1, ("a", w3): 1}


def test_running_aggregator_transform_with_state(spark, tmp_path):
    """transformWithStateInPandas processor: per-key running totals
    accumulate ACROSS micro-batches; final totals match the static agg.
    (Skip-gated: Spark's transformWithState protocol needs protobuf —
    reference graceful-skip pattern, SURVEY.md §5.8.)"""
    pytest.importorskip("google.protobuf.descriptor")
    from systems_spark.streaming import RunningAggregator

    src = str(tmp_path / "tws")
    os.makedirs(src)
    batch1 = [("a", 1.0), ("a", 2.0), ("b", 5.0)]
    batch2 = [("a", 4.0), ("b", 1.0), ("c", 9.0)]
    schema = "user string, value double"
    for i, rows in enumerate([batch1, batch2]):
        p = f"{src}/f{i}.parquet"
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(p)
        t = time.time() + i * 10
        for root, _, files in os.walk(p):
            for f in files:
                os.utime(os.path.join(root, f), (t, t))

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", "1").parquet(src + "/*"))
    op = RunningAggregator("user", "value")
    q = (op(stream).writeStream.outputMode("update").format("memory")
         .queryName("running").trigger(availableNow=True).start())
    q.awaitTermination(120)

    # last emitted row per key = final running totals
    rows = spark.sql(
        "SELECT * FROM (SELECT *, row_number() OVER "
        "(PARTITION BY user ORDER BY n_events DESC) rn FROM running) "
        "WHERE rn = 1"
    ).collect()
    got = {(r.user, r.n_events, r.total_value) for r in rows}
    assert got == {("a", 3, 7.0), ("b", 2, 6.0), ("c", 1, 9.0)}


def test_running_aggregator_ttl_validation():
    """Bad TTL units fail fast driver-side with a readable error (r1
    ADVICE: the old executor-side regex crashed with AttributeError)."""
    from systems_spark.streaming import RunningAggregator

    assert RunningAggregator.parse_ttl_ms("30 seconds") == 30_000
    assert RunningAggregator.parse_ttl_ms("1 minute") == 60_000
    assert RunningAggregator.parse_ttl_ms("2 hours") == 7_200_000
    assert RunningAggregator.parse_ttl_ms("1 day") == 86_400_000
    assert RunningAggregator.parse_ttl_ms("500 ms") == 500
    import pytest as _pt

    with _pt.raises(ValueError, match="unsupported ttl"):
        RunningAggregator("k", "v", ttl="1 fortnight")
    with _pt.raises(ValueError, match="unsupported ttl"):
        RunningAggregator("k", "v", ttl="soon")


def test_stream_dedup_within_watermark(spark, tmp_path):
    """Duplicate event_ids arriving within the watermark window are
    suppressed; state is watermark-bounded."""
    from systems_spark.streaming import stream_dedup

    import datetime
    base = 1_700_000_000
    rows = [(1, datetime.datetime.utcfromtimestamp(base + 0)),
            (1, datetime.datetime.utcfromtimestamp(base + 5)),   # dup
            (2, datetime.datetime.utcfromtimestamp(base + 10)),
            (2, datetime.datetime.utcfromtimestamp(base + 11)),  # dup
            (3, datetime.datetime.utcfromtimestamp(base + 20))]
    schema = "event_id long, ts timestamp"
    src = str(tmp_path / "dups")
    spark.createDataFrame(rows, schema).write.parquet(src)

    stream = spark.readStream.schema(schema).parquet(src)
    deduped = stream_dedup(stream, "event_id", ts_col="ts",
                           watermark="30 seconds")
    q = (deduped.writeStream.outputMode("append").format("memory")
         .queryName("deduped").trigger(availableNow=True).start())
    q.awaitTermination(120)

    got = sorted(r.event_id for r in spark.sql("SELECT * FROM deduped").collect())
    assert got == [1, 2, 3]


def test_stream_stream_join_attribution(spark, tmp_path):
    """Windowed stream-stream join: purchases attribute to views of the
    same user within the delay window; matches the static join."""
    from systems_spark.streaming import stream_stream_join

    base = 1_700_000_000
    views = [("a", base + 0), ("a", base + 100), ("b", base + 50)]
    buys = [("a", base + 30), ("a", base + 500), ("b", base + 400)]

    import datetime
    vdf_rows = [(u, datetime.datetime.utcfromtimestamp(t)) for u, t in views]
    bdf_rows = [(u, datetime.datetime.utcfromtimestamp(t)) for u, t in buys]
    vschema = "user string, view_ts timestamp"
    bschema = "user string, buy_ts timestamp"

    vp, bp = str(tmp_path / "views"), str(tmp_path / "buys")
    spark.createDataFrame(vdf_rows, vschema).write.parquet(vp)
    spark.createDataFrame(bdf_rows, bschema).write.parquet(bp)

    vstream = spark.readStream.schema(vschema).parquet(vp)
    bstream = spark.readStream.schema(bschema).parquet(bp)
    joined = stream_stream_join(vstream, bstream, "user",
                                "view_ts", "buy_ts", max_delay="60 seconds",
                                watermark="1 second")
    q = (joined.writeStream.outputMode("append").format("memory")
         .queryName("attrib").trigger(availableNow=True).start())
    q.awaitTermination(120)

    got = {(r.user, int(r.view_ts.timestamp()), int(r.buy_ts.timestamp()))
           for r in spark.sql("SELECT * FROM attrib").collect()}
    # static truth: buy within [view, view+60s]
    want = {(u, vt, bt) for u, vt in views for bu, bt in buys
            if bu == u and vt <= bt <= vt + 60}
    assert got == want
    assert ("a", base + 0, base + 30) in got  # the attributed purchase


def test_kafka_config_surface():
    opts = kafka_source_options(
        "broker1:9092,broker2:9092", "events",
        starting_offsets="earliest", max_offsets_per_trigger=100_000,
        **{"kafka.security.protocol": "SASL_SSL"},
    )
    assert opts["kafka.bootstrap.servers"] == "broker1:9092,broker2:9092"
    assert opts["subscribe"] == "events"
    assert opts["startingOffsets"] == "earliest"
    assert opts["failOnDataLoss"] == "false"
    assert opts["maxOffsetsPerTrigger"] == "100000"
    assert opts["kafka.security.protocol"] == "SASL_SSL"


def test_decode_kafka_json(spark):
    """Decode works on any DataFrame with Kafka's wire schema — no broker
    needed to test the parse path."""
    import datetime
    wire = spark.createDataFrame(
        [(b"k1", b'{"user": "a", "value": 2.5}', "events", 0, 42,
          datetime.datetime(2026, 1, 1))],
        "key binary, value binary, topic string, partition int, "
        "offset long, timestamp timestamp",
    )
    payload = StructType([
        StructField("user", StringType()),
        StructField("value", DoubleType()),
    ])
    row = decode_kafka_json(wire, payload).collect()[0]
    assert (row.kafka_key, row.user, row.value, row.offset) == ("k1", "a", 2.5, 42)


FUNNEL_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("event_type", StringType()),
    StructField("ts", TimestampType()),
    StructField("event_id", LongType()),
])


def _funnel_events(spark, rows):
    import datetime

    return spark.createDataFrame(
        [(u, t, datetime.datetime.utcfromtimestamp(ts), i)
         for u, t, ts, i in rows],
        FUNNEL_SCHEMA,
    )


def test_streaming_funnel_state_machine_multi_batch(spark, tmp_path):
    """The per-user state machine carries the reached step ACROSS
    micro-batches and frees state on completion."""
    from systems_spark.streaming import StreamingFunnel

    src = str(tmp_path / "fsrc")
    os.makedirs(src)
    base = 1_700_000_000
    batch1 = [(1, "view", base + 0, 1), (1, "click", base + 10, 2),
              (2, "click", base + 0, 3)]          # click before view: no-op
    batch2 = [(1, "purchase", base + 20, 4),       # completes u1
              (2, "view", base + 10, 5), (2, "click", base + 20, 6)]
    for i, rows in enumerate([batch1, batch2]):
        p = f"{src}/f{i}.parquet"
        _funnel_events(spark, rows).coalesce(1).write.mode("overwrite").parquet(p)
        t = time.time() + i * 10
        for root, _, files in os.walk(p):
            for f in files:
                os.utime(os.path.join(root, f), (t, t))

    stream = (spark.readStream.schema(FUNNEL_SCHEMA)
              .option("maxFilesPerTrigger", "1").parquet(src + "/*"))
    op = StreamingFunnel(("view", "click", "purchase"), ts_col="ts",
                         watermark="1 second")
    q = (op(stream).writeStream.outputMode("append").format("memory")
         .queryName("sfunnel").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {(r.user_id, r.step, r.step_name, r.ts_us, r.event_id)
           for r in spark.sql("SELECT * FROM sfunnel").collect()}
    us = 1_000_000
    assert got == {
        (1, 1, "view", (base + 0) * us, 1),
        (1, 2, "click", (base + 10) * us, 2),
        (1, 3, "purchase", (base + 20) * us, 4),
        (2, 1, "view", (base + 10) * us, 5),
        (2, 2, "click", (base + 20) * us, 6),
    }


def test_streaming_funnel_matches_batch_twin(spark, tmp_path):
    """An in-order drain must reproduce the batch funnel bit-for-bit."""
    from systems_spark.operators.funnel import funnel
    from systems_spark.streaming import StreamingFunnel

    base = 1_700_000_000
    rows = []
    eid = 0
    for u in range(1, 9):
        for t, typ in ((0, "view"), (5, "click"), (9, "view"),
                       (12, "purchase") if u % 2 else (12, "error")):
            rows.append((u, typ, base + t + u, eid)); eid += 1
    static = _funnel_events(spark, rows)

    batch = {(r.user_id, r.step, r.step_name, r.ts_us, r.event_id)
             for r in funnel(
                 static.withColumn("ts_us", F.col("ts").cast("long") * 1_000_000),
                 ("view", "click", "purchase")).collect()}

    src = str(tmp_path / "fsrc2")
    static.coalesce(1).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(FUNNEL_SCHEMA).parquet(src)
    op = StreamingFunnel(("view", "click", "purchase"), ts_col="ts",
                         watermark="1 second")
    q = (op(stream).writeStream.outputMode("append").format("memory")
         .queryName("sfunnel2").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {(r.user_id, r.step, r.step_name, r.ts_us, r.event_id)
           for r in spark.sql("SELECT * FROM sfunnel2").collect()}
    assert got == batch and len(got) > 0


def test_streaming_funnel_no_reentry_after_completion(spark, tmp_path):
    """Review r5: a completed user keeps a terminal tombstone — a second
    full chain in a later batch must NOT emit duplicate completions."""
    from systems_spark.streaming import StreamingFunnel

    src = str(tmp_path / "fsrc3")
    os.makedirs(src)
    base = 1_700_000_000
    batch1 = [(1, "view", base + 0, 1), (1, "click", base + 1, 2),
              (1, "purchase", base + 2, 3)]
    batch2 = [(1, "view", base + 10, 4), (1, "click", base + 11, 5),
              (1, "purchase", base + 12, 6)]
    for i, rows in enumerate([batch1, batch2]):
        p = f"{src}/f{i}.parquet"
        _funnel_events(spark, rows).coalesce(1).write.mode("overwrite").parquet(p)
        t = time.time() + i * 10
        for root, _, files in os.walk(p):
            for f in files:
                os.utime(os.path.join(root, f), (t, t))
    stream = (spark.readStream.schema(FUNNEL_SCHEMA)
              .option("maxFilesPerTrigger", "1").parquet(src + "/*"))
    op = StreamingFunnel(("view", "click", "purchase"), ts_col="ts",
                         watermark="1 second")
    q = (op(stream).writeStream.outputMode("append").format("memory")
         .queryName("sfunnel3").trigger(availableNow=True).start())
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM sfunnel3").collect()
    assert len(rows) == 3  # exactly one chain, no re-entry duplicates
    assert sorted(r.step for r in rows) == [1, 2, 3]


def test_streaming_funnel_state_ttl_expires_abandoned_funnels(spark, tmp_path):
    """VERDICT r5 item 8: without within_us, state_ttl_us reclaims
    MID-funnel state via the event-time timeout once the watermark
    passes anchor + TTL — the expired user restarts a FRESH chain
    (step-1 row re-emitted), while a COMPLETED user's tombstone is
    exempt and still blocks duplicate chains."""
    from systems_spark.streaming import StreamingFunnel

    src = str(tmp_path / "fsrc4")
    os.makedirs(src)
    base = 1_700_000_000
    batches = [
        # b1: u1 stalls mid-funnel at step 1; u2 completes
        [(1, "view", base + 0, 1),
         (2, "view", base + 0, 10), (2, "click", base + 1, 11),
         (2, "purchase", base + 2, 12)],
        # b2: unrelated u3 pushes the watermark far past u1's TTL
        [(3, "view", base + 100, 20)],
        # b3: no u1/u2 data -> u1's timed-out state is reclaimed here
        [(3, "click", base + 101, 21)],
        # b4: u1 full fresh chain (must emit steps 1,2,3 anew);
        #     u2 second full chain (must emit NOTHING: tombstone)
        [(1, "view", base + 110, 2), (1, "click", base + 111, 3),
         (1, "purchase", base + 112, 4),
         (2, "view", base + 110, 13), (2, "click", base + 111, 14),
         (2, "purchase", base + 112, 15)],
    ]
    for i, rows in enumerate(batches):
        p = f"{src}/f{i}.parquet"
        _funnel_events(spark, rows).coalesce(1).write.mode("overwrite").parquet(p)
        t = time.time() + i * 10
        for root, _, files in os.walk(p):
            for f in files:
                os.utime(os.path.join(root, f), (t, t))
    stream = (spark.readStream.schema(FUNNEL_SCHEMA)
              .option("maxFilesPerTrigger", "1").parquet(src + "/*"))
    op = StreamingFunnel(("view", "click", "purchase"), ts_col="ts",
                         watermark="1 second",
                         state_ttl_us=10 * 1_000_000)
    q = (op(stream).writeStream.outputMode("append").format("memory")
         .queryName("sfunnel4").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {(r.user_id, r.step, r.event_id)
           for r in spark.sql("SELECT * FROM sfunnel4").collect()}
    us = 1_000_000
    assert got == {
        (1, 1, 1),                       # b1 mid-funnel progress
        (1, 1, 2), (1, 2, 3), (1, 3, 4),  # fresh chain after expiry
        (2, 1, 10), (2, 2, 11), (2, 3, 12),  # completed once, only once
        (3, 1, 20), (3, 2, 21),
    }


def test_streaming_funnel_stale_rearm_does_not_kill_query(spark, tmp_path):
    """Review r6: a NON-advancing event arriving after the user's TTL
    deadline already passed the watermark used to re-arm the timeout
    with a stale timestamp — INVALID_TIMEOUT_TIMESTAMP, dead query. The
    clamp re-arms just above the watermark instead; the state then
    expires in the next data-less batch and the user restarts fresh."""
    from systems_spark.streaming import StreamingFunnel

    src = str(tmp_path / "fsrc5")
    os.makedirs(src)
    base = 1_700_000_000
    batches = [
        [(1, "view", base + 0, 1)],             # u1 mid-funnel, ttl 10s
        [(3, "view", base + 100, 20)],          # watermark -> ~base+99
        [(1, "error", base + 110, 30)],         # non-advancing, stale re-arm
        [(3, "click", base + 120, 21)],         # u1 absent -> timeout fires
        [(1, "view", base + 130, 2), (1, "click", base + 131, 3),
         (1, "purchase", base + 132, 4)],       # fresh chain must emit 1,2,3
    ]
    for i, rows in enumerate(batches):
        p = f"{src}/f{i}.parquet"
        _funnel_events(spark, rows).coalesce(1).write.mode("overwrite").parquet(p)
        t = time.time() + i * 10
        for root, _, files in os.walk(p):
            for f in files:
                os.utime(os.path.join(root, f), (t, t))
    stream = (spark.readStream.schema(FUNNEL_SCHEMA)
              .option("maxFilesPerTrigger", "1").parquet(src + "/*"))
    op = StreamingFunnel(("view", "click", "purchase"), ts_col="ts",
                         watermark="1 second", state_ttl_us=10 * 1_000_000)
    q = (op(stream).writeStream.outputMode("append").format("memory")
         .queryName("sfunnel5").trigger(availableNow=True).start())
    q.awaitTermination(120)
    assert q.exception() is None  # pre-fix: PySparkValueError killed it
    got = {(r.user_id, r.step, r.event_id)
           for r in spark.sql("SELECT * FROM sfunnel5").collect()}
    assert got == {(1, 1, 1),
                   (1, 1, 2), (1, 2, 3), (1, 3, 4),
                   (3, 1, 20), (3, 2, 21)}


def test_streaming_funnel_ttl_validation(spark):
    from systems_spark.streaming import StreamingFunnel

    import pytest
    with pytest.raises(ValueError):
        StreamingFunnel(("view", "click"), state_ttl_us=0)
