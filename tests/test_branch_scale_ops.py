"""Tests: branch concat, sessionize, range join, strict lookup, native
streaming session windows. (Bucketed zero-shuffle joins moved to
test_sources_plans.py::test_bucketed_join_needs_no_shuffle.)"""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from systems_spark import Pipeline
from systems_spark.operators import (
    QueryFeatureTable,
    RangeJoin,
    Rename,
    SelectColumns,
    Sessionize,
)
from systems_spark.operators.branch import BranchConcat, Subgraph


def test_branch_concat_column_union(spark):
    """reference + semantics: branches on the same upstream, column concat
    (test_graph.py:56-61); right-biased on collisions."""
    df = spark.createDataFrame([(1, 10.0), (2, 20.0)], "id long, x double")
    b1 = Pipeline([SelectColumns(["id", "x"]), Rename(mapping={"x": "x_a"})])
    b2 = Pipeline([SelectColumns(["id", "x"])]) >> (
        lambda d: d.withColumn("x2", F.col("x") * 2)
    )
    op = BranchConcat([b1, b2], key="id")
    out = op(df)
    assert set(out.columns) == {"id", "x_a", "x", "x2"}
    got = {r.id: (r.x_a, r.x2) for r in out.collect()}
    assert got == {1: (10.0, 20.0), 2: (20.0, 40.0)}


def test_subgraph_named_node_and_roundtrip(spark, tmp_path):
    """reference: Subgraph — named sub-DAG usable as a node
    (tests/unit/systems/ops/tf/test_ensemble.py:263-265). A fitted
    Subgraph nested in a Pipeline must survive save/load with identical
    outputs (persistence pattern, test_ensemble.py:27-58)."""
    from systems_spark.operators import Categorify

    df = spark.createDataFrame(
        [("a", 1.0), ("b", 2.0), ("a", 3.0)], "cat string, x double"
    )
    inner = Pipeline([Categorify(["cat"], out_suffix="_c")])
    sub = Subgraph("encode", inner)
    pipe = Pipeline([sub, Rename(mapping={"x": "x_renamed"})])
    pipe.fit(df)
    before = sorted(map(tuple, pipe.transform(df).collect()))

    path = str(tmp_path / "nested")
    pipe.save(path)
    loaded = Pipeline.load(path, spark=spark)
    after = sorted(map(tuple, loaded.transform(df).collect()))
    assert before == after
    assert loaded.operators[0].name == "encode"


def test_branch_concat_roundtrip(spark, tmp_path):
    """BranchConcat persists each branch as a nested pipeline."""
    df = spark.createDataFrame([(1, 10.0), (2, 20.0)], "id long, x double")
    b1 = Pipeline([SelectColumns(["id", "x"]), Rename(mapping={"x": "x_a"})])
    b2 = Pipeline([SelectColumns(["id"])])
    pipe = Pipeline([BranchConcat([b1, b2], key="id")])
    before = sorted(map(tuple, pipe.transform(df).collect()))

    path = str(tmp_path / "branches")
    pipe.save(path)
    loaded = Pipeline.load(path, spark=spark)
    after = sorted(map(tuple, loaded.transform(df).collect()))
    assert before == after


def test_branch_concat_requires_key(spark):
    df = spark.createDataFrame([(1, 2.0)], "id long, x double")
    op = BranchConcat([Pipeline([SelectColumns(["x"])])], key="id")
    with pytest.raises(ValueError, match="dropped key"):
        op(df)


def test_sessionize_gap_semantics(spark):
    rows = [
        (1, 100), (1, 200), (1, 5000),   # gap 4800 > 1000 → new session
        (2, 50),
    ]
    df = spark.createDataFrame(rows, "user long, ts long")
    out = Sessionize("user", "ts", gap=1000)(df).collect()
    sessions = {(r.user, r.ts): r.session_id for r in out}
    assert sessions[(1, 100)] == 1
    assert sessions[(1, 200)] == 1
    assert sessions[(1, 5000)] == 2
    assert sessions[(2, 50)] == 1


def test_range_join_matches_theta_join(spark, tables):
    ev = tables["events"].limit(2000)
    bands = spark.range(10).select(
        F.col("id").alias("band"),
        (F.col("id") * 10.0).alias("lo"),
        ((F.col("id") + 1) * 10.0).alias("hi"),
    )
    fast = RangeJoin(bands, "value", bucket_size=7.0, broadcast=True)(ev)
    slow = ev.join(bands, (ev.value >= bands.lo) & (ev.value < bands.hi))
    a = sorted((r.event_id, r.band) for r in fast.select("event_id", "band").collect())
    b = sorted((r.event_id, r.band) for r in slow.select("event_id", "band").collect())
    assert a == b


def test_strict_feature_lookup_raises_on_empty(spark, tables):
    """feast.py:215-219 parity: empty id set raises."""
    part = tables["part"]
    empty = spark.createDataFrame([], "p_partkey long")
    op = QueryFeatureTable(part, "p_partkey", features=["p_brand"], strict=True)
    with pytest.raises(ValueError, match="empty id set"):
        op(empty)
    # non-strict passes through
    assert QueryFeatureTable(part, "p_partkey", features=["p_brand"])(empty).count() == 0


def test_corpus_curation_antijoin_is_aqe_decided(spark):
    """VERDICT r3 item 1: the survivors anti-join must carry NO broadcast
    hint — dup losers can be 30-60% of a real corpus, so a forced
    broadcast is an OOM at 100 TB. With the hint gone the analyzed plan
    has no ResolvedHint anywhere in this query; AQE picks
    broadcast-vs-shuffle from the measured loser size at runtime."""
    import __spark_entry__ as entry

    df = entry.q_corpus_curation(spark, "/root/testdata/sf0.001")
    analyzed = df._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in analyzed, analyzed
    assert "Join LeftAnti" in analyzed  # the anti-join itself is still there


def test_streaming_session_window(spark, tables, tmp_path):
    """Native Structured Streaming session windows (the streaming twin of
    the batch Sessionize operator)."""
    src = str(tmp_path / "ssrc")
    ev = tables["events"].limit(800).withColumn(
        "ts_ts", F.timestamp_micros(F.expr("ts div 1000"))
    )
    ev.write.mode("overwrite").parquet(src)
    static = spark.read.parquet(src)
    stream = spark.readStream.schema(static.schema).parquet(src)
    agg = (
        stream.withWatermark("ts_ts", "1 minute")
        .groupBy(F.session_window("ts_ts", "30 minutes"), "user_id")
        .count()
    )
    q = (agg.writeStream.outputMode("complete").format("memory")
         .queryName("sess_test").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.sql("select count(*) c from sess_test").first().c
    want = (static.groupBy(F.session_window("ts_ts", "30 minutes"), "user_id")
            .count().count())
    assert got == want and got > 0


def test_sessionize_closed_left_matches_session_window_boundary(spark):
    """Boundary-convention pin: native session_window MERGES an event
    whose gap to the previous event is exactly the session gap — the same
    convention as Sessionize's default closed='right' (split on diff >
    gap), so batch backfills agree with the streaming twin out of the
    box. closed='left' gives the end-exclusive alternative (split on
    diff >= gap). Hand-built data where the conventions disagree; this
    pin also guards the streaming_sessions oracle, whose real event data
    never lands exactly on a boundary."""
    from systems_spark.operators.sessionize import Sessionize

    gap_us = 1800 * 1_000_000
    base = 1_700_000_000 * 1_000_000
    # gaps of exactly gap, gap-1, gap+1 → right (and native): 2 sessions,
    # left: 3 sessions
    ts = [base, base + gap_us, base + 2 * gap_us - 1, base + 3 * gap_us]
    df = spark.createDataFrame(
        [(1, i, t) for i, t in enumerate(ts)], "user_id long, eid long, ts_us long"
    ).withColumn("ts_ts", F.timestamp_micros(F.col("ts_us")))

    def sessions(closed):
        out = Sessionize("user_id", "ts_us", gap_us, order_cols=["eid"],
                         closed=closed)(df)
        return (out.groupBy("session_id")
                .agg(F.min("ts_us").alias("s"), F.count(F.lit(1)).alias("n"))
                .collect())

    left = {(r.s, r.n) for r in sessions("left")}
    right = {(r.s, r.n) for r in sessions("right")}
    native = {
        (r.s, r.n) for r in
        df.groupBy(F.session_window("ts_ts", "30 minutes"))
        .agg(F.min("ts_us").alias("s"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert right == native == {(ts[0], 3), (ts[3], 1)}
    assert left == {(ts[0], 1), (ts[1], 2), (ts[3], 1)}

    with pytest.raises(ValueError, match="closed"):
        Sessionize("user_id", "ts_us", gap_us, closed="both")
