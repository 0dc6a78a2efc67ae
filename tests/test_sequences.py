"""User-sequence export lane (__spark_entry__.q_user_sequences).

VERDICT r5 item 2: the per-user collect buffer must be bounded by the
row_number pre-rank — and the bounded form must be value-identical to
the straightforward collect-everything-then-slice form.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from pyspark.sql import Window
from pyspark.sql import functions as F

SF = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")


def _unbounded_reference(ev, n):
    """The pre-r6 formulation: collect the user's FULL history, sort,
    slice — correct, but an unbounded aggregation buffer under skew."""
    seq = (ev.groupBy("user_id")
           .agg(F.slice(
               F.reverse(F.array_sort(F.collect_list(
                   F.struct(F.col("ts_us").alias("t"),
                            F.col("event_id").alias("i"))))),
               1, n).alias("_recent")))
    return seq.select(
        "user_id",
        F.transform(F.col("_recent"), lambda s: s["i"]).alias("recent_ids"),
        F.size("_recent").cast("long").alias("seq_len"))


def _bounded(ev, n):
    """The shipped shape, parameterized over an events frame (mirrors
    q_user_sequences exactly; the lane itself is oracle-pinned)."""
    w = (Window.partitionBy("user_id")
         .orderBy(F.col("ts_us").desc(), F.col("event_id").desc()))
    top = ev.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") <= n)
    seq = (top.groupBy("user_id")
           .agg(F.reverse(F.array_sort(F.collect_list(
               F.struct(F.col("ts_us").alias("t"),
                        F.col("event_id").alias("i"))))).alias("_recent")))
    return seq.select(
        "user_id",
        F.transform(F.col("_recent"), lambda s: s["i"]).alias("recent_ids"),
        F.size("_recent").cast("long").alias("seq_len"))


def _as_dict(df):
    return {r.user_id: (tuple(r.recent_ids), r.seq_len) for r in df.collect()}


def test_bounded_equals_unbounded_on_skewed_fixture(spark):
    """One 5000-event bot user + sparse organic users (incl. ties on ts,
    a single-event user, and an exactly-N user): the pre-ranked form is
    value-identical to the full-history collect."""
    n = 20
    rows = [(1, t, 10_000 + t) for t in range(5000)]          # bot user
    rows += [(2, 7, 1), (2, 7, 2), (2, 7, 3)]                 # ts ties
    rows += [(3, 99, 500)]                                    # single event
    rows += [(4, t * 3, 600 + t) for t in range(n)]           # exactly N
    rows += [(5, 1000 - t, 900 + t) for t in range(n + 5)]    # N + 5
    ev = spark.createDataFrame(
        rows, "user_id long, ts_us long, event_id long")
    got = _as_dict(_bounded(ev, n))
    want = _as_dict(_unbounded_reference(ev, n))
    assert got == want
    assert got[1][1] == n and got[1][0][0] == 10_000 + 4999
    assert got[3] == ((500,), 1)


def test_temporal_split_embargo_gap_holds(spark):
    """The split's defining guarantee: no test row within the embargo
    of any train row (train.max + embargo <= test.min)."""
    rows = entrymod.q_temporal_split(spark, SF).collect()
    d = {r.split: r for r in rows}
    assert set(d) == {"train", "test"}
    assert d["test"].min_ts_us - d["train"].max_ts_us >= entrymod._EMBARGO_US
    assert d["train"].n_rows > d["test"].n_rows > 0


def test_lane_matches_unbounded_reference_at_sf(spark):
    """The shipped lane (parquet input) equals the unbounded reference
    on the real sf0.01 events table."""
    ev = entrymod._t(spark, SF, "events").select(
        "user_id", F.expr("ts div 1000").alias("ts_us"), "event_id")
    got = _as_dict(entrymod.q_user_sequences(spark, SF))
    want = _as_dict(_unbounded_reference(ev, entrymod._SEQ_N))
    assert got == want and len(got) > 0
