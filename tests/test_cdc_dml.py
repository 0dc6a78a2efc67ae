"""Predicate DML on the CDC tables — ``DELETE FROM … WHERE`` and
``UPDATE … SET … WHERE`` compiled to change batches through the
standard fenced merge: one full scan finds the matched rows (the
inherent cost of an arbitrary predicate), everything downstream is
batch-proportional and inherits every table guarantee — tombstones,
auto-seq past the fence, OCC, CHECK-constraint validation of UPDATE
postimages, touched-bucket pruning (copy-on-write) and O(batch) delta
commits (merge-on-read).
"""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from systems_spark.streaming import CdcTable, PartitionedCdcTable

PAY = "k long, s string, v long"
CH_SCHEMA = PAY + ", seq long, op string"


def _ch(spark, rows):
    return spark.createDataFrame(rows, CH_SCHEMA)


def _seed(spark):
    return spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], PAY)


def test_delete_where_flat(spark, tmp_path):
    t = CdcTable(str(tmp_path / "t"), "k", app_id="w")
    t.initialize(_seed(spark))
    v = t.delete_where(spark, "v >= 20")
    assert v == 0
    assert {r.k for r in t.current(spark).collect()} == {1}
    # the tombstones carry an auto-seq PAST the deleted rows' seqs, so
    # a replayed old upsert (seq 0) cannot resurrect them
    t(_ch(spark, [(2, "late", 99, 0, "update")]), 7)
    assert {r.k for r in t.current(spark).collect()} == {1}
    # but a genuinely newer change wins
    t(_ch(spark, [(2, "back", 99, 10, "insert")]), 8)
    assert {r.k: r.s for r in t.current(spark).collect()} \
        == {1: "a", 2: "back"}


def test_delete_where_no_match_is_no_commit(spark, tmp_path):
    t = CdcTable(str(tmp_path / "t"), "k", app_id="w")
    t.initialize(_seed(spark))
    n = len(t.versions(spark))
    assert t.delete_where(spark, "v > 1000") is None
    assert len(t.versions(spark)) == n


def test_update_where_simultaneous_assignments(spark, tmp_path):
    t = CdcTable(str(tmp_path / "t"), "k", app_id="w")
    t.initialize(_seed(spark))
    # v := v + s-length; s := concat — both read the OLD row
    t.update_where(spark, F.col("k") <= 2,
                   {"v": "v + length(s)", "s": "concat(s, v)"})
    got = {r.k: (r.s, r.v) for r in t.current(spark).collect()}
    assert got == {1: ("a10", 11), 2: ("b20", 21), 3: ("c", 30)}


def test_update_where_guards(spark, tmp_path):
    t = CdcTable(str(tmp_path / "t"), "k", app_id="w")
    t.initialize(_seed(spark))
    with pytest.raises(ValueError, match="merge key"):
        t.update_where(spark, "v > 0", {"k": "k + 100"})
    with pytest.raises(ValueError, match="no such column"):
        t.update_where(spark, "v > 0", {"nope": "1"})
    assert t.update_where(spark, "v > 1000", {"v": "0"}) is None


def test_update_respects_check_constraints(spark, tmp_path):
    t = CdcTable(str(tmp_path / "t"), "k", app_id="w")
    t.initialize(_seed(spark))
    t.add_constraint(spark, "v_small", "v < 100")
    with pytest.raises(ValueError, match="v_small"):
        t.update_where(spark, "k = 1", {"v": "v + 1000"})
    assert {r.k: r.v for r in t.current(spark).collect()}[1] == 10


def test_dml_auto_seq_clears_the_fence(spark, tmp_path):
    t = CdcTable(str(tmp_path / "t"), "k", app_id="w")
    t.initialize(_seed(spark))
    t(_ch(spark, [(2, "b", 20, 5, "delete")]), 0)
    t.compact(spark, fence_seq=50)  # fence far past current seqs
    v = t.update_where(spark, "k = 1", {"v": "v * 2"})
    assert v is not None
    # had the auto-seq not cleared the fence, the merge would have
    # silently dropped the update at entry
    assert {r.k: r.v for r in t.current(spark).collect()}[1] == 20


def test_partitioned_delete_rewrites_only_touched_buckets(spark,
                                                          tmp_path):
    t = PartitionedCdcTable(str(tmp_path / "t"), "k", app_id="w",
                            num_buckets=8)
    seed = spark.createDataFrame(
        [(k, f"s{k}", k * 10) for k in range(1, 17)], PAY)
    t.initialize(seed)
    before = t._mapping(t._latest_manifest(spark))
    bucket_of = {r.k: r.b for r in seed.select(
        "k", F.pmod(F.xxhash64("k"), F.lit(8)).cast("int").alias("b")
    ).collect()}
    t.delete_where(spark, "k = 5")
    after = t._mapping(t._latest_manifest(spark))
    touched = {b for b, v in after.items() if v != before.get(b)}
    assert touched == {bucket_of[5]}
    assert 5 not in {r.k for r in t.current(spark).collect()}


def test_mor_delete_commits_delta_not_buckets(spark, tmp_path):
    t = PartitionedCdcTable(str(tmp_path / "t"), "k", app_id="w",
                            num_buckets=8, write_mode="merge_on_read")
    t.initialize(_seed(spark))
    man0 = t._latest_manifest(spark)
    t.delete_where(spark, "v >= 20")
    man1 = t._latest_manifest(spark)
    assert man1["buckets"] == man0["buckets"]  # no bucket rewrites
    assert len(man1["pending"]) == 1
    assert {r.k for r in t.current(spark).collect()} == {1}


def test_dml_does_not_steal_the_streams_next_epoch(spark, tmp_path):
    """DML with batch_id=None records idempotence under a distinct
    ``#dml`` txn key. Before this, it claimed txn[app_id]+1 — and a
    live stream's next GENUINE epoch then read as replayed and was
    silently dropped (data loss when mixing DML with a stream on one
    handle)."""
    t = CdcTable(str(tmp_path / "t"), "k", app_id="w")
    t.initialize(_seed(spark))
    t(_ch(spark, [(4, "d", 40, 1, "insert")]), 0)   # stream epoch 0
    t.delete_where(spark, "k = 2")                  # auto batch_id DML
    man = t._latest_manifest(spark)
    assert man["txn"]["w"] == 0          # stream slot untouched
    assert man["txn"]["w#dml"] == 0      # DML under its own key
    # the stream's next genuine epoch MUST still apply
    t(_ch(spark, [(5, "e", 50, 2, "insert")]), 1)
    assert {r.k for r in t.current(spark).collect()} == {1, 3, 4, 5}
    # and a second auto DML claims the next #dml slot, also applying
    t.update_where(spark, "k = 1", {"v": "v + 1"})
    man = t._latest_manifest(spark)
    assert man["txn"]["w#dml"] == 1
    assert {r.k: r.v for r in t.current(spark).collect()}[1] == 11


def test_dml_distinct_txn_key_partitioned_mor(spark, tmp_path):
    t = PartitionedCdcTable(str(tmp_path / "t"), "k", app_id="w",
                            num_buckets=4, write_mode="merge_on_read")
    t.initialize(_seed(spark))
    t(_ch(spark, [(4, "d", 40, 1, "insert")]), 0)
    t.delete_where(spark, "k = 2")
    man = t._latest_manifest(spark)
    assert man["txn"]["w"] == 0 and man["txn"]["w#dml"] == 0
    t(_ch(spark, [(5, "e", 50, 2, "insert")]), 1)   # not dropped
    assert {r.k for r in t.current(spark).collect()} == {1, 3, 4, 5}


def test_explicit_batch_id_dml_keeps_stream_key(spark, tmp_path):
    """A caller passing an explicit batch_id has opted into the
    stream's idempotence sequence — behavior unchanged."""
    t = CdcTable(str(tmp_path / "t"), "k", app_id="w")
    t.initialize(_seed(spark))
    t.delete_where(spark, "k = 2", batch_id=3)
    man = t._latest_manifest(spark)
    assert man["txn"]["w"] == 3
    assert "w#dml" not in man["txn"]


def test_update_where_rejects_generated_columns(spark, tmp_path):
    """SET on a GENERATED column raises (the Delta writer contract)
    instead of being silently overwritten at commit."""
    t = CdcTable(str(tmp_path / "t"), "k", app_id="w")
    t.initialize(_seed(spark))
    t.add_generated_column(spark, "v2", "v * 2")
    with pytest.raises(ValueError, match="GENERATED"):
        t.update_where(spark, "k = 1", {"v2": "999"})
    # non-generated assignments still work; v2 recomputes
    t.update_where(spark, "k = 1", {"v": "v + 5"})
    got = {r.k: (r.v, r.v2) for r in t.current(spark).collect()}
    assert got[1] == (15, 30)
