"""Merge-on-read writes (PartitionedCdcTable write_mode=
"merge_on_read"): a change batch commits as a delta log entry in
O(batch) I/O — buckets untouched — and readers fold pending deltas
through the same fenced merge; compact_deltas folds them back into
only the buckets they touch. Equivalence with copy-on-write is the
correctness anchor throughout.
"""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from systems_spark.streaming import PartitionedCdcTable

PAY = "k long, s string, v long"
CH_SCHEMA = PAY + ", seq long, op string"


def _ch(spark, rows):
    return spark.createDataFrame(rows, CH_SCHEMA)


def _seed(spark, n=40):
    return spark.createDataFrame(
        [(k, f"s{k}", k * 10) for k in range(n)], PAY)


def _mk(spark, tmp_path, name, mode, **kw):
    t = PartitionedCdcTable(str(tmp_path / name), key_cols="k",
                            app_id=name, num_buckets=8,
                            write_mode=mode, **kw)
    t.initialize(_seed(spark))
    return t


def _live(t, spark):
    return sorted((r.k, r.s, r.v) for r in t.current(spark).collect())


BATCHES = [
    [(1, "a1", 11, 1, "update"), (100, "new", 0, 1, "insert"),
     (9, "x", 0, 1, "delete")],
    [(1, "a2", 12, 2, "update"), (9, "back", 90, 2, "insert"),
     (17, "y", 0, 2, "delete")],
    [(100, "z", 0, 3, "delete"), (25, "u", 250, 3, "update")],
]


def test_mor_equals_cow_and_writes_no_buckets(spark, tmp_path):
    cow = _mk(spark, tmp_path, "cow", "copy_on_write")
    mor = _mk(spark, tmp_path, "mor", "merge_on_read")
    for i, b in enumerate(BATCHES):
        cow(_ch(spark, b), i)
        mor(_ch(spark, b), i)
    assert _live(mor, spark) == _live(cow, spark)

    base = str(tmp_path / "mor")
    names = os.listdir(base)
    # MOR wrote one delta dir per batch and NO bucket rewrites: the
    # only version= dir is the seed's
    assert sorted(n for n in names if n.startswith("delta=")) == [
        "delta=0__mor", "delta=1__mor", "delta=2__mor"]
    assert [n for n in names if n.startswith("version=")] == [
        "version=-1__mor"]
    man = mor._latest_manifest(spark)
    assert len(man["pending"]) == 3

    # batch replay is still a no-op (txn map)
    n = len(mor.versions(spark))
    mor(_ch(spark, [(1, "STALE", 0, 9, "update")]), 1)
    assert len(mor.versions(spark)) == n
    assert _live(mor, spark) == _live(cow, spark)


def test_compact_deltas_folds_only_dirty_buckets(spark, tmp_path):
    mor = _mk(spark, tmp_path, "mor", "merge_on_read")
    for i, b in enumerate(BATCHES):
        mor(_ch(spark, b), i)
    before = _live(mor, spark)

    v = mor.compact_deltas(spark)
    man = mor._latest_manifest(spark)
    assert man["pending"] == []
    assert _live(mor, spark) == before  # fold is content-identical

    # only the buckets the delta keys hash into were rewritten
    touched_keys = {r[0] for b in BATCHES for r in b}
    expect_dirty = {
        r[0] for r in
        _seed(spark).where(F.col("k").isin(list(touched_keys)))
        .select(mor._bucket_expr()).distinct().collect()}
    # include buckets of inserted (not-in-seed) keys
    ins = spark.createDataFrame([(100,)], "k long")
    expect_dirty |= {r[0] for r in
                     ins.select(mor._bucket_expr()).distinct().collect()}
    dirty_written = {
        b for b, wv in mor._mapping(man).items() if wv == v}
    assert dirty_written == expect_dirty

    # idempotent when nothing is pending
    assert mor.compact_deltas(spark) == v

    # a second round of deltas + fold still matches a COW twin
    cow = _mk(spark, tmp_path, "cow", "copy_on_write")
    for i, b in enumerate(BATCHES):
        cow(_ch(spark, b), i)
    more = [(2, "late", 22, 4, "update"), (9, "gone", 0, 4, "delete")]
    mor(_ch(spark, more), 3)
    cow(_ch(spark, more), 3)
    mor.compact_deltas(spark)
    assert _live(mor, spark) == _live(cow, spark)


def test_mor_time_travel_and_restore(spark, tmp_path):
    mor = _mk(spark, tmp_path, "mor", "merge_on_read")
    mor(_ch(spark, BATCHES[0]), 0)                      # v0 (delta)
    mor(_ch(spark, BATCHES[1]), 1)                      # v1 (delta)
    # the view AT v0 folds exactly one delta
    at0 = {r.k: r.s for r in mor.at_version(spark, 0)
           .where("NOT _cdc_deleted").collect()}
    assert at0[1] == "a1" and 9 not in at0 and at0[100] == "new"

    v = mor.restore(spark, 0)
    assert mor._latest_manifest(spark)["pending"] == []  # materialized
    got = {r.k: r.s for r in mor.current(spark).collect()}
    assert got[1] == "a1" and 9 not in got and got[100] == "new"
    # append-only: v1's folded view is still readable
    at1 = {r.k: r.s for r in mor.at_version(spark, 1)
           .where("NOT _cdc_deleted").collect()}
    assert at1[1] == "a2" and at1[9] == "back"
    assert v == 2


def test_mor_tombstone_compact_folds_first_and_fences(spark, tmp_path):
    mor = _mk(spark, tmp_path, "mor", "merge_on_read")
    mor(_ch(spark, [(3, "x", 0, 1, "delete"),
                    (5, "y", 0, 2, "delete")]), 0)
    v = mor.compact(spark, fence_seq=2)  # folds deltas, then compacts
    man = mor._latest_manifest(spark)
    assert man["pending"] == [] and mor.fence(spark) == 2
    snap = mor.snapshot(spark)
    assert snap.where("_cdc_deleted").count() == 0  # tombstones gone
    live = {r.k for r in mor.current(spark).collect()}
    assert 3 not in live and 5 not in live
    # a late pre-fence replay cannot resurrect the compacted keys
    mor(_ch(spark, [(3, "zombie", 30, 1, "insert")]), 5)
    assert 3 not in {r.k for r in mor.current(spark).collect()}
    assert v >= 1


def test_mor_vacuum_keeps_pending_then_sweeps_after_fold(spark, tmp_path):
    mor = _mk(spark, tmp_path, "mor", "merge_on_read")
    for i, b in enumerate(BATCHES):
        mor(_ch(spark, b), i)
    before = _live(mor, spark)
    mor.vacuum(spark, keep_last=1)
    # the kept manifest still references all three delta dirs
    base = str(tmp_path / "mor")
    assert len([n for n in os.listdir(base)
                if n.startswith("delta=")]) == 3
    assert _live(mor, spark) == before

    mor.compact_deltas(spark)
    mor.vacuum(spark, keep_last=1)
    assert [n for n in os.listdir(base) if n.startswith("delta=")] == []
    assert _live(mor, spark) == before


def test_mor_schema_evolution_through_a_delta(spark, tmp_path):
    mor = _mk(spark, tmp_path, "mor", "merge_on_read",
              schema_evolution="merge")
    mor(_ch(spark, BATCHES[0]), 0)
    wide = spark.createDataFrame(
        [(2, "b2", 22, "extra", 5, "update")],
        "k long, s string, v long, w string, seq long, op string")
    mor(wide, 1)
    cur = mor.current(spark)
    assert "w" in cur.columns
    got = {r.k: r.w for r in cur.collect()}
    assert got[2] == "extra" and got[1] is None  # old rows NULL-fill
    # folding to buckets preserves the evolved schema and content
    mor.compact_deltas(spark)
    cur2 = mor.current(spark)
    assert {r.k: r.w for r in cur2.collect()} == got


def test_mor_bucket_paths_guard(spark, tmp_path):
    mor = _mk(spark, tmp_path, "mor", "merge_on_read")
    mor(_ch(spark, BATCHES[0]), 0)
    with pytest.raises(ValueError, match="pending"):
        mor.bucket_paths(spark)
    mor.compact_deltas(spark)
    assert len(mor.bucket_paths(spark)) > 0


def test_mor_fold_plan_is_pending_count_independent(spark, tmp_path):
    """The reader-side fold is ONE batch window + ONE key join no
    matter how many deltas are pending — the plan's Exchange count
    must not grow with the pending list (the property that makes
    deferred compaction safe at scale)."""
    from systems_spark.plans import count_exchanges

    one = _mk(spark, tmp_path, "one", "merge_on_read")
    one(_ch(spark, [(1, "a1", 11, 1, "update")]), 0)
    five = _mk(spark, tmp_path, "five", "merge_on_read")
    for i in range(5):
        five(_ch(spark, [(1 + i, f"u{i}", i, i + 1, "update")]), i)
    assert len(five._latest_manifest(spark)["pending"]) == 5
    assert count_exchanges(five.snapshot(spark)) \
        == count_exchanges(one.snapshot(spark))


def test_table_conf_guard_and_rebucket(spark, tmp_path):
    """The log, not the constructor, owns the table configuration: a
    handle with the wrong bucket count must fail loudly (it would
    merge into the WRONG buckets), and rebucket() is the sanctioned
    full-rewrite path that flips the logged configuration."""
    t = _mk(spark, tmp_path, "conf", "copy_on_write")
    t(_ch(spark, [(1, "a1", 11, 1, "update")]), 0)
    before = _live(t, spark)

    wrong = PartitionedCdcTable(str(tmp_path / "conf"), key_cols="k",
                                app_id="conf2", num_buckets=32)
    with pytest.raises(ValueError, match="configured"):
        wrong(_ch(spark, [(2, "X", 0, 9, "update")]), 0)
    wrong_keys = PartitionedCdcTable(str(tmp_path / "conf"),
                                     key_cols="v", app_id="conf3",
                                     num_buckets=8)
    with pytest.raises(ValueError, match="configured"):
        wrong_keys.compact(spark, fence_seq=1)
    assert _live(t, spark) == before  # nothing corrupted

    v = t.rebucket(spark, 32)
    assert t.num_buckets == 32
    man = t._latest_manifest(spark)
    assert man["table_conf"]["num_buckets"] == 32
    assert man["rebucket_from"] == 8
    assert _live(t, spark) == before  # content-identical rewrite
    # merges keep working under the new layout, old handles fail loud
    t(_ch(spark, [(2, "b2", 22, 2, "update")]), 1)
    assert (2, "b2", 22) in _live(t, spark)
    stale = PartitionedCdcTable(str(tmp_path / "conf"), key_cols="k",
                                app_id="stale", num_buckets=8)
    with pytest.raises(ValueError, match="configured"):
        stale(_ch(spark, [(3, "Y", 0, 9, "update")]), 0)
    assert v >= 1


def test_rebucket_merge_on_read_materializes_pending(spark, tmp_path):
    t = _mk(spark, tmp_path, "confmor", "merge_on_read")
    t(_ch(spark, [(1, "a1", 11, 1, "update"),
                  (50, "new", 0, 1, "insert")]), 0)
    before = _live(t, spark)
    t.rebucket(spark, 16)
    man = t._latest_manifest(spark)
    assert man["pending"] == [] and \
        man["table_conf"]["num_buckets"] == 16
    assert _live(t, spark) == before


def test_write_mode_validation(tmp_path):
    with pytest.raises(ValueError, match="write_mode"):
        PartitionedCdcTable(str(tmp_path / "t"), key_cols="k",
                            app_id="x", write_mode="nope")


def test_mor_streaming_ingest_with_replay(spark, tmp_path):
    """Streaming ingestion INTO a merge-on-read table: a bounded file
    stream foreachBatch-commits each epoch as a delta log entry, and a
    SECOND run over a FRESH checkpoint (the crash-replay shape: every
    epoch re-delivered) must change nothing — the txn map makes every
    replayed epoch a no-op even though no bucket was ever rewritten."""
    import shutil

    src = str(tmp_path / "src")
    ck1, ck2 = str(tmp_path / "ck1"), str(tmp_path / "ck2")
    t = _mk(spark, tmp_path, "morstream", "merge_on_read")
    for i, b in enumerate(BATCHES):
        (_ch(spark, b).coalesce(1).write.mode("overwrite")
         .parquet(os.path.join(src, f"f{i}.parquet")))

    def run(ckpt):
        stream = (spark.readStream.schema(CH_SCHEMA)
                  .option("maxFilesPerTrigger", "1").parquet(src + "/*"))
        q = (stream.writeStream.foreachBatch(t)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        assert q.awaitTermination(300)

    run(ck1)
    man = t._latest_manifest(spark)
    assert len(man["pending"]) == 3  # one delta per epoch, no buckets
    state = _live(t, spark)

    # COW twin applied the same batches: content equality
    cow = _mk(spark, tmp_path, "cowtwin", "copy_on_write")
    for i, b in enumerate(BATCHES):
        cow(_ch(spark, b), i)
    assert state == _live(cow, spark)

    # crash-replay: fresh checkpoint, full re-delivery, all no-op
    shutil.rmtree(ck2, ignore_errors=True)
    run(ck2)
    assert len(t.versions(spark)) == len(BATCHES) + 1  # no new commits
    assert _live(t, spark) == state
