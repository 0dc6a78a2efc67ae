"""merge_cdc_fenced + CdcTable: sequence fencing, tombstones, version
markers, exactly-once streaming MERGE with restarts."""

import os
import sys
import time

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from systems_spark.operators.cdc import merge_cdc_fenced
from systems_spark.streaming import CdcTable

PAY = "k long, s string, v long"
SNAP_SCHEMA = PAY + ", seq long, _cdc_deleted boolean"
CH_SCHEMA = PAY + ", seq long, op string"


def _snap(spark, rows):
    return spark.createDataFrame(
        [(k, s, v, q, d) for k, s, v, q, d in rows], SNAP_SCHEMA)


def _ch(spark, rows):
    return spark.createDataFrame(rows, CH_SCHEMA)


def _live(df):
    return sorted((r.k, r.s, r.v, r.seq)
                  for r in df.where(~F.col("_cdc_deleted")).collect())


def test_fenced_merge_out_of_order_batches_converge(spark):
    """Applying (b1 then b2) and (b2 then b1) reach the same state —
    per-key fencing makes batch order irrelevant."""
    snap = _snap(spark, [(1, "a", 10, 0, False), (2, "b", 20, 0, False)])
    b1 = _ch(spark, [(1, "a1", 11, 1, "update"), (3, "c", 30, 1, "insert")])
    b2 = _ch(spark, [(1, "a2", 12, 2, "update"), (2, "x", 0, 2, "delete")])

    fwd = merge_cdc_fenced(merge_cdc_fenced(snap, b1, "k"), b2, "k")
    rev = merge_cdc_fenced(merge_cdc_fenced(snap, b2, "k"), b1, "k")
    want = [(1, "a2", 12, 2), (3, "c", 30, 1)]
    assert _live(fwd) == want
    assert _live(rev) == want


def test_tombstone_blocks_stale_resurrection(spark):
    snap = _snap(spark, [(1, "a", 10, 0, False)])
    deleted = merge_cdc_fenced(
        snap, _ch(spark, [(1, "x", 0, 5, "delete")]), "k")
    stale = merge_cdc_fenced(
        deleted, _ch(spark, [(1, "old", 9, 3, "update")]), "k")
    assert _live(stale) == []          # still dead
    fresh = merge_cdc_fenced(
        stale, _ch(spark, [(1, "new", 99, 7, "insert")]), "k")
    assert _live(fresh) == [(1, "new", 99, 7)]


def test_equal_seq_keeps_snapshot_row(spark):
    """Replaying the exact change already applied (same seq) is a no-op —
    the snapshot side wins ties."""
    snap = _snap(spark, [(1, "applied", 11, 4, False)])
    out = merge_cdc_fenced(
        snap, _ch(spark, [(1, "replay", 99, 4, "update")]), "k")
    assert _live(out) == [(1, "applied", 11, 4)]


def test_cdc_table_lifecycle_and_replay(spark, tmp_path):
    table = CdcTable(str(tmp_path / "t"), key_cols="k", app_id="t1")
    seed = spark.createDataFrame([(1, "a", 10), (2, "b", 20)], PAY)
    table.initialize(seed)
    table.initialize(spark.createDataFrame([(9, "z", 0)], PAY))  # no-op
    assert sorted(tuple(r) for r in table.current(spark).collect()) == \
        [(1, "a", 10), (2, "b", 20)]

    table(_ch(spark, [(1, "a1", 11, 1, "update"),
                      (2, "x", 0, 1, "delete"),
                      (3, "c", 30, 1, "insert")]), 0)
    assert table.versions(spark) == [-1, 0]
    cur = sorted(tuple(r) for r in table.current(spark).collect())
    assert cur == [(1, "a1", 11), (3, "c", 30)]

    # replayed epoch: same batch_id -> directory-level no-op
    table(_ch(spark, [(1, "evil", 666, 99, "update")]), 0)
    assert table.versions(spark) == [-1, 0]
    assert sorted(tuple(r) for r in table.current(spark).collect()) == cur

    # tombstone visible in snapshot(), hidden in current()
    snap = table.snapshot(spark)
    assert snap.where("k = 2 AND _cdc_deleted").count() == 1


def test_cdc_table_streaming_restart_exactly_once(spark, tmp_path):
    """File-source change feed through CdcTable with a checkpoint; the
    query restarts after more changes arrive; the final live view equals
    the global last-op ground truth and no version is written twice."""
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    table = CdcTable(str(tmp_path / "t"), key_cols="k", app_id="e2e")
    table.initialize(spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (4, "d", 40)], PAY))

    def run_once():
        stream = (spark.readStream.schema(CH_SCHEMA)
                  .option("maxFilesPerTrigger", "1").parquet(src + "/*"))
        q = (stream.writeStream.foreachBatch(table)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    _ch(spark, [(1, "a1", 11, 1, "update"),
                (3, "c", 30, 1, "insert")]).coalesce(1) \
        .write.mode("overwrite").parquet(src + "/f0.parquet")
    run_once()
    assert sorted(tuple(r) for r in table.current(spark).collect()) == \
        [(1, "a1", 11), (2, "b", 20), (3, "c", 30), (4, "d", 40)]

    time.sleep(1.1)
    _ch(spark, [(4, "x", 0, 2, "delete"),
                (1, "a2", 12, 2, "update")]).coalesce(1) \
        .write.mode("overwrite").parquet(src + "/f1.parquet")
    run_once()  # restart over the same checkpoint: f0's epoch re-delivers
    assert sorted(tuple(r) for r in table.current(spark).collect()) == \
        [(1, "a2", 12), (2, "b", 20), (3, "c", 30)]
    assert len(table.versions(spark)) == len(set(table.versions(spark)))


def test_uninitialized_table_raises(spark, tmp_path):
    table = CdcTable(str(tmp_path / "t"), key_cols="k", app_id="t2")
    with pytest.raises(ValueError, match="initialize"):
        table.current(spark)


def test_at_version_history_vacuum(spark, tmp_path):
    table = CdcTable(str(tmp_path / "t"), key_cols="k", app_id="t3")
    table.initialize(spark.createDataFrame([(1, "a", 10)], PAY))
    table(_ch(spark, [(2, "b", 20, 1, "insert")]), 0)
    table(_ch(spark, [(1, "a1", 11, 2, "update")]), 1)
    assert table.versions(spark) == [-1, 0, 1]
    # time travel: version 0 has key 2 but not the key-1 update
    v0 = {tuple(r) for r in table.at_version(spark, 0)
          .select("k", "s", "v").collect()}
    assert v0 == {(1, "a", 10), (2, "b", 20)}
    hist = table.history(spark)
    assert [h["version"] for h in hist] == [-1, 0, 1]
    assert all(h["rows"] >= 1 for h in hist)

    assert table.vacuum(spark, keep_last=1) == [-1, 0]
    assert table.versions(spark) == [1]
    import pytest as _pt
    with _pt.raises(ValueError, match="not committed"):
        table.at_version(spark, 0)
    # live view unaffected
    assert sorted(tuple(r) for r in table.current(spark).collect()) == \
        [(1, "a1", 11), (2, "b", 20)]


def test_fenced_merge_random_property(spark):
    """Property: for ANY change set (unique (key, seq)) split into ANY
    batches applied in ANY order, the fenced merge converges to the
    global winner-per-key state computed by a pure-Python reference."""
    import random

    rng = random.Random(11)
    for trial in range(4):
        n_keys = rng.randint(3, 8)
        changes = []
        seq = 0
        for _ in range(rng.randint(5, 25)):
            seq += 1
            k = rng.randrange(n_keys)
            op = rng.choice(["insert", "update", "delete"])
            changes.append((k, f"s{seq}", seq * 10, seq, op))
        # python reference: per key, the max-seq change wins over seed
        seed = [(k, "seed", k, 0, False) for k in range(0, n_keys, 2)]
        winner = {k: (s, v, q, False) for k, s, v, q, _d in seed}
        for k, s, v, q, op in changes:
            cur = winner.get(k)
            if cur is None or q > cur[2]:
                winner[k] = (s, v, q, op == "delete")
        want = sorted((k, s, v, q) for k, (s, v, q, d) in winner.items()
                      if not d)

        # spark: random batch split, random application order
        rng.shuffle(changes)
        cuts = sorted(rng.sample(range(1, len(changes)), min(3, len(changes) - 1))) \
            if len(changes) > 1 else []
        batches = [changes[a:b] for a, b in
                   zip([0] + cuts, cuts + [len(changes)])]
        rng.shuffle(batches)
        snap = _snap(spark, seed)
        for b in batches:
            if b:
                snap = merge_cdc_fenced(snap, _ch(spark, b), "k")
        assert _live(snap) == want, f"trial {trial}"
