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


def test_compact_drops_old_tombstones_and_fences_late_replays(spark, tmp_path):
    """compact(fence_seq) removes tombstones the fence covers, keeps
    newer ones, and the persisted fence makes a late pre-fence replay a
    no-op even though its key's tombstone is gone."""
    table = CdcTable(str(tmp_path / "t"), key_cols="k", app_id="c1")
    table.initialize(spark.createDataFrame([(1, "a", 10), (2, "b", 20)], PAY))
    table(_ch(spark, [(2, "x", 0, 1, "delete"),
                      (3, "c", 30, 1, "insert")]), 0)
    table(_ch(spark, [(3, "x", 0, 5, "delete")]), 1)
    snap = table.snapshot(spark)
    assert snap.where("_cdc_deleted").count() == 2

    v = table.compact(spark, fence_seq=2)  # covers seq<=2: key-2 tombstone
    assert table.fence(spark) == 2
    snap = table.snapshot(spark)
    assert {r.k for r in snap.where("_cdc_deleted").collect()} == {3}
    assert sorted(tuple(r) for r in table.current(spark).collect()) == \
        [(1, "a", 10)]

    # late stale replay (seq <= fence) for the compacted-away key 2:
    # dropped at entry -> key 2 must NOT resurrect
    table(_ch(spark, [(2, "zombie", 99, 1, "insert")]), 2)
    assert sorted(tuple(r) for r in table.current(spark).collect()) == \
        [(1, "a", 10)]
    # a genuinely new change (seq > fence) still applies
    table(_ch(spark, [(2, "fresh", 21, 6, "insert")]), 3)
    assert sorted(tuple(r) for r in table.current(spark).collect()) == \
        [(1, "a", 10), (2, "fresh", 21)]

    # time travel across the compaction boundary: the pre-compaction
    # version still shows the key-2 tombstone
    pre = table.at_version(spark, 1)
    assert pre.where("k = 2 AND _cdc_deleted").count() == 1
    # the compaction version itself is committed and readable
    assert table.at_version(spark, v).where("k = 2").count() == 0


def test_compact_fence_survives_vacuum_and_never_regresses(spark, tmp_path):
    table = CdcTable(str(tmp_path / "t"), key_cols="k", app_id="c2")
    table.initialize(spark.createDataFrame([(1, "a", 10)], PAY))
    table(_ch(spark, [(2, "b", 0, 3, "delete")]), 0)
    table.compact(spark, fence_seq=3)
    table(_ch(spark, [(4, "d", 40, 4, "insert")]), 1)
    # vacuum away everything but the newest version, including the
    # compaction commit that introduced the fence
    table.vacuum(spark, keep_last=1)
    assert table.fence(spark) == 3, "fence must ride along in manifests"
    # a smaller fence never regresses the standing one
    table.compact(spark, fence_seq=1)
    assert table.fence(spark) == 3
    # pre-fence change still dropped
    table(_ch(spark, [(2, "zombie", 9, 2, "insert")]), 2)
    assert sorted(tuple(r) for r in table.current(spark).collect()) == \
        [(1, "a", 10), (4, "d", 40)]


def test_compact_bounds_snapshot_across_replayed_feeds(spark, tmp_path):
    """The lane-level probe the verdict asked for: replay the same
    delete-heavy change feed 3x with a compaction after each cycle —
    the live snapshot row count stays bounded (tombstones don't
    accumulate) and replays change nothing."""
    table = CdcTable(str(tmp_path / "t"), key_cols="k", app_id="c3")
    table.initialize(spark.createDataFrame(
        [(k, f"s{k}", k) for k in range(20)], PAY))
    feed = [(k, "x", 0, 10 + k, "delete") for k in range(10)]

    sizes = []
    for cycle in range(3):
        table(_ch(spark, feed), cycle)          # same CHANGES re-offered
        table.compact(spark, fence_seq=19)      # covers every feed seq
        sizes.append(table.snapshot(spark).count())
    assert sizes == [10, 10, 10], sizes
    assert sorted(r.k for r in table.current(spark).collect()) == \
        list(range(10, 20))


def test_version_numbers_skip_past_compactions(spark, tmp_path):
    """A stream batch arriving after a compaction takes the next free
    version; its batch_id is recorded for idempotence and a replay of
    that batch_id is still a no-op."""
    table = CdcTable(str(tmp_path / "t"), key_cols="k", app_id="c4")
    table.initialize(spark.createDataFrame([(1, "a", 10)], PAY))
    table(_ch(spark, [(2, "b", 20, 1, "insert")]), 0)   # version 0
    table.compact(spark, fence_seq=0)                   # version 1
    table(_ch(spark, [(3, "c", 30, 2, "insert")]), 1)   # version 2
    assert table.versions(spark) == [-1, 0, 1, 2]
    cur = sorted(tuple(r) for r in table.current(spark).collect())
    assert cur == [(1, "a", 10), (2, "b", 20), (3, "c", 30)]
    # replay batch 1 (now living at version 2): no-op
    table(_ch(spark, [(3, "evil", 0, 9, "delete")]), 1)
    assert table.versions(spark) == [-1, 0, 1, 2]
    assert sorted(tuple(r) for r in table.current(spark).collect()) == cur
    hist = table.history(spark)
    assert [h.get("batch_id") for h in hist] == [None, 0, None, 1]
    assert hist[2].get("compaction") is True


# --- PartitionedCdcTable: the lake-scale touched-bucket layout -----------

from systems_spark.streaming import PartitionedCdcTable


def _bucket_dirs(base, version):
    # a version's data dir is version=N__<app_id> (writer-unique
    # staging, resolved through the manifest once committed)
    cand = [n for n in os.listdir(base)
            if n == f"version={version}"
            or n.startswith(f"version={version}__")]
    if not cand:
        return None
    assert len(cand) == 1, f"multiple dirs for version {version}: {cand}"
    d = os.path.join(base, cand[0])
    return sorted(n for n in os.listdir(d) if n.startswith("_cdc_bucket="))


def test_partitioned_merge_rewrites_only_touched_buckets(spark, tmp_path):
    base = str(tmp_path / "t")
    table = PartitionedCdcTable(base, key_cols="k", app_id="p1",
                                num_buckets=8)
    table.initialize(spark.createDataFrame(
        [(k, f"s{k}", k * 10) for k in range(40)], PAY))
    n_seed_buckets = len(_bucket_dirs(base, -1))
    assert n_seed_buckets == 8  # 40 keys cover all 8 buckets

    # a single-key batch touches exactly ONE bucket
    table(_ch(spark, [(3, "x3", 999, 1, "update")]), 0)
    dirs = _bucket_dirs(base, 0)
    assert len(dirs) == 1, dirs
    # the snapshot stitches untouched buckets from version -1 and the
    # touched one from version 0 — full-content equivalence
    cur = {r.k: (r.s, r.v) for r in table.current(spark).collect()}
    want = {k: (f"s{k}", k * 10) for k in range(40)}
    want[3] = ("x3", 999)
    assert cur == want


def test_partitioned_semantics_match_cdctable(spark, tmp_path):
    """Same feed through CdcTable and PartitionedCdcTable: identical
    live view, including tombstone fencing and replays."""
    flat = CdcTable(str(tmp_path / "a"), key_cols="k", app_id="f")
    part = PartitionedCdcTable(str(tmp_path / "b"), key_cols="k",
                               app_id="p", num_buckets=4)
    seed = spark.createDataFrame([(k, f"s{k}", k) for k in range(12)], PAY)
    for t in (flat, part):
        t.initialize(seed)
    feeds = [
        [(1, "a1", 11, 1, "update"), (2, "x", 0, 1, "delete"),
         (30, "new", 300, 1, "insert")],
        [(2, "zombie", 99, 1, "insert"),          # fenced by tombstone seq
         (1, "a2", 12, 3, "update"), (5, "x", 0, 2, "delete")],
        [(1, "stale", 0, 2, "update")],           # stale: seq < applied 3
    ]
    for i, feed in enumerate(feeds):
        for t in (flat, part):
            t(_ch(spark, feed), i)
            t(_ch(spark, feed), i)  # replay: no-op
    a = sorted(tuple(r) for r in flat.current(spark).collect())
    b = sorted(tuple(r) for r in part.current(spark).collect())
    assert a == b
    assert (1, "a2", 12) in a and all(r[0] != 2 for r in a)


def test_partitioned_compact_rewrites_only_dirty_buckets(spark, tmp_path):
    base = str(tmp_path / "t")
    table = PartitionedCdcTable(base, key_cols="k", app_id="p2",
                                num_buckets=8)
    table.initialize(spark.createDataFrame(
        [(k, f"s{k}", k) for k in range(40)], PAY))
    table(_ch(spark, [(7, "x", 0, 2, "delete")]), 0)   # one tombstone
    v = table.compact(spark, fence_seq=2)
    # only the tombstone's bucket rewrote
    assert len(_bucket_dirs(base, v)) == 1
    assert table.snapshot(spark).where("_cdc_deleted").count() == 0
    assert table.fence(spark) == 2
    # late pre-fence replay: no resurrection
    table(_ch(spark, [(7, "zombie", 1, 1, "insert")]), 1)
    assert table.current(spark).where("k = 7").count() == 0
    # post-fence change applies
    table(_ch(spark, [(7, "fresh", 70, 3, "insert")]), 2)
    assert {tuple(r) for r in table.current(spark)
            .where("k = 7").collect()} == {(7, "fresh", 70)}


def test_partitioned_time_travel_and_vacuum_retention(spark, tmp_path):
    base = str(tmp_path / "t")
    table = PartitionedCdcTable(base, key_cols="k", app_id="p3",
                                num_buckets=4)
    table.initialize(spark.createDataFrame([(1, "a", 10), (2, "b", 20)], PAY))
    table(_ch(spark, [(1, "a1", 11, 1, "update")]), 0)
    table(_ch(spark, [(2, "b1", 21, 1, "update")]), 1)
    v0 = {r.k: r.s for r in table.at_version(spark, 0).collect()}
    assert v0 == {1: "a1", 2: "b"}
    # vacuum keep_last=1: old manifests drop (no longer time-travelable)
    # but any data dir the RETAINED snapshot still reads must survive
    dropped = table.vacuum(spark, keep_last=1)
    assert table.versions(spark) == [1]
    assert 1 not in dropped  # the kept version's own data
    assert sorted(r.k for r in table.current(spark).collect()) == [1, 2]
    with pytest.raises(ValueError, match="not committed"):
        table.at_version(spark, 0)
    # now rewrite both keys so every older writer becomes unreferenced
    table(_ch(spark, [(1, "a2", 12, 2, "update"),
                      (2, "b2", 22, 2, "update")]), 2)
    dropped = table.vacuum(spark, keep_last=1)
    assert {r.s for r in table.current(spark).collect()} == {"a2", "b2"}
    # nothing but version 2 remains on disk as data
    left = {n for n in os.listdir(base) if n.startswith("version=")}
    assert left == {"version=2__p3"}, left


def test_partitioned_null_key_buckets_stably(spark, tmp_path):
    table = PartitionedCdcTable(str(tmp_path / "t"), key_cols="k",
                                app_id="p4", num_buckets=4)
    table.initialize(spark.createDataFrame([(None, "n", 0), (1, "a", 10)],
                                           PAY))
    table(_ch(spark, [(None, "n2", 1, 1, "update")]), 0)
    got = sorted((tuple(r) for r in table.current(spark).collect()),
                 key=lambda t: (t[0] is not None, t[1]))
    assert got == [(None, "n2", 1), (1, "a", 10)]


def test_partitioned_streaming_restart_exactly_once(spark, tmp_path):
    """PartitionedCdcTable as a foreachBatch sink with a checkpoint
    restart: replayed epochs are manifest-level no-ops and the
    bucket-stitched live view equals the global last-op truth."""
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    table = PartitionedCdcTable(str(tmp_path / "t"), key_cols="k",
                                app_id="pe2e", num_buckets=4)
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
    time.sleep(1.1)
    _ch(spark, [(4, "x", 0, 2, "delete"),
                (1, "a2", 12, 2, "update")]).coalesce(1) \
        .write.mode("overwrite").parquet(src + "/f1.parquet")
    run_once()  # restart over the same checkpoint: f0 re-delivers
    assert sorted(tuple(r) for r in table.current(spark).collect()) == \
        [(1, "a2", 12), (2, "b", 20), (3, "c", 30)]
    bids = [m.get("batch_id") for m in table._manifests(spark)
            if m.get("batch_id") is not None]
    assert len(bids) == len(set(bids)), "an epoch double-applied"


def test_changes_between_versions(spark, tmp_path):
    """CDF between two versions: inserts/updates carry the postimage,
    deletes the preimage; delete-then-reinsert nets to update; an
    untouched key emits nothing; same answer on the partitioned table."""
    for cls, name in ((CdcTable, "f"), (PartitionedCdcTable, "p")):
        kw = {"num_buckets": 4} if cls is PartitionedCdcTable else {}
        table = cls(str(tmp_path / name), key_cols="k", app_id=name, **kw)
        table.initialize(spark.createDataFrame(
            [(1, "a", 10), (2, "b", 20), (3, "c", 30), (4, "d", 40)], PAY))
        table(_ch(spark, [(1, "a1", 11, 1, "update"),
                          (2, "x", 0, 1, "delete"),
                          (5, "e", 50, 1, "insert")]), 0)
        table(_ch(spark, [(3, "x", 0, 2, "delete"),
                          (3, "c2", 33, 3, "insert")]), 1)
        last = table.versions(spark)[-1]
        feed = {(r.k, r._change_type): (r.s, r.v, r.seq)
                for r in table.changes_between(spark, -1, last).collect()}
        assert feed == {
            (1, "update"): ("a1", 11, 1),
            (2, "delete"): ("b", 20, 0),    # preimage
            (5, "insert"): ("e", 50, 1),
            (3, "update"): ("c2", 33, 3),   # delete+reinsert nets
        }, feed
        # the feed applied to v_from reproduces v_to's live view
        # (apply = delete the delete-keys, upsert the rest)
        base = {r.k: (r.s, r.v) for r in table.at_version(spark, -1)
                .where("NOT _cdc_deleted").collect()}
        for (k, op), (s, v, _q) in feed.items():
            if op == "delete":
                base.pop(k)
            else:
                base[k] = (s, v)
        cur = {r.k: (r.s, r.v) for r in table.current(spark).collect()}
        assert base == cur


def test_optimize_zorder_is_content_identical_and_prunes(spark, tmp_path):
    """OPTIMIZE ZORDER: a new content-identical version whose file
    layout serves data-skipping reads — current() unchanged, time
    travel intact, and a StatsIndex over data_path() prunes a 2-D box
    predicate that the pre-optimize layout cannot."""
    import random

    from systems_spark.operators.zorder import StatsIndex, pruned_files
    from systems_spark.state import StateStore

    rnd = random.Random(21)
    rows = [(i, rnd.randint(0, 9999), rnd.randint(0, 9999), 0, False)
            for i in range(4000)]
    t = CdcTable(str(tmp_path / "t"), key_cols="k", app_id="opt")
    t.initialize(spark.createDataFrame(
        rows, "k long, x long, y long, seq long, _cdc_deleted boolean")
        .drop("seq", "_cdc_deleted"))
    t(_ch(spark, [(1, "up", 1, 1, "update")]).selectExpr(
        "k", "v AS x", "v AS y", "seq", "op"), 0)

    before = sorted(map(tuple, t.current(spark).collect()))
    v_pre = t.versions(spark)[-1]
    v_opt = t.optimize(spark, ["x", "y"], [(0, 9999), (0, 9999)],
                       bits=12, partitions=16)
    assert sorted(map(tuple, t.current(spark).collect())) == before
    assert t.versions(spark)[-1] == v_opt
    # time travel across the boundary
    assert t.at_version(spark, v_pre).count() == len(before)
    assert t.history(spark)[-1]["optimize"] is True

    idx = StatsIndex(StateStore(root=str(tmp_path / "state")))
    stats = idx.stats(spark, t.data_path(spark), ["x", "y"])
    kept = pruned_files(stats, {"x": (None, 2000), "y": (8000, None)})
    assert 0 < len(kept) < stats.count()
    got = sorted(r.k for r in
                 idx.read(spark, t.data_path(spark), ["x", "y"],
                          {"x": (None, 2000), "y": (8000, None)})
                 .where("x <= 2000 AND y >= 8000 AND NOT _cdc_deleted")
                 .collect())
    want = sorted(r[0] for r in before if r[1] <= 2000 and r[2] >= 8000)
    assert got == want


def test_optimize_carries_fence_and_merges_continue(spark, tmp_path):
    """The standing compaction fence must ride through an optimize
    commit (vacuum-proof), and a pre-fence late replay after the
    optimize must still be dropped at merge entry."""
    t = CdcTable(str(tmp_path / "t"), key_cols="k", app_id="optf")
    t.initialize(_snap(spark, [(1, "a", 10, 0, False)])
                 .drop("seq", "_cdc_deleted"))
    t(_ch(spark, [(2, "b", 20, 5, "insert"), (1, "x", 0, 5, "delete")]), 0)
    t.compact(spark, fence_seq=5)
    t.optimize(spark, ["k"], [(0, 100)], bits=8, partitions=2)
    assert t.fence(spark) == 5
    # vacuum away everything before the optimize; fence must survive
    t.vacuum(spark, keep_last=1)
    assert t.fence(spark) == 5
    # late pre-fence resurrection attempt: must be a no-op
    t(_ch(spark, [(1, "ghost", 9, 4, "insert")]), 1)
    assert sorted(r.k for r in t.current(spark).collect()) == [2]


def test_partitioned_optimize_content_and_bucket_locality(spark, tmp_path):
    """Partitioned OPTIMIZE: content-identical, bucket layout intact
    (a later merge still rewrites only its touched buckets), and
    in-bucket z-order makes per-bucket file stats prunable."""
    import random

    rnd = random.Random(23)
    rows = [(i, rnd.randint(0, 9999), rnd.randint(0, 9999)) for i in range(3000)]
    t = PartitionedCdcTable(str(tmp_path / "t"), key_cols="k",
                            app_id="popt", num_buckets=4)
    t.initialize(spark.createDataFrame(rows, "k long, x long, y long"))
    before = sorted(map(tuple, t.current(spark).collect()))
    v = t.optimize(spark, ["x", "y"], [(0, 9999), (0, 9999)],
                   bits=12, partitions=16)
    assert sorted(map(tuple, t.current(spark).collect())) == before
    man = t._latest_manifest(spark)
    assert man["optimize"] is True
    assert set(t._mapping(man).values()) == {v}  # all buckets rewritten
    assert len(t.bucket_paths(spark)) == 4

    # a single-key merge after the optimize touches exactly one bucket
    ch = spark.createDataFrame([(rows[0][0], 1, 1, 1, "update")],
                               "k long, x long, y long, seq long, op string")
    t(ch, 0)
    man2 = t._latest_manifest(spark)
    moved = [b for b, wv in t._mapping(man2).items() if wv != v]
    assert len(moved) == 1

    with pytest.raises(NotImplementedError, match="bucket_paths"):
        t.data_path(spark)


def test_schema_evolution_flat(spark, tmp_path):
    """mergeSchema semantics: a new batch column widens the table
    (standing rows NULL-fill), a missing payload column NULL-fills the
    postimage (changes are full-row images), strict mode still raises,
    and a type change is refused."""
    t = CdcTable(str(tmp_path / "t"), key_cols="k", app_id="evo",
                 schema_evolution="merge")
    t.initialize(spark.createDataFrame([(1, "a", 10), (2, "b", 20)],
                                       "k long, s string, v long"))
    # batch adds column w AND omits column v
    t(spark.createDataFrame([(1, "a1", 7.5, 1, "update"),
                             (3, "c", 8.5, 1, "insert")],
                            "k long, s string, w double, seq long, "
                            "op string"), 0)
    got = {r.k: (r.s, r.v, r.w) for r in t.current(spark).collect()}
    assert got == {1: ("a1", None, 7.5),      # updated: v gone, w new
                   2: ("b", 20, None),        # untouched: w NULL-fills
                   3: ("c", None, 8.5)}
    assert [f.name for f in t.current(spark).schema.fields] \
        == ["k", "s", "v", "w"]

    with pytest.raises(ValueError, match="cannot change a column's type"):
        t(spark.createDataFrame([(9, 5, 2, "insert")],
                                "k long, s long, seq long, op string"), 1)

    strict = CdcTable(str(tmp_path / "t2"), key_cols="k", app_id="evo2")
    strict.initialize(spark.createDataFrame([(1, "a", 10)],
                                            "k long, s string, v long"))
    with pytest.raises(ValueError, match="missing columns"):
        strict(spark.createDataFrame([(2, "b", 1, "insert")],
                                     "k long, s string, seq long, "
                                     "op string"), 0)


def test_schema_evolution_partitioned(spark, tmp_path):
    """Evolution on the bucketed table: only touched buckets rewrite,
    yet untouched buckets' readers NULL-fill the new column (manifest
    schema is the log's truth); time travel keeps the OLD schema at old
    versions; the change feed spans the evolution boundary."""
    t = PartitionedCdcTable(str(tmp_path / "t"), key_cols="k",
                            app_id="pevo", num_buckets=4,
                            schema_evolution="merge")
    t.initialize(spark.createDataFrame(
        [(i, f"s{i}", i * 10) for i in range(8)],
        "k long, s string, v long"))
    v0 = t.versions(spark)[-1]
    prior = t._mapping(t._latest_manifest(spark))

    t(spark.createDataFrame([(0, "z", 0, 9.9, 1, "update")],
                            "k long, s string, v long, w double, "
                            "seq long, op string"), 0)
    man = t._latest_manifest(spark)
    moved = [b for b, wv in t._mapping(man).items() if prior.get(b) != wv]
    assert len(moved) == 1             # evolution didn't force a rewrite
    cur = t.current(spark)
    assert [f.name for f in cur.schema.fields] == ["k", "s", "v", "w"]
    got = {r.k: r.w for r in cur.collect()}
    assert got[0] == 9.9 and all(got[k] is None for k in range(1, 8))
    # old version still reads with its own schema
    assert "w" not in t.at_version(spark, v0).columns

    feed = t.changes_between(spark, v0, t.versions(spark)[-1])
    rows = feed.collect()
    assert len(rows) == 1
    assert rows[0]["_change_type"] == "update" and rows[0]["w"] == 9.9


def test_schema_evolution_validation(spark, tmp_path):
    with pytest.raises(ValueError, match="schema_evolution"):
        CdcTable(str(tmp_path / "x"), key_cols="k", app_id="a",
                 schema_evolution="overwrite")
