"""Optimistic concurrency on the CDC tables: the commit log is SHARED
across writers (markers v{N}.json claimed by put-if-absent), each
writer stages data under its own version=N__app_id directory, and a
losing writer cleans its staging dir and rebases its merge on the new
snapshot — Delta's optimistic protocol on plain parquet.
"""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from systems_spark.state import fs_publish_text_exclusive
from systems_spark.streaming import (CdcTable, ConcurrentCommitError,
                                     PartitionedCdcTable)

PAY = "k long, s string, v long"
CH_SCHEMA = PAY + ", seq long, op string"


def _ch(spark, rows):
    return spark.createDataFrame(rows, CH_SCHEMA)


def _seed(spark):
    return spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], PAY)


def test_publish_exclusive_is_first_writer_wins(spark, tmp_path):
    p = str(tmp_path / "m" / "v0.json")
    assert fs_publish_text_exclusive(spark, p, "first") is True
    assert fs_publish_text_exclusive(spark, p, "second") is False
    with open(p) as fh:
        assert fh.read() == "first"  # never a mix, never the loser's


def test_publish_exclusive_thread_stress(spark, tmp_path):
    """Eight threads race the CAS for one path: exactly one wins, and
    the path holds that winner's COMPLETE content — the single-winner
    atomicity everything above is built on."""
    import threading

    p = str(tmp_path / "m" / "v9.json")
    results = {}
    barrier = threading.Barrier(8)

    def contender(i):
        barrier.wait()
        results[i] = fs_publish_text_exclusive(spark, p, f"writer-{i}" * 50)

    threads = [threading.Thread(target=contender, args=(i,))
               for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    winners = [i for i, won in results.items() if won]
    assert len(winners) == 1
    with open(p) as fh:
        assert fh.read() == f"writer-{winners[0]}" * 50
    # no temp droppings left behind
    leftovers = [n for n in os.listdir(os.path.dirname(p))
                 if n != "v9.json"]
    assert leftovers == []


def test_two_writers_share_one_version_chain(spark, tmp_path):
    base = str(tmp_path / "t")
    a = CdcTable(base, key_cols="k", app_id="writer-a")
    b = CdcTable(base, key_cols="k", app_id="writer-b")
    a.initialize(_seed(spark))
    b.initialize(_seed(spark).limit(0))  # concurrent seed: no-op

    a(_ch(spark, [(1, "a1", 11, 1, "update")]), 0)
    b(_ch(spark, [(2, "b1", 21, 2, "update")]), 0)
    a(_ch(spark, [(4, "d", 40, 3, "insert")]), 1)

    assert a.versions(spark) == [-1, 0, 1, 2]
    apps = [m["app_id"] for m in a.history(spark)]
    assert apps == ["writer-a", "writer-a", "writer-b", "writer-a"]
    live = {r.k: r.s for r in b.current(spark).collect()}
    assert live == {1: "a1", 2: "b1", 3: "c", 4: "d"}

    # idempotence stays per-(app_id, batch_id): b's batch 1 is NOT
    # shadowed by a's batch 1 already being in the shared log
    b(_ch(spark, [(3, "c1", 31, 4, "update")]), 1)
    assert b.current(spark).where("k = 3").collect()[0].s == "c1"
    # but a REPLAY of a's batch 1 is a no-op
    n_versions = len(a.versions(spark))
    a(_ch(spark, [(4, "dX", 99, 9, "update")]), 1)
    assert len(a.versions(spark)) == n_versions
    assert a.current(spark).where("k = 4").collect()[0].s == "d"


def test_losing_writer_rebases_and_cleans_staging(spark, tmp_path,
                                                  monkeypatch):
    """The tightest race: writer B commits INSIDE writer A's
    check-to-publish window. A's CAS must lose, A's already-staged
    directory must vanish, and the retry must land A's merge REBASED
    on B's snapshot at the next version."""
    import systems_spark.state as state_mod

    base = str(tmp_path / "t")
    a = CdcTable(base, key_cols="k", app_id="wa")
    b = CdcTable(base, key_cols="k", app_id="wb")
    a.initialize(_seed(spark))

    real = state_mod.fs_publish_text_exclusive
    hits = {"n": 0, "inside": False}

    def b_wins_the_window(spark_, path, text):
        hits["n"] += 1
        if hits["n"] == 1 and not hits["inside"]:
            hits["inside"] = True
            b(_ch(spark, [(2, "b1", 21, 1, "update")]), 0)  # b commits v0
            hits["inside"] = False
        return real(spark_, path, text)

    monkeypatch.setattr(state_mod, "fs_publish_text_exclusive",
                        b_wins_the_window)
    a(_ch(spark, [(1, "a1", 11, 2, "update")]), 0)
    monkeypatch.undo()

    assert hits["n"] >= 3  # b's publish + a's losing and winning tries
    assert not os.path.exists(os.path.join(base, "version=0__wa"))
    live = {r.k: r.s for r in a.current(spark).collect()}
    assert live == {1: "a1", 2: "b1", 3: "c"}  # both writers' changes
    assert a.versions(spark) == [-1, 0, 1]


def test_exhausted_retries_raise(spark, tmp_path, monkeypatch):
    base = str(tmp_path / "t")
    a = CdcTable(base, key_cols="k", app_id="wa")
    a.initialize(_seed(spark))
    a(_ch(spark, [(1, "x", 1, 1, "update")]), 0)
    # every attempt sees a STALE base (the seed manifest), so each
    # commit targets the already-taken version 0 — contention forever
    stale = a._manifest_at(spark, -1)
    monkeypatch.setattr(CdcTable, "_latest_manifest",
                        lambda self, s: dict(stale))
    with pytest.raises(ConcurrentCommitError, match="gave up"):
        a(_ch(spark, [(2, "y", 2, 2, "update")]), 1)
    monkeypatch.undo()
    # and the committed version-0 data survived the losing attempts
    assert {r.k: r.s for r in a.current(spark).collect()}[1] == "x"


def test_partitioned_two_writers_and_rebase(spark, tmp_path, monkeypatch):
    base = str(tmp_path / "t")
    a = PartitionedCdcTable(base, key_cols="k", app_id="pa",
                            num_buckets=4)
    b = PartitionedCdcTable(base, key_cols="k", app_id="pb",
                            num_buckets=4)
    a.initialize(_seed(spark))
    b.initialize(_seed(spark).limit(0))
    b(_ch(spark, [(2, "b1", 21, 1, "update")]), 0)

    # a's first attempt derives from a STALE base (the seed manifest):
    # its commit targets the version b already owns, loses, and the
    # retry rebases on b's snapshot
    taken = a.versions(spark)[-1]
    stale = a._manifest_at(spark, -1)
    real = PartitionedCdcTable._latest_manifest
    calls = {"n": 0}

    def stale_once(self, spark_):
        calls["n"] += 1
        return dict(stale) if calls["n"] == 1 else real(self, spark_)

    monkeypatch.setattr(PartitionedCdcTable, "_latest_manifest",
                        stale_once)
    a(_ch(spark, [(1, "a1", 11, 2, "update")]), 0)
    monkeypatch.undo()

    assert calls["n"] >= 2
    assert not os.path.exists(os.path.join(base, f"version={taken}__pa"))
    live = {r.k: r.s for r in b.current(spark).collect()}
    assert live == {1: "a1", 2: "b1", 3: "c"}
    # the rebased manifest must resolve EVERY writer version its bucket
    # mapping references (b's included) through its dirs map
    man = a._latest_manifest(spark)
    assert {str(v) for v in a._mapping(man).values()} <= set(man["dirs"])
    assert sorted(a._mapping(man)) == sorted(b._mapping(man))


def test_replay_after_vacuum_is_still_a_noop(spark, tmp_path):
    """The txn map travels in EVERY manifest, so a batch replay stays
    a no-op even after vacuum dropped the manifest that first recorded
    the batch — the scan-the-history replay check would re-apply it."""
    base = str(tmp_path / "t")
    a = CdcTable(base, key_cols="k", app_id="wa")
    a.initialize(_seed(spark))
    a(_ch(spark, [(1, "a1", 11, 1, "update")]), 0)
    a(_ch(spark, [(2, "b1", 21, 2, "update")]), 1)
    a.vacuum(spark, keep_last=1)  # batch 0's manifest is GONE
    assert a.versions(spark) == [1]

    a(_ch(spark, [(1, "STALE", 99, 9, "update")]), 0)  # replayed epoch
    assert len(a.versions(spark)) == 1  # no new commit
    assert {r.k: r.s for r in a.current(spark).collect()} \
        == {1: "a1", 2: "b1", 3: "c"}


def test_fence_and_replay_check_read_one_marker(spark, tmp_path,
                                                monkeypatch):
    """Merge cost is independent of history length: fence() and the
    replay check read the LATEST manifest only, never scan the log."""
    base = str(tmp_path / "t")
    a = CdcTable(base, key_cols="k", app_id="wa")
    a.initialize(_seed(spark))
    for i in range(3):
        a(_ch(spark, [(1, f"s{i}", 10 + i, i + 1, "update")]), i)
    a.compact(spark, fence_seq=2)
    assert a.fence(spark) == 2
    # make any full-history scan blow up; single-marker reads survive
    monkeypatch.setattr(CdcTable, "_manifests",
                        lambda self, s: (_ for _ in ()).throw(
                            AssertionError("scanned the whole log")))
    assert a.fence(spark) == 2
    a(_ch(spark, [(2, "zz", 99, 9, "update")]), 3)
    monkeypatch.undo()
    assert {r.k: r.s for r in a.current(spark).collect()}[2] == "zz"


def test_timestamp_time_travel(spark, tmp_path, monkeypatch):
    import systems_spark.streaming.sinks as sinks_mod

    base = str(tmp_path / "t")
    a = CdcTable(base, key_cols="k", app_id="wa")
    a.initialize(_seed(spark))
    a(_ch(spark, [(1, "a1", 11, 1, "update")]), 0)
    a(_ch(spark, [(1, "a2", 12, 2, "update")]), 1)
    hist = a.history(spark)
    stamps = [m["committed_at_ms"] for m in hist]
    assert stamps == sorted(stamps) and len(set(stamps)) == len(stamps)

    # the snapshot that was current AT each commit's stamp
    assert a.version_at_timestamp(spark, stamps[1]) == 0
    got = {r.k: r.s for r in
           a.at_timestamp(spark, stamps[1]).where("NOT _cdc_deleted")
           .collect()}
    assert got[1] == "a1"
    assert a.version_at_timestamp(spark, stamps[-1] + 10_000) == 1
    with pytest.raises(ValueError, match="no commit at or before"):
        a.at_timestamp(spark, stamps[0] - 1)

    # a clock stepping BACKWARDS cannot break version/stamp agreement:
    # the stamp is bumped past the predecessor's
    monkeypatch.setattr(sinks_mod.time, "time",
                        lambda: (stamps[0] - 60_000) / 1000.0)
    a(_ch(spark, [(2, "b1", 21, 3, "update")]), 2)
    monkeypatch.undo()
    new_stamps = [m["committed_at_ms"] for m in a.history(spark)]
    assert new_stamps == sorted(new_stamps)
    assert len(set(new_stamps)) == len(new_stamps)


def test_restore_is_append_only_and_protection_survives(spark, tmp_path):
    base = str(tmp_path / "t")
    a = CdcTable(base, key_cols="k", app_id="wa")
    a.initialize(_seed(spark))
    a(_ch(spark, [(1, "a1", 11, 1, "update")]), 0)       # v0
    a(_ch(spark, [(2, "x", 0, 2, "delete")]), 1)         # v1
    a.compact(spark, fence_seq=2)                        # v2, fence=2

    v = a.restore(spark, 0)                              # back to v0
    assert v == 3
    live = {r.k: r.s for r in a.current(spark).collect()}
    assert live == {1: "a1", 2: "b", 3: "c"}             # v0 content
    # history is append-only: v1's state is still time-travelable
    assert {r.k for r in a.at_version(spark, 1)
            .where("NOT _cdc_deleted").collect()} == {1, 3}
    # fence and replay protection did NOT regress through the restore
    assert a.fence(spark) == 2
    n = len(a.versions(spark))
    a(_ch(spark, [(1, "STALE", 99, 9, "update")]), 0)    # replayed epoch
    assert len(a.versions(spark)) == n
    # and a fenced (seq <= 2) change stays dropped post-restore
    a(_ch(spark, [(9, "old", 1, 1, "insert")]), 7)
    assert 9 not in {r.k for r in a.current(spark).collect()}


def test_partitioned_restore_restores_schema_too(spark, tmp_path):
    base = str(tmp_path / "t")
    t = PartitionedCdcTable(base, key_cols="k", app_id="pa",
                            num_buckets=4, schema_evolution="merge")
    t.initialize(_seed(spark))
    t(_ch(spark, [(1, "a1", 11, 1, "update")]), 0)       # v0
    wide = spark.createDataFrame([(2, "b1", 21, "extra", 2, "update")],
                                 "k long, s string, v long, w string, "
                                 "seq long, op string")
    t(wide, 1)                                           # v1: adds col w
    assert "w" in t.current(spark).columns

    v = t.restore(spark, 0)
    assert v == 2
    cur = t.current(spark)
    assert "w" not in cur.columns                        # old schema back
    assert {r.k: r.s for r in cur.collect()} \
        == {1: "a1", 2: "b", 3: "c"}
    # append-only: the evolved version is still there
    assert "w" in t.at_version(spark, 1).columns


def test_two_threads_race_without_losing_updates(spark, tmp_path):
    """REAL concurrency, not injected: two writers on two driver
    threads interleave merges on one table. Writers touch disjoint
    keys, so the only way the final state differs from the sequential
    expectation is a lost update — exactly what the CAS + rebase must
    prevent."""
    import threading

    base = str(tmp_path / "t")
    a = CdcTable(base, key_cols="k", app_id="ta")
    b = CdcTable(base, key_cols="k", app_id="tb")
    a.initialize(spark.createDataFrame([(0, "seed", 0)], PAY))
    n_each = 4
    errs = []

    def writer(table, key_base):
        try:
            for i in range(n_each):
                table(_ch(spark, [(key_base + i, f"w{key_base + i}",
                                   i, i + 1, "insert")]), i)
        except Exception as e:  # noqa: BLE001 - surfaced to the assert
            errs.append(e)

    t1 = threading.Thread(target=writer, args=(a, 100))
    t2 = threading.Thread(target=writer, args=(b, 200))
    t1.start(); t2.start(); t1.join(); t2.join()
    assert errs == []

    live = {r.k for r in a.current(spark).collect()}
    assert live == {0} | {100 + i for i in range(n_each)} \
        | {200 + i for i in range(n_each)}
    # one shared contiguous version chain, one commit per batch
    vs = a.versions(spark)
    assert vs == list(range(-1, 2 * n_each))
    apps = sorted(m["app_id"] for m in a.history(spark)[1:])
    assert apps == ["ta"] * n_each + ["tb"] * n_each


def test_vacuum_time_retention(spark, tmp_path):
    base = str(tmp_path / "t")
    a = CdcTable(base, key_cols="k", app_id="wa")
    a.initialize(_seed(spark))
    for i in range(3):
        a(_ch(spark, [(1, f"s{i}", i, i + 1, "update")]), i)
    stamps = [m["committed_at_ms"] for m in a.history(spark)]

    # cutoff before everything: nothing is old enough to drop
    assert a.vacuum(spark, keep_last=1,
                    older_than_ms=stamps[0]) == []
    assert a.versions(spark) == [-1, 0, 1, 2]
    # cutoff between v0 and v1: only the seed and v0 go
    dropped = a.vacuum(spark, keep_last=1, older_than_ms=stamps[2])
    assert dropped == [-1, 0]
    assert a.versions(spark) == [1, 2]
    assert {r.s for r in a.current(spark).collect()} >= {"s2"}


def test_orphan_staging_dir_is_invisible_and_vacuumed(spark, tmp_path):
    base = str(tmp_path / "t")
    a = CdcTable(base, key_cols="k", app_id="wa")
    a.initialize(_seed(spark))
    a(_ch(spark, [(1, "a1", 11, 1, "update")]), 0)

    # a crashed writer's staging dir: real parquet, no marker
    zombie = os.path.join(base, "version=7__zombie")
    _seed(spark).write.parquet(zombie)
    assert a.versions(spark) == [-1, 0]  # invisible to the log
    assert {r.k for r in a.current(spark).collect()} == {1, 2, 3}

    a(_ch(spark, [(2, "b1", 21, 2, "update")]), 1)
    a.vacuum(spark, keep_last=2)
    assert not os.path.exists(zombie)  # swept with the aged versions
    assert a.versions(spark) == [0, 1]
    live = {r.k: r.s for r in a.current(spark).collect()}
    assert live == {1: "a1", 2: "b1", 3: "c"}
