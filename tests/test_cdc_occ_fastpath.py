"""OCC granular conflict resolution (Delta-style logical conflict
detection): a PartitionedCdcTable writer that loses the commit CAS no
longer always recomputes its merge — when every interleaved commit is
provably irrelevant (disjoint touched buckets, same fence / schema /
table conf), the already-staged result is REPUBLISHED at the next
version: no re-read of the base buckets, no re-merge, no re-write.
Incompatible interleaves (overlapping buckets, a fence advance, a
restore/rebucket) still take the full rebase, and the staged loser dir
is cleaned up exactly as before.
"""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import systems_spark.state as state_mod
from systems_spark.streaming import PartitionedCdcTable

PAY = "k long, s string, v long"
CH_SCHEMA = PAY + ", seq long, op string"


def _ch(spark, rows):
    return spark.createDataFrame(rows, CH_SCHEMA)


def _seed(spark):
    return spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], PAY)


def _buckets_of(spark, keys, n):
    df = spark.createDataFrame([(int(k),) for k in keys], "k long")
    rows = df.select(
        "k", F.pmod(F.xxhash64("k"), F.lit(n)).cast("int").alias("b")
    ).collect()
    return {r.k: r.b for r in rows}


def _count_read_buckets(monkeypatch, victim):
    """Count the expensive base-bucket reads the victim writer pays —
    the fast path's whole point is paying exactly one."""
    real = PartitionedCdcTable._read_buckets
    calls = {"n": 0}

    def counting(self, spark_, man, buckets):
        if self is victim:
            calls["n"] += 1
        return real(self, spark_, man, buckets)

    monkeypatch.setattr(PartitionedCdcTable, "_read_buckets", counting)
    return calls


def _race_in_window(monkeypatch, interleave):
    """Run ``interleave()`` inside the victim's FIRST stage-to-publish
    window: the victim stages its data, then the interleaved commit
    claims the version, then the victim's CAS loses."""
    real = state_mod.fs_publish_text_exclusive
    st = {"fired": False, "inside": False}

    def hooked(spark_, path, text):
        if not st["inside"] and not st["fired"]:
            st["fired"] = True
            st["inside"] = True
            interleave()
            st["inside"] = False
        return real(spark_, path, text)

    monkeypatch.setattr(state_mod, "fs_publish_text_exclusive", hooked)


def test_disjoint_cow_conflict_recommits_without_recompute(
        spark, tmp_path, monkeypatch):
    base = str(tmp_path / "t")
    a = PartitionedCdcTable(base, "k", app_id="pa", num_buckets=4)
    b = PartitionedCdcTable(base, "k", app_id="pb", num_buckets=4)
    a.initialize(_seed(spark))
    bk = _buckets_of(spark, range(1, 40), 4)
    kb = next(k for k in range(4, 40) if bk[k] != bk[1])

    reads = _count_read_buckets(monkeypatch, a)
    _race_in_window(
        monkeypatch,
        lambda: b(_ch(spark, [(kb, "bnew", 100, 5, "insert")]), 0))
    a(_ch(spark, [(1, "anew", 101, 6, "update")]), 0)
    monkeypatch.undo()

    # one base read: the merge was computed exactly once
    assert reads["n"] == 1
    live = {r.k: r.s for r in a.current(spark).collect()}
    assert live == {1: "anew", 2: "b", 3: "c", kb: "bnew"}
    man = a._latest_manifest(spark)
    assert man["version"] == 1 and man["app_id"] == "pa"
    # the manifest audits the fast path and repoints at the dir that
    # was STAGED under the lost version number
    assert man["occ_recommit_of_base"] == -1
    assert man["dirs"]["1"] == "version=0__pa"
    assert os.path.isdir(os.path.join(base, "version=0__pa"))
    # vacuum respects the recommitted dir (referenced by name via dirs)
    a.vacuum(spark, keep_last=1)
    assert os.path.isdir(os.path.join(base, "version=0__pa"))
    assert {r.k: r.s for r in a.current(spark).collect()} == live


def test_overlapping_cow_conflict_takes_the_full_rebase(
        spark, tmp_path, monkeypatch):
    base = str(tmp_path / "t")
    a = PartitionedCdcTable(base, "k", app_id="pa", num_buckets=4)
    b = PartitionedCdcTable(base, "k", app_id="pb", num_buckets=4)
    a.initialize(_seed(spark))
    bk = _buckets_of(spark, range(1, 40), 4)
    kb = next(k for k in range(4, 40) if bk[k] == bk[1])  # SAME bucket

    reads = _count_read_buckets(monkeypatch, a)
    _race_in_window(
        monkeypatch,
        lambda: b(_ch(spark, [(kb, "bnew", 100, 5, "insert")]), 0))
    a(_ch(spark, [(1, "anew", 101, 6, "update")]), 0)
    monkeypatch.undo()

    # overlapping bucket: the staged result would LOSE b's row in that
    # bucket — the rebase recomputed (second base read) and the loser
    # staging dir was dropped
    assert reads["n"] == 2
    assert not os.path.exists(os.path.join(base, "version=0__pa"))
    live = {r.k: r.s for r in a.current(spark).collect()}
    assert live == {1: "anew", 2: "b", 3: "c", kb: "bnew"}
    assert "occ_recommit_of_base" not in a._latest_manifest(spark)


def test_fence_advance_in_window_forces_rebase(spark, tmp_path,
                                               monkeypatch):
    base = str(tmp_path / "t")
    a = PartitionedCdcTable(base, "k", app_id="pa", num_buckets=4)
    b = PartitionedCdcTable(base, "k", app_id="pb", num_buckets=4)
    a.initialize(_seed(spark))

    reads = _count_read_buckets(monkeypatch, a)
    _race_in_window(monkeypatch, lambda: b.compact(spark, fence_seq=50))
    a(_ch(spark, [(1, "anew", 101, 51, "update")]), 0)
    monkeypatch.undo()

    # an advanced fence invalidates the staged result's fencing
    # assumptions: full rebase, which re-filters the batch at the new
    # fence (seq 51 > 50 survives)
    assert reads["n"] == 2
    man = a._latest_manifest(spark)
    assert man["fence_seq"] == 50
    assert "occ_recommit_of_base" not in man
    assert {r.k: r.s for r in a.current(spark).collect()} \
        == {1: "anew", 2: "b", 3: "c"}


def test_mor_delta_conflict_recommits_staged_change_file(
        spark, tmp_path, monkeypatch):
    """Merge-on-read deltas never touch buckets, so ANY delta-delta
    interleave is compatible: the loser republishes its staged change
    file instead of rewriting it — and the change-feed source resolves
    the recommitted file through the manifest's change_dir, not by
    parsing the (now version-skewed) directory name."""
    base = str(tmp_path / "t")
    a = PartitionedCdcTable(base, "k", app_id="pa", num_buckets=4,
                            write_mode="merge_on_read")
    b = PartitionedCdcTable(base, "k", app_id="pb", num_buckets=4,
                            write_mode="merge_on_read")
    a.initialize(_seed(spark))

    _race_in_window(
        monkeypatch,
        lambda: b(_ch(spark, [(7, "bnew", 100, 5, "insert")]), 0))
    a(_ch(spark, [(1, "anew", 101, 6, "update")]), 0)
    monkeypatch.undo()

    man = a._latest_manifest(spark)
    assert man["version"] == 1 and man["app_id"] == "pa"
    assert man["occ_recommit_of_base"] == -1
    assert man["change_dir"] == "delta=0__pa"
    assert sorted(man["pending"]) == ["delta=0__pa", "delta=0__pb"]
    live = {r.k: r.s for r in a.current(spark).collect()}
    assert live == {1: "anew", 2: "b", 3: "c", 7: "bnew"}

    # the change feed serves BOTH versions' files, including the
    # version-skewed recommitted one
    from systems_spark.streaming.cdf_source import (_CdfStreamReader,
                                                    _change_schema,
                                                    _own_delta_dir,
                                                    _read_manifest)
    man0 = _read_manifest(base, 0)
    man1 = _read_manifest(base, 1)
    assert _own_delta_dir(man0) == "delta=0__pb"
    assert _own_delta_dir(man1) == "delta=0__pa"
    reader = _CdfStreamReader(
        _change_schema(man1, a.DELETED, a.op_col), {"path": base})
    parts = reader.partitions({"version": -1}, {"version": 1})
    assert [os.path.basename(p.directory) for p in parts] \
        == ["delta=0__pb", "delta=0__pa"]
    served = [rb for p in parts for rb in reader.read(p)]
    assert sum(rb.num_rows for rb in served) == 2


def test_exhausted_fast_path_cleans_staged_dir(spark, tmp_path,
                                               monkeypatch):
    """If every retry loses (pathological contention), the kept staged
    dir must not orphan: the final give-up sweeps it."""
    base = str(tmp_path / "t")
    a = PartitionedCdcTable(base, "k", app_id="pa", num_buckets=4)
    a.initialize(_seed(spark))
    a(_ch(spark, [(1, "x", 1, 1, "update")]), 0)

    # every publish attempt fails at the CAS itself: staged dirs are
    # kept between attempts, and must be swept at give-up
    monkeypatch.setattr(state_mod, "fs_publish_text_exclusive",
                        lambda spark_, path, text: False)
    monkeypatch.setattr(PartitionedCdcTable, "_backoff",
                        lambda self, attempt: None)
    from systems_spark.streaming import ConcurrentCommitError
    with pytest.raises(ConcurrentCommitError, match="gave up"):
        a(_ch(spark, [(2, "y", 2, 2, "update")]), 1)
    monkeypatch.undo()
    # only committed data dirs remain on disk — the kept staged dir
    # was swept at give-up
    committed = set()
    for m in a.history(spark):
        committed.update(m.get("dirs", {}).values())
    on_disk = {n for n in os.listdir(base) if n.startswith("version=")}
    assert on_disk <= committed
    assert {r.k: r.s for r in a.current(spark).collect()}[1] == "x"
