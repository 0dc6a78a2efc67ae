"""The lake-scale change feed: on a merge-on-read PartitionedCdcTable
whose window left its change files in the log, ``changes_between`` is
served from those files with BOTH endpoint reads pruned to the touched
keys' buckets ⋉ keys — O(|changes| + touched-bucket volume), table
size irrelevant. Semantics must be IDENTICAL to the flat two-snapshot
diff; windows containing a copy-on-write merge or a restore fall back
to it. Vacuum retains a kept version's change file even after
compaction cleared it from every pending list, so retained windows
stay servable.
"""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from systems_spark.streaming import (CdcTable, MaterializedAggView,
                                     PartitionedCdcTable)

PAY = "k long, grp string, v long"
CH_SCHEMA = PAY + ", seq long, op string"


def _ch(spark, rows):
    return spark.createDataFrame(rows, CH_SCHEMA)


def _seed(spark):
    return spark.createDataFrame(
        [(k, "x" if k % 2 else "y", k * 10) for k in range(1, 9)], PAY)


def _mor(spark, path, epochs=()):
    t = PartitionedCdcTable(path, "k", app_id="w", num_buckets=8,
                            write_mode="merge_on_read")
    t.initialize(_seed(spark))
    for i, rows in enumerate(epochs):
        t(_ch(spark, rows), i)
    return t

EPOCHS = (
    [(1, "x", 11, 1, "update"), (9, "z", 90, 1, "insert")],
    [(2, "y", 22, 2, "update"), (4, "y", 40, 2, "delete"),
     (1, "x", 5, 0, "update")],          # out-of-order: seq 0 no-ops
    [(9, "z", 91, 3, "update"), (3, "x", 33, 3, "delete"),
     (10, "z", 100, 3, "insert")],
)


def _rows(df):
    return sorted(tuple(r) for r in
                  df.select("k", "grp", "v", "seq", "_change_type")
                  .collect())


@pytest.mark.parametrize("preimages", [False, True])
def test_pruned_feed_equals_snapshot_diff(spark, tmp_path, preimages):
    t = _mor(spark, str(tmp_path / "t"), EPOCHS)
    t.compact_deltas(spark)          # a maintenance commit in-window
    t.tag(spark, "pin", 0)           # another (manifest-only)
    latest = t._latest_version(spark)
    pruned = t.changes_between(spark, -1, latest, preimages=preimages)
    flat = CdcTable.changes_between(t, spark, -1, latest,
                                    preimages=preimages)
    assert _rows(pruned) == _rows(flat)
    assert len(_rows(pruned)) > 0


def test_pruned_feed_never_materializes_endpoints(spark, tmp_path,
                                                  monkeypatch):
    t = _mor(spark, str(tmp_path / "t"),
             ([(1, "x", 11, 1, "update")],))
    bucket_of_1 = t._bucket_expr()
    b1 = spark.range(1).select(
        F.pmod(F.xxhash64(F.lit(1).cast("long")), F.lit(8))
        .cast("int")).collect()[0][0]

    asked = []
    real_rb = PartitionedCdcTable._read_buckets

    def record(self, spark_, man, buckets):
        asked.append(sorted(buckets))
        return real_rb(self, spark_, man, buckets)

    monkeypatch.setattr(PartitionedCdcTable, "_read_buckets", record)
    monkeypatch.setattr(
        PartitionedCdcTable, "at_version",
        lambda self, s, v: (_ for _ in ()).throw(
            AssertionError("fell back to a full endpoint read")))
    ch = t.changes_between(spark, -1, 0, preimages=True)
    got = {(r.k, r._change_type) for r in ch.collect()}
    monkeypatch.undo()
    assert got == {(1, "update_preimage"), (1, "update_postimage")}
    # both endpoint reads asked ONLY for the touched key's bucket
    assert asked and all(b == [b1] for b in asked)


def test_window_with_cow_merge_falls_back(spark, tmp_path):
    base = str(tmp_path / "t")
    t = _mor(spark, base, ([(1, "x", 11, 1, "update")],))
    # a COPY-ON-WRITE writer commits into the same table: no change file
    cow = PartitionedCdcTable(base, "k", app_id="w2", num_buckets=8)
    cow(_ch(spark, [(2, "x", 22, 2, "update")]), 0)
    latest = t._latest_version(spark)
    assert t._window_change_dirs(spark, -1, latest) is None
    ch = {(r.k, r._change_type) for r in
          t.changes_between(spark, -1, latest).collect()}
    assert ch == {(1, "update"), (2, "update")}  # fallback, correct


def test_maintenance_only_window_is_empty(spark, tmp_path):
    t = _mor(spark, str(tmp_path / "t"),
             ([(1, "x", 11, 1, "update")],))
    t.compact_deltas(spark)
    t.add_constraint(spark, "v_nonneg", "v >= 0")
    latest = t._latest_version(spark)
    ch = t.changes_between(spark, 0, latest, preimages=True)
    assert ch.count() == 0


def test_vacuum_retains_kept_versions_change_files(spark, tmp_path):
    base = str(tmp_path / "t")
    t = _mor(spark, base, EPOCHS)
    t.compact_deltas(spark)  # pending cleared — change files now only
    #                          referenced via their manifests' change_dir
    latest = t._latest_version(spark)
    t.vacuum(spark, keep_last=len(t.versions(spark)))  # keep all
    pruned = t.changes_between(spark, -1, latest, preimages=True)
    flat = CdcTable.changes_between(t, spark, -1, latest,
                                    preimages=True)
    assert _rows(pruned) == _rows(flat)


def test_matview_refresh_is_pruned_on_mor(spark, tmp_path, monkeypatch):
    """End-to-end: a materialized-view refresh over a MOR table reads
    only the touched buckets — never a full endpoint."""
    t = _mor(spark, str(tmp_path / "t"))
    view = MaterializedAggView(
        t, str(tmp_path / "mv"), group_cols=["grp"],
        aggs={"n": ("count", None),
              "total": ("sum", "CAST(v AS DECIMAL(18,2))")})
    view.refresh(spark)
    t(_ch(spark, [(1, "x", 11, 1, "update"),
                  (9, "z", 90, 1, "insert")]), 0)
    monkeypatch.setattr(
        PartitionedCdcTable, "at_version",
        lambda self, s, v: (_ for _ in ()).throw(
            AssertionError("matview refresh materialized an endpoint")))
    view.refresh(spark)
    monkeypatch.undo()
    got = {r.grp: (r.n, float(r.total))
           for r in view.result(spark).collect()}
    want = {r.grp: (r.n, float(r.total)) for r in
            t.current(spark).groupBy("grp")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.expr("CAST(v AS DECIMAL(18,2))"))
                 .alias("total")).collect()}
    assert got == want


def _count_paths(monkeypatch):
    """Record which diff implementation served the feed."""
    calls = {"fold": 0, "two_endpoint": 0}
    real_fold = PartitionedCdcTable._diff_fold
    real_diff = CdcTable._diff_snapshots

    def fold(self, *a, **k):
        calls["fold"] += 1
        return real_fold(self, *a, **k)

    def diff(self, *a, **k):
        calls["two_endpoint"] += 1
        return real_diff(self, *a, **k)

    monkeypatch.setattr(PartitionedCdcTable, "_diff_fold", fold)
    monkeypatch.setattr(CdcTable, "_diff_snapshots", diff)
    return calls


@pytest.mark.parametrize("preimages", [False, True])
def test_fold_fast_path_equals_flat_diff(spark, tmp_path, preimages,
                                         monkeypatch):
    """A pure merge-on-read window (no rewrites) takes the fold fast
    path — diff(X, merge(X, C)) from the pre endpoint alone — and its
    rows are IDENTICAL to the flat two-snapshot diff: out-of-order
    stale changes no-op, cross-epoch same-key changes net to one
    event, deletes emit preimages."""
    t = _mor(spark, str(tmp_path / "t"), EPOCHS)
    latest = t._latest_version(spark)
    calls = _count_paths(monkeypatch)
    pruned = t.changes_between(spark, -1, latest, preimages=preimages)
    got = _rows(pruned)
    assert calls["fold"] == 1 and calls["two_endpoint"] == 0
    monkeypatch.undo()
    flat = CdcTable.changes_between(t, spark, -1, latest,
                                    preimages=preimages)
    assert got == _rows(flat)
    assert len(got) > 0


def test_fold_fast_path_replay_and_absent_delete_emit_nothing(
        spark, tmp_path, monkeypatch):
    """Equal-seq replays (merge keeps the snapshot row) and deletes of
    keys the table never had produce NO feed events on the fast path —
    exactly like the endpoint diff."""
    t = _mor(spark, str(tmp_path / "t"))
    # seed rows carry seq 0: an equal-seq 'update' is a replay no-op;
    # k=99 never existed, so its delete nets nothing
    t(_ch(spark, [(1, "x", 999, 0, "update"),
                  (99, "q", 1, 5, "delete")]), 0)
    calls = _count_paths(monkeypatch)
    ch = t.changes_between(spark, -1, 0, preimages=True)
    assert ch.count() == 0
    assert calls["fold"] == 1


def test_fold_fast_path_tombstone_reinsert_is_insert(spark, tmp_path,
                                                     monkeypatch):
    t = _mor(spark, str(tmp_path / "t"),
             ([(1, "x", 10, 1, "delete")],))   # k=1 tombstoned at v0
    t(_ch(spark, [(1, "x2", 15, 2, "insert")]), 1)
    calls = _count_paths(monkeypatch)
    ch = t.changes_between(spark, 0, 1, preimages=True)
    got = {(r.k, r._change_type, r.grp) for r in ch.collect()}
    assert got == {(1, "insert", "x2")}
    assert calls["fold"] == 1


def test_fold_fast_path_respects_standing_fence(spark, tmp_path,
                                                monkeypatch):
    """Changes at or below the table's standing compaction fence are
    dropped at feed entry — a compacted-away key cannot re-emerge as a
    feed event from a late replayed epoch."""
    t = _mor(spark, str(tmp_path / "t"))
    t.compact(spark, fence_seq=50)
    v0 = t._latest_version(spark)
    t(_ch(spark, [(1, "x", 11, 7, "update"),      # ≤ fence: dropped
                  (9, "z", 90, 60, "insert")]), 0)  # > fence: applies
    calls = _count_paths(monkeypatch)
    ch = t.changes_between(spark, v0, t._latest_version(spark),
                           preimages=True)
    got = {(r.k, r._change_type) for r in ch.collect()}
    assert got == {(9, "insert")}
    assert calls["fold"] == 1


def test_semi_join_path_over_inline_cap_is_identical(spark, tmp_path,
                                                     monkeypatch):
    """Batches whose distinct keys exceed KEYS_INLINE_MAX keep the
    fully distributed semi-join restriction — same rows."""
    t = _mor(spark, str(tmp_path / "t"), EPOCHS)
    latest = t._latest_version(spark)
    want = _rows(t.changes_between(spark, -1, latest, preimages=True))
    monkeypatch.setattr(PartitionedCdcTable, "KEYS_INLINE_MAX", 0)
    got = _rows(t.changes_between(spark, -1, latest, preimages=True))
    assert got == want


def test_compaction_in_window_takes_two_endpoint_diff(spark, tmp_path,
                                                      monkeypatch):
    """A bucket rewrite inside the window (delta compaction) breaks
    the merge(X, C) identity — the feed must take the two-endpoint
    diff, not the fold."""
    t = _mor(spark, str(tmp_path / "t"), EPOCHS[:1])
    t.compact_deltas(spark)
    t(_ch(spark, [(2, "y", 22, 2, "update")]), 1)
    latest = t._latest_version(spark)
    calls = _count_paths(monkeypatch)
    pruned = t.changes_between(spark, -1, latest, preimages=True)
    got = _rows(pruned)
    assert calls["fold"] == 0 and calls["two_endpoint"] == 1
    monkeypatch.undo()
    flat = CdcTable.changes_between(t, spark, -1, latest,
                                    preimages=True)
    assert got == _rows(flat)


def test_cross_epoch_seq_tie_raises_at_read(spark, tmp_path):
    """Two epochs writing the SAME (key, seq) make last-change-wins
    nondeterministic when folded together — the feed raises instead of
    picking an arbitrary winner (the sequential merge had deterministic
    first-applied-wins semantics the fold cannot reproduce)."""
    t = _mor(spark, str(tmp_path / "t"))
    t(_ch(spark, [(1, "a", 1, 7, "update")]), 0)
    t(_ch(spark, [(1, "b", 2, 7, "update")]), 1)
    ch = t.changes_between(spark, -1, 1, preimages=True)
    with pytest.raises(Exception, match="unique"):
        ch.collect()
