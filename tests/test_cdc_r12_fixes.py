"""Round-12 hardening: null merge keys through the inline-keys fast
path, eager (key, seq) ambiguity rejection on merge-on-read staging,
legacy matview stores rebuilding instead of raising, clone tag
rollback on a failed publish, and composite-key point lookup on both
layouts.
"""

import json
import os
import shutil
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


# -- null merge keys through the inline fast path ---------------------------

def test_null_key_survives_inline_feed_and_lookup(spark, tmp_path):
    """A NULL merge key is a live row (eqNullSafe everywhere): the
    change feed's inline literal fast path must not drop it (SQL IN
    filters NULL out), the feed must label its update as an update
    (not an insert) and emit its delete, and lookup must serve it."""
    t = PartitionedCdcTable(str(tmp_path / "t"), "k", app_id="w",
                            num_buckets=4, write_mode="merge_on_read")
    seed = spark.createDataFrame(
        [(1, "x", 10), (None, "n", 77), (2, "y", 20)], PAY)
    t.initialize(seed)
    v0 = t._latest_version(spark)
    t(_ch(spark, [(None, "n", 78, 1, "update"),
                  (1, "x", 11, 1, "update")]), 0)
    v1 = t._latest_version(spark)

    assert {(r.k, r.v) for r in t.lookup(spark, [None, 1]).collect()} \
        == {(None, 78), (1, 11)}

    feed = t.changes_between(spark, v0, v1)
    got = {(r.k, r.v, r._change_type) for r in feed.collect()}
    assert got == {(None, 78, "update"), (1, 11, "update")}

    t(_ch(spark, [(None, "n", 78, 2, "delete")]), 1)
    v2 = t._latest_version(spark)
    feed2 = t.changes_between(spark, v1, v2)
    assert {(r.k, r._change_type) for r in feed2.collect()} \
        == {(None, "delete")}
    assert t.lookup(spark, [None]).count() == 0


# -- eager ambiguity rejection on MOR staging --------------------------------

def test_mor_stage_rejects_duplicate_key_seq_before_commit(spark,
                                                           tmp_path):
    """An ambiguous change batch (duplicate (key, seq)) on
    write_mode='merge_on_read' must raise AT THE WRITE — a verbatim-
    staged duplicate would otherwise trip the read-side tie guard on
    every later read, wedging the table."""
    t = PartitionedCdcTable(str(tmp_path / "t"), "k", app_id="w",
                            num_buckets=4, write_mode="merge_on_read")
    t.initialize(_seed(spark))
    v = t._latest_version(spark)
    with pytest.raises(ValueError, match="must be unique"):
        t(_ch(spark, [(1, "x", 11, 5, "update"),
                      (1, "x", 12, 5, "update")]), 0)
    # nothing staged, nothing committed: the table still reads clean
    assert t._latest_version(spark) == v
    assert t.current(spark).count() == 8
    # and the epoch slot was not consumed — a corrected retry commits
    t(_ch(spark, [(1, "x", 11, 5, "update")]), 0)
    assert {r.v for r in t.lookup(spark, [1]).collect()} == {11}


def test_merge_into_ambiguous_source_rejected_on_mor(spark, tmp_path):
    """merge_into's docstring promise — an ambiguous merge is rejected
    before anything stages — must hold on the MOR staging path too."""
    t = PartitionedCdcTable(str(tmp_path / "t"), "k", app_id="w",
                            num_buckets=4, write_mode="merge_on_read")
    t.initialize(_seed(spark))
    src = spark.createDataFrame([(1, 100), (1, 200)], "k long, nv long")
    with pytest.raises(ValueError, match="must be unique"):
        t.merge_into(spark, src,
                     when_matched_update={"v": "s.nv"})
    # table not wedged: reads and a clean merge still work
    assert t.current(spark).count() == 8
    t.merge_into(spark, spark.createDataFrame([(1, 100)],
                                              "k long, nv long"),
                 when_matched_update={"v": "s.nv"})
    assert {r.v for r in t.lookup(spark, [1]).collect()} == {100}


# -- legacy matview stores rebuild, not raise --------------------------------

def test_pre_r11_matview_store_rebuilds_on_refresh(spark, tmp_path):
    """A store written before per-aggregate non-null counts existed
    (no _mv_n_* columns, single _current.json pointer) must force a
    full rebuild on refresh — its avg state carries the old live-row
    denominator, semantically incompatible with the null-excluding
    one."""
    t = CdcTable(str(tmp_path / "t"), "k", app_id="w")
    t.initialize(_seed(spark))
    store = str(tmp_path / "mv")
    view = MaterializedAggView(
        t, store, group_cols=["grp"],
        aggs={"n": ("count", None), "mean_v": ("avg", "v")})
    view.refresh(spark)

    # rewrite the store as a legacy one: state without _mv_n_*, one
    # replaced _current.json pointer, no _ptr_ markers
    ptr = view._pointer()
    legacy = spark.read.parquet(f"{store}/{ptr['dir']}") \
        .drop("_mv_n_mean_v")
    legacy.write.mode("overwrite").parquet(f"{store}/legacy")
    for name in os.listdir(store):
        if name.startswith("_ptr_"):
            os.unlink(f"{store}/{name}")
        elif name != "legacy":
            shutil.rmtree(f"{store}/{name}", ignore_errors=True)
    with open(f"{store}/_current.json", "w") as fh:
        json.dump({"table_version": int(ptr["table_version"]),
                   "refresh": int(ptr["refresh"]), "dir": "legacy"}, fh)

    t(_ch(spark, [(1, "x", 99, 1, "update"),
                  (9, "y", None, 1, "insert")]), 0)
    view.refresh(spark)
    got = {r.grp: (r.n, r.mean_v) for r in
           view.result(spark).collect()}
    live = t.current(spark)
    want = {r.grp: (r.n, r.mean_v) for r in
            live.groupBy("grp").agg(
                F.count(F.lit(1)).alias("n"),
                F.avg("v").alias("mean_v")).collect()}
    assert got == want


# -- clone tag rollback -------------------------------------------------------

def test_failed_clone_rolls_back_its_tag(spark, tmp_path):
    src = CdcTable(str(tmp_path / "src"), "k", app_id="w")
    src.initialize(_seed(spark))
    other = CdcTable(str(tmp_path / "other"), "k", app_id="o")
    other.initialize(_seed(spark))
    before = set(src.tags(spark))
    with pytest.raises(ValueError, match="already an initialized"):
        src.clone_to(spark, str(tmp_path / "other"))
    assert set(src.tags(spark)) == before  # no leaked vacuum pin


def test_failed_reclone_keeps_live_clones_tag(spark, tmp_path):
    """Re-cloning to the same dest at the same source version fails
    (dest initialized) — but the FIRST clone's pin must survive:
    deleting it would let vacuum age out data a live clone references."""
    src = CdcTable(str(tmp_path / "src"), "k", app_id="w")
    src.initialize(_seed(spark))
    dest = str(tmp_path / "c1")
    src.clone_to(spark, dest)
    tags_after_clone = set(src.tags(spark))
    assert tags_after_clone  # the pin exists
    with pytest.raises(ValueError, match="already an initialized"):
        src.clone_to(spark, dest)
    assert set(src.tags(spark)) == tags_after_clone


# -- composite-key point lookup ----------------------------------------------

CPAY = "k1 long, k2 string, v long"
CCH = CPAY + ", seq long, op string"


def _cseed(spark):
    return spark.createDataFrame(
        [(k, ns, k * 10 + (0 if ns == "a" else 1))
         for k in range(1, 7) for ns in ("a", "b")], CPAY)


def test_partitioned_composite_lookup_prunes_buckets(spark, tmp_path,
                                                     monkeypatch):
    """Composite-key lookup (the (entity, namespace) feature-store
    shape) reads only the probed key tuples' buckets and folds their
    pending deltas."""
    t = PartitionedCdcTable(str(tmp_path / "t"), ["k1", "k2"],
                            app_id="w", num_buckets=8,
                            write_mode="merge_on_read")
    t.initialize(_cseed(spark))
    t(spark.createDataFrame([(1, "a", 999, 1, "update"),
                             (2, "b", 0, 1, "delete")], CCH), 0)

    asked = []
    real = PartitionedCdcTable._read_buckets

    def record(self, spark_, man, buckets):
        asked.append(sorted(buckets))
        return real(self, spark_, man, buckets)

    monkeypatch.setattr(PartitionedCdcTable, "_read_buckets", record)
    got = {(r.k1, r.k2, r.v) for r in
           t.lookup(spark, [(1, "a"), (2, "b"), (99, "a")]).collect()}
    monkeypatch.undo()
    assert got == {(1, "a", 999)}
    want_buckets = {r[0] for r in spark.createDataFrame(
        [(1, "a"), (2, "b"), (99, "a")], "k1 long, k2 string")
        .select(t._bucket_expr()).distinct().collect()}
    assert asked and all(set(b) <= want_buckets for b in asked)
    assert all(len(b) < 8 for b in asked)   # strictly pruned


def test_composite_lookup_flat_parity_and_shapes(spark, tmp_path):
    t = CdcTable(str(tmp_path / "t"), ["k1", "k2"], app_id="w")
    t.initialize(_cseed(spark))
    # one bare tuple = one composite key
    assert {(r.k1, r.k2) for r in t.lookup(spark, (3, "b")).collect()} \
        == {(3, "b")}
    # a list of tuples; absent keys absent
    assert {(r.k1, r.k2) for r in
            t.lookup(spark, [(1, "a"), (99, "b")]).collect()} \
        == {(1, "a")}
    with pytest.raises(ValueError, match="value"):
        t.lookup(spark, [(1,)])
    with pytest.raises(ValueError, match="at least one key"):
        t.lookup(spark, [])


def test_composite_lookup_null_slot(spark, tmp_path):
    """A NULL in one slot of a composite key matches via isNull —
    the same null-key semantics the merges use."""
    t = PartitionedCdcTable(str(tmp_path / "t"), ["k1", "k2"],
                            app_id="w", num_buckets=4)
    t.initialize(spark.createDataFrame(
        [(1, None, 5), (1, "a", 6)], CPAY))
    got = {(r.k1, r.k2, r.v) for r in
           t.lookup(spark, [(1, None)]).collect()}
    assert got == {(1, None, 5)}


# -- composite-key change feed takes the inline literal fast path ------------

def _cfeed_rows(df):
    return {(r.k1, r.k2, r.v, r._change_type) for r in df.collect()}


def test_composite_feed_inlines_and_matches_semi_join(spark, tmp_path,
                                                      monkeypatch):
    """A composite-key table's bounded change window now takes the
    literal fast path (OR-of-AND predicate) — previously always the
    semi-join. Results must equal the semi-join path's, null slots
    included."""
    t = PartitionedCdcTable(str(tmp_path / "t"), ["k1", "k2"],
                            app_id="w", num_buckets=4,
                            write_mode="merge_on_read")
    t.initialize(spark.createDataFrame(
        [(1, "a", 10), (1, None, 11), (2, "b", 20), (3, "a", 30)],
        CPAY))
    v0 = t._latest_version(spark)
    t(spark.createDataFrame(
        [(1, "a", 99, 1, "update"), (1, None, 12, 1, "update"),
         (2, "b", 0, 1, "delete"), (9, "z", 90, 1, "insert")], CCH), 0)
    v1 = t._latest_version(spark)

    seen = []
    real = PartitionedCdcTable._pruned_view

    def record(self, spark_, man, keys, buckets, inline_keys=None):
        seen.append(inline_keys)
        return real(self, spark_, man, keys, buckets,
                    inline_keys=inline_keys)

    monkeypatch.setattr(PartitionedCdcTable, "_pruned_view", record)
    fast = _cfeed_rows(t.changes_between(spark, v0, v1))
    assert seen and all(k is not None for k in seen)  # inlined
    monkeypatch.undo()

    # force the semi-join path and compare
    monkeypatch.setattr(PartitionedCdcTable,
                        "KEYS_INLINE_MAX_COMPOSITE", 0)
    slow = _cfeed_rows(t.changes_between(spark, v0, v1))
    monkeypatch.undo()
    want = {(1, "a", 99, "update"), (1, None, 12, "update"),
            (2, "b", 20, "delete"), (9, "z", 90, "insert")}
    assert fast == want
    assert fast == slow


def test_lookup_over_inline_cap_takes_semi_join(spark, tmp_path,
                                                monkeypatch):
    """A probe set over the inline cap must not build a giant literal
    expression — it degrades to the distributed semi-join with the
    same answer."""
    t = PartitionedCdcTable(str(tmp_path / "t"), ["k1", "k2"],
                            app_id="w", num_buckets=4)
    t.initialize(_cseed(spark))
    monkeypatch.setattr(PartitionedCdcTable,
                        "KEYS_INLINE_MAX_COMPOSITE", 2)
    probes = [(k, ns) for k in range(1, 7) for ns in ("a", "b")]
    got = {(r.k1, r.k2, r.v) for r in t.lookup(spark, probes).collect()}
    monkeypatch.undo()
    want = {(r.k1, r.k2, r.v) for r in t.current(spark).collect()}
    assert got == want


# -- auto-compaction policy ---------------------------------------------------

def test_auto_compact_bounds_pending_and_keeps_semantics(spark,
                                                         tmp_path):
    """auto_compact_pending=2: the second staged delta folds the list
    immediately — pending stays bounded, content equals the plain MOR
    table's, epoch replay still no-ops, and a feed window SPANNING the
    auto-compaction still serves (compaction is a maintenance commit
    contributing nothing)."""
    t = PartitionedCdcTable(str(tmp_path / "t"), "k", app_id="w",
                            num_buckets=4, write_mode="merge_on_read",
                            auto_compact_pending=2)
    plain = PartitionedCdcTable(str(tmp_path / "p"), "k", app_id="w",
                                num_buckets=4,
                                write_mode="merge_on_read")
    t.initialize(_seed(spark))
    plain.initialize(_seed(spark))
    v0 = t._latest_version(spark)

    e1 = [(1, "x", 11, 1, "update"), (9, "z", 90, 1, "insert")]
    e2 = [(2, "y", 0, 2, "delete"), (9, "z", 91, 2, "update")]
    t(_ch(spark, e1), 0)
    assert len(t._latest_manifest(spark).get("pending", [])) == 1
    t(_ch(spark, e2), 1)   # hits the bound -> folds
    man = t._latest_manifest(spark)
    assert man.get("pending", []) == []
    assert man.get("delta_compaction") is True

    plain(_ch(spark, e1), 0)
    plain(_ch(spark, e2), 1)
    rows = lambda x: sorted(  # noqa: E731
        tuple(r) for r in x.current(spark).collect())
    assert rows(t) == rows(plain)

    # replayed epoch after the compaction: still a no-op
    v_after = t._latest_version(spark)
    t(_ch(spark, e2), 1)
    assert t._latest_version(spark) == v_after

    # a feed window spanning the auto-compaction
    feed = {(r.k, r._change_type) for r in
            t.changes_between(spark, v0, v_after).collect()}
    assert feed == {(1, "update"), (9, "insert"), (2, "delete")}


def test_matview_over_composite_key_table(spark, tmp_path):
    """Integration pin: an incrementally maintained view over a
    COMPOSITE-key table — the refresh reads the change feed through
    the new composite inline fast path."""
    t = PartitionedCdcTable(str(tmp_path / "t"), ["k1", "k2"],
                            app_id="w", num_buckets=4,
                            write_mode="merge_on_read")
    t.initialize(_cseed(spark))
    view = MaterializedAggView(
        t, str(tmp_path / "mv"), group_cols=["k2"],
        aggs={"n": ("count", None), "total": ("sum", "v")})
    view.refresh(spark)
    t(spark.createDataFrame(
        [(1, "a", 999, 1, "update"), (2, "b", 0, 1, "delete"),
         (9, "a", 90, 1, "insert")], CCH), 0)
    view.refresh(spark)
    got = {r.k2: (r.n, r.total) for r in view.result(spark).collect()}
    want = {r.k2: (r.n, r.total) for r in
            t.current(spark).groupBy("k2").agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("v").alias("total")).collect()}
    assert got == want
