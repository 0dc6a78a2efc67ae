"""Incrementally maintained materialized aggregate views
(streaming/matview.py MaterializedAggView): differential maintenance
over the CDC change feed — refresh reads ONLY the changes between the
reflected and latest table versions (signed contributions: insert /
update_postimage add, delete / update_preimage retract), absorbs them
through one key join with the stored per-group state, and NEVER
rescans the base table after the initial build (pinned by making the
snapshot unreadable). Also covers the preimage-emitting change feed
itself.
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
        [(1, "x", 10), (2, "x", 20), (3, "y", 30), (4, "y", 40)], PAY)


def _view(table, path):
    return MaterializedAggView(
        table, path, group_cols=["grp"],
        aggs={"n": ("count", None),
              "total": ("sum", "CAST(v AS DECIMAL(18,2))"),
              "mean": ("avg", "CAST(v AS DECIMAL(18,2))")})


def _as_dict(df):
    # sums are exact (DECIMAL); avg is derived sum/count whose decimal
    # SCALE differs from F.avg's — compare at 6 places
    return {r.grp: (r.n, float(r.total), round(float(r.mean), 6))
            for r in df.collect()}


def _recompute(table, spark):
    return _as_dict(
        table.current(spark).groupBy("grp")
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum(F.expr("CAST(v AS DECIMAL(18,2))")).alias("total"),
             F.avg(F.expr("CAST(v AS DECIMAL(18,2))")).alias("mean")))


def test_changes_between_preimages(spark, tmp_path):
    t = CdcTable(str(tmp_path / "t"), "k", app_id="w")
    t.initialize(_seed(spark))
    t(_ch(spark, [(1, "x", 11, 1, "update"),    # update in place
                  (3, "y", 30, 2, "delete"),    # delete
                  (5, "z", 50, 3, "insert")]), 0)
    ch = t.changes_between(spark, -1, 0, preimages=True)
    got = {(r.k, r._change_type): r.v for r in ch.collect()}
    assert got == {(1, "update_preimage"): 10,
                   (1, "update_postimage"): 11,
                   (3, "delete"): 30,
                   (5, "insert"): 50}
    # default shape unchanged (postimage-only updates)
    legacy = {(r.k, r._change_type) for r in
              t.changes_between(spark, -1, 0).collect()}
    assert legacy == {(1, "update"), (3, "delete"), (5, "insert")}


def test_incremental_refresh_matches_recompute(spark, tmp_path):
    t = CdcTable(str(tmp_path / "t"), "k", app_id="w")
    t.initialize(_seed(spark))
    view = _view(t, str(tmp_path / "mv"))
    assert view.refresh(spark) == -1           # initial build
    assert _as_dict(view.result(spark)) == _recompute(t, spark)

    # epoch 1: in-place update + delete + insert + GROUP MOVE (k=2
    # x→y): one retraction in x, one addition in y
    t(_ch(spark, [(1, "x", 15, 1, "update"),
                  (3, "y", 30, 1, "delete"),
                  (5, "z", 50, 1, "insert"),
                  (2, "y", 20, 1, "update")]), 0)
    # epoch 2: empty out group z entirely — it must DROP from the view
    t(_ch(spark, [(5, "z", 50, 2, "delete")]), 1)

    assert view.refresh(spark) == 1            # one incremental step
    assert _as_dict(view.result(spark)) == _recompute(t, spark)
    assert set(_as_dict(view.result(spark))) == {"x", "y"}  # z gone

    # idempotent: nothing new → no-op, same reflected version
    assert view.refresh(spark) == 1
    assert _as_dict(view.result(spark)) == _recompute(t, spark)


def test_refresh_never_rescans_the_base_table(spark, tmp_path,
                                              monkeypatch):
    t = PartitionedCdcTable(str(tmp_path / "t"), "k", app_id="w",
                            num_buckets=4)
    t.initialize(_seed(spark))
    view = _view(t, str(tmp_path / "mv"))
    view.refresh(spark)
    t(_ch(spark, [(1, "x", 15, 1, "update"),
                  (9, "y", 90, 1, "insert")]), 0)

    # the feed needs at_version of BOTH endpoints; a full-table
    # materialization beyond those two reads must never happen — break
    # snapshot() to prove refresh doesn't use it
    def boom(self, spark_):
        raise AssertionError("refresh rescanned the base table")
    monkeypatch.setattr(PartitionedCdcTable, "snapshot", boom)
    monkeypatch.setattr(PartitionedCdcTable, "current", boom)
    view.refresh(spark)
    monkeypatch.undo()
    assert _as_dict(view.result(spark)) == _recompute(t, spark)


def test_crash_before_pointer_keeps_previous_result(spark, tmp_path,
                                                    monkeypatch):
    t = CdcTable(str(tmp_path / "t"), "k", app_id="w")
    t.initialize(_seed(spark))
    view = _view(t, str(tmp_path / "mv"))
    view.refresh(spark)
    before = _as_dict(view.result(spark))
    t(_ch(spark, [(1, "x", 15, 1, "update")]), 0)

    monkeypatch.setattr(MaterializedAggView, "_publish_exclusive",
                        lambda self, *a: (_ for _ in ()).throw(
                            OSError("crash before pointer")))
    with pytest.raises(OSError):
        view.refresh(spark)
    monkeypatch.undo()
    # marker-last: the view still serves the previous consistent state
    assert _as_dict(view.result(spark)) == before
    assert view.reflected_version() == -1
    # and the retried refresh completes normally
    view.refresh(spark)
    assert _as_dict(view.result(spark)) == _recompute(t, spark)


def test_unsupported_aggregates_raise(spark, tmp_path):
    t = CdcTable(str(tmp_path / "t"), "k", app_id="w")
    with pytest.raises(NotImplementedError, match="min"):
        MaterializedAggView(t, str(tmp_path / "mv"), ["grp"],
                            {"m": ("min", "v")})
    with pytest.raises(ValueError, match="unsupported"):
        MaterializedAggView(t, str(tmp_path / "mv"), ["grp"],
                            {"m": ("median", "v")})
    with pytest.raises(ValueError, match="needs an expression"):
        MaterializedAggView(t, str(tmp_path / "mv"), ["grp"],
                            {"m": ("sum", None)})


def test_served_view_follows_the_table(spark, tmp_path):
    """The 10th streaming surface: MaterializedAggView.serve
    subscribes to the change-feed source; each committed delta
    triggers an idempotent refresh, so the view FOLLOWS the table
    continuously — across a stream restart too."""
    t = PartitionedCdcTable(str(tmp_path / "t"), "k", app_id="w",
                            num_buckets=4, write_mode="merge_on_read")
    t.initialize(_seed(spark))
    view = _view(t, str(tmp_path / "mv"))
    view.refresh(spark)
    t(_ch(spark, [(1, "x", 15, 1, "update"),
                  (9, "z", 90, 1, "insert")]), 0)

    ckpt = str(tmp_path / "ckpt")
    q = view.serve(spark, ckpt, trigger={"availableNow": True})
    q.awaitTermination(120)
    assert view.reflected_version() == t._latest_version(spark)
    assert _as_dict(view.result(spark)) == _recompute(t, spark)

    # more epochs while no stream runs; a RESTARTED stream catches up
    t(_ch(spark, [(9, "z", 90, 2, "delete"),
                  (2, "y", 25, 2, "update")]), 1)
    q = view.serve(spark, ckpt, trigger={"availableNow": True})
    q.awaitTermination(120)
    assert view.reflected_version() == t._latest_version(spark)
    assert _as_dict(view.result(spark)) == _recompute(t, spark)


def test_star_schema_view_with_dimension_join(spark, tmp_path):
    """Star-schema maintenance: fact changes are enriched by a
    broadcast dim join before signing, so group keys and aggregates
    may live on the DIMENSION (revenue by region, maintained from the
    fact feed) — including a fact row whose FK moves between dim
    rows (one retraction under the old region, one addition under
    the new)."""
    t = CdcTable(str(tmp_path / "t"), "k", app_id="w")
    # grp doubles as the FK into the dim
    t.initialize(_seed(spark))
    dim = spark.createDataFrame(
        [("x", "east"), ("y", "west"), ("z", "north")],
        "grp string, region string")
    view = MaterializedAggView(
        t, str(tmp_path / "mv"), group_cols=["region"],
        aggs={"n": ("count", None),
              "total": ("sum", "CAST(v AS DECIMAL(18,2))")},
        dim=dim, dim_on=["grp"])
    view.refresh(spark)
    t(_ch(spark, [(1, "y", 15, 1, "update"),   # FK move x -> y
                  (3, "y", 30, 1, "delete"),
                  (5, "z", 50, 1, "insert")]), 0)
    view.refresh(spark)
    got = {r.region: (r.n, float(r.total))
           for r in view.result(spark).collect()}
    want = {r.region: (r.n, float(r.total)) for r in
            t.current(spark).join(dim, "grp")
            .groupBy("region")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.expr("CAST(v AS DECIMAL(18,2))"))
                 .alias("total")).collect()}
    assert got == want
    assert got == {"east": (1, 20.0), "west": (2, 55.0),
                   "north": (1, 50.0)}
    with pytest.raises(ValueError, match="come together"):
        MaterializedAggView(t, str(tmp_path / "mv2"), ["region"],
                            {"n": ("count", None)}, dim=dim)


def test_var_std_moment_maintenance(spark, tmp_path):
    """Second moments are self-maintainable: var/std maintain an exact
    DECIMAL sum of squares alongside the sum, deriving population
    variance at read — still correct through deletes and group
    moves."""
    import statistics

    t = CdcTable(str(tmp_path / "t"), "k", app_id="w")
    t.initialize(_seed(spark))
    view = MaterializedAggView(
        t, str(tmp_path / "mv"), group_cols=["grp"],
        aggs={"v_var": ("var", "CAST(v AS DECIMAL(18,2))"),
              "v_std": ("std", "CAST(v AS DECIMAL(18,2))")})
    view.refresh(spark)
    t(_ch(spark, [(1, "y", 15, 1, "update"),   # move x -> y
                  (4, "y", 40, 1, "delete"),
                  (5, "x", 50, 1, "insert")]), 0)
    view.refresh(spark)
    got = {r.grp: (round(r.v_var, 9), round(r.v_std, 9))
           for r in view.result(spark).collect()}
    rows = {}
    for r in t.current(spark).collect():
        rows.setdefault(r.grp, []).append(float(r.v))
    want = {g: (round(statistics.pvariance(vs), 9),
                round(statistics.pstdev(vs), 9))
            for g, vs in rows.items()}
    assert got == want
    with pytest.raises(ValueError, match="needs an expression"):
        MaterializedAggView(t, str(tmp_path / "mv2"), ["grp"],
                            {"m": ("var", None)})


def test_null_inputs_excluded_from_avg_var_std(spark, tmp_path):
    """SQL AVG/VAR_POP/STDDEV_POP ignore NULL inputs — the maintained
    denominator must be the per-aggregate non-null count, not the
    group's live-row count; an all-NULL group yields NULL."""
    t = CdcTable(str(tmp_path / "t"), "k", app_id="w")
    t.initialize(spark.createDataFrame(
        [(1, "x", 10), (2, "x", None), (3, "x", 20),
         (4, "y", None), (5, "y", None),
         (6, "z", 7), (7, "z", 9)], PAY))
    view = MaterializedAggView(
        t, str(tmp_path / "mv"), group_cols=["grp"],
        aggs={"n": ("count", None), "mean": ("avg", "v"),
              "vr": ("var", "v"), "sd": ("std", "v")})
    view.refresh(spark)

    def recompute():
        return {r.grp: (r.n,
                        None if r.mean is None else round(float(r.mean), 9),
                        None if r.vr is None else round(float(r.vr), 9),
                        None if r.sd is None else round(float(r.sd), 9))
                for r in t.current(spark).groupBy("grp").agg(
                    F.count(F.lit(1)).alias("n"),
                    F.avg("v").alias("mean"),
                    F.var_pop("v").alias("vr"),
                    F.stddev_pop("v").alias("sd")).collect()}

    def got():
        return {r.grp: (r.n,
                        None if r.mean is None else round(float(r.mean), 9),
                        None if r.vr is None else round(float(r.vr), 9),
                        None if r.sd is None else round(float(r.sd), 9))
                for r in view.result(spark).collect()}

    assert got() == recompute()
    assert got()["y"][1:] == (None, None, None)  # all-NULL group
    # deletes of NULL and non-NULL rows maintain both counts; an
    # update flipping NULL -> value moves the denominator too
    t(_ch(spark, [(2, "x", None, 1, "delete"),
                  (6, "z", 7, 1, "delete"),
                  (4, "y", 50, 1, "update")]), 0)
    view.refresh(spark)
    assert got() == recompute()
    assert got()["y"][1:] == (50.0, 0.0, 0.0)


def test_concurrent_refresh_pointer_cas(spark, tmp_path):
    """Two refreshes racing from the same reflected version: exactly
    one publishes; the loser rebases against the winner's state, never
    clobbers its result dir, and leaves no stray staging dirs."""
    t = CdcTable(str(tmp_path / "t"), "k", app_id="w")
    t.initialize(_seed(spark))
    store = str(tmp_path / "mv")
    a, b = _view(t, store), _view(t, store)
    a.refresh(spark)
    t(_ch(spark, [(1, "x", 15, 1, "update"),
                  (9, "y", 90, 1, "insert")]), 0)

    real = MaterializedAggView._publish_exclusive
    raced = {"n": 0}

    def interleave(self, *args):
        # first publish attempt: let the OTHER view win the slot first
        if self is a and raced["n"] == 0:
            raced["n"] += 1
            b.refresh(spark)
        return real(self, *args)

    MaterializedAggView._publish_exclusive = interleave
    try:
        assert a.refresh(spark) == t._latest_version(spark)
    finally:
        MaterializedAggView._publish_exclusive = real
    assert raced["n"] == 1
    assert _as_dict(a.result(spark)) == _recompute(t, spark)
    # the loser's staged dir is gone: only the winning result dir and
    # pointer markers remain in the store
    ptr = a._pointer()
    leftovers = [n for n in os.listdir(store)
                 if not n.startswith("_ptr_") and n != ptr["dir"]]
    assert leftovers == []


def test_legacy_current_json_pointer_still_resolves(spark, tmp_path):
    """Stores written before the CAS markers published a single
    replaced _current.json — reading and refreshing them still works."""
    import json as _json
    t = CdcTable(str(tmp_path / "t"), "k", app_id="w")
    t.initialize(_seed(spark))
    view = _view(t, str(tmp_path / "mv"))
    view.refresh(spark)
    # rewrite the store into the legacy shape
    ptr = view._pointer()
    os.rename(f"{view.store}/{ptr['dir']}", f"{view.store}/r0")
    for n in os.listdir(view.store):
        if n.startswith("_ptr_"):
            os.unlink(f"{view.store}/{n}")
    with open(f"{view.store}/_current.json", "w") as fh:
        _json.dump({"table_version": ptr["table_version"],
                    "refresh": 0, "dir": "r0"}, fh)
    assert view.reflected_version() == ptr["table_version"]
    t(_ch(spark, [(9, "y", 90, 1, "insert")]), 0)
    view.refresh(spark)
    assert _as_dict(view.result(spark)) == _recompute(t, spark)
