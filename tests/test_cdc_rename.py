"""RENAME COLUMN without rewrite (streaming/sinks.py
CdcTable.rename_column — Delta's column mapping): a manifest-only
commit updates the logical→physical map; on-disk files keep their
PHYSICAL names forever, so files written before and after a rename
read uniformly; time travel shows each version under its own names;
writes arrive in logical names and land physically; guards block the
renames that would dangle stored expressions or ambiguate the map.
"""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from systems_spark.streaming import CdcTable, PartitionedCdcTable

PAY = "k long, s string, v long"
CH = PAY + ", seq long, op string"
CH_RENAMED = "k long, s string, price long, seq long, op string"


def _ch(spark, rows, schema=CH):
    return spark.createDataFrame(rows, schema)


def _seed(spark):
    return spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], PAY)


def _mtimes(path):
    out = {}
    for root, _d, files in os.walk(path):
        if "_commits" in root:
            continue
        for f in files:
            if f.endswith(".parquet"):
                p = os.path.join(root, f)
                out[p] = os.path.getmtime(p)
    return out


@pytest.mark.parametrize("make", [
    lambda p: CdcTable(p, "k", app_id="w"),
    lambda p: PartitionedCdcTable(p, "k", app_id="w", num_buckets=4),
    lambda p: PartitionedCdcTable(p, "k", app_id="w", num_buckets=4,
                                  write_mode="merge_on_read"),
])
def test_rename_without_rewrite_then_write_through(spark, tmp_path,
                                                   make):
    t = make(str(tmp_path / "t"))
    t.initialize(_seed(spark))
    t(_ch(spark, [(1, "a", 11, 1, "update")]), 0)
    before = _mtimes(str(tmp_path / "t"))

    t.rename_column(spark, "v", "price")
    # ZERO data movement: every parquet file untouched
    assert _mtimes(str(tmp_path / "t")) == before
    assert {r.k: r.price for r in t.current(spark).collect()} \
        == {1: 11, 2: 20, 3: 30}
    assert "v" not in t.current(spark).columns

    # writes arrive under the NEW logical name and merge onto old rows
    t(_ch(spark, [(2, "b", 99, 2, "update"),
                  (9, "i", 90, 2, "insert")], CH_RENAMED), 1)
    assert {r.k: r.price for r in t.current(spark).collect()} \
        == {1: 11, 2: 99, 3: 30, 9: 90}
    # DML under the new name
    t.delete_where(spark, "price >= 90")
    assert {r.k for r in t.current(spark).collect()} == {1, 3}

    # time travel shows each version under ITS OWN names
    assert "v" in t.at_version(spark, 0).columns
    latest = t._latest_version(spark)
    assert "price" in t.at_version(spark, latest).columns


def test_rename_guards(spark, tmp_path):
    t = CdcTable(str(tmp_path / "t"), "k", app_id="w")
    t.initialize(_seed(spark))
    with pytest.raises(ValueError, match="merge key"):
        t.rename_column(spark, "k", "kk")
    with pytest.raises(ValueError, match="no such column"):
        t.rename_column(spark, "nope", "x")
    with pytest.raises(ValueError, match="collides"):
        t.rename_column(spark, "v", "s")
    with pytest.raises(ValueError, match="reserved"):
        t.rename_column(spark, "v", "seq")
    t.add_constraint(spark, "v_pos", "v >= 0")
    with pytest.raises(ValueError, match="constraint"):
        t.rename_column(spark, "v", "price")
    t.add_generated_column(spark, "s2", "concat(s, s)")
    with pytest.raises(ValueError, match="generated"):
        t.rename_column(spark, "s", "name")
    # physical-name collision after a round trip is refused: v -> w
    # leaves physical 'v' in use, so a later rename TO 'v' is ambiguous
    t2 = CdcTable(str(tmp_path / "t2"), "k", app_id="w")
    t2.initialize(_seed(spark))
    t2.rename_column(spark, "v", "w")
    with pytest.raises(ValueError, match="collides"):
        t2.rename_column(spark, "s", "v")


def test_constraints_and_generated_after_rename(spark, tmp_path):
    """Standing expressions added AFTER a rename reference the new
    logical names and evaluate against logical views of physical
    batches/snapshots."""
    t = PartitionedCdcTable(str(tmp_path / "t"), "k", app_id="w",
                            num_buckets=4)
    t.initialize(_seed(spark))
    t.rename_column(spark, "v", "price")
    t.add_constraint(spark, "price_cap", "price < 1000")
    with pytest.raises(ValueError, match="price_cap"):
        t(_ch(spark, [(9, "i", 5000, 1, "insert")], CH_RENAMED), 0)
    t.add_generated_column(spark, "price2", "price * 2")
    t(_ch(spark, [(9, "i", 90, 1, "insert")], CH_RENAMED), 0)
    got = {r.k: (r.price, r.price2) for r in t.current(spark).collect()}
    assert got[9] == (90, 180)
    assert got[1] == (10, 20)      # backfill went through the rename


def test_change_feed_and_matview_after_rename(spark, tmp_path):
    from systems_spark.streaming import MaterializedAggView

    t = PartitionedCdcTable(str(tmp_path / "t"), "k", app_id="w",
                            num_buckets=4, write_mode="merge_on_read")
    t.initialize(_seed(spark))
    t.rename_column(spark, "v", "price")
    t(_ch(spark, [(1, "a", 11, 1, "update"),
                  (9, "i", 90, 1, "insert")], CH_RENAMED), 0)
    ch = t.changes_between(spark, -1, t._latest_version(spark),
                           preimages=True)
    assert "price" in ch.columns and "v" not in ch.columns
    got = {(r.k, r._change_type): r.price for r in ch.collect()}
    assert got[(1, "update_postimage")] == 11
    assert got[(9, "insert")] == 90

    view = MaterializedAggView(
        t, str(tmp_path / "mv"), group_cols=["s"],
        aggs={"total": ("sum", "CAST(price AS DECIMAL(18,2))")})
    view.refresh(spark)
    t(_ch(spark, [(2, "b", 99, 2, "update")], CH_RENAMED), 1)
    view.refresh(spark)
    got = {r.s: float(r.total) for r in view.result(spark).collect()}
    assert got == {"a": 11.0, "b": 99.0, "c": 30.0, "i": 90.0}


def test_streaming_source_rides_through_rename(spark, tmp_path):
    """A rename is PRESENTATION, not evolution: physical names are
    constant on disk, so a RUNNING stream keeps serving under the
    logical names it pinned (Delta column-mapping streaming behavior),
    while a FRESH stream pins the new names and serves PRE-rename
    delta files under them too."""
    from systems_spark.streaming import CdcChangeFeedDataSource

    t = PartitionedCdcTable(str(tmp_path / "t"), "k", app_id="w",
                            num_buckets=4, write_mode="merge_on_read")
    t.initialize(_seed(spark))
    t(_ch(spark, [(1, "a", 11, 1, "update")]), 0)
    spark.dataSource.register(CdcChangeFeedDataSource)
    got = []

    def run(ck):
        q = (spark.readStream.format("cdc_change_feed")
             .option("path", str(tmp_path / "t")).load()
             .writeStream.foreachBatch(
                 lambda df, _b: got.append(
                     (df.columns, {tuple(r) for r in df.collect()})))
             .option("checkpointLocation", ck)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    run(str(tmp_path / "ck1"))
    assert "v" in got[-1][0]
    t.rename_column(spark, "v", "price")
    t(_ch(spark, [(9, "i", 90, 2, "insert")], CH_RENAMED), 1)

    # the RESUMED stream rides through the rename without error (a
    # restart re-pins to the current logical names; only the NEW
    # epoch is delivered — physical bytes never moved)
    run(str(tmp_path / "ck1"))
    cols, rows = got[-1]
    assert "price" in cols and "v" not in cols
    assert {(r[0], r[2]) for r in rows} == {(9, 90)}

    # a FRESH stream pins the new names; the PRE-rename delta file
    # serves under them (physical names constant on disk)
    got.clear()
    run(str(tmp_path / "ck2"))
    allrows = set().union(*(r for _c, r in got)) if got else set()
    assert all("price" in c and "v" not in c for c, _r in got)
    assert {(r[0], r[2]) for r in allrows} == {(1, 11), (9, 90)}

    # (a genuinely ADDED column still fails a RUNNING pinned stream —
    # test_cdf_source.py::test_feed_fails_loud_on_mid_stream_evolution
    # pins that with a continuously running query; restarts re-pin)


def test_clone_and_merge_into_carry_the_map(spark, tmp_path):
    t = CdcTable(str(tmp_path / "t"), "k", app_id="w")
    t.initialize(_seed(spark))
    t.rename_column(spark, "v", "price")
    clone = t.clone_to(spark, str(tmp_path / "c"))
    assert "price" in clone.current(spark).columns
    clone.merge_into(
        spark, spark.createDataFrame([(1, 5), (9, 9)], "k long, sv long"),
        when_matched_update={"price": "t.price + s.sv"},
        when_not_matched_insert={"price": "s.sv", "s": "'new'"})
    got = {r.k: r.price for r in clone.current(spark).collect()}
    assert got == {1: 15, 2: 20, 3: 30, 9: 9}
    # lookup under the map (partitioned)
    pt = PartitionedCdcTable(str(tmp_path / "pt"), "k", app_id="w",
                             num_buckets=4, write_mode="merge_on_read")
    pt.initialize(_seed(spark))
    pt.rename_column(spark, "v", "price")
    assert [r.price for r in pt.lookup(spark, [2]).collect()] == [20]


@pytest.mark.parametrize("make", [
    lambda p: CdcTable(p, "k", app_id="w"),
    lambda p: PartitionedCdcTable(p, "k", app_id="w", num_buckets=4),
    lambda p: PartitionedCdcTable(p, "k", app_id="w", num_buckets=4,
                                  write_mode="merge_on_read"),
])
def test_drop_column_without_rewrite(spark, tmp_path, make):
    t = make(str(tmp_path / "t"))
    t.initialize(_seed(spark))
    t(_ch(spark, [(1, "a", 11, 1, "update")]), 0)
    before = _mtimes(str(tmp_path / "t"))
    t.drop_column(spark, "s")
    assert _mtimes(str(tmp_path / "t")) == before   # zero data movement
    assert set(t.current(spark).columns) == {"k", "v"}
    # time travel BEFORE the drop still reads the column
    assert "s" in t.at_version(spark, 0).columns

    # writers stop supplying it; merges keep working
    t(spark.createDataFrame([(9, 90, 2, "insert"), (1, 12, 2, "update")],
                            "k long, v long, seq long, op string"), 1)
    assert {r.k: r.v for r in t.current(spark).collect()} \
        == {1: 12, 2: 20, 3: 30, 9: 90}
    # a writer still supplying the dropped column is confused: raise
    with pytest.raises(ValueError, match="DROPPED"):
        t(_ch(spark, [(5, "x", 50, 3, "insert")]), 2)


def test_drop_guards_and_generated(spark, tmp_path):
    t = CdcTable(str(tmp_path / "t"), "k", app_id="w")
    t.initialize(_seed(spark))
    with pytest.raises(ValueError, match="merge key"):
        t.drop_column(spark, "k")
    with pytest.raises(ValueError, match="no such column"):
        t.drop_column(spark, "nope")
    t.add_constraint(spark, "v_pos", "v >= 0")
    with pytest.raises(ValueError, match="CHECK constraint"):
        t.drop_column(spark, "v")
    t.drop_constraint(spark, "v_pos")
    # dropping a GENERATED column retires its expression too
    t.add_generated_column(spark, "v2", "v * 2")
    t.drop_column(spark, "v2")
    assert "v2" not in t.current(spark).columns
    assert "v2" not in t.constraints(spark)
    assert "v2" not in t._latest_manifest(spark).get("generated", {})
    t(_ch(spark, [(9, "i", 90, 1, "insert")]), 0)  # no recompute crash
    assert {r.k for r in t.current(spark).collect()} == {1, 2, 3, 9}
    # the dropped name stays reserved
    with pytest.raises(ValueError, match="reserved|collides"):
        t.rename_column(spark, "v", "v2")


def test_drop_then_rename_compose_and_feed_excludes(spark, tmp_path):
    t = PartitionedCdcTable(str(tmp_path / "t"), "k", app_id="w",
                            num_buckets=4, write_mode="merge_on_read")
    t.initialize(_seed(spark))
    t.drop_column(spark, "s")
    t.rename_column(spark, "v", "price")
    t(spark.createDataFrame([(1, 11, 1, "update")],
                            "k long, price long, seq long, op string"), 0)
    ch = t.changes_between(spark, -1, t._latest_version(spark),
                           preimages=True)
    assert set(ch.columns) == {"k", "price", "seq", "_change_type"}
    got = {(r.k, r._change_type): r.price for r in ch.collect()}
    assert got[(1, "update_postimage")] == 11
