"""CONVERT TO TABLE (zero-rewrite adoption, r12): an existing plain
parquet directory comes under the transaction log WITHOUT rewriting a
byte — the seed manifest references it in place and the bookkeeping
columns are synthesized at read time. Delta's CONVERT TO DELTA /
Iceberg's add_files, for both layouts (the bucketed layout adopts as
one bucket; rebucket() is the explicit scale-out rewrite)."""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from systems_spark.streaming import CdcTable, PartitionedCdcTable

PAY = "k long, s string, v long"
CH_SCHEMA = PAY + ", seq long, op string"


def _write_source(spark, path, rows=None):
    rows = rows or [(1, "a", 10), (2, "b", 20), (3, "c", 30)]
    spark.createDataFrame(rows, PAY).coalesce(1) \
        .write.mode("overwrite").parquet(path)
    return rows


def _ch(spark, rows):
    return spark.createDataFrame(rows, CH_SCHEMA)


def _rows(df, cols=("k", "s", "v")):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def _data_dirs(path):
    return sorted(n for n in os.listdir(path)
                  if n.startswith(("version=", "delta=")))


# ---------------------------------------------------------------- flat


def test_flat_adopt_is_zero_copy_and_reads(spark, tmp_path):
    src = str(tmp_path / "ext" / "src")
    rows = _write_source(spark, src)
    t = CdcTable(str(tmp_path / "t"), key_cols="k", app_id="ad1")
    t.adopt(spark, src)
    # zero copy: the table dir holds ONLY the commit log
    assert _data_dirs(str(tmp_path / "t")) == []
    assert _rows(t.current(spark)) == sorted(rows)
    det = t.describe_detail(spark)
    assert det["rows"] == 3 and det["version"] == -1
    # the snapshot carries synthesized bookkeeping columns
    snap = t.snapshot(spark)
    assert {"seq", t.DELETED} <= set(snap.columns)
    assert snap.where(F.col(t.DELETED)).count() == 0
    # lookup (API parity) works straight off the adopted data
    assert _rows(t.lookup(spark, [2])) == [(2, "b", 20)]


def test_flat_adopt_merge_time_travel_and_feed(spark, tmp_path):
    src = str(tmp_path / "ext" / "src")
    _write_source(spark, src)
    t = CdcTable(str(tmp_path / "t"), key_cols="k", app_id="ad2")
    t.adopt(spark, src, seq=0)
    t(_ch(spark, [(1, "a1", 11, 1, "update"),
                  (2, "x", 0, 1, "delete"),
                  (4, "d", 40, 1, "insert")]), 0)
    assert _rows(t.current(spark)) == [(1, "a1", 11), (3, "c", 30),
                                       (4, "d", 40)]
    # time travel to the adopted seed still serves the plain files
    assert _rows(t.at_version(spark, -1).where(~F.col(t.DELETED))) == \
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)]
    # the change feed across the adoption boundary nets correctly
    feed = {(r.k, r._change_type)
            for r in t.changes_between(spark, -1, 0).collect()}
    assert feed == {(1, "update"), (2, "delete"), (4, "insert")}
    # and the source directory was never touched
    assert _rows(spark.read.parquet(src)) == \
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)]


def test_flat_adopt_idempotent_and_guards(spark, tmp_path):
    src = str(tmp_path / "ext" / "src")
    _write_source(spark, src)
    t = CdcTable(str(tmp_path / "t"), key_cols="k", app_id="ad3")
    t.adopt(spark, src)
    t.adopt(spark, src)  # second adopt: no-op
    # adopt after initialize: no-op (seed already committed)
    t2 = CdcTable(str(tmp_path / "t2"), key_cols="k", app_id="ad3b")
    t2.initialize(spark.createDataFrame([(9, "z", 0)], PAY))
    t2.adopt(spark, src)
    assert _rows(t2.current(spark)) == [(9, "z", 0)]

    t3 = CdcTable(str(tmp_path / "t3"), key_cols="k", app_id="ad3c")
    with pytest.raises(ValueError, match="no parquet data"):
        t3.adopt(spark, str(tmp_path / "missing"))
    with pytest.raises(ValueError, match="overlaps the table path"):
        t3.adopt(spark, str(tmp_path / "t3" / "inner"))
    # source inside table path and table inside source both refuse
    t4 = CdcTable(str(tmp_path / "ext"), key_cols="k", app_id="ad3d")
    with pytest.raises(ValueError, match="overlaps the table path"):
        t4.adopt(spark, src)
    # bookkeeping-name collision
    bad = str(tmp_path / "ext" / "bad")
    spark.createDataFrame([(1, 5)], "k long, seq long") \
        .write.mode("overwrite").parquet(bad)
    with pytest.raises(ValueError, match="collide"):
        t3.adopt(spark, bad)
    # missing merge key
    nokey = str(tmp_path / "ext" / "nokey")
    spark.createDataFrame([("a", 1)], "s string, v long") \
        .write.mode("overwrite").parquet(nokey)
    with pytest.raises(ValueError, match="merge key"):
        t3.adopt(spark, nokey)


def test_flat_adopt_rename_then_merge(spark, tmp_path):
    """A manifest-only DDL commit shares the plain directory — the
    synthesis flag must ride the noop, and a later merge under the new
    logical name lands on the original physical one."""
    src = str(tmp_path / "ext" / "src")
    _write_source(spark, src)
    t = CdcTable(str(tmp_path / "t"), key_cols="k", app_id="ad4")
    t.adopt(spark, src)
    t.rename_column(spark, "v", "val")
    # still zero-copy: rename moved no data
    assert _data_dirs(str(tmp_path / "t")) == []
    assert _rows(t.current(spark), ("k", "s", "val")) == \
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)]
    t(spark.createDataFrame([(1, "a1", 11, 1, "update")],
                            "k long, s string, val long, seq long, "
                            "op string"), 0)
    assert _rows(t.current(spark), ("k", "s", "val")) == \
        [(1, "a1", 11), (2, "b", 20), (3, "c", 30)]


def test_flat_adopt_clone_serves_source(spark, tmp_path):
    src = str(tmp_path / "ext" / "src")
    _write_source(spark, src)
    t = CdcTable(str(tmp_path / "t"), key_cols="k", app_id="ad5")
    t.adopt(spark, src)
    clone = t.clone_to(spark, str(tmp_path / "c"))
    assert _rows(clone.current(spark)) == \
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)]
    # clone dir is metadata-only too
    assert _data_dirs(str(tmp_path / "c")) == []
    clone(_ch(spark, [(1, "CL", 99, 1, "update")]), 0)
    assert _rows(clone.current(spark))[0] == (1, "CL", 99)
    assert _rows(t.current(spark))[0] == (1, "a", 10)  # source isolated


def test_flat_adopt_vacuum_never_touches_source(spark, tmp_path):
    src = str(tmp_path / "ext" / "src")
    _write_source(spark, src)
    t = CdcTable(str(tmp_path / "t"), key_cols="k", app_id="ad6")
    t.adopt(spark, src)
    t(_ch(spark, [(1, "a1", 11, 1, "update")]), 0)
    t(_ch(spark, [(2, "b2", 22, 2, "update")]), 1)
    dropped = t.vacuum(spark, keep_last=1)
    assert -1 in dropped
    # the adopted marker is gone, but the external directory survives
    assert _rows(spark.read.parquet(src)) == \
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)]
    assert _rows(t.current(spark)) == [(1, "a1", 11), (2, "b2", 22),
                                       (3, "c", 30)]


def test_flat_adopt_optimize_materializes(spark, tmp_path):
    src = str(tmp_path / "ext" / "src")
    _write_source(spark, src)
    t = CdcTable(str(tmp_path / "t"), key_cols="k", app_id="ad7")
    t.adopt(spark, src)
    t.optimize(spark, ["k"], [(1, 3)])
    man = t._latest_manifest(spark)
    assert not man.get("plain_payload")
    assert _rows(t.current(spark)) == \
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)]


def test_flat_adopt_skipping_index_guard(spark, tmp_path):
    from systems_spark.operators.zorder import CdcSkippingIndex

    src = str(tmp_path / "ext" / "src")
    _write_source(spark, src)
    t = CdcTable(str(tmp_path / "t"), key_cols="k", app_id="ad8")
    t.adopt(spark, src)
    idx = CdcSkippingIndex()
    with pytest.raises(ValueError, match="ADOPTED plain directory"):
        idx.aggregate(spark, t, ["v"])
    # after materialization (compact) the index serves normally
    t.compact(spark, fence_seq=0)
    row = idx.aggregate(spark, t, ["v"]).collect()[0]
    assert (row["count_rows"], row["v_min"], row["v_max"]) == (3, 10, 30)


# ---------------------------------------------------------- partitioned


def test_part_adopt_reads_lookup_and_guards(spark, tmp_path):
    src = str(tmp_path / "ext" / "src")
    _write_source(spark, src)
    with pytest.raises(ValueError, match="num_buckets=1"):
        PartitionedCdcTable(str(tmp_path / "p0"), key_cols="k",
                            app_id="pa1", num_buckets=4) \
            .adopt(spark, src)
    t = PartitionedCdcTable(str(tmp_path / "p"), key_cols="k",
                            app_id="pa1", num_buckets=1)
    t.adopt(spark, src)
    assert _data_dirs(str(tmp_path / "p")) == []  # zero copy
    assert _rows(t.current(spark)) == \
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)]
    assert _rows(t.lookup(spark, [1, 3])) == [(1, "a", 10), (3, "c", 30)]
    # a handle with the wrong bucket count fails loudly on write
    wrong = PartitionedCdcTable(str(tmp_path / "p"), key_cols="k",
                                app_id="pa1", num_buckets=8)
    with pytest.raises(ValueError, match="configured"):
        wrong(_ch(spark, [(1, "x", 0, 1, "update")]), 0)


def test_part_adopt_mor_fold_and_delta_compaction(spark, tmp_path):
    src = str(tmp_path / "ext" / "src")
    _write_source(spark, src)
    t = PartitionedCdcTable(str(tmp_path / "p"), key_cols="k",
                            app_id="pa2", num_buckets=1,
                            write_mode="merge_on_read")
    t.adopt(spark, src)
    t(_ch(spark, [(1, "a1", 11, 1, "update"),
                  (2, "x", 0, 1, "delete")]), 0)
    # the delta stacked on the PLAIN bucket — adoption still zero-copy
    assert all(d.startswith("delta=") for d in _data_dirs(str(tmp_path / "p")))
    want = [(1, "a1", 11), (3, "c", 30)]
    assert _rows(t.current(spark)) == want
    feed = {(r.k, r._change_type)
            for r in t.changes_between(spark, -1, 0).collect()}
    assert feed == {(1, "update"), (2, "delete")}
    # folding the deltas rewrites the single bucket and clears the flag
    t.compact_deltas(spark)
    man = t._latest_manifest(spark)
    assert not man.get("plain_dirs") and not man.get("pending")
    assert _rows(t.current(spark)) == want
    # the external directory still holds the original rows, untouched
    assert _rows(spark.read.parquet(src)) == \
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)]


def test_part_adopt_rebucket_scales_out(spark, tmp_path):
    from systems_spark.operators.zorder import CdcSkippingIndex

    src = str(tmp_path / "ext" / "src")
    _write_source(spark, src)
    t = PartitionedCdcTable(str(tmp_path / "p"), key_cols="k",
                            app_id="pa3", num_buckets=1)
    t.adopt(spark, src)
    idx = CdcSkippingIndex()
    with pytest.raises(ValueError, match="ADOPTED plain directory"):
        idx.aggregate(spark, t, ["v"])
    t.rebucket(spark, 4)
    man = t._latest_manifest(spark)
    assert not man.get("plain_dirs")
    assert man["table_conf"]["num_buckets"] == 4
    assert _rows(t.current(spark)) == \
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)]
    # a fresh handle at the new count merges with real bucket pruning
    t4 = PartitionedCdcTable(str(tmp_path / "p"), key_cols="k",
                             app_id="pa3", num_buckets=4)
    t4(_ch(spark, [(3, "c3", 33, 1, "update")]), 1)
    assert _rows(t4.current(spark)) == \
        [(1, "a", 10), (2, "b", 20), (3, "c3", 33)]
    assert _rows(t4.lookup(spark, [3])) == [(3, "c3", 33)]
    # and the skipping index now serves (exact vs the live view)
    row = idx.aggregate(spark, t4, ["v"]).collect()[0]
    assert (row["count_rows"], row["v_min"], row["v_max"]) == (3, 10, 33)


def test_part_adopt_cow_merge_materializes_bucket(spark, tmp_path):
    src = str(tmp_path / "ext" / "src")
    _write_source(spark, src)
    t = PartitionedCdcTable(str(tmp_path / "p"), key_cols="k",
                            app_id="pa4", num_buckets=1)
    t.adopt(spark, src)
    t(_ch(spark, [(1, "a1", 11, 1, "update"),
                  (4, "d", 40, 1, "insert")]), 0)
    man = t._latest_manifest(spark)
    assert not man.get("plain_dirs")  # the only bucket was rewritten
    assert _rows(t.current(spark)) == \
        [(1, "a1", 11), (2, "b", 20), (3, "c", 30), (4, "d", 40)]
    # time travel to the adopted seed still synthesizes
    assert _rows(t.at_version(spark, -1).where(~F.col(t.DELETED))) == \
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)]


def test_part_adopt_clone_serves_source(spark, tmp_path):
    src = str(tmp_path / "ext" / "src")
    _write_source(spark, src)
    t = PartitionedCdcTable(str(tmp_path / "p"), key_cols="k",
                            app_id="pa5", num_buckets=1,
                            write_mode="merge_on_read")
    t.adopt(spark, src)
    t(_ch(spark, [(1, "a1", 11, 1, "update")]), 0)
    clone = t.clone_to(spark, str(tmp_path / "c"))
    assert _rows(clone.current(spark)) == \
        [(1, "a1", 11), (2, "b", 20), (3, "c", 30)]
    clone(_ch(spark, [(2, "CL", 99, 2, "update")]), 0)
    assert _rows(clone.current(spark)) == \
        [(1, "a1", 11), (2, "CL", 99), (3, "c", 30)]
    assert _rows(t.current(spark)) == \
        [(1, "a1", 11), (2, "b", 20), (3, "c", 30)]


def test_part_adopt_optimize_materializes(spark, tmp_path):
    src = str(tmp_path / "ext" / "src")
    _write_source(spark, src)
    t = PartitionedCdcTable(str(tmp_path / "p"), key_cols="k",
                            app_id="pa7", num_buckets=1)
    t.adopt(spark, src)
    t.optimize(spark, ["v"], [(10, 30)])
    man = t._latest_manifest(spark)
    assert not man.get("plain_dirs")
    assert _rows(t.current(spark)) == \
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)]


def test_part_adopt_vacuum_after_rebucket_spares_source(spark, tmp_path):
    src = str(tmp_path / "ext" / "src")
    _write_source(spark, src)
    t = PartitionedCdcTable(str(tmp_path / "p"), key_cols="k",
                            app_id="pa8", num_buckets=1)
    t.adopt(spark, src)
    t.rebucket(spark, 4)
    t4 = PartitionedCdcTable(str(tmp_path / "p"), key_cols="k",
                             app_id="pa8", num_buckets=4)
    t4(_ch(spark, [(1, "a1", 11, 1, "update")]), 0)
    t4.vacuum(spark, keep_last=1)
    # the adopted seed's marker aged out; the external dir is intact
    assert -1 not in t4.versions(spark)
    assert _rows(spark.read.parquet(src)) == \
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)]
    assert _rows(t4.current(spark)) == \
        [(1, "a1", 11), (2, "b", 20), (3, "c", 30)]


def test_adopt_second_source_is_noop_on_both_layouts(spark, tmp_path):
    src1 = str(tmp_path / "ext" / "one")
    src2 = str(tmp_path / "ext" / "two")
    _write_source(spark, src1)
    _write_source(spark, src2, rows=[(9, "z", 90)])
    flat = CdcTable(str(tmp_path / "t"), key_cols="k", app_id="adn")
    flat.adopt(spark, src1)
    flat.adopt(spark, src2)  # seed already committed: no-op
    assert _rows(flat.current(spark)) == \
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)]
    part = PartitionedCdcTable(str(tmp_path / "p"), key_cols="k",
                               app_id="adn", num_buckets=1)
    part.adopt(spark, src1)
    part.adopt(spark, src2)
    assert _rows(part.current(spark)) == \
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)]


def test_adopt_constraints_validate_synthesized_snapshot(spark, tmp_path):
    """add_constraint on a freshly adopted table is a manifest-only
    commit over the shared plain dir: validation must run against the
    SYNTHESIZED snapshot, the flag must ride the noop, and the
    constraint must gate the first post-adoption merge."""
    src = str(tmp_path / "ext" / "src")
    _write_source(spark, src)
    t = CdcTable(str(tmp_path / "t"), key_cols="k", app_id="adc")
    t.adopt(spark, src)
    # violated by existing (adopted) rows → rejected
    with pytest.raises(ValueError, match="existing"):
        t.add_constraint(spark, "v_big", "v > 15")
    t.add_constraint(spark, "v_pos", "v > 0")
    # the noop carried the synthesis flag: reads still work, zero-copy
    assert _data_dirs(str(tmp_path / "t")) == []
    assert len(_rows(t.current(spark))) == 3
    with pytest.raises(ValueError, match="v_pos"):
        t(_ch(spark, [(4, "d", -5, 1, "insert")]), 0)
    t(_ch(spark, [(4, "d", 40, 1, "insert")]), 1)
    assert _rows(t.current(spark))[-1] == (4, "d", 40)


def test_part_adopt_restore_and_schema_evolution(spark, tmp_path):
    src = str(tmp_path / "ext" / "src")
    _write_source(spark, src)
    t = PartitionedCdcTable(str(tmp_path / "p"), key_cols="k",
                            app_id="pa6", num_buckets=1,
                            write_mode="merge_on_read",
                            schema_evolution="merge")
    t.adopt(spark, src)
    # an evolving delta adds a column while the bucket is still plain:
    # the manifest schema grows; the plain files NULL-fill it by name
    t(spark.createDataFrame([(1, "a1", 11, "EU", 1, "update")],
                            "k long, s string, v long, region string, "
                            "seq long, op string"), 0)
    got = {(r.k, r.region) for r in t.current(spark).collect()}
    assert got == {(1, "EU"), (2, None), (3, None)}
    # restore to the adopted seed materializes it (old schema back)
    v = t.restore(spark, -1)
    assert v >= 1
    assert _rows(t.current(spark)) == \
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)]
    assert "region" not in t.current(spark).columns
