"""Named version refs (Iceberg-style TAGS) on the CDC tables: a tag is
a durable name for a committed version, recorded by a manifest-only
commit and carried in every later manifest (vacuum-proof, one marker
read). ``at_tag`` time-travels by name, and VACUUM PINS tagged
versions — the "snapshot we trained on" cannot be aged out by a
retention policy until the tag is deleted.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from systems_spark.streaming import CdcTable, PartitionedCdcTable

PAY = "k long, s string, v long"
CH_SCHEMA = PAY + ", seq long, op string"


def _ch(spark, rows):
    return spark.createDataFrame(rows, CH_SCHEMA)


def _seed(spark):
    return spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], PAY)


def test_tag_roundtrip_and_guards(spark, tmp_path):
    t = CdcTable(str(tmp_path / "t"), "k", app_id="w")
    t.initialize(_seed(spark))
    t(_ch(spark, [(1, "a1", 11, 1, "update")]), 0)
    t(_ch(spark, [(2, "b1", 21, 2, "update")]), 1)

    v = t.tag(spark, "train_v1", 0)
    assert v == 2  # the tag itself is a (manifest-only) commit
    assert t.tags(spark) == {"train_v1": 0}
    tagged = {r.k: r.s for r in t.at_tag(spark, "train_v1")
              .where("NOT _cdc_deleted").collect()}
    assert tagged == {1: "a1", 2: "b", 3: "c"}  # version 0's state

    assert t.tag(spark, "train_v1", 0) == 2  # idempotent re-tag
    with pytest.raises(ValueError, match="already names"):
        t.tag(spark, "train_v1", 1)
    with pytest.raises(ValueError, match="not committed"):
        t.tag(spark, "x", 99)
    with pytest.raises(KeyError):
        t.at_tag(spark, "nope")

    t.delete_tag(spark, "train_v1")
    assert t.tags(spark) == {}
    with pytest.raises(KeyError):
        t.at_tag(spark, "train_v1")
    # and the map kept riding through the merges in between
    t(_ch(spark, [(3, "c1", 31, 3, "update")]), 2)
    assert t.tags(spark) == {}


def test_vacuum_pins_tagged_versions_flat(spark, tmp_path):
    base = str(tmp_path / "t")
    t = CdcTable(base, "k", app_id="w")
    t.initialize(_seed(spark))
    for i in range(3):
        t(_ch(spark, [(1, f"s{i}", 10 + i, i + 1, "update")]), i)
    t.tag(spark, "pin", 0)

    dropped = t.vacuum(spark, keep_last=1)
    assert 0 not in dropped           # pinned
    assert -1 in dropped and 1 in dropped
    # the pinned version stays fully readable by tag
    pinned = {r.k: r.s for r in t.at_tag(spark, "pin")
              .where("NOT _cdc_deleted").collect()}
    assert pinned == {1: "s0", 2: "b", 3: "c"}

    # deleting the tag releases it to the NEXT vacuum
    t.delete_tag(spark, "pin")
    dropped = t.vacuum(spark, keep_last=1)
    assert 0 in dropped
    with pytest.raises(Exception):
        t.at_version(spark, 0)


def test_vacuum_pins_tagged_versions_partitioned(spark, tmp_path):
    base = str(tmp_path / "t")
    t = PartitionedCdcTable(base, "k", app_id="w", num_buckets=4)
    t.initialize(_seed(spark))
    for i in range(3):
        t(_ch(spark, [(1, f"s{i}", 10 + i, i + 1, "update")]), i)
    t.tag(spark, "pin", 0)
    t.vacuum(spark, keep_last=1)
    assert 0 in t.versions(spark)
    pinned = {r.k: r.s for r in t.at_tag(spark, "pin")
              .where("NOT _cdc_deleted").collect()}
    assert pinned == {1: "s0", 2: "b", 3: "c"}
    # tag survives a restore (standing map carried from latest)
    t.restore(spark, 0)
    assert t.tags(spark) == {"pin": 0}


def test_describe_detail_both_layouts(spark, tmp_path):
    """DESCRIBE DETAIL: the one-call audit surface — layout, version,
    files/bytes, standing fence/constraints/tags/txn."""
    t = CdcTable(str(tmp_path / "flat"), "k", app_id="w")
    t.initialize(_seed(spark))
    t(_ch(spark, [(1, "a1", 11, 1, "update")]), 0)
    t.add_constraint(spark, "v_nonneg", "v >= 0")
    t.tag(spark, "pin", 0)
    d = t.describe_detail(spark)
    assert d["layout"] == "snapshot-per-version"
    assert d["version"] == 2 and d["rows"] == 3
    assert d["num_files"] > 0 and d["size_bytes"] > 0
    assert d["constraints"] == {"v_nonneg": "v >= 0"}
    assert d["tags"] == {"pin": 0} and d["txn"] == {"w": 0}

    p = PartitionedCdcTable(str(tmp_path / "part"), "k", app_id="w",
                            num_buckets=4, write_mode="merge_on_read")
    p.initialize(_seed(spark))
    p(_ch(spark, [(9, "z", 90, 1, "insert")]), 0)
    d = p.describe_detail(spark)
    assert d["layout"] == "bucketed"
    assert d["write_mode"] == "merge_on_read"
    assert d["pending_deltas"] == 1
    assert d["mapped_buckets"] >= 1 and d["num_files"] > 0
    assert d["retained_versions"] == 2


def test_vacuum_dry_run_deletes_nothing(spark, tmp_path):
    for cls, kw in ((CdcTable, {}),
                    (PartitionedCdcTable, {"num_buckets": 4})):
        t = cls(str(tmp_path / cls.__name__), "k", app_id="w", **kw)
        t.initialize(_seed(spark))
        for i in range(3):
            t(_ch(spark, [(1, f"s{i}", 10 + i, i + 1, "update")]), i)
        before = set(t.versions(spark))
        would = t.vacuum(spark, keep_last=1, dry_run=True)
        assert would  # something is reclaimable
        assert set(t.versions(spark)) == before  # nothing happened
        t.at_version(spark, min(before))         # still readable
        real = t.vacuum(spark, keep_last=1)
        # the partitioned REAL return is data-dir versions (a superset
        # shape); the would-drop marker list must be contained in the
        # still-real outcome: every would-drop version is now gone
        assert not set(would) & set(t.versions(spark))
        assert real
