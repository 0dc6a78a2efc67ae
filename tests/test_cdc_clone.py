"""SHALLOW CLONE (streaming/sinks.py CdcTable.clone_to): a new table
whose seed manifest references the source's current data IN PLACE —
zero bytes copied — that then diverges with clone-local commits.
Cloning TAGS the source version, and vacuum pins tagged versions, so
(unlike Delta's shallow clones) the referenced data cannot age out
while the tag lives; dropping the tag releases the pin and a
subsequently vacuumed reference fails LOUDLY, never silently.
"""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from systems_spark.streaming import CdcTable, PartitionedCdcTable

PAY = "k long, s string, v long"
CH_SCHEMA = PAY + ", seq long, op string"


def _ch(spark, rows):
    return spark.createDataFrame(rows, CH_SCHEMA)


def _seed(spark):
    return spark.createDataFrame(
        [(k, f"s{k}", k * 10) for k in range(1, 9)], PAY)


def _rows(t, spark):
    return sorted(tuple(r) for r in
                  t.current(spark).select("k", "s", "v").collect())


def _data_bytes_under(path):
    total = 0
    for root, _dirs, files in os.walk(path):
        if "_commits" in root:
            continue
        total += sum(os.path.getsize(os.path.join(root, f))
                     for f in files if f.endswith(".parquet"))
    return total


def test_flat_clone_is_zero_copy_and_diverges(spark, tmp_path):
    src = CdcTable(str(tmp_path / "src"), "k", app_id="w")
    src.initialize(_seed(spark))
    src(_ch(spark, [(1, "x", 11, 1, "update")]), 0)
    at_clone = _rows(src, spark)

    clone = src.clone_to(spark, str(tmp_path / "clone"))
    # metadata-only: no data bytes under the clone path
    assert _data_bytes_under(str(tmp_path / "clone")) == 0
    assert _rows(clone, spark) == at_clone
    # the source version is pinned by a clone tag
    assert any(n.startswith("clone-") and v == 0
               for n, v in src.tags(spark).items())

    # divergence, both directions
    clone(_ch(spark, [(9, "c", 90, 2, "insert")]), 0)
    src(_ch(spark, [(2, "s", 22, 2, "update")]), 1)
    assert (9, "c", 90) in _rows(clone, spark)
    assert (9, "c", 90) not in _rows(src, spark)
    assert (2, "s", 22) in _rows(src, spark)
    assert (2, "s", 22) not in _rows(clone, spark)
    # the clone's txn history started fresh (batch 0 accepted above)
    assert clone._latest_manifest(spark)["txn"][clone.app_id] == 0


def test_source_vacuum_cannot_break_a_live_clone(spark, tmp_path):
    src = CdcTable(str(tmp_path / "src"), "k", app_id="w")
    src.initialize(_seed(spark))
    clone = src.clone_to(spark, str(tmp_path / "clone"))
    before = _rows(clone, spark)
    # source moves on; aggressive retention
    for i in range(3):
        src(_ch(spark, [(1, f"e{i}", i, i + 1, "update")]), i)
    src.vacuum(spark, keep_last=1)
    assert _rows(clone, spark) == before  # tag pinned the clone's data

    # dropping the tag releases the pin; the next vacuum ages the data
    # out and the clone fails LOUDLY (never serves silently wrong)
    tag = clone._latest_manifest(spark)["cloned_from"]["tag"]
    src.delete_tag(spark, tag)
    src.vacuum(spark, keep_last=1)
    with pytest.raises(Exception):
        _rows(clone, spark)


def test_partitioned_mor_clone_pending_and_compaction(spark, tmp_path):
    src = PartitionedCdcTable(str(tmp_path / "src"), "k", app_id="w",
                              num_buckets=4, write_mode="merge_on_read")
    src.initialize(_seed(spark))
    src(_ch(spark, [(1, "x", 11, 1, "update"),
                    (3, "y", 30, 1, "delete")]), 0)   # pending delta
    clone = src.clone_to(spark, str(tmp_path / "clone"))
    assert _data_bytes_under(str(tmp_path / "clone")) == 0
    assert _rows(clone, spark) == _rows(src, spark)

    # a clone merge writes CLONE-LOCAL deltas; untouched buckets are
    # still served from the source in place
    clone(_ch(spark, [(9, "c", 90, 2, "insert")]), 0)
    assert (9, "c", 90) in _rows(clone, spark)
    assert (9, "c", 90) not in _rows(src, spark)
    man = clone._latest_manifest(spark)
    assert set(man["dir_bases"].values()) == {src.path}

    # compaction folds pending into clone-local buckets; buckets no
    # pending delta touched legitimately KEEP their source reference
    # (only dirty buckets rewrite — the MOR contract)
    clone.compact_deltas(spark)
    man = clone._latest_manifest(spark)
    assert man["pending"] == []
    assert set(man.get("dir_bases", {})) <= set(man["dirs"].values())
    assert (9, "c", 90) in _rows(clone, spark)
    assert _data_bytes_under(str(tmp_path / "clone")) > 0

    # a FULL rewrite (rebucket) makes the clone self-contained: every
    # external base drops out of the manifest
    clone.rebucket(spark, 8)
    assert "dir_bases" not in clone._latest_manifest(spark)
    assert (9, "c", 90) in _rows(clone, spark)


def test_clone_carries_constraints_and_fence(spark, tmp_path):
    src = CdcTable(str(tmp_path / "src"), "k", app_id="w")
    src.initialize(_seed(spark))
    src.add_constraint(spark, "v_small", "v < 1000")
    src.compact(spark, fence_seq=5)
    clone = src.clone_to(spark, str(tmp_path / "clone"))
    with pytest.raises(ValueError, match="v_small"):
        clone(_ch(spark, [(9, "c", 5000, 9, "insert")]), 0)
    # the fence carried: a stale (≤5) change is dropped at entry
    clone(_ch(spark, [(9, "c", 90, 3, "insert")]), 0)
    assert (9, "c", 90) not in _rows(clone, spark)


def test_clone_of_clone_carries_original_base(spark, tmp_path):
    src = CdcTable(str(tmp_path / "src"), "k", app_id="w")
    src.initialize(_seed(spark))
    c1 = src.clone_to(spark, str(tmp_path / "c1"))
    c2 = c1.clone_to(spark, str(tmp_path / "c2"))
    assert _data_bytes_under(str(tmp_path / "c2")) == 0
    assert _rows(c2, spark) == _rows(src, spark)
    assert c2._latest_manifest(spark)["data_base"] == src.path


def test_clone_to_initialized_destination_raises(spark, tmp_path):
    src = CdcTable(str(tmp_path / "src"), "k", app_id="w")
    src.initialize(_seed(spark))
    other = CdcTable(str(tmp_path / "other"), "k", app_id="o")
    other.initialize(_seed(spark))
    with pytest.raises(ValueError, match="already an initialized"):
        src.clone_to(spark, str(tmp_path / "other"))


def test_partitioned_lookup_reads_only_key_buckets(spark, tmp_path,
                                                   monkeypatch):
    """lookup(): the serving read asks _read_buckets for ONLY the
    probed keys' buckets, folds their pending deltas, and hides
    tombstones — absent and deleted keys come back as absent rows."""
    t = PartitionedCdcTable(str(tmp_path / "t"), "k", app_id="w",
                            num_buckets=8, write_mode="merge_on_read")
    t.initialize(_seed(spark))
    t(_ch(spark, [(1, "x", 11, 1, "update"),
                  (2, "y", 20, 1, "delete")]), 0)

    asked = []
    real = PartitionedCdcTable._read_buckets

    def record(self, spark_, man, buckets):
        asked.append(sorted(buckets))
        return real(self, spark_, man, buckets)

    monkeypatch.setattr(PartitionedCdcTable, "_read_buckets", record)
    got = {(r.k, r.s, r.v) for r in
           t.lookup(spark, [1, 2, 99]).collect()}
    monkeypatch.undo()
    assert got == {(1, "x", 11)}            # updated; deleted+absent gone
    want_buckets = {r[0] for r in spark.createDataFrame(
        [(1,), (2,), (99,)], "k long")
        .select(t._bucket_expr()).distinct().collect()}
    assert asked and all(set(b) <= want_buckets for b in asked)
    assert all(len(b) < 8 for b in asked)   # strictly pruned


def test_flat_lookup_parity(spark, tmp_path):
    t = CdcTable(str(tmp_path / "t"), "k", app_id="w")
    t.initialize(_seed(spark))
    t(_ch(spark, [(2, "y", 20, 1, "delete")]), 0)
    got = {r.k for r in t.lookup(spark, [1, 2, 99]).collect()}
    assert got == {1}
    import pytest as _pt
    with _pt.raises(ValueError, match="at least one key"):
        t.lookup(spark, [])


# -- r12 (VERDICT r11 item 8): clone vs source DDL isolation -----------------

def _mk(spark, tmp_path, layout, name="src"):
    if layout == "flat":
        t = CdcTable(str(tmp_path / name), "k", app_id="w")
    else:
        t = PartitionedCdcTable(str(tmp_path / name), "k", app_id="w",
                                num_buckets=4,
                                write_mode="merge_on_read")
    t.initialize(_seed(spark))
    return t


@pytest.mark.parametrize("layout", ["flat", "partitioned"])
def test_source_ddl_after_clone_does_not_leak(spark, tmp_path, layout):
    """Column maps are manifest-owned and per-table: a post-clone
    RENAME/DROP on the SOURCE must not change the clone's logical
    schema — and vice versa — even though both read the same shared
    data files (physical names never move)."""
    src = _mk(spark, tmp_path, layout)
    clone = src.clone_to(spark, str(tmp_path / "c"))
    assert set(clone.current(spark).columns) == {"k", "s", "v"}

    src.rename_column(spark, "v", "v_src")
    src.drop_column(spark, "s")
    assert set(src.current(spark).columns) == {"k", "v_src"}
    # the clone still serves BOTH columns under the original names,
    # from the very files the source's manifest-only DDL left in place
    assert set(clone.current(spark).columns) == {"k", "s", "v"}
    assert _rows(clone, spark) == sorted(
        (k, f"s{k}", k * 10) for k in range(1, 9))

    clone.rename_column(spark, "v", "v_clone")
    assert set(clone.current(spark).columns) == {"k", "s", "v_clone"}
    assert set(src.current(spark).columns) == {"k", "v_src"}

    # each side writes under its OWN logical names
    src(spark.createDataFrame([(1, 111, 1, "update")],
                              "k long, v_src long, seq long, op string"),
        10)
    clone(spark.createDataFrame(
        [(1, "x1", 222, 1, "update")],
        "k long, s string, v_clone long, seq long, op string"), 10)
    assert {(r.k, r.v_src) for r in
            src.current(spark).where("k = 1").collect()} == {(1, 111)}
    assert {(r.k, r.s, r.v_clone) for r in
            clone.current(spark).where("k = 1").collect()} \
        == {(1, "x1", 222)}


@pytest.mark.parametrize("layout", ["flat", "partitioned"])
def test_clone_of_renamed_table_time_travels(spark, tmp_path, layout):
    """A clone taken AFTER a source rename carries the map at clone
    time: its seed version reads the shared (old physical-name) files
    under the renamed logical names, and each version of the clone's
    own history shows its own names."""
    src = _mk(spark, tmp_path, layout)
    src.rename_column(spark, "v", "val")
    clone = src.clone_to(spark, str(tmp_path / "c"))
    seed_v = clone._latest_version(spark)
    assert set(clone.current(spark).columns) == {"k", "s", "val"}

    clone.rename_column(spark, "val", "val2")
    assert set(clone.current(spark).columns) == {"k", "s", "val2"}
    # time travel to the seed shows the AT-CLONE names
    at_seed = clone.at_version(spark, seed_v)
    assert "val" in at_seed.columns and "val2" not in at_seed.columns
    # and the source never saw the clone's rename
    assert set(src.current(spark).columns) == {"k", "s", "val"}


@pytest.mark.parametrize("layout", ["flat", "partitioned"])
def test_clone_of_clone_ddl_isolation(spark, tmp_path, layout):
    """Clone-of-clone: the grandchild carries the ORIGINAL data base
    through and its own copy of the map; DDL on any of the three
    tables stays local to it."""
    src = _mk(spark, tmp_path, layout)
    c1 = src.clone_to(spark, str(tmp_path / "c1"))
    c1.rename_column(spark, "v", "v1")
    c2 = c1.clone_to(spark, str(tmp_path / "c2"))
    assert set(c2.current(spark).columns) == {"k", "s", "v1"}

    c2.rename_column(spark, "v1", "v2")
    c2.drop_column(spark, "s")
    src.rename_column(spark, "v", "v0")
    assert set(src.current(spark).columns) == {"k", "s", "v0"}
    assert set(c1.current(spark).columns) == {"k", "s", "v1"}
    assert set(c2.current(spark).columns) == {"k", "v2"}
    assert sorted((r.k, r.v2) for r in c2.current(spark).collect()) \
        == sorted((k, k * 10) for k in range(1, 9))
