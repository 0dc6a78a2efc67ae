"""Log-owned CHECK / NOT NULL constraints on the CDC tables (Delta's
``ALTER TABLE ADD CONSTRAINT`` semantics): the constraint lives in the
transaction log (carried by every manifest, so it survives vacuum),
existing rows are validated once at add time, and every later merge
validates its change batch — on both layouts and both write modes —
rejecting the whole batch BEFORE anything commits. Deletes and
tombstones are exempt (a constraint governs rows that will live).
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


def test_flat_check_constraint_rejects_batch_before_commit(spark,
                                                           tmp_path):
    t = CdcTable(str(tmp_path / "t"), "k", app_id="w")
    t.initialize(_seed(spark))
    v = t.add_constraint(spark, "v_nonneg", "v >= 0")
    assert t.constraints(spark) == {"v_nonneg": "v >= 0"}
    n = len(t.versions(spark))

    with pytest.raises(ValueError, match="v_nonneg"):
        t(_ch(spark, [(4, "d", -5, 1, "insert"),
                      (5, "e", 50, 2, "insert")]), 0)
    # the WHOLE batch was rejected before any commit
    assert len(t.versions(spark)) == n
    assert {r.k for r in t.current(spark).collect()} == {1, 2, 3}

    t(_ch(spark, [(5, "e", 50, 2, "insert")]), 1)
    assert {r.k for r in t.current(spark).collect()} == {1, 2, 3, 5}
    assert v == 0  # constraint committed as its own version


def test_not_null_and_delete_exemption(spark, tmp_path):
    t = CdcTable(str(tmp_path / "t"), "k", app_id="w")
    t.initialize(_seed(spark))
    t.add_not_null(spark, "s")

    with pytest.raises(ValueError, match="s_not_null"):
        t(_ch(spark, [(4, None, 40, 1, "insert")]), 0)
    # a delete carrying NULL payload must pass: deletes are exempt
    t(_ch(spark, [(2, None, None, 2, "delete")]), 1)
    assert {r.k for r in t.current(spark).collect()} == {1, 3}


def test_add_constraint_validates_existing_rows(spark, tmp_path):
    t = CdcTable(str(tmp_path / "t"), "k", app_id="w")
    t.initialize(_seed(spark))
    with pytest.raises(ValueError, match="existing"):
        t.add_constraint(spark, "v_small", "v < 25")  # k=3 has v=30
    assert t.constraints(spark) == {}
    # tombstoned rows don't count as existing
    t(_ch(spark, [(3, "c", 30, 1, "delete")]), 0)
    t.add_constraint(spark, "v_small", "v < 25")
    assert t.constraints(spark) == {"v_small": "v < 25"}


def test_constraint_survives_vacuum_and_shared_data_dir(spark,
                                                        tmp_path):
    base = str(tmp_path / "t")
    t = CdcTable(base, "k", app_id="w")
    t.initialize(_seed(spark))
    t(_ch(spark, [(4, "d", 40, 1, "insert")]), 0)
    t.add_constraint(spark, "v_nonneg", "v >= 0")
    # the constraint commit is manifest-only: it SHARES version 0's
    # data dir; vacuum must keep that dir while any kept manifest
    # references it
    man = t._latest_manifest(spark)
    assert man["data_dir"] == "version=0__w"
    t.vacuum(spark, keep_last=1)
    assert os.path.isdir(os.path.join(base, "version=0__w"))
    assert {r.k for r in t.current(spark).collect()} == {1, 2, 3, 4}
    # and the constraint still enforces (carried by every manifest)
    with pytest.raises(ValueError, match="v_nonneg"):
        t(_ch(spark, [(9, "x", -1, 9, "insert")]), 1)
    # drop re-admits
    t.drop_constraint(spark, "v_nonneg")
    t(_ch(spark, [(9, "x", -1, 9, "insert")]), 2)
    assert {r.k: r.v for r in t.current(spark).collect()}[9] == -1


def test_duplicate_and_missing_constraints(spark, tmp_path):
    t = CdcTable(str(tmp_path / "t"), "k", app_id="w")
    t.initialize(_seed(spark))
    v1 = t.add_constraint(spark, "c", "v >= 0")
    assert t.add_constraint(spark, "c", "v >= 0") == v1  # idempotent
    with pytest.raises(ValueError, match="already exists"):
        t.add_constraint(spark, "c", "v >= 1")
    with pytest.raises(KeyError):
        t.drop_constraint(spark, "nope")


def test_restore_cannot_resurrect_violating_rows(spark, tmp_path):
    t = CdcTable(str(tmp_path / "t"), "k", app_id="w")
    t.initialize(_seed(spark))
    t(_ch(spark, [(4, "d", -40, 1, "insert")]), 0)   # v=0 holds v=-40
    t(_ch(spark, [(4, "d", 40, 2, "update")]), 1)    # fixed at v=1
    t.add_constraint(spark, "v_nonneg", "v >= 0")
    with pytest.raises(ValueError, match="restored"):
        t.restore(spark, 0)
    t.restore(spark, 1)  # clean version restores fine
    assert {r.k: r.v for r in t.current(spark).collect()}[4] == 40


def test_partitioned_cow_and_mor_enforce_at_write(spark, tmp_path):
    for mode in ("copy_on_write", "merge_on_read"):
        t = PartitionedCdcTable(str(tmp_path / mode), "k", app_id="w",
                                num_buckets=4, write_mode=mode)
        t.initialize(_seed(spark))
        t.add_constraint(spark, "v_nonneg", "v >= 0")
        n = len(t.versions(spark))
        with pytest.raises(ValueError, match="v_nonneg"):
            t(_ch(spark, [(4, "d", -5, 1, "insert")]), 0)
        assert len(t.versions(spark)) == n  # nothing committed
        # MOR especially: a bad delta must never reach the pending log
        t(_ch(spark, [(4, "d", 5, 1, "insert")]), 1)
        assert {r.k: r.v for r in t.current(spark).collect()} \
            == {1: 10, 2: 20, 3: 30, 4: 5}
        # delete exemption holds on this layout too
        t(_ch(spark, [(1, None, None, 2, "delete")]), 2)
        assert 1 not in {r.k for r in t.current(spark).collect()}


def test_constraint_change_breaks_occ_fast_path_compat(spark, tmp_path):
    """A constraint added in the conflict window must force the full
    rebase (which re-validates) — the staged batch was never checked
    against it."""
    t = PartitionedCdcTable(str(tmp_path / "t"), "k", app_id="w",
                            num_buckets=4)
    t.initialize(_seed(spark))
    base_man = t._latest_manifest(spark)
    t.add_constraint(spark, "v_nonneg", "v >= 0")
    new_man = t._latest_manifest(spark)
    assert t._fast_compatible(base_man, base_man, []) is True
    assert t._fast_compatible(new_man, base_man, []) is False
