"""Log-owned GENERATED COLUMNS (Delta's GENERATED ALWAYS AS): the
expression is backfilled for existing rows in one rewrite commit,
recorded in every manifest, and computed at EVERY later write on both
layouts and write modes — overwriting anything a writer supplied, so
the column can never drift from its definition.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from systems_spark.streaming import CdcTable, PartitionedCdcTable

PAY = "k long, s string, v long"
CH_SCHEMA = PAY + ", seq long, op string"
CH_GEN = PAY + ", band string, seq long, op string"


def _ch(spark, rows, schema=CH_SCHEMA):
    return spark.createDataFrame(rows, schema)


def _seed(spark):
    return spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], PAY)


BAND = "CASE WHEN v >= 20 THEN 'high' ELSE 'low' END"


def test_backfill_and_computed_at_write_flat(spark, tmp_path):
    t = CdcTable(str(tmp_path / "t"), "k", app_id="w")
    t.initialize(_seed(spark))
    v = t.add_generated_column(spark, "band", BAND)
    assert v == 0 and t.generated_columns(spark) == {"band": BAND}
    live = {r.k: r.band for r in t.current(spark).collect()}
    assert live == {1: "low", 2: "high", 3: "high"}  # backfilled

    # a writer SUPPLIES a wrong value — it must be overwritten
    t(_ch(spark, [(4, "d", 40, "WRONG", 1, "insert"),
                  (1, "a", 25, "WRONG", 1, "update")], CH_GEN), 0)
    live = {r.k: r.band for r in t.current(spark).collect()}
    assert live == {1: "high", 2: "high", 3: "high", 4: "high"}

    # a writer OMITS the column entirely — computed transparently
    t(_ch(spark, [(5, "e", 5, 2, "insert")]), 1)
    assert {r.k: r.band for r in t.current(spark).collect()}[5] == "low"

    # DML postimages recompute it too
    t.update_where(spark, "k = 5", {"v": "v + 100"})
    assert {r.k: r.band for r in t.current(spark).collect()}[5] == "high"

    # and a CHECK constraint may reference it
    t.add_constraint(spark, "band_known", "band IN ('low','high')")

    # idempotent re-add; redefinition and collisions raise
    assert t.add_generated_column(spark, "band", BAND) \
        == t._latest_version(spark)
    with pytest.raises(ValueError, match="already defined"):
        t.add_generated_column(spark, "band", "'x'")
    with pytest.raises(ValueError, match="not generated"):
        t.add_generated_column(spark, "s", "'x'")


def test_partitioned_mor_backfill_folds_pending_first(spark, tmp_path):
    t = PartitionedCdcTable(str(tmp_path / "t"), "k", app_id="w",
                            num_buckets=4, write_mode="merge_on_read")
    t.initialize(_seed(spark))
    t(_ch(spark, [(4, "d", 40, 1, "insert")]), 0)  # pending delta
    assert t._latest_manifest(spark)["pending"]
    t.add_generated_column(spark, "band", BAND)
    man = t._latest_manifest(spark)
    assert man["pending"] == []          # folded before the backfill
    assert "band" in [f["name"] for f in
                      __import__("json").loads(man["schema"])["fields"]]
    live = {r.k: r.band for r in t.current(spark).collect()}
    assert live == {1: "low", 2: "high", 3: "high", 4: "high"}
    # later MOR deltas carry the computed column in their change files
    t(_ch(spark, [(5, "e", 50, 2, "insert")]), 1)
    assert {r.k: r.band for r in t.current(spark).collect()}[5] == "high"


def test_generated_change_breaks_occ_fast_path(spark, tmp_path):
    t = PartitionedCdcTable(str(tmp_path / "t"), "k", app_id="w",
                            num_buckets=4)
    t.initialize(_seed(spark))
    base_man = t._latest_manifest(spark)
    t.add_generated_column(spark, "band", BAND)
    new_man = t._latest_manifest(spark)
    assert t._fast_compatible(new_man, base_man, []) is False
