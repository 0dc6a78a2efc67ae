"""MERGE INTO (streaming/sinks.py CdcTable.merge_into): Delta's
conditional-clause upsert compiled to one change batch through the
standard fenced merge — delete clause first, update on the remainder
(optionally gated), insert for unmatched source keys; every table
guarantee (tombstones, OCC, constraints, touched-bucket pruning,
O(batch) MOR commits, #dml idempotence) applies unchanged.
"""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from systems_spark.streaming import CdcTable, PartitionedCdcTable

PAY = "k long, s string, v long"


def _seed(spark):
    return spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30), (4, "d", 40)], PAY)


def _src(spark, rows):
    return spark.createDataFrame(rows, "k long, sv long")


def _rows(t, spark):
    return {r.k: (r.s, r.v) for r in t.current(spark).collect()}


@pytest.mark.parametrize("make", [
    lambda p: CdcTable(p, "k", app_id="w"),
    lambda p: PartitionedCdcTable(p, "k", app_id="w", num_buckets=4,
                                  write_mode="merge_on_read"),
])
def test_three_clause_merge(spark, tmp_path, make):
    t = make(str(tmp_path / "t"))
    t.initialize(_seed(spark))
    # source: k=1 (update), k=2 (delete: sv<0), k=9 (insert)
    src = _src(spark, [(1, 100), (2, -1), (9, 900)])
    v = t.merge_into(
        spark, src,
        when_matched_delete="s.sv < 0",
        when_matched_update={"v": "t.v + s.sv"},
        when_not_matched_insert={"v": "s.sv", "s": "'new'"})
    assert v is not None
    assert _rows(t, spark) == {1: ("a", 110), 3: ("c", 30),
                               4: ("d", 40), 9: ("new", 900)}


def test_delete_clause_wins_over_update(spark, tmp_path):
    t = CdcTable(str(tmp_path / "t"), "k", app_id="w")
    t.initialize(_seed(spark))
    # both clauses match k=1; delete is evaluated first
    t.merge_into(spark, _src(spark, [(1, 5)]),
                 when_matched_delete=True,
                 when_matched_update={"v": "999"})
    assert 1 not in _rows(t, spark)


def test_matched_condition_gates_update(spark, tmp_path):
    t = CdcTable(str(tmp_path / "t"), "k", app_id="w")
    t.initialize(_seed(spark))
    t.merge_into(spark, _src(spark, [(1, 5), (2, 5)]),
                 when_matched_update={"v": "t.v * 10"},
                 matched_condition="t.v >= 20")
    got = _rows(t, spark)
    assert got[1] == ("a", 10)       # gated out: unchanged
    assert got[2] == ("b", 200)


def test_unassigned_columns_keep_or_null(spark, tmp_path):
    t = CdcTable(str(tmp_path / "t"), "k", app_id="w")
    t.initialize(_seed(spark))
    t.merge_into(spark, _src(spark, [(1, 7), (9, 9)]),
                 when_matched_update={"v": "s.sv"},
                 when_not_matched_insert={"v": "s.sv"})
    got = _rows(t, spark)
    assert got[1] == ("a", 7)        # s kept from the target
    assert got[9] == (None, 9)       # s NULL-filled on insert


def test_guards_raise(spark, tmp_path):
    t = CdcTable(str(tmp_path / "t"), "k", app_id="w")
    t.initialize(_seed(spark))
    src = _src(spark, [(1, 5)])
    with pytest.raises(ValueError, match="at least one WHEN"):
        t.merge_into(spark, src)
    with pytest.raises(ValueError, match="merge key"):
        t.merge_into(spark, src, when_matched_update={"k": "1"})
    with pytest.raises(ValueError, match="no such target"):
        t.merge_into(spark, src, when_matched_update={"nope": "1"})
    t.add_generated_column(spark, "v2", "v * 2")
    with pytest.raises(ValueError, match="GENERATED"):
        t.merge_into(spark, src, when_matched_update={"v2": "1"})


def test_ambiguous_source_rejected(spark, tmp_path):
    """Two source rows matching one target key: every produced change
    shares the merge's seq, so the (key, seq) uniqueness check rejects
    the batch before anything stages — Delta raises here too."""
    t = CdcTable(str(tmp_path / "t"), "k", app_id="w")
    t.initialize(_seed(spark))
    dup = _src(spark, [(1, 5), (1, 6)])
    with pytest.raises(Exception, match="unique"):
        t.merge_into(spark, dup, when_matched_update={"v": "s.sv"})
    assert _rows(t, spark)[1] == ("a", 10)   # nothing committed


def test_noop_merge_commits_nothing(spark, tmp_path):
    t = CdcTable(str(tmp_path / "t"), "k", app_id="w")
    t.initialize(_seed(spark))
    n = len(t.versions(spark))
    assert t.merge_into(spark, _src(spark, [(99, 1)]),
                        when_matched_update={"v": "s.sv"}) is None
    assert len(t.versions(spark)) == n


def test_merge_into_respects_constraints_and_dml_txn_key(spark,
                                                         tmp_path):
    t = CdcTable(str(tmp_path / "t"), "k", app_id="w")
    t.initialize(_seed(spark))
    t.add_constraint(spark, "v_small", "v < 1000")
    with pytest.raises(ValueError, match="v_small"):
        t.merge_into(spark, _src(spark, [(9, 5000)]),
                     when_not_matched_insert={"v": "s.sv"})
    # idempotence under the #dml key — the stream's slot is untouched
    t.merge_into(spark, _src(spark, [(9, 90)]),
                 when_not_matched_insert={"v": "s.sv"})
    man = t._latest_manifest(spark)
    assert man["txn"]["w#dml"] == 0 and "w" not in man["txn"]


@pytest.mark.parametrize("make", [
    lambda p: CdcTable(p, "k", app_id="w"),
    lambda p: PartitionedCdcTable(p, "k", app_id="w", num_buckets=4,
                                  write_mode="merge_on_read"),
])
def test_not_matched_by_source_clauses(spark, tmp_path, make):
    """Delta 2.3's third clause family: LIVE target rows the source
    does NOT name — delete evaluates before update, expressions over
    t.* only."""
    t = make(str(tmp_path / "t"))
    t.initialize(_seed(spark))
    # source names k=1 only; by-source clauses govern k=2,3,4
    src = _src(spark, [(1, 100)])
    t.merge_into(
        spark, src,
        when_matched_update={"v": "s.sv"},
        when_not_matched_by_source_delete="t.v >= 40",
        when_not_matched_by_source_update={"s": "concat(t.s, '!')"})
    assert _rows(t, spark) == {1: ("a", 100), 2: ("b!", 20),
                               3: ("c!", 30)}   # k=4 deleted


def test_by_source_guards_and_full_sync(spark, tmp_path):
    t = CdcTable(str(tmp_path / "t"), "k", app_id="w")
    t.initialize(_seed(spark))
    with pytest.raises(ValueError, match="merge key"):
        t.merge_into(spark, _src(spark, [(1, 1)]),
                     when_not_matched_by_source_update={"k": "1"})
    # the classic FULL SYNC: upsert everything in the source, delete
    # everything it does not name — target becomes exactly the source
    src = spark.createDataFrame(
        [(2, "B", 200), (9, "I", 900)], PAY)
    t.merge_into(
        spark, src.alias("src_payload"),
        when_matched_update={"s": "s.s", "v": "s.v"},
        when_not_matched_insert={"s": "s.s", "v": "s.v"},
        when_not_matched_by_source_delete=True)
    assert _rows(t, spark) == {2: ("B", 200), 9: ("I", 900)}


def test_register_views_sql_surface(spark, tmp_path):
    t = CdcTable(str(tmp_path / "t"), "k", app_id="w")
    t.initialize(_seed(spark))
    t(spark.createDataFrame([(1, "x", 11, 1, "update")],
                            PAY + ", seq long, op string"), 0)
    t.register_views(spark, "mi_orders")
    got = {r.k: r.v for r in
           spark.sql("SELECT k, v FROM mi_orders").collect()}
    assert got == {1: 11, 2: 20, 3: 30, 4: 40}
    hist = spark.sql(
        "SELECT version, batch_id FROM mi_orders_history "
        "ORDER BY version").collect()
    assert [(r.version, r.batch_id) for r in hist] == [(-1, None),
                                                       (0, 0)]
    # SQL time travel: a view pinned at the seed version
    t.register_views(spark, "mi_orders_v0", version=-1)
    assert spark.sql("SELECT v FROM mi_orders_v0 WHERE k = 1"
                     ).collect()[0].v == 10
