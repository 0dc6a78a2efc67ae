"""apply_cdc (operators/cdc.py) — MERGE INTO semantics: last-op-wins,
delete/insert/update over present and absent keys, tie rejection."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from systems_spark.operators import apply_cdc, apply_cdc_sql

SNAP = [(1, "a", 10), (2, "b", 20), (3, "c", 30), (4, "d", 40)]
SCHEMA = "k long, s string, v long"
CH_SCHEMA = "k long, s string, v long, seq long, op string"


def _snap(spark):
    return spark.createDataFrame(SNAP, SCHEMA)


def test_merge_semantics(spark):
    changes = spark.createDataFrame([
        (2, "b2", 21, 1, "update"),    # update present
        (3, "x", 0, 1, "delete"),      # delete present
        (5, "e", 50, 1, "insert"),     # insert absent
        (6, "f", 60, 1, "update"),     # update absent -> upsert
        (7, "g", 70, 1, "delete"),     # delete absent -> no-op
        (1, "a1", 11, 1, "update"),    # seq-1 update...
        (1, "x", 0, 2, "delete"),      # ...overridden by seq-2 delete
        (4, "x", 0, 1, "delete"),      # seq-1 delete...
        (4, "d2", 42, 2, "insert"),    # ...overridden by seq-2 re-insert
    ], CH_SCHEMA)
    got = {tuple(r) for r in apply_cdc(_snap(spark), changes, "k").collect()}
    assert got == {(2, "b2", 21), (4, "d2", 42), (5, "e", 50), (6, "f", 60)}


def test_empty_changes_is_identity_and_columns_stable(spark):
    changes = spark.createDataFrame([], CH_SCHEMA)
    out = apply_cdc(_snap(spark), changes, "k")
    assert out.columns == ["k", "s", "v"]
    assert {tuple(r) for r in out.collect()} == set(SNAP)


def test_seq_tie_rejected_and_optout(spark):
    changes = spark.createDataFrame(
        [(2, "b2", 21, 1, "update"), (2, "b3", 22, 1, "update")], CH_SCHEMA)
    with pytest.raises(ValueError, match="must be unique"):
        apply_cdc(_snap(spark), changes, "k").collect()
    # opt-out runs (nondeterminism accepted by the caller)
    apply_cdc(_snap(spark), changes, "k", check_unique_seq=False).count()


def test_unknown_op_raises_at_execution(spark):
    changes = spark.createDataFrame([(2, "b2", 21, 1, "upsert")], CH_SCHEMA)
    with pytest.raises(Exception, match="unknown op"):
        apply_cdc(_snap(spark), changes, "k").collect()


def test_missing_columns_rejected(spark):
    changes = spark.createDataFrame([(2, "b2", 1, "update")],
                                    "k long, s string, seq long, op string")
    with pytest.raises(ValueError, match="missing columns"):
        apply_cdc(_snap(spark), changes, "k")


def test_sql_twin_matches(spark):
    import duckdb

    changes_rows = [
        (2, "b2", 21, 1, "update"), (3, "x", 0, 1, "delete"),
        (5, "e", 50, 1, "insert"), (1, "a1", 11, 1, "update"),
        (1, "x", 0, 2, "delete"),
    ]
    changes = spark.createDataFrame(changes_rows, CH_SCHEMA)
    got = sorted(tuple(r) for r in
                 apply_cdc(_snap(spark), changes, "k").collect())
    sv = ", ".join(f"({k}, '{s}', {v})" for k, s, v in SNAP)
    cv = ", ".join(f"({k}, '{s}', {v}, {q}, '{o}')"
                   for k, s, v, q, o in changes_rows)
    sql = apply_cdc_sql(
        f"SELECT * FROM (VALUES {sv}) t(k, s, v)",
        f"SELECT * FROM (VALUES {cv}) t(k, s, v, seq, op)",
        "k", ["k", "s", "v"])
    want = sorted(duckdb.sql(sql).fetchall())
    assert got == want


def test_sequential_batches_compose(spark):
    """apply(apply(snap, b1), b2) — the daily-merge chain."""
    b1 = spark.createDataFrame([(5, "e", 50, 1, "insert"),
                                (1, "x", 0, 1, "delete")], CH_SCHEMA)
    b2 = spark.createDataFrame([(5, "e2", 51, 1, "update"),
                                (1, "a9", 19, 1, "insert")], CH_SCHEMA)
    out = apply_cdc(apply_cdc(_snap(spark), b1, "k"), b2, "k")
    got = {tuple(r) for r in out.collect()}
    assert got == {(1, "a9", 19), (2, "b", 20), (3, "c", 30),
                   (4, "d", 40), (5, "e2", 51)}


def test_superseded_unknown_op_still_raises(spark):
    """A garbage op must raise even when a later seq supersedes it."""
    changes = spark.createDataFrame(
        [(2, "bad", 0, 1, "upsert"), (2, "ok", 21, 2, "update")], CH_SCHEMA)
    with pytest.raises(Exception, match="unknown op"):
        apply_cdc(_snap(spark), changes, "k").collect()


def test_fenced_merge_validates_ops_and_columns(spark):
    from systems_spark.operators.cdc import merge_cdc_fenced

    snap = spark.createDataFrame(
        [(1, "a", 10, 0, False)], "k long, s string, v long, seq long, _cdc_deleted boolean")
    with pytest.raises(Exception, match="unknown op"):
        merge_cdc_fenced(
            snap, spark.createDataFrame([(1, "x", 1, 1, "upsert")], CH_SCHEMA),
            "k").collect()
    with pytest.raises(ValueError, match="missing columns"):
        merge_cdc_fenced(
            snap, spark.createDataFrame([(1, 1, "update")],
                                        "k long, seq long, op string"), "k")


def test_null_key_is_a_real_key(spark):
    """A NULL key must upsert/delete its NULL-keyed snapshot row, not
    duplicate it (null-safe touched-key joins — the table_diff
    convention)."""
    snap = spark.createDataFrame([(None, "n", 0), (1, "a", 10)], SCHEMA)
    changes = spark.createDataFrame(
        [(None, "n2", 1, 1, "update")], CH_SCHEMA)
    got = {tuple(r) for r in apply_cdc(snap, changes, "k").collect()}
    assert got == {(None, "n2", 1), (1, "a", 10)}
    # delete of the NULL key removes it
    dels = spark.createDataFrame([(None, "x", 0, 1, "delete")], CH_SCHEMA)
    got = {tuple(r) for r in apply_cdc(snap, dels, "k").collect()}
    assert got == {(1, "a", 10)}


def test_null_key_sql_twin_matches(spark):
    import duckdb

    snap_rows = [(None, "n", 0), (1, "a", 10)]
    ch_rows = [(None, "n2", 1, 1, "update"), (1, "x", 0, 1, "delete")]
    spark_got = {tuple(r) for r in apply_cdc(
        spark.createDataFrame(snap_rows, SCHEMA),
        spark.createDataFrame(ch_rows, CH_SCHEMA), "k").collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE snap_t (k BIGINT, s VARCHAR, v BIGINT)")
    con.executemany("INSERT INTO snap_t VALUES (?, ?, ?)", snap_rows)
    con.execute("CREATE TABLE chg_t (k BIGINT, s VARCHAR, v BIGINT, "
                "seq BIGINT, op VARCHAR)")
    con.executemany("INSERT INTO chg_t VALUES (?, ?, ?, ?, ?)", ch_rows)
    sql = apply_cdc_sql("SELECT * FROM snap_t", "SELECT * FROM chg_t",
                        "k", ["k", "s", "v"])
    duck_got = {tuple(r) for r in con.execute(sql).fetchall()}
    assert spark_got == duck_got


def test_fenced_merge_null_key_and_tie_guard(spark):
    from systems_spark.operators.cdc import merge_cdc_fenced

    snap = spark.createDataFrame(
        [(None, "n", 0, 0, False), (1, "a", 10, 0, False)],
        "k long, s string, v long, seq long, _cdc_deleted boolean")
    ch = spark.createDataFrame([(None, "n2", 1, 1, "update")], CH_SCHEMA)
    got = {tuple(r) for r in
           merge_cdc_fenced(snap, ch, "k").collect()}
    assert got == {(None, "n2", 1, 1, False), (1, "a", 10, 0, False)}
    # (key, seq) tie rejected by default, opt-out runs
    ties = spark.createDataFrame(
        [(1, "x", 1, 5, "update"), (1, "y", 2, 5, "update")], CH_SCHEMA)
    with pytest.raises(ValueError, match="must be unique"):
        merge_cdc_fenced(snap, ties, "k").collect()
    merge_cdc_fenced(snap, ties, "k", check_unique_seq=False).count()


def test_fenced_merge_min_seq_floor(spark):
    """Changes at or below the global fence are dropped at entry — the
    compaction contract: a compacted-away tombstone's key cannot be
    resurrected by a late pre-fence replay."""
    from systems_spark.operators.cdc import merge_cdc_fenced

    snap = spark.createDataFrame(
        [(1, "a", 10, 4, False)],
        "k long, s string, v long, seq long, _cdc_deleted boolean")
    ch = spark.createDataFrame(
        [(2, "late", 0, 3, "insert"),   # <= fence: dropped
         (3, "new", 30, 6, "insert")], CH_SCHEMA)
    got = {tuple(r) for r in
           merge_cdc_fenced(snap, ch, "k", min_seq=3).collect()}
    assert got == {(1, "a", 10, 4, False), (3, "new", 30, 6, False)}
