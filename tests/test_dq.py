"""Declarative data-quality constraint report (functions/dq.py)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from systems_spark.functions import dq


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "id long, status string, amount long, clerk string")


ROWS = [
    (1, "O", 10, "Clerk#1"),
    (2, "F", -5, "Clerk#2"),        # amount range violation
    (2, "X", 20, "Clerk#3"),        # duplicate id + bad status
    (None, "O", 30, "intern"),      # null id + bad clerk prefix
    (4, None, None, "Clerk#4"),     # NULLs: not in_set/range violations
]


def _report(spark, checks, rows=ROWS):
    got = dq.check_report(_df(spark, rows), checks).collect()
    return {r.check_name: (r.total, r.violations, r.pass_rate_micros,
                           r.passed) for r in got}


def test_row_level_checks(spark):
    rep = _report(spark, [
        dq.not_null("id"),
        dq.in_set("status", ["O", "F", "P"]),
        dq.value_range("amount", lo=0),
        dq.prefix("clerk", "Clerk#"),
    ])
    assert rep["not_null(id)"] == (5, 1, 800000, 0)
    # NULL status is NOT an in_set violation (declare not_null for that)
    assert rep["in_set(status)"] == (5, 1, 800000, 0)
    assert rep["value_range(amount)"] == (5, 1, 800000, 0)
    assert rep["prefix(clerk)"] == (5, 1, 800000, 0)


def test_unique_counts_null_as_key(spark):
    rows = ROWS + [(None, "O", 1, "Clerk#9")]  # second NULL id
    rep = _report(spark, [dq.unique("id")], rows)
    # keys {1, 2, 4, NULL}: 6 rows - 4 distinct = 2 beyond-first rows
    assert rep["unique(id)"] == (6, 2, 666666, 0)


def test_unique_multi_column(spark):
    rep = _report(spark, [dq.unique(["id", "status"])])
    # (2,'F') and (2,'X') differ -> 5 distinct pairs, 0 violations
    assert rep["unique(id,status)"] == (5, 0, 1000000, 1)


def test_ref_integrity(spark):
    ref = spark.createDataFrame([(1,), (2,)], "k long")
    rep = _report(spark, [dq.ref_integrity("id", "k", ref_df=ref)])
    # id=4 is the orphan; NULL id is not counted (declare not_null)
    assert rep["ref_integrity(id)"] == (5, 1, 800000, 0)


def test_matches_duckdb_twin(spark):
    import duckdb

    checks = [
        dq.not_null("id"),
        dq.unique("id"),
        dq.in_set("status", ["O", "F", "P"]),
        dq.value_range("amount", lo=0, hi=25),
        dq.prefix("clerk", "Clerk#"),
        dq.ref_integrity("id", "k", ref_sql="SELECT 1 AS k UNION ALL "
                                            "SELECT 2 AS k"),
    ]
    ref = spark.createDataFrame([(1,), (2,)], "k long")
    checks_py = [dict(c) for c in checks]
    for c in checks_py:
        if c["kind"] == "ref_integrity":
            c["ref_df"] = ref
    got = sorted(map(tuple, dq.check_report(
        _df(spark, ROWS), checks_py).collect()))
    vals = ",".join(
        "({}, {}, {}, {})".format(
            "NULL" if i is None else i,
            "NULL" if s is None else f"'{s}'",
            "NULL" if a is None else a,
            "NULL" if c is None else f"'{c}'")
        for i, s, a, c in ROWS)
    src = f"SELECT * FROM (VALUES {vals}) t(id, status, amount, clerk)"
    want = sorted(map(tuple, duckdb.connect().execute(
        dq.check_report_sql(src, checks)).fetchall()))
    assert got == want


def test_all_green_report(spark):
    rows = [(1, "O", 5, "Clerk#1"), (2, "F", 6, "Clerk#2")]
    rep = _report(spark, [dq.not_null("id"), dq.unique("id")], rows)
    assert all(v == (2, 0, 1000000, 1) for v in rep.values())


def test_validation(spark):
    with pytest.raises(ValueError):
        dq.check_report(_df(spark, ROWS), [])
    with pytest.raises(ValueError):
        dq.in_set("c", [])
    with pytest.raises(ValueError):
        dq.in_set("c", ["a", None])
    with pytest.raises(ValueError):
        dq.value_range("c")
    with pytest.raises(ValueError):
        dq.unique([])
    with pytest.raises(ValueError):
        dq.prefix("c", "")
    with pytest.raises(ValueError):
        dq.check_report(_df(spark, ROWS),
                        [dq.not_null("id"), dq.not_null("id")])
    with pytest.raises(ValueError):
        dq.check_report(_df(spark, ROWS),
                        [dq.ref_integrity("id", "k")])
    with pytest.raises(ValueError):
        dq.check_report_sql("SELECT 1",
                            [dq.ref_integrity("id", "k")])
