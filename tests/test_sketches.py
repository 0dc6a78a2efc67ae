"""Portable HyperLogLog (functions/sketches.py)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from systems_spark.functions.sketches import (
    hll_distinct,
    hll_distinct_sql,
    hll_estimate,
    hll_merge,
    hll_registers,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "grp string, key long")


def test_estimate_accuracy_and_exactness_of_integers(spark):
    """p=8 → ~6.5% std error; 1000 distinct keys must estimate within
    20%, and n_buckets_used/s_int are exact integers."""
    rows = [("a", k) for k in range(1000) for _ in range(2)]  # dups ignored
    got = hll_distinct(_df(spark, rows), "key", ["grp"], p=8).collect()
    assert len(got) == 1
    r = got[0]
    assert abs(r.approx_distinct - 1000) / 1000 < 0.20
    assert 0 < r.n_buckets_used <= 256
    assert isinstance(r.s_int, int)


def test_small_range_linear_counting(spark):
    """A handful of keys lands in the linear-counting branch and is
    nearly exact."""
    rows = [("a", k) for k in range(10)]
    r = hll_distinct(_df(spark, rows), "key", ["grp"], p=8).collect()[0]
    assert abs(r.approx_distinct - 10) < 2


def test_merge_equals_whole(spark):
    """THE sketch property: registers built on two disjoint halves and
    merged give bit-identical estimates to registers built on the
    union."""
    rows = [("a", k) for k in range(500)] + [("b", k) for k in range(50)]
    half1 = [r for r in rows if r[1] % 2 == 0]
    half2 = [r for r in rows if r[1] % 2 == 1]
    whole = hll_registers(_df(spark, rows), "key", ["grp"], p=8)
    merged = hll_merge(
        hll_registers(_df(spark, half1), "key", ["grp"], p=8),
        hll_registers(_df(spark, half2), "key", ["grp"], p=8))
    est_w = {r.grp: (r.n_buckets_used, r.s_int, r.approx_distinct)
             for r in hll_estimate(whole, ["grp"], p=8).collect()}
    est_m = {r.grp: (r.n_buckets_used, r.s_int, r.approx_distinct)
             for r in hll_estimate(merged, ["grp"], p=8).collect()}
    assert est_w == est_m and set(est_w) == {"a", "b"}


def test_overlapping_merge_is_idempotent(spark):
    """Merging a sketch with itself changes nothing (max is idempotent) —
    re-ingesting a day's data cannot inflate the estimate."""
    regs = hll_registers(
        _df(spark, [("a", k) for k in range(200)]), "key", ["grp"], p=8)
    merged = hll_merge(regs, regs)
    a = hll_estimate(regs, ["grp"], p=8).collect()[0]
    b = hll_estimate(merged, ["grp"], p=8).collect()[0]
    assert (a.s_int, a.approx_distinct) == (b.s_int, b.approx_distinct)


def test_matches_duckdb_bit_for_bit(spark):
    import duckdb

    rows = ([("a", k) for k in range(300)]
            + [("b", k) for k in range(7)]
            + [("a", k) for k in range(100)])  # dups
    got = sorted(map(tuple, hll_distinct(
        _df(spark, rows), "key", ["grp"], p=8).collect()))
    vals = ",".join(f"('{g}', {k})" for g, k in rows)
    want = sorted(map(tuple, duckdb.connect().execute(hll_distinct_sql(
        f"SELECT * FROM (VALUES {vals}) t(grp, key)",
        "key", ["grp"], p=8)).fetchall()))
    assert got == want


def test_p_validation(spark):
    with pytest.raises(ValueError):
        hll_registers(_df(spark, [("a", 1)]), "key", ["grp"], p=3)
    with pytest.raises(ValueError):
        hll_distinct_sql("SELECT 1", "key", ["grp"], p=15)
