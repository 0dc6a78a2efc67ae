"""2-D Pareto skyline (operators/skyline.py)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from systems_spark.operators.skyline import skyline2d, skyline2d_sql


def _python_skyline(rows, x_min=True, y_max=True):
    """Independent reference: O(n^2) strict-dominance scan."""
    def better_x(a, b):
        return a < b if x_min else a > b

    def better_y(a, b):
        return a > b if y_max else a < b

    out = []
    for i, (xi, yi) in enumerate(rows):
        dominated = False
        for j, (xj, yj) in enumerate(rows):
            if i == j:
                continue
            if ((better_x(xj, xi) or xj == xi)
                    and (better_y(yj, yi) or yj == yi)
                    and (better_x(xj, xi) or better_y(yj, yi))):
                dominated = True
                break
        if not dominated:
            out.append((xi, yi))
    return sorted(out)


def _df(spark, rows):
    return spark.createDataFrame(rows, "x long, y long")


def test_small_staircase(spark):
    rows = [(1, 5), (2, 9), (2, 3), (3, 9), (4, 1), (0, 0)]
    got = sorted((r.x, r.y) for r in skyline2d(
        _df(spark, rows), "x", "y").collect())
    # (0,0) cheapest; (1,5); (2,9) best y at x=2; (3,9) dominated by (2,9)
    assert got == [(0, 0), (1, 5), (2, 9)]
    assert got == _python_skyline(rows)


def test_duplicate_frontier_points_all_survive(spark):
    rows = [(1, 5), (1, 5), (2, 2)]
    got = sorted((r.x, r.y) for r in skyline2d(
        _df(spark, rows), "x", "y").collect())
    assert got == [(1, 5), (1, 5)]


def test_orientation_flags(spark):
    rows = [(1, 5), (2, 9), (4, 1), (3, 2)]
    got = sorted((r.x, r.y) for r in skyline2d(
        _df(spark, rows), "x", "y", x_min=False, y_max=False).collect())
    assert got == _python_skyline(rows, x_min=False, y_max=False)


def test_nulls_dropped(spark):
    df = spark.createDataFrame([(1, 5), (None, 99), (2, None), (3, 6)],
                               "x long, y long")
    got = sorted((r.x, r.y) for r in skyline2d(df, "x", "y").collect())
    assert got == [(1, 5), (3, 6)]


def test_matches_python_reference_across_buckets(spark):
    import random

    random.seed(37)
    rows = [(random.randint(0, 200), random.randint(0, 200))
            for _ in range(300)]
    got = sorted((r.x, r.y) for r in skyline2d(
        _df(spark, rows), "x", "y", n_buckets=3).collect())
    assert got == _python_skyline(rows)
    # same answer regardless of bucket count
    got64 = sorted((r.x, r.y) for r in skyline2d(
        _df(spark, rows), "x", "y", n_buckets=64).collect())
    assert got64 == got


def test_matches_duckdb_twin(spark):
    import duckdb
    import random

    random.seed(41)
    rows = [(random.randint(0, 50), random.randint(0, 50))
            for _ in range(120)]
    got = sorted((r.x, r.y) for r in skyline2d(
        _df(spark, rows), "x", "y", n_buckets=4).collect())
    vals = ",".join(f"({a},{b})" for a, b in rows)
    want = sorted(map(tuple, duckdb.connect().execute(skyline2d_sql(
        f"SELECT * FROM (VALUES {vals}) t(x, y)", "x", "y")).fetchall()))
    assert got == want


def test_validation(spark):
    with pytest.raises(ValueError):
        skyline2d(_df(spark, [(1, 2)]), "x", "y", n_buckets=0)
