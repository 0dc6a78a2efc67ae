"""Per-group OLS trend (operators/trend.py)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from systems_spark.operators.trend import ols_trend, ols_trend_sql


def _df(spark, rows):
    return spark.createDataFrame(rows, "g string, x long, y long")


def test_exact_lines_recovered(spark):
    """Noise-free lines come back EXACTLY (integer millionths):
    y = 3x + 10 and y = -2x + 5 — negative slope exercises the
    truncating-division sign contract."""
    rows = ([("a", x, 3 * x + 10) for x in range(10)]
            + [("b", x, -2 * x + 5) for x in range(8)])
    got = {r.g: (r.slope_micros, r.intercept_micros, r.n_points)
           for r in ols_trend(_df(spark, rows), "x", "y", ["g"]).collect()}
    assert got == {"a": (3_000_000, 10_000_000, 10),
                   "b": (-2_000_000, 5_000_000, 8)}


def test_matches_numpy_polyfit(spark):
    """Noisy data: slope/intercept agree with numpy's least squares to
    within the 1e-6 quantization (an INDEPENDENT fitter, not the twin
    SQL)."""
    import numpy as np

    xs = list(range(40))
    ys = [int(7 * x * 1_000_000 + 123_456_789
              + ((x * 9973) % 1000 - 500) * 1_000) for x in xs]
    rows = [("g", x, y) for x, y in zip(xs, ys)]
    r = ols_trend(_df(spark, rows), "x", "y", ["g"]).collect()[0]
    slope, intercept = np.polyfit(np.array(xs, dtype=float),
                                  np.array(ys, dtype=float), 1)
    assert abs(r.slope_micros / 1e6 - slope) <= abs(slope) * 1e-9 + 1
    assert abs(r.intercept_micros / 1e6 - intercept) \
        <= abs(intercept) * 1e-9 + 1


def test_degenerate_and_null_handling(spark):
    """All-equal x → NULL slope/intercept (den = 0); NULL x or y rows
    are excluded from the sums, not zero-filled."""
    rows = [("c", 4, 7), ("c", 4, 9),
            ("d", 0, 1), ("d", 1, 3), ("d", None, 100), ("d", 2, None)]
    got = {r.g: tuple(r)[1:]
           for r in ols_trend(_df(spark, rows), "x", "y", ["g"]).collect()}
    assert got["c"] == (2, 8, 16, None, None)
    # d: points (0,1),(1,3) -> slope 2, intercept 1; nulls dropped
    assert got["d"] == (2, 1, 4, 2_000_000, 1_000_000)


def test_matches_duckdb_bit_for_bit(spark):
    import duckdb

    rows = [(f"g{i % 3}", (i * 7) % 29, ((i * 13) % 97) - 40)
            for i in range(90)]
    got = sorted(map(tuple, ols_trend(
        _df(spark, rows), "x", "y", ["g"]).collect()))
    vals = ",".join(f"('{g}', {x}, {y})" for g, x, y in rows)
    want = sorted(duckdb.connect().execute(ols_trend_sql(
        f"SELECT * FROM (VALUES {vals}) t(g, x, y)",
        "x", "y", ["g"])).fetchall())
    assert got == want


def test_single_point_group_is_degenerate(spark):
    r = ols_trend(_df(spark, [("s", 5, 42)]), "x", "y", ["g"]).collect()[0]
    assert (r.n_points, r.slope_micros, r.intercept_micros) \
        == (1, None, None)


def test_global_fit_no_groups(spark):
    """Empty group list = one global line, in BOTH engines (the SQL
    twin used to emit invalid SQL here)."""
    import duckdb

    rows = [("g", x, 5 * x - 3) for x in range(6)]
    got = [tuple(r) for r in ols_trend(_df(spark, rows), "x", "y",
                                       []).collect()]
    vals = ",".join(f"({x}, {y})" for _, x, y in rows)
    want = duckdb.connect().execute(ols_trend_sql(
        f"SELECT * FROM (VALUES {vals}) t(x, y)", "x", "y", [])).fetchall()
    assert got == want == [(6, 15, 57, 5_000_000, -3_000_000)]
