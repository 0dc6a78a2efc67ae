"""Mean-shift change-point detection (operators/changepoint.py)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from systems_spark.operators.changepoint import (
    mean_shift_point,
    mean_shift_point_sql,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "g string, t long, v long")


def test_obvious_level_shift_found_exactly(spark):
    """10 points at 100 then 10 at 500: split at i=10 with gap exactly
    400 (400_000_000 micros)."""
    rows = [("a", i, 100 if i <= 10 else 500) for i in range(1, 21)]
    r = mean_shift_point(_df(spark, rows), ["g"], ["t"], "v").collect()[0]
    assert (r.n_points, r.split_idx, r.split_at, r.shift_micros) \
        == (20, 10, 10, 400_000_000)


def test_matches_python_argmax_on_noisy_series(spark):
    """Independent pure-Python argmax over the same statistic (exact
    Fraction arithmetic — not the DuckDB twin)."""
    from fractions import Fraction

    vals = [((i * 37) % 83) + (300 if i > 28 else 0) for i in range(1, 41)]
    rows = [("g", i, v) for i, v in zip(range(1, 41), vals)]
    r = mean_shift_point(_df(spark, rows), ["g"], ["t"], "v").collect()[0]
    n, sn = len(vals), sum(vals)
    best = None
    for i in range(1, n):
        si = sum(vals[:i])
        shift = abs(Fraction(si, i) - Fraction(sn - si, n - i))
        key = (shift, -i)
        if best is None or key > best[0]:
            best = (key, i)
    assert r.split_idx == best[1]
    exact_micros = (abs(sum(vals[:best[1]]) * (n - best[1])
                        - (sn - sum(vals[:best[1]])) * best[1])
                    * 1_000_000) // (best[1] * (n - best[1]))
    assert r.shift_micros == exact_micros


def test_flat_series_and_small_groups(spark):
    """Flat series → shift 0 at the earliest split; 1-point groups are
    omitted; NULL values excluded before ranking."""
    rows = ([("flat", i, 50) for i in range(1, 6)]
            + [("one", 1, 7)]
            + [("nul", 1, 10), ("nul", 2, None), ("nul", 3, 10)])
    got = {r.g: (r.n_points, r.split_idx, r.shift_micros)
           for r in mean_shift_point(_df(spark, rows), ["g"],
                                     "t", "v").collect()}
    assert got == {"flat": (5, 1, 0), "nul": (2, 1, 0)}


def test_matches_duckdb_bit_for_bit(spark):
    import duckdb

    rows = [(f"g{i % 3}", i // 3, ((i * 13) % 97)
             + (200 if i > 45 else 0)) for i in range(60)]
    got = sorted(map(tuple, mean_shift_point(
        _df(spark, rows), ["g"], ["t"], "v").collect()))
    vals = ",".join(f"('{g}', {t}, {v})" for g, t, v in rows)
    want = sorted(map(tuple, duckdb.connect().execute(mean_shift_point_sql(
        f"SELECT * FROM (VALUES {vals}) t(g, t, v)",
        ["g"], ["t"], "v")).fetchall()))
    assert got == want


def test_order_tiebreaker_contract(spark):
    """With a duplicate order value, adding a second order column
    restores the total order and both engines agree; split_at is the
    FIRST order column's value."""
    import duckdb

    rows = [("g", 1, 0, 10), ("g", 1, 1, 300), ("g", 2, 2, 10),
            ("g", 3, 3, 10)]
    df = spark.createDataFrame(rows, "g string, t long, i long, v long")
    got = sorted(map(tuple, mean_shift_point(
        df, ["g"], ["t", "i"], "v").collect()))
    vals = ",".join(f"('{g}', {t}, {i}, {v})" for g, t, i, v in rows)
    want = sorted(map(tuple, duckdb.connect().execute(mean_shift_point_sql(
        f"SELECT * FROM (VALUES {vals}) t(g, t, i, v)",
        ["g"], ["t", "i"], "v")).fetchall()))
    assert got == want
