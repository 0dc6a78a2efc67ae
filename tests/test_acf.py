"""Exact lag-k autocorrelation (operators/acf.py)."""

import os
import sys
from fractions import Fraction

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from systems_spark.operators.acf import acf, acf_sql

_M = 1_000_000


def _python_acf(series, max_lag):
    """Independent reference: exact Fraction arithmetic, truncation
    toward zero like Spark DIV / DuckDB //."""
    idx = dict(series)
    n, s = len(series), sum(x for _, x in series)
    den = sum((Fraction(n) * x - s) ** 2 for _, x in series)
    out = {}
    for k in range(1, max_lag + 1):
        pairs = [(x, idx[t + k]) for t, x in series if t + k in idx]
        if not pairs:
            continue
        num = sum((Fraction(n) * xa - s) * (Fraction(n) * xb - s)
                  for xa, xb in pairs)
        r = None if den == 0 else int(Fraction(num * _M, den))
        out[k] = (len(pairs), r)
    return out


def _df(spark, rows, with_group=False):
    schema = ("g string, t long, x long" if with_group
              else "t long, x long")
    return spark.createDataFrame(rows, schema)


def test_global_matches_fraction_reference(spark):
    import random

    random.seed(21)
    series = [(t, random.randint(-50, 100)) for t in range(40)]
    got = {r.lag: (r.n_pairs, r.acf_micros)
           for r in acf(_df(spark, series), [], "t", "x", 5).collect()}
    assert got == _python_acf(series, 5)
    # lag-1 of noise is small; sanity: coefficients bounded by 1
    assert all(abs(v) <= _M for _, v in got.values())


def test_alternating_series_is_negatively_correlated(spark):
    series = [(t, 100 if t % 2 == 0 else -100) for t in range(20)]
    got = {r.lag: r.acf_micros
           for r in acf(_df(spark, series), [], "t", "x", 2).collect()}
    assert got[1] < -900_000 and got[2] >= 900_000
    assert got == {k: v[1] for k, v in _python_acf(series, 2).items()}


def test_constant_series_null_and_gaps_drop_pairs(spark):
    const = [(t, 7) for t in range(10)]
    got = {r.lag: (r.n_pairs, r.acf_micros)
           for r in acf(_df(spark, const), [], "t", "x", 2).collect()}
    assert got == {1: (9, None), 2: (8, None)}
    gappy = [(0, 1), (1, 5), (3, 2), (4, 9)]  # t=2 missing
    got = {r.lag: (r.n_pairs, r.acf_micros)
           for r in acf(_df(spark, gappy), [], "t", "x", 2).collect()}
    assert {k: v[0] for k, v in got.items()} == {1: 2, 2: 1}
    assert got == _python_acf(gappy, 2)


def test_grouped_matches_per_group_reference(spark):
    import random

    random.seed(4)
    rows, ref = [], {}
    for grp in ("a", "b"):
        series = [(t, random.randint(0, 60)) for t in range(25)]
        rows += [(grp, t, x) for t, x in series]
        ref[grp] = _python_acf(series, 3)
    got = {}
    for r in acf(_df(spark, rows, True), ["g"], "t", "x", 3).collect():
        got.setdefault(r.g, {})[r.lag] = (r.n_pairs, r.acf_micros)
    assert got == ref


def test_matches_duckdb_twin_grouped_and_global(spark):
    import duckdb
    import random

    random.seed(17)
    rows = [(grp, t, random.randint(-30, 90))
            for grp in ("u", "v") for t in range(18)]
    vals = ",".join(f"('{g}',{t},{x})" for g, t, x in rows)
    src = f"SELECT * FROM (VALUES {vals}) t(g, t, x)"
    got = sorted(map(tuple, acf(
        _df(spark, rows, True), ["g"], "t", "x", 4).collect()))
    want = sorted(map(tuple, duckdb.connect().execute(
        acf_sql(src, ["g"], "t", "x", 4)).fetchall()))
    assert got == want
    got_g = sorted(map(tuple, acf(
        _df(spark, [(t, x) for _, t, x in rows if _ == "u"]),
        [], "t", "x", 3).collect()))
    want_g = sorted(map(tuple, duckdb.connect().execute(
        acf_sql(f"SELECT t, x FROM ({src}) WHERE g = 'u'",
                [], "t", "x", 3)).fetchall()))
    assert got_g == want_g


def test_validation(spark):
    with pytest.raises(ValueError):
        acf(_df(spark, [(1, 1)]), [], "t", "x", 0)
    with pytest.raises(ValueError):
        acf_sql("SELECT 1", [], "t", "x", 0)
