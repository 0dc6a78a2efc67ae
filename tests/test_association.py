"""feature_association: χ²/MI against hand-computed and scipy-free
references, independence/determinism extremes, NULL handling, SQL twin."""

import math
import os
import sys
from collections import Counter

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from systems_spark.functions.association import (feature_association,
                                                 feature_association_sql)

M = 1_000_000


def _python_scores(rows, feat_idx, label_idx):
    """Exact mirror of the integer contract."""
    pairs = [(str(r[feat_idx]), str(r[label_idx])) for r in rows
             if r[feat_idx] is not None and r[label_idx] is not None]
    n = len(pairs)
    nxy = Counter(pairs)
    nx = Counter(x for x, _ in pairs)
    ny = Counter(y for _, y in pairs)
    chi = sum((c * c * n * M) // (nx[x] * ny[y])
              for (x, y), c in nxy.items()) - n * M
    mi_num = sum(c * round(math.log((n * c) / (nx[x] * ny[y])) * M)
                 for (x, y), c in nxy.items())
    return chi, mi_num // n if mi_num >= 0 else -((-mi_num + n - 1) // n), n


def test_matches_python_reference(spark):
    rows = [("a", "p"), ("a", "p"), ("a", "q"), ("b", "q"),
            ("b", "q"), ("b", "p"), ("c", "p"), ("c", "p")]
    df = spark.createDataFrame(rows, "f1 string, y string")
    got = feature_association(df, ["f1"], "y").collect()[0]
    chi, mi, n = _python_scores(rows, 0, 1)
    assert (got.n, got.chi2_micros) == (n, chi)
    # mi floor-division sign convention: Spark's `div` truncates toward
    # zero; recompute the reference the same way
    mi_num = sum(c * round(math.log((n * c) / (
        Counter(x for x, _ in rows)[x] * Counter(y for _, y in rows)[y]))
        * M) for (x, y), c in Counter(rows).items())
    assert got.mi_micros == int(mi_num / n) if mi_num < 0 else mi_num // n


def test_independent_feature_scores_zero(spark):
    # perfectly balanced independent grid: chi2 == 0, mi == 0
    rows = [(x, y) for x in ("a", "b") for y in ("p", "q") for _ in range(5)]
    df = spark.createDataFrame(rows, "f1 string, y string")
    got = feature_association(df, "f1", "y").collect()[0]
    assert got.chi2_micros == 0
    assert got.mi_micros == 0


def test_deterministic_feature_maxes_scores(spark):
    # f == y exactly: chi2 = N*(k-1)*1e6, mi = ln(k) in micros
    rows = [(v, v) for v in ("a", "b", "c", "d") for _ in range(10)]
    df = spark.createDataFrame(rows, "f1 string, y string")
    got = feature_association(df, "f1", "y").collect()[0]
    assert got.chi2_micros == 40 * 3 * M
    assert abs(got.mi_micros - round(math.log(4) * M)) <= 1


def test_multi_feature_one_pass_and_nulls(spark):
    rows = [("a", None, "p"), ("a", "u", "p"), ("b", "u", "q"),
            ("b", "v", "q"), (None, "v", "p")]
    df = spark.createDataFrame(rows, "f1 string, f2 string, y string")
    got = {r.feature: r for r in
           feature_association(df, ["f1", "f2"], "y").collect()}
    assert got["f1"].n == 4   # the NULL-f1 row is excluded for f1 only
    assert got["f2"].n == 4
    # f1 determines y on its 4 rows -> strictly positive association
    assert got["f1"].chi2_micros > 0


def test_sql_twin_matches(spark):
    import duckdb

    rows = [("a", "u", "p"), ("a", "u", "q"), ("b", "v", "q"),
            ("b", "u", "q"), ("c", "v", "p"), ("c", "v", "p"),
            ("a", None, "p"), (None, "u", "q")]
    df = spark.createDataFrame(rows, "f1 string, f2 string, y string")
    got = sorted(tuple(r) for r in
                 feature_association(df, ["f1", "f2"], "y").collect())
    vals = ", ".join(
        "(" + ", ".join("NULL" if v is None else f"'{v}'" for v in r) + ")"
        for r in rows)
    sql = feature_association_sql(
        f"SELECT * FROM (VALUES {vals}) t(f1, f2, y)", ["f1", "f2"], "y")
    want = sorted(tuple(r) for r in duckdb.sql(sql).fetchall())
    assert got == want


def test_validation(spark):
    df = spark.createDataFrame([("a", "p")], "f1 string, y string")
    with pytest.raises(ValueError, match="feature_cols"):
        feature_association(df, [], "y")
