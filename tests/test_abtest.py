"""Exact 2x2 chi-square A/B readout (functions/abtest.py)."""

import os
import sys
from fractions import Fraction

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from systems_spark.functions.abtest import (
    CHI2_1DF_95_MICROS, ab_chisq, ab_chisq_sql)

_M = 1_000_000


def _python_chisq_micros(n_a, conv_a, n_b, conv_b):
    """Independent reference: same per-cell truncation, Fractions."""
    t = n_a + n_b
    r1, r0 = conv_a + conv_b, t - conv_a - conv_b
    if not (n_a and n_b and r1 and r0):
        return None
    total = 0
    for o, c, r in ((conv_a, n_a, r1), (conv_b, n_b, r1),
                    (n_a - conv_a, n_a, r0), (n_b - conv_b, n_b, r0)):
        total += int(Fraction((o * t - c * r) ** 2 * _M, c * r * t))
    return total


def _rows(n_a, conv_a, n_b, conv_b, extra=()):
    rows = ([("A", 1)] * conv_a + [("A", 0)] * (n_a - conv_a)
            + [("B", 1)] * conv_b + [("B", 0)] * (n_b - conv_b))
    return [(v, c, i) for i, (v, c) in enumerate(rows)] + list(extra)


def _run(spark, rows):
    df = spark.createDataFrame(rows, "variant string, converted long, u long")
    return ab_chisq(df, "variant", "converted", "A", "B").collect()[0]


def test_known_table_matches_reference_and_classical_float(spark):
    r = _run(spark, _rows(1000, 100, 1000, 150))
    assert (r.n_a, r.conv_a, r.n_b, r.conv_b) == (1000, 100, 1000, 150)
    assert (r.rate_a_micros, r.rate_b_micros) == (100_000, 150_000)
    assert r.chisq_micros == _python_chisq_micros(1000, 100, 1000, 150)
    # classical closed form T(ad-bc)^2/(r1*r0*c1*c2), float sanity
    t, ad_bc = 2000, 100 * 850 - 900 * 150
    want = t * ad_bc ** 2 / (250 * 1750 * 1000 * 1000)
    assert abs(r.chisq_micros / _M - want) < 1e-4
    assert r.significant_95 and r.significant_99  # ~10.9 > 6.63


def test_null_effect_is_not_significant(spark):
    r = _run(spark, _rows(500, 50, 500, 52))
    assert r.chisq_micros < CHI2_1DF_95_MICROS
    assert r.significant_95 is False and r.significant_99 is False
    assert r.chisq_micros == _python_chisq_micros(500, 50, 500, 52)


def test_degenerate_margins_yield_null(spark):
    r = _run(spark, _rows(10, 10, 10, 10))  # everyone converts: r0 = 0
    assert r.chisq_micros is None
    assert r.significant_95 is None and r.significant_99 is None
    r = _run(spark, [("A", 1, 1), ("A", 0, 2)])  # no B units
    assert r.chisq_micros is None and r.rate_b_micros is None


def test_other_variants_ignored(spark):
    base = _rows(100, 10, 100, 20)
    extra = [("HOLDOUT", 1, 10_000 + i) for i in range(50)]
    assert _run(spark, base + extra) == _run(spark, base)


def test_matches_duckdb_twin(spark):
    import duckdb
    import random

    random.seed(29)
    rows = [(random.choice(["A", "B", "C"]), random.randint(0, 1), i)
            for i in range(400)]
    got = _run(spark, rows)
    vals = ",".join(f"('{v}',{c},{u})" for v, c, u in rows)
    want = duckdb.connect().execute(ab_chisq_sql(
        f"SELECT * FROM (VALUES {vals}) t(variant, converted, u)",
        "variant", "converted", "'A'", "'B'")).fetchone()
    assert tuple(got) == tuple(want)
