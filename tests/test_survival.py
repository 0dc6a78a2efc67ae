"""Kaplan–Meier table: hand-computed textbook example, censoring-at-risk
semantics, grouped curves, and SQL-twin equality."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from systems_spark.operators import kaplan_meier, kaplan_meier_sql


def test_hand_computed_km_table(spark):
    """durations [6,6,6,7,10], events [1,1,0,1,0]: the classic small
    example. A subject censored AT t stays at risk for events at t."""
    df = spark.createDataFrame(
        [(6, 1), (6, 1), (6, 0), (7, 1), (10, 0)], "dur long, ev long")
    rows = {r.time: r for r in kaplan_meier(df, "dur", "ev").collect()}
    assert set(rows) == {6, 7, 10}
    r6, r7, r10 = rows[6], rows[7], rows[10]
    assert (r6.at_risk, r6.events, r6.censored) == (5, 2, 1)
    assert r6.survival_factor_micros == 600000      # (5-2)/5
    assert r6.cum_hazard_micros == 400000           # 2/5
    assert (r7.at_risk, r7.events) == (2, 1)
    assert r7.survival_factor_micros == 500000
    assert r7.cum_hazard_micros == 900000           # 2/5 + 1/2
    assert (r10.at_risk, r10.events, r10.censored) == (1, 0, 1)
    assert r10.survival_factor_micros == 1000000
    assert r10.cum_hazard_micros == 900000


def test_grouped_curves_and_sql_twin(spark):
    import duckdb

    rows = [("a", 6, 1), ("a", 6, 1), ("a", 6, 0), ("a", 7, 1),
            ("a", 10, 0), ("b", 3, 1), ("b", 5, 0), ("b", 5, 1)]
    df = spark.createDataFrame(rows, "g string, dur long, ev long")
    got = sorted(tuple(r) for r in
                 kaplan_meier(df, "dur", "ev", group_cols="g").collect())
    vals = ", ".join(f"('{g}', {d}, {e})" for g, d, e in rows)
    sql = kaplan_meier_sql(
        f"SELECT * FROM (VALUES {vals}) t(g, dur, ev)",
        "dur", "ev", group_cols="g")
    want = sorted(tuple(r) for r in duckdb.sql(sql).fetchall())
    assert got == want
    # group b sanity: t=3 at_risk 3; t=5 at_risk 2, one event one censor
    bg = {r[1]: r for r in got if r[0] == "b"}
    assert bg[3][2:5] == (3, 1, 0)
    assert bg[5][2:5] == (2, 1, 1)
    assert bg[5][5] == 500000  # (2-1)/2


from hypothesis import given, settings, strategies as st


@settings(max_examples=6, deadline=None)
@given(st.lists(st.tuples(st.integers(1, 12), st.integers(0, 1)),
                min_size=1, max_size=30))
def test_km_matches_python_reference_random(spark, subjects):
    """Randomized: the KM table equals a pure-Python reference (exits
    sorted by time, at-risk = remaining count, truncating int div)."""
    df = spark.createDataFrame(subjects, "dur long, ev long")
    got = {r.time: (r.at_risk, r.events, r.censored,
                    r.survival_factor_micros, r.cum_hazard_micros)
           for r in kaplan_meier(df, "dur", "ev").collect()}
    want = {}
    remaining = len(subjects)
    cum = 0
    from collections import Counter
    per_t = {}
    for d, e in subjects:
        per_t.setdefault(d, Counter())[("e" if e else "c")] += 1
    for t in sorted(per_t):
        d = per_t[t]["e"]
        c = per_t[t]["c"]
        n = remaining
        cum += (d * 1_000_000) // n
        want[t] = (n, d, c, ((n - d) * 1_000_000) // n, cum)
        remaining -= d + c
    assert got == want
