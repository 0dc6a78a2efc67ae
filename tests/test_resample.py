"""resample_ffill: grid construction, forward fill, staleness nulling,
equal-timestamp tie handling, randomized parity vs pandas ffill."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from systems_spark.operators import resample_ffill, resample_ffill_sql


def _rows(df):
    return sorted((r.k, r.grid_ts, r.v, r.last_obs_ts)
                  for r in df.collect())


def test_basic_grid_and_ffill(spark):
    df = spark.createDataFrame(
        [(1, 5, 10.0), (1, 13, 20.0), (1, 27, 30.0)], "k long, t long, v double")
    out = resample_ffill(df, "k", "t", ["v"], step=10)
    # key 1 spans ticks 0..20; tick 0 carries t=5? no — only obs <= tick
    assert _rows(out) == [
        (1, 0, None, None),        # nothing at or before tick 0
        (1, 10, 10.0, 5),
        (1, 20, 20.0, 13),
    ]


def test_observation_on_the_tick_is_picked_up(spark):
    df = spark.createDataFrame([(1, 10, 7.0), (1, 25, 9.0)],
                               "k long, t long, v double")
    out = resample_ffill(df, "k", "t", ["v"], step=10)
    assert _rows(out) == [(1, 10, 7.0, 10), (1, 20, 7.0, 10)]


def test_staleness_nulls_old_values(spark):
    df = spark.createDataFrame([(1, 0, 1.0), (1, 95, 2.0)],
                               "k long, t long, v double")
    out = resample_ffill(df, "k", "t", ["v"], step=10, max_staleness=25)
    got = {r.grid_ts: (r.v, r.last_obs_ts) for r in out.collect()}
    assert got[0] == (1.0, 0)
    assert got[20] == (1.0, 0)      # 20 - 0 <= 25: still fresh
    assert got[30] == (None, None)  # 30 - 0 > 25: stale -> absent
    assert got[90] == (None, None)


def test_equal_ts_ties_break_deterministically(spark):
    df = spark.createDataFrame(
        [(1, 10, 5.0, 101), (1, 10, 6.0, 102)],
        "k long, t long, v double, eid long")
    out = resample_ffill(df, "k", "t", ["v"], step=10,
                         tiebreak_cols=["eid"])
    # the larger eid sorts last and wins the fill
    assert [(r.grid_ts, r.v) for r in out.collect()] == [(10, 6.0)]


def test_multiple_keys_isolated(spark):
    df = spark.createDataFrame([(1, 0, 1.0), (2, 100, 9.0)],
                               "k long, t long, v double")
    out = resample_ffill(df, "k", "t", ["v"], step=50)
    assert _rows(out) == [(1, 0, 1.0, 0), (2, 100, 9.0, 100)]


def test_validation(spark):
    df = spark.createDataFrame([(1, 0, 1.0)], "k long, t long, v double")
    with pytest.raises(ValueError, match="step"):
        resample_ffill(df, "k", "t", ["v"], step=0)
    with pytest.raises(ValueError, match="max_staleness"):
        resample_ffill(df, "k", "t", ["v"], step=1, max_staleness=-1)


def test_random_matches_pandas_reference(spark):
    import random

    import pandas as pd

    rng = random.Random(31)
    rows = []
    eid = 0
    for k in (1, 2, 3):
        for _ in range(rng.randint(3, 15)):
            eid += 1
            rows.append((k, rng.randrange(0, 200), float(rng.randint(1, 99)),
                         eid))
    df = spark.createDataFrame(rows, "k long, t long, v double, eid long")
    got = {(r.k, r.grid_ts): r.v for r in
           resample_ffill(df, "k", "t", ["v"], step=7,
                          tiebreak_cols=["eid"]).collect()}

    pdf = pd.DataFrame(rows, columns=["k", "t", "v", "eid"])
    want = {}
    for k, g in pdf.groupby("k"):
        g = g.sort_values(["t", "eid"])
        lo, hi = (g.t.min() // 7) * 7, (g.t.max() // 7) * 7
        for tick in range(lo, hi + 1, 7):
            past = g[g.t <= tick]
            want[(k, tick)] = float(past.iloc[-1].v) if len(past) else None
    assert got == want


def test_sql_twin_matches(spark):
    import duckdb

    rows = [(1, 3, 1.5, 1), (1, 14, 2.5, 2), (1, 14, 3.5, 3), (2, 40, 9.0, 4)]
    df = spark.createDataFrame(rows, "k long, t long, v double, eid long")
    got = _rows(resample_ffill(df, "k", "t", ["v"], step=10,
                               tiebreak_cols=["eid"], max_staleness=15))
    vals = ", ".join(f"({k}, {t}, {v}, {e})" for k, t, v, e in rows)
    sql = resample_ffill_sql(
        f"SELECT * FROM (VALUES {vals}) s(k, t, v, eid)",
        "k", "t", ["v"], step=10, tiebreak_cols=["eid"], max_staleness=15)
    want = sorted(tuple(r) for r in duckdb.sql(sql).fetchall())
    assert got == want


def test_null_timestamps_are_dropped(spark):
    """A NULL-ts observation is unplaceable: it must not forward-fill
    into the grid (it would sort first and fabricate freshness) and
    must not widen the span (ADVICE r8). Spark and the SQL twin agree."""
    import duckdb

    df = spark.createDataFrame(
        [(1, 5, 10.0), (1, None, 99.0), (1, 13, 20.0)],
        "k long, t long, v double")
    out = resample_ffill(df, "k", "t", ["v"], step=10)
    assert _rows(out) == [(1, 0, None, None), (1, 10, 10.0, 5)]

    con = duckdb.connect()
    con.execute("CREATE TABLE src_t (k BIGINT, t BIGINT, v DOUBLE)")
    con.executemany("INSERT INTO src_t VALUES (?, ?, ?)",
                    [(1, 5, 10.0), (1, None, 99.0), (1, 13, 20.0)])
    sql = resample_ffill_sql("SELECT * FROM src_t", "k", "t", ["v"], step=10)
    duck = sorted(tuple(r) for r in con.execute(sql).fetchall())
    assert duck == [(1, 0, None, None), (1, 10, 10.0, 5)]
