"""Exact time-weighted average (operators/twap.py)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from systems_spark.operators.twap import time_weighted_avg, time_weighted_avg_sql


def _df(spark, rows):
    return spark.createDataFrame(rows, "g long, ts long, v long")


def _python_twap(rows, end=None):
    from collections import defaultdict

    groups = defaultdict(list)
    for g, ts, v in rows:
        groups[g].append((ts, v))
    out = {}
    for g, samples in groups.items():
        samples.sort(key=lambda p: p[0])
        sv = sd = 0
        for i, (ts, v) in enumerate(samples):
            nxt = samples[i + 1][0] if i + 1 < len(samples) else end
            if nxt is None:
                continue
            sv += v * (nxt - ts)
            sd += nxt - ts
        # truncate toward zero like Spark DIV / DuckDB // (python //
        # floors, which differs for negative sums)
        tw = None if not sd else (abs(sv) // sd) * (1 if sv >= 0 else -1)
        out[g] = (len(samples), sd, tw)
    return out


def test_burst_does_not_overweight(spark):
    # ten quick samples at 100 then one long hold at 0: plain mean ~91,
    # twap weights the hold
    rows = [(1, t, 100) for t in range(10)] + [(1, 10, 0)]
    got = time_weighted_avg(_df(spark, rows), ["g"], "ts", "v",
                            end_ts_us=110).collect()[0]
    # 100 held for 10us, 0 held for 100us -> 1000/110 = 9
    assert (got.n_samples, got.span_us, got.twap) == (11, 110, 9)


def test_last_sample_drops_without_horizon(spark):
    rows = [(1, 0, 10), (1, 4, 50), (1, 10, 999)]
    got = time_weighted_avg(_df(spark, rows), ["g"], "ts", "v").collect()[0]
    # 10*4 + 50*6 = 340 over 10us
    assert (got.n_samples, got.span_us, got.twap) == (3, 10, 34)


def test_single_sample_and_ties(spark):
    rows = [(1, 5, 42), (2, 1, 7), (2, 1, 9)]
    got = {r.g: (r.span_us, r.twap)
           for r in time_weighted_avg(_df(spark, rows), ["g"],
                                      "ts", "v").collect()}
    assert got[1] == (None, None)   # no duration at all
    assert got[2] == (0, None)      # tied: zero-length hold


def test_matches_python_reference_random(spark):
    import random

    random.seed(43)
    rows = [(random.randint(1, 5), random.randint(0, 1000),
             random.randint(-100, 100)) for _ in range(200)]
    # dedupe (g, ts) to keep the reference's tie handling trivial
    seen, uniq = set(), []
    for g, ts, v in rows:
        if (g, ts) not in seen:
            seen.add((g, ts))
            uniq.append((g, ts, v))
    got = {r.g: (r.n_samples, r.span_us, r.twap)
           for r in time_weighted_avg(_df(spark, uniq), ["g"], "ts", "v",
                                      end_ts_us=2000).collect()}
    want = {g: (n, sd, tw)
            for g, (n, sd, tw) in _python_twap(uniq, end=2000).items()}
    assert got == want


def test_matches_duckdb_twin(spark):
    import duckdb
    import random

    random.seed(47)
    rows = [(random.randint(1, 4), random.randint(0, 500),
             random.randint(-50, 50)) for _ in range(80)]
    got = sorted(map(tuple, time_weighted_avg(
        _df(spark, rows), ["g"], "ts", "v", end_ts_us=600).collect()))
    vals = ",".join(f"({g},{t},{v})" for g, t, v in rows)
    want = sorted(map(tuple, duckdb.connect().execute(
        time_weighted_avg_sql(
            f"SELECT * FROM (VALUES {vals}) t(g, ts, v)",
            ["g"], "ts", "v", end_ts_us=600)).fetchall()))
    assert got == want


def test_tiebreaker_pins_which_value_holds_the_interval(spark):
    import duckdb

    # two samples tied at ts=0 with different values; the one LAST in
    # tie order (bigger event id) holds until ts=10
    rows = [(1, 0, 5, 100), (1, 0, 9, 200), (1, 10, 1, 300)]
    df = spark.createDataFrame(rows, "g long, ts long, eid long, v long")
    got = time_weighted_avg(df, ["g"], "ts", "v",
                            order_cols=["eid"]).collect()[0]
    assert (got.span_us, got.twap) == (10, 200)  # eid 9's value held
    vals = ",".join(f"({g},{t},{e},{v})" for g, t, e, v in rows)
    want = duckdb.connect().execute(time_weighted_avg_sql(
        f"SELECT * FROM (VALUES {vals}) t(g, ts, eid, v)",
        ["g"], "ts", "v", order_names=["eid"])).fetchone()
    assert (got.g, got.n_samples, got.span_us, got.twap) == tuple(want)


def test_validation(spark):
    with pytest.raises(ValueError):
        time_weighted_avg(_df(spark, [(1, 1, 1)]), [], "ts", "v")
    with pytest.raises(ValueError):
        time_weighted_avg_sql("SELECT 1", [], "ts", "v")
