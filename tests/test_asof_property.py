"""Property test: AsofJoin (union+window implementation) matches DuckDB's
native ASOF JOIN on randomized inputs — keys with empty right sides, ties,
dense/sparse timestamps."""

import os
import sys

import duckdb
import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from systems_spark.operators.asof import AsofJoin

ROWS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=4),       # key
        st.integers(min_value=0, max_value=50),      # ts
    ),
    min_size=1,
    max_size=40,
)


@settings(max_examples=8, deadline=None)
@given(left=ROWS, right=ROWS)
def test_asof_matches_duckdb(spark, left, right):
    # unique right (key, ts) — both engines' semantics are only defined up
    # to ties on the right timestamp (documented in AsofJoin)
    right = sorted({(k, t) for k, t in right})
    left_rows = [(i, k, t) for i, (k, t) in enumerate(left)]
    right_rows = [(i, k, t) for i, (k, t) in enumerate(right)]

    ldf = spark.createDataFrame(left_rows, "lid long, k long, ts long")
    rdf = spark.createDataFrame(right_rows, "rid long, k long, rts long")
    op = AsofJoin(rdf, on=["k"], left_ts="ts", right_ts="rts", right_cols=["rid"])
    got = {r.lid: r.rid for r in op(ldf).collect()}

    con = duckdb.connect()
    con.execute("CREATE TABLE l (lid BIGINT, k BIGINT, ts BIGINT)")
    con.execute("CREATE TABLE r (rid BIGINT, k BIGINT, rts BIGINT)")
    con.executemany("INSERT INTO l VALUES (?,?,?)", left_rows)
    con.executemany("INSERT INTO r VALUES (?,?,?)", right_rows)
    want = dict(con.execute(
        "SELECT l.lid, r.rid FROM l ASOF LEFT JOIN r ON l.k = r.k AND l.ts >= r.rts"
    ).fetchall())
    assert got == want


@settings(max_examples=8, deadline=None)
@given(left=ROWS, right=ROWS,
       tol=st.one_of(st.none(), st.integers(min_value=0, max_value=10)))
def test_asof_forward_and_tolerance_vs_bruteforce(spark, left, right, tol):
    """direction='forward' picks the earliest right row at-or-after; a
    tolerance nulls matches farther than tol timestamp units."""
    right = sorted({(k, t) for k, t in right})
    left_rows = [(i, k, t) for i, (k, t) in enumerate(left)]
    right_rows = [(i, k, t) for i, (k, t) in enumerate(right)]

    ldf = spark.createDataFrame(left_rows, "lid long, k long, ts long")
    rdf = spark.createDataFrame(right_rows, "rid long, k long, rts long")
    op = AsofJoin(rdf, on=["k"], left_ts="ts", right_ts="rts",
                  right_cols=["rid"], direction="forward", tolerance=tol)
    got = {r.lid: r.rid for r in op(ldf).collect()}

    want = {}
    for lid, k, t in left_rows:
        best = None
        for rid, rk, rt in right_rows:
            if rk == k and rt >= t and (tol is None or rt - t <= tol):
                if best is None or rt < best[1]:
                    best = (rid, rt)
        want[lid] = best[0] if best else None
    assert got == want


@settings(max_examples=8, deadline=None)
@given(left=ROWS, right=ROWS)
def test_asof_null_payload_stays_with_matched_row(spark, left, right):
    """When the MATCHED right row has a NULL payload value but an older
    right row doesn't, the output must keep the matched row's NULL — a
    per-column forward-fill would stitch fields from two different right
    rows (ADVICE r1: asof.py struct-carry fix). Payload is NULL for even
    rids; a second always-set payload column pins which row matched."""
    right = sorted({(k, t) for k, t in right})
    left_rows = [(i, k, t) for i, (k, t) in enumerate(left)]
    right_rows = [
        (i, k, t, None if i % 2 == 0 else i * 100) for i, (k, t) in enumerate(right)
    ]

    ldf = spark.createDataFrame(left_rows, "lid long, k long, ts long")
    rdf = spark.createDataFrame(right_rows, "rid long, k long, rts long, payload long")
    op = AsofJoin(rdf, on=["k"], left_ts="ts", right_ts="rts",
                  right_cols=["rid", "payload"])
    got = {r.lid: (r.rid, r.payload) for r in op(ldf).collect()}

    want = {}
    for lid, k, t in left_rows:
        best = None
        for rid, rk, rt, pay in right_rows:
            if rk == k and rt <= t and (best is None or rt > best[2]):
                best = (rid, pay, rt)
        want[lid] = (best[0], best[1]) if best else (None, None)
    assert got == want


def test_asof_tolerance_on_real_timestamps(spark):
    """TimestampType inputs: the gap is computed in epoch microseconds, so a
    numeric tolerance (µs) works — r1 ADVICE flagged that raw column
    subtraction yields a DayTimeIntervalType that can't compare to a
    numeric literal."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    ldf = spark.createDataFrame(
        [(1, base + dt.timedelta(seconds=10))], "lid long, ts timestamp"
    )
    rdf = spark.createDataFrame(
        [(100, base), (200, base + dt.timedelta(seconds=9))],
        "rid long, rts timestamp",
    ).withColumn("k", F.lit(1))
    ldf = ldf.withColumn("k", F.lit(1))

    # 2s tolerance → the 1s-old row matches
    op = AsofJoin(rdf, on=["k"], left_ts="ts", right_ts="rts",
                  right_cols=["rid"], tolerance=2_000_000)
    assert [r.rid for r in op(ldf).collect()] == [200]
    # 0.5s tolerance → nulled
    op = AsofJoin(rdf, on=["k"], left_ts="ts", right_ts="rts",
                  right_cols=["rid"], tolerance=500_000)
    assert [r.rid for r in op(ldf).collect()] == [None]
