"""Property test: AsofJoin (union+window implementation) matches DuckDB's
native ASOF JOIN on randomized inputs — keys with empty right sides, ties,
dense/sparse timestamps."""

import os
import sys

import duckdb
import pytest
from hypothesis import given, settings, strategies as st

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
