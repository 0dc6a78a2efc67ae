"""Deterministic random walks (operators/walks.py)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from systems_spark.operators.walks import random_walks, random_walks_sql


def _run(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {(r.start, r.walk, r.step): r.node
            for r in random_walks(df, **kw).collect()}


def _python_walks(edges, length, n_walks, seed="walk"):
    """Independent reference: same hash choice, plain dict walk."""
    import hashlib

    def h64(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    nbrs = {}
    for s, d in sorted(set(edges)):
        nbrs.setdefault(s, []).append(d)
    nodes = sorted({n for e in edges for n in e})
    out = {}
    for start in nodes:
        for w in range(n_walks):
            cur = start
            out[(start, w, 0)] = cur
            for t in range(1, length + 1):
                if cur not in nbrs:
                    break  # dead end: walk terminates
                ns = nbrs[cur]
                cur = ns[h64(f"{seed}:{start}:{w}:{t}") % len(ns)]
                out[(start, w, t)] = cur
    return out


EDGES = [(1, 2), (1, 3), (2, 3), (3, 1), (3, 4), (4, 5)]  # 5 dead-ends


def test_matches_independent_python_walker(spark):
    got = _run(spark, EDGES, length=4, n_walks=2)
    assert got == _python_walks(EDGES, 4, 2)
    # every recorded step follows an actual edge
    es = set(EDGES)
    for (s, w, t), node in got.items():
        if t > 0:
            assert (got[(s, w, t - 1)], node) in es


def test_dead_end_terminates_walk(spark):
    got = _run(spark, EDGES, length=3, n_walks=1)
    # node 5 has no out-edges: its walk is just step 0
    assert got[(5, 0, 0)] == 5
    assert (5, 0, 1) not in got


def test_determinism_across_runs_and_partitions(spark):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    a = sorted(map(tuple, random_walks(df, 3, 2).collect()))
    b = sorted(map(tuple, random_walks(df.repartition(7), 3, 2).collect()))
    assert a == b and len(a) > 0


def test_matches_duckdb(spark):
    import duckdb

    got = sorted(
        (k + (v,)) for k, v in _run(spark, EDGES, length=3, n_walks=2).items())
    vals = ",".join(f"({a},{b})" for a, b in EDGES)
    want = sorted(map(tuple, duckdb.connect().execute(random_walks_sql(
        f"SELECT * FROM (VALUES {vals}) t(src, dst)",
        length=3, n_walks=2)).fetchall()))
    assert got == want


def test_validation(spark):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    with pytest.raises(ValueError):
        random_walks(df, length=0)
    with pytest.raises(ValueError):
        random_walks_sql("SELECT 1 AS src, 2 AS dst", length=1, n_walks=0)
