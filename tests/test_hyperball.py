"""HyperBall neighborhood-function estimation (operators/hyperball.py)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from systems_spark.operators.hyperball import hyperball, hyperball_sql


def _run(spark, edges, rounds, p=4):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {(r.node, r.hops): (r.s_int, r.approx_within)
            for r in hyperball(df, rounds, p=p).collect()}


def _python_hyperball(edges, rounds, p):
    """Independent reference: simulate the SAME register algebra in
    pure Python (portable md5 hash, bucket/rank split, max-merge)."""
    import hashlib

    m = 1 << p
    w_bits = 60 - p

    def h64(x):
        return int(hashlib.md5(str(x).encode()).hexdigest()[:15], 16)

    def regs_of(keys):
        regs = {}
        for k in keys:
            h = h64(k)
            b = h % m
            w = h >> p
            rank = (w_bits + 1 - w.bit_length()) if w > 0 else w_bits + 1
            regs[b] = max(regs.get(b, 0), rank)
        return regs

    nodes = sorted({n for e in edges for n in e})
    balls = {v: {v} for v in nodes}
    out = {}
    for t in range(1, rounds + 1):
        nxt = {v: set(b) for v, b in balls.items()}
        for s, d in edges:
            nxt[s] |= balls[d]
        balls = nxt
        for v in nodes:
            regs = regs_of(balls[v])
            r_max = w_bits + 1
            s_int = sum(1 << (r_max - r) for r in regs.values())
            s_int += (m - len(regs)) * (1 << r_max)
            out[(v, t)] = s_int
    return out


def test_registers_match_independent_python_simulation(spark):
    """The exact integer state (s_int per node per round) equals a pure
    Python simulation of the same md5 register algebra — the register
    propagation is deterministic, not just 'approximately right'."""
    edges = [(1, 2), (2, 3), (3, 4), (4, 5), (5, 1), (2, 1)]
    got = _run(spark, edges, rounds=3, p=4)
    want = _python_hyperball(edges, 3, 4)
    assert {k: v[0] for k, v in got.items()} == want


def test_ball_sizes_track_true_reachability(spark):
    """On a directed path 1→2→…→6, node v reaches min(t, 6−v)+1 nodes
    within t hops; with p=8 small neighborhoods hit linear counting and
    estimates land within ±1 of truth."""
    edges = [(i, i + 1) for i in range(1, 6)]
    got = _run(spark, edges, rounds=5, p=8)
    for (v, t), (_, est) in got.items():
        true = min(t, 6 - v) + 1
        assert abs(est - true) <= 1.0, (v, t, est, true)


def test_monotone_in_hops_and_saturates(spark):
    """Balls only grow with t, and a connected component saturates at
    its size (s_int stops changing once everything is reached)."""
    edges = [(1, 2), (2, 1), (2, 3), (3, 2)]
    got = _run(spark, edges, rounds=4, p=6)
    for v in (1, 2, 3):
        sints = [got[(v, t)][0] for t in range(1, 5)]
        assert sints[2] == sints[3]  # saturated by t=3
        ests = [got[(v, t)][1] for t in range(1, 5)]
        assert all(a <= b + 1e-9 for a, b in zip(ests, ests[1:]))


def test_matches_duckdb(spark):
    import duckdb

    edges = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (1, 5)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = sorted(map(tuple, hyperball(df, rounds=3, p=4).collect()))
    vals = ",".join(f"({a},{b})" for a, b in edges)
    want = sorted(map(tuple, duckdb.connect().execute(hyperball_sql(
        f"SELECT * FROM (VALUES {vals}) t(src, dst)",
        rounds=3, p=4)).fetchall()))
    assert got == want


def test_validation(spark):
    df = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError):
        hyperball(df, rounds=0)
    with pytest.raises(ValueError):
        hyperball_sql("SELECT 1 AS src, 2 AS dst", rounds=0)
