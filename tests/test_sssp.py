"""Distributed Bellman-Ford shortest paths (operators/sssp.py)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from systems_spark.operators.sssp import sssp, sssp_sql


def _edges(spark, triples):
    return spark.createDataFrame(triples, "src long, dst long, w long")


def _seeds(spark, nodes):
    return spark.createDataFrame([(n,) for n in nodes], "node long")


def _python_sssp(triples, seeds, rounds):
    """Independent reference: dict-based Bellman-Ford."""
    dist = {s: 0 for s in seeds}
    for _ in range(rounds):
        nxt = dict(dist)
        for s, d, w in triples:
            if s in dist and dist[s] + w < nxt.get(d, float("inf")):
                nxt[d] = dist[s] + w
        if nxt == dist:
            break
        dist = nxt
    return dist


def test_cheap_detour_beats_direct_edge(spark):
    # direct 1->3 costs 10; the 1->2->3 detour costs 3
    triples = [(1, 3, 10), (1, 2, 1), (2, 3, 2), (3, 4, 5)]
    got = {r.node: r.dist
           for r in sssp(_edges(spark, triples), _seeds(spark, [1]),
                         rounds=4).collect()}
    assert got == {1: 0, 2: 1, 3: 3, 4: 8}
    assert got == _python_sssp(triples, [1], 4)


def test_round_budget_truncates_long_paths(spark):
    triples = [(1, 2, 1), (2, 3, 1), (3, 4, 1)]
    got = {r.node: r.dist
           for r in sssp(_edges(spark, triples), _seeds(spark, [1]),
                         rounds=2).collect()}
    assert got == {1: 0, 2: 1, 3: 2}  # node 4 needs 3 relaxations


def test_multi_seed_and_early_stop(spark):
    triples = [(1, 2, 4), (5, 2, 1), (2, 6, 1)]
    got = {r.node: r.dist
           for r in sssp(_edges(spark, triples), _seeds(spark, [1, 5]),
                         rounds=50).collect()}  # converges in 2, stops early
    assert got == {1: 0, 5: 0, 2: 1, 6: 2}
    assert got == _python_sssp(triples, [1, 5], 50)


def test_matches_python_reference_random(spark):
    import random

    random.seed(23)
    triples = list({(random.randint(1, 12), random.randint(1, 12),
                     random.randint(0, 9)) for _ in range(40)})
    got = {r.node: r.dist
           for r in sssp(_edges(spark, triples), _seeds(spark, [1, 2]),
                         rounds=6).collect()}
    assert got == _python_sssp(triples, [1, 2], 6)


def test_matches_duckdb_twin(spark):
    import duckdb
    import random

    random.seed(31)
    triples = list({(random.randint(1, 10), random.randint(1, 10),
                     random.randint(1, 20)) for _ in range(30)})
    got = sorted(map(tuple, sssp(_edges(spark, triples),
                                 _seeds(spark, [3]), rounds=5).collect()))
    vals = ",".join(f"({a},{b},{w})" for a, b, w in triples)
    want = sorted(map(tuple, duckdb.connect().execute(sssp_sql(
        f"SELECT * FROM (VALUES {vals}) t(src, dst, w)",
        "SELECT 3 AS node", rounds=5)).fetchall()))
    assert got == want


def test_validation(spark):
    with pytest.raises(ValueError):
        sssp(_edges(spark, [(1, 2, 1)]), _seeds(spark, [1]), rounds=-1)
    with pytest.raises(ValueError):
        sssp(_edges(spark, [(1, 2, -5)]), _seeds(spark, [1]), rounds=2)
    with pytest.raises(ValueError):
        sssp_sql("SELECT 1, 2, 3", "SELECT 1", rounds=-1)
