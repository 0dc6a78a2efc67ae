"""k-core peeling semantics on hand-built graphs."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from systems_spark.operators.kcore import kcore


def _brute_kcore(edges, k):
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    adj = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    alive = set(adj)
    while True:
        doomed = {n for n in alive if len(adj[n] & alive) < k}
        if not doomed:
            break
        alive -= doomed
    return {n: len(adj[n] & alive) for n in alive}


def _spark_kcore(spark, edges, k):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {r.node: r.core_deg for r in kcore(df, k=k).collect()}


def test_clique_survives_tree_peels_away(spark):
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    tail = [(3, 10), (10, 11), (11, 12)]  # a path hanging off the clique
    got = _spark_kcore(spark, k4 + tail, k=3)
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}  # only the K4 is 3-core


def test_matches_bruteforce_peeling(spark):
    edges = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 3),
             (5, 6), (6, 7), (2, 4), (1, 4)]
    for k in (1, 2, 3):
        assert _spark_kcore(spark, edges, k) == _brute_kcore(edges, k), k


def test_empty_core_and_cascade(spark):
    # a long path has no 2-core: peeling cascades end-inward to nothing
    path = [(i, i + 1) for i in range(8)]
    assert _spark_kcore(spark, path, k=2) == {}
    ring = path + [(8, 0)]  # closing the ring makes every node 2-core
    assert _spark_kcore(spark, ring, k=2) == {i: 2 for i in range(9)}


def test_self_loops_ignored_and_validation(spark):
    tri = [(1, 2), (2, 3), (3, 1), (1, 1)]
    assert _spark_kcore(spark, tri, k=2) == {1: 2, 2: 2, 3: 2}
    df = spark.createDataFrame(tri, "src long, dst long")
    with pytest.raises(ValueError):
        kcore(df, k=0)
