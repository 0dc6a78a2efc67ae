"""Triangle counting semantics on hand-built and randomized graphs."""

import itertools
import os
import sys

from hypothesis import given, settings, strategies as st

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from systems_spark.operators.triangles import triangle_count


def _brute(edges):
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    nodes = sorted({n for e in edges for n in e})
    adj = {n: set() for n in nodes}
    for a, b in und:
        adj[a].add(b)
        adj[b].add(a)
    count = {n: 0 for n in nodes}
    for a, b, c in itertools.combinations(nodes, 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            count[a] += 1
            count[b] += 1
            count[c] += 1
    return count


def _spark(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {r.node: r.n_triangles for r in triangle_count(df).collect()}


def test_k4_and_star(spark):
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    got = _spark(spark, k4)
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}  # K4: C(3,2)=3 per node
    star = [(0, i) for i in range(1, 6)]
    assert _spark(spark, star) == {i: 0 for i in range(6)}


def test_duplicate_reversed_and_self_edges_collapse(spark):
    tri = [(1, 2), (2, 1), (2, 3), (3, 1), (1, 1), (2, 3)]
    assert _spark(spark, tri) == {1: 1, 2: 1, 3: 1}


def test_self_loop_only_node_reports_zero(spark):
    got = _spark(spark, [(1, 2), (2, 3), (3, 1), (4, 4)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 0}


@settings(max_examples=6, deadline=None)
@given(edges=st.lists(
    st.tuples(st.integers(0, 9), st.integers(0, 9)), min_size=1, max_size=40))
def test_matches_bruteforce(spark, edges):
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    if not und:
        return
    assert _spark(spark, edges) == _brute(edges)


def test_wedge_volume_is_half_the_naive_selfjoin(spark):
    """VERDICT r4 item 3: each wedge enumerated exactly once — the wedge
    stage emits Σ C(out_deg, 2) rows, not the naive Σ out_deg·(out_deg-1)
    of a `v != w` self-join."""
    from math import comb

    from systems_spark.operators.triangles import _oriented, _wedges

    edges = [(a, b) for a in range(6) for b in range(6) if a < b]  # K6
    edges += [(0, 10), (10, 11), (11, 0), (10, 12)]
    df = spark.createDataFrame(edges, "src long, dst long")
    o = _oriented(df, "src", "dst")
    out_deg = {}
    for r in o.collect():
        out_deg[r.u] = out_deg.get(r.u, 0) + 1
    want = sum(comb(d, 2) for d in out_deg.values())
    assert _wedges(o).count() == want and want > 0
