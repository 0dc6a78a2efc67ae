"""Deterministic synchronous label propagation (operators/communities.py)."""

import os
import sys
from collections import Counter

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from systems_spark.operators.communities import label_propagation


def _spark_lpa(spark, edges, rounds=4, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {r.node: r.community
            for r in label_propagation(df, rounds=rounds, **kw).collect()}


def _brute_lpa(edges, rounds):
    """Reference NumPy-free implementation of the deterministic variant."""
    und = set()
    nodes = set()
    for a, b in edges:
        nodes.update((a, b))
        if a != b:
            und.add((a, b))
            und.add((b, a))
    nbrs = {}
    for a, b in und:
        nbrs.setdefault(a, []).append(b)
    lab = {n: n for n in nodes}
    for _ in range(rounds):
        new = {}
        for n in nodes:
            if not nbrs.get(n):
                new[n] = lab[n]
                continue
            cnt = Counter(lab[u] for u in nbrs[n])
            # argmax count, ties -> smallest label
            new[n] = min(cnt, key=lambda L: (-cnt[L], L))
        lab = new
    return lab


def test_two_cliques_with_bridge_split(spark):
    k1 = [(a, b) for a in (1, 2, 3) for b in (1, 2, 3) if a < b]
    k2 = [(a, b) for a in (4, 5, 6) for b in (4, 5, 6) if a < b]
    got = _spark_lpa(spark, k1 + k2 + [(3, 4)], rounds=4)
    assert got[1] == got[2] == got[3]
    assert got[4] == got[5] == got[6]
    assert got[1] != got[4]  # the bridge does NOT merge the cliques


def test_isolated_and_self_loop_nodes_keep_own_label(spark):
    got = _spark_lpa(spark, [(1, 2), (3, 3)], rounds=4)
    assert got[3] == 3
    assert set(got) == {1, 2, 3}


def test_stable_stop_matches_fixed_rounds(spark):
    k1 = [(a, b) for a in (1, 2, 3) for b in (1, 2, 3) if a < b]
    fixed = _spark_lpa(spark, k1, rounds=8)
    stopped = _spark_lpa(spark, k1, rounds=8, stop_when_stable=True)
    assert stopped == fixed


def test_validation(spark):
    df = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError):
        label_propagation(df, rounds=0)


@settings(max_examples=6, deadline=None)
@given(edges=st.lists(
    st.tuples(st.integers(0, 9), st.integers(0, 9)), min_size=1, max_size=30),
    rounds=st.integers(1, 4))
def test_matches_bruteforce(spark, edges, rounds):
    assert _spark_lpa(spark, edges, rounds=rounds) == _brute_lpa(edges, rounds)
