"""Adamic-Adar link prediction (operators/linkpred.py)."""

import itertools
import math
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from systems_spark.operators.linkpred import link_scores, link_scores_sql


def _df(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def _py_ref(pairs, max_degree=None):
    adj = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    out = []
    for a, b in itertools.combinations(sorted(adj), 2):
        if b in adj[a]:
            continue
        cn = {z for z in adj[a] & adj[b]
              if max_degree is None or len(adj[z]) <= max_degree}
        if cn:
            aa = sum(round(1e6 / math.log(len(adj[z]))) for z in cn)
            out.append((a, b, len(cn), aa))
    return sorted(out)


PAIRS = [(1, 2), (2, 3), (1, 3), (4, 1), (4, 2), (5, 6), (6, 7), (8, 6)]


def test_hand_graph_and_python_reference(spark):
    """Adjacent pairs never scored; (3,4) found via shared {1,2};
    path endpoints found via their middle; values match an independent
    pure-Python Adamic-Adar."""
    got = sorted(map(tuple, link_scores(_df(spark, PAIRS)).collect()))
    assert got == _py_ref(PAIRS)
    assert (3, 4, 2, 1820478) in got     # two deg-3 common neighbors
    pairs = {(a, b) for a, b, _, _ in got}
    assert (1, 2) not in pairs           # adjacent: never a candidate


def test_rare_neighbor_outweighs_hub(spark):
    """A pair sharing one RARE (deg-2) neighbor outscores a pair
    sharing one deg-5 hub — the Adamic-Adar weighting."""
    pairs = ([(10, 11), (10, 12)]                  # rare z=10 (deg 2)
             + [(20, i) for i in range(21, 26)])   # hub z=20 (deg 5)
    got = {(r.a, r.b): r.aa_micros
           for r in link_scores(_df(spark, pairs)).collect()}
    rare = got[(11, 12)]
    hub = got[(21, 22)]
    assert rare > hub
    assert rare == round(1e6 / math.log(2))
    assert hub == round(1e6 / math.log(5))


def test_max_degree_caps_hub_centers_only(spark):
    """Capping removes hub CENTERS but keeps hub endpoints: with the
    cap at 2, the deg-3 middles vanish and only rare-center pairs
    survive."""
    pairs = PAIRS + [(10, 11), (10, 12)]
    got = sorted(map(tuple, link_scores(
        _df(spark, pairs), max_degree=2).collect()))
    assert got == _py_ref(pairs, max_degree=2)
    assert got == [(11, 12, 1, round(1e6 / math.log(2)))]
    with pytest.raises(ValueError):
        link_scores(_df(spark, pairs), max_degree=1)
    with pytest.raises(ValueError):
        link_scores_sql("SELECT 1", max_degree=0)


def test_matches_duckdb_bit_for_bit(spark):
    import duckdb

    pairs = [((i * 7) % 19, (i * 11 + 3) % 19) for i in range(50)]
    pairs = [(a, b) for a, b in pairs if a != b]
    got = sorted(map(tuple, link_scores(_df(spark, pairs)).collect()))
    vals = ",".join(f"({a},{b})" for a, b in pairs)
    want = sorted(map(tuple, duckdb.connect().execute(link_scores_sql(
        f"SELECT * FROM (VALUES {vals}) t(src, dst)")).fetchall()))
    assert got == want
    assert got == _py_ref(pairs)
