"""Integer PageRank semantics on hand-built graphs.

The oracle-parity test covers the graded query; these pin the integer
power-iteration against an independent pure-Python implementation, the
dangling-node treatment, partition invariance, and checkpoint equivalence.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from systems_spark.operators.pagerank import pagerank

M = 1_000_000
EDGES = [(1, 2), (2, 1), (2, 3), (3, 1), (4, 1)]  # 4 -> 1 only; 1<->2<->3 cycle-ish


def _python_pagerank(edges, rounds, d=850_000, seeds=None):
    """One reference implementation for both modes: seeds=None is plain
    PageRank (≡ every node a seed); a seed list is personalized."""
    nodes = sorted({n for e in edges for n in e})
    deg = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    seeds = set(nodes) if seeds is None else set(seeds)
    r = {n: (M if n in seeds else 0) for n in nodes}
    for _ in range(rounds):
        s = {n: 0 for n in nodes}
        for a, b in edges:
            s[b] += r[a] // deg[a]
        r = {n: ((M - d) if n in seeds else 0) + (d * s[n]) // M
             for n in nodes}
    return r


def _spark_pagerank(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {r.node: r.rank_micros for r in pagerank(df, **kw).collect()}


def test_matches_independent_python_iteration(spark):
    for rounds in (1, 3, 8):
        got = _spark_pagerank(spark, EDGES, rounds=rounds)
        assert got == _python_pagerank(EDGES, rounds), rounds


def test_sink_node_accumulates_hub_node_evaporates(spark):
    # 4 has no in-edges: rank decays to base; 1 has three in-edges: top rank
    got = _spark_pagerank(spark, EDGES, rounds=8)
    assert got[4] == M - 850_000
    assert got[1] == max(got.values())


def test_partition_invariance(spark):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    base = {r.node: r.rank_micros for r in pagerank(df, rounds=4).collect()}
    for n in (1, 5):
        got = {r.node: r.rank_micros
               for r in pagerank(df.repartition(n), rounds=4).collect()}
        assert got == base


def test_checkpointing_preserves_values(spark):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    a = {r.node: r.rank_micros for r in pagerank(df, rounds=6).collect()}
    b = {r.node: r.rank_micros
         for r in pagerank(df, rounds=6, checkpoint_every=2).collect()}
    assert a == b


def test_uncached_edges_identical(spark):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    a = {r.node: r.rank_micros for r in pagerank(df, rounds=5).collect()}
    b = {r.node: r.rank_micros
         for r in pagerank(df, rounds=5, cache_edges=False).collect()}
    assert a == b


def test_validation(spark):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    with pytest.raises(ValueError):
        pagerank(df, rounds=0)
    with pytest.raises(ValueError):
        pagerank(df, damping_micros=0)


def test_tol_early_stop_matches_fixed_rounds(spark):
    """VERDICT r4 item 6: on a graph whose integer iteration has reached
    its fixed point, tol-based early stop returns bit-identical ranks to
    the fixed-round schedule (a converged round reproduces itself)."""
    ring = [(i, (i + 1) % 6) for i in range(6)]     # symmetric → converges fast
    edges = spark.createDataFrame(
        ring + [(b, a) for a, b in ring], "src long, dst long")
    fixed = {r.node: r.rank_micros for r in pagerank(edges, rounds=20).collect()}
    stopped = {r.node: r.rank_micros
               for r in pagerank(edges, rounds=20, tol_micros=0,
                                 check_every=2).collect()}
    assert stopped == fixed


def test_tol_early_stop_validation(spark):
    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    import pytest as _pt
    with _pt.raises(ValueError):
        pagerank(edges, tol_micros=-1)


def test_weighted_equal_weights_matches_unweighted(spark):
    """w/Σw is scale-invariant: all-equal weights reproduce the
    unweighted ranks bit-for-bit."""
    ring = [(i, (i + 1) % 5, 7) for i in range(5)] + [(0, 3, 7)]
    ew = spark.createDataFrame(ring, "src long, dst long, w long")
    unw = {r.node: r.rank_micros
           for r in pagerank(ew, rounds=6).collect()}
    wtd = {r.node: r.rank_micros
           for r in pagerank(ew, rounds=6, weight_col="w").collect()}
    assert wtd == unw


def test_weighted_mass_follows_heavy_edge(spark):
    # node 0 sends 9/10 of its mass to 1, 1/10 to 2
    edges = spark.createDataFrame(
        [(0, 1, 9), (0, 2, 1), (1, 0, 1), (2, 0, 1)],
        "src long, dst long, w long")
    got = {r.node: r.rank_micros
           for r in pagerank(edges, rounds=8, weight_col="w").collect()}
    assert got[1] > got[2]


def test_weighted_drops_nonpositive_weights(spark):
    edges = spark.createDataFrame(
        [(0, 1, 5), (0, 2, 0), (0, 3, -2), (1, 0, 1)],
        "src long, dst long, w long")
    got = {r.node: r.rank_micros
           for r in pagerank(edges, rounds=4, weight_col="w").collect()}
    # nodes 2 and 3 only appear via dropped edges -> absent entirely
    assert set(got) == {0, 1}


# --- personalized PageRank (r6) ------------------------------------------


def test_ppr_matches_independent_python_iteration(spark):
    for rounds in (1, 4):
        got = _spark_pagerank(spark, EDGES, rounds=rounds, personalize=[2])
        assert got == _python_pagerank(EDGES, rounds, seeds=[2]), rounds


def test_ppr_mass_localizes_near_seed(spark):
    # path graph 1->2->3->4->5 seeded at 1: rank strictly decays with
    # distance from the seed, and unreachable-from-seed teleport is zero
    path = [(i, i + 1) for i in range(1, 5)]
    got = _spark_pagerank(spark, path, rounds=8, personalize=[1])
    assert got[1] > got[2] > got[3] > got[4] > got[5] >= 0


def test_ppr_all_seeds_equals_plain_pagerank(spark):
    nodes = sorted({n for e in EDGES for n in e})
    plain = _spark_pagerank(spark, EDGES, rounds=6)
    ppr = _spark_pagerank(spark, EDGES, rounds=6, personalize=nodes)
    assert plain == ppr


def test_ppr_matches_duckdb(spark):
    import duckdb

    from systems_spark.operators.pagerank import pagerank_sql

    got = sorted(_spark_pagerank(
        spark, EDGES, rounds=5, personalize=[2, 4]).items())
    vals = ",".join(f"({a},{b})" for a, b in EDGES)
    want = sorted(map(tuple, duckdb.connect().execute(pagerank_sql(
        f"SELECT * FROM (VALUES {vals}) t(src, dst)",
        rounds=5, personalize=[2, 4])).fetchall()))
    assert got == want


def test_ppr_validation(spark):
    import duckdb  # noqa: F401

    from systems_spark.operators.pagerank import pagerank_sql

    with pytest.raises(ValueError):
        _spark_pagerank(spark, EDGES, personalize=[])
    with pytest.raises(ValueError):
        pagerank_sql("SELECT 1 AS src, 2 AS dst", personalize=[])
