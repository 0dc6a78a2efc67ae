"""Multi-source BFS distances (operators/bfs.py) and item-based CF
scoring (operators/item_knn.py item_cf_recommend)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from systems_spark.operators.bfs import bfs_distances, bfs_distances_sql
from systems_spark.operators.item_knn import (
    item_cf_recommend,
    item_cf_recommend_sql,
    item_knn,
    item_knn_sql,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def _seeds(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "node long")


def test_bfs_hand_computed(spark):
    """Path 1→2→3→4 plus a shortcut 1→3: dist(3)=1 (min over paths),
    4 at dist 2, isolated 9 absent, unreachable-within-hops absent."""
    e = _edges(spark, [(1, 2), (2, 3), (3, 4), (1, 3), (4, 5), (8, 9)])
    got = {r.node: r.dist
           for r in bfs_distances(e, _seeds(spark, [1]), 2).collect()}
    assert got == {1: 0, 2: 1, 3: 1, 4: 2}


def test_bfs_multi_source_and_seed_only(spark):
    e = _edges(spark, [(1, 2), (5, 6)])
    got = {r.node: r.dist
           for r in bfs_distances(e, _seeds(spark, [1, 5]), 1).collect()}
    assert got == {1: 0, 5: 0, 2: 1, 6: 1}
    # max_hops=0: seeds only, even seeds absent from the graph
    got0 = {r.node: r.dist
            for r in bfs_distances(e, _seeds(spark, [1, 42]), 0).collect()}
    assert got0 == {1: 0, 42: 0}


def test_bfs_early_stop_on_exhausted_frontier(spark):
    """A graph fully covered in 1 hop must not pay 10 rounds (the
    frontier empties and the loop breaks — verified by the result
    being complete and correct)."""
    e = _edges(spark, [(1, 2), (2, 1)])
    got = {r.node: r.dist
           for r in bfs_distances(e, _seeds(spark, [1]), 10).collect()}
    assert got == {1: 0, 2: 1}


def test_bfs_matches_duckdb(spark):
    import duckdb

    pairs = [((i * 7) % 23, (i * 11 + 3) % 23) for i in range(60)]
    got = sorted(map(tuple, bfs_distances(
        _edges(spark, pairs), _seeds(spark, [0, 1]), 3).collect()))
    vals = ",".join(f"({a}, {b})" for a, b in pairs)
    want = sorted(map(tuple, duckdb.connect().execute(bfs_distances_sql(
        f"SELECT * FROM (VALUES {vals}) t(src, dst)",
        "SELECT * FROM (VALUES (0), (1)) s(node)", 3)).fetchall()))
    assert got == want


def test_bfs_validation(spark):
    with pytest.raises(ValueError):
        bfs_distances(_edges(spark, [(1, 2)]), _seeds(spark, [1]), -1)
    with pytest.raises(ValueError):
        bfs_distances_sql("SELECT 1", "SELECT 1", -1)


# --- item-based CF scoring ----------------------------------------------


def test_item_cf_hand_computed(spark):
    """User u1 owns {a}; a's neighbors are b (sim² 750000). u1 gets b
    recommended with that score; b is NOT recommended to u2 who already
    owns it."""
    baskets = spark.createDataFrame(
        [(1, "a"), (1, "b"), (1, "c"), (2, "a"), (2, "b"), (3, "a"),
         (3, "b"), (4, "b"), (4, "c")], "b long, i string")
    nbr = item_knn(baskets, "b", "i", k=5, min_cooc=2)
    hist = spark.createDataFrame([(10, "a"), (20, "a"), (20, "b")],
                                 "u long, i string")
    got = {(r.u, r.i): (r.score_micros, r.n_contributors, r.rec_rank)
           for r in item_cf_recommend(hist, nbr, "u", "i",
                                      top_n=3).collect()}
    # u=10 owns a → recommended b (a's only neighbor). u=20 owns a AND b
    # → b filtered out; c is b's neighbor (sim² 500000)
    assert got == {(10, "b"): (750000, 1, 1),
                   (20, "c"): (500000, 1, 1)}


def test_item_cf_scores_sum_over_contributors(spark):
    """A candidate reachable from TWO history items sums both sims and
    reports n_contributors=2."""
    nbr = spark.createDataFrame(
        [("a", "x", 400000), ("b", "x", 300000), ("a", "y", 350000)],
        "item string, neighbor string, sim2_micros long")
    hist = spark.createDataFrame([(1, "a"), (1, "b")], "u long, i string")
    got = {(r.u, r.i): (r.score_micros, r.n_contributors, r.rec_rank)
           for r in item_cf_recommend(hist, nbr, "u", "i",
                                      top_n=2).collect()}
    assert got == {(1, "x"): (700000, 2, 1), (1, "y"): (350000, 1, 2)}


def test_item_cf_matches_duckdb(spark):
    import duckdb

    baskets = [(b, f"i{(b * 3 + j) % 6}") for b in range(10)
               for j in range(3)]
    hist = [(u, f"i{(u + j) % 6}") for u in range(5) for j in range(2)]
    bdf = spark.createDataFrame(baskets, "b long, i string")
    hdf = spark.createDataFrame(hist, "u long, i string")
    nbr = item_knn(bdf, "b", "i", k=3, min_cooc=2)
    got = sorted(map(tuple, item_cf_recommend(
        hdf, nbr, "u", "i", top_n=2).collect()))
    bvals = ",".join(f"({b}, '{i}')" for b, i in baskets)
    hvals = ",".join(f"({u}, '{i}')" for u, i in hist)
    nbr_sql = item_knn_sql(f"SELECT * FROM (VALUES {bvals}) t(b, i)",
                           "b", "i", k=3, min_cooc=2)
    want = sorted(map(tuple, duckdb.connect().execute(
        item_cf_recommend_sql(
            f"SELECT * FROM (VALUES {hvals}) t(u, i)", nbr_sql,
            "u", "i", top_n=2)).fetchall()))
    assert got == want


def test_item_cf_validation(spark):
    hist = spark.createDataFrame([(1, "a")], "u long, i string")
    nbr = spark.createDataFrame([("a", "b", 1)],
                                "item string, neighbor string, sim2_micros long")
    with pytest.raises(ValueError):
        item_cf_recommend(hist, nbr, "u", "i", top_n=0)
    with pytest.raises(ValueError):
        item_cf_recommend_sql("SELECT 1", "SELECT 1", "u", "i", top_n=0)


# --- streaming CMS ------------------------------------------------------


def test_streaming_cms_counters_match_batch(spark, tmp_path):
    """The drained streaming counter table equals the batch build over
    the same rows bit-for-bit (the delegation guarantee)."""
    import uuid

    from systems_spark.functions.sketches import cms_counters
    from systems_spark.streaming import streaming_cms_counters

    rows = [((k * 13) % 40,) for k in range(500)]
    src = str(tmp_path / "keys")
    spark.createDataFrame(rows, "key long").write.parquet(src)
    batch = sorted(map(tuple, cms_counters(
        spark.read.parquet(src), "key", depth=3, width=256).collect()))

    stream = (spark.readStream.schema("key long").parquet(src))
    name = "t_stream_cms_" + uuid.uuid4().hex[:8]
    q = (streaming_cms_counters(stream, "key", depth=3, width=256)
         .writeStream.outputMode("complete").format("memory")
         .queryName(name).trigger(availableNow=True).start())
    assert q.awaitTermination(120)
    drained = sorted(map(tuple, spark.table(name).collect()))
    assert drained == batch
