"""Sorted-neighborhood candidate pairs (dedup/sorted_neighborhood.py)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from systems_spark.dedup.sorted_neighborhood import sn_pairs, sn_pairs_sql


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, block_key string")


def test_hand_computed_window(spark):
    """Sorted keys a<b<c<d<e, window=3: each row pairs with its 2
    successors in key order — and NOTHING else."""
    rows = [(1, "a"), (2, "b"), (3, "c"), (4, "d"), (5, "e")]
    got = sorted((r.doc_a, r.doc_b) for r in
                 sn_pairs(_docs(spark, rows), "block_key", "doc_id",
                          window=3).collect())
    assert got == [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4), (3, 5), (4, 5)]


def test_candidate_volume_is_linear_even_with_identical_keys(spark):
    """100 docs sharing ONE blocking key: candidates stay at
    (w-1)·n − triangle, never C(n,2) — the no-hot-bucket guarantee the
    LSH families need caps for."""
    rows = [(i, "same") for i in range(100)]
    n = sn_pairs(_docs(spark, rows), "block_key", "doc_id",
                 window=4).count()
    assert n == 3 * 100 - (1 + 2 + 3)  # 294, not 4950


def test_null_keys_excluded_and_ties_deterministic(spark):
    """NULL keys never appear in pairs; equal keys order by doc_id, so
    the pair set is reproducible run-over-run."""
    rows = [(10, None), (3, "x"), (1, "x"), (2, "x")]
    got1 = sorted(map(tuple, sn_pairs(
        _docs(spark, rows), "block_key", "doc_id", window=2).collect()))
    got2 = sorted(map(tuple, sn_pairs(
        _docs(spark, rows), "block_key", "doc_id", window=2).collect()))
    assert got1 == got2
    assert got1 == [(1, 2, "x", "x"), (2, 3, "x", "x")]


def test_matches_duckdb(spark):
    import duckdb

    rows = [(i, f"k{(i * 37) % 11}") for i in range(60)]
    got = sorted(map(tuple, sn_pairs(
        _docs(spark, rows), "block_key", "doc_id", window=4).collect()))
    vals = ",".join(f"({i}, '{k}')" for i, k in rows)
    want = sorted(map(tuple, duckdb.connect().execute(sn_pairs_sql(
        f"SELECT * FROM (VALUES {vals}) t(doc_id, block_key)",
        "block_key", "doc_id", window=4)).fetchall()))
    assert got == want


def test_validation(spark):
    with pytest.raises(ValueError):
        sn_pairs(_docs(spark, [(1, "a")]), "block_key", "doc_id", window=1)
    with pytest.raises(ValueError):
        sn_pairs_sql("SELECT 1", "k", "i", window=0)


def test_multipass_families_transitive_closure(spark):
    """A 6-doc equal-key run with window=3: SN emits only near pairs,
    but connected components still collapse all six into ONE family —
    the property that lets the window stay small."""
    from systems_spark.dedup.clusters import canonical_documents
    from pyspark.sql import functions as F

    rows = [(i, "dup") for i in range(6)] + [(10, "aaa"), (11, "zzz")]
    pairs = (sn_pairs(_docs(spark, rows), "block_key", "doc_id", window=3)
             .where(F.col("key_a") == F.col("key_b"))
             .select("doc_a", "doc_b"))
    fams = {r.doc_id: (r.canonical_id, r.cluster_size)
            for r in canonical_documents(pairs, a_col="doc_a",
                                         b_col="doc_b").collect()}
    assert fams == {i: (0, 6) for i in range(6)}


def test_equal_key_star_component_equivalence(spark):
    """r13: sn_equal_key_star must resolve to EXACTLY the families the
    windowed equal-key pair set resolves to — same node set, same
    canonical ids, same cluster sizes — across runs of every size,
    multiple keys, singletons and NULL keys, and for every window ≥ 2
    (the star does not depend on the window; the pair set does)."""
    from pyspark.sql import functions as F

    from systems_spark.dedup.clusters import canonical_documents
    from systems_spark.dedup.sorted_neighborhood import sn_equal_key_star

    rows = ([(i, "run6") for i in range(6)]
            + [(i, "run2") for i in (20, 21)]
            + [(30, "solo"), (31, None), (32, None)]
            + [(i, "run9") for i in range(40, 49)])
    docs = _docs(spark, rows)

    def fams(pairs):
        return {r.doc_id: (r.canonical_id, r.cluster_size)
                for r in canonical_documents(
                    pairs, a_col="doc_a", b_col="doc_b").collect()}

    star = fams(sn_equal_key_star(docs, "block_key", "doc_id"))
    for window in (2, 3, 4):
        matched = (sn_pairs(docs, "block_key", "doc_id", window=window)
                   .where(F.col("key_a") == F.col("key_b"))
                   .select("doc_a", "doc_b"))
        assert fams(matched) == star, f"window={window}"
    # sanity on the star itself: runs collapse, singles/NULLs never appear
    assert star[0] == (0, 6) and star[45] == (40, 9) and star[20] == (20, 2)
    assert 30 not in star and 31 not in star
