"""Prefix-filtered exact set-similarity join (dedup/setjoin.py)."""

import itertools
import os
import random
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from systems_spark.dedup.setjoin import jaccard_join, jaccard_join_sql


def _df(spark, docs):
    return spark.createDataFrame(docs, "doc_id long, text string")


def _brute_force(docs, t):
    out = []
    for (i, ti), (j, tj) in itertools.combinations(docs, 2):
        a, b = (i, j) if i < j else (j, i)
        A, B = set(ti.split()), set(tj.split())
        inter = len(A & B)
        union = len(A) + len(B) - inter
        if union and inter * 1_000_000 >= round(t * 1_000_000) * union:
            out.append((a, b))
    return sorted(out)


def test_hand_computed_pairs(spark):
    """4/5 shared tokens = J 2/3 passes t=0.5; 2/5 shared = J 0.25
    fails; exact duplicate = J 1.0."""
    docs = [(1, "a b c d e"), (2, "a b c d x"), (3, "a b y z w"),
            (4, "a b c d e")]
    got = {(r.a, r.b): (r.inter, r.size_a, r.size_b, r.jaccard)
           for r in jaccard_join(_df(spark, docs), "text", "doc_id",
                                 0.5).collect()}
    assert set(got) == {(1, 2), (1, 4), (2, 4)}
    assert got[(1, 4)] == (5, 5, 5, 1.0)
    assert got[(1, 2)][:3] == (4, 5, 5)


def test_lossless_vs_brute_force_random(spark):
    """The whole point: the prefix filter misses NOTHING on a
    randomized corpus, at two thresholds."""
    random.seed(11)
    vocab = [f"w{i}" for i in range(25)]
    docs = [(i, " ".join(random.sample(vocab, random.randint(3, 14))))
            for i in range(60)]
    for t in (0.4, 0.7):
        got = sorted((r.a, r.b) for r in jaccard_join(
            _df(spark, docs), "text", "doc_id", t).collect())
        assert got == _brute_force(docs, t)


def test_hot_token_does_not_blow_up_prefixes(spark):
    """A stopword shared by EVERY doc sorts last in the global
    frequency order and never enters a 1-token prefix, so docs
    unrelated except for the stopword produce no candidate pair."""
    docs = [(i, f"the u{i} v{i} w{i}") for i in range(50)]
    got = jaccard_join(_df(spark, docs), "text", "doc_id", 0.5).collect()
    assert got == []


def test_matches_duckdb_bruteforce_oracle(spark):
    import duckdb

    random.seed(3)
    vocab = [f"t{i}" for i in range(20)]
    docs = [(i, " ".join(random.sample(vocab, random.randint(4, 10))))
            for i in range(40)]
    got = sorted(map(tuple, jaccard_join(
        _df(spark, docs), "text", "doc_id", 0.5).collect()))
    vals = ",".join(f"({i}, '{t}')" for i, t in docs)
    want = sorted(map(tuple, duckdb.connect().execute(jaccard_join_sql(
        f"SELECT * FROM (VALUES {vals}) t(doc_id, text)", "text",
        "doc_id", 0.5)).fetchall()))
    assert got == want


def test_threshold_one_is_exact_dup_only(spark):
    docs = [(1, "a b c"), (2, "a b c"), (3, "a b c d")]
    got = sorted((r.a, r.b) for r in jaccard_join(
        _df(spark, docs), "text", "doc_id", 1.0).collect())
    assert got == [(1, 2)]


def test_validation(spark):
    with pytest.raises(ValueError):
        jaccard_join(_df(spark, [(1, "a")]), "text", "doc_id", 0.0)
    with pytest.raises(ValueError):
        jaccard_join_sql("SELECT 1", "text", "doc_id", 1.5)


def test_shingle_mode_matches_brute_force(spark):
    """shingle_k=3 feature space: brute-force equality (python) and
    DuckDB parity; token-mode pairs that only share unordered words do
    NOT appear (order sensitivity)."""
    import duckdb

    docs = [(1, "a b c d e f"), (2, "a b c d e f"),  # exact dup
            (3, "f e d c b a"),                      # same tokens, reversed
            (4, "a b c d e x"), (5, "q r s t u v")]
    got = sorted(map(tuple, jaccard_join(
        _df(spark, docs), "text", "doc_id", 0.5, shingle_k=3).collect()))
    vals = ",".join(f"({i}, '{t}')" for i, t in docs)
    want = sorted(map(tuple, duckdb.connect().execute(jaccard_join_sql(
        f"SELECT * FROM (VALUES {vals}) t(doc_id, text)", "text",
        "doc_id", 0.5, shingle_k=3)).fetchall()))
    assert got == want
    pairs = [(g[0], g[1]) for g in got]
    assert (1, 2) in pairs        # exact dup: all shingles shared
    assert (1, 3) not in pairs    # reversed: same tokens, no shingles
    with pytest.raises(ValueError):
        jaccard_join(_df(spark, docs), "text", "doc_id", 0.5, shingle_k=0)
