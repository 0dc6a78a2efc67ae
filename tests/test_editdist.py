"""Prefix-filtered exact edit-distance join (dedup/editdist.py)."""

import itertools
import os
import random
import string
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from systems_spark.dedup.editdist import edit_join, edit_join_sql


def _df(spark, docs):
    return spark.createDataFrame(docs, "doc_id long, text string")


def _lev(a, b):
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _brute_force(docs, k):
    out = []
    for (i, si), (j, sj) in itertools.combinations(docs, 2):
        if si is None or sj is None or abs(len(si) - len(sj)) > k:
            continue
        d = _lev(si, sj)
        if d <= k:
            a, b = (i, j) if i < j else (j, i)
            out.append((a, b, d, len(si) if a == i else len(sj),
                        len(sj) if a == i else len(si)))
    return sorted(out)


def test_hand_computed_pairs(spark):
    """One substitution passes k=1; two fail; an exact dup is dist 0."""
    docs = [(1, "kitten"), (2, "mitten"), (3, "mutten"), (4, "kitten"),
            (5, "sitting")]
    got = sorted(map(tuple, edit_join(_df(spark, docs), "text", "doc_id",
                                      k=1).collect()))
    assert got == [(1, 2, 1, 6, 6), (1, 4, 0, 6, 6), (2, 3, 1, 6, 6),
                   (2, 4, 1, 6, 6)]


def test_lossless_vs_brute_force_random(spark):
    """The whole point: the prefix filter misses NOTHING on a
    randomized corpus, at k=1 and k=2."""
    random.seed(7)
    alphabet = "abcde"
    docs = [(i, "".join(random.choice(alphabet)
                        for _ in range(random.randint(4, 12))))
            for i in range(80)]
    for k in (1, 2):
        got = sorted(map(tuple, edit_join(
            _df(spark, docs), "text", "doc_id", k=k).collect()))
        assert got == _brute_force(docs, k)


def test_short_strings_covered(spark):
    """Strings below the gram-count bound (no prefix guarantee) are
    still paired exactly via the short bucket — including zero-gram
    1-char strings and totally disjoint grams within k edits."""
    docs = [(1, "ab"), (2, "cd"), (3, "a"), (4, "b"), (5, "abc"),
            (6, "xq")]
    for k in (1, 2):
        got = sorted(map(tuple, edit_join(
            _df(spark, docs), "text", "doc_id", k=k).collect()))
        assert got == _brute_force(docs, k)


def test_hot_gram_prefix_defense(spark):
    """Strings sharing a long hot prefix (the Customer#00000 shape):
    the shared grams are corpus-hot, sort OUT of prefixes, and the
    rare trailing grams drive candidates — result still exact."""
    docs = [(i, f"Customer#{i:09d}") for i in range(1, 120)]
    got = sorted(map(tuple, edit_join(
        _df(spark, docs), "text", "doc_id", k=1).collect()))
    assert got == _brute_force(docs, 1)
    assert (1, 2, 1, 18, 18) in got       # ...001 vs ...002
    assert all(g[2] <= 1 for g in got)


def test_null_text_excluded(spark):
    docs = [(1, "abc"), (2, None), (3, "abd")]
    got = sorted(map(tuple, edit_join(
        _df(spark, docs), "text", "doc_id", k=1).collect()))
    assert got == [(1, 3, 1, 3, 3)]


def test_matches_duckdb_bruteforce_oracle(spark):
    import duckdb

    random.seed(13)
    docs = [(i, "".join(random.choice(string.ascii_lowercase[:6])
                        for _ in range(random.randint(2, 10))))
            for i in range(50)]
    got = sorted(map(tuple, edit_join(
        _df(spark, docs), "text", "doc_id", k=2).collect()))
    vals = ",".join(f"({i}, '{t}')" for i, t in docs)
    want = sorted(map(tuple, duckdb.connect().execute(edit_join_sql(
        f"SELECT * FROM (VALUES {vals}) t(doc_id, text)", "text",
        "doc_id", k=2)).fetchall()))
    assert got == want


def test_validation(spark):
    with pytest.raises(ValueError):
        edit_join(_df(spark, [(1, "a")]), "text", "doc_id", k=0)
    with pytest.raises(ValueError):
        edit_join_sql("SELECT 1", "text", "doc_id", k=1, q=1)
