"""Within-group path n-grams (operators/paths.py)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from systems_spark.operators.paths import path_ngrams, path_ngrams_sql


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "g long, ts long, tok string")


def _python_ngrams(rows, n):
    """Independent reference: per-group sort + sliding window."""
    from collections import defaultdict

    groups = defaultdict(list)
    for g, ts, tok in rows:
        if tok is not None:
            groups[g].append((ts, tok))
    out = defaultdict(int)
    for g, evs in groups.items():
        toks = [t for _, t in sorted(evs)]
        for i in range(len(toks) - n + 1):
            out[">".join(toks[i:i + n])] += 1
    return dict(out)


def test_paths_respect_group_boundaries(spark):
    rows = [(1, 1, "view"), (1, 2, "click"), (1, 3, "buy"),
            (2, 1, "click"), (2, 2, "buy"), (2, 3, "view")]
    got = {r.path: r.n_paths
           for r in path_ngrams(_df(spark, rows), ["g"], ["ts"],
                                "tok", n=3).collect()}
    # no gram spans groups: exactly one trigram per 3-event group
    assert got == {"view>click>buy": 1, "click>buy>view": 1}
    assert got == _python_ngrams(rows, 3)


def test_unigrams_equal_token_counts_and_nulls_drop(spark):
    rows = [(1, 1, "a"), (1, 2, None), (1, 3, "a"), (2, 1, "b")]
    got = {r.path: r.n_paths
           for r in path_ngrams(_df(spark, rows), ["g"], ["ts"],
                                "tok", n=1).collect()}
    assert got == {"a": 2, "b": 1}
    # NULL token is a non-event: the bigram bridges across it
    got2 = {r.path: r.n_paths
            for r in path_ngrams(_df(spark, rows), ["g"], ["ts"],
                                 "tok", n=2).collect()}
    assert got2 == {"a>a": 1}
    assert got2 == _python_ngrams(rows, 2)


def test_matches_python_reference_random(spark):
    import random

    random.seed(7)
    toks = ["v", "c", "p", "e"]
    rows = [(random.randint(1, 6), i, random.choice(toks))
            for i in range(120)]
    for n in (2, 3):
        got = {r.path: r.n_paths
               for r in path_ngrams(_df(spark, rows), ["g"], ["ts"],
                                    "tok", n=n).collect()}
        assert got == _python_ngrams(rows, n)


def test_matches_duckdb_twin(spark):
    import duckdb
    import random

    random.seed(13)
    rows = [(random.randint(1, 4), i, random.choice(["x", "y", "z"]))
            for i in range(60)]
    got = sorted(map(tuple, path_ngrams(
        _df(spark, rows), ["g"], ["ts"], "tok", n=3).collect()))
    vals = ",".join(f"({g},{ts},'{t}')" for g, ts, t in rows)
    want = sorted(map(tuple, duckdb.connect().execute(path_ngrams_sql(
        f"SELECT * FROM (VALUES {vals}) t(g, ts, tok)",
        ["g"], ["ts"], "tok", n=3)).fetchall()))
    assert got == want


def test_validation(spark):
    df = _df(spark, [(1, 1, "a")])
    with pytest.raises(ValueError):
        path_ngrams(df, ["g"], ["ts"], "tok", n=0)
    with pytest.raises(ValueError):
        path_ngrams(df, [], ["ts"], "tok")
    with pytest.raises(ValueError):
        path_ngrams_sql("SELECT 1", ["g"], [], "tok")
