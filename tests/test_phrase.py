"""Exact phrase search over positional postings (operators/phrase.py)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from systems_spark.operators.phrase import phrase_search, phrase_search_sql


def _frames(spark, docs, queries):
    d = spark.createDataFrame(docs, "doc_id long, text string")
    q = spark.createDataFrame(queries, "query_id long, query_text string")
    return d, q


def _python_phrase(docs, queries):
    """Independent reference: sliding-window scan over token lists."""
    out = {}
    for qid, qtext in queries:
        ph = qtext.split()
        if not ph:
            continue
        for did, text in docs:
            tk = text.split()
            n = sum(1 for s in range(len(tk) - len(ph) + 1)
                    if tk[s:s + len(ph)] == ph)
            if n:
                out[(qid, did)] = n
    return out


def test_basic_counts_and_order_sensitivity(spark):
    docs = [(1, "slow scan filter makes the slow scan filter slow"),
            (2, "filter scan slow"),           # right words, wrong order
            (3, "slow scan while filter")]     # not adjacent
    queries = [(1, "slow scan filter")]
    d, q = _frames(spark, docs, queries)
    got = {(r.query_id, r.doc_id): r.n_matches
           for r in phrase_search(d, q).collect()}
    assert got == {(1, 1): 2}
    assert got == _python_phrase(docs, queries)


def test_repeated_terms_and_overlaps(spark):
    docs = [(1, "a a a a"), (2, "a b a"), (3, "b b")]
    queries = [(1, "a a"), (2, "a a a"), (3, "b")]
    d, q = _frames(spark, docs, queries)
    got = {(r.query_id, r.doc_id): r.n_matches
           for r in phrase_search(d, q).collect()}
    # overlapping occurrences each count; 1-word phrase == tf
    assert got == {(1, 1): 3, (2, 1): 2, (3, 2): 1, (3, 3): 2}
    assert got == _python_phrase(docs, queries)


def test_no_match_and_multi_query(spark):
    docs = [(1, "x y z")]
    queries = [(1, "y z"), (2, "z y"), (3, "w")]
    d, q = _frames(spark, docs, queries)
    got = {(r.query_id, r.doc_id): r.n_matches
           for r in phrase_search(d, q).collect()}
    assert got == {(1, 1): 1}


def test_matches_python_reference_random(spark):
    import random

    random.seed(11)
    vocab = ["a", "b", "c", "d"]
    docs = [(i, " ".join(random.choice(vocab) for _ in range(30)))
            for i in range(12)]
    queries = [(j, " ".join(random.choice(vocab)
                            for _ in range(random.randint(1, 3))))
               for j in range(8)]
    d, q = _frames(spark, docs, queries)
    got = {(r.query_id, r.doc_id): r.n_matches
           for r in phrase_search(d, q).collect()}
    assert got == _python_phrase(docs, queries)


def test_matches_duckdb_twin(spark):
    import duckdb
    import random

    random.seed(3)
    vocab = ["a", "b", "c"]
    docs = [(i, " ".join(random.choice(vocab) for _ in range(25)))
            for i in range(10)]
    queries = [(1, "a b"), (2, "c c"), (3, "a b c"), (4, "b")]
    d, q = _frames(spark, docs, queries)
    got = sorted(map(tuple, phrase_search(d, q).collect()))
    dvals = ",".join(f"({i},'{t}')" for i, t in docs)
    qvals = ",".join(f"({i},'{t}')" for i, t in queries)
    want = sorted(map(tuple, duckdb.connect().execute(phrase_search_sql(
        f"SELECT * FROM (VALUES {dvals}) t(doc_id, text)",
        f"SELECT * FROM (VALUES {qvals}) t(query_id, query_text)",
    )).fetchall()))
    assert got == want
