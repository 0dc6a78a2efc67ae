"""Winnowing fingerprints (dedup/winnow.py)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from systems_spark.dedup.winnow import winnow_pairs, winnow_pairs_sql

RUN = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens


def _pairs(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {(r.doc_a, r.doc_b): r.n_shared
            for r in winnow_pairs(df, **kw).collect()}


def test_shared_run_guarantee(spark):
    """Docs sharing a >= w+k-1 token verbatim run share >= 1 fingerprint,
    REGARDLESS of where the run sits in each document (position-robust —
    the property rolling whole-doc fingerprints lack)."""
    rows = [(1, f"{RUN} unrelated tail words here"),
            (2, f"completely different opening that runs long {RUN}"),
            (3, "no shared content in this document at all whatsoever")]
    got = _pairs(spark, rows, k=4, w=4, min_shared=1)
    assert (1, 2) in got
    assert all(3 not in p for p in got)


def test_short_docs_and_validation(spark):
    # < k+w-1 tokens: no full window, no fingerprints, no pairs
    rows = [(1, "tiny doc"), (2, "tiny doc")]
    assert _pairs(spark, rows, k=4, w=4, min_shared=1) == {}
    df = spark.createDataFrame(rows, "doc_id long, text string")
    with pytest.raises(ValueError):
        winnow_pairs(df, k=0)
    with pytest.raises(ValueError):
        winnow_pairs(df, min_shared=0)


def test_matches_duckdb(spark):
    import duckdb

    rows = [(1, f"{RUN} tail one"), (2, f"lead text {RUN}"),
            (3, f"{RUN} {RUN}"), (4, "nothing in common here truly " * 3),
            (5, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(map(tuple, winnow_pairs(df, k=4, w=4, min_shared=1).collect()))
    vals = ",".join(
        f"({i}, " + ("NULL" if t is None else f"'{t}'") + ")" for i, t in rows)
    want = sorted(map(tuple, duckdb.connect().execute(winnow_pairs_sql(
        f"SELECT * FROM (VALUES {vals}) t(id, text)",
        k=4, w=4, min_shared=1)).fetchall()))
    assert got == want and len(got) >= 3
