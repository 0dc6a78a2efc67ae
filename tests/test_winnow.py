"""Winnowing fingerprints (dedup/winnow.py)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from systems_spark.dedup.winnow import (
    winnow_fingerprints,
    winnow_pairs,
    winnow_pairs_sql,
)

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


# --- max_doc_freq hot-fingerprint cap (VERDICT r5 item 1) ----------------

BOILER = ("standard licence header shared by every single document verbatim "
          "all rights reserved no warranty of any kind express or implied")
CAP_ROWS = (
    # 12 IDENTICAL boilerplate docs: every fingerprint they produce has
    # doc-freq 12 (identical text → identical window minima) ...
    [(i, BOILER) for i in range(1, 13)]
    # ... plus one genuine pair sharing a RARE run (doc freq 2 <= cap)
    + [(100, f"{RUN} own tail"), (101, f"other lead {RUN}")]
)


def test_capped_equals_uncapped_minus_dropped_fingerprints(spark):
    """The defining property of the cap: pair counts from the surviving
    fingerprints ONLY — recomputed brute-force from the fingerprint
    table — equal the capped operator's output exactly."""
    from collections import Counter

    df = spark.createDataFrame(CAP_ROWS, "doc_id long, text string")
    cap = 5
    fps = winnow_fingerprints(df, k=4, w=4).collect()
    freq = Counter(r._fp for r in fps)
    surviving = [(r._wn_id, r._fp) for r in fps if freq[r._fp] <= cap]
    want = Counter()
    by_fp = {}
    for doc, fp in surviving:
        by_fp.setdefault(fp, []).append(doc)
    for docs in by_fp.values():
        for a in docs:
            for b in docs:
                if a < b:
                    want[(a, b)] += 1
    want = {p: n for p, n in want.items() if n >= 1}
    got = _pairs(spark, CAP_ROWS, k=4, w=4, min_shared=1, max_doc_freq=cap)
    assert got == want


def test_skew_fixture_bounded_pair_output(spark):
    """1 hot run × many docs: uncapped output is quadratic (C(n,2) pairs
    from the boilerplate alone); capped output contains NO boilerplate
    pair yet keeps the genuine rare-run pair."""
    got = _pairs(spark, CAP_ROWS, k=4, w=4, min_shared=1, max_doc_freq=5)
    assert (100, 101) in got
    assert all(a >= 100 for a, b in got)  # every boilerplate pair dropped
    uncapped = _pairs(spark, CAP_ROWS, k=4, w=4, min_shared=1)
    assert len(uncapped) >= 66  # C(12,2) boilerplate pairs present


def test_capped_matches_duckdb(spark):
    import duckdb

    df = spark.createDataFrame(CAP_ROWS, "doc_id long, text string")
    got = sorted(map(tuple, winnow_pairs(
        df, k=4, w=4, min_shared=1, max_doc_freq=5).collect()))
    vals = ",".join(f"({i}, '{t}')" for i, t in CAP_ROWS)
    want = sorted(map(tuple, duckdb.connect().execute(winnow_pairs_sql(
        f"SELECT * FROM (VALUES {vals}) t(id, text)",
        k=4, w=4, min_shared=1, max_doc_freq=5)).fetchall()))
    assert got == want and (100, 101) in {(a, b) for a, b, _ in got}


def test_max_doc_freq_validation(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError):
        winnow_pairs(df, max_doc_freq=0)
    with pytest.raises(ValueError):
        winnow_pairs_sql("SELECT 1 AS id, 'x' AS text", max_doc_freq=0)


def test_winnow_incremental_pairs_match_full(spark):
    """incremental pairs == full winnow_pairs restricted to pairs
    touching a new doc, with EXACT n_shared (no double count for
    new×new pairs); standing ∪ delta == full pair set."""
    from pyspark.sql import functions as F

    from systems_spark.dedup.winnow import (winnow_fingerprints,
                                            winnow_incremental_pairs,
                                            winnow_pairs)

    run = "alpha beta gamma delta epsilon zeta eta theta"
    docs = spark.createDataFrame(
        [(0, f"{run} one"), (1, f"{run} two"), (2, f"prefix {run}"),
         (3, "totally unrelated words here none shared"),
         (4, f"{run} four"), (5, f"another {run} tail")],
        "doc_id long, text string")
    kw = dict(k=3, w=3, min_shared=1)
    split = 3  # 0-2 standing, 3-5 arriving
    corpus = docs.where(F.col("doc_id") < split)
    batch = docs.where(F.col("doc_id") >= split)
    full = {(r.doc_a, r.doc_b): r.n_shared
            for r in winnow_pairs(docs, **kw).collect()}
    standing = {(r.doc_a, r.doc_b): r.n_shared
                for r in winnow_pairs(corpus, **kw).collect()}
    fps = winnow_fingerprints(corpus, k=3, w=3)
    delta = {(r.doc_a, r.doc_b): r.n_shared
             for r in winnow_incremental_pairs(fps, batch, **kw).collect()}
    want_delta = {p: n for p, n in full.items() if p[1] >= split}
    assert delta == want_delta
    assert not (set(standing) & set(delta))
    assert {**standing, **delta} == full
