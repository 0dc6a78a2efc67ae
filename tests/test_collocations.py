"""PMI collocations (operators/collocations.py)."""

import math
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from systems_spark.operators.collocations import (
    pmi_collocations,
    pmi_collocations_sql,
)

TEXTS = ["new york is big", "new york city", "big data spark",
         "data spark new york", "spark data new york city",
         "the big city", "new york new york"] * 3


def _df(spark, texts=TEXTS):
    return spark.createDataFrame([(t,) for t in texts], "text string")


def test_pmi_value_matches_independent_math(spark):
    """PMI of ('data','spark') recomputed with python math.log from
    hand-counted frequencies — an independent formula leg, not the
    DuckDB twin."""
    got = {(r.w1, r.w2): r for r in pmi_collocations(
        _df(spark), "text", min_count=3, top_k=50).collect()}
    r = got[("data", "spark")]
    # counts: 'data spark' bigram 6; data 9, spark 9 unigrams
    assert (r.n_pair, r.n_w1, r.n_w2) == (6, 9, 9)
    n_uni = sum(len(t.split()) for t in TEXTS)
    n_bi = sum(len(t.split()) - 1 for t in TEXTS)
    want = round(math.log((6 * n_uni * n_uni) / (n_bi * 9 * 9)) * 1e6)
    assert r.pmi_micros == want


def test_strong_collocation_outranks_chance_pair(spark):
    """'new york' (always adjacent) must outrank 'data new' (chance
    adjacency of two frequent words)."""
    rows = pmi_collocations(_df(spark), "text", min_count=3,
                            top_k=50).collect()
    order = [(r.w1, r.w2) for r in rows]
    assert order.index(("new", "york")) < order.index(("data", "new"))


def test_min_count_floors_rare_pairs(spark):
    """A once-seen pair of two rare words has the HIGHEST raw PMI —
    min_count must exclude it."""
    texts = TEXTS + ["zyx qwv"]
    rows = pmi_collocations(_df(spark, texts), "text", min_count=2,
                            top_k=50).collect()
    assert ("zyx", "qwv") not in {(r.w1, r.w2) for r in rows}
    rows1 = pmi_collocations(_df(spark, texts), "text", min_count=1,
                             top_k=5).collect()
    assert (rows1[0].w1, rows1[0].w2) == ("zyx", "qwv")


def test_matches_duckdb_bit_for_bit(spark):
    import duckdb

    got = [tuple(r) for r in pmi_collocations(
        _df(spark), "text", min_count=3, top_k=10).collect()]
    vals = ",".join(f"('{t}')" for t in TEXTS)
    want = duckdb.connect().execute(pmi_collocations_sql(
        f"SELECT * FROM (VALUES {vals}) t(text)", "text",
        min_count=3, top_k=10)).fetchall()
    assert got == want


def test_validation(spark):
    with pytest.raises(ValueError):
        pmi_collocations(_df(spark), "text", min_count=0)
    with pytest.raises(ValueError):
        pmi_collocations(_df(spark), "text", top_k=0)
    with pytest.raises(ValueError):
        pmi_collocations_sql("SELECT 1", "text", min_count=0)
