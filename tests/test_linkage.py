"""Fellegi–Sunter linkage: hand-computed scores, missing-field zero
weight, decision thresholds, and Spark↔DuckDB twin equality."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from systems_spark.operators import fellegi_sunter_scores, fellegi_sunter_sql

FIELDS = [
    ("city", ("exact",), 2_000_000, -1_000_000),
    ("name", ("prefix", 3), 3_000_000, -2_000_000),
    ("age", ("abs_band", 2), 1_500_000, -500_000),
]


def _records(spark):
    return spark.createDataFrame(
        [(1, "berlin", "anna-k", 30),
         (2, "berlin", "annette", 31),   # city=, prefix 'ann'=, age band=
         (3, "munich", "bob", 60),       # all disagree vs 1
         (4, None, "annika", 29)],       # city missing vs anyone
        "rid long, city string, name string, age long")


def test_hand_computed_scores_and_decisions(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4)], "a long, b long")
    got = {(r.a, r.b): r for r in fellegi_sunter_scores(
        _records(spark), pairs, "rid", FIELDS,
        upper_micros=4_000_000, lower_micros=0).collect()}
    r12 = got[(1, 2)]
    assert (r12.city_agree, r12.name_agree, r12.age_agree) == (1, 1, 1)
    assert r12.score_micros == 6_500_000 and r12.decision == "match"
    r13 = got[(1, 3)]
    assert r13.score_micros == -3_500_000 and r13.decision == "non-match"
    r14 = got[(1, 4)]
    # city missing → zero weight; 'anna-k' vs 'annika' share 'ann';
    # |30-29| ≤ 2
    assert r14.city_agree is None
    assert r14.score_micros == 4_500_000 and r14.decision == "match"


def test_sql_twin_matches_bit_for_bit(spark):
    import duckdb

    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3)], "a long, b long")
    got = sorted(tuple(r) for r in fellegi_sunter_scores(
        _records(spark), pairs, "rid", FIELDS,
        upper_micros=4_000_000, lower_micros=0).collect())
    recs_sql = ("SELECT * FROM (VALUES "
                "(1, 'berlin', 'anna-k', 30), "
                "(2, 'berlin', 'annette', 31), "
                "(3, 'munich', 'bob', 60), "
                "(4, NULL, 'annika', 29)) t(rid, city, name, age)")
    pairs_sql = ("SELECT * FROM (VALUES (1, 2), (1, 3), (1, 4), (2, 3))"
                 " t(a, b)")
    sql = fellegi_sunter_sql(recs_sql, pairs_sql, "rid", FIELDS,
                             upper_micros=4_000_000, lower_micros=0)
    want = sorted(tuple(r) for r in duckdb.sql(sql).fetchall())
    assert got == want


def test_validation(spark):
    pairs = spark.createDataFrame([(1, 2)], "a long, b long")
    with pytest.raises(ValueError, match="fields"):
        fellegi_sunter_scores(_records(spark), pairs, "rid", [])
    with pytest.raises(ValueError, match="comparator"):
        fellegi_sunter_scores(_records(spark), pairs, "rid",
                              [("city", ("soundex",), 1, -1)])


def test_lev_band_comparator_and_twin(spark):
    """Levenshtein-band agreement (the fuzzy-string comparator): exact
    integer edit distance in both engines, missing = NULL evidence."""
    import duckdb

    recs = spark.createDataFrame(
        [(1, "jonathan"), (2, "jonathon"), (3, "bill"), (4, None)],
        "rid long, name string")
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4)], "a long, b long")
    fields = [("name", ("lev_band", 1), 1_000_000, -1_000_000)]
    got = {(r.a, r.b): (r.name_agree, r.score_micros)
           for r in fellegi_sunter_scores(recs, pairs, "rid",
                                          fields).collect()}
    assert got[(1, 2)] == (1, 1_000_000)   # distance 1
    assert got[(1, 3)] == (0, -1_000_000)  # far apart
    assert got[(1, 4)] == (None, 0)        # missing side
    sql = fellegi_sunter_sql(
        "SELECT * FROM (VALUES (1, 'jonathan'), (2, 'jonathon'), "
        "(3, 'bill'), (4, NULL)) t(rid, name)",
        "SELECT * FROM (VALUES (1, 2), (1, 3), (1, 4)) t(a, b)",
        "rid", fields)
    want = {(a, b): (f, s) for a, b, f, s in duckdb.sql(sql).fetchall()}
    assert got == want
