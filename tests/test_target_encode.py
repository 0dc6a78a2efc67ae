"""TargetEncode semantics: integer m-estimate math on hand-built data."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from systems_spark.operators.target_encode import TargetEncode

M = 1_000_000

ROWS = [
    ("a", 10.0), ("a", 20.0), ("a", 30.0),   # mean 20
    ("b", 100.0),                            # 1 row: shrinks hard
    ("c", 40.0), ("c", 60.0),                # mean 50
]


def _fit(spark, m):
    df = spark.createDataFrame(ROWS, "cat string, y double")
    return TargetEncode(["cat"], target_col="y", smoothing=m).fit(df), df


def _python_te(m):
    total = sum(round(y * M) for _, y in ROWS)
    prior = total // len(ROWS)
    out = {}
    for c in {c for c, _ in ROWS}:
        s = sum(round(y * M) for cc, y in ROWS if cc == c)
        n = sum(1 for cc, _ in ROWS if cc == c)
        out[c] = (s + m * prior) // (n + m)
    return out, prior


def test_matches_hand_integer_math(spark):
    for m in (0, 5, 20):
        te, df = _fit(spark, m)
        got = {r.cat: r.cat_te
               for r in te.transform(df.select("cat").distinct()).collect()}
        ref, _ = _python_te(m)
        assert got == ref, m


def test_small_category_shrinks_toward_prior(spark):
    te0, df = _fit(spark, 0)
    te20, _ = _fit(spark, 20)
    raw = {r.cat: r.cat_te
           for r in te0.transform(df.select("cat").distinct()).collect()}
    smooth = {r.cat: r.cat_te
              for r in te20.transform(df.select("cat").distinct()).collect()}
    _, prior = _python_te(20)
    # b has 1 row at 100: raw = 100e6; smoothed must sit between prior and raw
    assert raw["b"] == 100 * M
    assert prior < smooth["b"] < raw["b"]


def test_unseen_category_gets_prior(spark):
    te, _ = _fit(spark, 20)
    new = spark.createDataFrame([("zzz",)], "cat string")
    got = te.transform(new).collect()[0]
    _, prior = _python_te(20)
    assert got.cat_te == prior


def test_null_targets_shrink_toward_prior_not_zero(spark):
    rows = [("a", 10.0), ("a", None), ("b", 30.0)]
    df = spark.createDataFrame(rows, "cat string, y double")
    te = TargetEncode(["cat"], target_col="y", smoothing=0).fit(df)
    got = {r.cat: r.cat_te
           for r in te.transform(df.select("cat").distinct()).collect()}
    # the NULL row must not enter a's denominator: mean stays 10, not 5
    assert got["a"] == 10 * M
    assert got["b"] == 30 * M


def test_partition_invariance(spark):
    df = spark.createDataFrame(ROWS * 10, "cat string, y double")
    base = {r.cat: r.cat_te
            for r in TargetEncode(["cat"], "y").fit(df)
            .transform(df.select("cat").distinct()).collect()}
    got = {r.cat: r.cat_te
           for r in TargetEncode(["cat"], "y").fit(df.repartition(7))
           .transform(df.select("cat").distinct()).collect()}
    assert got == base
