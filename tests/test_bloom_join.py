"""Bloom-prefiltered join: losslessness (no false negatives), actual
selectivity on disjoint keys, and plan shape (no extra shuffle on the
fact side before the filter)."""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from systems_spark.operators import bloom_prefilter, bloom_prefilter_join


def test_no_false_negatives_and_join_equality(spark):
    """Every fact row whose key IS in the dim survives the prefilter,
    and the prefiltered inner join equals the plain inner join."""
    big = spark.createDataFrame(
        [(i, f"p{i}") for i in range(2000)], "key long, payload string")
    dim = spark.createDataFrame(
        [(i, f"d{i}") for i in range(0, 2000, 7)], "dkey long, dval string")
    plain = sorted(tuple(r) for r in big.join(
        dim, big.key == dim.dkey).collect())
    pre = sorted(tuple(r) for r in bloom_prefilter_join(
        big, dim, "key", "dkey").collect())
    assert pre == plain
    # no-false-negative side alone: all true members survive
    kept = {r.key for r in bloom_prefilter(
        big, "key", dim.select("dkey"), "dkey").collect()}
    assert set(range(0, 2000, 7)) <= kept


def test_prefilter_is_selective_on_disjoint_keys(spark):
    """Disjoint key ranges: the filter passes only false positives —
    far fewer than the input (m=2^14, n=300, k=4 → fpp ≪ 1%)."""
    big = spark.createDataFrame([(i,) for i in range(10_000)], "key long")
    dim = spark.createDataFrame(
        [(i,) for i in range(1_000_000, 1_000_300)], "dkey long")
    survivors = bloom_prefilter(big, "key", dim, "dkey").count()
    assert survivors < 100  # ~0 expected; generous bound vs fpp noise


def test_prefilter_preserves_columns_and_dupes(spark):
    """Pass-through contract: every column survives, duplicate fact
    rows are kept (a filter, not a semi-join-dedup)."""
    big = spark.createDataFrame(
        [(1, "a"), (1, "a"), (2, "b")], "key long, v string")
    dim = spark.createDataFrame([(1,)], "dkey long")
    rows = sorted((r.key, r.v) for r in bloom_prefilter(
        big, "key", dim, "dkey").collect())
    assert rows == [(1, "a"), (1, "a")]


def test_fact_side_has_no_shuffle_before_filter(spark):
    """Plan proof: the fact scan reaches the bloom membership filter
    without an Exchange — the dim side owns the only aggregation."""
    big = spark.createDataFrame([(i,) for i in range(100)], "key long")
    dim = spark.createDataFrame([(i,) for i in range(10)], "dkey long")
    plan = bloom_prefilter(
        big, "key", dim, "dkey")._jdf.queryExecution().executedPlan().toString()
    # the 1-row dense-array side arrives by broadcast; the fact side's
    # subtree above the scan must be exchange-free
    nested = plan.split("BroadcastNestedLoopJoin")[0]
    assert "Exchange" not in nested


def test_validation(spark):
    big = spark.createDataFrame([(1,)], "key long")
    with pytest.raises(ValueError):
        bloom_prefilter(big, "key", big, "key", k=0)
