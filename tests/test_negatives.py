"""Negative-sampling semantics on hand-built interaction tables."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from systems_spark.operators.negatives import sample_negatives


def _frames(spark):
    inter = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 10), (3, 12)], "user long, item long")
    items = spark.createDataFrame([(i,) for i in range(10, 15)], "item long")
    return inter, items


def test_shape_and_determinism(spark):
    inter, items = _frames(spark)
    a = sorted(map(tuple, sample_negatives(inter, items, k=3).collect()))
    b = sorted(map(tuple, sample_negatives(inter, items, k=3).collect()))
    assert a == b and len(a) == 4 * 3
    # every (user, pos) has exactly slots 1..3
    from collections import Counter
    c = Counter((u, p) for u, p, _, _ in a)
    assert set(c.values()) == {3}


def test_negative_never_equals_its_positive(spark):
    inter, items = _frames(spark)
    rows = sample_negatives(inter, items, k=8).collect()
    assert all(r.neg_item != r.pos_item for r in rows)
    assert all(10 <= r.neg_item <= 14 for r in rows)


def test_different_salt_changes_draws(spark):
    inter, items = _frames(spark)
    a = sorted(map(tuple, sample_negatives(inter, items, k=4, salt="a").collect()))
    b = sorted(map(tuple, sample_negatives(inter, items, k=4, salt="b").collect()))
    assert a != b


def test_positive_outside_catalog_kept(spark):
    inter = spark.createDataFrame([(1, 999)], "user long, item long")
    items = spark.createDataFrame([(i,) for i in range(5)], "item long")
    rows = sample_negatives(inter, items, k=2).collect()
    assert len(rows) == 2 and all(0 <= r.neg_item <= 4 for r in rows)


def test_null_user_rows_survive_with_distinct_draws(spark):
    inter = spark.createDataFrame([(None, 10), (None, 11), (7, 10)],
                                  "user long, item long")
    items = spark.createDataFrame([(i,) for i in range(10, 20)], "item long")
    rows = sample_negatives(inter, items, k=3).collect()
    assert len(rows) == 9  # NULL-user interactions are kept
    null_draws = sorted(r.neg_item for r in rows
                        if r.user is None and r.pos_item == 10)
    anon_draws = sorted(r.neg_item for r in rows
                        if r.user == 7 and r.pos_item == 10)
    assert null_draws != anon_draws  # sentinel hashes differently from id 7


def test_partition_invariance_and_validation(spark):
    inter, items = _frames(spark)
    base = sorted(map(tuple, sample_negatives(inter, items, k=2).collect()))
    got = sorted(map(tuple, sample_negatives(
        inter.repartition(5), items.repartition(3), k=2).collect()))
    assert got == base
    with pytest.raises(ValueError):
        sample_negatives(inter, items, k=0)
    with pytest.raises(ValueError):
        sample_negatives(inter, items.limit(1), k=2)


def test_index_has_no_single_partition_stage(spark):
    """VERDICT r4 item 2: the item index must not be built with a global
    unpartitioned window — no Exchange SinglePartition anywhere in the
    operator's physical plan (GlobalRank's window partitions by bucket)."""
    inter, items = _frames(spark)
    df = sample_negatives(inter, items, k=2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan, plan


def test_index_mapping_matches_global_window(spark):
    """The GlobalRank-built index assigns the identical (idx -> item)
    mapping a global `row_number() OVER (ORDER BY item)` would."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    items = spark.createDataFrame(
        [(v,) for v in [17, 3, 999, 42, 8, 256, 1, 77, 500, 31]], "item long")
    inter = spark.createDataFrame([(u, 3) for u in range(30)],
                                  "user long, item long")
    got = sorted(map(tuple, sample_negatives(inter, items, k=5).collect()))
    # reference: the old single-task global-window index
    w = Window.orderBy(F.col("item").asc())
    from systems_spark.functions.hashing import hash64
    index = (items.select("item").distinct()
             .select((F.row_number().over(w) - 1).alias("_idx"),
                     F.col("item").alias("_neg")))
    n = index.count()
    slots = (inter.select(F.col("user"), F.col("item").alias("pos_item"))
             .select("user", "pos_item",
                     F.explode(F.sequence(F.lit(1), F.lit(5))).alias("slot")))
    h = hash64(F.concat_ws("|", F.lit("neg"),
                           F.col("user").cast("string"),
                           F.col("pos_item").cast("string"),
                           F.col("slot").cast("string")))
    drawn = slots.withColumn("_idx", h % n)
    pos_idx = index.select(F.col("_neg").alias("pos_item"),
                           F.col("_idx").alias("_pos_idx"))
    want = sorted(map(tuple, (
        drawn.join(pos_idx, on="pos_item", how="left")
        .withColumn("_idx2", F.when(F.col("_idx") == F.col("_pos_idx"),
                                    (F.col("_idx") + 1) % n)
                    .otherwise(F.col("_idx")))
        .join(index.withColumnRenamed("_idx", "_idx2"), on="_idx2")
        .select("user", "pos_item", F.col("slot").cast("long").alias("slot"),
                F.col("_neg").alias("neg_item"))).collect()))
    assert got == want
