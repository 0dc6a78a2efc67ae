"""Per-file bloom skipping (operators/zorder.py file_bloom /
bloom_pruned_* / StatsIndex.bloom/read_eq): the point-lookup index
min/max stats cannot provide. Soundness (pruned read + row filter ==
full scan, present and absent keys), effectiveness on the layout where
min/max keeps EVERY file, engine-consistent hashing (build and probe
share the JVM xxhash64 expression), standing-state reuse + staleness.
"""

import os
import random
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import systems_spark.operators.zorder as zz
from systems_spark.operators.zorder import (StatsIndex, bloom_pruned_files,
                                            bloom_pruned_read, file_bloom,
                                            file_stats, pruned_files)
from systems_spark.state import StateStore

BITS, HASHES = 12, 4


def _write_hash_scattered(spark, path, n=4000, seed=7):
    """Unique keys 0..n-1 scattered across 8 files (shuffled order +
    round-robin repartition): every file's [min, max] spans nearly the
    whole key domain, but each key lives in exactly one file — the
    shape where min/max skipping is useless and bloom skipping is the
    whole game."""
    rnd = random.Random(seed)
    rows = [(k, k % 17, f"p{k}") for k in range(n)]
    rnd.shuffle(rows)
    df = spark.createDataFrame(rows, "k long, g long, payload string")
    df.repartition(8).write.mode("overwrite").parquet(path)


def test_bloom_prunes_where_minmax_cannot(spark, tmp_path):
    path = str(tmp_path / "t")
    _write_hash_scattered(spark, path)
    probe = [2000]

    stats = file_stats(spark, path, ["k"])
    n_files = stats.count()
    assert n_files == 8
    # min/max keeps EVERY file for the point probe — scattered layout
    assert len(pruned_files(stats, {"k": (2000, 2000)})) == n_files

    bloom = file_bloom(spark, path, "k", BITS, HASHES)
    dtype = spark.read.parquet(path).schema["k"].dataType
    kept = bloom_pruned_files(spark, bloom, probe, dtype, BITS, HASHES)
    assert 1 <= len(kept) < n_files  # the true file + rare fp

    got = (bloom_pruned_read(spark, path, bloom, "k", probe, BITS, HASHES)
           .where(F.col("k").isin(probe)).collect())
    want = spark.read.parquet(path).where(F.col("k").isin(probe)).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))


def test_bloom_in_list_and_absent_key(spark, tmp_path):
    path = str(tmp_path / "t")
    _write_hash_scattered(spark, path)
    bloom = file_bloom(spark, path, "k", BITS, HASHES)

    present, absent = [0, 1999, 3999], [123456789]
    got = (bloom_pruned_read(spark, path, bloom, "k", present + absent,
                             BITS, HASHES)
           .where(F.col("k").isin(present + absent)).collect())
    assert sorted(r["k"] for r in got) == present

    # absent key alone: zero files survive -> empty frame, full schema
    empty = bloom_pruned_read(spark, path, bloom, "k", absent, BITS, HASHES)
    assert empty.count() == 0
    assert set(empty.columns) == {"k", "g", "payload"}


def test_bloom_null_semantics(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(None, 0), (None, 1), (5, 2), (6, 3)], "k long, i long")
    # file 0: all-NULL k (sound to skip); file 1: real values
    df.where(F.col("k").isNull()).coalesce(1).write.parquet(
        os.path.join(path, "part=a"))
    df.where(F.col("k").isNotNull()).coalesce(1).write.parquet(
        os.path.join(path, "part=b"))
    bloom = file_bloom(spark, path, "k", BITS, HASHES)
    assert bloom.count() == 1  # the all-NULL file has no index entry
    got = (bloom_pruned_read(spark, path, bloom, "k", [5], BITS, HASHES)
           .where(F.col("k") == 5).collect())
    assert [r["k"] for r in got] == [5]
    with pytest.raises(ValueError, match="non-NULL"):
        bloom_pruned_files(spark, bloom, [None], None, BITS, HASHES)


def test_bloom_param_mismatch_raises(spark, tmp_path):
    path = str(tmp_path / "t")
    _write_hash_scattered(spark, path, n=200)
    bloom = file_bloom(spark, path, "k", BITS, HASHES)
    dtype = spark.read.parquet(path).schema["k"].dataType
    with pytest.raises(ValueError, match="built with"):
        bloom_pruned_files(spark, bloom, [1], dtype, BITS + 1, HASHES)


def test_statsindex_bloom_reuse_and_staleness(spark, tmp_path, monkeypatch):
    path = str(tmp_path / "t")
    root = str(tmp_path / "state")
    _write_hash_scattered(spark, path, n=1000, seed=1)

    idx = StatsIndex(StateStore(root=root))
    b1 = idx.bloom(spark, path, "k", BITS, HASHES)
    n1 = b1.count()
    assert n1 == 8

    # fresh store instance (cross-session stand-in) must hit the marker
    def boom(*a, **kw):
        raise AssertionError("bloom rebuilt despite unchanged layout")

    monkeypatch.setattr(zz, "file_bloom", boom)
    b2 = StatsIndex(StateStore(root=root)).bloom(spark, path, "k",
                                                 BITS, HASHES)
    assert b2.count() == n1
    monkeypatch.undo()

    # rewrite moves the fingerprint -> rebuild reflects the new files
    old = {r["file"] for r in b1.select("file").collect()}
    _write_hash_scattered(spark, path, n=1000, seed=2)
    b3 = StatsIndex(StateStore(root=root)).bloom(spark, path, "k",
                                                 BITS, HASHES)
    assert {r["file"] for r in b3.select("file").collect()} != old

    # read_eq end-to-end through the persisted index
    got = (StatsIndex(StateStore(root=root))
           .read_eq(spark, path, "k", [500], BITS, HASHES)
           .where(F.col("k") == 500).collect())
    assert [r["k"] for r in got] == [500]
