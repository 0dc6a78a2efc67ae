"""Manifest-verified parquet export: integrity attestation semantics.

write_manifest_parquet re-reads what landed on disk; verify_manifest must
accept intact data regardless of physical layout, and name exactly what
diverged when rows are lost, duplicated, or altered.
"""

import glob
import json
import os
import shutil
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from systems_spark.sources import (MANIFEST_NAME, verify_manifest,
                                   write_manifest_parquet)


@pytest.fixture()
def data(spark):
    return spark.createDataFrame(
        [(i, f"doc {i}", i % 4) for i in range(200)],
        "doc_id long, text string, shard long")


def test_roundtrip_verifies(spark, data, tmp_path):
    p = str(tmp_path / "out")
    m = write_manifest_parquet(data, p)
    assert m["rows"] == 200 and os.path.exists(os.path.join(p, MANIFEST_NAME))
    rep = verify_manifest(spark, p)
    assert rep["ok"] and rep["rows"] == 200


def test_checksum_is_layout_independent(spark, data, tmp_path):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    ma = write_manifest_parquet(data.repartition(7), a)
    mb = write_manifest_parquet(data.repartition(2), b)
    assert ma["checksum"] == mb["checksum"] and ma["rows"] == mb["rows"]


def test_lost_file_is_caught(spark, data, tmp_path):
    p = str(tmp_path / "out")
    write_manifest_parquet(data.repartition(4), p)
    victim = sorted(glob.glob(os.path.join(p, "*.parquet")))[0]
    os.remove(victim)
    with pytest.raises(ValueError, match="rows"):
        verify_manifest(spark, p)


def test_altered_row_is_caught_even_with_same_rowcount(spark, data, tmp_path):
    p, q = str(tmp_path / "out"), str(tmp_path / "alt")
    write_manifest_parquet(data, p)
    # same row count, one value changed: rewrite files with altered content
    from pyspark.sql import functions as F
    altered = data.withColumn(
        "text", F.when(F.col("doc_id") == 7, F.lit("tampered")).otherwise(F.col("text")))
    altered.write.parquet(q)
    for f in glob.glob(os.path.join(p, "*.parquet")):
        os.remove(f)
    for f in glob.glob(os.path.join(q, "*.parquet")):
        shutil.move(f, os.path.join(p, os.path.basename(f)))
    with pytest.raises(ValueError, match="checksum"):
        verify_manifest(spark, p)


def test_sharded_export_carries_per_shard_summaries(spark, data, tmp_path):
    p = str(tmp_path / "sharded")
    m = write_manifest_parquet(data, p, shard_col="shard", n_shards=4)
    assert set(m["shards"]) == {"0", "1", "2", "3"}
    assert sum(v["rows"] for v in m["shards"].values()) == 200
    assert verify_manifest(spark, p)["shards"] == 4
    # manifest on disk agrees with the returned dict
    with open(os.path.join(p, MANIFEST_NAME)) as fh:
        assert json.load(fh) == m


def test_null_shard_values_survive(spark, tmp_path):
    from pyspark.sql import functions as F
    df = spark.createDataFrame(
        [(i, f"doc {i}", None if i % 5 == 0 else i % 3) for i in range(60)],
        "doc_id long, text string, shard long")
    p = str(tmp_path / "nullshard")
    m = write_manifest_parquet(df, p, shard_col="shard")
    assert "__HIVE_DEFAULT_PARTITION__" in m["shards"]
    assert m["shards"]["__HIVE_DEFAULT_PARTITION__"]["rows"] == 12
    assert verify_manifest(spark, p)["ok"]


def test_missing_shard_is_named(spark, data, tmp_path):
    p = str(tmp_path / "sharded")
    write_manifest_parquet(data, p, shard_col="shard", n_shards=4)
    shutil.rmtree(os.path.join(p, "shard=2"))
    with pytest.raises(ValueError, match="shard 2"):
        verify_manifest(spark, p)
