"""Scaling probe for incrementally maintained materialized views over
a merge-on-read table: grow the BASE TABLE 10× and 100× while keeping
the change batch fixed, and measure refresh time — the pruned change
feed (touched buckets ⋉ touched keys) should hold it flat while a
snapshot-diff (or recompute) refresh would grow linearly.

Run: python tools/matview_probe.py
"""

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

from systems_spark.streaming import MaterializedAggView, PartitionedCdcTable

ROOT = "/tmp/matview_probe"
BATCH_KEYS = 200


def probe(spark, n_rows):
    base = f"{ROOT}/n{n_rows}"
    shutil.rmtree(base, ignore_errors=True)
    seed = (spark.range(1, n_rows + 1).select(
        F.col("id").alias("k"),
        (F.col("id") % 37).cast("string").alias("grp"),
        (F.col("id") * 3).alias("v")))
    t = PartitionedCdcTable(f"{base}/t", "k", app_id="w",
                            num_buckets=64,
                            write_mode="merge_on_read")
    t.initialize(seed)
    view = MaterializedAggView(
        t, f"{base}/mv", group_cols=["grp"],
        aggs={"n": ("count", None),
              "total": ("sum", "CAST(v AS DECIMAL(18,2))")})
    view.refresh(spark)  # initial build (not timed — inherently O(N))

    ch = (spark.range(1, BATCH_KEYS + 1).select(
        (F.col("id") * (n_rows // BATCH_KEYS)).alias("k"),
        F.lit("moved").alias("grp"),
        (F.col("id") * 7).alias("v"),
        F.lit(1).cast("long").alias("seq"),
        F.lit("update").alias("op")))
    t(ch, 0)
    t0 = time.perf_counter()
    view.refresh(spark)
    dt = time.perf_counter() - t0
    moved = view.result(spark).where("grp = 'moved'").collect()
    assert moved and moved[0].n == BATCH_KEYS
    return dt


def main():
    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    for n in (20_000, 200_000, 2_000_000):
        out[n] = round(probe(spark, n), 3)
    steps = list(out.values())
    print(json.dumps({
        "batch_keys": BATCH_KEYS, "refresh_s_by_rows": out,
        "x_per_10x": [round(steps[1] / steps[0], 2),
                      round(steps[2] / steps[1], 2)]}))
    shutil.rmtree(ROOT, ignore_errors=True)


if __name__ == "__main__":
    main()
