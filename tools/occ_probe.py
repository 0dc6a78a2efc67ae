"""Measure the two transaction-protocol scale claims of round-10
session 5, for SCALE.md:

1. OCC granular conflict resolution: a conflicted commit whose
   interleave is disjoint costs O(publish) via the fast recommit,
   not O(re-read + re-merge + re-write) via the full rebase. We force
   the same CAS loss twice — once with the fast path enabled, once
   with compatibility artificially refused — over an sf0.1-sized
   orders table, and report both wall times.

2. O(1) latest-version discovery: `_latest_manifest` with a fresh
   hint reads O(1) files regardless of log length; with the hint
   corrupted it falls back to the full listing. We grow a synthetic
   commit log to N markers and time both paths.

Run: python tools/occ_probe.py [sf_dir]
"""

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

import systems_spark.state as state_mod
from systems_spark.streaming import PartitionedCdcTable

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
ROOT = "/tmp/occ_probe"


def conflict_probe(spark):
    orders = spark.read.parquet(f"{SF}/orders.parquet") \
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    out = {}
    for label, refuse in (("fast_recommit", False), ("full_rebase", True)):
        base = f"{ROOT}/conflict_{label}"
        shutil.rmtree(base, ignore_errors=True)
        a = PartitionedCdcTable(base, "o_orderkey", app_id="pa",
                                num_buckets=64)
        b = PartitionedCdcTable(base, "o_orderkey", app_id="pb",
                                num_buckets=64)
        a.initialize(orders)
        # writer A updates ONE key; writer B inserts a key in another
        # bucket inside A's stage-to-publish window
        ka, kb = 8, 1   # %64 buckets differ (8 vs 1)
        ch = (orders.where(F.col("o_orderkey") == ka)
              .withColumn("o_totalprice", F.col("o_totalprice") + 1)
              .withColumn("seq", F.lit(1).cast("long"))
              .withColumn("op", F.lit("update")))
        chb = (orders.where(F.col("o_orderkey") == kb)
               .withColumn("seq", F.lit(1).cast("long"))
               .withColumn("op", F.lit("insert")))
        real = state_mod.fs_publish_text_exclusive
        st = {"fired": False, "inside": False}

        def hooked(spark_, path, text):
            if not st["inside"] and not st["fired"]:
                st["fired"] = True
                st["inside"] = True
                b(chb, 0)
                st["inside"] = False
            return real(spark_, path, text)

        state_mod.fs_publish_text_exclusive = hooked
        if refuse:
            orig_fc = PartitionedCdcTable._fast_compatible
            PartitionedCdcTable._fast_compatible = \
                lambda self, nm, bm, t: False
        t0 = time.perf_counter()
        try:
            a(ch, 0)
        finally:
            state_mod.fs_publish_text_exclusive = real
            if refuse:
                PartitionedCdcTable._fast_compatible = orig_fc
        out[label] = time.perf_counter() - t0
        man = a._latest_manifest(spark)
        out[f"{label}_audited"] = "occ_recommit_of_base" in man
    return out


def log_probe(spark, n_markers=2000, reps=30):
    base = f"{ROOT}/log"
    shutil.rmtree(base, ignore_errors=True)
    seed = spark.createDataFrame([(1, 1.0)], "k long, v double")
    t = PartitionedCdcTable(base, "k", app_id="w", num_buckets=4)
    t.initialize(seed)
    t(seed.select("k", (F.col("v") + 1).alias("v"),
                  F.lit(1).alias("seq").cast("long"),
                  F.lit("update").alias("op")), 0)
    # grow the log synthetically: contiguous markers up to n_markers,
    # each a copy of the real latest manifest with a bumped version —
    # discovery cost depends only on marker COUNT, which is what we
    # are measuring
    latest = t._latest_manifest(spark)
    cdir = os.path.join(base, "_commits")
    for v in range(int(latest["version"]) + 1, n_markers):
        m = dict(latest, version=v)
        with open(os.path.join(cdir, f"v{v}.json"), "w") as fh:
            json.dump(m, fh)
    t._update_latest_hint(spark, n_markers - 1)

    def best(fn, reps=reps):
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            times.append(time.perf_counter() - t0)
        return min(times)

    with_hint = best(lambda: t._latest_manifest(spark))
    hint = os.path.join(cdir, "_latest")

    def corrupt_then_read():
        with open(hint, "w") as fh:
            fh.write("garbage")
        t._latest_manifest(spark)

    fallback = best(corrupt_then_read)
    return {"markers": n_markers, "latest_manifest_with_hint_s": with_hint,
            "latest_manifest_listing_fallback_s": fallback,
            "speedup": fallback / with_hint if with_hint else None}


def main():
    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    c = conflict_probe(spark)
    print(json.dumps({"conflict_probe_sf": SF, **c}))
    l = log_probe(spark)
    print(json.dumps(l))
    shutil.rmtree(ROOT, ignore_errors=True)


if __name__ == "__main__":
    main()
