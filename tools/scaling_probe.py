#!/usr/bin/env python
"""Empirical scaling probe: time representative queries at sf0.001 /
sf0.01 / sf0.1 (1× / 10× / 100× rows) on one session and print the
per-query scaling curve.

The number that matters is the LAST ratio (sf0.01 → sf0.1, a 10× data
step once fixed overheads stop dominating): a scan-bound plan should
show ≈10× time at 10× data (linear), an aggregation/join plan whose
shuffle carries keys-not-rows should show well UNDER 10×, and anything
super-linear is a plan that will not survive the next 100×.

Usage: python tools/scaling_probe.py [query ...]
Defaults to a spread across operator families. One JSON line per query:
{"query": ..., "sec": {"0.001": s, "0.01": s, "0.1": s},
 "x_per_10x": [r1, r2]}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

import __spark_entry__ as entrymod

SFS = ["0.001", "0.01", "0.1"]
DEFAULT = [
    "pricing_summary",        # scan + agg
    "region_revenue",         # multi-join star
    "dedup_exact",            # hash-first dedup
    "dedup_minhash",          # signature agg + banded join
    "sessionize",             # window
    "order_rank_stats_scalable",  # distributed global rank
    "text_stats",             # JVM text lanes
    "ann_ivf",                # bucketed ANN
]


def main() -> None:
    names = sys.argv[1:] or DEFAULT
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("systems-spark-scaling-probe")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()
    # honor bench.py's dataset-location convention: SPARK_GRAFT_SF_DIR
    # points at one sf dir; its parent is the base for all three
    base = os.path.dirname(
        os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1").rstrip("/")
    )
    for name in names:
        fn = queries[name]
        secs = {}
        for sf in SFS:
            sf_dir = os.path.join(base, f"sf{sf}")
            best = None
            for _ in range(2):  # min-of-2: strip first-run JIT noise
                try:
                    spark._jvm.System.gc()
                except Exception:  # noqa: BLE001
                    pass
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            secs[sf] = round(best, 3)
        ratios = [round(secs[b] / max(secs[a], 1e-9), 2)
                  for a, b in zip(SFS, SFS[1:])]
        print(json.dumps({"query": name, "sec": secs,
                          "x_per_10x": ratios}))
    spark.stop()


if __name__ == "__main__":
    main()
