#!/usr/bin/env python
"""Per-round dedup quality-anchor probe (VERDICT r10 item 4).

``dedup_family_eval`` / ``dedup_eval`` are MEASUREMENT lanes: they
compute all-pairs exact ground truth by design (adjudicated r7) to
grade the production dedup families' pair recall. That is the right
way to measure quality and the wrong thing to time inside the headline
bench — by r10 the family eval had become the single biggest bench
line (~5.4% of the pass) while exercising no production path. This
probe runs both lanes isolated (min-of-RUNS, own session) and prints
one JSON line so the anchor is still recorded every round; run it once
per round, never concurrently with suites.

Usage: python tools/dedup_eval_probe.py  [SPARK_GRAFT_SF_DIR, _CPUS,
SPARK_GRAFT_BENCH_RUNS honored like bench.py]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

import __spark_entry__ as entrymod

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
LANES = ("dedup_eval", "dedup_family_eval")


def main() -> None:
    spark = (SparkSession.builder.master(f"local[{CPUS}]")
             .appName("dedup-eval-probe")
             .config("spark.sql.shuffle.partitions", CPUS)
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.sql.warehouse.dir",
                     "/tmp/systems-spark-bench-warehouse")
             .config("spark.ui.enabled", "false")
             .config("spark.ui.showConsoleProgress", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()
    out = {}
    for lane in LANES:
        samples = []
        for _ in range(RUNS):
            t0 = time.perf_counter()
            queries[lane](spark, SF_DIR).write.format("noop") \
                .mode("overwrite").save()
            samples.append(round(time.perf_counter() - t0, 3))
        out[lane] = {"min_sec": min(samples), "runs": samples}
    spark.stop()
    print(json.dumps({"probe": "dedup_eval_anchor", "sf_dir": SF_DIR,
                      "lanes": out}, separators=(",", ":")))


if __name__ == "__main__":
    main()
