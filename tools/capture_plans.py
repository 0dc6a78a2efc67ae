#!/usr/bin/env python
"""Dump .explain("formatted") for named lanes to plans/<round>/<lane>_<tag>.txt.

Usage: python tools/capture_plans.py <tag> lane1,lane2,... [round_dir]
  tag: "before" / "after" (file suffix)
  round_dir: plans/ subdirectory (default $SPARK_GRAFT_PLAN_ROUND or "r13")
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS,
     SPARK_GRAFT_PLAN_ROUND.

Plans are captured from the SAME DataFrame object bench.py times (the
queries() thunk return), on an identically-configured session. Lanes whose
build phase runs jobs (incremental/CDC lanes) execute those jobs here too —
the captured plan is the steady-state returned-frame plan.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

import __spark_entry__ as entrymod

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    if len(sys.argv) < 3:
        raise SystemExit(__doc__)
    tag = sys.argv[1]
    names = [n.strip() for n in sys.argv[2].split(",") if n.strip()]
    round_dir = (sys.argv[3] if len(sys.argv) > 3
                 else os.environ.get("SPARK_GRAFT_PLAN_ROUND", "r13"))
    out_dir = os.path.join(_REPO, "plans", round_dir)
    os.makedirs(out_dir, exist_ok=True)
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("systems-spark-plan-capture")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.sql.warehouse.dir", "/tmp/systems-spark-bench-warehouse")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    entrymod.enable_cooccurrence_cache(True)
    queries = entrymod.queries()
    unknown = sorted(set(names) - set(queries))
    if unknown:
        raise SystemExit(f"unknown lanes: {unknown}")
    for name in names:
        df = queries[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange, "
              f"{plan.count('SortMergeJoin')} SMJ, "
              f"{plan.count('BroadcastHashJoin')} BHJ)")
    spark.stop()


if __name__ == "__main__":
    main()
