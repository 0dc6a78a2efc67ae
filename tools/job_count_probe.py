#!/usr/bin/env python
"""Count Spark JOBS (driver actions) a lane runs, plus its wall time.

The r13 optimizations on the anti-scaling set (VERDICT r12 item 2) cut
DRIVER ACTIONS per lane — fused convergence checks, commit-bookkeeping
observed on staging writes — which a .explain() plan cannot show. This
probe is the evidence tool: it runs the lane exactly as bench.py does
(same session conf, noop sink) with the UI enabled and reports how many
jobs the lane submitted, from the status-store REST API.

Usage: python tools/job_count_probe.py lane1,lane2,... [runs_per_lane]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.

Each lane runs `runs_per_lane` times (default 2); the FIRST run includes
any per-session build/state cost, the LAST run is the steady state the
bench's min-of-N reports. Job counts are per run.
"""
from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

import __spark_entry__ as entrymod

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def _jobs(ui: str, app_id: str) -> int:
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/jobs"
                                ) as r:
        return len(json.load(r))


def main() -> None:
    if len(sys.argv) < 2:
        raise SystemExit(__doc__)
    names = [n.strip() for n in sys.argv[1].split(",") if n.strip()]
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("systems-spark-jobcount")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.sql.warehouse.dir", "/tmp/systems-spark-bench-warehouse")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    entrymod.enable_cooccurrence_cache(True)
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    queries = entrymod.queries()
    unknown = sorted(set(names) - set(queries))
    if unknown:
        raise SystemExit(f"unknown lanes: {unknown}")
    for t in ("lineitem", "orders", "documents", "embeddings", "events"):
        try:
            spark.read.parquet(f"{SF_DIR}/{t}.parquet").count()
        except Exception as exc:  # noqa: BLE001
            print(f"# warmup {t} failed: {exc}", file=sys.stderr)
    out = {}
    for name in names:
        per_run = []
        for _ in range(runs):
            j0 = _jobs(ui, app_id)
            t0 = time.perf_counter()
            df = queries[name](spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            per_run.append({"jobs": _jobs(ui, app_id) - j0,
                            "sec": round(dt, 3)})
        out[name] = per_run
        print(name, json.dumps(per_run), flush=True)
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
