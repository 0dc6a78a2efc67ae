#!/usr/bin/env python
"""Multi-PROCESS OCC contention probe (VERDICT r10 item 7): the
in-suite race tests drive two writer threads in one driver; the honest
production shape is two separate JVM/Python processes contending on
one table through nothing but the shared commit log. This probe forks
two child processes, each with its own SparkSession, each committing
``N_COMMITS`` merge-on-read change epochs against the SAME
PartitionedCdcTable, then the parent audits the log:

- versions are DENSE (-1..final, no gaps — every CAS slot was claimed
  exactly once);
- NO LOST COMMITS: every writer's every key landed in the final
  snapshot (an interleaved commit overwritten by a later-slot publish
  would drop keys);
- the manifest txn map carries both writers' final batch ids.

Prints one JSON line with commits/s under contention and per-writer
CAS-retry counts for the SCALE.md ledger.

Run: python tools/occ_multiproc_probe.py
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

ROOT = "/tmp/occ_multiproc_probe"
N_COMMITS = 8
ROWS_PER_COMMIT = 50

_CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession, functions as F
import systems_spark.state as state_mod
from systems_spark.streaming import PartitionedCdcTable

app, base, n, rows_per = sys.argv[1], sys.argv[2], int(sys.argv[3]), \
    int(sys.argv[4])
spark = (SparkSession.builder.master("local[8]")
         .appName(f"occ-{{app}}")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.ui.enabled", "false")
         .config("spark.ui.showConsoleProgress", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

losses = {{"n": 0}}
real = state_mod.fs_publish_text_exclusive
def counting(spark_, path, text):
    ok = real(spark_, path, text)
    if not ok:
        losses["n"] += 1
    return ok
state_mod.fs_publish_text_exclusive = counting

t = PartitionedCdcTable(base, "k", app_id=app, num_buckets=8,
                        write_mode="merge_on_read")
seed = spark.createDataFrame([(0, "seed", 0)], "k long, w string, v long")
t.initialize(seed)  # idempotent: the slower process defers to the winner

off = 1_000_000 if app == "w2" else 0
t0 = time.perf_counter()
for i in range(n):
    ch = (spark.range(i * rows_per, (i + 1) * rows_per)
          .select((F.col("id") + 1 + off).alias("k"),
                  F.lit(app).alias("w"),
                  (F.col("id") * 7).alias("v"),
                  F.lit(i + 1).cast("long").alias("seq"),
                  F.lit("insert").alias("op")))
    t(ch, i)
dt = time.perf_counter() - t0
with open(os.path.join(base, f"_probe_{{app}}.json"), "w") as fh:
    json.dump({{"app": app, "commits": n, "sec": round(dt, 3),
               "cas_losses": losses["n"]}}, fh)
spark.stop()
"""


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    shutil.rmtree(ROOT, ignore_errors=True)
    os.makedirs(ROOT, exist_ok=True)
    base = os.path.join(ROOT, "t")
    child_src = _CHILD.format(repo=repo)
    t0 = time.perf_counter()
    procs = [subprocess.Popen(
        [sys.executable, "-c", child_src, app, base,
         str(N_COMMITS), str(ROWS_PER_COMMIT)],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
        for app in ("w1", "w2")]
    for p in procs:
        assert p.wait(timeout=900) == 0, "child writer failed"
    wall = time.perf_counter() - t0

    stats = {}
    for app in ("w1", "w2"):
        with open(os.path.join(base, f"_probe_{app}.json")) as fh:
            stats[app] = json.load(fh)

    # audit the log from a fresh session
    from pyspark.sql import SparkSession

    sys.path.insert(0, repo)
    from systems_spark.streaming import PartitionedCdcTable

    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.ui.enabled", "false")
             .config("spark.ui.showConsoleProgress", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    t = PartitionedCdcTable(base, "k", app_id="audit", num_buckets=8,
                            write_mode="merge_on_read")
    versions = t.versions(spark)
    assert versions == list(range(-1, max(versions) + 1)), \
        f"version gaps: {versions}"
    man = t._latest_manifest(spark)
    assert man["txn"]["w1"] == N_COMMITS - 1
    assert man["txn"]["w2"] == N_COMMITS - 1
    rows = {(r.k, r.w) for r in t.current(spark).collect()}
    want = {(i + 1, "w1") for i in range(N_COMMITS * ROWS_PER_COMMIT)} \
        | {(i + 1 + 1_000_000, "w2")
           for i in range(N_COMMITS * ROWS_PER_COMMIT)} | {(0, "seed")}
    assert rows == want, (f"lost commits: missing "
                          f"{sorted(want - rows)[:5]}, extra "
                          f"{sorted(rows - want)[:5]}")
    spark.stop()
    total = 2 * N_COMMITS
    print(json.dumps({
        "probe": "occ_multiproc", "writers": 2,
        "commits_total": total,
        "wall_sec": round(wall, 3),
        "commits_per_sec": round(total / wall, 3),
        "cas_retries": {a: stats[a]["cas_losses"] for a in stats},
        "versions_dense": True, "lost_commits": 0,
    }, separators=(",", ":")))
    shutil.rmtree(ROOT, ignore_errors=True)


if __name__ == "__main__":
    main()
