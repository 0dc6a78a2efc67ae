"""KMeans probe at IVF-coarse-quantizer scale (VERDICT r9 item 7):
k=256, d=128, N=200k (sf0.1 embeddings replicated 100x with
deterministic jitter, concat-doubled to d=128 — the shape faiss
`IVF256` training sees). Measures per-Lloyd-iteration wall time of the
exact-integer fit, and times the Arrow-batched NumPy argmin assignment
(the map-side escape hatch if the broadcast-crossJoin fold dominates).

Run: python tools/kmeans_probe.py [N_target] [k]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from systems_spark.operators.kmeans import KMeansMicros

N_TARGET = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
K = int(sys.argv[2]) if len(sys.argv) > 2 else 256
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

spark = (SparkSession.builder.master(f"local[{CPUS}]")
         .config("spark.sql.shuffle.partitions", CPUS)
         .config("spark.driver.memory", "48g")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
n0 = emb.count()
reps = max(1, N_TARGET // n0)
# d=128: concat with the reversed negation; N: replicate with a
# per-replica deterministic micro-jitter so replicas aren't identical
rep = spark.range(reps).select(F.col("id").alias("_r"))
pts = (emb.crossJoin(rep)
       .select((F.col("vec_id") * reps + F.col("_r")).alias("vec_id"),
               F.concat(
                   F.transform("embedding",
                               lambda x: x + (F.col("_r") % 97)
                               .cast("float") / 9700.0),
                   F.reverse(F.transform("embedding", lambda x: -x)))
               .alias("embedding")))
pts = pts.repartition(int(CPUS)).localCheckpoint()  # pay gen cost once
n = pts.count()
d = pts.select(F.size("embedding")).first()[0]
print(f"probe: N={n} d={d} k={K}")

times = {}
for iters in (1, 2):
    t0 = time.time()
    km = KMeansMicros(k=K, iters=iters).fit(pts)
    km._centroids.count()
    times[iters] = time.time() - t0
    print(f"fit iters={iters}: {times[iters]:.1f}s")
per_iter = times[2] - times[1]
print(f"per-iteration (iters2 - iters1): {per_iter:.1f}s")

# escape hatch: Arrow-batched NumPy argmin against the broadcast
# centroid matrix (mapInPandas) vs the crossJoin+window assignment
import numpy as np
import pandas as pd

cent = km._centroids.collect()
C = np.array([r["_km_cv"] for r in cent], dtype=np.int64)
cids = np.array([r["_km_cid"] for r in cent], dtype=np.int64)
bC = spark.sparkContext.broadcast((C, cids))


def argmin_batches(it):
    C_, cids_ = bC.value
    for pdf in it:
        V = np.stack(pdf["_v"].to_numpy()).astype(np.int64)
        # ||v-c||^2 = ||v||^2 - 2 v.c + ||c||^2 ; exact in int64 here
        d2 = ((V * V).sum(1)[:, None] - 2 * (V @ C_.T)
              + (C_ * C_).sum(1)[None, :])
        yield pd.DataFrame({"vec_id": pdf["vec_id"],
                            "cluster": cids_[np.argmin(d2, axis=1)]})


micros = pts.select("vec_id", F.transform(
    "embedding", lambda x: F.round(x.cast("double") * 1e6).cast("long"))
    .alias("_v"))

t0 = time.time()
(micros.mapInPandas(argmin_batches, "vec_id long, cluster long")
 .agg(F.sum("cluster")).first())
t_numpy = time.time() - t0

t0 = time.time()
km.assign(pts.select("vec_id", "embedding")) \
    .agg(F.sum("cluster")).first()
t_cross = time.time() - t0
print(f"assignment: crossJoin+window {t_cross:.1f}s | "
      f"mapInPandas NumPy argmin {t_numpy:.1f}s")
spark.stop()
