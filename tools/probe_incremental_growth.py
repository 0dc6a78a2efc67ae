#!/usr/bin/env python
"""Per-batch cost vs standing-corpus size for the incremental dedup
families (VERDICT r7 items 1 + 7 'done' criteria).

The claim an incremental pipeline makes is: once the standing state is
persisted, admitting a FIXED batch costs ~the batch's share of the
bucket joins, nearly independent of how large the standing corpus has
grown. This probe measures exactly that, family by family:

- the standing corpus is sf0.1 documents/embeddings SUBSAMPLED at 1× /
  ~4× / ~8× (doc_id % m == 1 with m = 16 / 4 / 2 — odd ids only, so it
  never overlaps the batch), its signature/fingerprint state and labels
  pre-materialized through the StateStore OUTSIDE the timed window;
- the batch is FIXED (doc_id % 16 == 0 — the same docs at every corpus
  size);
- the timed window is incremental_pairs(batch) → threshold → DELTA
  PARQUET WRITE → incremental_components fold from the parquet read →
  noop write, i.e. exactly the work a daily ingest pays. The delta
  write inside the window is load-bearing twice over: production
  persists the delta (it becomes tomorrow's standing pairs), and the
  fold must consume a STORAGE READ, not live Arrow-kernel lineage — the
  NOTES_r7 localCheckpoint/Catalyst pathology otherwise dominates the
  measurement (first probe draft: simhash 12 s/batch over live lineage
  vs ~2 s severed).

Prints one JSON line per family:
{"family": ..., "corpus_rows": [...], "batch_rows": N,
 "batch_sec": [...], "x_per_step": [...]}
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
MODS = (16, 4, 2)  # corpus = doc_id % m == 1 … growing ~1× / ~4× / ~8×


def main():
    from pyspark.sql import SparkSession, functions as F

    import __spark_entry__ as e
    from systems_spark.dedup import connected_components, incremental_components
    from systems_spark.dedup.winnow import (winnow_fingerprints,
                                            winnow_incremental_pairs,
                                            winnow_pairs)
    from systems_spark.state import StateStore

    spark = (SparkSession.builder.master(f"local[{CPUS}]")
             .config("spark.sql.shuffle.partitions", CPUS)
             .config("spark.ui.enabled", "false")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.legacy.parquet.nanosAsLong", "true")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    store = StateStore()

    def sever(df, name):
        # timed-window delta persistence: plain overwrite (NOT marker-
        # gated — every timed run must pay it, like production does)
        path = f"/tmp/systems_spark_probe/{name}"
        df.write.mode("overwrite").parquet(path)
        return spark.read.parquet(path)

    docs = e._t(spark, SF_DIR, "documents")
    emb = e._t(spark, SF_DIR, "embeddings")
    batch_docs = docs.where(F.col("doc_id") % 16 == 0)
    batch_emb = emb.where(F.col("vec_id") % 16 == 0)

    def corpus_docs(m):
        return docs.where(F.col("doc_id") % m == 1)

    def corpus_emb(m):
        return emb.where(F.col("vec_id") % m == 1)

    # --- family drivers: (prepare(m) -> state dict, run(state) -> frame) ---
    def minhash(m):
        from __spark_entry__ import _MINHASH
        from systems_spark.dedup import MinHashDedup
        mh = MinHashDedup(**_MINHASH)
        min_eq = int(mh.threshold * mh.num_perm)
        sigs = store.materialize(
            mh.signatures(corpus_docs(m)).where(F.col("m0") != 2147483647),
            f"probe-mh-sigs:{m}")
        labels = store.materialize(
            connected_components(
                mh.candidate_pairs(sigs).where(F.col("n_equal") >= min_eq)),
            f"probe-mh-labels:{m}")

        def run():
            new_sigs = mh.signatures(batch_docs).where(
                F.col("m0") != 2147483647)
            delta = sever(
                mh.incremental_pairs(sigs, new_sigs)
                .where(F.col("n_equal") >= min_eq).select("a", "b"),
                f"mh-{m}")
            return incremental_components(labels, delta, check_labels=False)
        return run

    def simhash(m):
        from __spark_entry__ import _SIMHASH
        from systems_spark.dedup import SimHashDedup
        op = SimHashDedup(**_SIMHASH)
        sigs = store.materialize(
            op.signatures(corpus_docs(m), nonempty_only=True),
            f"probe-sh-sigs:{m}")
        labels = store.materialize(
            connected_components(op.transform(corpus_docs(m))
                                 .select("a", "b")),
            f"probe-sh-labels:{m}")

        def run():
            new_sigs = op.signatures(batch_docs, nonempty_only=True)
            delta = sever(
                op.incremental_pairs(sigs, new_sigs).select("a", "b"),
                f"sh-{m}")
            return incremental_components(labels, delta, check_labels=False)
        return run

    def winnow(m):
        from __spark_entry__ import _WINNOW
        fps = store.materialize(
            winnow_fingerprints(corpus_docs(m), k=_WINNOW["k"],
                                w=_WINNOW["w"]),
            f"probe-wn-fps:{m}")
        labels = store.materialize(
            connected_components(
                winnow_pairs(corpus_docs(m), **_WINNOW),
                a_col="doc_a", b_col="doc_b"),
            f"probe-wn-labels:{m}")

        def run():
            delta = sever(
                winnow_incremental_pairs(
                    fps, batch_docs, k=_WINNOW["k"], w=_WINNOW["w"],
                    min_shared=_WINNOW["min_shared"]),
                f"wn-{m}")
            return incremental_components(
                labels, delta, a_col="doc_a", b_col="doc_b",
                check_labels=False)
        return run

    def embedding(m):
        from __spark_entry__ import _EMBDED_LSH
        from systems_spark.dedup import EmbeddingDedup
        op = EmbeddingDedup(**_EMBDED_LSH)
        sigs = store.materialize(op.signatures(corpus_emb(m)),
                                 f"probe-emb-sigs:{m}")
        labels = store.materialize(
            connected_components(
                op.transform(corpus_emb(m)).select("a", "b")),
            f"probe-emb-labels:{m}")

        def run():
            delta = sever(
                op.incremental_pairs(sigs, op.signatures(batch_emb))
                .select("a", "b"),
                f"emb-{m}")
            return incremental_components(labels, delta, check_labels=False)
        return run

    families = {"minhash": (minhash, corpus_docs, batch_docs),
                "simhash": (simhash, corpus_docs, batch_docs),
                "winnow": (winnow, corpus_docs, batch_docs),
                "embedding": (embedding, corpus_emb, batch_emb)}
    sel = sys.argv[1:] or list(families)
    for fam in sel:
        prep, corpus_of, batch = families[fam]
        rows, secs = [], []
        for m in MODS:
            rows.append(corpus_of(m).count())
            run = prep(m)  # standing state materialized OUTSIDE the window
            best = None
            for _ in range(2):
                spark._jvm.System.gc()
                t0 = time.perf_counter()
                run().write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            secs.append(round(best, 3))
        ratios = [round(secs[i + 1] / secs[i], 2) for i in range(len(secs) - 1)]
        print(json.dumps({
            "family": fam, "corpus_rows": rows,
            "batch_rows": int(batch.count()) if fam != "embedding"
            else int(batch_emb.count()),
            "batch_sec": secs, "x_per_step": ratios}))
        sys.stdout.flush()
    spark.stop()


if __name__ == "__main__":
    main()
