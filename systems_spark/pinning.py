"""Size-aware lineage pins — the r12 zero-ReusedExchange discipline made
scale-safe (VERDICT r12 item 3 / "Next round" item 4).

The r12 rounds established the pattern: Spark never reuses a lazy subtree
referenced more than once in a plan (no ``ReusedExchange`` across plan
references), so a fitted-state frame derived from a corpus pass must be
PINNED — materialized once per action — or every reference re-runs the
corpus pass. The r12 implementation was a bare ``localCheckpoint
(eager=False)`` everywhere. That is the right call for small derived
frames, but it has two scale hazards on corpus-sized relations:

1. **Fault tolerance.** ``localCheckpoint`` stores blocks in executor
   storage with the lineage TRUNCATED: a lost executor cannot recompute
   its partitions, and multi-hour 100 TB jobs lose executors routinely.
   A RELIABLE checkpoint (``Dataset.checkpoint`` into the cluster's
   checkpoint dir, typically HDFS/object storage) survives executor loss.
2. **Generation leak.** An incremental ``fit_update`` that re-pins the
   cumulative state (old pin ∪ delta) keeps every prior generation's
   blocks reachable through the new pin's lineage — O(n_updates × corpus)
   executor storage (ADVICE r12 item 1). The superseded generation must
   be dropped once the new one is materialized.

``pin(df, corpus_scale=True)`` addresses (1): when the session has a
checkpoint dir configured (``sparkContext.setCheckpointDir`` — routine on
real clusters; never set in the local bench/tests, so local behavior is
bit-identical to r12), corpus-scale pins become reliable checkpoints.
``unpin(df)`` addresses (2): it releases the pinned RDD's storage; the
incremental operators call it on the superseded generation after eagerly
materializing the new one (see ``BM25.fit_update``).

Both pin flavors place a ``LogicalRDD`` leaf in the plan, which erases
the planner's size estimate (no auto-broadcast from stats) — the same
trade r12 measured and accepted per call site; call sites that NEED the
planner estimate stay lazy (ngram ``transform`` sizes, profile counts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["pin", "unpin"]


def _has_checkpoint_dir(df: DataFrame) -> bool:
    try:
        return df.sparkSession.sparkContext._jsc.sc().getCheckpointDir() \
            .isDefined()
    except Exception:  # noqa: BLE001 - introspection must never break a plan
        return False


def pin(df: DataFrame, corpus_scale: bool = False,
        eager: bool = False) -> DataFrame:
    """Materialization pin for a frame referenced more than once.

    ``corpus_scale=False`` (default): non-eager ``localCheckpoint`` — the
    r12 pattern, right for small derived tables (counts, stats, codebooks)
    whose recompute-on-executor-loss is cheap anyway.

    ``corpus_scale=True``: the pinned payload is O(corpus) (postings,
    exploded shingles/segments, incidence relations). If the session has a
    checkpoint dir, use a RELIABLE checkpoint so the pin survives executor
    loss; otherwise (local mode, tests, bench) fall back to
    ``localCheckpoint`` unchanged.
    """
    if corpus_scale and _has_checkpoint_dir(df):
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)


def unpin(df: DataFrame) -> None:
    """Release a pin's executor storage — call on a SUPERSEDED generation
    after the superseding pin is materialized (never before: the new
    generation's lineage reads the old pin's blocks, and a truncated
    lineage cannot recompute them).

    Best-effort by design: works when ``df`` is exactly a pinned frame
    (plan root is the pin's ``LogicalRDD``); anything else is a silent
    no-op, so callers can pass whatever they held without bookkeeping
    the pin provenance."""
    try:
        plan = df._jdf.queryExecution().analyzed()
        if plan.getClass().getSimpleName() == "LogicalRDD":
            plan.rdd().unpersist(False)
    except Exception:  # noqa: BLE001 - storage release is advisory
        pass
