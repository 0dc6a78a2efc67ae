"""Streaming serving runtime — the engine's online-scoring surface.

Reference context: the reference's online path delegates to Triton
(merlin/systems/dag/runtimes/triton/runtime.py) — request/response
micro-batching with no watermarks or stateful stream semantics
(SURVEY.md §2.2 "Streaming ops: none"). Our engine replaces that with
Structured Streaming, which is genuinely new surface:

- ``serve_pipeline``: apply ANY batch Pipeline to a stream via
  ``foreachBatch`` — the same operator graph runs in both batch and
  streaming (one definition, two runtimes — the lambda-architecture
  killer Spark was built for).
- ``transform_stream``: for pipelines made of stream-safe ops (projection,
  filters, stream-static joins — e.g. QueryFeatureTable against a static
  feature table), apply directly to the streaming DataFrame and keep
  incremental execution + watermarks.
- ``windowed_rollup``: event-time tumbling-window aggregation with
  watermarked late-data handling — the canonical streaming agg.

At scale: stream-static joins broadcast the feature table per micro-batch;
stateful aggs shard by key across executors with RocksDB-backed state.
"""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from systems_spark.streaming.cdf_source import (  # noqa: F401
    CdcChangeFeedDataSource,
)
from systems_spark.streaming.matview import (  # noqa: F401
    MaterializedAggView,
)
from systems_spark.streaming.sinks import (CdcTable,  # noqa: F401
                                           ConcurrentCommitError,
                                           IdempotentParquetSink,
                                           PartitionedCdcTable)
from systems_spark.streaming.stateful import (  # noqa: F401
    RunningAggregator,
    StreamingFunnel,
    StreamingSessionizer,
    decode_kafka_json,
    kafka_source_options,
)


def transform_stream(pipeline, stream_df: DataFrame) -> DataFrame:
    """Apply a pipeline of stream-safe operators directly (incremental
    execution preserved — use for projection/filter/lookup-join pipelines)."""
    return pipeline.transform(stream_df)


def serve_pipeline(pipeline, stream_df: DataFrame, sink_fn: Callable,
                   checkpoint: Optional[str] = None, trigger: Optional[dict] = None):
    """Run a batch Pipeline over each micro-batch via foreachBatch.

    ``sink_fn(result_df, batch_id)`` receives the scored batch (write to a
    table, push to a cache, answer requests). Returns the StreamingQuery.
    """

    def process(batch_df: DataFrame, batch_id: int):
        sink_fn(pipeline.transform(batch_df), batch_id)

    writer = stream_df.writeStream.foreachBatch(process)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()


def stream_dedup(stream_df: DataFrame, keys, ts_col: Optional[str] = None,
                 watermark: str = "10 minutes") -> DataFrame:
    """Streaming exact dedup on ``keys`` with bounded state.

    With ``ts_col``: ``dropDuplicatesWithinWatermark`` — duplicates are
    suppressed as long as they arrive within the watermark delay of the
    first occurrence, and state for old keys is dropped once the watermark
    passes (the only shape whose state does NOT grow with the key
    cardinality of all time — mandatory for infinite streams). Without
    ``ts_col``: plain ``dropDuplicates`` (state grows forever — only for
    finite backfills).

    Batch twin: ``dedup.ExactDedup`` (content-hash groupBy); this is the
    ingest-time guard in front of it (at-least-once sources re-deliver).
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    if ts_col is None:
        return stream_df.dropDuplicates(keys)
    return (
        stream_df.withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(keys)
    )


def stream_stream_join(left: DataFrame, right: DataFrame, on,
                       left_ts: str, right_ts: str,
                       max_delay: str, watermark: str = "10 minutes",
                       how: str = "inner") -> DataFrame:
    """Windowed stream-stream equi-join: right rows match left rows whose
    event time is within ``[left_ts, left_ts + max_delay]`` (the
    view→purchase attribution shape).

    Both sides get watermarks and the join carries an explicit time-range
    predicate — REQUIRED for stream-stream joins, or state grows without
    bound: the range bounds how long each side's rows are retained, the
    watermark bounds lateness, and Spark drops state older than
    watermark + delay. State is sharded by the join key across executors.
    """
    on = [on] if isinstance(on, str) else list(on)
    l_wm = left.withWatermark(left_ts, watermark)
    r_wm = right.withWatermark(right_ts, watermark)
    cond = [l_wm[k] == r_wm[k] for k in on] + [
        r_wm[right_ts] >= l_wm[left_ts],
        r_wm[right_ts] <= F.expr(f"{left_ts} + interval {max_delay}"),
    ]
    joined = l_wm.join(r_wm, cond, how)
    # drop the right side's duplicated key columns
    for k in on:
        joined = joined.drop(r_wm[k])
    return joined


def windowed_rollup(stream_df: DataFrame, ts_col: str, keys, window: str,
                    watermark: str = "10 minutes", aggs: Optional[list] = None):
    """Event-time tumbling-window aggregation with late-data watermark."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    aggs = aggs or [F.count(F.lit(1)).alias("n")]
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window), *keys)
        .agg(*aggs)
    )


def streaming_hll_registers(stream_df: DataFrame, key_col: str, group_cols,
                            p: int = 8) -> DataFrame:
    """Incremental HyperLogLog register maintenance over a stream — the
    live distinct-count monitor (unique users/ips/sessions per key,
    right now) that an exact streaming ``count(distinct)`` cannot give
    without unbounded state.

    Registers only ever grow by ``max`` — exactly the sketch's merge
    law — so this is a plain streaming aggregation: the state store
    holds ≤ 2^p longs per group FOREVER (no watermark needed for
    boundedness; keys drained from any micro-batch fold in
    idempotently, so replays cannot inflate the estimate). At any point
    the materialized register table equals the batch
    ``hll_registers`` over all events so far bit-for-bit
    (parity-tested), and feeds the same ``hll_estimate`` /
    ``hll_merge`` (functions/sketches.py) as the batch path — one
    sketch, two runtimes. Emit with ``outputMode('update')`` (changed
    registers per batch) or ``'complete'`` (full table)."""
    from systems_spark.functions.sketches import hll_registers

    group_cols = ([group_cols] if isinstance(group_cols, str)
                  else list(group_cols))
    # the batch builder is pure DataFrame ops (fence Generate +
    # aggregation, both stream-safe) — delegate rather than duplicate,
    # so the bit-for-bit streaming/batch parity can never drift
    return hll_registers(stream_df, key_col, group_cols, p)


def streaming_cms_counters(stream_df: DataFrame, key_col: str,
                           depth: int = 4, width: int = 4096) -> DataFrame:
    """Incremental Count-Min counter maintenance over a stream — the
    live frequency monitor (how often has this key appeared so far)
    whose state is bounded at d·w counters FOREVER, no matter the key
    cardinality; the streaming twin of ``streaming_hll_registers``.

    Same delegation discipline: the batch ``cms_counters`` plan (fenced
    double-hash probes + one aggregation) is stream-safe as-is, so the
    drained counter table equals the batch build over all rows so far
    bit-for-bit and feeds the same ``cms_lookup`` / ``cms_merge``. One
    honesty note vs HLL: counters grow by SUM, not max — replaying an
    already-counted micro-batch would double-count, so exactly-once
    here rests on the engine's checkpoint/commit protocol, not on the
    sketch's own algebra. When the counters are materialized through
    ``foreachBatch``, close the loop with
    :class:`~systems_spark.streaming.sinks.IdempotentParquetSink` —
    replayed epochs dedup on write (txn key = (app_id, batch_id)), so
    the landed state stays exactly-once even across crash replays."""
    from systems_spark.functions.sketches import cms_counters

    return cms_counters(stream_df, key_col, depth, width)
