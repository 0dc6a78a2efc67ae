"""Custom stateful streaming operators (applyInPandasWithState).

This is new design surface relative to the reference: Merlin Systems has no
stream-state semantics at all (SURVEY.md §2.2 "Streaming ops: none" —
merlin/systems/dag/runtimes/triton/runtime.py handles request batching
only). The batch `Sessionize` operator (operators/sessionize.py) computes
gap-based sessions with a window-lag over complete data; this module is its
streaming twin: the same session semantics over an unbounded stream, with
explicit per-key state and event-time timeouts so sessions close even when
a user goes silent.

Scale design: state is sharded by the group key across executors (one
GroupState per key, RocksDB-backed with
`spark.sql.streaming.stateStore.providerClass` in production), and the
watermark bounds state size — closed sessions are emitted and their state
cleared, so memory is O(active keys), not O(history).
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)


class StreamingSessionizer:
    """Gap-based sessionization over a stream with explicit keyed state.

    Events for the same ``key_col`` that arrive within ``gap`` seconds of
    each other belong to one session; a session is emitted when either
    (a) an in-batch event arrives more than ``gap`` after the session's
    last event, or (b) the event-time watermark passes last_ts + gap
    (state timeout — the silent-user case a batch job never has to solve).

    Output rows: key, session_start (µs), session_end (µs), n_events,
    total_value.

    Batch twin: ``systems_spark.operators.sessionize.Sessionize`` — the
    oracle-parity test asserts both produce identical sessions on the same
    (replayed) data once the stream is fully drained.
    """

    def __init__(self, key_col: str, ts_col: str, gap_seconds: int,
                 value_col: str | None = None,
                 watermark: str = "10 seconds"):
        self.key_col = key_col
        self.ts_col = ts_col
        self.gap_seconds = int(gap_seconds)
        self.value_col = value_col
        self.watermark = watermark

    def output_schema(self, key_type=StringType()) -> StructType:
        return StructType([
            StructField(self.key_col, key_type),
            StructField("session_start_us", LongType()),
            StructField("session_end_us", LongType()),
            StructField("n_events", LongType()),
            StructField("total_value", DoubleType()),
        ])

    @property
    def state_schema(self) -> StructType:
        return StructType([
            StructField("session_start_us", LongType()),
            StructField("last_ts_us", LongType()),
            StructField("n_events", LongType()),
            StructField("total_value", DoubleType()),
        ])

    def __call__(self, stream_df: DataFrame) -> DataFrame:
        # locals only in the worker closure (executor-closure hygiene:
        # the package is not installed on executors)
        key_col = self.key_col
        ts_col = self.ts_col
        value_col = self.value_col
        gap_us = self.gap_seconds * 1_000_000

        def sessionize(
            key: Tuple,
            pdfs: Iterator[pd.DataFrame],
            state: GroupState,
        ) -> Iterator[pd.DataFrame]:
            out = []

            def emit(start, last, n, total):
                out.append((key[0], int(start), int(last), int(n), float(total)))

            if state.hasTimedOut:
                start, last, n, total = state.get
                emit(start, last, n, total)
                state.remove()
            else:
                if state.exists:
                    start, last, n, total = state.get
                else:
                    start = last = None
                    n, total = 0, 0.0
                rows = pd.concat(list(pdfs), ignore_index=True)
                # event-time order within the batch; µs integers end-to-end.
                # _ss_ts_us precomputed JVM-side (unix_micros): true epoch
                # µs regardless of spark.sql.session.timeZone — a pandas
                # datetime64 conversion here would bake the session-tz
                # offset into the emitted session bounds (review r5)
                rows = rows.rename(columns={"_ss_ts_us": "_ts_us"}) \
                           .sort_values("_ts_us")
                vals = (
                    rows[value_col].astype(float)
                    if value_col is not None
                    else pd.Series(0.0, index=rows.index)
                )
                for t, v in zip(rows["_ts_us"].to_numpy(), vals.to_numpy()):
                    if last is not None and t - last > gap_us:
                        emit(start, last, n, total)
                        start, n, total = t, 0, 0.0
                    elif last is None:
                        start = t
                    last = t
                    n += 1
                    total += v
                state.update((int(start), int(last), int(n), float(total)))
                # close the open session once the watermark passes last+gap
                state.setTimeoutTimestamp(int(last) // 1000 + gap_us // 1000)

            yield pd.DataFrame(
                out,
                columns=[key_col, "session_start_us", "session_end_us",
                         "n_events", "total_value"],
            )

        key_type = stream_df.schema[key_col].dataType
        with_wm = (stream_df
                   .withColumn("_ss_ts_us", F.unix_micros(F.col(ts_col)))
                   .withWatermark(ts_col, self.watermark))
        return (
            with_wm.groupBy(key_col)
            .applyInPandasWithState(
                sessionize,
                outputStructType=self.output_schema(key_type),
                stateStructType=self.state_schema,
                outputMode="append",
                timeoutConf=GroupStateTimeout.EventTimeTimeout,
            )
        )


class StreamingFunnel:
    """Streaming funnel — a per-user STATE MACHINE advancing through the
    ordered ``steps`` as matching events arrive (the streaming twin of
    ``operators/funnel.py``).

    State per user: (step index reached, anchor ts µs, anchor event id).
    Each micro-batch processes the user's events in (ts, id) order and
    advances the machine greedily — exactly the batch operator's greedy
    first-completion semantics — emitting one (user, step, step_name,
    ts_us, event_id) row per completion, in append mode.

    Ordering caveat (inherent to streaming): the machine consumes events
    in (batch, ts, id) order. An event that arrives in a LATER micro-batch
    with an EARLIER timestamp than an already-consumed anchor cannot
    retroactively produce the earlier chain the batch operator would find;
    state stays consistent (anchors only move forward), the completion
    just anchors later. On an in-order replay — or any single-batch
    ``availableNow`` drain — the output equals the batch operator's
    bit-for-bit (parity-tested).

    State lifecycle (review r5): THREE longs per user who made ANY
    progress — users whose events never match step 1 store nothing, and
    a COMPLETED user keeps a terminal tombstone (removing it would let a
    later batch restart the funnel and emit duplicate chains the batch
    twin never produces). With ``within_us`` set, mid-funnel state whose
    window the watermark has passed is reclaimed via event-time timeout —
    such an anchor can never advance; a reclaimed user may start a FRESH
    chain from later events (reset semantics — the batch greedy operator
    instead stays anchored forever; windowed multi-batch replays are
    therefore not bit-comparable, single-batch drains are). Without
    ``within_us``, mid-funnel state would persist indefinitely — a user
    may legitimately convert months later; ``state_ttl_us`` (VERDICT r5
    item 8) bounds that operationally with the SAME event-time timeout
    machinery: mid-funnel state whose anchor is ``state_ttl_us`` behind
    the watermark is reclaimed (an expired user's later events may start
    a fresh chain — the same reset semantics as window expiry).
    COMPLETED users' terminal tombstones are exempt from the TTL: they
    are what prevents a restart from emitting duplicate chains, so
    expiring them would break batch parity for completed chains; three
    longs per CONVERTED user is the deliberate floor of this operator's
    state. When both knobs are set, whichever deadline is earlier arms
    the timeout.
    """

    def __init__(self, steps, user_col: str = "user_id",
                 type_col: str = "event_type", ts_col: str = "ts_ts",
                 id_col: str = "event_id", watermark: str = "10 seconds",
                 within_us: "int | None" = None,
                 state_ttl_us: "int | None" = None):
        if len(steps) < 2:
            raise ValueError("a funnel needs at least 2 steps")
        if within_us is not None and within_us < 1:
            raise ValueError("within_us must be >= 1")
        if state_ttl_us is not None and state_ttl_us < 1:
            raise ValueError("state_ttl_us must be >= 1")
        self.steps = tuple(steps)
        self.user_col = user_col
        self.type_col = type_col
        self.ts_col = ts_col
        self.id_col = id_col
        self.watermark = watermark
        self.within_us = within_us
        self.state_ttl_us = state_ttl_us

    def output_schema(self, key_type) -> StructType:
        return StructType([
            StructField(self.user_col, key_type),
            StructField("step", LongType()),
            StructField("step_name", StringType()),
            StructField("ts_us", LongType()),
            StructField(self.id_col, LongType()),
        ])

    @property
    def state_schema(self) -> StructType:
        return StructType([
            StructField("cur_step", LongType()),
            StructField("anchor_ts_us", LongType()),
            StructField("anchor_id", LongType()),
        ])

    def __call__(self, stream_df: DataFrame) -> DataFrame:
        steps = self.steps
        type_col, id_col = self.type_col, self.id_col
        user_col = self.user_col
        within_us = self.within_us
        n_steps = len(steps)

        state_ttl_us = self.state_ttl_us

        def advance(key, pdfs, state: GroupState):
            cols = [user_col, "step", "step_name", "ts_us", id_col]
            out = []
            if state.hasTimedOut:
                # armed only on MID-funnel state: either the within_us
                # window expired (the anchor can never advance) or the
                # state_ttl_us idle bound passed — reclaim the state (a
                # fresh chain may restart later; see the reset-semantics
                # docstring note)
                state.remove()
                yield pd.DataFrame(out, columns=cols)
                return
            if state.exists:
                cur, a_t, a_i = state.get
            else:
                cur, a_t, a_i = 0, -1, -1
            if cur >= n_steps:  # terminal tombstone: blocks re-entry
                yield pd.DataFrame(out, columns=cols)
                return
            rows = pd.concat(list(pdfs), ignore_index=True)
            # _ts_us precomputed JVM-side (unix_micros): true epoch µs
            # regardless of spark.sql.session.timeZone — converting the
            # tz-naive pandas timestamps here would bake the session
            # offset into ts_us (review r5)
            rows = rows.sort_values(["_ts_us", id_col])
            for t, i, typ in zip(rows["_ts_us"].to_numpy(),
                                 rows[id_col].to_numpy(),
                                 rows[type_col].to_numpy()):
                if cur >= n_steps:
                    break
                if typ != steps[cur]:
                    continue
                if cur > 0:
                    if (t, i) <= (a_t, a_i):
                        continue
                    if within_us is not None and t > a_t + within_us:
                        continue
                cur += 1
                a_t, a_i = int(t), int(i)
                out.append((key[0], cur, steps[cur - 1], a_t, a_i))
            if cur == 0 and not state.exists:
                pass  # zero progress: storing (0, -1, -1) would grow the
                #       state store by every user ever seen (review r5)
            else:
                # completed users keep a terminal tombstone — removing it
                # would let the next batch restart the funnel and emit
                # duplicate chains the batch twin never produces
                state.update((int(cur), int(a_t), int(a_i)))
                if 0 < cur < n_steps:
                    # mid-funnel only: window expiry means no event can
                    # ever advance this anchor; the idle TTL bounds
                    # abandoned funnels. Earliest deadline arms — clamped
                    # ABOVE the current watermark: when a non-advancing
                    # event arrives after the anchor's deadline already
                    # passed, re-arming with the stale timestamp would
                    # raise INVALID_TIMEOUT_TIMESTAMP and kill the query
                    # (review r6); clamping fires the timeout in the
                    # next batch instead.
                    deadlines = [a_t + d for d in (within_us, state_ttl_us)
                                 if d is not None]
                    if deadlines:
                        ts_ms = min(deadlines) // 1000 + 1
                        wm_ms = state.getCurrentWatermarkMs()
                        state.setTimeoutTimestamp(max(ts_ms, wm_ms + 1))
            yield pd.DataFrame(out, columns=cols)

        key_type = stream_df.schema[self.user_col].dataType
        with_wm = (stream_df
                   .withColumn("_ts_us", F.unix_micros(F.col(self.ts_col)))
                   .withWatermark(self.ts_col, self.watermark))
        use_timeout = within_us is not None or self.state_ttl_us is not None
        return (
            with_wm.groupBy(self.user_col)
            .applyInPandasWithState(
                advance,
                outputStructType=self.output_schema(key_type),
                stateStructType=self.state_schema,
                outputMode="append",
                timeoutConf=(GroupStateTimeout.EventTimeTimeout
                             if use_timeout
                             else GroupStateTimeout.NoTimeout),
            )
        )


class RunningAggregator:
    """Per-key running (count, sum) over a stream via the Spark 4
    ``transformWithStateInPandas`` StatefulProcessor API — the successor to
    applyInPandasWithState, with typed state handles and native state TTL.

    Emits one updated (key, n_events, total_value) row per key per
    micro-batch (Update mode). ``ttl`` (e.g. "1 hour") expires idle keys'
    state server-side — the operational guard for unbounded key spaces
    (anonymous visitors, one-shot ids) that a hand-rolled timeout can't
    match for robustness.

    The processor class is defined inside ``__call__`` so cloudpickle
    serializes it BY VALUE (executor workers don't import this package).

    Runtime dependency: Spark's transformWithState protocol speaks
    protobuf — ``google.protobuf`` must be importable by the Python
    workers (it ships with any real PySpark deployment; the test is
    importorskip-gated for minimal containers). The applyInPandasWithState
    operators above have no such dependency.
    """

    #: ms per supported TTL unit (singular; trailing "s" accepted)
    _TTL_UNITS = {"ms": 1, "millisecond": 1, "second": 1_000,
                  "minute": 60_000, "hour": 3_600_000, "day": 86_400_000}

    @classmethod
    def parse_ttl_ms(cls, ttl: str) -> int:
        """Validate DRIVER-side: a bad unit must raise a readable error at
        construction, not an opaque AttributeError inside the executor's
        StatefulProcessor.init (r1 ADVICE)."""
        import re as _re

        m = _re.fullmatch(r"\s*(\d+)\s*([a-zA-Z]+?)s?\s*", ttl)
        unit = m.group(2).lower() if m else None
        if unit == "m":  # "5 ms" consumes the s → unit "m"; restore
            unit = "ms"
        if m is None or unit not in cls._TTL_UNITS:
            raise ValueError(
                f"unsupported ttl {ttl!r}; expected '<n> <unit>' with unit in "
                f"{sorted(cls._TTL_UNITS)}"
            )
        return int(m.group(1)) * cls._TTL_UNITS[unit]

    def __init__(self, key_col: str, value_col: str, ttl: str = None):
        self.key_col = key_col
        self.value_col = value_col
        self.ttl = ttl
        self.ttl_ms = self.parse_ttl_ms(ttl) if ttl is not None else None

    def __call__(self, stream_df: DataFrame) -> DataFrame:
        from pyspark.sql.streaming.stateful_processor import (
            StatefulProcessor,
            StatefulProcessorHandle,
        )

        key_col, value_col = self.key_col, self.value_col
        ttl_ms_parsed = self.ttl_ms
        key_type = stream_df.schema[key_col].dataType
        out_schema = StructType([
            StructField(key_col, key_type),
            StructField("n_events", LongType()),
            StructField("total_value", DoubleType()),
        ])
        state_schema = StructType([
            StructField("n", LongType()),
            StructField("total", DoubleType()),
        ])

        class Agg(StatefulProcessor):  # local: pickled by value
            def init(self, handle: StatefulProcessorHandle) -> None:
                # ttl already validated/parsed driver-side (parse_ttl_ms)
                self._agg = handle.getValueState("agg", state_schema, ttl_ms_parsed)

            def handleInputRows(self, key, rows, timerValues):
                n, total = (self._agg.get() or (0, 0.0)) if self._agg.exists() \
                    else (0, 0.0)
                for pdf in rows:
                    n += len(pdf)
                    total += float(pdf[value_col].sum())
                self._agg.update((int(n), float(total)))
                yield pd.DataFrame(
                    {key_col: [key[0]], "n_events": [int(n)],
                     "total_value": [float(total)]}
                )

            def close(self) -> None:
                pass

        return (
            stream_df.groupBy(key_col)
            .transformWithStateInPandas(
                statefulProcessor=Agg(),
                outputStructType=out_schema,
                outputMode="Update",
                timeMode="None",
            )
        )


class StreamingCusum:
    """Streaming CUSUM monitor — the live twin of
    ``operators/cusum.py cusum_chart``: per key, the two one-sided
    statistics S⁺/S⁻ advance over events in (ts, id) order and every
    monitored row is emitted with its statistics and alert flags.

    State per key: TWO longs (S⁺, S⁻) — bounded forever regardless of
    event count. CUSUM state is FORWARD-ONLY (each row's statistic
    depends only on the running pair), so unlike the funnel machine,
    any in-(ts, id)-order multi-batch replay is bit-equal to the batch
    chart — parity holds across arbitrary batch splits, not just
    single-batch drains (tested with a 3-batch split). Out-of-order
    arrival across batches anchors later, same caveat as every
    streaming operator here. Downstream materialization: emitted rows
    written through ``foreachBatch`` should use
    :class:`~systems_spark.streaming.sinks.IdempotentParquetSink` so a
    crash-replayed epoch cannot land its alert rows twice.
    """

    def __init__(self, key_col: str, ts_col: str, id_col: str,
                 value_col: str, target_micros: int,
                 slack_micros: int = 0, h_micros: int = 1,
                 watermark: str = "10 seconds"):
        from systems_spark.operators.cusum import _check_cusum

        _check_cusum(slack_micros, h_micros)
        self.key_col = key_col
        self.ts_col = ts_col
        self.id_col = id_col
        self.value_col = value_col
        self.target_micros = int(target_micros)
        self.slack_micros = int(slack_micros)
        self.h_micros = int(h_micros)
        self.watermark = watermark

    def output_schema(self, key_type) -> StructType:
        return StructType([
            StructField(self.key_col, key_type),
            StructField("ts_us", LongType()),
            StructField(self.id_col, LongType()),
            StructField(self.value_col, LongType()),
            StructField("s_pos_micros", LongType()),
            StructField("s_neg_micros", LongType()),
            StructField("alert_up", LongType()),
            StructField("alert_down", LongType()),
        ])

    @property
    def state_schema(self) -> StructType:
        return StructType([
            StructField("s_pos", LongType()),
            StructField("s_neg", LongType()),
        ])

    def __call__(self, stream_df: DataFrame) -> DataFrame:
        key_col, id_col = self.key_col, self.id_col
        value_col = self.value_col
        up = self.target_micros + self.slack_micros
        dn = self.target_micros - self.slack_micros
        h = self.h_micros

        def monitor(key, pdfs, state: GroupState):
            cols = [key_col, "ts_us", id_col, value_col,
                    "s_pos_micros", "s_neg_micros", "alert_up",
                    "alert_down"]
            s_pos, s_neg = state.get if state.exists else (0, 0)
            rows = pd.concat(list(pdfs), ignore_index=True)
            # _ts_us precomputed JVM-side (unix_micros) — the
            # session-timezone lesson, same as the sessionizer/funnel
            rows = rows.sort_values(["_ts_us", id_col])
            out = []
            for t, i, v in zip(rows["_ts_us"].to_numpy(),
                               rows[id_col].to_numpy(),
                               rows[value_col].to_numpy()):
                s_pos = max(0, s_pos + (int(v) - up))
                s_neg = max(0, s_neg + (dn - int(v)))
                out.append((key[0], int(t), int(i), int(v), s_pos,
                            s_neg, int(s_pos > h), int(s_neg > h)))
            state.update((int(s_pos), int(s_neg)))
            yield pd.DataFrame(out, columns=cols)

        key_type = stream_df.schema[self.key_col].dataType
        with_wm = (stream_df
                   # NULL values excluded JVM-side, matching the batch
                   # chart's contract — a NULL reaching pandas becomes
                   # NaN and int(v) would kill the query (review r6)
                   .where(F.col(self.value_col).isNotNull())
                   .withColumn("_ts_us", F.unix_micros(F.col(self.ts_col)))
                   .withWatermark(self.ts_col, self.watermark))
        return (
            with_wm.groupBy(self.key_col)
            .applyInPandasWithState(
                monitor,
                outputStructType=self.output_schema(key_type),
                stateStructType=self.state_schema,
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout,
            )
        )


def kafka_source_options(brokers: str, topics: str, *,
                         starting_offsets: str = "latest",
                         fail_on_data_loss: bool = False,
                         max_offsets_per_trigger: int | None = None,
                         **extra: str) -> dict:
    """Canonical Kafka source configuration (config surface only — the
    container has no broker or kafka connector jar; at deploy time pass
    these to ``spark.readStream.format("kafka").options(**opts).load()``).

    `maxOffsetsPerTrigger` is the scale knob: it caps per-micro-batch read
    volume so a backlogged topic can't produce an unbounded first batch.
    """
    opts = {
        "kafka.bootstrap.servers": brokers,
        "subscribe": topics,
        "startingOffsets": starting_offsets,
        "failOnDataLoss": str(fail_on_data_loss).lower(),
    }
    if max_offsets_per_trigger is not None:
        opts["maxOffsetsPerTrigger"] = str(max_offsets_per_trigger)
    opts.update(extra)
    return opts


def decode_kafka_json(raw: DataFrame, schema: StructType) -> DataFrame:
    """Decode a Kafka-wire DataFrame (binary key/value + metadata) into
    typed columns: JSON value parsed against ``schema``, key as string.
    Works on any DataFrame with Kafka's wire schema, so it is unit-testable
    without a broker."""
    return raw.select(
        F.col("key").cast("string").alias("kafka_key"),
        F.from_json(F.col("value").cast("string"), schema).alias("v"),
        "topic", "partition", "offset", "timestamp",
    ).select("kafka_key", "v.*", "topic", "partition", "offset", "timestamp")
