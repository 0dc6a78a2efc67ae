"""Sessionize — gap-based event sessionization.

Assigns a session id to every event: a new session starts when the gap to
the user's previous event exceeds ``gap``. The canonical clickstream
primitive (the reference has no streaming/session ops — SURVEY.md §2.2 —
but any events-table pipeline needs it; Structured Streaming's native
``session_window`` covers the streaming side, this operator the batch side
with deterministic, oracle-checkable output).

Spark shape: ONE shuffle (partition by user), two window passes over it
(lag → flag, running sum → session id) that share the same sort — Catalyst
executes them in a single Window stage. Works on integer timestamps (ns/µs
longs) or TimestampType alike.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from systems_spark.operators.base import Operator


class Sessionize(Operator):
    def __init__(self, user_col: str, ts_col: str, gap, order_cols=(),
                 session_col: str = "session_id", closed: str = "right"):
        """``gap`` in the same unit as ``ts_col`` (e.g. ns for int64-nanos).
        ``order_cols`` break ordering ties deterministically (e.g. event_id).

        ``closed`` fixes the boundary convention for an inter-event gap
        EXACTLY equal to ``gap``: ``"right"`` (default) keeps it in the
        same session (split on diff > gap) — empirically the convention of
        Structured Streaming's ``session_window``, which merges an event
        landing exactly on the previous session's end (pinned in
        test_sessionize_closed_left_matches_session_window_boundary), so
        batch backfills with the default agree event-for-event with the
        streaming twin. ``"left"`` splits at the boundary (split on
        diff >= gap), the end-exclusive convention some SQL sessionization
        definitions use."""
        if closed not in ("right", "left"):
            raise ValueError("closed must be 'right' or 'left'")
        self.user_col = user_col
        self.ts_col = ts_col
        self.gap = gap
        self.order_cols = list(order_cols)
        self.session_col = session_col
        self.closed = closed
        self.requires = (user_col, ts_col)

    def transform(self, df: DataFrame) -> DataFrame:
        order = [F.col(self.ts_col).asc()] + [F.col(c).asc() for c in self.order_cols]
        w = Window.partitionBy(self.user_col).orderBy(*order)
        prev_ts = F.lag(self.ts_col).over(w)
        diff = F.col(self.ts_col) - prev_ts
        split = diff >= self.gap if self.closed == "left" else diff > self.gap
        new_session = F.when(prev_ts.isNull() | split, 1).otherwise(0)
        running = Window.partitionBy(self.user_col).orderBy(*order).rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        return df.withColumn("_new_s", new_session).withColumn(
            self.session_col, F.sum("_new_s").over(running).cast("long")
        ).drop("_new_s")

    def compute_output_schema(self, input_schema):
        from systems_spark.schema import ColumnSchema, Schema

        return input_schema + Schema([ColumnSchema(self.session_col, "int64")])

    def get_params(self):
        return {"user_col": self.user_col, "ts_col": self.ts_col, "gap": self.gap,
                "order_cols": self.order_cols, "session_col": self.session_col,
                "closed": self.closed}
