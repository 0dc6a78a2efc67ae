"""Funnel analysis — ordered event-sequence matching over an event log.

The classic product-analytics query (view → click → purchase): for each
user, find the first occurrence of step 1, then the first occurrence of
step 2 strictly AFTER it, and so on — per-user earliest completion of
each funnel prefix. The reference has no event-sequence operator; this
extends the engine's behavioral-analytics surface next to Sessionize
(gap sessions) and the as-of join (point-in-time alignment).

Determinism contract: event order is the lexicographic (event_time,
event_id) pair — integer µs + a unique id — so "strictly after" is a
total order and ties cannot make two engines disagree; every step
completion is a ``min(struct(ts, id))`` aggregate, exact and
shuffle-order-invariant, replayed bit-for-bit by the SQL twin.

100 TB shape: one pass per funnel step — a (user)-keyed equi-join of
the event scan against the previous step's per-user key and one
map-side-combined min-struct aggregation; shuffles carry (user, ts, id)
longs only, no windows, no single-task stage. Steps chain on the same
join key, so consecutive shuffles reuse the user partitioning.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel(events: DataFrame, steps: Sequence[str],
           user_col: str = "user_id", type_col: str = "event_type",
           ts_col: str = "ts_us", id_col: str = "event_id",
           within_us: "int | None" = None,
           cache_steps: bool = True, mode: str = "greedy") -> DataFrame:
    """Per-user earliest funnel completions: one row per (user, step)
    the user reached, with the completing event's ``ts`` and ``id``.
    ``steps`` are event-type values in funnel order; step ``i`` matches
    only events strictly after (ts, id) of the user's step ``i-1`` —
    and, when ``within_us`` is set, at most that many µs later (the
    standard windowed funnel: 'purchased within 7 days of clicking').

    ``mode='greedy'`` (default) is GREEDY first-completion (the
    streaming-friendly convention): each step anchors on the user's
    EARLIEST valid event, and later steps window off that anchor. With
    ``within_us`` set this can miss alternative chains — e.g. view@0,
    clicks@1 and @9, purchase@15, window 10: greedy anchors click@1 and
    the purchase falls outside (1, 11], though the click@9 chain would
    qualify.

    ``mode='exists'`` (VERDICT r5 item 7) answers "does ANY satisfying
    chain exist": a row for (user, step n) iff SOME chain e₁<…<eₙ of the
    right types with every consecutive gap ≤ ``within_us`` exists; the
    reported event is the EARLIEST event that can complete such a chain.
    That decision is per-user sequential, not a join, so it runs as an
    ``applyInPandas`` over user groups — state is a linear scan with
    O(n_steps) live values per user (for feasibility of an event at step
    s it suffices to check the LATEST step-(s−1) chain completion seen
    so far: completions are discovered in ascending (ts, id) order, so
    the latest one maximizes the window check). Without ``within_us``
    the two modes coincide (earliest-subsequence greediness is complete
    when no window can expire), which is property-tested.

    ``cache_steps`` (default on, review r5) pins each step's per-user
    frame with a lazy localCheckpoint: the frame feeds BOTH the next
    step's join and its own output branch of the final union, and
    without the pin each union branch re-executes the step's whole
    prefix chain (Catalyst prunes the branches differently, so exchange
    reuse cannot dedupe them) — the event scan would run ~2× per step.
    Same knob family as pagerank's ``cache_edges``."""
    if len(steps) < 2:
        raise ValueError("a funnel needs at least 2 steps")
    if within_us is not None and within_us < 1:
        raise ValueError("within_us must be >= 1")
    if mode not in ("greedy", "exists"):
        raise ValueError("mode must be 'greedy' or 'exists'")
    if mode == "exists":
        return _funnel_exists(events, steps, user_col, type_col,
                              ts_col, id_col, within_us)
    ev = events.select(F.col(user_col).alias("_u"),
                       F.col(type_col).alias("_t"),
                       F.struct(F.col(ts_col).cast("long").alias("t"),
                                F.col(id_col).cast("long").alias("i"))
                       .alias("_k"))
    per_step = []
    prev = None
    for n, step in enumerate(steps, start=1):
        cand = ev.where(F.col("_t") == step)
        if prev is not None:
            after = F.col("_k") > F.col("_pk")
            if within_us is not None:
                after = after & (F.col("_k.t") <= F.col("_pk.t") + within_us)
            cand = (cand.join(prev.select("_u", F.col("_k").alias("_pk")),
                              on="_u")
                    .where(after)
                    .select("_u", "_t", "_k"))
        cur = cand.groupBy("_u").agg(F.min("_k").alias("_k"))
        if cache_steps:
            cur = cur.localCheckpoint(eager=False)
        per_step.append(cur.select(
            F.col("_u").alias(user_col),
            F.lit(n).cast("long").alias("step"),
            F.lit(step).alias("step_name"),
            F.col("_k.t").alias(ts_col),
            F.col("_k.i").alias(id_col)))
        prev = cur
    out = per_step[0]
    for frame in per_step[1:]:
        out = out.unionByName(frame)
    return out


def _funnel_exists(events: DataFrame, steps: Sequence[str], user_col: str,
                   type_col: str, ts_col: str, id_col: str,
                   within_us: "int | None") -> DataFrame:
    """Chain-existence funnel: per-user linear DP via applyInPandas.

    For each user, events are scanned once in ascending (ts, id) order;
    ``last[s]`` holds the latest event known to complete a step-(s+1)
    chain. An event of type ``steps[s]`` completes a chain iff s == 0 or
    ``last[s-1]`` exists, precedes it, and (windowed) falls within
    ``within_us`` — checking only the latest completion is sufficient
    because it maximizes the window's lower bound. The first event to
    complete each prefix is emitted (= the min final event over ALL
    valid chains: any valid chain's predecessor has been recorded into
    ``last`` by the time the final event is scanned)."""
    import pandas as pd
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    n_steps = len(steps)
    steps_t = tuple(steps)
    # positions per type, DESCENDING: an event whose type appears at
    # consecutive positions (e.g. ("view","click","click")) must not
    # chain with ITSELF — updating last[s] only after the higher
    # positions were tried keeps every chain strictly increasing
    positions = {}
    for i, s in enumerate(steps_t):
        positions.setdefault(s, []).insert(0, i)
    # the user column keeps its input type (greedy mode preserves it
    # too; hardcoding long broke string/uuid user ids — review r6)
    out_schema = StructType([
        StructField(user_col, events.schema[user_col].dataType),
        StructField("step", LongType()),
        StructField("step_name", StringType()),
        StructField(ts_col, LongType()),
        StructField(id_col, LongType()),
    ])

    def per_user(pdf: "pd.DataFrame") -> "pd.DataFrame":
        u = pdf[user_col].iloc[0]
        sub = pdf.sort_values([ts_col, id_col])
        last = [None] * n_steps   # latest (ts, id) completing prefix s+1
        first = [None] * n_steps  # earliest completion per prefix
        for t, i, typ in zip(sub[ts_col].to_numpy(),
                             sub[id_col].to_numpy(),
                             sub[type_col].to_numpy()):
            for s in positions.get(typ, ()):
                if s > 0:
                    p = last[s - 1]
                    if p is None or (t, i) <= p:
                        continue
                    if within_us is not None and t > p[0] + within_us:
                        continue
                last[s] = (int(t), int(i))
                if first[s] is None:
                    first[s] = (int(t), int(i))
        rows = [(u, s + 1, steps_t[s], first[s][0], first[s][1])
                for s in range(n_steps) if first[s] is not None]
        return pd.DataFrame(
            rows, columns=[user_col, "step", "step_name", ts_col, id_col])

    ev = events.select(F.col(user_col), F.col(type_col),
                       F.col(ts_col).cast("long").alias(ts_col),
                       F.col(id_col).cast("long").alias(id_col))
    return ev.groupBy(user_col).applyInPandas(per_user, schema=out_schema)


def funnel_summary(events: DataFrame, steps: Sequence[str], **kw) -> DataFrame:
    """(step, step_name, users): how many users reached each step.
    (funnel already emits one row per user per reached step, so a plain
    count per step is the per-step user count.)"""
    return (funnel(events, steps, **kw)
            .groupBy("step", "step_name")
            .agg(F.count(F.lit(1)).alias("users")))


def funnel_step_ctes(events_sql: str, steps: Sequence[str],
                     user_col: str = "user_id",
                     type_col: str = "event_type",
                     ts_col: str = "ts_us",
                     id_col: str = "event_id",
                     within_us: "int | None" = None):
    """The shared greedy-chaining CTE list (``e``, ``s1``..``sN`` with
    ``sN`` = (u, k struct) per user who reached step N) every
    funnel-shaped oracle composes — one definition so summary and
    latency twins can never drift. Returns (ctes, escaped_steps).
    ``ts_col`` is a COLUMN NAME (referenced as ``e.<ts_col>``) — alias
    any expression like epoch_us(ts) inside ``events_sql`` first."""
    if len(steps) < 2:
        raise ValueError("a funnel needs at least 2 steps")
    if within_us is not None and within_us < 1:
        raise ValueError("within_us must be >= 1")
    # step names are interpolated as SQL string literals — escape
    # apostrophes so a value like "add'l info" cannot break the SQL
    # (ADVICE r5)
    steps = [s.replace("'", "''") for s in steps]
    k = f"struct_pack(t := e.{ts_col}, i := e.{id_col})"
    win = (f" AND e.{ts_col} <= (p.k).t + {within_us}"
           if within_us is not None else "")
    ctes = [f"e AS ({events_sql})"]
    for n, step in enumerate(steps, start=1):
        if n == 1:
            ctes.append(
                f"s1 AS (SELECT e.{user_col} AS u, min({k}) AS k "
                f"FROM e WHERE e.{type_col} = '{step}' GROUP BY 1)")
        else:
            ctes.append(f"""s{n} AS (
  SELECT e.{user_col} AS u, min({k}) AS k
  FROM e JOIN s{n - 1} p ON p.u = e.{user_col}
  WHERE e.{type_col} = '{step}' AND {k} > p.k{win}
  GROUP BY 1
)""")
    return ctes, steps


def funnel_summary_sql(events_sql: str, steps: Sequence[str],
                       user_col: str = "user_id",
                       type_col: str = "event_type",
                       ts_col: str = "ts_us",
                       id_col: str = "event_id",
                       within_us: "int | None" = None) -> str:
    """DuckDB twin of :func:`funnel_summary` — same (ts, id) total order
    and min-struct step chaining (see :func:`funnel_step_ctes`)."""
    ctes, steps = funnel_step_ctes(events_sql, steps, user_col, type_col,
                                   ts_col, id_col, within_us)
    selects = [
        f"SELECT {n}::BIGINT AS step, '{step}' AS step_name, "
        f"count(*)::BIGINT AS users FROM s{n}"
        for n, step in enumerate(steps, start=1)
    ]
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL ".join(selects)
