"""Change-data-capture merge — MERGE INTO semantics on plain DataFrames.

The lakehouse upsert primitive Spark lacks without a table format: given
a SNAPSHOT and a batch of CHANGES (insert/update/delete rows carrying a
sequence number), produce the next snapshot. Delta/Iceberg/Hudi each
ship this as `MERGE INTO`; here it is the declarative three-step plan:

1. collapse the change batch to its LAST operation per key (one window
   over the CHANGES — batch-sized, never snapshot-sized);
2. untouched snapshot rows pass through an ANTI join on the touched
   keys (AQE broadcasts the batch-derived key set when it is small —
   the daily-ingest case — so the snapshot is never shuffled);
3. surviving last-ops (insert/update) append their payloads; deletes
   simply emit nothing.

Semantics (the Debezium/Hudi convention):

- ``op_col`` ∈ {insert, update, delete} — insert and update are both
  "upsert" (an update for an absent key inserts it; an insert over a
  present key replaces it), delete removes the key and is a no-op for
  absent keys;
- ``seq_col`` orders multiple changes to one key within the batch; only
  the LAST wins — an update followed by a delete deletes, a delete
  followed by an insert re-inserts with the new payload;
- (key, seq) must be unique — a tie would make "last" nondeterministic,
  so it raises by default (``check_unique_seq=False`` to skip the one
  batch-sized aggregation when uniqueness is guaranteed upstream).

At 100 TB: cost is one batch window + one key anti-join per merge —
proportional to the CHANGE batch, plus a snapshot pass-through that
never exchanges when the key set broadcasts. Chain per micro-batch with
``streaming/sinks.IdempotentParquetSink`` for an exactly-once CDC
pipeline on plain parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["apply_cdc", "apply_cdc_sql", "merge_cdc_fenced"]

_OPS = ("insert", "update", "delete")


def _op_checked(op_col: str, what: str):
    """An unknown op value becomes an explicit execution-time error,
    never a silent drop or a silent upsert."""
    return (F.when(F.col(op_col).isin(*_OPS), F.col(op_col))
            .otherwise(F.raise_error(F.concat(
                F.lit(f"{what}: unknown {op_col} value: "),
                F.col(op_col)))))


def _touched_join(snapshot: DataFrame, touched: DataFrame, key_cols,
                  how: str) -> DataFrame:
    """Anti/semi join on the touched-key set, NULL-SAFE: a NULL key is a
    real key (the table_diff convention), so a NULL-keyed change must
    match a NULL-keyed snapshot row — a plain equi-join would let the
    old row through AND append the change, duplicating the key."""
    t = touched.select(*[F.col(k).alias(f"_cdc_t_{i}")
                         for i, k in enumerate(key_cols)])
    cond = [F.col(k).eqNullSafe(F.col(f"_cdc_t_{i}"))
            for i, k in enumerate(key_cols)]
    return snapshot.join(t, on=cond, how=how)


def _check_unique_seq(changes: DataFrame, key_cols, seq_col: str,
                      what: str) -> None:
    """(key, seq) ties make 'last change wins' nondeterministic — raise
    with a sample instead of silently picking a winner."""
    dup = (changes.groupBy(*key_cols, seq_col)
           .agg(F.count(F.lit(1)).alias("_n"))
           .where(F.col("_n") > 1).limit(3).collect())
    if dup:
        keys = [tuple(r[c] for c in key_cols + [seq_col]) for r in dup]
        raise ValueError(
            f"{what}: (key, {seq_col}) must be unique within a "
            f"change batch — 'last change wins' is nondeterministic "
            f"under ties. Duplicated sample: {keys}")


def apply_cdc(snapshot: DataFrame, changes: DataFrame, key_cols,
              seq_col: str = "seq", op_col: str = "op",
              check_unique_seq: bool = True) -> DataFrame:
    """Next snapshot after applying ``changes`` to ``snapshot``.

    ``changes`` carries the snapshot's payload columns plus ``seq_col``
    and ``op_col``; the result has exactly the snapshot's columns."""
    key_cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    if not key_cols:
        raise ValueError("key_cols must not be empty")
    payload = [c for c in snapshot.columns]
    missing = [c for c in payload + [seq_col, op_col]
               if c not in changes.columns]
    if missing:
        raise ValueError(f"changes is missing columns: {missing}")
    if check_unique_seq:
        _check_unique_seq(changes, key_cols, seq_col, "apply_cdc")

    # op validation folded into the projection (no extra job), applied to
    # EVERY change — a garbage op must raise even when a later seq
    # supersedes it (silent acceptance would hide producer bugs)
    changes = changes.withColumn(op_col, _op_checked(op_col, "apply_cdc"))
    w = Window.partitionBy(*key_cols).orderBy(F.col(seq_col).desc())
    last = (changes
            .withColumn("_cdc_rn", F.row_number().over(w))
            .where(F.col("_cdc_rn") == 1))

    touched = last.select(*key_cols)
    untouched = _touched_join(snapshot, touched, key_cols, "anti")
    upserts = (last.where(F.col(op_col) != "delete")
               .select(*payload))
    return untouched.unionByName(upserts)


def fold_last_change(changes: DataFrame, key_cols, payload,
                     seq_col: str, op_col: str, deleted_col: str,
                     check_unique_seq=True,
                     what: str = "fold_last_change") -> DataFrame:
    """Per-key winner of a change batch (the highest-``seq`` row),
    projected to snapshot shape: payload + seq + tombstone flag. The
    shared fold behind :func:`merge_cdc_fenced` and the change-feed
    fast path.

    ``check_unique_seq``: ``True`` runs the eager sample check (one
    small job — right for write paths, which want to fail BEFORE
    staging anything); ``"inline"`` defers the same (key, seq)-tie
    guard to execution time — a count over (key, seq) rides the winner
    window's own shuffle (partitioning on the key prefix satisfies the
    finer clustering), and the winner row raises if its (key, seq) is
    duplicated. Read-side folds use inline so materializing a
    merge-on-read snapshot never pays an extra validation job."""
    key_cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    payload = list(payload)
    if check_unique_seq == "inline":
        w2 = Window.partitionBy(*key_cols, seq_col)
        changes = changes.withColumn(
            "_cdc_ties", F.count(F.lit(1)).over(w2))
    elif check_unique_seq:
        _check_unique_seq(changes, key_cols, seq_col, what)
    changes = changes.withColumn(op_col, _op_checked(op_col, what))
    w = Window.partitionBy(*key_cols).orderBy(F.col(seq_col).desc())
    seq_out = F.col(seq_col)
    if check_unique_seq == "inline":
        seq_out = F.when(
            F.col("_cdc_ties") > 1,
            F.raise_error(F.concat(
                F.lit(f"{what}: (key, {seq_col}) must be unique "
                      f"within a change batch — 'last change wins' is "
                      f"nondeterministic under ties. Duplicated: "),
                F.concat_ws(
                    ",", *[F.col(k).cast("string") for k in key_cols],
                    F.col(seq_col).cast("string"))))
        ).otherwise(F.col(seq_col))
    return (changes
            .withColumn("_cdc_rn", F.row_number().over(w))
            .where(F.col("_cdc_rn") == 1)
            .select(*payload, seq_out.alias(seq_col),
                    (F.col(op_col) == "delete").alias(deleted_col)))


def merge_cdc_fenced(snapshot: DataFrame, changes: DataFrame, key_cols,
                     seq_col: str = "seq", op_col: str = "op",
                     deleted_col: str = "_cdc_deleted",
                     check_unique_seq: bool = True,
                     min_seq: "int | None" = None) -> DataFrame:
    """Sequence-FENCED merge — the order-tolerant CDC step (Hudi's
    precombine / Debezium consumer semantics): the snapshot carries per
    row the ``seq_col`` it was last written at plus a ``deleted_col``
    TOMBSTONE flag, and a change applies only if its seq is GREATER than
    the snapshot row's — so a stale or replayed batch is a per-key
    no-op, batches may arrive out of order, and a delete's tombstone
    blocks a late stale update from resurrecting the key. Equal seq
    keeps the snapshot row (idempotent replay of the already-applied
    change).

    ``snapshot``: payload + ``seq_col`` + ``deleted_col``. ``changes``:
    payload + ``seq_col`` + ``op_col``. Returns the next snapshot in the
    same snapshot schema (tombstones retained — compact them out only
    once no older change can still arrive; ``CdcTable.current`` hides
    them from readers).

    ``min_seq`` is a GLOBAL staleness floor (the compaction fence —
    ``CdcTable.compact``): changes with seq ≤ min_seq are dropped at
    entry, so a key whose tombstone was compacted away can never be
    resurrected by a late replay of a pre-fence batch.

    Plan: one window over the CHANGE batch, untouched snapshot rows
    anti-join through, touched keys resolve via a key-outer join whose
    both sides are batch-key-sized — the snapshot is never shuffled
    beyond the (broadcastable) touched-key joins."""
    key_cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    payload = [c for c in snapshot.columns
               if c not in (seq_col, deleted_col)]
    missing = [c for c in payload + [seq_col, op_col]
               if c not in changes.columns]
    if missing:
        raise ValueError(f"changes is missing columns: {missing}")
    if min_seq is not None:
        changes = changes.where(F.col(seq_col) > int(min_seq))
    last = fold_last_change(changes, key_cols, payload, seq_col,
                            op_col, deleted_col,
                            check_unique_seq=check_unique_seq,
                            what="merge_cdc_fenced")
    touched = last.select(*key_cols)
    untouched = _touched_join(snapshot, touched, key_cols, "anti")
    snap_touched = _touched_join(snapshot, touched, key_cols, "semi")
    s, c = snap_touched.alias("S"), last.alias("C")
    joined = s.join(
        c, on=[F.col(f"S.{k}").eqNullSafe(F.col(f"C.{k}")) for k in key_cols],
        how="full")
    # change wins iff the snapshot row is absent or strictly older
    take_c = F.col(f"S.{seq_col}").isNull() | \
        (F.col(f"C.{seq_col}") > F.col(f"S.{seq_col}"))
    resolved = joined.select(*[
        F.when(take_c, F.col(f"C.{col}")).otherwise(F.col(f"S.{col}"))
        .alias(col) for col in payload + [seq_col, deleted_col]])
    return untouched.unionByName(resolved)


def apply_cdc_sql(snapshot_sql: str, changes_sql: str, key_cols,
                  payload_cols, seq_col: str = "seq",
                  op_col: str = "op") -> str:
    """DuckDB twin of :func:`apply_cdc` — same last-op-per-key window,
    anti pass-through (NULL-safe, like the Spark side), and delete
    filtering."""
    key_cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    payload_cols = list(payload_cols)
    keys = ", ".join(key_cols)
    cols = ", ".join(payload_cols)
    on = " AND ".join(f"s.{c} IS NOT DISTINCT FROM t.{c}"
                      for c in key_cols)
    return f"""
WITH snap AS ({snapshot_sql}), chg AS ({changes_sql}),
last AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (
      PARTITION BY {keys} ORDER BY {seq_col} DESC) AS _cdc_rn
    FROM chg
  ) WHERE _cdc_rn = 1
)
SELECT {cols} FROM snap s
WHERE NOT EXISTS (SELECT 1 FROM last t WHERE {on})
UNION ALL
SELECT {cols} FROM last WHERE {op_col} <> 'delete'
"""
