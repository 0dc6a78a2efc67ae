"""Sorted-neighborhood candidate pairs — the eighth dedup family member.

Hernández & Stolfo, "The merge/purge problem for large databases"
(SIGMOD 1995). Where LSH families (minhash/simhash/embedding) bucket by
CONTENT overlap, sorted-neighborhood blocks by SORT ORDER: sort every
record by a normalized blocking key, then pair each record with its
``window − 1`` successors. Candidate volume is O(n·w) BY CONSTRUCTION —
no hot-bucket blowup is possible, which is exactly the failure mode the
minhash/simhash/winnow caps exist to defend against; the trade is that
only near-neighbors IN KEY ORDER are found (the classic multi-pass
remedy: run again with a second key and union the pairs).

100 TB shape: the global sort is GlobalRank's range bucketing — one
wide shuffle, no single-task window — and the neighbor pairing is a
plain equi-join on rank (the probe side explodes each row into
``window − 1`` (rank + δ) probes), so pairs that straddle range-bucket
boundaries are found by the join, not by any per-partition carryover
logic. Each row appears in at most 2(w − 1) candidate pairs.

Reference basis: public merge/purge literature only (the reference
repo has no record-linkage code).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sn_pairs(df: DataFrame, key_col: str, id_col: str,
             window: int = 4) -> DataFrame:
    """(doc_a, doc_b, key_a, key_b): every ordered pair of rows within
    ``window − 1`` positions of each other in the global
    (``key_col``, ``id_col``) ascending sort. NULL blocking keys are
    excluded (they cannot be meaningfully neighbored); ``id_col`` must
    be unique and non-null — it makes the sort a total order, so the
    pair set is deterministic."""
    from systems_spark.operators.global_rank import GlobalRank

    if window < 2:
        raise ValueError("window must be >= 2")
    base = (df.select(key_col, id_col)
            .where(F.col(key_col).isNotNull()))
    ranked = (GlobalRank([key_col, id_col], rank_col="_snr",
                         total_col="_snt")
              .transform(base).drop("_snt")
              # two consumers (probe + build side of the self-join):
              # pin so GlobalRank's multi-job plan runs once
              .localCheckpoint(eager=False))
    deltas = F.explode(F.array(*[F.lit(d) for d in range(1, window)]))
    probes = (ranked
              .select(F.col(id_col).alias("doc_a"),
                      F.col(key_col).alias("key_a"),
                      F.col("_snr").alias("_ra"), deltas.alias("_d"))
              .select("doc_a", "key_a",
                      (F.col("_ra") + F.col("_d")).alias("_snr")))
    right = ranked.select(F.col(id_col).alias("doc_b"),
                          F.col(key_col).alias("key_b"), "_snr")
    return (probes.join(right, on="_snr")
            .select("doc_a", "doc_b", "key_a", "key_b"))


def sn_equal_key_star(df: DataFrame, key_col: str, id_col: str,
                      a_col: str = "doc_a", b_col: str = "doc_b"
                      ) -> DataFrame:
    """Star edges (doc, min doc of its block key) for every non-null key
    held by ≥ 2 docs — CONNECTIVITY-EQUIVALENT to
    ``sn_pairs(df, ...).where(key_a == key_b)`` for any window ≥ 2, at
    one hash shuffle instead of a GlobalRank global sort + explode
    self-join (r13, guide §2.4).

    Equivalence (what connected-components consumers actually consume):
    rows with equal keys are CONTIGUOUS in the (key, id) global sort, so
    an equal-key pair within the window is always a pair within one
    equal-key run, and every run of size m ≥ 2 contains all its adjacent
    (distance-1) pairs — the run is one connected chain. A star to the
    run's min connects exactly the same node set into exactly the same
    components; runs of size 1 produce no edge either way. Component ids
    (= min node) and sizes are therefore identical. NOT equivalent as a
    PAIR SET — only for callers that resolve components over the matched
    pairs (q_sn_families); candidate-pair consumers keep ``sn_pairs``."""
    base = (df.select(key_col, id_col)
            .where(F.col(key_col).isNotNull()))
    mins = (base.groupBy(key_col)
            .agg(F.min(id_col).alias(b_col),
                 F.count(F.lit(1)).alias("_sn_n"))
            .where(F.col("_sn_n") >= 2)
            .drop("_sn_n"))
    return (base.join(mins, on=key_col)
            .where(F.col(id_col) != F.col(b_col))
            .select(F.col(id_col).alias(a_col), b_col))


def sn_pairs_sql(source_sql: str, key_expr: str, id_expr: str,
                 window: int = 4) -> str:
    """DuckDB twin of :func:`sn_pairs` (single-node window; the band
    join mirrors the explode+equi-join pair set exactly)."""
    if window < 2:
        raise ValueError("window must be >= 2")
    return f"""
WITH base AS (
  SELECT {key_expr} AS k, {id_expr} AS i FROM ({source_sql})
  WHERE ({key_expr}) IS NOT NULL
),
ranked AS (
  SELECT k, i,
         row_number() OVER (ORDER BY k NULLS FIRST, i NULLS FIRST) AS r
  FROM base
)
SELECT a.i AS doc_a, b.i AS doc_b, a.k AS key_a, b.k AS key_b
FROM ranked a JOIN ranked b ON b.r - a.r BETWEEN 1 AND {window - 1}
"""
