"""Bloom-prefiltered join — the runtime-filter pattern as an operator.

The dominant cost of a big⋈selective-dim join at 100 TB is shuffling
fact rows that the join will immediately discard. The standard fix
(Spark's own ``spark.sql.optimizer.runtime.bloomFilter``, the "sideways
information passing" literature) is to build a Bloom filter over the
dim side's join keys and drop non-matching fact rows BEFORE the
exchange. This module makes that explicit, deterministic, and
oracle-checkable:

- the filter is the repo's portable Bloom (functions/sketches.py —
  md5-derived double hashing, 63-bit words), built with one map-side-
  combined aggregation over the dim keys: ≤ ⌈m/63⌉ word rows no matter
  the dim size;
- the word table is densified into a SINGLE array row and attached to
  the fact side by a 1-row broadcast (BroadcastNestedLoopJoin — the
  bm25 scalar-stats pattern), so the membership test is a pure
  whole-stage-codegen expression: k probes = k shifts into the array,
  ZERO extra shuffles and zero per-row joins on the fact side;
- no false negatives, so an INNER (or semi) join over the surviving
  rows equals the unfiltered join bit-for-bit — which is exactly what
  the DuckDB oracle grades (the twin join runs with no bloom at all).

Sizing: the array is ⌈m_bits/63⌉ longs — m_bits = 2²³ (1 MB) keeps the
false-positive rate under 1% for a million dim keys at k=4; Spark's own
runtime filter caps at the same order. The filter rides the plan as a
one-row broadcast, never through the driver.

Reference context: the reference has no runtime-filter surface (its
joins are single-node); this is engine-side 100 TB capability
(SURVEY.md §7.2), companion to ``FilterCandidates``'s anti-join shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from systems_spark.functions.sketches import (
    _bloom_hash,
    _check_bloom,
    _cms_h12_from,
    bloom_bits,
)


def bloom_prefilter(big: DataFrame, key_col: str, dim_keys: DataFrame,
                    dim_key_col: str, k: int = 4,
                    m_bits: int = 1 << 14) -> DataFrame:
    """Rows of ``big`` whose ``key_col`` MIGHT appear in
    ``dim_keys.dim_key_col`` — every true match survives (no false
    negatives); a tunable fraction of non-matches leaks through
    (false-positive rate ≈ (1 − e^{−kn/m})^k). Columns of ``big`` pass
    through unchanged."""
    from systems_spark.functions.fence import fence_columns

    _check_bloom(k, m_bits)
    n_words = (m_bits + 62) // 63
    dense = (
        bloom_bits(dim_keys.select(dim_key_col), dim_key_col, k, m_bits)
        .agg(F.map_from_entries(
            F.collect_list(F.struct("word", "bits"))).alias("_m"))
        .select(F.expr(
            f"transform(sequence(0, {n_words - 1}), "
            "w -> coalesce(element_at(_m, CAST(w AS BIGINT)), "
            "CAST(0 AS BIGINT)))").alias("_blm")))
    # the ONE md5 per fact row all k probes derive from — fenced so
    # ProjectCollapsing can't re-inline it k times (_bloom_probes
    # discipline; this is the row-local twin of that probe stream)
    staged = fence_columns(big, _bh=_bloom_hash(F.col(key_col)))
    h1, h2 = _cms_h12_from(F.col("_bh"))
    cond = F.lit(True)
    for r in range(k):
        pos = h1 + r * h2  # < 2^34: exact in the double division below
        pos = pos % m_bits
        word = F.floor(pos / 63).cast("int")
        bit = (pos % 63).cast("int")
        # call_function: shiftright's bit count is a COLUMN here
        probe = F.call_function(
            "shiftright",
            F.element_at(F.col("_blm"), word + 1), bit) \
            .bitwiseAND(F.lit(1).cast("long")) == 1
        cond = cond & probe
    return (staged.crossJoin(F.broadcast(dense))
            .where(cond)
            .drop("_bh", "_blm"))


def bloom_prefilter_join(big: DataFrame, dim: DataFrame, big_key: str,
                         dim_key: str, k: int = 4,
                         m_bits: int = 1 << 14) -> DataFrame:
    """INNER equi-join with the fact side bloom-prefiltered before the
    exchange. Bit-identical to ``big.join(dim, big[big_key] ==
    dim[dim_key])`` — the filter only removes rows the join would
    drop — while the join's fact-side shuffle carries only probable
    matches. The dim side feeds both the filter build and the join;
    Catalyst reuses its scan."""
    filtered = bloom_prefilter(big, big_key, dim.select(dim_key),
                               dim_key, k, m_bits)
    return filtered.join(dim, on=filtered[big_key] == dim[dim_key])
