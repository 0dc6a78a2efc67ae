"""Benchmark decontamination — flag training documents that overlap an
evaluation set by shared word n-grams.

Standard LLM-corpus hygiene: before training, remove documents whose
k-word-shingle overlap with any held-out benchmark/eval document exceeds a
threshold (the "n-gram decontamination" of GPT-3 appendix C / PaLM §6 fame,
public-method provenance only). Semantics here:

    overlap_frac(d) = |distinct shingles(d) ∩ distinct shingles(benchmark)|
                      / |distinct shingles(d)|
    contaminated(d) = overlap_frac(d) >= threshold   (docs with zero
    shingles — fewer than k tokens — are never contaminated)

100 TB shape: the benchmark side is small by definition (eval suites are
KBs-to-MBs), so its distinct shingle-hash set broadcasts; the corpus side
computes per-document DISTINCT shingles with ``array_distinct`` *inside the
row* (no shuffle spent on distinctness), explodes to (doc_id, hash64) pairs,
and the only exchange in the plan is the per-doc count aggregation — the
documents' text never shuffles. All shingling/hashing is the JVM expression
path from functions/text.py / functions/hashing.py, bit-identical to the
DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from systems_spark.functions.hashing import hash64
from systems_spark.functions.fence import fence_columns
from systems_spark.functions.text import tokens, word_shingles_from_tokens


def _distinct_shingle_hashes(df: DataFrame, id_col: str, text_col: str, k: int) -> DataFrame:
    """(id_col, sh_hash) pairs, distinct within each document, hashed to
    int64. Tokens are fenced (evaluated once per row) before the shingle
    lambda — see functions/fence.py for why."""
    staged = fence_columns(
        df.select(id_col, text_col), _toks=tokens(F.col(text_col))
    )
    shingles = staged.select(
        id_col,
        F.array_distinct(
            word_shingles_from_tokens(F.col("_toks"), k)
        ).alias("_sh"),
    )
    return shingles.select(
        id_col, F.explode("_sh").alias("_s")
    ).select(id_col, hash64(F.col("_s")).alias("sh_hash"))


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Per-document overlap stats against ``benchmark``'s shingle set.

    Returns (id_col, n_shingles, n_overlap, overlap_frac, contaminated) for
    EVERY input document (short docs get 0/0/0.0/false). Filter on
    ``~contaminated`` for the cleaned corpus; keep the full frame for audit.
    """
    doc_sh = _distinct_shingle_hashes(docs, id_col, text_col, k)
    bench_sh = (
        _distinct_shingle_hashes(benchmark, id_col, text_col, k)
        .select("sh_hash")
        .dropDuplicates(["sh_hash"])
    )
    # benchmark side is small → broadcast; the corpus side streams through
    # map-side with zero shuffle on this join
    hits = doc_sh.join(
        F.broadcast(bench_sh.withColumn("_hit", F.lit(1))), "sh_hash", "left"
    )
    per_doc = hits.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_shingles"),
        F.coalesce(F.sum("_hit"), F.lit(0)).cast("long").alias("n_overlap"),
    )
    out = docs.select(id_col).join(per_doc, id_col, "left")
    n_sh = F.coalesce(F.col("n_shingles"), F.lit(0)).cast("long")
    n_ov = F.coalesce(F.col("n_overlap"), F.lit(0)).cast("long")
    frac = n_ov.cast("double") / F.greatest(n_sh, F.lit(1)).cast("double")
    return out.select(
        id_col,
        n_sh.alias("n_shingles"),
        n_ov.alias("n_overlap"),
        frac.alias("overlap_frac"),
        (frac >= F.lit(float(threshold))).alias("contaminated"),
    )
