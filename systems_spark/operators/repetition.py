"""Repetition quality signals — per-document n-gram repetition fractions.

The standard "repetitive document" filters from published corpus-curation
recipes (the Gopher/MassiveText rules family, public-method provenance):
a document dominated by one repeated n-gram, or whose n-grams are mostly
non-unique, is boilerplate/spam and gets filtered before training. Signals
computed here, per document over k-word n-grams:

    top_frac = count(most-repeated n-gram; 0 if none repeats) / count(all)
    dup_frac = sum(count of n-grams occurring >1 time) / count(all n-grams)
    repetitive = top_frac > top_threshold OR dup_frac > dup_threshold

100 TB shape: explode n-grams → ONE aggregation on (doc_id, ngram) with
map-side partial combine (repeated n-grams collapse before the shuffle —
exactly on repetitive documents, so the worst input compresses best), then
a per-doc roll-up that reuses the same hash partitioning (doc_id is a
prefix of the first grouping key, no second exchange needed beyond the
narrow per-doc pairs). Shingling is the fenced JVM expression path from
functions/text.py. Row-preserving: documents with fewer than k tokens have
no n-grams and come back with zero fractions, never dropped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from systems_spark.functions.fence import fence_columns
from systems_spark.functions.text import tokens, word_shingles_from_tokens


def repetition_stats(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 2,
    top_threshold: float = 0.18,
    dup_threshold: float = 0.60,
) -> DataFrame:
    """(id_col, n_ngrams, top_frac, dup_frac, repetitive) per document."""
    staged = fence_columns(
        docs.select(id_col, text_col), _toks=tokens(F.col(text_col))
    )
    grams = staged.select(
        id_col,
        F.explode(word_shingles_from_tokens(F.col("_toks"), k)).alias("_g"),
    )
    per_gram = grams.groupBy(id_col, "_g").agg(F.count(F.lit(1)).alias("_c"))
    # _top counts only REPEATED n-grams (c >= 2): an all-unique short doc
    # would otherwise score top_frac = 1/n and trip the threshold despite
    # containing zero repetition
    per_doc = per_gram.groupBy(id_col).agg(
        F.sum("_c").cast("long").alias("n_ngrams"),
        F.coalesce(
            F.max(F.when(F.col("_c") > 1, F.col("_c"))), F.lit(0)
        ).cast("long").alias("_top"),
        F.coalesce(
            F.sum(F.when(F.col("_c") > 1, F.col("_c"))), F.lit(0)
        ).cast("long").alias("_dup"),
    )
    out = docs.select(id_col).join(per_doc, id_col, "left")
    n = F.coalesce(F.col("n_ngrams"), F.lit(0)).cast("long")
    top_frac = (
        F.coalesce(F.col("_top"), F.lit(0)).cast("double")
        / F.greatest(n, F.lit(1)).cast("double")
    )
    dup_frac = (
        F.coalesce(F.col("_dup"), F.lit(0)).cast("double")
        / F.greatest(n, F.lit(1)).cast("double")
    )
    return out.select(
        id_col,
        n.alias("n_ngrams"),
        top_frac.alias("top_frac"),
        dup_frac.alias("dup_frac"),
        (
            (top_frac > F.lit(float(top_threshold)))
            | (dup_frac > F.lit(float(dup_threshold)))
        ).alias("repetitive"),
    )
