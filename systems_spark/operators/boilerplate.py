"""Boilerplate removal — drop text segments that repeat across the corpus.

The CCNet/RefinedWeb-style curation pass (public-method provenance): chop
every document into fixed-width word segments, count each segment's
frequency across the WHOLE corpus, and delete segments occurring more
than ``max_freq`` times corpus-wide — navigation chrome, cookie banners, license
headers, and template footers repeat corpus-wide while real prose does not.
The document is then reassembled from its surviving segments in original
order.

100 TB shape: documents chop into (doc_id, pos, segment-hash64) triples
inside the row (JVM higher-order functions, fenced tokens); the global
frequency count aggregates by the 8-byte hash with map-side combine — the
more boilerplate the corpus has, the harder the partial agg compresses the
shuffle; the count join is plain hash-join on the same 8-byte key (AQE
picks broadcast when the over-threshold set is small); reassembly is one
groupBy(doc_id) of (pos, seg) pairs. Segment text crosses the wire only in
the reassembly shuffle — never the full documents, and counting moves
hashes alone. All expressions are engine-portable (functions/hashing.py,
functions/text.py), so the DuckDB oracle matches bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from systems_spark.functions.fence import fence_columns
from systems_spark.functions.hashing import hash64
from systems_spark.functions.text import tokens
from systems_spark.pinning import pin


def _segments(toks: Column, seg_words: int) -> Column:
    """Non-overlapping ``seg_words``-word segments as (pos, seg) structs;
    the last segment may be shorter. Empty token arrays → empty segments
    (sequence(1, 0) is illegal in Spark, hence the guard)."""
    n = F.size(toks)
    return F.when(
        n >= 1,
        F.transform(
            F.sequence(F.lit(1), n, F.lit(seg_words)),
            lambda i: F.struct(
                i.alias("pos"),
                F.concat_ws(" ", F.slice(toks, i, seg_words)).alias("seg"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<pos:int,seg:string>>"))


def remove_boilerplate(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    seg_words: int = 8,
    max_freq: int = 2,
) -> DataFrame:
    """Per-document boilerplate scrub. Returns (id_col, n_segments,
    n_kept, clean_text) for EVERY input document — empty/fully-boilerplate
    docs come back with clean_text = '' rather than disappearing.

    A segment survives iff its corpus-wide frequency (counted by portable
    64-bit hash — only hashes shuffle for the count) is <= ``max_freq``.
    """
    staged = fence_columns(
        docs.select(id_col, text_col), _toks=tokens(F.col(text_col))
    )
    segs = staged.select(
        id_col,
        F.explode(_segments(F.col("_toks"), seg_words)).alias("_u"),
    ).select(
        id_col,
        F.col("_u.pos").alias("_pos"),
        F.col("_u.seg").alias("_seg"),
    ).withColumn("_h", hash64(F.col("_seg")))
    # r12 perf: pin the exploded segment relation — the corpus-frequency
    # agg and the kept join both reference it, and each lazy reference
    # re-ran the upstream chain (for curation_pipeline that chain includes
    # the full PII-redact pass). One pinned pass per action, rebuilt per
    # call.
    segs = pin(segs, corpus_scale=True)

    freq = segs.groupBy("_h").agg(F.count(F.lit(1)).alias("_freq"))

    kept = segs.join(freq, "_h")
    per_doc = kept.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_segments"),
        F.sum(
            F.when(F.col("_freq") <= max_freq, F.lit(1)).otherwise(F.lit(0))
        ).cast("long").alias("n_kept"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("_freq") <= max_freq,
                            F.struct(F.col("_pos").alias("pos"),
                                     F.col("_seg").alias("seg")),
                        )
                    )
                ),
                lambda s: s["seg"],
            ),
        ).alias("clean_text"),
    )

    out = docs.select(id_col).join(per_doc, id_col, "left")
    return out.select(
        id_col,
        F.coalesce(F.col("n_segments"), F.lit(0)).cast("long").alias("n_segments"),
        F.coalesce(F.col("n_kept"), F.lit(0)).cast("long").alias("n_kept"),
        F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
    )
