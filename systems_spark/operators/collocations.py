"""PMI collocations — statistically associated adjacent token pairs.

Church & Hanks, "Word association norms, mutual information, and
lexicography" (Computational Linguistics 1990): pointwise mutual
information over adjacent-bigram counts,

    PMI(a, b) = ln( p(ab) / (p(a)·p(b)) )
              = ln( c_ab · N_uni² / (N_bi · c_a · c_b) )

surfaces the pairs that co-occur far beyond chance — the phrase
detector used to merge "new york"-style units before embedding/
tokenizer training (word2vec's phrase pass uses the same statistic).

Exactness discipline: every count is exact; the products inside the
log are widened to decimal(38,0)/HUGEINT before ONE double division,
and PMI is quantized to integer micros by the repo's ln-micros rule
(``round(ln(·)·1e6)`` of an identical exact rational → identical
double → identical rounding in both engines — the BM25 idf pattern).
The ``min_count`` floor is the standard sparse-PMI guard: a pair seen
once with two rare words scores arbitrarily high, so rare pairs are
excluded BEFORE ranking (the c_ab ≥ min_count filter also bounds the
join: only pairs that survive fan out to the two unigram lookups).

100 TB shape: two map-side-combined count aggregations off one scan
(unigrams, bigrams), two hash joins keyed on the surviving pairs'
words, scalar totals broadcast; the final top-k is a TakeOrdered —
no global sort materialization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_M = 1_000_000


def pmi_collocations(docs: DataFrame, text_col: str = "text",
                     min_count: int = 5, top_k: int = 50) -> DataFrame:
    """(w1, w2, n_pair, n_w1, n_w2, pmi_micros): the ``top_k`` adjacent
    token pairs by PMI among those occurring at least ``min_count``
    times, ordered (pmi desc, w1, w2) — deterministic under ties."""
    from systems_spark.functions import text as TX
    from systems_spark.functions.fence import fence_columns

    if min_count < 1:
        raise ValueError("min_count must be >= 1")
    if top_k < 1:
        raise ValueError("top_k must be >= 1")
    toks = fence_columns(docs.select(text_col),
                         _toks=TX.tokens(F.col(text_col)))
    uni = toks.select(F.explode("_toks").alias("w"))
    bi = toks.select(F.explode(
        TX.word_shingles_from_tokens(F.col("_toks"), 2)).alias("g"))
    uni_counts = uni.groupBy("w").agg(F.count(F.lit(1)).alias("n_w"))
    bi_counts = bi.groupBy("g").agg(F.count(F.lit(1)).alias("n_pair"))
    # totals from the ALREADY-AGGREGATED count tables — summing the raw
    # exploded streams again would re-tokenize the whole corpus
    tot_uni = uni_counts.agg(F.sum("n_w").alias("n_uni"))
    tot_bi = bi_counts.agg(F.sum("n_pair").alias("n_bi"))
    cand = (bi_counts.where(F.col("n_pair") >= min_count)
            .withColumn("w1", F.split(F.col("g"), " ").getItem(0))
            .withColumn("w2", F.split(F.col("g"), " ").getItem(1))
            .join(uni_counts.select(F.col("w").alias("w1"),
                                    F.col("n_w").alias("n_w1")), on="w1")
            .join(uni_counts.select(F.col("w").alias("w2"),
                                    F.col("n_w").alias("n_w2")), on="w2")
            .crossJoin(F.broadcast(tot_uni))
            .crossJoin(F.broadcast(tot_bi)))
    num = ("CAST(n_pair AS DECIMAL(38,0)) * CAST(n_uni AS DECIMAL(38,0))"
           " * CAST(n_uni AS DECIMAL(38,0))")
    den = ("CAST(n_bi AS DECIMAL(38,0)) * CAST(n_w1 AS DECIMAL(38,0))"
           " * CAST(n_w2 AS DECIMAL(38,0))")
    pmi = (f"CAST(round(ln(CAST(({num}) AS DOUBLE)"
           f" / CAST(({den}) AS DOUBLE)) * {_M}) AS BIGINT)")
    return (cand.select("w1", "w2", "n_pair", "n_w1", "n_w2",
                        F.expr(pmi).alias("pmi_micros"))
            .orderBy(F.col("pmi_micros").desc(), F.col("w1").asc(),
                     F.col("w2").asc())
            .limit(top_k))


def pmi_collocations_sql(source_sql: str, text_expr: str,
                         min_count: int = 5, top_k: int = 50) -> str:
    """DuckDB twin of :func:`pmi_collocations`."""
    from systems_spark.functions import text as TX

    if min_count < 1:
        raise ValueError("min_count must be >= 1")
    if top_k < 1:
        raise ValueError("top_k must be >= 1")
    toks = TX.tokens_sql(text_expr)
    shingles = TX.word_shingles_sql(text_expr, 2)
    return f"""
WITH uni AS (
  SELECT unnest({toks}) AS w FROM ({source_sql})
),
bi AS (
  SELECT unnest({shingles}) AS g FROM ({source_sql})
),
uni_counts AS (SELECT w, count(*)::BIGINT AS n_w FROM uni GROUP BY 1),
bi_counts AS (SELECT g, count(*)::BIGINT AS n_pair FROM bi GROUP BY 1),
tot AS (
  SELECT (SELECT sum(n_w) FROM uni_counts)::BIGINT AS n_uni,
         (SELECT sum(n_pair) FROM bi_counts)::BIGINT AS n_bi
),
cand AS (
  SELECT string_split(g, ' ')[1] AS w1, string_split(g, ' ')[2] AS w2,
         n_pair
  FROM bi_counts WHERE n_pair >= {min_count}
)
SELECT c.w1, c.w2, c.n_pair, u1.n_w AS n_w1, u2.n_w AS n_w2,
       round(ln((c.n_pair::HUGEINT * t.n_uni * t.n_uni)::DOUBLE
                / (t.n_bi::HUGEINT * u1.n_w * u2.n_w)::DOUBLE)
             * {_M})::BIGINT AS pmi_micros
FROM cand c
JOIN uni_counts u1 ON u1.w = c.w1
JOIN uni_counts u2 ON u2.w = c.w2
CROSS JOIN tot t
ORDER BY pmi_micros DESC, w1 ASC, w2 ASC
LIMIT {top_k}
"""
