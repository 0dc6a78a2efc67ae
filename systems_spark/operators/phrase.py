"""Exact phrase search over positional postings.

BM25 (operators/bm25.py) ranks documents by bag-of-words term overlap;
a phrase query ("slow scan filter") additionally requires the terms to
be ADJACENT and IN ORDER — the positional-index primitive every search
stack (Lucene's PhraseQuery, reference retrieval stage: the lexical
twin of merlin/systems/dag/ops/faiss.py's top-k candidates) pairs with
its ranked retrieval.

Algorithm — offset-aligned counting
-----------------------------------
A positional posting is (doc, pos, term); a phrase is (offset, term)
for offset 0..k-1. A phrase occurrence at start ``s`` means: for every
offset i, the posting (doc, s+i, term_i) exists. Join postings against
the (tiny, broadcast) phrase-term table on the term, compute
``start = pos - offset``, and count rows per (query, doc, start):
the count equals the phrase length exactly when every offset matched,
because (doc, pos) is unique so each offset can contribute at most one
row per start. One broadcast join + two map-side-combined aggregations
— no self-join per phrase position (the classic iterative merge), no
text shuffle: postings are (doc, pos, hash) longs.

Repeated phrase terms need no special case: each offset is a distinct
row, so "to to" at start s counts offset 0 via posting s and offset 1
via posting s+1. Overlapping occurrences each get their own start.

Determinism: term identity via the portable md5 hash64 (identical in
both engines); all counts exact int64.

100 TB shape: the postings build is one scan + posexplode (fuses into
the scan, zero shuffle until the final aggregations, which shuffle
only (q, doc, start, count) longs grouped by doc-dominated keys — no
hot key unless one document is itself hot). The phrase table is a few
rows and broadcasts; a stopword-heavy phrase still prunes the postings
scan to the phrase's terms before anything shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from systems_spark.functions import text as TX
from systems_spark.functions.hashing import hash64, hash64_sql


def phrase_search(docs: DataFrame, queries: DataFrame,
                  text_col: str = "text", id_col: str = "doc_id",
                  query_id_col: str = "query_id",
                  query_text_col: str = "query_text") -> DataFrame:
    """(query_id, doc_id, n_matches): documents containing each query's
    phrase at least once, with the exact occurrence count (overlapping
    occurrences counted separately). A one-word phrase degenerates to
    term frequency; an empty phrase matches nothing."""
    postings = (
        docs.select(F.col(id_col).alias("_doc"),
                    TX.tokens(F.col(text_col)).alias("_tk"))
        .select("_doc", F.posexplode("_tk").alias("_pos", "_t"))
        .select("_doc", "_pos", hash64(F.col("_t")).alias("h")))
    qterms = (
        queries.select(F.col(query_id_col).alias("_q"),
                       TX.tokens(F.col(query_text_col)).alias("_tk"))
        .select("_q", F.size("_tk").alias("_qlen"),
                F.posexplode("_tk").alias("_off", "_t"))
        .select("_q", "_qlen", "_off", hash64(F.col("_t")).alias("h")))
    starts = (
        postings.join(F.broadcast(qterms), on="h")
        .groupBy("_q", "_qlen", "_doc",
                 (F.col("_pos") - F.col("_off")).alias("_start"))
        .agg(F.count(F.lit(1)).alias("_m"))
        .where(F.col("_m") == F.col("_qlen")))
    return (starts.groupBy(F.col("_q").alias(query_id_col),
                           F.col("_doc").alias(id_col))
            .agg(F.count(F.lit(1)).cast("long").alias("n_matches")))


def phrase_search_sql(docs_sql: str, queries_sql: str,
                      text_col: str = "text", id_col: str = "doc_id",
                      query_id_col: str = "query_id",
                      query_text_col: str = "query_text") -> str:
    """DuckDB twin of :func:`phrase_search`: same tokenizer, hash, and
    offset-aligned counting."""
    dtoks = TX.tokens_sql(text_col)
    qtoks = TX.tokens_sql(query_text_col)
    h = hash64_sql("u.t")
    return f"""
WITH d0 AS (SELECT {id_col} AS doc, {dtoks} AS tk FROM ({docs_sql})),
postings AS (
  SELECT doc, u.pos AS pos, {h} AS h FROM (
    SELECT doc, unnest(list_transform(range(1, len(tk) + 1),
              i -> struct_pack(pos := i - 1, t := tk[i]))) AS u
    FROM d0)
),
q0 AS (SELECT {query_id_col} AS q, {qtoks} AS tk FROM ({queries_sql})),
qterms AS (
  SELECT q, qlen, u.off AS off, {h} AS h FROM (
    SELECT q, len(tk) AS qlen, unnest(list_transform(range(1, len(tk) + 1),
              i -> struct_pack(off := i - 1, t := tk[i]))) AS u
    FROM q0)
),
starts AS (
  SELECT t.q, t.qlen, p.doc, p.pos - t.off AS start, count(*) AS m
  FROM postings p JOIN qterms t ON t.h = p.h
  GROUP BY 1, 2, 3, 4
)
SELECT q AS {query_id_col}, doc AS {id_col}, count(*)::BIGINT AS n_matches
FROM starts WHERE m = qlen GROUP BY 1, 2
"""
