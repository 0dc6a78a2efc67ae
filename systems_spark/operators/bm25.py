"""BM25 lexical search — the sparse half of the retrieval surface.

The repo's ANN family (operators/ann.py) covers dense-vector retrieval;
this operator covers the classic lexical ranking every search/RAG stack
pairs with it: Okapi BM25 with the +1 idf variant,

    idf(t)      = ln((N - df(t) + 0.5) / (df(t) + 0.5) + 1)
    score(D, q) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 - b + b·|D|/avgdl))

Determinism contract — integer BM25
-----------------------------------
Distributed float sums are order-dependent, so the scoring pipeline is
integer end-to-end (the BigramLM/classifier micros discipline extended to
BM25's tf saturation):

- idf is quantized to micros at FIT time (``round(ln(·)·1e6)`` — the ln
  cross-engine parity is the measured contract in classifier.py);
- ``avgdl`` is the integer ``total_tokens div N``;
- the tf factor is computed entirely in int64 micros:
  ``ratio = dl·1e6 div avgdl``, ``norm = 1e6 - b + b·ratio div 1e6``,
  ``denom = tf·1e6 + k1·norm div 1e6``, ``factor = tf·(1e6+k1)·1e6 div
  denom`` — every division positive-integral (Spark ``div`` == DuckDB
  ``//``);
- a hit contributes ``idf·factor div 1e6``; a document's score is the
  integer SUM of its hits — exact under any shuffle/retry schedule, and
  bit-for-bit replicable in the SQL oracle.

100 TB shape: fit is two map-side-combined aggregations (per-doc length;
per-term document frequency — the shuffle carries (hash64, count) longs).
Search explodes the query terms (tiny), broadcast-joins them against the
posting rows (term-hash equi-join against the corpus' (doc, term, tf)
aggregate), and takes top-k per query with one window. Document text
never shuffles; postings are (doc_id, hash, tf) longs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from systems_spark.functions import text as TX
from systems_spark.functions.hashing import hash64, hash64_sql
from systems_spark.operators.base import Operator
from systems_spark.pinning import pin, unpin

_M = 1_000_000


class BM25(Operator):
    """``fit`` builds the index statistics over (id, text); ``search``
    ranks documents for a queries frame (query_id, query_text)."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id",
                 k1_micros: int = 1_200_000, b_micros: int = 750_000):
        if not (0 <= b_micros <= _M):
            raise ValueError("b_micros in [0, 1e6]")
        if not (0 <= k1_micros <= 4_000_000_000):
            # upper bound keeps k1·(norm div 1e6) inside int64 for any
            # int32 document length (see the split-identity note in
            # search()); k1 = 4000.0 is far past any published tuning
            raise ValueError("k1_micros in [0, 4e9]")
        self.text_col = text_col
        self.id_col = id_col
        self.k1 = int(k1_micros)
        self.b = int(b_micros)
        self._postings = None  # (doc, h, tf, dl)
        self._idf = None       # (h, idf_micros)
        self._avgdl = None     # 1-row (avgdl)
        self.requires = (text_col, id_col)

    def _tokenize_postings(self, df: DataFrame) -> DataFrame:
        tok = (df.select(F.col(self.id_col).alias("_doc"),
                         TX.tokens(F.col(self.text_col)).alias("_tk"))
               .select("_doc", F.size("_tk").alias("dl"),
                       F.explode("_tk").alias("_t"))
               .select("_doc", "dl", hash64(F.col("_t")).alias("h")))
        return (tok.groupBy("_doc", "h", "dl")
                .agg(F.count(F.lit(1)).alias("tf")))

    def _derive_stats(self) -> None:
        """idf + avgdl from the postings table — a postings pass (narrow
        longs, map-side combined), never a text pass."""
        docs = self._postings.select("_doc", "dl").distinct()
        # 1-row frame referenced by both idf (n) and avgdl — pin so the
        # distinct+agg pass over the postings runs once per action
        stats = docs.agg(F.count(F.lit(1)).alias("n"),
                         F.expr("sum(dl) div count(1)").alias("avgdl")) \
            .localCheckpoint(eager=False)
        dfreq = self._postings.groupBy("h").agg(F.count(F.lit(1)).alias("_df"))
        self._idf = (dfreq.crossJoin(F.broadcast(stats.select("n")))
                     .select("h", F.round(F.log(
                         (F.col("n") - F.col("_df") + 0.5)
                         / (F.col("_df") + 0.5) + 1.0) * _M)
                         .cast("long").alias("idf_micros")))
        self._avgdl = stats.select("avgdl")

    def fit(self, df: DataFrame) -> "BM25":
        # r12 perf: pin the postings table (non-eager). idf, avgdl AND
        # the search join all reference it; left lazy, one search plan
        # re-tokenized the corpus 3-4× (bm25_search / hybrid_search
        # before-plans). Computed once per action, refit per call —
        # nothing persists across bench runs. r13: the postings relation
        # is O(corpus), so the pin is corpus_scale — reliable checkpoint
        # on clusters with a checkpoint dir (pinning.py; local behavior
        # unchanged).
        self._postings = pin(self._tokenize_postings(df), corpus_scale=True)
        self._derive_stats()
        return self

    def with_postings(self, postings: DataFrame) -> "BM25":
        """Adopt a standing postings table — (_doc, h, dl, tf) rows, e.g.
        a StateStore parquet read of a prior index — as the index state
        and re-derive idf/avgdl from it. The storage-read twin of
        ``load_artifacts`` for pipelines that persist only the one
        mergeable table."""
        self._postings = postings
        self._derive_stats()
        return self

    def fit_update(self, df: DataFrame, check_disjoint: bool = True) -> "BM25":
        """Corpus-GROWTH index maintenance — the incremental_pairs
        pattern applied to lexical search: the standing POSTINGS table
        (typically a StateStore parquet read; ``save_artifacts`` /
        ``load_artifacts`` round it) is the whole mergeable state, so
        admitting a batch tokenizes ONLY the batch and unions its
        postings in. idf and avgdl shift globally when N/df/avgdl move,
        but re-deriving them is one pass over the POSTINGS longs —
        never a re-tokenization of the corpus text, which is the
        dominant cost at 100 TB (the text scan + explode). Incremental
        == scratch exactly: union of per-half tokenizations IS the
        whole-corpus tokenization when ids are disjoint (enforced;
        opt out with ``check_disjoint=False``)."""
        if self._postings is None:
            raise ValueError("fit() or load_artifacts() before fit_update()")
        if check_disjoint:
            from systems_spark.dedup.guards import ensure_disjoint_ids
            ensure_disjoint_ids(
                self._postings.select(F.col("_doc").alias(self.id_col)),
                df, self.id_col, "BM25.fit_update")
        # ADVICE r12 item 1: each update used to re-pin the full
        # cumulative postings lazily, keeping EVERY prior generation's
        # blocks reachable through the new pin's lineage — O(n_updates ×
        # corpus) executor storage on a long-lived incremental index.
        # Materialize the new generation EAGERLY (its lineage still reads
        # the old pin — one batch tokenization + a union of longs, the
        # same work the next search action would have paid), THEN release
        # the superseded generation's storage.
        prev = self._postings
        self._postings = pin(
            prev.unionByName(self._tokenize_postings(df)),
            corpus_scale=True, eager=True)
        unpin(prev)
        self._derive_stats()
        return self

    def search(self, queries: DataFrame, query_id_col: str = "query_id",
               query_text_col: str = "query_text", topk: int = 10,
               min_idf_micros: int = 0) -> DataFrame:
        """(query_id, doc, rank, score_micros): top-k docs per query by
        integer BM25 score; ties break toward the smaller doc id.

        ``min_idf_micros`` prunes ~zero-information query terms (idf below
        the threshold — stopwords) BEFORE the postings join: a stopword's
        posting list is O(corpus), so on stopword-heavy queries the prune
        removes the dominant join input while each surviving term's
        contribution is bit-identical (scores only lose the pruned terms'
        near-zero summands). 0 (default) disables pruning — idf under the
        +1 variant is strictly positive, so no term is ever dropped."""
        if self._postings is None:
            raise ValueError("fit() before search()")
        k1, b = self.k1, self.b
        qt = (queries.select(F.col(query_id_col).alias("_q"),
                             TX.tokens(F.col(query_text_col)).alias("_tk"))
              .select("_q", F.explode(F.array_distinct("_tk")).alias("_t"))
              .select("_q", hash64(F.col("_t")).alias("h")))
        # restrict idf to the query's terms BEFORE broadcasting: _idf is
        # vocabulary-sized (billions of rows at web scale) — only the
        # few-row query-term slice ships to executors
        q_idf = self._idf.join(F.broadcast(qt), on="h")
        if min_idf_micros > 0:
            q_idf = q_idf.where(F.col("idf_micros") >= min_idf_micros)
        hits = (self._postings
                .join(F.broadcast(q_idf), on="h")
                .crossJoin(F.broadcast(self._avgdl)))
        # Overflow contract (ADVICE r4), without decimal in the hot path:
        # the oracle computes the k1/b length-norm products in HUGEINT;
        # naive int64 would wrap at extreme length skew (b·ratio with
        # ratio = dl·1e6 div avgdl up to ~2.1e15). Instead of widening to
        # decimal(38,0) — measured 2× on scoring-heavy workloads — use the
        # EXACT split identity (x·r) div M == x·(r div M) + (x·(r mod M))
        # div M (r = q·M + m with q·M exactly divisible): every
        # intermediate then fits int64 (b ≤ 1e6, ratio div 1e6 ≤ 2.1e9 for
        # int32 dl, k1 bounded in __init__), and the result is
        # bit-identical to the oracle's HUGEINT floor divisions. Only the
        # tf numerator stays decimal(38,0) (tf·(1e6+k1)·1e6 genuinely
        # exceeds int64); dl is an int32 from size() — widen before the
        # 1e6 multiply or a >=2148-token document wraps negative
        contrib = (hits
                   .withColumn("_bm_r", F.expr(f"(cast(dl as bigint) * {_M}) div avgdl"))
                   .withColumn("_bm_x", F.expr(
                       f"{_M} - {b} + ({b} * (_bm_r div {_M}) + ({b} * (_bm_r % {_M})) div {_M})"))
                   .select(
                       "_q", "_doc",
                       F.expr(f"""
              cast((idf_micros * (
                 (cast(tf as decimal(38,0)) * {_M + k1} * {_M}) div
                 (cast(tf as decimal(38,0)) * {_M} +
                  ({k1} * (_bm_x div {_M}) + ({k1} * (_bm_x % {_M})) div {_M}))
              )) div {_M} as bigint)""").alias("_c")))
        scored = contrib.groupBy("_q", "_doc").agg(F.sum("_c").alias("score_micros"))
        w = Window.partitionBy("_q").orderBy(F.col("score_micros").desc(),
                                             F.col("_doc").asc())
        return (scored.withColumn("rank", F.row_number().over(w))
                .where(F.col("rank") <= topk)
                .select(F.col("_q").alias(query_id_col),
                        F.col("_doc").alias(self.id_col),
                        F.col("rank").cast("long").alias("rank"),
                        "score_micros"))

    # -- persistence (index once, serve many) ------------------------------

    def save_artifacts(self, path: str) -> None:
        """Materialize the index — postings, idf, avgdl — so serving a new
        query batch costs zero re-indexing (the inverted index IS these
        three tables)."""
        if self._postings is None:
            raise ValueError("fit() before save_artifacts()")
        self._postings.write.mode("overwrite").parquet(f"{path}/postings.parquet")
        self._idf.write.mode("overwrite").parquet(f"{path}/idf.parquet")
        self._avgdl.write.mode("overwrite").parquet(f"{path}/avgdl.parquet")

    def load_artifacts(self, path: str, spark=None) -> None:
        if spark is None:  # keyword kept for Pipeline's load convention
            raise ValueError("load_artifacts requires a SparkSession")
        self._postings = spark.read.parquet(f"{path}/postings.parquet")
        self._idf = spark.read.parquet(f"{path}/idf.parquet")
        self._avgdl = spark.read.parquet(f"{path}/avgdl.parquet")

    def oracle_sql(self, corpus_sql: str, queries_sql: str,
                   topk: int = 10) -> str:
        """DuckDB twin: ``corpus_sql`` yields (id, text), ``queries_sql``
        yields (query_id, query_text). Same hashes, micros quantization,
        and integral divisions as the Spark plan."""
        k1, b = self.k1, self.b
        toks = TX.tokens_sql("text")
        qtoks = TX.tokens_sql("query_text")
        h = hash64_sql
        return f"""
WITH corpus AS ({corpus_sql}),
tok AS (
  SELECT id AS _doc, len({toks}) AS dl, {h("t")} AS h
  FROM (SELECT id, text, unnest({toks}) AS t FROM corpus)
),
postings AS (SELECT _doc, h, dl, count(*) AS tf FROM tok GROUP BY 1, 2, 3),
docs AS (SELECT DISTINCT _doc, dl FROM postings),
stats AS (SELECT count(*) AS n, sum(dl) // count(*) AS avgdl FROM docs),
dfreq AS (SELECT h, count(*) AS _df FROM postings GROUP BY 1),
idf AS (
  SELECT h, round(ln((stats.n - _df + 0.5) / (_df + 0.5) + 1.0) * {_M})::BIGINT
           AS idf_micros
  FROM dfreq, stats
),
q AS ({queries_sql}),
qt AS (
  SELECT query_id AS _q, {h("t")} AS h
  FROM (SELECT query_id, unnest(list_distinct({qtoks})) AS t FROM q)
),
contrib AS (
  SELECT qt._q, p._doc,
         (i.idf_micros * (
            (p.tf::HUGEINT * {_M + k1} * {_M}) //
            (p.tf::HUGEINT * {_M} + ({k1}::HUGEINT * ({_M} - {b} + ({b}::HUGEINT * ((p.dl * {_M}) // s.avgdl)) // {_M})) // {_M})
         )) // {_M} AS _c
  FROM postings p JOIN qt ON qt.h = p.h
  JOIN idf i ON i.h = p.h CROSS JOIN stats s
),
scored AS (SELECT _q, _doc, sum(_c)::BIGINT AS score_micros
           FROM contrib GROUP BY 1, 2)
SELECT _q AS query_id, _doc AS doc_id,
       row_number() OVER (PARTITION BY _q ORDER BY score_micros DESC, _doc ASC)::BIGINT AS rank,
       score_micros
FROM scored
QUALIFY rank <= {topk}
"""
