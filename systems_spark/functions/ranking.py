"""Retrieval-quality metrics: recall@k and MRR over ranked predictions.

The evaluation loop an ANN deployment needs: compare an approximate
retriever's ranked output (e.g. the LSH/IVF/PQ strategies of
``operators/ann.py``) against exact ground truth, per query and in
aggregate — recall collapse after an index rebuild should page someone,
not surface in downstream training three weeks later.

Determinism contract: all metrics are integer micros computed with
integer division (``1_000_000 * hits div n_truth``; MRR as
``1_000_000 div first_hit_rank``), so results are exact, order-independent
and replicable bit-for-bit in the SQL oracle — no float reduction anywhere.

100 TB shape: one equi-join of two (query, item, rank) tables on
(query, item) + one per-query count aggregation — narrow rows only, both
sides already tiny relative to the corpora they index. The roll-up is a
single map-side-combined aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_M = 1_000_000


def ranking_metrics(pred: DataFrame, truth: DataFrame,
                    query_col: str = "query_id", item_col: str = "item_id",
                    rank_col: str = "ann_rank") -> DataFrame:
    """Per-query metrics: ``n_truth``, ``n_hits``, ``recall_micros``
    (= 1e6·hits/|truth|, integer div), ``mrr_micros`` (= 1e6/rank of the
    first relevant prediction; 0 when nothing relevant was retrieved).

    Every query present in ``truth`` gets a row — a retriever that returns
    nothing for a query scores 0, not absent. Duplicate (query, item) rows
    on either side are collapsed first (a multi-probe retriever can emit
    the same candidate from several tables; counting it twice would report
    recall > 100% and mask a broken index behind a passing gate)."""
    q, i, r = query_col, item_col, rank_col
    pred = pred.groupBy(q, i).agg(F.min(r).alias(r))
    truth = truth.select(q, i).distinct()
    truth_q = truth.groupBy(q).agg(F.count(F.lit(1)).alias("n_truth"))
    hits = (pred.join(truth, on=[q, i])
            .groupBy(q).agg(F.count(F.lit(1)).alias("n_hits"),
                            F.min(r).alias("_first")))
    return (truth_q.join(hits, on=q, how="left")
            .select(q, "n_truth",
                    F.coalesce(F.col("n_hits"), F.lit(0)).alias("n_hits"),
                    F.expr(f"coalesce(n_hits, 0) * {_M} div n_truth")
                     .alias("recall_micros"),
                    F.coalesce(F.expr(f"{_M} div _first"), F.lit(0))
                     .alias("mrr_micros")))


def _ndcg_discounts(k: int):
    """Per-rank discount micros round(1e6 / log2(rank+1)) for ranks
    1..k, plus the ideal-DCG prefix sums — computed ONCE in Python and
    embedded as literals in BOTH plans. This is the BM25/LM ln-micros
    quantization pattern: the only transcendental (log2) happens at
    plan-build time, so every engine-side operation is an exact integer
    sum/division and NDCG replays bit-for-bit."""
    import math

    if k < 1:
        raise ValueError("k must be >= 1")
    d = [round(_M / math.log2(r + 1)) for r in range(1, k + 1)]
    prefix, acc = [], 0
    for x in d:
        acc += x
        prefix.append(acc)
    return d, prefix


def ndcg_metrics(pred: DataFrame, truth: DataFrame, k: int = 5,
                 query_col: str = "query_id", item_col: str = "item_id",
                 rank_col: str = "ann_rank") -> DataFrame:
    """Per-query NDCG@k with binary relevance: DCG = Σ over relevant
    predictions at rank ≤ k of discount(rank); IDCG = the best
    achievable with min(|truth|, k) relevant items at the top; ndcg =
    1e6·DCG div IDCG. Every truth query gets a row (empty retrieval
    scores 0); duplicate (query, item) pairs collapse to their best
    rank, like :func:`ranking_metrics`."""
    q, i, r = query_col, item_col, rank_col
    d, prefix = _ndcg_discounts(k)
    pred = pred.groupBy(q, i).agg(F.min(r).alias(r))
    truth = truth.select(q, i).distinct()
    truth_q = truth.groupBy(q).agg(F.count(F.lit(1)).alias("n_truth"))
    # ranks are 1-based BY CONTRACT — enforced in-expression (the
    # pagerank weight pattern): a 0-based feed would crash Spark's
    # element_at while the SQL twin silently dropped the best hit, and
    # negative ranks would silently index from the array end in both
    # engines (review r6) — all three now raise identically
    disc = F.when(
        F.col(r) >= 1,
        F.element_at(F.array(*[F.lit(x).cast("long") for x in d]),
                     F.col(r).cast("int"))
    ).otherwise(F.raise_error(F.lit(
        "ndcg_metrics: ranks must be >= 1 (1-based)")).cast("long"))
    dcg = (pred.where(F.col(r) <= k)
           .join(truth, on=[q, i])
           .groupBy(q).agg(F.sum(disc).alias("dcg_micros")))
    idcg = F.element_at(F.array(*[F.lit(x).cast("long") for x in prefix]),
                        F.least(F.col("n_truth"), F.lit(k)).cast("int"))
    return (truth_q.join(dcg, on=q, how="left")
            .select(q, "n_truth",
                    F.coalesce(F.col("dcg_micros"), F.lit(0)).cast("long")
                    .alias("dcg_micros"),
                    idcg.alias("idcg_micros"))
            .withColumn("ndcg_micros",
                        F.expr(f"dcg_micros * {_M} div idcg_micros")))


def ndcg_metrics_sql(pred_sql: str, truth_sql: str, k: int = 5,
                     query_col: str = "query_id",
                     item_col: str = "item_id",
                     rank_col: str = "ann_rank") -> str:
    """DuckDB twin of :func:`ndcg_metrics` — same embedded discount
    literals."""
    q, i, r = query_col, item_col, rank_col
    d, prefix = _ndcg_discounts(k)
    d_lit = "[" + ", ".join(str(x) for x in d) + "]"
    p_lit = "[" + ", ".join(str(x) for x in prefix) + "]"
    return f"""
WITH pred0 AS ({pred_sql}),
truth0 AS ({truth_sql}),
pred AS (SELECT {q}, {i}, min({r}) AS {r} FROM pred0 GROUP BY 1, 2),
truth AS (SELECT DISTINCT {q}, {i} FROM truth0),
truth_q AS (SELECT {q}, count(*) AS n_truth FROM truth GROUP BY 1),
dcg AS (
  SELECT p.{q},
         sum(CASE WHEN p.{r} >= 1 THEN ({d_lit})[p.{r}]
                  ELSE error('ndcg_metrics: ranks must be >= 1 (1-based)')
             END)::BIGINT AS dcg_micros
  FROM pred p JOIN truth t USING ({q}, {i})
  WHERE p.{r} <= {k}
  GROUP BY 1
)
SELECT tq.{q}, tq.n_truth,
       coalesce(d.dcg_micros, 0)::BIGINT AS dcg_micros,
       (({p_lit})[least(tq.n_truth, {k})])::BIGINT AS idcg_micros,
       (coalesce(d.dcg_micros, 0) * {_M}
          // ({p_lit})[least(tq.n_truth, {k})])::BIGINT AS ndcg_micros
FROM truth_q tq LEFT JOIN dcg d USING ({q})
"""


def summarize_ranking(per_query: DataFrame,
                      query_col: str = "query_id") -> DataFrame:
    """Corpus roll-up of :func:`ranking_metrics` output: query count, mean
    recall/MRR micros (integer mean of integer per-query values)."""
    return per_query.agg(
        F.count(F.lit(1)).alias("n_queries"),
        F.expr("sum(recall_micros) div count(1)").alias("mean_recall_micros"),
        F.expr("sum(mrr_micros) div count(1)").alias("mean_mrr_micros"))


def rrf_fuse(rankings, query_col: str = "query_id", item_col: str = "doc_id",
             rank_col: str = "rank", k: int = 60, topk: int = 10) -> DataFrame:
    """Reciprocal-rank fusion of several ranked lists (Cormack et al.):
    fused score = Σ_lists 1e6 div (k + rank) — integer by construction, so
    hybrid sparse+dense retrieval stays oracle-exact. Returns the top-k
    per query by (fused score desc, item asc).

    Scale shape: a union of already-tiny top-k tables + one integer-sum
    groupBy + one per-query window; nothing here touches the corpora the
    input rankers indexed."""
    if not rankings:
        raise ValueError("need at least one ranking")
    q, i, r = query_col, item_col, rank_col
    contribs = None
    for df in rankings:
        c = df.select(q, i, F.expr(f"{_M} div ({k} + {r})").alias("_c"))
        contribs = c if contribs is None else contribs.unionByName(c)
    fused = contribs.groupBy(q, i).agg(F.sum("_c").alias("rrf_micros"))
    from pyspark.sql import Window
    w = Window.partitionBy(q).orderBy(F.col("rrf_micros").desc(),
                                      F.col(i).asc())
    return (fused.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= topk)
            .select(q, i, F.col("rank").cast("long").alias("rank"),
                    "rrf_micros"))


def rrf_fuse_sql(ranking_sqls, query_col: str = "query_id",
                 item_col: str = "doc_id", rank_col: str = "rank",
                 k: int = 60, topk: int = 10) -> str:
    """DuckDB twin of :func:`rrf_fuse` over full-SELECT ranking strings."""
    q, i, r = query_col, item_col, rank_col
    unions = "\nUNION ALL\n".join(
        f"SELECT {q}, {i}, {_M} // ({k} + {r}) AS _c FROM ({s})"
        for s in ranking_sqls)
    return f"""
WITH contribs AS ({unions}),
fused AS (SELECT {q}, {i}, sum(_c)::BIGINT AS rrf_micros
          FROM contribs GROUP BY 1, 2)
SELECT {q}, {i},
       row_number() OVER (PARTITION BY {q} ORDER BY rrf_micros DESC, {i} ASC)::BIGINT AS rank,
       rrf_micros
FROM fused
QUALIFY rank <= {topk}
"""


def ranking_metrics_sql(pred_sql: str, truth_sql: str,
                        query_col: str = "query_id",
                        item_col: str = "item_id",
                        rank_col: str = "ann_rank") -> str:
    """DuckDB twin of :func:`ranking_metrics`: ``pred_sql``/``truth_sql``
    are full SELECTs yielding (query, item, rank) shapes."""
    q, i, r = query_col, item_col, rank_col
    return f"""
WITH pred0 AS ({pred_sql}),
truth0 AS ({truth_sql}),
pred AS (SELECT {q}, {i}, min({r}) AS {r} FROM pred0 GROUP BY 1, 2),
truth AS (SELECT DISTINCT {q}, {i} FROM truth0),
truth_q AS (SELECT {q}, count(*) AS n_truth FROM truth GROUP BY 1),
hits AS (
  SELECT p.{q}, count(*) AS n_hits, min(p.{r}) AS _first
  FROM pred p JOIN truth t USING ({q}, {i})
  GROUP BY 1
)
SELECT tq.{q}, tq.n_truth,
       coalesce(h.n_hits, 0) AS n_hits,
       coalesce(h.n_hits, 0) * {_M} // tq.n_truth AS recall_micros,
       coalesce({_M} // h._first, 0) AS mrr_micros
FROM truth_q tq LEFT JOIN hits h USING ({q})
"""
