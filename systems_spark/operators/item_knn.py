"""Item-item kNN over binary co-occurrence — the classic item-based CF
retrieval prior (Sarwar et al., "Item-based collaborative filtering
recommendation algorithms", WWW 2001).

The reference's retrieval stage consumes a precomputed candidate index
(reference: merlin/systems/dag/ops/faiss.py queries a trained ANN over
item embeddings); this operator builds the COUNT-BASED neighbor table
that recommenders bootstrap from before any embedding exists: for every
item, the k most similar items by binary cosine (Ochiai coefficient)
over shared baskets,

    sim(a, b) = cooc(a, b) / sqrt(n_a * n_b)

with ``cooc`` the number of baskets containing both and ``n_i`` the
number containing item i. The emitted score is the SQUARED cosine in
integer micros — ``cooc² · 10⁶ div (n_a · n_b)`` — so the whole lane is
exact integer arithmetic (the repo's micros discipline: no float sqrt,
no rounding drift between engines); squared cosine is order-preserving
for ranking, which is all a kNN table needs.

Determinism contract: neighbors rank by (sim² desc, cooc desc,
neighbor id asc) — a total order, so top-k is unique in both engines.

100 TB shape: the basket incidence is deduped FIRST (distinct
(basket, item) — one hash aggregation), so the within-basket self-join
fanout is bounded by distinct basket size, not raw row multiplicity;
pair counting is one shuffle on the basket key + one on the pair key;
the per-item count table joins on item keys (AQE broadcasts it when
small). The top-k window partitions by item — many small groups, never
a single-task stage. Whale baskets (a crawler "user" touching 10⁶
items) are the quadratic hazard: ``max_basket_size`` drops baskets
with more distinct items than the cap BEFORE the self-join (an
over-wide basket is the least informative co-occurrence evidence —
the same argument as winnow's ``max_doc_freq`` and simhash's
``max_bucket_size``). Default off: the oracle contract wants exact
output, and the driver data has no whales; production at scale sets it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from systems_spark.pinning import pin


def item_knn(df: DataFrame, basket_col: str, item_col: str, k: int = 5,
             min_cooc: int = 2,
             max_basket_size: "int | None" = None,
             cache_incidence: bool = True) -> DataFrame:
    """(item, neighbor, cooc, sim2_micros, rank): each item's top-``k``
    neighbors by squared binary cosine over shared baskets, pairs with
    fewer than ``min_cooc`` shared baskets pruned before ranking.

    ``cache_incidence`` (default on) pins the deduped incidence with a
    lazy localCheckpoint: three consumers (self-join L/R + item counts)
    would otherwise each re-run the scan + distinct (the substring_dedup
    gram-stream lesson). ``False`` trades re-execution for zero storage
    at extreme scale."""
    if k < 1:
        raise ValueError("k must be >= 1")
    if min_cooc < 1:
        raise ValueError("min_cooc must be >= 1")
    if max_basket_size is not None and max_basket_size < 2:
        raise ValueError("max_basket_size must be >= 2 (pairs need 2)")

    inc = df.select(F.col(basket_col).alias("_b"),
                    F.col(item_col).alias("_i")).distinct()
    if max_basket_size is not None:
        ok = (inc.groupBy("_b").agg(F.count(F.lit(1)).alias("_sz"))
              .where(F.col("_sz") <= max_basket_size).select("_b"))
        inc = inc.join(ok, on="_b", how="semi")
    if cache_incidence:
        inc = pin(inc, corpus_scale=True)
    counts = inc.groupBy("_i").agg(F.count(F.lit(1)).alias("_n"))

    pairs = (
        inc.alias("L")
        .join(inc.alias("R"), on=[
            F.col("L._b") == F.col("R._b"),
            F.col("L._i") < F.col("R._i"),
        ])
        .groupBy(F.col("L._i").alias("_a"), F.col("R._i").alias("_c"))
        .agg(F.count(F.lit(1)).alias("cooc"))
        .where(F.col("cooc") >= min_cooc)
    )
    # symmetrize before ranking: every item sees its full neighbor set
    sym = pairs.select(F.col("_a").alias("item"),
                       F.col("_c").alias("neighbor"), "cooc") \
        .unionByName(pairs.select(F.col("_c").alias("item"),
                                  F.col("_a").alias("neighbor"), "cooc"))
    scored = (
        sym.join(counts.select(F.col("_i").alias("item"),
                               F.col("_n").alias("_na")), on="item")
        .join(counts.select(F.col("_i").alias("neighbor"),
                            F.col("_n").alias("_nb")), on="neighbor")
        # cooc² · 10⁶ overflows int64 past cooc ≈ 3·10⁶ (a plausible
        # corpus-scale co-count) and n_a · n_b past n ≈ 3·10⁹ baskets,
        # so BOTH sides widen to decimal(38,0), matching the twin's
        # HUGEINT (review: an int64 denominator wrapped exactly at the
        # corpus scale the numerator widening targets)
        .withColumn("sim2_micros", F.expr(
            "CAST(CAST(cooc AS DECIMAL(38,0)) * cooc * 1000000"
            " DIV (CAST(_na AS DECIMAL(38,0)) * _nb) AS BIGINT)"))
    )
    w = Window.partitionBy("item").orderBy(
        F.col("sim2_micros").desc(), F.col("cooc").desc(),
        F.col("neighbor").asc())
    return (scored.withColumn("rank", F.row_number().over(w).cast("long"))
            .where(F.col("rank") <= k)
            .select("item", "neighbor", "cooc", "sim2_micros", "rank"))


def item_cf_recommend(history: DataFrame, neighbors: DataFrame,
                      user_col: str, item_col: str,
                      top_n: int = 3) -> DataFrame:
    """(user, item, score_micros, n_contributors, rec_rank): item-based
    CF scoring over a precomputed kNN table (the classic
    two-stage "related items you haven't bought" retrieval):

        score(u, j) = Σ_{i ∈ history(u)} sim²(i, j)

    summed over the user's distinct history items whose neighbor lists
    contain j, with j already in history(u) anti-filtered out, top-N
    per user by (score desc, item asc). ``neighbors`` is
    :func:`item_knn` output (or any (item, neighbor, sim2_micros)
    frame).

    100 TB shape: history dedups to (user, item) once; the scoring join
    fans each history row out by at most k neighbors; the score
    aggregation is map-side combinable on (user, candidate); the
    anti-join and top-N window both ride the user-hash partitioning
    (many small groups). Scores sum in decimal(38,0) so the SUM itself
    never wraps (a 10⁸-item history × 10⁶-micros sims exceeds int64);
    the final narrowing cast to bigint is safe to ~9.2×10¹² summed
    sim²-units per candidate — beyond that Spark's non-ANSI cast yields
    NULL where the DuckDB twin's ::BIGINT raises, so the honest
    contract is "exact up to int64 on the TOTAL, loud-ish beyond"."""
    if top_n < 1:
        raise ValueError("top_n must be >= 1")
    # (r12 perf note: pinning this deduped history was measured 1.38×
    # SLOWER isolated — the pin's materialization barrier loses the
    # planner's size estimate and the cheap re-scan beats it; left lazy.)
    hist = history.select(F.col(user_col).alias("_u"),
                          F.col(item_col).alias("_i")).distinct()
    # r13 (guide §2.4, VERDICT r12 item 7): the "already bought"
    # anti-join is folded INTO the scoring aggregation — history rows
    # ride the same (user, candidate) shuffle as ownership markers
    # (NULL sim2, _own=1) instead of a separate exchange + join of the
    # history after the agg. A candidate with max(_own) = 1 is owned
    # and drops; score/contributor aggregates ignore the NULL-sim2
    # marker rows, so results are identical.
    contrib = (
        hist.join(neighbors.select(F.col("item").alias("_i"),
                                   F.col("neighbor").alias("_cand"),
                                   "sim2_micros"), on="_i")
        .select("_u", "_cand", "sim2_micros", F.lit(0).alias("_own"))
        .unionByName(
            hist.select("_u", F.col("_i").alias("_cand"),
                        F.lit(None).cast("long").alias("sim2_micros"),
                        F.lit(1).alias("_own"))))
    scored = (
        contrib
        .groupBy("_u", "_cand")
        .agg(F.expr("CAST(sum(CAST(sim2_micros AS DECIMAL(38,0)))"
                    " AS BIGINT)").alias("score_micros"),
             F.count("sim2_micros").alias("n_contributors"),
             F.max("_own").alias("_owned"))
        .where(F.col("_owned") == 0)
        .drop("_owned"))
    w = Window.partitionBy("_u").orderBy(
        F.col("score_micros").desc(), F.col("_cand").asc())
    return (scored.withColumn("rec_rank",
                              F.row_number().over(w).cast("long"))
            .where(F.col("rec_rank") <= top_n)
            .select(F.col("_u").alias(user_col),
                    F.col("_cand").alias(item_col),
                    "score_micros", "n_contributors", "rec_rank"))


def item_cf_recommend_sql(history_sql: str, neighbors_sql: str,
                          user_col: str, item_col: str,
                          top_n: int = 3) -> str:
    """DuckDB twin of :func:`item_cf_recommend` — ``history_sql`` yields
    (``user_col``, ``item_col``) raw rows, ``neighbors_sql`` yields
    (item, neighbor, sim2_micros, ...)."""
    if top_n < 1:
        raise ValueError("top_n must be >= 1")
    return f"""
WITH hist AS (
  SELECT DISTINCT {user_col} AS u, {item_col} AS i FROM ({history_sql})
),
nbr AS ({neighbors_sql}),
scored AS (
  SELECT h.u, n.neighbor AS cand,
         sum(n.sim2_micros::HUGEINT)::BIGINT AS score_micros,
         count(*)::BIGINT AS n_contributors
  FROM hist h JOIN nbr n ON n.item = h.i
  GROUP BY 1, 2
),
fresh AS (
  SELECT s.* FROM scored s
  ANTI JOIN hist h ON h.u = s.u AND h.i = s.cand
)
SELECT u AS {user_col}, cand AS {item_col}, score_micros, n_contributors,
       row_number() OVER (PARTITION BY u
                          ORDER BY score_micros DESC, cand ASC)::BIGINT
         AS rec_rank
FROM fresh
QUALIFY rec_rank <= {top_n}
"""


def item_knn_sql(source_sql: str, basket_expr: str, item_expr: str,
                 k: int = 5, min_cooc: int = 2) -> str:
    """DuckDB twin of :func:`item_knn` (uncapped — the exact contract
    the default operator computes). ``source_sql`` yields the raw
    (basket, item) stream."""
    if k < 1:
        raise ValueError("k must be >= 1")
    if min_cooc < 1:
        raise ValueError("min_cooc must be >= 1")
    return f"""
WITH inc AS (
  SELECT DISTINCT {basket_expr} AS b, {item_expr} AS i FROM ({source_sql})
),
cnt AS (SELECT i, count(*)::BIGINT AS n FROM inc GROUP BY 1),
pairs AS (
  SELECT L.i AS a, R.i AS c, count(*)::BIGINT AS cooc
  FROM inc L JOIN inc R ON L.b = R.b AND L.i < R.i
  GROUP BY 1, 2
  HAVING count(*) >= {min_cooc}
),
sym AS (
  SELECT a AS item, c AS neighbor, cooc FROM pairs
  UNION ALL
  SELECT c AS item, a AS neighbor, cooc FROM pairs
),
scored AS (
  SELECT s.item, s.neighbor, s.cooc,
         (s.cooc::HUGEINT * s.cooc * 1000000
          // (ca.n::HUGEINT * cb.n))::BIGINT AS sim2_micros
  FROM sym s
  JOIN cnt ca ON ca.i = s.item
  JOIN cnt cb ON cb.i = s.neighbor
)
SELECT item, neighbor, cooc, sim2_micros,
       row_number() OVER (PARTITION BY item
                          ORDER BY sim2_micros DESC, cooc DESC,
                                   neighbor ASC)::BIGINT AS rank
FROM scored
QUALIFY rank <= {k}
"""
