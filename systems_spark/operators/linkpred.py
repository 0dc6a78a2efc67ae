"""Link prediction — common-neighbors and Adamic–Adar scores.

Adamic & Adar, "Friends and neighbors on the Web" (Social Networks
2003); Liben-Nowell & Kleinberg, "The link-prediction problem for
social networks" (CIKM 2003). For each NON-adjacent pair (a, b)
sharing at least one neighbor:

    common(a,b) = |N(a) ∩ N(b)|
    AA(a,b)     = Σ_{z ∈ N(a) ∩ N(b)}  1 / ln(deg z)

— the "products bought together with both" recommender signal, with
shared RARE neighbors weighted up and shared hubs weighted toward
zero. The graph-family member that predicts EDGES where PageRank
ranks nodes and communities partition them.

Exactness discipline: the per-neighbor weight is quantized ONCE from
the degree table — ``round(10⁶ / ln(deg))`` of an identical exact
integer in both engines (the BM25 idf pattern) — and scores are exact
integer sums of those quantized weights. A common neighbor always has
degree ≥ 2 (it touches both a and b), so ln(deg) > 0 on every consumed
row.

100 TB shape: wedge enumeration through the common neighbor z — one
self-equi-join of the adjacency on z — shuffles (z, neighbor) pairs;
a hub z emits deg(z)² wedge rows, which is the same hazard the
triangle counter orients away and the LSH families cap. Here the cap
IS principled: ``max_degree`` drops hub CENTERS whose AA weight is
already ≈ 0 (1/ln(deg) vanishes exactly where the blowup lives), so
the trade removes the least-informative evidence first. Endpoint
degrees are unaffected — only the shared-neighbor role is capped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_M = 1_000_000


def link_scores(edges: DataFrame, src: str = "src", dst: str = "dst",
                max_degree: "int | None" = None) -> DataFrame:
    """(a, b, common, aa_micros) with a < b, for every non-adjacent
    pair sharing ≥ 1 neighbor. ``edges`` is directed input; adjacency
    is symmetrized + deduplicated internally. ``max_degree`` (optional)
    excludes hubs of larger degree from the shared-neighbor CENTER
    role (documented recall trade — their weight is already ≈ 0)."""
    if max_degree is not None and max_degree < 2:
        raise ValueError("max_degree must be >= 2")
    e = edges.select(F.col(src).alias("_u"), F.col(dst).alias("_v"))
    adj = (e.union(e.select(F.col("_v").alias("_u"),
                            F.col("_u").alias("_v")))
           .where(F.col("_u") != F.col("_v"))
           .distinct()
           # consumers: degree table, two wedge sides, adjacency
           # anti-join — pin once (the repo pinning discipline)
           .localCheckpoint(eager=False))
    deg = adj.groupBy("_u").agg(F.count(F.lit(1)).alias("_deg"))
    wz = deg.select(
        F.col("_u").alias("_z"),
        F.col("_deg"),
        F.when(F.col("_deg") >= 2,
               F.round(F.lit(float(_M)) / F.log(F.col("_deg")
                                                .cast("double"))))
        .cast("long").alias("_wz"))
    if max_degree is not None:
        wz = wz.where(F.col("_deg") <= max_degree)
    # adjacency keyed by the shared neighbor z, weight attached once
    by_z = (adj.select(F.col("_u").alias("_z"),
                       F.col("_v").alias("_n"))
            .join(wz.select("_z", "_wz"), on="_z"))
    lhs = by_z.select("_z", F.col("_n").alias("a"), "_wz")
    rhs = by_z.select("_z", F.col("_n").alias("b"))
    wedges = lhs.join(rhs, on="_z").where(F.col("a") < F.col("b"))
    scored = (wedges.groupBy("a", "b")
              .agg(F.count(F.lit(1)).alias("common"),
                   F.sum("_wz").alias("aa_micros")))
    existing = adj.where(F.col("_u") < F.col("_v")) \
        .select(F.col("_u").alias("a"), F.col("_v").alias("b"))
    return (scored.join(existing, on=["a", "b"], how="anti")
            .select("a", "b", "common",
                    F.col("aa_micros").cast("long").alias("aa_micros")))


def link_scores_sql(edges_sql: str, src: str = "src", dst: str = "dst",
                    max_degree: "int | None" = None) -> str:
    """DuckDB twin of :func:`link_scores`."""
    if max_degree is not None and max_degree < 2:
        raise ValueError("max_degree must be >= 2")
    cap = f"WHERE _deg <= {max_degree}" if max_degree is not None else ""
    return f"""
WITH e AS (SELECT {src} AS u, {dst} AS v FROM ({edges_sql})),
adj AS (
  SELECT DISTINCT u, v FROM (
    SELECT u, v FROM e UNION ALL SELECT v, u FROM e
  ) WHERE u <> v
),
deg AS (SELECT u AS z, count(*)::BIGINT AS _deg FROM adj GROUP BY 1),
wz AS (
  -- deg-1 centers can never be a COMMON neighbor, but the expression
  -- must not divide by ln(1) = 0 on their rows (DuckDB evaluates
  -- eagerly; the Spark side guards with WHEN _deg >= 2 identically)
  SELECT z, CASE WHEN _deg >= 2
                 THEN round({_M}::DOUBLE / ln(_deg::DOUBLE))::BIGINT
            END AS _wz
  FROM deg {cap}
),
by_z AS (
  SELECT a.u AS z, a.v AS n, w._wz
  FROM adj a JOIN wz w ON w.z = a.u
),
wedges AS (
  SELECT l.n AS a, r.n AS b, l._wz
  FROM by_z l JOIN by_z r ON l.z = r.z AND l.n < r.n
),
scored AS (
  SELECT a, b, count(*)::BIGINT AS common,
         sum(_wz)::BIGINT AS aa_micros
  FROM wedges GROUP BY 1, 2
)
SELECT s.a, s.b, s.common, s.aa_micros
FROM scored s
ANTI JOIN adj x ON x.u = s.a AND x.v = s.b
"""
