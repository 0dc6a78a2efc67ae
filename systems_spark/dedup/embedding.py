"""Embedding-cosine near-duplicate pairs.

Pairs of vectors whose cosine similarity ≥ threshold. Exact strategy is a
broadcast self-join (right for ≲1M vectors); the LSH strategy reuses the
deterministic hyperplane signatures from operators/ann.py to bucket first —
the 100 TB path (equi-join on an int signature, then exact rerank inside
buckets; recall tunable via n_tables/n_planes).

Threshold comparison happens on the rounded score so the SQL oracle (DuckDB
``list_cosine_similarity``) agrees at the boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from systems_spark.functions.similarity import dot_product, l2_norm
from systems_spark.operators.ann import hyperplane_signature
from systems_spark.operators.base import Operator


class EmbeddingDedup(Operator):
    def __init__(self, vec_col: str = "embedding", id_col: str = "vec_id",
                 threshold: float = 0.9, strategy: str = "exact",
                 dim: int = None, n_tables: int = 4, n_planes: int = 8,
                 round_dp: int = 6):
        self.vec_col = vec_col
        self.id_col = id_col
        self.threshold = float(threshold)
        self.strategy = strategy
        self.dim = dim
        self.n_tables = int(n_tables)
        self.n_planes = int(n_planes)
        self.round_dp = int(round_dp)
        self.requires = (vec_col, id_col)

    def _score_pairs(self, pairs: DataFrame) -> DataFrame:
        # norms were precomputed per vector (N sqrt-folds, not N² — the
        # expression dot/(na*nb) is bit-identical to dot/(sqrt(aa)*sqrt(bb)))
        cos = dot_product(F.col("_va"), F.col("_vb")) / (F.col("_na") * F.col("_nb"))
        return (
            pairs.withColumn("cosine", F.round(cos, self.round_dp))
            .where(F.col("cosine") >= self.threshold)
            .select("a", "b", "cosine")
        )

    def transform(self, df: DataFrame) -> DataFrame:
        # cast float→double ONCE per vector (not once per pair), and spread
        # the left side across all cores — a small parquet input arrives as
        # one partition, which would serialize the O(N²) pair computation
        vec_d = F.transform(F.col(self.vec_col), lambda x: x.cast("double"))
        base = df.select(F.col(self.id_col), vec_d.alias(self.vec_col))
        par = df.sparkSession.sparkContext.defaultParallelism * 2
        left = base.select(F.col(self.id_col).alias("a"), F.col(self.vec_col).alias("_va"),
                           l2_norm(F.col(self.vec_col)).alias("_na")).repartition(par)
        right = base.select(F.col(self.id_col).alias("b"), F.col(self.vec_col).alias("_vb"),
                            l2_norm(F.col(self.vec_col)).alias("_nb"))
        if self.strategy == "exact":
            pairs = left.join(F.broadcast(right), on=F.col("a") < F.col("b"))
            return self._score_pairs(pairs)
        if self.strategy == "lsh":
            if self.dim is None:
                raise ValueError("lsh strategy requires dim=")
            from systems_spark.operators.ann import _explode_signatures

            # ONE equi-join on (table, signature) via posexplode per side
            # (the Generate fences signature computation to once per row)
            # instead of n_tables joins + union — one shuffle stage
            l_sig = _explode_signatures(left, "_va", self.dim, self.n_planes, self.n_tables)
            r_sig = _explode_signatures(right, "_vb", self.dim, self.n_planes, self.n_tables)
            cands = (
                l_sig.join(r_sig, on=["_tbl", "_sig"])
                .where(F.col("a") < F.col("b"))
                .drop("_tbl", "_sig")
            )
            # score BEFORE dedup: cosine may be recomputed for a pair that
            # collides in several tables, but the dropDuplicates shuffle
            # then carries (a, b, cosine) instead of two full vectors per
            # candidate — the narrow-shuffle property that matters at scale
            return self._score_pairs(cands).dropDuplicates(["a", "b"])
        raise ValueError(f"unknown strategy {self.strategy!r}")

    def signatures(self, df: DataFrame) -> DataFrame:
        """(_id, _v, _n, _tbl, _sig): one row per (vector, LSH table) —
        the PERSISTABLE standing state of the incremental path.
        Hyperplane signatures are a pure per-vector function of the
        fixed md5 planes, so the standing corpus computes (and norms)
        each vector exactly once, ever; batches sign only themselves."""
        if self.strategy != "lsh":
            raise ValueError("signatures requires strategy='lsh'")
        if self.dim is None:
            raise ValueError("lsh strategy requires dim=")
        from systems_spark.operators.ann import _explode_signatures

        vec_d = F.transform(F.col(self.vec_col), lambda x: x.cast("double"))
        base = (df.select(F.col(self.id_col).alias("_id"),
                          vec_d.alias("_v"))
                .select("_id", "_v", l2_norm(F.col("_v")).alias("_n")))
        return _explode_signatures(base, "_v", self.dim, self.n_planes,
                                   self.n_tables)

    def incremental_pairs(self, corpus_sigs: DataFrame,
                          new_sigs: DataFrame,
                          check_disjoint: bool = True) -> DataFrame:
        """Near-dup pairs TOUCHING at least one NEW vector — the
        corpus-growth shape of the LSH strategy (the minhash/winnow
        ``incremental_pairs`` pattern, third family). Both inputs are
        :meth:`signatures` tables: the standing corpus persists its
        rows once (StateStore), the batch signs only ITS vectors, and
        the standing side is BUCKET-PRUNED first — a semi-join on the
        batch's (table, signature) keys (broadcastable: batch-sized)
        keeps only standing rows in buckets the batch actually probes,
        so per-batch cost tracks matching-bucket volume, not corpus
        size (r8's probe grew 1.29×/step from scanning the full
        standing table; the prune flattens it). corpus×corpus pairs
        are never re-derived, and standing ∪ delta equals a full
        recompute bucket-for-bucket. Ids must be disjoint (enforced;
        opt out with ``check_disjoint=False``). LSH strategy only
        (exact mode has no bucket structure to exploit); returns
        (a, b, cosine) like ``transform``. Fold into standing labels
        via ``incremental_components``."""
        if self.strategy != "lsh":
            raise ValueError("incremental_pairs requires strategy='lsh'")
        if self.dim is None:
            raise ValueError("lsh strategy requires dim=")
        if check_disjoint:
            from systems_spark.dedup.guards import ensure_disjoint_ids
            ensure_disjoint_ids(corpus_sigs, new_sigs, "_id",
                                "EmbeddingDedup.incremental_pairs")
        keys = new_sigs.select("_tbl", "_sig").distinct()
        pruned = corpus_sigs.join(keys, on=["_tbl", "_sig"], how="semi")
        # spread the probing side across all cores BEFORE the bucket
        # join — the same defense as transform(): a small parquet input
        # arrives in 1-2 partitions, and if the other side broadcasts,
        # the per-candidate cosine folds would all run serially there
        par = new_sigs.sparkSession.sparkContext.defaultParallelism * 2
        left = new_sigs.select(
            F.col("_id").alias("a"), F.col("_v").alias("_va"),
            F.col("_n").alias("_na"), "_tbl", "_sig").repartition(par)
        right = (pruned.withColumn("_new_b", F.lit(False))
                 .unionByName(new_sigs.withColumn("_new_b", F.lit(True)))
                 .select(F.col("_id").alias("b"), F.col("_v").alias("_vb"),
                         F.col("_n").alias("_nb"), "_new_b",
                         "_tbl", "_sig"))
        # orientation: L is always new; a new×new pair joins once via
        # a < b, a new×corpus pair once via R not-new — then ids are
        # normalized (cosine is symmetric, vectors need no swap)
        cands = (left.join(right, on=["_tbl", "_sig"])
                 .where((F.col("a") != F.col("b"))
                        & ((~F.col("_new_b")) | (F.col("a") < F.col("b"))))
                 .select(F.least("a", "b").alias("a"),
                         F.greatest("a", "b").alias("b"),
                         "_va", "_na", "_vb", "_nb"))
        return self._score_pairs(cands).dropDuplicates(["a", "b"])

    def pairs_oracle_sql(self, table: str = "embeddings") -> str:
        # mirror functions/similarity.py exactly: dot/(sqrt(aa)*sqrt(bb)),
        # left-to-right double folds — NOT list_cosine_similarity, whose
        # internal accumulation order isn't contractual
        va, vb = f"L.{self.vec_col}::DOUBLE[]", f"R.{self.vec_col}::DOUBLE[]"
        cos = (
            f"list_inner_product({va}, {vb}) / "
            f"(sqrt(list_inner_product({va}, {va})) * sqrt(list_inner_product({vb}, {vb})))"
        )
        return f"""
SELECT L.{self.id_col} AS a, R.{self.id_col} AS b,
       round({cos}, {self.round_dp}) AS cosine
FROM {table} L JOIN {table} R ON L.{self.id_col} < R.{self.id_col}
WHERE round({cos}, {self.round_dp}) >= {self.threshold}
"""

    def lsh_pairs_oracle_sql(self, table: str = "embeddings") -> str:
        """Full SQL oracle for the BUCKETED (100 TB) strategy: candidate
        pairs share at least one md5-deterministic hyperplane signature
        (hyperplane_signature_sql replicates the Spark bits exactly), then
        the same rounded-cosine threshold as the exact path."""
        from systems_spark.operators.ann import hyperplane_signature_sql

        if self.dim is None:
            raise ValueError("lsh oracle requires dim=")
        sigs = ", ".join(
            f"{hyperplane_signature_sql(self.vec_col, self.dim, self.n_planes, t)} AS s{t}"
            for t in range(self.n_tables)
        )
        bucket_match = " OR ".join(f"L.s{t} = R.s{t}" for t in range(self.n_tables))
        va, vb = "va::DOUBLE[]", "vb::DOUBLE[]"
        cos = (
            f"list_inner_product({va}, {vb}) / "
            f"(sqrt(list_inner_product({va}, {va})) * sqrt(list_inner_product({vb}, {vb})))"
        )
        # MATERIALIZED: DuckDB inlines CTEs by default, which would
        # re-evaluate the unrolled signature expressions once per JOIN pair
        # instead of once per row
        return f"""
WITH sigs AS MATERIALIZED (
  SELECT {self.id_col}, {self.vec_col}, {sigs} FROM {table}
), cand AS (
  SELECT DISTINCT L.{self.id_col} AS a, R.{self.id_col} AS b,
         L.{self.vec_col} AS va, R.{self.vec_col} AS vb
  FROM sigs L JOIN sigs R
    ON L.{self.id_col} < R.{self.id_col} AND ({bucket_match})
)
SELECT a, b, round({cos}, {self.round_dp}) AS cosine
FROM cand
WHERE round({cos}, {self.round_dp}) >= {self.threshold}
"""

    def get_params(self):
        return {"vec_col": self.vec_col, "id_col": self.id_col,
                "threshold": self.threshold, "strategy": self.strategy,
                "dim": self.dim, "n_tables": self.n_tables,
                "n_planes": self.n_planes, "round_dp": self.round_dp}
