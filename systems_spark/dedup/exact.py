"""Exact deduplication — hash-groupBy on content.

The 100 TB workhorse: group documents by a content hash and keep one
representative per group (the minimum id — deterministic). The groupBy
shuffles only (hash, id) pairs — never the document bodies — because we
hash FIRST and aggregate the narrow projection; at scale this is the
difference between shuffling 100 TB and shuffling ~2 GB of keys.

``transform`` returns the surviving rows; ``duplicates`` returns the
(kept_id, dup_id) mapping for lineage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from systems_spark.functions.hashing import hash64
from systems_spark.functions.text import WS_RUN, ws_fold, ws_fold_sql
from systems_spark.operators.base import Operator


class ExactDedup(Operator):
    def __init__(self, content_col: str = "text", id_col: str = "doc_id",
                 normalize: bool = True):
        self.content_col = content_col
        self.id_col = id_col
        self.normalize = normalize
        self.requires = (content_col, id_col)

    def _key(self) -> F.Column:
        c = F.col(self.content_col)
        if self.normalize:
            # fold exotic unicode spaces (portable translate, see
            # functions/text.py), collapse runs to one space, strip ends
            c = F.regexp_replace(
                F.regexp_replace(ws_fold(F.lower(c)), WS_RUN, " "), "^ +| +$", ""
            )
        return hash64(c)

    def key_sql(self, expr: str = "text") -> str:
        """DuckDB twin of :meth:`_key` (used by the oracle query)."""
        if not self.normalize:
            from systems_spark.functions.hashing import hash64_sql

            return hash64_sql(expr)
        from systems_spark.functions.hashing import hash64_sql

        norm = (
            f"regexp_replace(regexp_replace({ws_fold_sql(f'lower({expr})')}, "
            f"'{WS_RUN}', ' ', 'g'), '^ +| +$', '', 'g')"
        )
        return hash64_sql(norm)

    def transform(self, df: DataFrame) -> DataFrame:
        w = Window.partitionBy("_dedup_key").orderBy(F.col(self.id_col).asc())
        return (
            df.withColumn("_dedup_key", self._key())
            .withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_dedup_key", "_rn")
        )

    def duplicate_groups(self, df: DataFrame) -> DataFrame:
        """(key, group_size, kept_id) for groups with >1 member."""
        return (
            df.select(self._key().alias("dedup_key"), F.col(self.id_col))
            .groupBy("dedup_key")
            .agg(F.count(F.lit(1)).alias("group_size"),
                 F.min(self.id_col).alias("kept_id"))
            .where(F.col("group_size") > 1)
        )

    def get_params(self):
        return {"content_col": self.content_col, "id_col": self.id_col,
                "normalize": self.normalize}
