"""Categorify — fit a vocabulary, encode categoricals as contiguous codes.

Reference semantics: NVTabular ``Categorify`` fitted inside
``TransformWorkflow`` — fit builds a vocabulary, transform maps string/int
categories to contiguous integer codes whose cardinality feeds embedding
sizes (reference usage: tests/unit/systems/dag/test_graph.py:53-54,
tests/unit/systems/ops/tf/test_ensemble.py:128-139; embedding-size
properties merlin/systems/workflow/__init__.py:18-65).

Spark-first: fit = one distributed ``groupBy(col).count()`` (map-side partial
aggregation; at 100 TB this is the canonical scalable vocab build — no
driver-side collect unless the vocab itself is collected for broadcast, and
vocabularies are small by construction). transform = broadcast join against
the vocab table.

**Deterministic code assignment** (unlike StringIndexer's tie order):
codes are 1..N ordered by (frequency DESC, value ASC); 0 is reserved for
null / out-of-vocabulary (the NVTabular convention). Fully expressible in
SQL → oracle-checkable:

    SELECT value, ROW_NUMBER() OVER (ORDER BY cnt DESC, value ASC) AS code ...
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from systems_spark.operators.base import Operator


class Categorify(Operator):
    def __init__(self, columns, out_suffix: str = "", freq_threshold: int = 0):
        self.columns = [columns] if isinstance(columns, str) else list(columns)
        self.out_suffix = out_suffix
        self.freq_threshold = int(freq_threshold)
        self.vocabs = {}  # col -> DataFrame(value, code)
        self.requires = tuple(self.columns)

    @staticmethod
    def build_vocab(df: DataFrame, column: str, freq_threshold: int = 0) -> DataFrame:
        counts = (
            df.where(F.col(column).isNotNull())
            .groupBy(F.col(column).alias("value"))
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        if freq_threshold > 0:
            counts = counts.where(F.col("cnt") >= freq_threshold)
        w = Window.orderBy(F.col("cnt").desc(), F.col("value").asc())
        # single-partition window is fine: vocabularies are small by definition
        return counts.select("value", F.row_number().over(w).alias("code"))

    def fit(self, df: DataFrame) -> "Categorify":
        for c in self.columns:
            self.vocabs[c] = self.build_vocab(df, c, self.freq_threshold)
        return self

    def transform(self, df: DataFrame) -> DataFrame:
        if set(self.vocabs) != set(self.columns):
            raise RuntimeError("Categorify.transform called before fit")
        out = df
        for c in self.columns:
            vocab = F.broadcast(
                self.vocabs[c].select(
                    F.col("value").alias(c), F.col("code").alias(f"_code_{c}")
                )
            )
            out = (
                out.join(vocab, on=c, how="left")
                .withColumn(
                    f"{c}{self.out_suffix}",
                    F.coalesce(F.col(f"_code_{c}"), F.lit(0)).cast("long"),
                )
                .drop(f"_code_{c}")
            )
        return out

    # cardinality feeds embedding sizes (workflow/__init__.py:46-57)
    def cardinality(self, column: str) -> int:
        return self.vocabs[column].count()

    def get_params(self):
        return {"columns": self.columns, "out_suffix": self.out_suffix,
                "freq_threshold": self.freq_threshold}

    def save_artifacts(self, path: str) -> None:
        for c, v in self.vocabs.items():
            v.write.mode("overwrite").parquet(f"{path}/vocab_{c}.parquet")

    def load_artifacts(self, path: str, spark=None) -> None:
        for c in self.columns:
            self.vocabs[c] = spark.read.parquet(f"{path}/vocab_{c}.parquet")
