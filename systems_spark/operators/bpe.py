"""Byte-pair-encoding tokenizer TRAINING, distributed and exact.

The reference has no tokenizer; a 100 TB training-data pipeline trains
its own (Sennrich et al., ACL 2016 — the GPT-2/SentencePiece-BPE merge
scheme). The shape that scales is the classic one: ONE corpus pass
reduces text to a (word, freq) vocabulary table — merges operate on the
weighted vocab, never the raw corpus again — and each merge round is
one narrow aggregation over adjacent symbol pairs plus a JVM-side fold
that rewrites the symbol arrays. Nothing collects to the driver except
the per-round winning pair (a fit-time scalar, like k-means centroids).

Determinism contract: pair counts are exact integer sums of word
frequencies; the winning pair breaks count ties lexicographically
(left, then right), so the learned merge table replays bit-for-bit —
graded via the pinned-snapshot oracle discipline (implicit_recommend /
predict_forest precedent) plus an independent pure-Python BPE test leg.

Merging is the standard greedy left-to-right single pass per word
(an occurrence formed by a merge does not re-participate in the same
round), implemented as one ``F.aggregate`` fold with a carry
accumulator — whole-stage-codegen JVM expressions, no Python in the
loop. Words carry the ``</w>`` end-of-word marker, so merges never
cross word boundaries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from systems_spark.functions import text as TX
from systems_spark.operators.base import Operator

__all__ = ["BpeTokenizer"]

_EOW = "</w>"


def _merge_expr(symbols, left: str, right: str):
    """Column: ``symbols`` (array<string>) with every non-overlapping
    (left, right) adjacency merged greedy-left into left+right."""
    merged = left + right
    init = F.struct(
        F.array().cast("array<string>").alias("out"),
        F.lit(None).cast("string").alias("carry"))

    def step(acc, s):
        hit = acc["carry"].eqNullSafe(F.lit(left)) & (s == F.lit(right))
        return F.struct(
            F.when(hit, F.concat(acc["out"], F.array(F.lit(merged))))
            .otherwise(F.when(acc["carry"].isNull(), acc["out"])
                       .otherwise(F.concat(acc["out"],
                                           F.array(acc["carry"]))))
            .alias("out"),
            F.when(hit, F.lit(None).cast("string")).otherwise(s)
            .alias("carry"))

    def finish(acc):
        return (F.when(acc["carry"].isNull(), acc["out"])
                .otherwise(F.concat(acc["out"], F.array(acc["carry"]))))

    return F.aggregate(symbols, init, step, finish)


class BpeTokenizer(Operator):
    """``fit`` learns ``num_merges`` merge rules; ``transform`` appends a
    token-array column; the learned table is ``merge_table()``. A real
    :class:`Operator`, so it composes and persists through Pipeline
    save/load/export like the other fitted transforms."""

    def __init__(self, text_col: str = "text", out_col: str = "tokens",
                 num_merges: int = 16, min_pair_count: int = 2):
        if num_merges < 1:
            raise ValueError("num_merges must be >= 1")
        if min_pair_count < 1:
            raise ValueError("min_pair_count must be >= 1")
        self.text_col = text_col
        self.out_col = out_col
        self.num_merges = int(num_merges)
        self.min_pair_count = int(min_pair_count)
        self.merges = None  # list of (left, right, pair_count)

    # -- fit -------------------------------------------------------------
    def _word_vocab(self, df: DataFrame) -> DataFrame:
        words = (df.select(F.explode(TX.tokens(F.col(self.text_col)))
                           .alias("_w"))
                 .groupBy("_w").agg(F.count(F.lit(1)).alias("_freq")))
        return words.select(
            "_w", "_freq",
            F.concat(F.expr("split(_w, '')").cast("array<string>"),
                     F.array(F.lit(_EOW))).alias("_sym"))

    def fit(self, df: DataFrame) -> "BpeTokenizer":
        vocab = self._word_vocab(df).localCheckpoint(eager=False)
        self.merges = []
        for _ in range(self.num_merges):
            pairs = (vocab.select(
                "_freq",
                F.explode(F.expr(
                    "transform(slice(_sym, 1, size(_sym) - 1), "
                    "(s, i) -> struct(s AS l, _sym[i + 1] AS r))"))
                .alias("_p"))
                .groupBy(F.col("_p.l").alias("l"), F.col("_p.r").alias("r"))
                .agg(F.sum("_freq").alias("c")))
            top = (pairs.orderBy(F.col("c").desc(), F.col("l").asc(),
                                 F.col("r").asc())
                   .limit(1).collect())
            if not top or top[0]["c"] < self.min_pair_count:
                break
            left, right, cnt = top[0]["l"], top[0]["r"], int(top[0]["c"])
            self.merges.append((left, right, cnt))
            # pin per round: the fold would otherwise nest round-deep and
            # re-execute every prior fold under each round's count job
            vocab = vocab.withColumn(
                "_sym", _merge_expr(F.col("_sym"), left, right)) \
                .localCheckpoint(eager=False)
        return self

    # -- views -----------------------------------------------------------
    def merge_table(self, spark: SparkSession) -> DataFrame:
        """(rank, left, right, merged, pair_count) — the trained
        artifact, rank = learning order (1-based)."""
        if self.merges is None:
            raise ValueError("fit() before merge_table()")
        rows = [(i + 1, l, r, l + r, c)
                for i, (l, r, c) in enumerate(self.merges)]
        return spark.createDataFrame(
            rows, "rank long, left string, right string, "
                  "merged string, pair_count long")

    def transform(self, df: DataFrame) -> DataFrame:
        """Append ``out_col``: the text's BPE tokens (merges applied in
        learned order within each whitespace word + ``</w>``)."""
        if self.merges is None:
            raise ValueError("fit() before transform()")

        def word_tokens(w):
            sym = F.concat(F.split(w, "").cast("array<string>"),
                           F.array(F.lit(_EOW)))
            for left, right, _ in self.merges:
                sym = _merge_expr(sym, left, right)
            return sym

        return df.withColumn(
            self.out_col,
            F.flatten(F.transform(TX.tokens(F.col(self.text_col)),
                                  word_tokens)))

    # -- persistence (Pipeline save/load protocol) --------------------------
    def save_artifacts(self, path: str, spark: "SparkSession | None" = None) -> None:
        if self.merges is None:
            raise ValueError("fit() before save_artifacts()")
        if spark is None:
            from pyspark.sql import SparkSession as _S
            spark = _S.getActiveSession()
        self.merge_table(spark).coalesce(1).write.mode("overwrite") \
            .parquet(f"{path}/merges.parquet")

    def load_artifacts(self, path: str, spark: "SparkSession | None" = None) -> None:
        if spark is None:
            raise ValueError("load_artifacts requires a SparkSession")
        rows = (spark.read.parquet(f"{path}/merges.parquet")
                .orderBy("rank").collect())
        self.merges = [(r["left"], r["right"], int(r["pair_count"]))
                       for r in rows]
