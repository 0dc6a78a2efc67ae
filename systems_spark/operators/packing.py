"""SequencePacker — GPT-style token packing of a document corpus into
fixed-budget training sequences.

LLM pre-training consumes documents as a concatenated token stream chopped
into fixed-length sequences (budget = context length). The packing layout —
which sequence a document starts in, at what offset, and how many sequences
it spans — must be a DETERMINISTIC function of the corpus so that a re-run,
a task retry, or a different executor count produces the identical
curriculum. This operator computes that layout declaratively:

    shard        = pmod(hash64(salt || id), n_shards)  -- corpus striping
    (per shard, ordered by id)
    cum          = running sum of n_tokens
    seq_in_shard = (cum - n_tokens) div budget     -- chunk the doc starts in
    begin_offset = (cum - n_tokens) mod budget
    n_seqs       = chunks spanned (docs longer than the remaining room
                   spill into following sequences, concatenation-style)

100 TB shape: ONE hash-partitioned window (PARTITION BY shard ORDER BY id)
— no global ordering, no single-task stage. Parallelism equals ``n_shards``:
each shard is an independent token stream packed by one task, so size
n_shards to the cluster (tests use 8; a 1000-executor run would use 10k+,
giving ~10 GB of text per shard at 100 TB). Striping by portable hash64
keeps the layout engine-portable and retry-stable — Spark and the DuckDB
oracle agree bit-for-bit (functions/hashing.py). All arithmetic is integer
(``div``/``%`` on longs), never float division — exact in both engines.

(The reference packs features per inference request — Padding,
operators/padding.py; corpus-level sequence packing is part of the
LLM-data-pipeline extension surface.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from systems_spark.functions.hashing import hash64
from systems_spark.operators.base import Operator


class SequencePacker(Operator):
    """Assign every document a deterministic position in the packed token
    stream of its shard.

    ``token_col``: precomputed per-doc token count column (compute with
    functions/text.py token_count when the corpus doesn't carry one).
    Zero-token documents get a zero-width slot (n_seqs = 0) rather than
    being dropped — row-preserving by design.
    """

    def __init__(self, id_col: str, token_col: str, budget: int,
                 n_shards: int = 64, salt: str = "pack"):
        if budget <= 0:
            raise ValueError(f"budget must be positive, got {budget}")
        if n_shards <= 0:
            raise ValueError(f"n_shards must be positive, got {n_shards}")
        self.id_col = id_col
        self.token_col = token_col
        self.budget = int(budget)
        self.n_shards = int(n_shards)
        self.salt = salt
        self.requires = (id_col, token_col)

    def _shard(self) -> Column:
        h = hash64(F.concat(F.lit(self.salt), F.col(self.id_col).cast("string")))
        return F.pmod(h, F.lit(self.n_shards)).cast("int")

    def transform(self, df: DataFrame) -> DataFrame:
        b = self.budget
        ntok = F.col(self.token_col).cast("long")
        w = (
            Window.partitionBy("shard")
            .orderBy(F.col(self.id_col).asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return (
            df.withColumn("shard", self._shard())
            .withColumn("_cum", F.sum(ntok).over(w))
            .withColumn("_start", F.col("_cum") - ntok)
            # all-non-negative longs: div/% are exact and engine-portable
            .withColumn("seq_in_shard", F.expr(f"_start div {b}"))
            .withColumn("begin_offset", F.expr(f"_start % {b}"))
            .withColumn(
                "n_seqs",
                F.when(ntok <= 0, F.lit(0).cast("long")).otherwise(
                    F.expr(f"((_cum - 1) div {b}) - (_start div {b}) + 1")
                ),
            )
            .drop("_cum", "_start")
        )
