"""Document chunking: fixed token-budget windows with overlap.

The retrieval/long-context windowing hop of a corpus pipeline: split each
document into chunks of at most ``chunk_tokens`` whitespace tokens,
successive chunks offset by ``stride = chunk_tokens - overlap`` so
neighboring chunks share ``overlap`` tokens of context — the standard RAG
indexing layout, and the sliding-window variant of the disjoint packing
``SequencePacker`` does for pretraining. The reference has no chunking
counterpart (its serving ops consume already-prepared features); this is
part of the repo's LLM-data-pipeline surface.

Chunk count is a pure integer function of the doc's token count
``n``: ``0`` when ``n == 0``, else ``1 + ceil(max(n - chunk_tokens, 0) /
stride)`` — so the layout is deterministic, partition-invariant, and
exactly replicable in the SQL oracle (integer arithmetic only; chunk text
is the space-join of the window's tokens, i.e. whitespace-canonicalized).

100 TB shape: ZERO shuffles — tokenize, window arithmetic, and the
explode are all per-row JVM expressions that fuse into the scan stage.
The output is ~(1 + overlap/stride)× the input tokens; downstream ops pay
that amplification, not this one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from systems_spark.functions import text as TX
from systems_spark.operators.base import Operator


class DocumentChunker(Operator):
    """Explodes (id, text) into (id, chunk_id, token_start, n_tokens,
    chunk_text); zero-token documents yield zero chunks."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id",
                 chunk_tokens: int = 256, overlap: int = 0):
        if chunk_tokens < 1:
            raise ValueError("chunk_tokens must be >= 1")
        if not (0 <= overlap < chunk_tokens):
            raise ValueError("need 0 <= overlap < chunk_tokens (stride > 0)")
        self.text_col = text_col
        self.id_col = id_col
        self.chunk = int(chunk_tokens)
        self.stride = int(chunk_tokens - overlap)
        self.requires = (text_col, id_col)

    def transform(self, df: DataFrame) -> DataFrame:
        c, s = self.chunk, self.stride
        staged = df.select(F.col(self.id_col).alias("_ck_id"),
                           TX.tokens(F.col(self.text_col)).alias("_tk"))
        # k = chunk count; sequence() rejects an empty 0..-1 range, so the
        # k = 0 (empty doc) branch substitutes an empty array before explode
        expr = f"""
        CASE WHEN size(_tk) = 0 THEN array()
        ELSE transform(
          sequence(0, (1 + (greatest(size(_tk) - {c}, 0) + {s} - 1) div {s}) - 1),
          i -> struct(
            i AS chunk_id,
            i * {s} AS token_start,
            least({c}, size(_tk) - i * {s}) AS n_tokens,
            concat_ws(' ', slice(_tk, i * {s} + 1, {c})) AS chunk_text))
        END"""
        return (staged.select("_ck_id", F.explode(F.expr(expr)).alias("_c"))
                .select(F.col("_ck_id").alias(self.id_col),
                        F.col("_c.chunk_id").alias("chunk_id"),
                        F.col("_c.token_start").alias("token_start"),
                        F.col("_c.n_tokens").alias("n_tokens"),
                        F.col("_c.chunk_text").alias("chunk_text")))

    def oracle_sql(self, docs_sql: str) -> str:
        """DuckDB twin over ``docs_sql`` yielding (id, text); same integer
        layout and space-joined chunk text."""
        c, s = self.chunk, self.stride
        toks = TX.tokens_sql("text")
        return f"""
WITH docs AS ({docs_sql}),
tk AS (SELECT id, {toks} AS t FROM docs),
ch AS (
  SELECT id, unnest(list_transform(
    range(0, CASE WHEN len(t) = 0 THEN 0
           ELSE 1 + (greatest(len(t) - {c}, 0) + {s} - 1) // {s} END),
    i -> struct_pack(
      chunk_id := i,
      token_start := i * {s},
      n_tokens := least({c}, len(t) - i * {s}),
      chunk_text := array_to_string(t[i * {s} + 1 : i * {s} + {c}], ' ')))) AS ck
  FROM tk
)
SELECT id, ck.chunk_id AS chunk_id, ck.token_start AS token_start,
       ck.n_tokens AS n_tokens, ck.chunk_text AS chunk_text
FROM ch
"""
