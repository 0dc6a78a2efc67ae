"""Vocabulary tokenizer: corpus-fit token→id encoding for model training.

The last hop of a text curation pipeline before tensors: build a frequency
vocabulary over the corpus, then encode every document as an
``array<int>`` of token ids (0 = OOV/unk, 1..V by descending frequency —
the standard word-level convention; BPE merral training is out of scope,
but the id-encoding plumbing is identical). Composes with
``SequencePacker`` (operators/packing.py), which lays encoded docs into
fixed-budget training sequences.

Reference context: the reference's serving graph assumes this happened
upstream (Categorify is its categorical twin for tabular columns —
merlin/systems/dag/ops/workflow.py runs NVTabular workflows that contain
it); this operator is the text-corpus counterpart, part of the repo's
LLM-data-pipeline surface.

Spark-first shape
-----------------
fit: ONE map-side-combined groupBy(token) count (shuffled bytes ≈ vocab
cardinality, not corpus size) + a global top-V TakeOrdered (no full sort).
transform, two strategies:

- ``strategy="join"`` (default, the 100 TB path): posexplode tokens,
  broadcast-join the vocab, regroup by doc with ``array_sort`` on
  (pos, id) structs — ONE narrow shuffle of (doc, pos, id) ints; document
  text never shuffles.
- ``strategy="map"``: collect the vocab into a literal map expression and
  encode with ``F.transform`` — ZERO shuffles (encode fuses into the
  scan), bounded by driver/plan size (~100k entries practical). The
  Categorify-style serve-time choice.

Both strategies produce identical output (pinned in tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from systems_spark.functions import text as TX
from systems_spark.operators.base import Operator



def _ntokens(toks):
    """NULL-text token count that matches the oracle's len() under BOTH
    ANSI settings: legacy size(NULL) is -1 (not NULL), which would leak a
    nonsense count into n_tokens where DuckDB emits NULL (review r5)."""
    return F.when(toks.isNotNull(), F.size(toks)).otherwise(F.lit(None))


class VocabTokenizer(Operator):
    def __init__(self, text_col: str = "text", id_col: str = "doc_id",
                 vocab_size: int = 1024, strategy: str = "join",
                 out_col: str = "input_ids"):
        if strategy not in ("join", "map"):
            raise ValueError(f"unknown strategy {strategy!r}")
        self.text_col = text_col
        self.id_col = id_col
        self.vocab_size = int(vocab_size)
        self.strategy = strategy
        self.out_col = out_col
        self._vocab = None  # (token, tok_id) — tok_id 1..V by (freq desc, token asc)
        self.requires = (text_col, id_col)

    def fit(self, df: DataFrame) -> "VocabTokenizer":
        from pyspark.sql.window import Window

        counts = (
            df.select(F.explode(TX.tokens(F.col(self.text_col))).alias("token"))
            .groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
        )
        # rank by (freq desc, token asc): deterministic ids; the window is
        # a single global partition but its input is ALREADY top-V-limited
        # via the orderBy+limit (TakeOrdered — no full sort, no wide window)
        top = counts.orderBy(F.col("cnt").desc(), F.col("token").asc()) \
                    .limit(self.vocab_size)
        w = Window.orderBy(F.col("cnt").desc(), F.col("token").asc())
        self._vocab = top.select(
            "token", F.row_number().over(w).cast("int").alias("tok_id"))
        return self

    def vocab(self) -> DataFrame:
        if self._vocab is None:
            raise ValueError("fit() before vocab()")
        return self._vocab

    def transform(self, df: DataFrame) -> DataFrame:
        if self._vocab is None:
            raise ValueError("fit() before transform()")
        did = F.col(self.id_col)
        toks = TX.tokens(F.col(self.text_col))
        if self.strategy == "map":
            entries = self._vocab.collect()  # bounded by vocab_size
            m = F.create_map(*[F.lit(x) for r in entries
                               for x in (r["token"], r["tok_id"])]) \
                if entries else F.create_map()
            # try_element_at: NULL (not ANSI error) on OOV keys
            ids = F.transform(toks, lambda t: F.coalesce(
                F.try_element_at(m, t), F.lit(0)).cast("int"))
            return df.select(*df.columns,
                             _ntokens(toks).alias("n_tokens"),
                             ids.alias(self.out_col))
        exploded = df.select(
            did.alias("_vt_id"),
            F.posexplode(toks).alias("_pos", "token"))
        encoded = (
            exploded.join(F.broadcast(self._vocab), on="token", how="left")
            .groupBy("_vt_id")
            .agg(F.transform(
                F.array_sort(F.collect_list(F.struct(
                    "_pos", F.coalesce(F.col("tok_id"), F.lit(0)).alias("_tid")))),
                lambda s: s["_tid"],
            ).alias(self.out_col))
        )
        out = df.join(encoded, did == F.col("_vt_id"), "left").drop("_vt_id")
        # token-less docs have no exploded rows → empty array, not null
        enc = F.coalesce(F.col(self.out_col), F.array().cast("array<int>"))
        # unique-id contract guard (ADVICE r4): a duplicated id_col merges
        # two docs' (pos, id) streams into one sorted array — corrupt
        # encodings, silently. Any merge makes the encoded length differ
        # from the row's own token count (the two-empty-docs case excepted,
        # where the merge is the empty array — harmless), so the check is
        # free: both sizes are already in the row. Raise loudly instead of
        # emitting garbage; the map strategy is per-row and immune.
        # size() of the COALESCED array, not coalesce(size(), 0): with
        # spark.sql.ansi.enabled=false, size(NULL) is -1 (not NULL), so
        # the latter yields -1 for NULL-text rows and the guard would
        # spuriously raise (review r5)
        n_row = F.size(F.coalesce(toks, F.array().cast("array<string>")))
        guarded = F.when(F.size(enc) == n_row, enc).otherwise(
            F.raise_error(F.concat(F.lit(
                f"VocabTokenizer(strategy='join'): duplicate {self.id_col}"
                " values merged token streams for id "),
                did.cast("string"))).cast("array<int>"))
        return out.select(
            *df.columns,
            _ntokens(toks).alias("n_tokens"),
            guarded.alias(self.out_col))

    def oracle_sql(self, fit_sql: str, apply_sql: str,
                   out_cols: str = "a.id AS doc_id") -> str:
        """DuckDB twin: ``fit_sql`` yields (text), ``apply_sql`` yields
        (id, text). Same tokenizer, ranking, OOV-0 convention and
        order-preserving reassembly as :meth:`transform`."""
        toks = TX.tokens_sql("text")
        return f"""
WITH fitdocs AS ({fit_sql}),
counts AS (
  SELECT token, count(*) AS cnt
  FROM (SELECT unnest({toks}) AS token FROM fitdocs) GROUP BY 1
),
vocab AS (
  SELECT token, row_number() OVER (ORDER BY cnt DESC, token ASC)::INT AS tok_id
  FROM counts ORDER BY cnt DESC, token ASC LIMIT {self.vocab_size}
),
apply AS ({apply_sql}),
doc_tok AS (
  SELECT id, u.pos AS pos, u.tok AS token
  FROM (
    SELECT id, unnest(list_transform(range(1, len(tk) + 1),
               i -> struct_pack(pos := i, tok := tk[i]))) AS u
    FROM (SELECT id, {toks} AS tk FROM apply)
  )
),
encoded AS (
  SELECT d.id,
         list(coalesce(v.tok_id, 0) ORDER BY d.pos ASC) AS input_ids
  FROM doc_tok d LEFT JOIN vocab v ON v.token = d.token
  GROUP BY d.id
)
SELECT {out_cols}, len({toks})::INT AS n_tokens,
       coalesce(e.input_ids, []) AS input_ids
FROM apply a LEFT JOIN encoded e ON e.id = a.id
"""

    def get_params(self):
        return {"text_col": self.text_col, "id_col": self.id_col,
                "vocab_size": self.vocab_size, "strategy": self.strategy,
                "out_col": self.out_col}
