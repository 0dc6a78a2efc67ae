"""SimHash near-duplicate detection (Charikar's random-hyperplane sketch for
token multisets).

Each document gets a W-bit signature: bit j is the sign of
Σ_tokens (±1 depending on bit j of the token's hash). Documents whose
signatures are within ``max_hamming`` bits are near-duplicates.

Scale design: the signature is ONE aggregation over exploded tokens —
``groupBy(doc).agg(W conditional sums)`` — shuffling (doc_id, W small ints).
Pairing at 100 TB uses the pigeonhole trick: split the W bits into
``max_hamming + 1`` chunks; any pair within distance ``max_hamming`` must
agree exactly on ≥1 chunk, so equi-joining on each chunk (a narrow int key)
finds all candidates without an N² comparison. Verification is
``bit_count(xor)`` on two ints.

W = 32 keeps every value exact int64 in both Spark and the SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from systems_spark.functions.hashing import hash64, hash64_sql
from systems_spark.functions.text import tokens, tokens_sql
from systems_spark.operators.base import Operator

WIDTH = 32


class SimHashDedup(Operator):
    def __init__(self, content_col: str = "text", id_col: str = "doc_id",
                 max_hamming: int = 3, n_chunks: int = None,
                 max_bucket_size: int = None):
        """``max_bucket_size``: optional skew cap — chunk-value buckets with
        more members are skipped (a chunk value shared by a huge fraction
        of the corpus is a degenerate discriminator, e.g. the all-zeros
        chunk of short docs). Trades bounded recall loss for bounded
        worst-case work at 100 TB; None (default) = exact."""
        self.content_col = content_col
        self.id_col = id_col
        self.max_hamming = int(max_hamming)
        # pigeonhole: need > max_hamming chunks to guarantee one exact match
        self.n_chunks = n_chunks or (self.max_hamming + 1)
        if WIDTH % self.n_chunks:
            raise ValueError(f"n_chunks must divide {WIDTH}")
        self.max_bucket_size = max_bucket_size
        self.requires = (content_col, id_col)

    # -- signatures --------------------------------------------------------
    def signatures(self, df: DataFrame) -> DataFrame:
        """(id_col, simhash) — simhash < 2^32, 0 for empty docs.

        Computed as a PER-ROW array fold — token hashes feed 32 counters via
        ``aggregate(zip_with(...))`` — so the signature build needs no
        explode and NO shuffle at all (the groupBy formulation shuffles
        (doc, 32 ints); this shuffles nothing). Semantics identical to the
        per-bit ±1 sums: bit_j = 1 iff Σ±1 > 0 iff 2·ones_j > n_tokens.
        The SQL oracle keeps the explode/groupBy formulation — same values.
        """
        from systems_spark.functions.fence import fence_columns

        # _toks and _ones fenced (functions/fence.py): _toks feeds a
        # per-element hash lambda, and _ones is read by 32 bit extractors —
        # without the fence ProjectCollapsing re-evaluates the tokenization
        # per hash and the whole counter fold per bit
        toks = fence_columns(
            df.select(self.id_col, self.content_col),
            _toks=F.coalesce(tokens(F.col(self.content_col)),
                             F.array().cast("array<string>")),
        )
        hashes = F.transform(F.col("_toks"), lambda t: hash64(t))
        zeros = F.array_repeat(F.lit(0), WIDTH)
        counters = F.aggregate(
            hashes,
            zeros,
            lambda acc, h: F.array(*[
                F.element_at(acc, j + 1)
                + F.shiftright(h, j).bitwiseAND(1).cast("int")
                for j in range(WIDTH)
            ]),
        )
        staged = fence_columns(
            toks.select(self.id_col, F.size("_toks").alias("_n"), "_toks"),
            _ones=counters,
        ).drop("_toks")
        sig = sum(
            F.when(
                F.element_at(F.col("_ones"), j + 1) * 2 > F.col("_n"),
                F.lit(1 << j).cast("long"),
            ).otherwise(F.lit(0).cast("long"))
            for j in range(WIDTH)
        )
        return staged.select(self.id_col, sig.cast("long").alias("simhash"))

    def signatures_oracle_sql(self, table: str = "documents") -> str:
        toks = tokens_sql(self.content_col)
        bit_sums = ", ".join(
            f"sum(CASE WHEN _h IS NULL THEN 0 WHEN ((_h >> {j}) & 1) = 1 THEN 1 ELSE -1 END) AS s{j}"
            for j in range(WIDTH)
        )
        sig = " + ".join(
            f"CASE WHEN s{j} > 0 THEN {1 << j} ELSE 0 END" for j in range(WIDTH)
        )
        return f"""
WITH tok AS (
  SELECT {self.id_col}, unnest({toks}) AS _t FROM {table}
), h AS (
  SELECT {self.id_col}, {hash64_sql('_t')} AS _h FROM tok
), allids AS (SELECT {self.id_col} FROM {table}),
agg AS (
  SELECT a.{self.id_col}, {bit_sums}
  FROM allids a LEFT JOIN h USING ({self.id_col})
  GROUP BY a.{self.id_col}
)
SELECT {self.id_col}, ({sig})::BIGINT AS simhash FROM agg
"""

    # -- pairing -----------------------------------------------------------
    def transform(self, df: DataFrame) -> DataFrame:
        """(a, b, hamming) pairs with hamming ≤ max_hamming, a < b.

        Token-less docs (null/empty text) are excluded — their all-zero
        signatures would otherwise pair with each other at hamming 0."""
        nonempty = df.where(
            F.size(tokens(F.col(self.content_col))) > 0
        ).select(self.id_col)
        sigs = self.signatures(df).join(nonempty, self.id_col)
        chunk_bits = WIDTH // self.n_chunks
        mask = (1 << chunk_bits) - 1

        with_chunks = sigs.select(
            self.id_col, "simhash",
            *[
                F.shiftright(F.col("simhash"), c * chunk_bits)
                 .bitwiseAND(mask).alias(f"c{c}")
                for c in range(self.n_chunks)
            ],
        )
        # Per-chunk equi-join finds candidates; the hamming predicate is
        # applied BEFORE the union/dedup, so the dropDuplicates shuffle
        # only carries true near-dups (measured at sf0.1: 129k pairs vs
        # 2.7M candidates — 21× less dedup traffic). A grouped
        # collect_list formulation was measured too: slower here AND it
        # materializes whole buckets as single array rows (the hottest
        # chunk value held 748 members = 280k pair structs in ONE row),
        # which is an OOM/skew hazard at scale; the join spreads the same
        # quadratic work across tasks.
        pairs = None
        for c in range(self.n_chunks):
            left, right = with_chunks.alias("L"), with_chunks.alias("R")
            if self.max_bucket_size is not None:
                # skew cap: drop degenerate chunk values (shared by more
                # than max_bucket_size docs) from BOTH sides of this
                # chunk's join — bounded recall loss, bounded work
                ok = (
                    with_chunks.groupBy(f"c{c}").count()
                    .where(F.col("count") <= int(self.max_bucket_size))
                    .select(f"c{c}")
                )
                left = left.join(F.broadcast(ok), f"c{c}").alias("L")
                right = right.join(F.broadcast(ok), f"c{c}").alias("R")
            p = left.join(
                right,
                on=[
                    F.col(f"L.c{c}") == F.col(f"R.c{c}"),
                    F.col(f"L.{self.id_col}") < F.col(f"R.{self.id_col}"),
                ],
            ).select(
                F.col(f"L.{self.id_col}").alias("a"),
                F.col(f"R.{self.id_col}").alias("b"),
                F.bit_count(
                    F.col("L.simhash").bitwiseXOR(F.col("R.simhash"))
                ).cast("long").alias("hamming"),
            ).where(F.col("hamming") <= self.max_hamming)
            pairs = p if pairs is None else pairs.unionByName(p)
        return pairs.dropDuplicates(["a", "b"])

    def pairs_oracle_sql(self, table: str = "documents") -> str:
        sigs = self.signatures_oracle_sql(table)
        toks_filter = tokens_sql(self.content_col)
        chunk_bits = WIDTH // self.n_chunks
        mask = (1 << chunk_bits) - 1
        chunk_match = " OR ".join(
            f"((L.simhash >> {c * chunk_bits}) & {mask}) = ((R.simhash >> {c * chunk_bits}) & {mask})"
            for c in range(self.n_chunks)
        )
        return f"""
WITH sigs0 AS ({sigs}),
sigs AS (
  SELECT * FROM sigs0
  WHERE {self.id_col} IN (SELECT {self.id_col} FROM {table} WHERE len({toks_filter}) > 0)
)
SELECT L.{self.id_col} AS a, R.{self.id_col} AS b,
       bit_count(xor(L.simhash, R.simhash))::BIGINT AS hamming
FROM sigs L JOIN sigs R
  ON L.{self.id_col} < R.{self.id_col} AND ({chunk_match})
WHERE bit_count(xor(L.simhash, R.simhash)) <= {self.max_hamming}
"""

    def get_params(self):
        return {"content_col": self.content_col, "id_col": self.id_col,
                "max_hamming": self.max_hamming, "n_chunks": self.n_chunks,
                "max_bucket_size": self.max_bucket_size}
