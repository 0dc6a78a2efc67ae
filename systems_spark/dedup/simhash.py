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
    def signatures(self, df: DataFrame,
                   nonempty_only: bool = False) -> DataFrame:
        """(id_col, simhash) — simhash < 2^32, 0 for empty docs;
        ``nonempty_only`` drops token-less docs (the ``transform``
        pairing filter — pass True when persisting a standing signature
        table for ``incremental_pairs``).

        Explode tokens → ONE hash-aggregation with 32 conditional sums.
        Every expression stays inside whole-stage codegen (a per-row
        ``aggregate(...)`` array fold was tried first: higher-order
        functions evaluate interpreted and the fold rebuilt a 32-element
        array per token — ~4× slower at sf0.1 despite shuffling nothing).
        The aggregation map-side-combines, so the shuffle carries only
        (doc, 32 small ints) per doc — not tokens — and matches the SQL
        oracle's own explode/groupBy formulation. ``explode_outer`` keeps
        token-less docs as a NULL-hash row: their sums never fire, giving
        the same all-zeros signature with no extra join against the id set.
        Bit semantics: bit_j = 1 iff Σ±1 > 0 iff 2·ones_j > n_tokens.
        """
        out = self._signatures_n(df)
        if nonempty_only:
            out = out.where(F.col("_n") > 0)
        return out.select(self.id_col, "simhash")

    def _signatures_n(self, df: DataFrame) -> DataFrame:
        """(id_col, simhash, _n token count) — lets transform() filter
        token-less docs straight off the aggregation instead of paying a
        second tokenization pass + join."""
        tok = df.select(
            self.id_col,
            F.explode_outer(
                F.coalesce(tokens(F.col(self.content_col)),
                           F.array().cast("array<string>"))
            ).alias("_t"),
        )
        h = tok.select(self.id_col, hash64(F.col("_t")).alias("_h"))
        agg = h.groupBy(self.id_col).agg(
            F.count("_h").alias("_n"),  # non-null = true token count
            *[
                F.sum(
                    F.when(
                        F.col("_h").isNotNull(),
                        F.shiftright(F.col("_h"), j).bitwiseAND(1).cast("int"),
                    ).otherwise(F.lit(0))
                ).alias(f"_o{j}")
                for j in range(WIDTH)
            ],
        )
        sig = sum(
            F.when(
                F.col(f"_o{j}") * 2 > F.col("_n"), F.lit(1 << j).cast("long")
            ).otherwise(F.lit(0).cast("long"))
            for j in range(WIDTH)
        )
        return agg.select(self.id_col, sig.cast("long").alias("simhash"), "_n")

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
        signatures would otherwise pair with each other at hamming 0.

        Single-join shape: both sides posexplode their chunk values and
        equi-join once on the (chunk index, chunk value) composite key —
        one shuffle stage instead of one join per chunk, and the identical
        signature-aggregation subplans under L/R are a ReusedExchange
        (the per-chunk-join loop re-executed the signature build 2×chunks
        times; measured 4.0s → this shape at sf0.1). The hamming predicate
        is applied BEFORE the dedup, so the dropDuplicates shuffle only
        carries true near-dups (measured at sf0.1: 129k pairs vs 2.7M
        candidates — 21× less dedup traffic). A grouped collect_list
        formulation was measured too: slower AND it materializes whole
        buckets as single array rows (the hottest chunk value held 748
        members = 280k pair structs in ONE row) — an OOM/skew hazard at
        scale; the join spreads the same quadratic work across tasks."""
        chunk_bits = WIDTH // self.n_chunks
        mask = (1 << chunk_bits) - 1
        sigs = (
            self._signatures_n(df)
            .where(F.col("_n") > 0)
            .select(self.id_col, "simhash")
        )
        expl = sigs.select(
            self.id_col, "simhash",
            F.posexplode(F.array(*[
                F.shiftright(F.col("simhash"), c * chunk_bits).bitwiseAND(mask)
                for c in range(self.n_chunks)
            ])).alias("_ci", "_cv"),
        )
        if self.max_bucket_size is not None:
            # skew cap: drop degenerate chunk values (shared by more than
            # max_bucket_size docs) from both sides — a chunk value held
            # by a huge fraction of the corpus (e.g. the all-zeros chunk
            # of short docs) is a degenerate discriminator. Bounded recall
            # loss for bounded worst-case work at 100 TB; None = exact.
            ok = (
                expl.groupBy("_ci", "_cv").count()
                .where(F.col("count") <= int(self.max_bucket_size))
                .select("_ci", "_cv")
            )
            expl = expl.join(F.broadcast(ok), ["_ci", "_cv"])
        left, right = expl.alias("L"), expl.alias("R")
        pairs = left.join(
            right,
            on=[
                F.col("L._ci") == F.col("R._ci"),
                F.col("L._cv") == F.col("R._cv"),
                F.col(f"L.{self.id_col}") < F.col(f"R.{self.id_col}"),
            ],
        ).select(
            F.col(f"L.{self.id_col}").alias("a"),
            F.col(f"R.{self.id_col}").alias("b"),
            F.bit_count(
                F.col("L.simhash").bitwiseXOR(F.col("R.simhash"))
            ).cast("long").alias("hamming"),
        ).where(F.col("hamming") <= self.max_hamming)
        return pairs.dropDuplicates(["a", "b"])

    def incremental_pairs(self, corpus_sigs: DataFrame,
                          new_sigs: DataFrame,
                          check_disjoint: bool = True) -> DataFrame:
        """Near-dup pairs TOUCHING at least one NEW document — the
        corpus-growth shape (fourth member of the incremental family,
        after minhash/winnow/embedding): the standing corpus persists
        its SIGNATURE table (one int64 per doc — ``signatures()`` rows
        with token-less docs already excluded); an arriving batch signs
        only its documents and chunk-joins new×corpus + new×new buckets,
        never re-deriving a corpus×corpus pair. Ids must be disjoint
        (enforced; opt out with ``check_disjoint=False``); both inputs
        are (id, simhash) frames. Hot-chunk cap caveat: the DELTA's cap
        is computed over the UNION (matches a recompute at the new
        state), but standing pairs were capped at the OLD state — a
        bucket newly crossing the cap keeps corpus-side pairs a
        recompute would drop; incremental == scratch exactly only with
        the cap unset (see the MinHashDedup.incremental_pairs caveat).
        Returns (a, b, hamming) exactly like ``transform``."""
        if check_disjoint:
            from systems_spark.dedup.guards import ensure_disjoint_ids
            ensure_disjoint_ids(corpus_sigs, new_sigs, self.id_col,
                                "SimHashDedup.incremental_pairs")
        chunk_bits = WIDTH // self.n_chunks
        mask = (1 << chunk_bits) - 1
        both = (corpus_sigs.select(self.id_col, "simhash")
                .withColumn("_new", F.lit(False))
                .unionByName(new_sigs.select(self.id_col, "simhash")
                             .withColumn("_new", F.lit(True))))
        expl = both.select(
            self.id_col, "simhash", "_new",
            F.posexplode(F.array(*[
                F.shiftright(F.col("simhash"), c * chunk_bits).bitwiseAND(mask)
                for c in range(self.n_chunks)
            ])).alias("_ci", "_cv"),
        )
        if self.max_bucket_size is not None:
            ok = (
                expl.groupBy("_ci", "_cv").count()
                .where(F.col("count") <= int(self.max_bucket_size))
                .select("_ci", "_cv")
            )
            expl = expl.join(F.broadcast(ok), ["_ci", "_cv"])
        left = expl.where(F.col("_new")).alias("L")
        right = expl.alias("R")
        # orientation: L is always new; new×new joins once via id order,
        # new×corpus once via R not-new — then ids normalize (hamming is
        # symmetric)
        pairs = left.join(
            right,
            on=[
                F.col("L._ci") == F.col("R._ci"),
                F.col("L._cv") == F.col("R._cv"),
                F.col(f"L.{self.id_col}") != F.col(f"R.{self.id_col}"),
                (~F.col("R._new"))
                | (F.col(f"L.{self.id_col}") < F.col(f"R.{self.id_col}")),
            ],
        ).select(
            F.least(F.col(f"L.{self.id_col}"),
                    F.col(f"R.{self.id_col}")).alias("a"),
            F.greatest(F.col(f"L.{self.id_col}"),
                       F.col(f"R.{self.id_col}")).alias("b"),
            F.bit_count(
                F.col("L.simhash").bitwiseXOR(F.col("R.simhash"))
            ).cast("long").alias("hamming"),
        ).where(F.col("hamming") <= self.max_hamming)
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
