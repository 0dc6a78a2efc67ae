"""Prefix-filtered exact edit-distance similarity join — the tenth
dedup member.

Gravano et al., "Approximate string joins in a database (almost) for
free" (VLDB 2001); Xiao, Wang & Lin, "Ed-Join: an efficient algorithm
for similarity joins with edit distance constraints" (VLDB 2008). The
typo-level duplication mode none of the other nine members covers:
every unordered pair of strings within Levenshtein distance ``k`` —
exact, none missed — without the all-pairs O(n²) distance matrix.

The filter chain (each step lossless):

1. **Length filter** — ed(a, b) ≤ k forces ``|len(a) − len(b)| ≤ k``.
2. **q-gram count bound** — one edit operation destroys at most ``q``
   of a string's overlapping q-grams, so ed ≤ k implies the two gram
   MULTISETS share ≥ max(|A|, |B|) − q·k elements (Gravano et al.).
3. **Prefix filter** — order every string's gram occurrences by one
   GLOBAL ordering (ascending corpus frequency, ties by gram then
   position); by the standard prefix-filter theorem a pair meeting the
   bound in (2) must share a gram VALUE among each side's first
   ``q·k + 1`` occurrences. As in setjoin, ascending-frequency order
   is the built-in skew defense: a shared boilerplate prefix ("the
   Customer#00000 problem") makes those grams HOT, and hot grams sort
   OUT of prefixes — candidates come from each string's rarest grams.
   No position filter is applied on the candidate join: multiset
   intersection counts value matches regardless of alignment, and a
   positional constraint on the *prefix* occurrence could drop a true
   pair whose aligned copy of the gram lies outside the prefix.
4. **Exact verify** — ``levenshtein() ≤ k`` on the surviving
   candidates only (JVM-side in Spark, native in DuckDB — both are
   plain unit-cost Levenshtein, so the twin replays bit-for-bit).

Strings too short for the bound in (2) to bite — fewer than
``q·k + 1`` grams, i.e. ``len < q·(k + 1)`` — get no prefix guarantee
when BOTH sides are short (a long partner's own prefix still covers
the pair). Those go to a SHORT BUCKET: all-pairs within the short
strings under the length filter. Bounded by construction at any
corpus scale only if short strings are rare; with q = 2, k = 2 that
is strings under 6 characters — document-id/name columns clear it by
orders of magnitude, but the honest note stands: a corpus that is
mostly 3-character strings makes the short bucket quadratic, and no
lossless filter can help strings that tiny.

100 TB shape: gram rows are (doc, gram, pos) — strings themselves
never ride the gram shuffle; the frequency table and per-string rank
are one gram-keyed and one doc-keyed shuffle; the candidate join is
an equi-join on rare grams; verification joins candidate ids back to
the (id, string) table twice (broadcast when the string table is a
dim, shuffle-hash otherwise) and runs levenshtein on candidates only.
The DuckDB oracle is the BRUTE-FORCE all-pairs ground truth, so the
lossless-filter contract itself is what gets graded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _check(k: int, q: int) -> None:
    if k < 1:
        raise ValueError("k (max edit distance) must be >= 1")
    if q < 2:
        raise ValueError("q (gram length) must be >= 2")


def edit_join(docs: DataFrame, content_col: str = "text",
              id_col: str = "doc_id", k: int = 1, q: int = 2) -> DataFrame:
    """(a, b, dist, len_a, len_b): every unordered pair (a < b) of
    non-NULL strings with Levenshtein distance ≤ ``k`` — exact, via
    q-gram prefix filtering. ``q=2`` is the standard choice for short
    identifier/name strings; larger ``q`` sharpens prefixes on longer
    text (rarer grams) at the cost of a larger short bucket."""
    _check(k, q)
    p = q * k + 1  # prefix length, and the short-bucket gram threshold
    s = (docs.select(F.col(id_col).alias("_id"),
                     F.col(content_col).alias("_s"))
         .where(F.col("_s").isNotNull())
         .withColumn("_len", F.length("_s")))
    # positional q-grams; sequence() is invalid for start > stop, so
    # guard the sub-q case explicitly (those rows are short-bucket)
    grams = (s.where(F.col("_len") >= q)
             .select("_id", F.posexplode(F.expr(
                 f"transform(sequence(1, _len - {q} + 1),"
                 f" i -> substring(_s, i, {q}))")).alias("_p", "g")))
    # pinned: three consumers (frequency agg + ranked + verify would
    # re-run the gram explode otherwise — the repo pinning discipline)
    grams = grams.localCheckpoint(eager=False)
    freq = grams.groupBy("g").agg(F.count(F.lit(1)).alias("_gf"))
    w = Window.partitionBy("_id").orderBy(F.col("_gf").asc(),
                                          F.col("g").asc(),
                                          F.col("_p").asc())
    prefix = (grams.join(freq, on="g")
              .withColumn("_rn", F.row_number().over(w))
              .where(F.col("_rn") <= p)
              .select("_id", "g"))
    pa = prefix.select(F.col("_id").alias("a"), "g")
    pb = prefix.select(F.col("_id").alias("b"), "g")
    lens = s.select(F.col("_id").alias("_lid"), F.col("_len").alias("_l"))
    cand = (pa.join(pb, on="g")
            .where(F.col("a") < F.col("b"))
            .select("a", "b").distinct()
            .join(lens.withColumnRenamed("_lid", "a")
                      .withColumnRenamed("_l", "len_a"), on="a")
            .join(lens.withColumnRenamed("_lid", "b")
                      .withColumnRenamed("_l", "len_b"), on="b")
            .where(F.abs(F.col("len_a") - F.col("len_b")) <= k))
    # short bucket: strings with < p grams get no prefix guarantee
    # against each other — all-pairs within the bucket + length filter
    shorts = s.where(F.col("_len") - q + 1 < p)
    sa = shorts.select(F.col("_id").alias("a"), F.col("_len").alias("len_a"))
    sb = shorts.select(F.col("_id").alias("b"), F.col("_len").alias("len_b"))
    short_cand = (sa.crossJoin(sb)
                  .where((F.col("a") < F.col("b"))
                         & (F.abs(F.col("len_a") - F.col("len_b")) <= k)))
    strings = s.select(F.col("_id"), F.col("_s"))
    verified = (cand.unionByName(short_cand).distinct()
                .join(strings.withColumnRenamed("_id", "a")
                             .withColumnRenamed("_s", "_sa"), on="a")
                .join(strings.withColumnRenamed("_id", "b")
                             .withColumnRenamed("_s", "_sb"), on="b")
                # thresholded levenshtein = banded O(k·n) DP with
                # early exit; returns -1 beyond the threshold
                .withColumn("dist", F.levenshtein("_sa", "_sb", k))
                .where(F.col("dist") >= 0))
    return verified.select("a", "b",
                           F.col("dist").cast("long").alias("dist"),
                           F.col("len_a").cast("long").alias("len_a"),
                           F.col("len_b").cast("long").alias("len_b"))


def edit_join_sql(source_sql: str, content_expr: str, id_expr: str,
                  k: int = 1, q: int = 2) -> str:
    """DuckDB twin of :func:`edit_join` — deliberately the BRUTE-FORCE
    all-pairs ground truth (length filter only, then levenshtein on
    every surviving pair), so the parity check grades the prefix
    filter's losslessness, not a replay of the same shortcut. ``q``
    is accepted for signature symmetry; the brute force ignores it."""
    _check(k, q)
    return f"""
WITH s AS (
  SELECT {id_expr} AS id, {content_expr} AS str
  FROM ({source_sql})
  WHERE {content_expr} IS NOT NULL
)
SELECT a.id AS a, b.id AS b,
       levenshtein(a.str, b.str)::BIGINT AS dist,
       length(a.str)::BIGINT AS len_a, length(b.str)::BIGINT AS len_b
FROM s a JOIN s b
  ON a.id < b.id
 AND abs(length(a.str) - length(b.str)) <= {k}
WHERE levenshtein(a.str, b.str) <= {k}
"""
