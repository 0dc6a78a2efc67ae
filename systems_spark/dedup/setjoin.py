"""Prefix-filtered exact set-similarity join — the ninth dedup member.

Chaudhuri, Ganti & Kaushik, "A primitive operator for similarity
joins" (ICDE 2006); Xiao, Wang, Lin & Yu, "Efficient similarity joins
for near duplicate detection" (WWW 2008, PPJoin). The EXACT-THRESHOLD
alternative to the LSH families: every pair with token-set Jaccard ≥ t
is returned, none missed — no recall trade, no probability knob — yet
the candidate join touches only a small PREFIX of each document.

The filter: order every document's distinct tokens by one GLOBAL
ordering (ascending corpus frequency, ties by token); if
J(A, B) ≥ t then |A∩B| ≥ ⌈t·|A|⌉, so A and B MUST share at least one
token among each one's first p = n − ⌈t·n⌉ + 1 tokens in that shared
order — a pair sharing no prefix token cannot reach the threshold.
Candidates therefore come from an equi-join on PREFIX tokens only, and
because the global order is ascending-frequency, prefixes are made of
each document's RAREST tokens — the skew defense is built into the
algorithm (the hottest tokens sort last and rarely enter prefixes),
where the LSH families need explicit hot-bucket caps. The standard
PPJoin length filter (t·|A| ≤ |B| ≤ |A|/t) prunes candidates whose
sizes alone forbid the threshold.

Exactness discipline: the threshold is quantized to micros and every
comparison is integer (⌈t·n⌉ = (n·t_µ + 999999) div 10⁶;
J ≥ t ⟺ inter·10⁶ ≥ t_µ·(n_a + n_b − inter)); the reported jaccard is
one double division of exact ints rounded to 6, identical in both
engines.

100 TB shape: token rows are (doc, token-hash-sized) pairs; the
frequency table and per-doc rank ride one token-keyed and one
doc-keyed shuffle; the candidate join is an equi-join on rare tokens;
verification joins candidates back to token rows keeping the token in
the join key (never a per-pair |A|×|B| cross product — the
verify_pairs join-order lesson). The DuckDB oracle is the BRUTE-FORCE
all-pairs ground truth, so the lossless-filter contract itself is what
gets graded.

Honest worst case: prefix selectivity comes from RARE features. On a
Zipfian corpus (real text) prefixes are the long tail and candidates
stay near-linear; on a UNIFORM small-vocabulary corpus no feature is
rare, candidate volume grows with (docs per feature)², and the
prefix filter only helps by the prefix fraction. The POSITIONAL
filter (r7) recovers much of it there — it prunes by suffix budget,
which uniformity does not defeat (measured on the uniform driver
corpus: the sf0.01→0.1 step dropped from 5.5× to ~2.7× when it
landed; the remaining knob is ``shingle_k`` — larger k makes
features rarer and the prefix filter sharper). An exact-threshold
join cannot cap candidates without breaking its lossless contract —
when recall may be traded, that is what the LSH members are for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from systems_spark.pinning import pin

_M = 1_000_000


def _check_threshold(threshold: float) -> int:
    tm = int(round(threshold * _M))
    if not 0 < tm <= _M:
        raise ValueError("threshold must be in (0, 1]")
    return tm


def jaccard_join(docs: DataFrame, content_col: str = "text",
                 id_col: str = "doc_id", threshold: float = 0.4,
                 shingle_k: int = 1) -> DataFrame:
    """(a, b, inter, size_a, size_b, jaccard): every unordered pair
    (a < b) of documents whose DISTINCT-feature-set Jaccard is ≥
    ``threshold`` — exact, via prefix filtering. Features are tokens
    (``shingle_k=1``) or k-word shingles: pick shingles for corpora
    with small vocabularies — token SETS degenerate when every
    document draws from the same few words (measured on the driver
    corpus: 71% of ALL pairs pass t=0.5 on token sets, 256 pairs on
    3-shingles), and a quadratic TRUE-pair set is quadratic output no
    matter the algorithm."""
    from systems_spark.functions import text as TX
    from systems_spark.functions.fence import fence_columns

    tm = _check_threshold(threshold)
    if shingle_k < 1:
        raise ValueError("shingle_k must be >= 1")
    staged = fence_columns(docs.select(id_col, content_col),
                           _toks=TX.tokens(F.col(content_col)))
    feats = (F.col("_toks") if shingle_k == 1
             else TX.word_shingles_from_tokens(F.col("_toks"), shingle_k))
    # pinned: FOUR consumers (freq, ranked, and both verification
    # sides) — exchange reuse would dedupe only the shuffle write, not
    # the tokenize/shingle/explode/distinct work (the repo pinning
    # discipline, review r6)
    toks = pin(staged
               .select(F.col(id_col).alias("_doc"),
                       F.explode(feats).alias("tok"))
               .distinct(), corpus_scale=True)
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("_tf"))
    w = Window.partitionBy("_doc").orderBy(F.col("_tf").asc(),
                                           F.col("tok").asc())
    ranked = (toks.join(freq, on="tok")
              .withColumn("_rn", F.row_number().over(w))
              .withColumn("_n", F.count(F.lit(1)).over(
                  Window.partitionBy("_doc"))))
    # p = n - ceil(t*n) + 1, all integer; pinned for the two pair sides
    prefix = pin(ranked.where(
        F.col("_rn") <= F.col("_n")
        - F.expr(f"CAST((_n * {tm} + {_M - 1}) DIV {_M} AS INT)") + 1),
        corpus_scale=True)
    pa = prefix.select(F.col("_doc").alias("a"), "tok",
                       F.col("_n").alias("size_a"),
                       F.col("_rn").alias("_pa"))
    pb = prefix.select(F.col("_doc").alias("b"), "tok",
                       F.col("_n").alias("size_b"),
                       F.col("_rn").alias("_pb"))
    # PPJoin positional filter (Xiao et al. WWW 2008 §3.2, VERDICT r6
    # item 4): J ≥ t needs |A∩B| ≥ α = ⌈t·(|A|+|B|)/(1+t)⌉, and at the
    # pair's FIRST shared prefix token — global positions (i, j), which
    # coincide at one token because shared tokens sort identically in
    # both docs — the overlap can't exceed 1 + min(|A|−i, |B|−j):
    # nothing is shared before it, only the suffixes after it.
    # min(i)/min(j) over shared prefix tokens IS that first token, so
    # the bound below is exactly the first-token bound — lossless
    # (brute-force-equality tests grade it). It prunes where the prefix
    # filter alone can't: on uniform corpora every doc shares SOME
    # prefix token, but a match deep in both prefixes leaves too
    # little suffix to reach α.
    alpha = F.expr(
        f"CAST(((size_a + size_b) * {tm} + {_M + tm - 1}) "
        f"DIV {_M + tm} AS BIGINT)"
    )
    # size_a/size_b ride through the agg (functions of a and b) —
    # re-deriving them later would cost an extra agg + two joins; the
    # min-position agg replaces the old .distinct() (same shuffle)
    cand = (pa.join(pb, on="tok")
            .where(F.col("a") < F.col("b"))
            # PPJoin length filter: t*size_a <= size_b (a<b is id order,
            # not size order, so apply both directions)
            .where((F.col("size_b") * _M >= F.col("size_a") * tm)
                   & (F.col("size_a") * _M >= F.col("size_b") * tm))
            .groupBy("a", "b", "size_a", "size_b")
            .agg(F.min("_pa").alias("_i"), F.min("_pb").alias("_j"))
            .where(1 + F.least(F.col("size_a") - F.col("_i"),
                               F.col("size_b") - F.col("_j")) >= alpha)
            .select("a", "b", "size_a", "size_b"))
    # exact verification; token stays in the join key (no per-pair
    # cross product)
    ta = toks.select(F.col("_doc").alias("a"), "tok")
    tb = toks.select(F.col("_doc").alias("b"), "tok")
    inter = (cand.join(ta, on="a").join(tb, on=["b", "tok"])
             .groupBy("a", "b", "size_a", "size_b")
             .agg(F.count(F.lit(1)).alias("inter")))
    union = F.col("size_a") + F.col("size_b") - F.col("inter")
    return (inter.where(F.col("inter") * _M >= union * tm)
            .select("a", "b", "inter", "size_a", "size_b",
                    F.round(F.col("inter") / union, 6).alias("jaccard")))


def jaccard_join_sql(source_sql: str, content_expr: str, id_expr: str,
                     threshold: float = 0.4, shingle_k: int = 1) -> str:
    """DuckDB twin of :func:`jaccard_join` — deliberately the
    BRUTE-FORCE all-pairs ground truth (feature self-join, no prefix
    filter), so the parity check grades the filter's losslessness, not
    a replay of the same shortcut."""
    from systems_spark.functions import text as TX

    tm = _check_threshold(threshold)
    if shingle_k < 1:
        raise ValueError("shingle_k must be >= 1")
    toks = (TX.tokens_sql(content_expr) if shingle_k == 1
            else TX.word_shingles_sql(content_expr, shingle_k))
    return f"""
WITH tok AS (
  SELECT DISTINCT {id_expr} AS doc, unnest({toks}) AS tok
  FROM ({source_sql})
),
sizes AS (SELECT doc, count(*)::BIGINT AS sz FROM tok GROUP BY 1),
inter AS (
  SELECT x.doc AS a, y.doc AS b, count(*)::BIGINT AS inter
  FROM tok x JOIN tok y ON x.tok = y.tok AND x.doc < y.doc
  GROUP BY 1, 2
)
SELECT i.a, i.b, i.inter, sa.sz AS size_a, sb.sz AS size_b,
       round(i.inter::DOUBLE / (sa.sz + sb.sz - i.inter), 6) AS jaccard
FROM inter i
JOIN sizes sa ON sa.doc = i.a
JOIN sizes sb ON sb.doc = i.b
WHERE i.inter * {_M} >= (sa.sz + sb.sz - i.inter) * {tm}
"""
