"""Multinomial Naive Bayes text classifier, trained and applied in-plan.

The fastText-style quality/domain classifier lane of an LLM curation
pipeline (GPT-3 §appendix A trained a quality classifier to filter
CommonCrawl; CCNet and most successors do the same): learn per-class token
statistics from a labeled seed set, score every corpus document, route by
predicted class. The reference has no corpus-classifier counterpart (its
model ops serve pre-trained TF/Torch/forest models — see
operators/predict.py); this operator covers the *train-on-the-corpus*
filtering stage those serving ops assume already happened.

Why Naive Bayes and not MLlib LogisticRegression: NB's sufficient
statistics are pure counting — two groupBys — so training is ONE
declarative Spark plan with no iterative driver loop, deterministic under
any partitioning, and exactly replicable in the SQL oracle. (LR's LBFGS
result depends on float reduction order; it could only be snapshot-pinned,
not independently verified.)

Determinism contract
--------------------
All log-probabilities are quantized to integer "micros"
(``round(ln(p) * scale)`` as BIGINT, ``scale=1e6``): document scores become
integer sums, which are exact and order-independent — a groupBy sum gives
the same bits under any shuffle/AQE/retry schedule, and DuckDB agrees
exactly. The only cross-engine surface is ``ln`` itself on identical double
inputs; Java's ``Math.log`` and DuckDB's ``ln`` differ in the last ulp on
~2% of inputs (measured), which is ~9 orders of magnitude below the micros
quantum — 0 flips across 80k measured realistic inputs. Ties in the final
argmax are integer-equality ties, broken toward the lexicographically
smallest class in both engines.

100 TB shape: fit is two map-side-combined count aggregations (shuffled
bytes ≈ #distinct (class, token) pairs, not corpus size). Apply is one
explode + broadcast weight join + one integer-sum groupBy(doc) with a
pivot on the (small, known) class set — one narrow shuffle of
(doc_id, class-score) rows. The weight table is vocab × classes; beyond
broadcast range (~100M entries) set ``broadcast=False`` and the join
becomes a shuffle join on token.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from systems_spark.functions import text as TX
from systems_spark.operators.base import Operator


class NaiveBayesTextClassifier(Operator):
    """``fit`` on (id, text, label); ``transform`` adds per-class integer
    scores and ``pred_label``.

    classes: the label set, fixed up front (keeps fit fully lazy). If
    None, fit collects the distinct labels (one tiny job, bounded by the
    class count).
    """

    def __init__(self, text_col: str = "text", label_col: str = "label",
                 id_col: str = "doc_id", classes: tuple = None,
                 scale: int = 1_000_000, broadcast: bool = True):
        self.text_col = text_col
        self.label_col = label_col
        self.id_col = id_col
        self.classes = tuple(classes) if classes is not None else None
        self.scale = int(scale)
        self.broadcast = bool(broadcast)
        self._weights = None      # (token, label, w) — w = micros ln P(tok|c)
        self._stats = None        # (label, prior, dflt) — micros
        self.requires = (text_col, id_col)

    # -- fit ---------------------------------------------------------------

    def fit(self, df: DataFrame) -> "NaiveBayesTextClassifier":
        if self.classes is None:
            self.classes = tuple(sorted(
                r[0] for r in df.select(self.label_col).distinct().collect()))
        lbl, txt = F.col(self.label_col), F.col(self.text_col)
        tok = df.select(lbl.alias("label"),
                        F.explode(TX.tokens(txt)).alias("token"))
        # every token-level statistic derives from ONE (label, token) count
        # aggregation, and the doc-level ones from ONE label count — two
        # column-pruned corpus scans total, everything downstream is tiny
        # r12 perf: pin the (label, token) count table — the one heavy
        # aggregation everything else derives from. Left lazy, each of its
        # ~5 references in a transform plan (weights, totals, vocab, stats
        # crossJoin, priors pivot) re-tokenized the training corpus —
        # quality_classifier's plan read the corpus parquet 15×
        # (plans/r12/quality_classifier_before.txt). Non-eager pin:
        # computed once per action, refit per call, nothing crosses runs.
        counts = (tok.groupBy("label", "token")
                  .agg(F.count(F.lit(1)).alias("cnt"))
                  .localCheckpoint(eager=False))
        totals = counts.groupBy("label").agg(F.sum("cnt").alias("tot"))
        vocab = counts.agg(F.countDistinct("token").alias("v"))
        ndocs = df.groupBy(lbl.alias("label")).agg(F.count(F.lit(1)).alias("nd"))
        alldocs = ndocs.agg(F.sum("nd").alias("n"))

        def micros(x):
            return F.round(F.log(x) * self.scale).cast("long")

        stats = (
            totals.join(ndocs, on="label")
            .crossJoin(F.broadcast(vocab)).crossJoin(F.broadcast(alldocs))
            .select(
                "label", "tot", "v",
                micros(F.col("nd") / F.col("n")).alias("prior"),
                micros(F.lit(1.0) / (F.col("tot") + F.col("v"))).alias("dflt"),
            )
            # one row per label; referenced by transform's crossJoin, the
            # priors pivot AND _weights — pin so the per-label doc count
            # scan behind it runs once, not once per reference
            .localCheckpoint(eager=False)
        )
        self._weights = counts.join(stats.select("label", "tot", "v"), on="label").select(
            "label", "token",
            micros((F.col("cnt") + 1) / (F.col("tot") + F.col("v"))).alias("w"),
        )
        self._stats = stats.select("label", "prior", "dflt")
        return self

    # -- transform ---------------------------------------------------------

    def _score_cols(self):
        return [f"score_{c}" for c in self.classes]

    def transform(self, df: DataFrame) -> DataFrame:
        if self._weights is None:
            raise ValueError("fit() before transform()")
        did = F.col(self.id_col)
        stats = F.broadcast(self._stats)
        weights = F.broadcast(self._weights) if self.broadcast else self._weights
        contrib = (
            df.select(did.alias("_nb_id"),
                      F.explode(TX.tokens(F.col(self.text_col))).alias("token"))
            .crossJoin(stats)
            .join(weights, on=["token", "label"], how="left")
            .select("_nb_id", "label", F.coalesce(F.col("w"), F.col("dflt")).alias("_w"))
        )
        scores = contrib.groupBy("_nb_id").pivot("label", list(self.classes)).sum("_w")
        priors = stats.groupBy().pivot("label", list(self.classes)).sum("prior")
        out = (
            df.join(scores, did == F.col("_nb_id"), "left").drop("_nb_id")
            .crossJoin(F.broadcast(priors.select(
                *[F.col(c).alias(f"_prior_{c}") for c in self.classes])))
        )
        # token-less docs score prior only (coalesce the missing pivot row)
        for c in self.classes:
            out = out.withColumn(
                f"score_{c}",
                F.coalesce(F.col(c), F.lit(0)) + F.col(f"_prior_{c}"))
        # argmax, ties to the lexicographically smallest class: iterate the
        # sorted class list with a STRICT > so the earlier class wins ties
        pred, best = F.lit(sorted(self.classes)[0]), F.col(f"score_{sorted(self.classes)[0]}")
        for c in sorted(self.classes)[1:]:
            s = F.col(f"score_{c}")
            pred = F.when(s > best, F.lit(c)).otherwise(pred)
            best = F.when(s > best, s).otherwise(best)
        return out.select(
            *[F.col(c) for c in df.columns],
            *[F.col(f"score_{c}") for c in self.classes],
            pred.alias("pred_label"),
        )

    # -- oracle ------------------------------------------------------------

    def oracle_sql(self, train_sql: str, apply_sql: str,
                   out_cols: str = None) -> str:
        """DuckDB twin: ``train_sql`` yields (id, text, label); ``apply_sql``
        yields (id, text, ...). Same tokenizer, micros quantization, pivot,
        and strict-> argmax fold as :meth:`transform`."""
        if self.classes is None:
            raise ValueError("classes must be fixed for the oracle")
        S = self.scale
        toks = TX.tokens_sql("text")
        cs = sorted(self.classes)
        pivot_scores = ", ".join(
            f"max(CASE WHEN label = '{c}' THEN sc END) AS raw_{c}" for c in cs)
        # strict-> fold, earlier (smaller) class wins ties — same as Spark
        pred = f"'{cs[0]}'"
        best = f"score_{cs[0]}"
        for c in cs[1:]:
            pred = f"CASE WHEN score_{c} > {best} THEN '{c}' ELSE {pred} END"
            best = f"greatest({best}, score_{c})"
        out_cols = out_cols or "id AS doc_id"
        score_exprs = ", ".join(
            f"coalesce(raw_{c}, 0) + (SELECT prior FROM stats WHERE label = '{c}') AS score_{c}"
            for c in cs)
        return f"""
WITH train AS ({train_sql}),
tok AS (SELECT label, unnest({toks}) AS token FROM train),
counts AS (SELECT label, token, count(*) AS cnt FROM tok GROUP BY 1, 2),
totals AS (SELECT label, count(*) AS tot FROM tok GROUP BY 1),
vocab AS (SELECT count(DISTINCT token) AS v FROM tok),
ndocs AS (SELECT label, count(*) AS nd FROM train GROUP BY 1),
alldocs AS (SELECT count(*) AS n FROM train),
stats AS (
  SELECT t.label, t.tot, vocab.v,
         round(ln(nd::DOUBLE / n::DOUBLE) * {S})::BIGINT AS prior,
         round(ln(1.0 / (t.tot + vocab.v)::DOUBLE) * {S})::BIGINT AS dflt
  FROM totals t JOIN ndocs USING (label), vocab, alldocs
),
weights AS (
  SELECT c.label, c.token,
         round(ln((c.cnt + 1)::DOUBLE / (s.tot + s.v)::DOUBLE) * {S})::BIGINT AS w
  FROM counts c JOIN stats s USING (label)
),
apply AS ({apply_sql}),
doc_tok AS (SELECT id, unnest({toks}) AS token FROM apply),
contrib AS (
  SELECT d.id, s.label, coalesce(w.w, s.dflt) AS _w
  FROM doc_tok d CROSS JOIN stats s
  LEFT JOIN weights w ON w.token = d.token AND w.label = s.label
),
persum AS (SELECT id, label, sum(_w) AS sc FROM contrib GROUP BY 1, 2),
pivoted AS (SELECT id, {pivot_scores} FROM persum GROUP BY id),
scored AS (
  SELECT a.id, {score_exprs}
  FROM apply a LEFT JOIN pivoted p ON p.id = a.id
)
SELECT {out_cols}, {", ".join(f"score_{c}" for c in cs)}, {pred} AS pred_label
FROM scored
"""

    def get_params(self):
        return {"text_col": self.text_col, "label_col": self.label_col,
                "id_col": self.id_col, "classes": self.classes,
                "scale": self.scale, "broadcast": self.broadcast}
