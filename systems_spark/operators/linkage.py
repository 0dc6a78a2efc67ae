"""Fellegi–Sunter probabilistic record linkage (JASA 1969).

The entity-resolution stage between blocking and clustering: given
CANDIDATE pairs (from any blocking family — sorted-neighborhood,
LSH, exact keys), score each pair by per-field agreement evidence and
classify match / possible / non-match. The classical theory assigns
each field an agreement weight log2(m/u) and a disagreement weight
log2((1−m)/(1−u)) (m = P(agree | match), u = P(agree | non-match));
the pair score is the sum over fields, compared to an upper and lower
threshold.

Determinism contract: weights arrive as INTEGER MICROS, fixed at plan
time (train them offline, or hand-set from m/u estimates — the log2
arithmetic happens in Python once, not per row), and every field
comparator is an integer/string expression available in both engines —
so the whole scorer replays bit-for-bit in SQL, trained-model lanes
style (the quality_classifier precedent). A missing value on either
side contributes ZERO weight (the standard "no evidence" treatment),
which the CASE order encodes identically in both engines.

Comparators (field spec = (name, comparator, agree_w, disagree_w)):
- ``("exact",)``            — equality on the column;
- ``("prefix", k)``         — equality of the first k characters;
- ``("abs_band", band)``    — |a − b| ≤ band on an integer column
  (quantize floats to cents/micros FIRST; float equality is not a
  cross-engine concept);
- ``("lev_band", d)``       — Levenshtein distance ≤ d (both engines
  ship the same integer edit-distance builtin) — the fuzzy-string
  comparator real name/address linkage runs on.

100 TB shape: two hash joins of the pair list against the record
table (id-keyed, the same scale as the pair list itself) and one
row-local projection — no shuffle beyond the joins; the blocking
family upstream owns candidate-volume control.

The reference has no linkage surface; engine-side capability for the
training-data pipeline (SURVEY.md §7.2 M7), sibling of the dedup
family (its pairs feed ``connected_components`` the same way).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_CMP = ("exact", "prefix", "abs_band", "lev_band")


def _check_fields(fields) -> None:
    if not fields:
        raise ValueError("fields must not be empty")
    for f in fields:
        if len(f) != 4:
            raise ValueError(
                "field spec = (column, comparator, agree_w, disagree_w)")
        _, cmp_, _, _ = f
        if cmp_[0] not in _CMP:
            raise ValueError(f"unknown comparator {cmp_[0]!r}")


def _agree_col(col: str, cmp_):
    """Spark TRUE/FALSE/NULL agreement over <col>_a/<col>_b; NULL =
    either side missing."""
    a, b = F.col(f"{col}_a"), F.col(f"{col}_b")
    kind = cmp_[0]
    if kind == "exact":
        return a == b
    if kind == "prefix":
        k = int(cmp_[1])
        return (F.substring(a.cast("string"), 1, k)
                == F.substring(b.cast("string"), 1, k))
    if kind == "lev_band":
        return F.levenshtein(a.cast("string"),
                             b.cast("string")) <= int(cmp_[1])
    return F.abs(a - b) <= int(cmp_[1])


def _agree_sql(col: str, cmp_) -> str:
    """DuckDB twin of :func:`_agree_col` over a2./b2. — no Spark
    objects, so the SQL builder works without an active session."""
    kind = cmp_[0]
    if kind == "exact":
        return f"(a2.{col} = b2.{col})"
    if kind == "prefix":
        k = int(cmp_[1])
        return (f"(substr(a2.{col}::VARCHAR, 1, {k})"
                f" = substr(b2.{col}::VARCHAR, 1, {k}))")
    if kind == "lev_band":
        return (f"(levenshtein(a2.{col}::VARCHAR, b2.{col}::VARCHAR)"
                f" <= {int(cmp_[1])})")
    return f"(abs(a2.{col} - b2.{col}) <= {int(cmp_[1])})"


def fellegi_sunter_scores(records: DataFrame, pairs: DataFrame,
                          id_col: str, fields,
                          a_col: str = "a", b_col: str = "b",
                          upper_micros: "int | None" = None,
                          lower_micros: "int | None" = None) -> DataFrame:
    """(a, b, <col>_agree …, score_micros[, decision]): each candidate
    pair scored by summed field-agreement weights. ``fields`` is a list
    of (column, comparator, agree_w_micros, disagree_w_micros);
    ``<col>_agree`` is 1/0/NULL (NULL = missing on either side, zero
    weight). With both thresholds set, ``decision`` is 'match' (score ≥
    upper), 'non-match' (score < lower), else 'possible'."""
    _check_fields(fields)
    cols = [f[0] for f in fields]
    recs = records.select(id_col, *cols)
    side_a = recs.select(
        F.col(id_col).alias(a_col),
        *[F.col(c).alias(f"{c}_a") for c in cols])
    side_b = recs.select(
        F.col(id_col).alias(b_col),
        *[F.col(c).alias(f"{c}_b") for c in cols])
    out = (pairs.select(a_col, b_col)
           .join(side_a, on=a_col)
           .join(side_b, on=b_col))
    score = F.lit(0).cast("long")
    keep = [a_col, b_col]
    for col, cmp_, aw, dw in fields:
        agree = _agree_col(col, cmp_)
        flag = F.when(agree.isNull(), F.lit(None).cast("long")) \
            .when(agree, F.lit(1).cast("long")) \
            .otherwise(F.lit(0).cast("long"))
        out = out.withColumn(f"{col}_agree", flag)
        keep.append(f"{col}_agree")
        score = score + F.coalesce(
            F.when(F.col(f"{col}_agree") == 1,
                   F.lit(int(aw)).cast("long"))
            .when(F.col(f"{col}_agree") == 0,
                  F.lit(int(dw)).cast("long")),
            F.lit(0).cast("long"))
    out = out.withColumn("score_micros", score)
    keep.append("score_micros")
    if upper_micros is not None and lower_micros is not None:
        out = out.withColumn(
            "decision",
            F.when(F.col("score_micros") >= int(upper_micros), "match")
            .when(F.col("score_micros") < int(lower_micros), "non-match")
            .otherwise("possible"))
        keep.append("decision")
    return out.select(*keep)


def fellegi_sunter_sql(records_sql: str, pairs_sql: str, id_col: str,
                       fields, a_col: str = "a", b_col: str = "b",
                       upper_micros: "int | None" = None,
                       lower_micros: "int | None" = None) -> str:
    """DuckDB twin of :func:`fellegi_sunter_scores` — same CASE order,
    same integer weights. ``pairs_sql`` yields (a, b); ``records_sql``
    yields the record table."""
    _check_fields(fields)
    flags, weights = [], []
    for col, cmp_, aw, dw in fields:
        sql_agree = _agree_sql(col, cmp_)
        flags.append(
            f"(CASE WHEN {sql_agree} IS NULL THEN NULL "
            f"WHEN {sql_agree} THEN 1 ELSE 0 END)::BIGINT"
            f" AS {col}_agree")
        weights.append(
            f"coalesce(CASE WHEN {sql_agree} IS NULL THEN NULL "
            f"WHEN {sql_agree} THEN {int(aw)}::BIGINT "
            f"ELSE {int(dw)}::BIGINT END, 0)")
    decision = ""
    if upper_micros is not None and lower_micros is not None:
        decision = (
            f", CASE WHEN ({' + '.join(weights)}) >= {int(upper_micros)} "
            f"THEN 'match' WHEN ({' + '.join(weights)}) < "
            f"{int(lower_micros)} THEN 'non-match' "
            f"ELSE 'possible' END AS decision")
    return f"""
WITH recs AS ({records_sql}),
prs AS (SELECT {a_col} AS a, {b_col} AS b FROM ({pairs_sql}))
SELECT p.a, p.b,
       {", ".join(flags)},
       ({" + ".join(weights)})::BIGINT AS score_micros{decision}
FROM prs p
JOIN recs a2 ON a2.{id_col} = p.a
JOIN recs b2 ON b2.{id_col} = p.b
"""
