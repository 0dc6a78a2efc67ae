"""Family-wide dedup-quality harness.

Every blocking/sketching dedup member (minhash, simhash,
sorted-neighborhood, winnowing, …) trades recall for bounded cost in a
different way; a production pipeline picks between them by MEASURING
each one against the same exact ground truth at matched thresholds.
This module is that measurement as one operator: score ANY set of
pair-producing families against one exact pair set, one report row per
family — pair counts, true positives, precision/recall in integer
micros (the ``dedup_eval`` exactness discipline: integer DIV, NULL on
an empty denominator, no floats until nothing is compared anymore).

Scale shape: each family's pair set is pinned once and touched twice
(its own count + one semi-join against the pinned truth); report rows
are one-row aggregates crossJoined together — nothing wider than a
COUNT ever shuffles. The exact-truth side is whatever the caller
supplies; on the bench corpus that is the documented all-pairs anchor
(a measurement lane, not the production path).

The reference's dedup surface stops at pair scoring — this harness is
engine-side capability for the 100 TB training-data pipeline
(SURVEY.md §7.2 M7), generalizing the single-family ``dedup_eval``
lane (VERDICT r6 item 5).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_M = 1_000_000


def _normalized(pairs: DataFrame, a_col: str, b_col: str) -> DataFrame:
    """Id-ordered distinct pair set: (a, b) with a < b — families emit
    pairs in their own orders (rank order, size order, id order); the
    comparison must not care."""
    return (pairs.select(
        F.least(F.col(a_col), F.col(b_col)).alias("a"),
        F.greatest(F.col(a_col), F.col(b_col)).alias("b"))
        .distinct())


def pair_quality_report(families: "dict[str, DataFrame]",
                        truth: DataFrame,
                        a_col: str = "a", b_col: str = "b",
                        truth_a_col: str = "a",
                        truth_b_col: str = "b") -> DataFrame:
    """One row per family, keyed by name: (family, n_pred, n_truth,
    n_hit, precision_micros, recall_micros). ``families`` maps a label
    to that family's candidate/verified pair frame; ``truth`` is the
    exact ground-truth pair set every family is scored against. All
    pair sets are normalized to id-ordered distinct pairs first, so
    emission order and duplicates never skew the counts."""
    if not families:
        raise ValueError("families must not be empty")
    t = _normalized(truth, truth_a_col, truth_b_col) \
        .localCheckpoint(eager=False)
    n_truth = t.agg(F.count(F.lit(1)).alias("n_truth"))
    reports = []
    for name in sorted(families):
        pred = _normalized(families[name], a_col, b_col) \
            .localCheckpoint(eager=False)
        hit = pred.join(t, on=["a", "b"], how="semi")
        reports.append(
            pred.agg(F.count(F.lit(1)).alias("n_pred"))
            .crossJoin(n_truth)
            .crossJoin(hit.agg(F.count(F.lit(1)).alias("n_hit")))
            .select(
                F.lit(name).alias("family"),
                "n_pred", "n_truth", "n_hit",
                F.expr(f"CAST(n_hit * {_M} DIV nullif(n_pred, 0) "
                       "AS BIGINT)").alias("precision_micros"),
                F.expr(f"CAST(n_hit * {_M} DIV nullif(n_truth, 0) "
                       "AS BIGINT)").alias("recall_micros")))
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out


def pair_quality_report_sql(family_sqls: "dict[str, tuple]",
                            truth_sql: str,
                            truth_a_col: str = "a",
                            truth_b_col: str = "b") -> str:
    """DuckDB twin of :func:`pair_quality_report`. ``family_sqls`` maps
    each label to ``(pairs_sql, a_col, b_col)`` — the family's existing
    oracle SQL plus its pair column names — so the report composes the
    already-graded per-family twins rather than restating any of them.

    Labels become SQL string literals, so they are restricted to a safe
    charset rather than escaped (ADVICE r7: a quote in a label would
    break/inject the generated SQL)."""
    if not family_sqls:
        raise ValueError("family_sqls must not be empty")
    for name in family_sqls:
        if not re.fullmatch(r"[A-Za-z0-9_.-]+", name):
            raise ValueError(
                f"family label must match [A-Za-z0-9_.-]+ (it is "
                f"interpolated into SQL literals): {name!r}")
    ctes = [
        "truth AS (SELECT DISTINCT least({a}, {b}) AS a, "
        "greatest({a}, {b}) AS b FROM ({q}))"
        .format(a=truth_a_col, b=truth_b_col, q=truth_sql)
    ]
    selects = []
    for i, name in enumerate(sorted(family_sqls)):
        q, a, b = family_sqls[name]
        ctes.append(
            f"f{i} AS (SELECT DISTINCT least({a}, {b}) AS a, "
            f"greatest({a}, {b}) AS b FROM ({q}))")
        ctes.append(
            f"c{i} AS (SELECT (SELECT count(*) FROM f{i}) AS n_pred, "
            f"(SELECT count(*) FROM truth) AS n_truth, "
            f"(SELECT count(*) FROM f{i} p SEMI JOIN truth t "
            f"ON t.a = p.a AND t.b = p.b) AS n_hit)")
        selects.append(
            f"SELECT '{name}' AS family, n_pred::BIGINT AS n_pred, "
            f"n_truth::BIGINT AS n_truth, n_hit::BIGINT AS n_hit, "
            f"(n_hit * {_M} // nullif(n_pred, 0))::BIGINT AS precision_micros, "
            f"(n_hit * {_M} // nullif(n_truth, 0))::BIGINT AS recall_micros "
            f"FROM c{i}")
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(selects)
