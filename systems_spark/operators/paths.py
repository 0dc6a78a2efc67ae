"""Within-group path n-grams — "what do users DO, in order?".

`event_transitions` (the first-order Markov matrix) answers "given X,
what comes next?" one step at a time; this operator surfaces the
common multi-step PATHS themselves (view > click > purchase), bounded
to a grouping key such as (user, session) so a path can never span a
session boundary. The product-analytics "top paths" report, and the
n-gram extraction step of sequence-model training data (the SASRec
lane exports per-user windows; this one aggregates the corpus-wide
n-gram counts those windows are drawn from).

Shape: ONE window pass (lead(token, i) for i < n, partitioned by the
group key — the many-small-groups safe regime this repo uses for all
per-user windows) emits each consecutive n-gram, then one map-side-
combined count per distinct path. No self-joins, no collect_list
buffer — a bot user with 10^8 events costs window-sort time, never an
aggregation buffer. Counts are exact int64 and the path string is a
deterministic join of the tokens, so the lane is oracle-exact.

Null semantics: a window lead past the group's last row is NULL and
that n-gram is dropped (the trailing n-1 rows start no gram); rows
whose own token is NULL are dropped up front in BOTH engines (a NULL
step is a non-event, and concat-style functions disagree across
engines on NULL handling — filtering first removes the disagreement).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SEP = ">"


def path_ngrams(df: DataFrame, group_cols: list, order_cols: list,
                token_col: str, n: int = 3) -> DataFrame:
    """(path, n_paths): every consecutive ``n``-gram of ``token_col``
    within each group (ordered by ``order_cols``), counted corpus-wide.
    ``path`` is the tokens joined with '>'."""
    if n < 1:
        raise ValueError("n must be >= 1")
    if not group_cols or not order_cols:
        raise ValueError("group_cols and order_cols must be non-empty")
    w = Window.partitionBy(*group_cols).orderBy(
        *[F.col(c).asc() for c in order_cols])
    base = df.where(F.col(token_col).isNotNull())
    toks = [F.col(token_col)] + [
        F.lead(token_col, i).over(w) for i in range(1, n)]
    cond = toks[-1].isNotNull() if n > 1 else F.lit(True)
    grams = (base.select(F.concat_ws(_SEP, *toks).alias("path"),
                         cond.alias("_ok"))
             .where(F.col("_ok")))
    return (grams.groupBy("path")
            .agg(F.count(F.lit(1)).cast("long").alias("n_paths")))


def path_ngrams_sql(rows_sql: str, group_cols: list, order_cols: list,
                    token_col: str, n: int = 3) -> str:
    """DuckDB twin of :func:`path_ngrams` — same window leads, same
    NULL-drop rule, same separator."""
    if n < 1:
        raise ValueError("n must be >= 1")
    if not group_cols or not order_cols:
        raise ValueError("group_cols and order_cols must be non-empty")
    part = ", ".join(group_cols)
    order = ", ".join(f"{c} ASC" for c in order_cols)
    toks = [token_col] + [f"lead({token_col}, {i}) OVER w"
                          for i in range(1, n)]
    last_ok = f"{toks[-1]} IS NOT NULL" if n > 1 else "TRUE"
    concat = " || '{sep}' || ".format(sep=_SEP).join(toks)
    return f"""
WITH base AS (SELECT * FROM ({rows_sql}) WHERE {token_col} IS NOT NULL),
grams AS (
  SELECT {concat} AS path, {last_ok} AS ok
  FROM base
  WINDOW w AS (PARTITION BY {part} ORDER BY {order})
)
SELECT path, count(*)::BIGINT AS n_paths
FROM grams WHERE ok GROUP BY 1
"""
