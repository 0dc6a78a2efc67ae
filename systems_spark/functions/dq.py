"""Declarative data-quality constraint checking (the Deequ shape).

Schelter et al., "Automating large-scale data quality verification"
(VLDB 2018 — Amazon Deequ): quality constraints declared as data, a
report computed as a query. A 100 TB ingest pipeline gates every batch
on a constraint report; the operator's job is to compute ALL row-level
constraints in ONE scan of the table rather than one pass per check.

Check kinds:

- ``not_null(col)`` — violations = NULL rows.
- ``unique(col)`` / ``unique([cols])`` — violations = rows beyond the
  first of each key (total − distinct keys); NULL keys count as a key.
- ``in_set(col, values)`` — non-NULL values outside the accepted set.
- ``value_range(col, lo, hi)`` — non-NULL values outside [lo, hi]
  (either bound may be None for open-ended).
- ``prefix(col, p)`` — non-NULL strings not starting with ``p``
  (a literal prefix, not a regex — regex dialects differ between the
  JVM and RE2, a portability trap this surface deliberately avoids).
- ``ref_integrity(col, ref_col, ref_df=…, ref_sql=…)`` — non-NULL
  values with no match in the reference table (orphaned foreign keys).

Execution shape: every row-level check (not_null / in_set /
value_range / prefix) compiles to one conditional-sum expression in a
SINGLE aggregation over the table — one scan, map-side combined, then
a ``stack`` unpivot to one row per check. ``unique`` adds one
count-distinct aggregation per distinct key-tuple; ``ref_integrity``
adds one LEFT ANTI join per reference (broadcast when the dim is
small — Catalyst's call). The report is n_checks rows:
(check_name, total, violations, pass_rate_micros, passed).

``check_report_sql`` emits the DuckDB twin — identical check names and
integer arithmetic (pass_rate = (total − violations)·10⁶ div total),
so the report replays bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_M = 1_000_000


def not_null(col: str) -> dict:
    return {"kind": "not_null", "col": col,
            "name": f"not_null({col})"}


def unique(cols) -> dict:
    cols = [cols] if isinstance(cols, str) else list(cols)
    if not cols:
        raise ValueError("unique() needs at least one column")
    return {"kind": "unique", "cols": cols,
            "name": f"unique({','.join(cols)})"}


def in_set(col: str, values) -> dict:
    values = list(values)
    if not values:
        raise ValueError("in_set() needs at least one accepted value")
    if any(v is None for v in values):
        raise ValueError("in_set() values must be non-NULL; NULLs are "
                         "not counted as violations by design")
    return {"kind": "in_set", "col": col, "values": values,
            "name": f"in_set({col})"}


def value_range(col: str, lo=None, hi=None) -> dict:
    if lo is None and hi is None:
        raise ValueError("value_range() needs at least one bound")
    return {"kind": "value_range", "col": col, "lo": lo, "hi": hi,
            "name": f"value_range({col})"}


def prefix(col: str, p: str) -> dict:
    if not p:
        raise ValueError("prefix() needs a non-empty literal prefix")
    return {"kind": "prefix", "col": col, "prefix": p,
            "name": f"prefix({col})"}


def ref_integrity(col: str, ref_col: str, ref_df: DataFrame = None,
                  ref_sql: str = None) -> dict:
    return {"kind": "ref_integrity", "col": col, "ref_col": ref_col,
            "ref_df": ref_df, "ref_sql": ref_sql,
            "name": f"ref_integrity({col})"}


def _row_violation_expr(c: dict):
    col = F.col(c["col"])
    if c["kind"] == "not_null":
        bad = col.isNull()
    elif c["kind"] == "in_set":
        bad = col.isNotNull() & ~col.isin(c["values"])
    elif c["kind"] == "value_range":
        bad = F.lit(False)
        if c["lo"] is not None:
            bad = bad | (col < F.lit(c["lo"]))
        if c["hi"] is not None:
            bad = bad | (col > F.lit(c["hi"]))
        bad = col.isNotNull() & bad
    elif c["kind"] == "prefix":
        bad = col.isNotNull() & ~col.startswith(c["prefix"])
    else:
        raise ValueError(f"not a row-level check: {c['kind']}")
    return F.sum(F.when(bad, 1).otherwise(0)).cast("long")


def _finish(report: DataFrame) -> DataFrame:
    return report.select(
        "check_name", F.col("total").cast("long").alias("total"),
        F.col("violations").cast("long").alias("violations"),
        F.when(F.col("total") > 0,
               F.expr(f"((total - violations) * {_M}) DIV total"))
         .cast("long").alias("pass_rate_micros"),
        F.when(F.col("violations") == 0, F.lit(1)).otherwise(F.lit(0))
         .cast("long").alias("passed"))


def check_report(df: DataFrame, checks: list) -> DataFrame:
    """(check_name, total, violations, pass_rate_micros, passed):
    one row per declared check. Row-level checks share ONE scan."""
    if not checks:
        raise ValueError("no checks declared")
    names = [c["name"] for c in checks]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate check names: {names}")
    parts = []
    row_checks = [c for c in checks if c["kind"] in
                  ("not_null", "in_set", "value_range", "prefix")]
    if row_checks:
        aggs = [F.count(F.lit(1)).cast("long").alias("_total")]
        aggs += [_row_violation_expr(c).alias(f"_v{i}")
                 for i, c in enumerate(row_checks)]
        one = df.agg(*aggs)
        stack = ", ".join(
            f"'{c['name'].replace(chr(39), chr(39) * 2)}', _v{i}"
            for i, c in enumerate(row_checks))
        parts.append(one.selectExpr(
            "_total AS total",
            f"stack({len(row_checks)}, {stack}) AS (check_name, violations)")
            .select("check_name", "total", "violations"))
    for c in checks:
        if c["kind"] == "unique":
            # countDistinct over a STRUCT: the struct is non-NULL even
            # when its fields are NULL, so NULL keys count as a key
            # (the ROW() twin's semantics) — and distinct-agg is the
            # distributed two-phase form, never a driver-sized buffer
            parts.append(df.agg(
                F.count(F.lit(1)).cast("long").alias("total"),
                (F.count(F.lit(1)) - F.countDistinct(
                    F.struct(*c["cols"]))).cast("long")
                .alias("violations"))
                .select(F.lit(c["name"]).alias("check_name"),
                        "total", "violations"))
        elif c["kind"] == "ref_integrity":
            if c["ref_df"] is None:
                raise ValueError(f"{c['name']}: ref_df required")
            ref = c["ref_df"].select(
                F.col(c["ref_col"]).alias(c["col"])).distinct()
            orphans = (df.select(c["col"])
                       .where(F.col(c["col"]).isNotNull())
                       .join(ref, on=c["col"], how="left_anti"))
            parts.append(
                df.agg(F.count(F.lit(1)).cast("long").alias("total"))
                .crossJoin(orphans.agg(
                    F.count(F.lit(1)).cast("long").alias("violations")))
                .select(F.lit(c["name"]).alias("check_name"),
                        "total", "violations"))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return _finish(out)


def _sql_lit(v) -> str:
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    return repr(v)


def check_report_sql(source_sql: str, checks: list) -> str:
    """DuckDB twin of :func:`check_report`. ``ref_integrity`` checks
    use their ``ref_sql``; same names, same integer arithmetic."""
    if not checks:
        raise ValueError("no checks declared")
    selects = []
    for c in checks:
        name = _sql_lit(c["name"])
        if c["kind"] == "not_null":
            v = f"sum(CASE WHEN {c['col']} IS NULL THEN 1 ELSE 0 END)"
        elif c["kind"] == "in_set":
            vals = ", ".join(_sql_lit(x) for x in c["values"])
            v = (f"sum(CASE WHEN {c['col']} IS NOT NULL AND {c['col']} "
                 f"NOT IN ({vals}) THEN 1 ELSE 0 END)")
        elif c["kind"] == "value_range":
            conds = []
            if c["lo"] is not None:
                conds.append(f"{c['col']} < {_sql_lit(c['lo'])}")
            if c["hi"] is not None:
                conds.append(f"{c['col']} > {_sql_lit(c['hi'])}")
            v = (f"sum(CASE WHEN {c['col']} IS NOT NULL AND "
                 f"({' OR '.join(conds)}) THEN 1 ELSE 0 END)")
        elif c["kind"] == "prefix":
            p = c["prefix"].replace("'", "''")
            v = (f"sum(CASE WHEN {c['col']} IS NOT NULL AND NOT "
                 f"starts_with({c['col']}, '{p}') THEN 1 ELSE 0 END)")
        elif c["kind"] == "unique":
            # ROW() wrap: a struct with NULL fields is itself non-NULL,
            # so NULL keys count as a key value — matching Spark's
            # collect_set-over-struct semantics (bare count(DISTINCT
            # col) would skip NULLs and diverge)
            v = f"count(*) - count(DISTINCT ROW({', '.join(c['cols'])}))"
        elif c["kind"] == "ref_integrity":
            if not c["ref_sql"]:
                raise ValueError(f"{c['name']}: ref_sql required")
            v = (f"(SELECT count(*) FROM ({source_sql}) x WHERE "
                 f"x.{c['col']} IS NOT NULL AND x.{c['col']} NOT IN "
                 f"(SELECT {c['ref_col']} FROM ({c['ref_sql']}) r "
                 f"WHERE r.{c['ref_col']} IS NOT NULL))")
        else:
            raise ValueError(f"unknown check kind: {c['kind']}")
        selects.append(
            f"SELECT {name} AS check_name, count(*)::BIGINT AS total, "
            f"({v})::BIGINT AS violations FROM ({source_sql})")
    body = "\nUNION ALL\n".join(selects)
    return f"""
WITH raw AS (
{body}
)
SELECT check_name, total, violations,
       CASE WHEN total > 0
            THEN ((total - violations) * {_M}) // total END::BIGINT
         AS pass_rate_micros,
       (CASE WHEN violations = 0 THEN 1 ELSE 0 END)::BIGINT AS passed
FROM raw
"""
