"""Replicates the driver's correctness gate: run every queries() entry on
Spark AND its oracle_sql() twin on DuckDB at sf0.01, compare row count,
column names, and order-insensitive values.

This is the test that must be green before any round ships — it is a local
rehearsal of CORRECTNESS_r{N}.json.
"""

import math
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

SF = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()
# the driver grades the FIRST 50 declared queries() entries by hashing
# serialized output — declared types included, so a Spark decimal(28,2)
# vs DuckDB DECIMAL(18,2) hash-mismatches even when every Python value is
# identical (r9's one red lane). Graded lanes must follow the entry file's
# portability rule: decimal aggregates end cast to DOUBLE, integers to
# BIGINT — no raw DecimalType may reach a graded output schema.
GRADED = set(list(QUERIES)[:50])


def _normalize(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # EXACT compare — the driver hashes raw values, so any tolerance here
        # hides a divergence the driver would flag (r1: user_activity slipped
        # through the old 9dp rounding)
        return v
    return v


def _rows(frame_rows, columns):
    ordered_cols = sorted(columns)
    out = []
    for r in frame_rows:
        if isinstance(r, dict):
            d = r
        elif hasattr(r, "asDict"):
            d = r.asDict()
        else:
            d = dict(zip(columns, r))
        out.append(tuple(_normalize(d[c]) for c in ordered_cols))
    return sorted(out, key=repr)  # repr-keyed: total order even with None/mixed


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(name, spark, duck):
    sdf = QUERIES[name](spark, SF)
    if name in GRADED:
        from pyspark.sql.types import DecimalType
        decimal_cols = [f.name for f in sdf.schema.fields
                        if isinstance(f.dataType, DecimalType)]
        assert not decimal_cols, (
            f"{name}: graded lane emits raw DECIMAL columns {decimal_cols} — "
            "cast to DOUBLE/BIGINT per the entry portability rule (the "
            "driver hashes declared types; r9's orders_cdc_apply failure)"
        )
    spark_cols = sdf.columns
    spark_rows = _rows(sdf.collect(), spark_cols)

    res = duck.execute(ORACLES[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = _rows(
        [dict(zip(duck_cols, row)) for row in res.fetchall()], duck_cols
    )

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    )
    mismatches = [
        (s, d) for s, d in zip(spark_rows, duck_rows) if s != d
    ]
    assert not mismatches, f"{name}: {len(mismatches)} mismatched rows; first 3: {mismatches[:3]}"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_query_runs(name, spark):
    df = QUERIES[name](spark, SF)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
