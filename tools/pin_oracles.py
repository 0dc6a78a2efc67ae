#!/usr/bin/env python
"""Regenerate oracle_snapshots.json — pinned expected outputs for graded
queries whose computation trains a model (not SQL-expressible) but is
deterministic by construction at sf0.01 (seeded + pinned training layout;
see q_implicit_recommend / q_predict_forest docstrings).

Run after any change to those queries or to the sf0.01 test data:

    python tools/pin_oracles.py

__spark_entry__.oracle_sql() turns each snapshot into a VALUES-literal
DuckDB oracle, restoring full rows+schema+hash grading for these queries.
"""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SNAPSHOT_QUERIES = ["implicit_recommend", "predict_forest", "bpe_train",
                    "bpe_tokenize"]
SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")


def main():
    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    for name in SNAPSHOT_QUERIES:
        df = entrymod.queries()[name](spark, SF_DIR)
        rows = sorted((list(r) for r in df.collect()), key=repr)
        out[name] = {"sf_dir": SF_DIR, "columns": df.columns, "rows": rows}
        print(f"{name}: {len(rows)} rows pinned")
    spark.stop()
    path = os.path.join(REPO, "oracle_snapshots.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=0)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
