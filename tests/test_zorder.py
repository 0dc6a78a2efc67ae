"""z_value / zorder_layout: Morton key vs a pure-Python reference,
DuckDB twin equality, clamping, validation, and the locality property
that justifies the layout (per-file bounding boxes shrink on BOTH
columns vs a linear sort)."""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from systems_spark.operators.zorder import z_value, z_value_sql, zorder_layout


def _py_z(vals, ranges, bits):
    z = 0
    k = len(vals)
    for i, (v, (lo, hi)) in enumerate(zip(vals, ranges)):
        v = max(lo, min(hi, v))
        g = (v - lo) * ((1 << bits) - 1) // (hi - lo)
        for j in range(bits):
            z |= ((g >> j) & 1) << (j * k + i)
    return z


def test_z_value_matches_python_reference(spark):
    import random

    rnd = random.Random(5)
    rows = [(rnd.randint(-50, 1100), rnd.randint(0, 99999))
            for _ in range(200)]
    ranges = [(0, 1000), (0, 65536)]
    df = spark.createDataFrame(rows, "a long, b long")
    got = [r.z for r in
           df.select(z_value(["a", "b"], ranges, bits=10).alias("z"))
           .collect()]
    want = [_py_z(v, ranges, 10) for v in rows]
    assert got == want


def test_z_value_sql_twin_matches(spark):
    import duckdb
    import random

    rnd = random.Random(7)
    rows = [(rnd.randint(0, 5000), rnd.randint(0, 300)) for _ in range(150)]
    ranges = [(0, 5000), (0, 300)]
    df = spark.createDataFrame(rows, "a long, b long")
    got = sorted(r.z for r in
                 df.select(z_value(["a", "b"], ranges, bits=8).alias("z"))
                 .collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE t (a BIGINT, b BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    sql = f"SELECT {z_value_sql(['a', 'b'], ranges, bits=8)} AS z FROM t"
    want = sorted(r[0] for r in con.execute(sql).fetchall())
    assert got == want


def test_validation(spark):
    with pytest.raises(ValueError, match="exceeds a long"):
        z_value(["a", "b"], [(0, 1), (0, 1)], bits=32)
    with pytest.raises(ValueError, match="empty"):
        z_value(["a"], [(5, 5)], bits=4)
    with pytest.raises(ValueError, match="one .lo, hi. range"):
        z_value(["a", "b"], [(0, 1)], bits=4)
    with pytest.raises(ValueError, match="float-division"):
        z_value(["a"], [(0, 1 << 45)], bits=16)


def test_zorder_layout_locality_beats_linear_sort(spark):
    """The point of the layout: a linear sort is tight on its leading
    column but every file spans the FULL range of the other column (a
    filter on y alone prunes nothing); z-order files stay bounded on
    BOTH dimensions, so min/max skipping works for either predicate."""
    import random

    rnd = random.Random(11)
    n = 4000
    rows = [(rnd.randint(0, 9999), rnd.randint(0, 9999)) for _ in range(n)]
    df = spark.createDataFrame(rows, "x long, y long")
    ranges = [(0, 9999), (0, 9999)]

    def avg_spans(frame):
        row = (frame.groupBy(F.spark_partition_id().alias("p"))
               .agg((F.max("x") - F.min("x")).alias("sx"),
                    (F.max("y") - F.min("y")).alias("sy"))
               .agg(F.avg("sx").alias("sx"), F.avg("sy").alias("sy"))
               .collect())[0]
        return row["sx"], row["sy"]

    zed = zorder_layout(df, ["x", "y"], ranges, bits=12, partitions=16)
    linear = df.repartitionByRange(16, "x").sortWithinPartitions("x")
    zx, zy = avg_spans(zed)
    lx, ly = avg_spans(linear)
    # linear: sy ~ full 10000; z-order: both spans ~ quadrant-sized.
    # 0.5 is a loose bound (sampled range boundaries straddle quadrants)
    assert zy < ly * 0.5, (zy, ly)
    # and x stays bounded too — not a transpose of the problem
    assert zx < 10000 * 0.8, zx
    # the layout is a pure re-arrangement
    assert zed.drop("_zorder").count() == n


def test_file_stats_pruned_read_end_to_end(spark, tmp_path):
    """The full data-skipping loop: write a z-ordered multi-file table,
    build the per-file stats index, and a box predicate on BOTH columns
    must read a small fraction of the files while returning exactly the
    full-scan answer. The same predicate against a linear-sorted layout
    reads more files (y prunes nothing there)."""
    import random

    from systems_spark.operators.zorder import (file_stats, pruned_files,
                                                pruned_read)

    rnd = random.Random(3)
    n = 8000
    rows = [(rnd.randint(0, 9999), rnd.randint(0, 9999), i)
            for i in range(n)]
    df = spark.createDataFrame(rows, "x long, y long, payload long")
    ranges = [(0, 9999), (0, 9999)]

    zp = str(tmp_path / "zed")
    (zorder_layout(df, ["x", "y"], ranges, bits=12, partitions=32)
     .drop("_zorder").write.parquet(zp))
    lp = str(tmp_path / "linear")
    df.repartitionByRange(32, "x").sortWithinPartitions("x") \
        .write.parquet(lp)

    preds = {"x": (2000, 2999), "y": (7000, 7999)}
    z_stats = file_stats(spark, zp, ["x", "y"])
    l_stats = file_stats(spark, lp, ["x", "y"])
    n_total = z_stats.count()
    # the z-order claim: a predicate on the NON-LEADING column alone
    # prunes — the linear layout reads EVERY file for it
    y_only = {"y": (7000, 7999)}
    assert len(pruned_files(l_stats, y_only)) == l_stats.count()
    assert len(pruned_files(z_stats, y_only)) <= n_total // 2
    # and the 2-D box stays a small fraction under z-order too
    z_kept = pruned_files(z_stats, preds)
    assert len(z_kept) <= n_total // 2, (len(z_kept), n_total)

    got = sorted(r.payload for r in
                 pruned_read(spark, z_stats, preds)
                 .where("x BETWEEN 2000 AND 2999 AND "
                        "y BETWEEN 7000 AND 7999").collect())
    want = sorted(p for x, y, p in rows
                  if 2000 <= x <= 2999 and 7000 <= y <= 7999)
    assert got == want

    # half-open + no-overlap handling
    assert pruned_files(z_stats, {"x": (None, -1)}) == []
    with pytest.raises(ValueError, match="no file overlaps"):
        pruned_read(spark, z_stats, {"x": (10**9, None)})
