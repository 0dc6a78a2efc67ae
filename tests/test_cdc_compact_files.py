"""compact_files — bin-packing file compaction (Delta's plain OPTIMIZE
without Z-ORDER): content-identical relayout that coalesces fragmented
snapshots (flat layout) or ONLY the fragmented buckets (bucketed
layout), leaving every other bucket's directory — and its standing
skipping-index entries — untouched."""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from systems_spark.streaming import CdcTable, PartitionedCdcTable

PAY = "k long, s string, v long"
CH_SCHEMA = PAY + ", seq long, op string"


def _seed(spark, n=64):
    return spark.createDataFrame(
        [(i, f"s{i}", i * 10) for i in range(n)], PAY)


def _ch(spark, rows):
    return spark.createDataFrame(rows, CH_SCHEMA)


def _rows(df):
    return sorted((r.k, r.s, r.v) for r in df.collect())


def _n_files(path):
    return sum(1 for n in os.listdir(path) if n.endswith(".parquet"))


def test_flat_compact_files_coalesces_and_preserves(spark, tmp_path):
    t = CdcTable(str(tmp_path / "t"), key_cols="k", app_id="cf1")
    t.initialize(_seed(spark).repartition(8))
    # one tombstone rides along (it is payload to a file compaction)
    t(_ch(spark, [(1, "x", 0, 1, "delete")]).coalesce(8), 0)
    before = _rows(t.current(spark))
    v_before = t._latest_manifest(spark)["version"]
    frag = _n_files(t.data_path(spark))

    v = t.compact_files(spark, max_files=2)
    if frag <= 2:
        # AQE already wrote a compact merge output: the call must be
        # a no-op that burns no version
        assert v is None
        v = t.compact_files(spark, max_files=1)
        assert v is not None or _n_files(t.data_path(spark)) == 1
    else:
        assert v == v_before + 1
    assert _rows(t.current(spark)) == before
    # the tombstone is payload, not prunable here (that's compact())
    assert t.snapshot(spark).where(F.col(t.DELETED)).count() == 1
    # time travel across the boundary intact
    assert len(_rows(t.at_version(spark, v_before)
                     .where(~F.col(t.DELETED)))) == 63
    # seed version is also still fragmented history, untouched
    assert _n_files(os.path.join(str(tmp_path / "t"),
                                 "version=-1__cf1")) > 2


def test_part_compact_files_rewrites_only_fragmented_buckets(
        spark, tmp_path):
    t = PartitionedCdcTable(str(tmp_path / "p"), key_cols="k",
                            app_id="cf2", num_buckets=4)
    # a wide seed write leaves one file per task in every bucket
    t.initialize(_seed(spark).repartition(12))
    # one single-partition merge rewrites ONE bucket down to one file
    t(_ch(spark, [(1, "one", 11, 1, "update")]).coalesce(1), 0)
    man = t._latest_manifest(spark)
    mapping = dict(t._mapping(man))
    n_before = {b: _n_files(t._bucket_paths(man, [b])[0])
                for b in mapping}
    # the threshold sits at the least-fragmented bucket: buckets above
    # it are dirty, buckets at it stay untouched
    bound = min(n_before.values())
    dirty = {b for b, n in n_before.items() if n > bound}
    assert dirty, f"need fragmentation spread, got {n_before}"
    before = _rows(t.current(spark))

    v = t.compact_files(spark, max_files=bound)
    assert v is not None
    man2 = t._latest_manifest(spark)
    mapping2 = t._mapping(man2)
    for b, n in n_before.items():
        path = t._bucket_paths(man2, [b])[0]
        if b in dirty:
            # fragmented: repointed and rewritten to exactly ONE file
            assert mapping2[b] == v, f"bucket {b} should repoint"
            assert _n_files(path) == 1
        else:
            # within bounds: directory (and mapping entry) untouched
            assert mapping2[b] == mapping[b], f"bucket {b} moved"
    assert _rows(t.current(spark)) == before
    # idempotent: second pass finds nothing fragmented
    assert t.compact_files(spark, max_files=bound) is None


def test_part_compact_files_keeps_pending_deltas(spark, tmp_path):
    t = PartitionedCdcTable(str(tmp_path / "p"), key_cols="k",
                            app_id="cf3", num_buckets=2,
                            write_mode="merge_on_read")
    t.initialize(_seed(spark, 32).repartition(8))
    t(_ch(spark, [(1, "mor", 99, 1, "update"),
                  (2, "x", 0, 1, "delete")]), 0)
    man = t._latest_manifest(spark)
    assert man.get("pending")
    before = _rows(t.current(spark))

    v = t.compact_files(spark, max_files=2)
    assert v is not None
    man2 = t._latest_manifest(spark)
    # deltas were NOT folded — that's compact_deltas' job
    assert man2.get("pending") == man.get("pending")
    assert _rows(t.current(spark)) == before
    assert (1, "mor", 99) in _rows(t.current(spark))
    assert all(k != 2 for k, _, _ in _rows(t.current(spark)))


def test_compact_files_untouched_bucket_index_survives(spark, tmp_path):
    """compact_files honors the same survival contract as merges: a
    bucket it does not rewrite keeps its directory, so its standing
    skipping-index entries keep hitting — only the relaid-out buckets
    rebuild (counted via the file_stats builder), and the index stays
    full-scan exact across the relayout."""
    import systems_spark.operators.zorder as zz
    from systems_spark.operators.zorder import CdcSkippingIndex
    from systems_spark.state import StateStore

    t = PartitionedCdcTable(str(tmp_path / "p"), key_cols="k",
                            app_id="cf5", num_buckets=4)
    t.initialize(_seed(spark).repartition(12))
    # one bucket compacted ahead of time via a single-task merge
    t(_ch(spark, [(1, "one", 11, 1, "update")]).coalesce(1), 0)
    idx = CdcSkippingIndex(StateStore(root=str(tmp_path / "state")))

    def agg():
        got = idx.aggregate(spark, t, ["v"]).collect()[0]
        want = t.current(spark).agg(
            F.count(F.lit(1)).alias("count_rows"),
            F.min("v").alias("v_min"), F.max("v").alias("v_max"),
            F.count("v").alias("v_count")).collect()[0]
        assert tuple(got) == tuple(want)

    agg()  # standing entries built at the pre-compaction layout
    man = t._latest_manifest(spark)
    n_files = {b: _n_files(t._bucket_paths(man, [b])[0])
               for b in t._mapping(man)}
    bound = min(n_files.values())
    dirty = [b for b, n in n_files.items() if n > bound]
    assert dirty and len(dirty) < len(n_files)

    assert t.compact_files(spark, max_files=bound) is not None
    calls = {"n": 0}
    real = zz.file_stats

    def counting(*a, **kw):
        calls["n"] += 1
        return real(*a, **kw)

    zz.file_stats = counting
    try:
        agg()  # exact over the new layout
    finally:
        zz.file_stats = real
    assert calls["n"] == len(dirty)  # untouched buckets never rebuilt


def test_compact_files_validates_and_carries_fence(spark, tmp_path):
    t = CdcTable(str(tmp_path / "t"), key_cols="k", app_id="cf4")
    with pytest.raises(ValueError, match="max_files"):
        t.compact_files(spark, max_files=0)
    t.initialize(_seed(spark, 16).repartition(8))
    t(_ch(spark, [(1, "x", 0, 5, "delete")]), 0)
    t.compact(spark, fence_seq=5)  # standing fence
    v = t.compact_files(spark, max_files=1)
    if v is not None:
        assert int(t._latest_manifest(spark)["fence_seq"]) == 5
