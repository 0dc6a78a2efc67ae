"""CdcSkippingIndex (r12, VERDICT r11 item 5): metadata-only
aggregates and token-bloom text search over LIVE CDC tables — the
skipping indexes wired to a table that keeps committing, per-bucket so
untouched buckets' standing entries survive merges.
"""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import systems_spark.operators.zorder as zz
from systems_spark.operators.zorder import CdcSkippingIndex
from systems_spark.state import StateStore
from systems_spark.streaming import CdcTable, PartitionedCdcTable

PAY = "k long, v long, txt string"
CH = PAY + ", seq long, op string"

WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]


def _seed(spark, n=240):
    rows = [(k, k * 10 if k % 7 else None,
             f"{WORDS[k % 6]} {WORDS[(k + 1) % 6]} doc{k}")
            for k in range(n)]
    return spark.createDataFrame(rows, PAY)


def _full_scan_agg(live):
    return live.agg(
        F.count(F.lit(1)).alias("count_rows"),
        F.min("k").alias("k_min"), F.max("k").alias("k_max"),
        F.count("k").alias("k_count"),
        F.min("v").alias("v_min"), F.max("v").alias("v_max"),
        F.count("v").alias("v_count")).collect()[0]


def _check_agg(spark, idx, table):
    got = idx.aggregate(spark, table, ["k", "v"]).collect()[0]
    want = _full_scan_agg(table.current(spark))
    assert tuple(got) == tuple(want), (tuple(got), tuple(want))


def _check_search(spark, idx, table, query):
    got = sorted((r.k, r.txt) for r in
                 idx.search_tokens(spark, table, "txt", query)
                 .select("k", "txt").collect())
    toks = query.lower().split()
    live = table.current(spark)
    cond = F.lit(True)
    for t in toks:
        cond = cond & F.array_contains(
            F.split(F.lower("txt"), "[^a-z0-9]+"), F.lit(t))
    want = sorted((r.k, r.txt) for r in
                  live.where(cond).select("k", "txt").collect())
    assert got == want


@pytest.mark.parametrize("write_mode", ["copy_on_write",
                                        "merge_on_read"])
def test_live_table_aggregate_and_search_across_merges(
        spark, tmp_path, write_mode):
    """The done-bar: a PartitionedCdcTable absorbs ≥2 merges (updates,
    deletes, inserts, NULLs — including deleting the extremal row) and
    the index answers stay full-scan exact at every step."""
    t = PartitionedCdcTable(str(tmp_path / "t"), "k", app_id="w",
                            num_buckets=8, write_mode=write_mode)
    t.initialize(_seed(spark))
    idx = CdcSkippingIndex(StateStore(root=str(tmp_path / "state")))

    _check_agg(spark, idx, t)
    _check_search(spark, idx, t, "alpha beta")

    # merge 1: delete the max key, stretch a value, insert beyond range
    t(spark.createDataFrame(
        [(239, None, None, 1, "delete"),
         (5, 999999, "omega doc5", 1, "update"),
         (500, 7, "alpha omega doc500", 1, "insert")], CH), 0)
    _check_agg(spark, idx, t)
    _check_search(spark, idx, t, "omega")

    # merge 2: delete the NEW max (the inserted row), null out a value
    t(spark.createDataFrame(
        [(500, None, None, 2, "delete"),
         (10, None, "beta beta doc10", 2, "update")], CH), 1)
    _check_agg(spark, idx, t)
    _check_search(spark, idx, t, "beta doc10")
    _check_search(spark, idx, t, "nosuchtoken anywhere")


def test_untouched_bucket_stats_survive_merges(spark, tmp_path):
    """After a one-key merge, only the moved bucket (and the final
    combine) rebuilds — untouched buckets hit their standing stats
    (rebuild counted via the file_stats builder)."""
    t = PartitionedCdcTable(str(tmp_path / "t"), "k", app_id="w",
                            num_buckets=8)
    t.initialize(_seed(spark))
    idx = CdcSkippingIndex(StateStore(root=str(tmp_path / "state")))
    _check_agg(spark, idx, t)

    t(spark.createDataFrame([(7, 70000, "alpha doc7", 1, "update")],
                            CH), 0)

    calls = {"n": 0}
    real = zz.file_stats

    def counting(*a, **kw):
        calls["n"] += 1
        return real(*a, **kw)

    zz.file_stats = counting
    try:
        _check_agg(spark, idx, t)
    finally:
        zz.file_stats = real
    assert calls["n"] == 1  # only the touched bucket rebuilt


def test_mor_pending_deltas_answered_exactly(spark, tmp_path):
    """Pending merge-on-read deltas: touched buckets fold for real,
    untouched buckets stay metadata-served — the combined answer is
    full-scan exact even though the table has uncompacted deltas."""
    t = PartitionedCdcTable(str(tmp_path / "t"), "k", app_id="w",
                            num_buckets=8, write_mode="merge_on_read")
    t.initialize(_seed(spark))
    idx = CdcSkippingIndex(StateStore(root=str(tmp_path / "state")))
    _check_agg(spark, idx, t)  # indexes built at the seed layout

    # two staged deltas, never compacted: the pending list is live
    t(spark.createDataFrame(
        [(0, 123, "alpha staged doc0", 1, "update"),
         (239, None, None, 1, "delete")], CH), 0)
    t(spark.createDataFrame(
        [(600, 5, "staged gamma doc600", 2, "insert")], CH), 1)
    man = t._latest_manifest(spark)
    assert man.get("pending")  # really uncompacted

    _check_agg(spark, idx, t)
    _check_search(spark, idx, t, "staged")        # delta-only rows
    _check_search(spark, idx, t, "alpha")         # mixed


def test_tombstones_never_leak_into_answers(spark, tmp_path):
    """A deleted document's tokens must not match, and its values must
    not stretch min/max — even though the bytes still sit in the
    bucket files (live-only index build)."""
    t = PartitionedCdcTable(str(tmp_path / "t"), "k", app_id="w",
                            num_buckets=4)
    t.initialize(spark.createDataFrame(
        [(1, 10, "common uniquetoken"), (2, 99999, "common plain"),
         (3, 50, "common other")], PAY))
    t(spark.createDataFrame([(2, None, None, 1, "delete")], CH), 0)
    idx = CdcSkippingIndex(StateStore(root=str(tmp_path / "state")))
    got = idx.aggregate(spark, t, ["v"]).collect()[0]
    assert (got["count_rows"], got["v_min"], got["v_max"]) == (2, 10, 50)
    assert idx.search_tokens(spark, t, "txt", "plain").count() == 0
    assert idx.search_tokens(spark, t, "txt", "common").count() == 2


def test_flat_layout_and_rename_survival(spark, tmp_path):
    """The flat CdcTable works as one unit, and a RENAME COLUMN (a
    manifest-only commit — no files move) keeps serving under the new
    logical name without invalidating the physical-name index."""
    t = CdcTable(str(tmp_path / "t"), "k", app_id="w")
    t.initialize(_seed(spark, 60))
    idx = CdcSkippingIndex(StateStore(root=str(tmp_path / "state")))
    _check_agg(spark, idx, t)

    t.rename_column(spark, "txt", "body")
    got = sorted(r.k for r in
                 idx.search_tokens(spark, t, "body", "alpha")
                 .select("k").collect())
    want = sorted(r.k for r in t.current(spark).where(
        F.array_contains(F.split(F.lower("body"), "[^a-z0-9]+"),
                         "alpha")).select("k").collect())
    assert got == want
    agg = idx.aggregate(spark, t, ["body"]).collect()[0]
    assert "body_min" in agg.asDict()


def test_live_range_read_and_bloom_point_read(spark, tmp_path):
    """read() / read_eq() over a live MOR table with pending deltas:
    stats- and bloom-pruned file opens plus the touched-bucket fold,
    row-filtered by the caller — full-scan exact."""
    t = PartitionedCdcTable(str(tmp_path / "t"), "k", app_id="w",
                            num_buckets=8, write_mode="merge_on_read")
    t.initialize(_seed(spark))
    idx = CdcSkippingIndex(StateStore(root=str(tmp_path / "state")))
    t(spark.createDataFrame(
        [(15, 9999, "alpha moved doc15", 1, "update"),
         (16, None, None, 1, "delete"),
         (600, 5, "late gamma doc600", 1, "insert")], CH), 0)
    assert t._latest_manifest(spark).get("pending")
    live = t.current(spark)

    got = sorted(tuple(r) for r in
                 idx.read(spark, t, ["k"], {"k": (10, 20)})
                 .where("k BETWEEN 10 AND 20")
                 .select("k", "v").collect())
    want = sorted(tuple(r) for r in
                  live.where("k BETWEEN 10 AND 20")
                  .select("k", "v").collect())
    assert got == want and (15, 9999) in got and 16 not in {g[0]
                                                            for g in got}

    probes = [15, 16, 600, 999999]
    got = sorted(tuple(r) for r in
                 idx.read_eq(spark, t, "k", probes)
                 .where(F.col("k").isin(probes))
                 .select("k", "v").collect())
    want = sorted(tuple(r) for r in
                  live.where(F.col("k").isin(probes))
                  .select("k", "v").collect())
    assert got == want and {g[0] for g in got} == {15, 600}


def test_vacuum_reclaims_orphaned_bucket_entries(spark, tmp_path):
    """A merge moves its touched bucket to a new directory; the old
    path's standing index entry is unreachable forever. vacuum()
    reclaims exactly those — live entries, other tables' entries in
    the same store root, and the answers all survive."""
    store = StateStore(root=str(tmp_path / "state"))
    t = PartitionedCdcTable(str(tmp_path / "t"), "k", app_id="w",
                            num_buckets=8)
    t.initialize(_seed(spark))
    other = PartitionedCdcTable(str(tmp_path / "o"), "k", app_id="o",
                                num_buckets=4)
    other.initialize(_seed(spark, 40))
    idx = CdcSkippingIndex(store)
    _check_agg(spark, idx, t)
    idx.aggregate(spark, other, ["v"]).collect()
    n_before = len([e for e in store.entries(spark) if e["manifest"]])

    t(spark.createDataFrame([(7, 70000, "alpha doc7", 1, "update")],
                            CH), 0)
    _check_agg(spark, idx, t)  # rebuilds ONLY the moved bucket
    reclaimed = idx.vacuum(spark, t)
    assert reclaimed == 1      # exactly the orphaned old-path entry
    assert idx.vacuum(spark, t) == 0  # idempotent
    # live entries intact: both tables still answer with marker hits
    calls = {"n": 0}
    real = zz.file_stats

    def counting(*a, **kw):
        calls["n"] += 1
        return real(*a, **kw)

    zz.file_stats = counting
    try:
        _check_agg(spark, idx, t)
        idx.aggregate(spark, other, ["v"]).collect()
    finally:
        zz.file_stats = real
    assert calls["n"] == 0
    assert len([e for e in store.entries(spark) if e["manifest"]]) \
        == n_before  # n_before + 1 new - 1 orphan


def test_clone_shares_source_index_entries(spark, tmp_path):
    """A zero-copy clone's bucket paths resolve to the SOURCE's
    directories (dir_bases), so the source's standing index entries
    serve the clone with zero rebuilds — and the clone's vacuum never
    reclaims entries under the source's path."""
    store = StateStore(root=str(tmp_path / "state"))
    src = PartitionedCdcTable(str(tmp_path / "src"), "k", app_id="w",
                              num_buckets=8)
    src.initialize(_seed(spark))
    idx = CdcSkippingIndex(store)
    _check_agg(spark, idx, src)

    clone = src.clone_to(spark, str(tmp_path / "c"))
    calls = {"n": 0}
    real = zz.file_stats

    def counting(*a, **kw):
        calls["n"] += 1
        return real(*a, **kw)

    zz.file_stats = counting
    try:
        _check_agg(spark, idx, clone)   # index once, serve every clone
    finally:
        zz.file_stats = real
    assert calls["n"] == 0
    assert idx.vacuum(spark, clone) == 0  # shared entries untouchable
    _check_agg(spark, idx, src)


def test_schema_evolution_and_column_guard(spark, tmp_path):
    """A schema-evolved table (merge mode, column added by one epoch)
    still indexes: untouched buckets' pre-evolution files NULL-fill
    the new column by name (manifest read schema), so aggregate/read/
    search on the evolved column stay full-scan exact. Unknown and
    DROPPED columns raise the friendly guard instead of leaking
    physical data or dying in analysis."""
    t = PartitionedCdcTable(str(tmp_path / "t"), "k", app_id="w",
                            num_buckets=4, schema_evolution="merge")
    t.initialize(spark.createDataFrame(
        [(k, k * 10) for k in range(40)], "k long, v long"))
    t(spark.createDataFrame([(1, 11, 99, 1, "update")],
                            "k long, v long, w long, seq long, "
                            "op string"), 0)
    idx = CdcSkippingIndex(StateStore(root=str(tmp_path / "state")))
    got = idx.aggregate(spark, t, ["w"]).collect()[0]
    live = t.current(spark)
    want = live.agg(F.count(F.lit(1)).alias("count_rows"),
                    F.min("w").alias("w_min"), F.max("w").alias("w_max"),
                    F.count("w").alias("w_count")).collect()[0]
    assert tuple(got) == tuple(want)
    got_rows = sorted(tuple(r) for r in
                      idx.read(spark, t, ["w"], {"w": (50, 100)})
                      .where("w BETWEEN 50 AND 100")
                      .select("k", "w").collect())
    assert got_rows == [(1, 99)]

    with pytest.raises(ValueError, match="not in the live view"):
        idx.aggregate(spark, t, ["nope"])
    t.drop_column(spark, "w")
    with pytest.raises(ValueError, match="not in the live view"):
        idx.aggregate(spark, t, ["w"])  # dropped data must not leak


def test_vacuum_after_rebucket_reclaims_all_old_entries(spark,
                                                        tmp_path):
    """rebucket is a full rewrite: EVERY old bucket path is orphaned,
    vacuum reclaims them all, and the index rebuilds cleanly at the
    new layout."""
    store = StateStore(root=str(tmp_path / "state"))
    t = PartitionedCdcTable(str(tmp_path / "t"), "k", app_id="w",
                            num_buckets=4)
    t.initialize(_seed(spark, 80))
    idx = CdcSkippingIndex(store)
    _check_agg(spark, idx, t)
    n_old = len([e for e in store.entries(spark) if e["manifest"]])
    assert n_old >= 1

    t.rebucket(spark, 8)
    reclaimed = idx.vacuum(spark, t)
    assert reclaimed == n_old       # everything moved
    _check_agg(spark, idx, t)       # rebuilds at the new layout
    assert idx.vacuum(spark, t) == 0
