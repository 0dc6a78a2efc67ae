"""Pruned merge-on-read snapshot fold: every delta commit records its
touched buckets (``pending_buckets``) in the manifest, and snapshot
materialization folds ONLY those buckets — untouched buckets union
through verbatim. Without this, a 100 TB read with one small pending
delta shuffles the whole table through the fold window. Coverage is
recorded only when provable; pre-field logs take the full fold."""

import json
import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from systems_spark.streaming import PartitionedCdcTable
from systems_spark.streaming.sinks import ConcurrentCommitError

PAY = "k long, s string, v long"
CH_SCHEMA = PAY + ", seq long, op string"


def _seed(spark, n=64):
    return spark.createDataFrame(
        [(i, f"s{i}", i * 10) for i in range(n)], PAY)


def _ch(spark, rows):
    return spark.createDataFrame(rows, CH_SCHEMA)


def _rows(df):
    return sorted((r.k, r.s, r.v) for r in df.collect())


def _mor(spark, path, app="w", n_buckets=8):
    t = PartitionedCdcTable(str(path), key_cols="k", app_id=app,
                            num_buckets=n_buckets,
                            write_mode="merge_on_read")
    return t


def _strip_pending_buckets(t, spark):
    """Rewrite the LATEST marker without pending_buckets — a faithful
    pre-field log for fallback tests."""
    v = t._latest_version(spark)
    p = t._marker_path(v)
    local = p[len("file:"):] if p.startswith("file:") else p
    man = json.loads(open(local).read())
    man.pop("pending_buckets", None)
    os.remove(local)
    with open(local, "w") as fh:
        fh.write(json.dumps(man, sort_keys=True))
    return man


def test_manifest_records_and_accumulates_pending_buckets(
        spark, tmp_path):
    t = _mor(spark, tmp_path / "t")
    t.initialize(_seed(spark))
    t(_ch(spark, [(1, "a", 11, 1, "update")]), 0)
    man = t._latest_manifest(spark)
    b1 = man["pending_buckets"]
    assert len(b1) == 1
    t(_ch(spark, [(2, "b", 22, 2, "update"),
                  (3, "c", 33, 2, "update")]), 1)
    man = t._latest_manifest(spark)
    assert set(man["pending_buckets"]) >= set(b1)
    assert len(man["pending"]) == 2
    # fold clears the pending list AND its bucket set together
    t.compact_deltas(spark)
    man = t._latest_manifest(spark)
    assert not man.get("pending") and "pending_buckets" not in man


def test_pruned_fold_reads_only_touched_buckets(spark, tmp_path):
    t = _mor(spark, tmp_path / "t")
    t.initialize(_seed(spark))
    t(_ch(spark, [(1, "a", 11, 1, "update"),
                  (2, "x", 0, 1, "delete")]), 0)
    man = t._latest_manifest(spark)
    touched = set(man["pending_buckets"])
    mapping = set(t._mapping(man))
    assert touched < mapping, "need a proper subset for this pin"

    calls = []
    real = t._read_buckets

    def recording(spark_, man_, buckets):
        calls.append(sorted(int(b) for b in buckets))
        return real(spark_, man_, buckets)

    t._read_buckets = recording
    try:
        got = _rows(t.current(spark))
    finally:
        del t._read_buckets
    # exactly two reads: the fold's (touched) and the pass-through
    # (everything else) — never the full mapping through the fold
    assert sorted(calls) == sorted(
        [sorted(touched), sorted(mapping - touched)])
    want = [(k, f"s{k}", k * 10) for k in range(64) if k not in (1, 2)]
    want.append((1, "a", 11))
    assert got == sorted(want)


def test_legacy_manifest_without_field_takes_full_fold(spark, tmp_path):
    t = _mor(spark, tmp_path / "t")
    t.initialize(_seed(spark))
    t(_ch(spark, [(1, "a", 11, 1, "update")]), 0)
    _strip_pending_buckets(t, spark)
    try:
        os.remove(t._hint_local_path())
    except (OSError, TypeError):
        pass

    calls = []
    real = t._read_buckets

    def recording(spark_, man_, buckets):
        calls.append(sorted(int(b) for b in buckets))
        return real(spark_, man_, buckets)

    t._read_buckets = recording
    try:
        got = _rows(t.current(spark))
    finally:
        del t._read_buckets
    # one full-mapping read through the fold — same answer, full cost
    assert calls == [sorted(t._mapping(t._latest_manifest(spark)))]
    assert (1, "a", 11) in got and len(got) == 64


def test_delta_over_legacy_pending_omits_field(spark, tmp_path):
    """A delta committed on top of a legacy pending list cannot prove
    coverage of the older deltas — the field must stay absent (an
    under-covering set would silently drop their effects)."""
    t = _mor(spark, tmp_path / "t")
    t.initialize(_seed(spark))
    t(_ch(spark, [(1, "a", 11, 1, "update")]), 0)
    _strip_pending_buckets(t, spark)
    try:
        os.remove(t._hint_local_path())
    except (OSError, TypeError):
        pass
    t(_ch(spark, [(2, "b", 22, 2, "update")]), 1)
    man = t._latest_manifest(spark)
    assert len(man["pending"]) == 2
    assert "pending_buckets" not in man
    got = _rows(t.current(spark))
    assert (1, "a", 11) in got and (2, "b", 22) in got


def test_pruned_fold_matches_cow_twin_and_serves_inserts(
        spark, tmp_path):
    """Equality oracle: an identically-fed copy-on-write table must
    land the same live view — including an insert whose key hashes to
    a bucket the seed never mapped."""
    mor = _mor(spark, tmp_path / "m", app="wm")
    cow = PartitionedCdcTable(str(tmp_path / "c"), key_cols="k",
                              app_id="wc", num_buckets=8)
    seed = spark.createDataFrame([(0, "s0", 0), (8, "s8", 80)], PAY)
    for t in (mor, cow):
        t.initialize(seed)
    batch1 = _ch(spark, [(0, "u0", 1, 1, "update"),
                         (17, "ins", 170, 1, "insert"),
                         (8, "x", 0, 1, "delete")])
    batch2 = _ch(spark, [(23, "ins2", 230, 2, "insert")])
    for t in (mor, cow):
        t(batch1, 0)
        t(batch2, 1)
    assert _rows(mor.current(spark)) == _rows(cow.current(spark))
    assert (17, "ins", 170) in _rows(mor.current(spark))


def test_fast_recommit_carries_change_buckets(spark, tmp_path):
    t = _mor(spark, tmp_path / "t")
    t.initialize(_seed(spark))
    man = t._latest_manifest(spark)
    # inject a CAS loss AT THE PUBLISH (the staged dir must survive
    # with its computed bucket set riding the error)

    def losing(*a, **kw):
        raise ConcurrentCommitError("injected CAS loss")

    t._publish_delta_manifest = losing
    try:
        with pytest.raises(ConcurrentCommitError) as ei:
            t._commit_delta(
                spark, _ch(spark, [(1, "a", 11, 1, "update")]),
                0, man, man["schema"], keep_staged_on_loss=True)
    finally:
        del t._publish_delta_manifest
    staged = ei.value.staged
    assert staged and staged["change_buckets"], staged
    # the fast recommit republishes with the carried buckets
    t._publish_delta_manifest(
        spark, 0, man, staged["rows"], staged["dir_name"],
        man["schema"], change_buckets=staged["change_buckets"])
    man2 = t._latest_manifest(spark)
    assert man2["pending_buckets"] == staged["change_buckets"]
    assert (1, "a", 11) in _rows(t.current(spark))


def test_clone_inherits_pending_buckets(spark, tmp_path):
    t = _mor(spark, tmp_path / "t")
    t.initialize(_seed(spark))
    t(_ch(spark, [(1, "a", 11, 1, "update")]), 0)
    clone = t.clone_to(spark, str(tmp_path / "c"))
    seed_man = clone._latest_manifest(spark)
    assert seed_man["pending_buckets"] == \
        t._latest_manifest(spark)["pending_buckets"]
    assert (1, "a", 11) in _rows(clone.current(spark))
