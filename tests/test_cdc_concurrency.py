"""Optimistic concurrency on the CDC tables: the commit log is SHARED
across writers (markers v{N}.json claimed by put-if-absent), each
writer stages data under its own version=N__app_id directory, and a
losing writer cleans its staging dir and rebases its merge on the new
snapshot — Delta's optimistic protocol on plain parquet.
"""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from systems_spark.state import fs_publish_text_exclusive
from systems_spark.streaming import (CdcTable, ConcurrentCommitError,
                                     PartitionedCdcTable)

PAY = "k long, s string, v long"
CH_SCHEMA = PAY + ", seq long, op string"


def _ch(spark, rows):
    return spark.createDataFrame(rows, CH_SCHEMA)


def _seed(spark):
    return spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], PAY)


def test_publish_exclusive_is_first_writer_wins(spark, tmp_path):
    p = str(tmp_path / "m" / "v0.json")
    assert fs_publish_text_exclusive(spark, p, "first") is True
    assert fs_publish_text_exclusive(spark, p, "second") is False
    with open(p) as fh:
        assert fh.read() == "first"  # never a mix, never the loser's


def test_two_writers_share_one_version_chain(spark, tmp_path):
    base = str(tmp_path / "t")
    a = CdcTable(base, key_cols="k", app_id="writer-a")
    b = CdcTable(base, key_cols="k", app_id="writer-b")
    a.initialize(_seed(spark))
    b.initialize(_seed(spark).limit(0))  # concurrent seed: no-op

    a(_ch(spark, [(1, "a1", 11, 1, "update")]), 0)
    b(_ch(spark, [(2, "b1", 21, 2, "update")]), 0)
    a(_ch(spark, [(4, "d", 40, 3, "insert")]), 1)

    assert a.versions(spark) == [-1, 0, 1, 2]
    apps = [m["app_id"] for m in a.history(spark)]
    assert apps == ["writer-a", "writer-a", "writer-b", "writer-a"]
    live = {r.k: r.s for r in b.current(spark).collect()}
    assert live == {1: "a1", 2: "b1", 3: "c", 4: "d"}

    # idempotence stays per-(app_id, batch_id): b's batch 1 is NOT
    # shadowed by a's batch 1 already being in the shared log
    b(_ch(spark, [(3, "c1", 31, 4, "update")]), 1)
    assert b.current(spark).where("k = 3").collect()[0].s == "c1"
    # but a REPLAY of a's batch 1 is a no-op
    n_versions = len(a.versions(spark))
    a(_ch(spark, [(4, "dX", 99, 9, "update")]), 1)
    assert len(a.versions(spark)) == n_versions
    assert a.current(spark).where("k = 4").collect()[0].s == "d"


def test_losing_writer_rebases_and_cleans_staging(spark, tmp_path,
                                                  monkeypatch):
    base = str(tmp_path / "t")
    a = CdcTable(base, key_cols="k", app_id="wa")
    b = CdcTable(base, key_cols="k", app_id="wb")
    a.initialize(_seed(spark))
    b(_ch(spark, [(2, "b1", 21, 1, "update")]), 0)  # b takes version 0

    # force a's first attempt onto the version b already owns: the CAS
    # must lose, the staged dir must vanish, and the retry must land
    # the merge REBASED on b's snapshot at the next version
    taken = a.versions(spark)[-1]
    real = CdcTable._next_version
    calls = {"n": 0}

    def stale_once(self, spark_):
        calls["n"] += 1
        return taken if calls["n"] == 1 else real(self, spark_)

    monkeypatch.setattr(CdcTable, "_next_version", stale_once)
    a(_ch(spark, [(1, "a1", 11, 2, "update")]), 0)
    monkeypatch.undo()

    assert calls["n"] >= 2  # the retry actually ran
    assert not os.path.exists(os.path.join(base, f"version={taken}__wa"))
    live = {r.k: r.s for r in a.current(spark).collect()}
    assert live == {1: "a1", 2: "b1", 3: "c"}  # both writers' changes
    assert a.versions(spark) == [-1, 0, 1]


def test_exhausted_retries_raise(spark, tmp_path, monkeypatch):
    base = str(tmp_path / "t")
    a = CdcTable(base, key_cols="k", app_id="wa")
    a.initialize(_seed(spark))
    a(_ch(spark, [(1, "x", 1, 1, "update")]), 0)
    taken = a.versions(spark)[-1]
    monkeypatch.setattr(CdcTable, "_next_version",
                        lambda self, s: taken)  # contention forever
    with pytest.raises(ConcurrentCommitError, match="gave up"):
        a(_ch(spark, [(2, "y", 2, 2, "update")]), 1)


def test_partitioned_two_writers_and_rebase(spark, tmp_path, monkeypatch):
    base = str(tmp_path / "t")
    a = PartitionedCdcTable(base, key_cols="k", app_id="pa",
                            num_buckets=4)
    b = PartitionedCdcTable(base, key_cols="k", app_id="pb",
                            num_buckets=4)
    a.initialize(_seed(spark))
    b.initialize(_seed(spark).limit(0))
    b(_ch(spark, [(2, "b1", 21, 1, "update")]), 0)

    taken = a.versions(spark)[-1]
    real = PartitionedCdcTable._next_version
    calls = {"n": 0}

    def stale_once(self, spark_):
        calls["n"] += 1
        return taken if calls["n"] == 1 else real(self, spark_)

    monkeypatch.setattr(PartitionedCdcTable, "_next_version", stale_once)
    a(_ch(spark, [(1, "a1", 11, 2, "update")]), 0)
    monkeypatch.undo()

    assert calls["n"] >= 2
    assert not os.path.exists(os.path.join(base, f"version={taken}__pa"))
    live = {r.k: r.s for r in b.current(spark).collect()}
    assert live == {1: "a1", 2: "b1", 3: "c"}
    # the rebased manifest must resolve EVERY writer version its bucket
    # mapping references (b's included) through its dirs map
    man = a._latest_manifest(spark)
    assert {str(v) for v in a._mapping(man).values()} <= set(man["dirs"])
    assert sorted(a._mapping(man)) == sorted(b._mapping(man))


def test_orphan_staging_dir_is_invisible_and_vacuumed(spark, tmp_path):
    base = str(tmp_path / "t")
    a = CdcTable(base, key_cols="k", app_id="wa")
    a.initialize(_seed(spark))
    a(_ch(spark, [(1, "a1", 11, 1, "update")]), 0)

    # a crashed writer's staging dir: real parquet, no marker
    zombie = os.path.join(base, "version=7__zombie")
    _seed(spark).write.parquet(zombie)
    assert a.versions(spark) == [-1, 0]  # invisible to the log
    assert {r.k for r in a.current(spark).collect()} == {1, 2, 3}

    a(_ch(spark, [(2, "b1", 21, 2, "update")]), 1)
    a.vacuum(spark, keep_last=2)
    assert not os.path.exists(zombie)  # swept with the aged versions
    assert a.versions(spark) == [0, 1]
    live = {r.k: r.s for r in a.current(spark).collect()}
    assert live == {1: "a1", 2: "b1", 3: "c"}
