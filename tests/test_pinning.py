"""Size-aware pin helper (systems_spark/pinning.py — VERDICT r12 items
3/4): corpus-scale pins must survive executor loss on clusters (reliable
checkpoint when a checkpoint dir is set), local behavior must stay
bit-identical to the r12 localCheckpoint pattern, and superseded pin
generations must release their storage (the BM25.fit_update leak,
ADVICE r12 item 1)."""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from systems_spark.pinning import pin, unpin


def _ckpt_dir(spark):
    return spark.sparkContext._jsc.sc().getCheckpointDir()


def _set_ckpt_dir(spark, path):
    spark.sparkContext.setCheckpointDir(path)


def _clear_ckpt_dir(spark):
    sc = spark.sparkContext
    try:
        getattr(sc._jsc.sc(), "checkpointDir_$eq")(
            sc._jvm.scala.Option.empty())
    except Exception:  # pragma: no cover - py4j name-mangling fallback
        pytest.skip("cannot reset checkpoint dir on this Spark build")


@pytest.fixture
def no_ckpt_dir(spark):
    """Ensure the session has no checkpoint dir; restore nothing (the
    shared session starts without one)."""
    if _ckpt_dir(spark).isDefined():
        _clear_ckpt_dir(spark)
    yield spark


def test_pin_without_checkpoint_dir_is_local(no_ckpt_dir):
    spark = no_ckpt_dir
    df = spark.range(0, 100).withColumn("v", F.col("id") * 2)
    p = pin(df, corpus_scale=True)
    # local fallback: plan root is the localCheckpoint LogicalRDD and the
    # data is exactly the input (bit-identical r12 behavior)
    assert p._jdf.queryExecution().analyzed().getClass() \
        .getSimpleName() == "LogicalRDD"
    assert p.rdd.getCheckpointFile() is None
    assert sorted(r["v"] for r in p.collect()) == [2 * i for i in range(100)]


def test_corpus_pin_survives_block_loss_with_checkpoint_dir(spark,
                                                            tmp_path):
    """The executor-loss simulation: a RELIABLE corpus-scale pin reads
    from checkpoint FILES, so dropping every cached block (what losing an
    executor does to a localCheckpoint) leaves it fully readable."""
    _set_ckpt_dir(spark, str(tmp_path / "ckpt"))
    try:
        df = spark.range(0, 1000).withColumn("v", F.xxhash64("id"))
        p = pin(df, corpus_scale=True, eager=True)
        plan = p._jdf.queryExecution().analyzed()
        assert plan.getClass().getSimpleName() == "LogicalRDD"
        rdd = plan.rdd()
        assert rdd.isCheckpointed(), "corpus pin must be a reliable checkpoint"
        assert rdd.getCheckpointFile().isDefined()
        expect = {(r["id"], r["v"]) for r in df.collect()}
        # simulate executor loss: evict every cached/checkpoint-cached
        # block for this RDD from the block manager, then read again —
        # the reliable checkpoint recovers from files
        rdd.unpersist(True)
        got = {(r["id"], r["v"]) for r in p.collect()}
        assert got == expect
    finally:
        _clear_ckpt_dir(spark)


def test_small_pin_stays_local_even_with_checkpoint_dir(spark, tmp_path):
    _set_ckpt_dir(spark, str(tmp_path / "ckpt2"))
    try:
        df = spark.range(0, 10)
        p = pin(df, eager=True)  # default: small derived table
        plan = p._jdf.queryExecution().analyzed()
        rdd = plan.rdd()
        assert rdd.isLocallyCheckpointed()
        assert not rdd.getCheckpointFile().isDefined()
    finally:
        _clear_ckpt_dir(spark)


def test_unpin_releases_storage(no_ckpt_dir):
    spark = no_ckpt_dir
    df = spark.range(0, 500).withColumn("v", F.col("id") + 1)
    p = pin(df, eager=True)
    rdd = p._jdf.queryExecution().analyzed().rdd()
    assert rdd.getStorageLevel().isValid()  # blocks held
    unpin(p)
    assert not rdd.getStorageLevel().isValid()  # storage released


def test_unpin_is_noop_on_non_pinned_frames(spark):
    df = spark.range(0, 5).select(F.col("id").alias("x"))
    unpin(df)  # plan root is not a LogicalRDD: silent no-op
    assert df.count() == 5


def test_bm25_fit_update_releases_previous_generation(no_ckpt_dir):
    """ADVICE r12 item 1: fit_update must not accumulate superseded
    postings generations. The old pin's storage is released once the new
    generation is materialized, and search results still equal a scratch
    fit over the union."""
    spark = no_ckpt_dir
    from systems_spark.operators.bm25 import BM25

    rows = [(i, f"tok{i % 7} tok{i % 3} common") for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    a = docs.where(F.col("doc_id") % 2 == 0)
    b = docs.where(F.col("doc_id") % 2 == 1)
    queries = spark.createDataFrame([(1, "tok1 common")],
                                    "query_id long, query_text string")

    bm = BM25().fit(a)
    bm.search(queries).collect()  # materialize generation 0
    gen0 = bm._postings._jdf.queryExecution().analyzed().rdd()
    assert gen0.getStorageLevel().isValid()
    bm.fit_update(b)
    assert not gen0.getStorageLevel().isValid(), \
        "superseded postings generation still holds executor storage"
    got = [(r["query_id"], r["doc_id"], r["rank"], r["score_micros"])
           for r in bm.search(queries).collect()]
    want = [(r["query_id"], r["doc_id"], r["rank"], r["score_micros"])
            for r in BM25().fit(docs).search(queries).collect()]
    assert got == want
