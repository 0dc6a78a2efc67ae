"""Disjointness guards on the incremental dedup entry points (VERDICT r7
item 8): a batch re-offering a known id must raise, per family, and the
label-uniqueness invariant must be enforced in incremental_components."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from systems_spark.dedup import (EmbeddingDedup, MinHashDedup, SimHashDedup,
                                 incremental_components)
from systems_spark.dedup.winnow import winnow_fingerprints, winnow_incremental_pairs


def _docs(spark, ids):
    return spark.createDataFrame(
        [(i, f"the quick brown fox jumps over the lazy dog {i % 3}")
         for i in ids], "doc_id long, text string")


def test_minhash_incremental_rejects_overlapping_ids(spark):
    mh = MinHashDedup(threshold=0.3)
    corpus = mh.signatures(_docs(spark, range(10)))
    batch = mh.signatures(_docs(spark, [5, 100]))  # 5 re-offered
    with pytest.raises(ValueError, match="disjoint.*\\[5\\]"):
        mh.incremental_pairs(corpus, batch).collect()
    # opt-out path still runs
    mh.incremental_pairs(corpus, batch, check_disjoint=False).collect()


def test_simhash_incremental_rejects_overlapping_ids(spark):
    sh = SimHashDedup(max_hamming=3)
    corpus = sh.signatures(_docs(spark, range(8)), nonempty_only=True)
    batch = sh.signatures(_docs(spark, [3]), nonempty_only=True)
    with pytest.raises(ValueError, match="disjoint"):
        sh.incremental_pairs(corpus, batch).collect()
    sh.incremental_pairs(corpus, batch, check_disjoint=False).collect()


def test_embedding_incremental_rejects_overlapping_ids(spark):
    op = EmbeddingDedup(threshold=0.3, strategy="lsh", dim=4,
                        id_col="vec_id", vec_col="embedding")
    mk = lambda ids: spark.createDataFrame(
        [(i, [float(i % 2), 1.0, 0.5, 0.25]) for i in ids],
        "vec_id long, embedding array<float>")
    with pytest.raises(ValueError, match="disjoint"):
        op.incremental_pairs(op.signatures(mk(range(6))),
                             op.signatures(mk([2, 50]))).collect()
    op.incremental_pairs(op.signatures(mk(range(6))),
                         op.signatures(mk([2, 50])),
                         check_disjoint=False).collect()


def test_winnow_incremental_rejects_overlapping_ids(spark):
    corpus = _docs(spark, range(6))
    fps = winnow_fingerprints(corpus, k=4, w=4)
    with pytest.raises(ValueError, match="disjoint"):
        winnow_incremental_pairs(fps, _docs(spark, [1, 99]),
                                 k=4, w=4).collect()
    winnow_incremental_pairs(fps, _docs(spark, [1, 99]), k=4, w=4,
                             check_disjoint=False).collect()


def test_incremental_components_rejects_duplicated_labels(spark):
    labels = spark.createDataFrame(
        [(1, 1), (2, 1), (2, 2), (3, 3)], "node long, component long")
    pairs = spark.createDataFrame([(3, 4)], "a long, b long")
    with pytest.raises(ValueError, match="one row per node"):
        incremental_components(labels, pairs).collect()
    # clean labels pass, and opt-out skips the agg entirely
    clean = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 3)], "node long, component long")
    out = {(r["node"], r["component"])
           for r in incremental_components(clean, pairs).collect()}
    assert out == {(1, 1), (2, 1), (3, 3), (4, 3)}
    incremental_components(clean, pairs, check_labels=False).collect()
