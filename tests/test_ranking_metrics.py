"""ranking_metrics semantics on hand-built prediction/truth tables."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from systems_spark.functions.ranking import ranking_metrics, summarize_ranking

M = 1_000_000


def _frames(spark):
    truth = spark.createDataFrame(
        # q1: truth {1,2,3}; q2: truth {4,5}; q3: truth {6}
        [(1, 1, 1), (1, 2, 2), (1, 3, 3), (2, 4, 1), (2, 5, 2), (3, 6, 1)],
        "query_id long, item_id long, ann_rank long")
    pred = spark.createDataFrame(
        # q1 retrieves 2 of 3 (first hit at rank 2); q2 retrieves 0 of 2;
        # q3 retrieves its single truth item at rank 1
        [(1, 9, 1), (1, 2, 2), (1, 3, 3), (2, 8, 1), (2, 9, 2), (3, 6, 1)],
        "query_id long, item_id long, ann_rank long")
    return pred, truth


def test_per_query_metrics(spark):
    pred, truth = _frames(spark)
    got = {r.query_id: r for r in ranking_metrics(pred, truth).collect()}
    assert (got[1].n_truth, got[1].n_hits) == (3, 2)
    assert got[1].recall_micros == 2 * M // 3
    assert got[1].mrr_micros == M // 2
    assert (got[2].n_hits, got[2].recall_micros, got[2].mrr_micros) == (0, 0, 0)
    assert (got[3].recall_micros, got[3].mrr_micros) == (M, M)


def test_query_missing_from_pred_scores_zero(spark):
    pred, truth = _frames(spark)
    got = {r.query_id: r
           for r in ranking_metrics(pred.where("query_id != 2"), truth).collect()}
    assert 2 in got and got[2].recall_micros == 0 and got[2].mrr_micros == 0


def test_duplicate_rows_cannot_inflate_recall(spark):
    # a multi-probe retriever emitting the same candidate from several
    # tables must not report recall > 100%
    truth = spark.createDataFrame([(1, 1, 1), (1, 1, 1)],
                                  "query_id long, item_id long, ann_rank long")
    pred = spark.createDataFrame([(1, 1, 2), (1, 1, 3), (1, 9, 1)],
                                 "query_id long, item_id long, ann_rank long")
    got = ranking_metrics(pred, truth).collect()[0]
    assert (got.n_truth, got.n_hits) == (1, 1)
    assert got.recall_micros == M
    assert got.mrr_micros == M // 2  # first DISTINCT hit rank


def test_summary_rollup_is_integer_mean(spark):
    pred, truth = _frames(spark)
    per_q = ranking_metrics(pred, truth)
    s = summarize_ranking(per_q).collect()[0]
    vals = {r.query_id: r.recall_micros for r in per_q.collect()}
    assert s.n_queries == 3
    assert s.mean_recall_micros == sum(vals.values()) // 3
