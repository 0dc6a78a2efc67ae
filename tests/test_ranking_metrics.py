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


# --- NDCG@k (r6) ---------------------------------------------------------


def test_ndcg_hand_arithmetic(spark):
    from systems_spark.functions.ranking import _ndcg_discounts, ndcg_metrics

    d, prefix = _ndcg_discounts(5)
    pred = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3),     # q1: rel at ranks 1 and 3
         (2, 20, 1), (2, 21, 2),                 # q2: perfect (both rel)
         (3, 31, 4)],                            # q3: single rel at rank 4
        "query_id long, item_id long, ann_rank long")
    truth = spark.createDataFrame(
        [(1, 10), (1, 12), (2, 20), (2, 21), (3, 31), (4, 40)],
        "query_id long, item_id long")
    got = {r.query_id: (r.dcg_micros, r.idcg_micros, r.ndcg_micros)
           for r in ndcg_metrics(pred, truth, k=5).collect()}
    M = 1_000_000
    assert got[1] == (d[0] + d[2], prefix[1], (d[0] + d[2]) * M // prefix[1])
    assert got[2] == (prefix[1], prefix[1], M)          # perfect → exactly 1e6
    assert got[3] == (d[3], prefix[0], d[3] * M // prefix[0])
    assert got[4] == (0, prefix[0], 0)                  # nothing retrieved


def test_ndcg_truth_larger_than_k_and_rank_beyond_k(spark):
    from systems_spark.functions.ranking import _ndcg_discounts, ndcg_metrics

    d, prefix = _ndcg_discounts(2)
    pred = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 3)],  # second hit OUTSIDE k=2: must not count
        "query_id long, item_id long, ann_rank long")
    truth = spark.createDataFrame(
        [(1, 10), (1, 11), (1, 12)],  # |truth|=3 > k → IDCG = prefix[k]
        "query_id long, item_id long")
    r = ndcg_metrics(pred, truth, k=2).collect()[0]
    assert (r.dcg_micros, r.idcg_micros) == (d[0], prefix[1])


def test_ndcg_matches_duckdb(spark):
    import duckdb

    from systems_spark.functions.ranking import ndcg_metrics, ndcg_metrics_sql

    pred_rows = [(1, 10, 1), (1, 13, 2), (1, 12, 5), (2, 20, 2), (3, 30, 1)]
    truth_rows = [(1, 10), (1, 12), (1, 14), (2, 20), (2, 21), (4, 40)]
    pred = spark.createDataFrame(
        pred_rows, "query_id long, item_id long, ann_rank long")
    truth = spark.createDataFrame(truth_rows, "query_id long, item_id long")
    got = sorted(map(tuple, ndcg_metrics(pred, truth, k=5).collect()))
    pv = ",".join(f"({a},{b},{c})" for a, b, c in pred_rows)
    tv = ",".join(f"({a},{b})" for a, b in truth_rows)
    want = sorted(map(tuple, duckdb.connect().execute(ndcg_metrics_sql(
        f"SELECT * FROM (VALUES {pv}) t(query_id, item_id, ann_rank)",
        f"SELECT * FROM (VALUES {tv}) t(query_id, item_id)",
        k=5)).fetchall()))
    assert got == want


def test_ndcg_rejects_zero_based_ranks(spark):
    """Review r6: a 0-based rank feed must raise identically in both
    engines, not crash one and silently drop the best hit in the other."""
    import duckdb
    import pytest

    from systems_spark.functions.ranking import ndcg_metrics, ndcg_metrics_sql

    pred = spark.createDataFrame(
        [(1, 10, 0), (1, 11, 1)],
        "query_id long, item_id long, ann_rank long")
    truth = spark.createDataFrame([(1, 10)], "query_id long, item_id long")
    with pytest.raises(Exception, match="1-based"):
        ndcg_metrics(pred, truth, k=5).collect()
    with pytest.raises(Exception, match="1-based"):
        duckdb.connect().execute(ndcg_metrics_sql(
            "SELECT 1 AS query_id, 10 AS item_id, 0 AS ann_rank",
            "SELECT 1 AS query_id, 10 AS item_id", k=5)).fetchall()
