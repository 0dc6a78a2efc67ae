"""Reciprocal-rank fusion semantics on hand-built rankings."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from systems_spark.functions.ranking import rrf_fuse

M = 1_000_000


def _df(spark, rows):
    return spark.createDataFrame(rows, "query_id long, doc_id long, rank long")


def test_fusion_matches_hand_arithmetic(spark):
    a = _df(spark, [(1, 10, 1), (1, 11, 2), (1, 12, 3)])
    b = _df(spark, [(1, 11, 1), (1, 13, 2), (1, 10, 3)])
    got = {r.doc_id: (r.rank, r.rrf_micros)
           for r in rrf_fuse([a, b], k=60).collect()}
    exp = {
        10: M // 61 + M // 63,
        11: M // 62 + M // 61,
        12: M // 63,
        13: M // 62,
    }
    assert {d: s for d, (_, s) in got.items()} == exp
    # both-list docs outrank single-list docs; ties break by doc_id
    order = [d for d, _ in sorted(got.items(), key=lambda kv: kv[1][0])]
    assert order == sorted(exp, key=lambda d: (-exp[d], d))


def test_item_in_one_list_still_fused(spark):
    a = _df(spark, [(1, 10, 1)])
    b = _df(spark, [(1, 99, 1)])
    got = {r.doc_id: r.rrf_micros for r in rrf_fuse([a, b]).collect()}
    assert got == {10: M // 61, 99: M // 61}


def test_topk_and_validation(spark):
    a = _df(spark, [(1, d, d) for d in range(1, 30)])
    assert rrf_fuse([a], topk=7).count() == 7
    with pytest.raises(ValueError):
        rrf_fuse([])
