"""Funnel analysis (operators/funnel.py)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from systems_spark.operators.funnel import funnel, funnel_summary


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, event_type string, ts_us long, event_id long")


def test_strict_ordering_and_counts(spark):
    rows = [
        # u1 completes the full funnel in order
        (1, "view", 100, 1), (1, "click", 200, 2), (1, "purchase", 300, 3),
        # u2 clicks BEFORE viewing: click must not count, then clicks again
        (2, "click", 50, 4), (2, "view", 100, 5), (2, "click", 150, 6),
        # u3 views only
        (3, "view", 10, 7),
        # u4 purchase first, never completes view->click
        (4, "purchase", 5, 8), (4, "view", 10, 9),
    ]
    got = {(r.step, r.step_name): r.users
           for r in funnel_summary(_ev(spark, rows),
                                   ("view", "click", "purchase")).collect()}
    assert got == {(1, "view"): 4, (2, "click"): 2, (3, "purchase"): 1}


def test_tie_breaks_on_event_id(spark):
    # same timestamp: (ts, id) order decides "strictly after"
    rows = [(1, "view", 100, 10), (1, "click", 100, 9),   # click BEFORE view
            (2, "view", 100, 1), (2, "click", 100, 2)]    # click after view
    got = {(r.user_id, r.step) for r in
           funnel(_ev(spark, rows), ("view", "click")).collect()}
    assert (2, 2) in got and (1, 2) not in got


def test_earliest_completion_is_picked(spark):
    rows = [(1, "view", 100, 1), (1, "click", 500, 2), (1, "click", 200, 3)]
    per = {r.step: (r.ts_us, r.event_id) for r in
           funnel(_ev(spark, rows), ("view", "click")).collect()}
    assert per[2] == (200, 3)


def test_validation(spark):
    with pytest.raises(ValueError):
        funnel(_ev(spark, [(1, "view", 1, 1)]), ("view",))
