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


def test_windowed_funnel(spark):
    rows = [(1, "view", 0, 1), (1, "click", 5, 2), (1, "purchase", 100, 3),
            (2, "view", 0, 4), (2, "click", 5, 5), (2, "purchase", 10, 6)]
    got = {(r.step, r.step_name): r.users
           for r in funnel_summary(_ev(spark, rows),
                                   ("view", "click", "purchase"),
                                   within_us=20).collect()}
    # u1's purchase is 95us after the click anchor -> outside the window
    assert got == {(1, "view"): 2, (2, "click"): 2, (3, "purchase"): 1}


def test_windowed_funnel_matches_oracle(spark):
    import duckdb

    from systems_spark.operators.funnel import funnel_summary_sql

    rows = [(u, t, ts, i) for i, (u, t, ts) in enumerate([
        (1, "view", 0), (1, "click", 1), (1, "click", 9), (1, "purchase", 15),
        (2, "view", 0), (2, "click", 3), (2, "purchase", 10),
    ])]
    got = sorted(map(tuple, funnel_summary(
        _ev(spark, rows), ("view", "click", "purchase"),
        within_us=10).collect()))
    vals = ",".join(f"({u},'{t}',{ts},{i})" for u, t, ts, i in rows)
    want = sorted(map(tuple, duckdb.connect().execute(funnel_summary_sql(
        f"SELECT * FROM (VALUES {vals}) "
        f"t(user_id, event_type, ts_us, event_id)",
        ("view", "click", "purchase"), within_us=10)).fetchall()))
    assert got == want
    # greedy semantics pinned: u1 anchors click@1, purchase@15 missed
    assert (3, "purchase", 1) in got


def test_column_pruning_reaches_scan(spark):
    """Plan quality: the funnel's step-1 scan needs only (user, type) —
    Catalyst prunes the unused min-key — and no stage reads more than
    the four funnel columns; user_retention reads only (ts, user_id);
    substring_dedup only (doc_id, text)."""
    import re

    import __spark_entry__ as entry

    def schemas(name):
        df = entry.queries()[name](spark, "/root/testdata/sf0.001")
        plan = df._jdf.queryExecution().executedPlan().toString()
        return set(re.findall(r"ReadSchema: (\S+)", plan))

    assert schemas("substring_dedup") == {"struct<doc_id:bigint,text:string>"}
    assert schemas("user_retention") == {"struct<ts:timestamp_ntz,user_id:bigint>"}
    # funnel: the graded query pins steps behind lazy localCheckpoints
    # (cache_steps default), which hides the scans from the final plan —
    # check pruning on the un-pinned library mode instead
    from systems_spark.sources import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events").select(
        "user_id", "event_type",
        __import__("pyspark").sql.functions.expr("ts div 1000").alias("ts_us"),
        "event_id")
    from systems_spark.operators.funnel import funnel_summary

    df = funnel_summary(ev, ("view", "click", "purchase"), cache_steps=False)
    plan = df._jdf.queryExecution().executedPlan().toString()
    fu = set(re.findall(r"ReadSchema: (\S+)", plan))
    assert fu  # scans visible without the checkpoint pins
    assert all("props" not in s and "value" not in s for s in fu)


def _brute_funnel(rows, steps, within=None):
    """Greedy first-completion reference."""
    by_user = {}
    for u, typ, ts, i in rows:
        by_user.setdefault(u, []).append((ts, i, typ))
    out = set()
    for u, evs in by_user.items():
        evs.sort()
        cur, a = 0, (-1, -1)
        for ts, i, typ in evs:
            if cur >= len(steps) or typ != steps[cur]:
                continue
            # events scan in ascending (ts, i) order, so "strictly after
            # the anchor" holds by construction; only the window needs a check
            if cur > 0 and within is not None and ts > a[0] + within:
                continue
            cur += 1
            a = (ts, i)
            out.add((u, cur, steps[cur - 1], ts, i))
    return out


from hypothesis import given, settings
from hypothesis import strategies as st

_etypes = st.sampled_from(["view", "click", "purchase", "error"])


@settings(max_examples=8, deadline=None)
@given(evs=st.lists(st.tuples(st.integers(1, 4), _etypes,
                              st.integers(0, 20)),
                    min_size=1, max_size=40),
       within=st.sampled_from([None, 3, 8]))
def test_funnel_matches_bruteforce(spark, evs, within):
    rows = [(u, t, ts, i) for i, (u, t, ts) in enumerate(evs)]
    got = {(r.user_id, r.step, r.step_name, r.ts_us, r.event_id)
           for r in funnel(_ev(spark, rows), ("view", "click", "purchase"),
                           within_us=within).collect()}
    assert got == _brute_funnel(rows, ("view", "click", "purchase"), within)


# --- mode='exists' (VERDICT r5 item 7) -----------------------------------


def _brute_exists(rows, steps, within=None):
    """Independent reference: EXHAUSTIVE chain enumeration (recursive,
    no DP shortcuts) — for each user and prefix length n, the min final
    (ts, id) over every chain e1<...<en of the right types with all
    consecutive gaps <= within."""
    by_user = {}
    for u, typ, ts, i in rows:
        by_user.setdefault(u, []).append((ts, i, typ))
    out = set()
    for u, evs in by_user.items():
        for n in range(1, len(steps) + 1):
            best = None

            def rec(step, prev):
                nonlocal best
                for ts, i, typ in evs:
                    if typ != steps[step]:
                        continue
                    if prev is not None:
                        if (ts, i) <= prev:
                            continue
                        if within is not None and ts > prev[0] + within:
                            continue
                    if step == n - 1:
                        if best is None or (ts, i) < best:
                            best = (ts, i)
                    else:
                        rec(step + 1, (ts, i))

            rec(0, None)
            if best is not None:
                out.add((u, n, steps[n - 1], best[0], best[1]))
    return out


def test_exists_finds_chain_greedy_misses(spark):
    """The docstring's own example: view@0, clicks@1 and @9, purchase@15,
    window 10 — greedy anchors click@1 and misses; exists finds the
    click@9 chain."""
    rows = [(1, "view", 0, 1), (1, "click", 1, 2), (1, "click", 9, 3),
            (1, "purchase", 15, 4)]
    greedy = {r.step for r in funnel(
        _ev(spark, rows), ("view", "click", "purchase"),
        within_us=10).collect()}
    exists = {(r.step, r.ts_us, r.event_id) for r in funnel(
        _ev(spark, rows), ("view", "click", "purchase"),
        within_us=10, mode="exists").collect()}
    assert greedy == {1, 2}
    assert exists == {(1, 0, 1), (2, 1, 2), (3, 15, 4)}


@settings(max_examples=8, deadline=None)
@given(evs=st.lists(st.tuples(st.integers(1, 3), _etypes,
                              st.integers(0, 20)),
                    min_size=1, max_size=24),
       within=st.sampled_from([None, 3, 8]))
def test_exists_matches_exhaustive_bruteforce(spark, evs, within):
    rows = [(u, t, ts, i) for i, (u, t, ts) in enumerate(evs)]
    got = {(r.user_id, r.step, r.step_name, r.ts_us, r.event_id)
           for r in funnel(_ev(spark, rows), ("view", "click", "purchase"),
                           within_us=within, mode="exists").collect()}
    assert got == _brute_exists(rows, ("view", "click", "purchase"), within)


@settings(max_examples=6, deadline=None)
@given(evs=st.lists(st.tuples(st.integers(1, 3), _etypes,
                              st.integers(0, 20)),
                    min_size=1, max_size=30))
def test_exists_equals_greedy_when_unwindowed(spark, evs):
    """Without a window, earliest-subsequence greediness is complete:
    the two modes agree row-for-row."""
    rows = [(u, t, ts, i) for i, (u, t, ts) in enumerate(evs)]
    key = lambda r: (r.user_id, r.step, r.step_name, r.ts_us, r.event_id)
    g = {key(r) for r in funnel(
        _ev(spark, rows), ("view", "click", "purchase")).collect()}
    e = {key(r) for r in funnel(
        _ev(spark, rows), ("view", "click", "purchase"),
        mode="exists").collect()}
    assert g == e


def test_exists_with_repeated_step_types(spark):
    """Review r6: a funnel with the SAME type at consecutive steps
    (view → click → click) must chain two DISTINCT click events, never
    one click with itself."""
    rows = [(1, "view", 0, 1), (1, "click", 1, 2), (1, "click", 2, 3),
            (2, "view", 0, 4), (2, "click", 1, 5)]  # only ONE click
    got = {(r.user_id, r.step, r.event_id) for r in funnel(
        _ev(spark, rows), ("view", "click", "click"),
        mode="exists").collect()}
    assert got == {(1, 1, 1), (1, 2, 2), (1, 3, 3),
                   (2, 1, 4), (2, 2, 5)}
    # and it still agrees with greedy when unwindowed
    greedy = {(r.user_id, r.step, r.event_id) for r in funnel(
        _ev(spark, rows), ("view", "click", "click")).collect()}
    assert got == greedy


def test_exists_preserves_user_column_type(spark):
    """Review r6: exists mode must not assume a long user column."""
    rows = [("u-1", "view", 0, 1), ("u-1", "click", 5, 2)]
    ev = spark.createDataFrame(
        rows, "user_id string, event_type string, ts_us long, event_id long")
    got = {(r.user_id, r.step) for r in funnel(
        ev, ("view", "click"), mode="exists").collect()}
    assert got == {("u-1", 1), ("u-1", 2)}


def test_mode_validation_and_sql_escaping(spark):
    import duckdb

    from systems_spark.operators.funnel import funnel_summary_sql

    with pytest.raises(ValueError):
        funnel(_ev(spark, [(1, "view", 1, 1)]), ("view", "click"),
               mode="bogus")
    # a step name with an apostrophe must produce valid, correct SQL
    rows = [(1, "add'l", 0, 1), (1, "buy", 5, 2)]
    vals = ",".join(f"({u},'{t.replace(chr(39), chr(39) * 2)}',{ts},{i})"
                    for u, t, ts, i in rows)
    got = duckdb.connect().execute(funnel_summary_sql(
        f"SELECT * FROM (VALUES {vals}) t(user_id, event_type, ts_us, event_id)",
        ("add'l", "buy"))).fetchall()
    assert sorted(got) == [(1, "add'l", 1), (2, "buy", 1)]
