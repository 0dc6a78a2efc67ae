"""Item-item kNN (operators/item_knn.py) and SCD Type-2 intervals
(operators/scd.py)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from systems_spark.operators.item_knn import item_knn, item_knn_sql
from systems_spark.operators.scd import scd2_intervals, scd2_intervals_sql


def _baskets(spark, rows):
    return spark.createDataFrame(rows, "b long, i string")


def test_item_knn_hand_computed(spark):
    """cooc(a,b)=3, cooc(b,c)=2, cooc(a,c)=1 (pruned at min_cooc=2);
    n_a=3, n_b=4, n_c=2 → sim²(a,b)=9e6/12=750000,
    sim²(b,c)=4e6/8=500000."""
    rows = [(1, "a"), (1, "b"), (1, "c"),
            (2, "a"), (2, "b"),
            (3, "a"), (3, "b"),
            (4, "b"), (4, "c")]
    got = {(r.item, r.neighbor): (r.cooc, r.sim2_micros, r.rank)
           for r in item_knn(_baskets(spark, rows), "b", "i",
                             k=5, min_cooc=2).collect()}
    assert got == {
        ("a", "b"): (3, 750000, 1),
        ("b", "a"): (3, 750000, 1),
        ("b", "c"): (2, 500000, 2),
        ("c", "b"): (2, 500000, 1),
    }


def test_item_knn_duplicate_rows_deduped(spark):
    """Raw multiplicity must not inflate co-occurrence: the incidence is
    distinct (basket, item)."""
    rows = [(1, "a"), (1, "a"), (1, "b"), (2, "a"), (2, "b"), (2, "b")]
    got = {(r.item, r.neighbor): r.cooc
           for r in item_knn(_baskets(spark, rows), "b", "i",
                             k=3, min_cooc=2).collect()}
    assert got == {("a", "b"): 2, ("b", "a"): 2}


def test_item_knn_topk_tiebreak_and_k(spark):
    """Equal (sim², cooc) neighbors rank by neighbor id ascending, and
    k truncates deterministically."""
    # item x co-occurs twice with each of m1, m2, m3, all with the same
    # item frequencies → identical scores
    rows = []
    for b, m in enumerate(["m1", "m2", "m3", "m1", "m2", "m3"]):
        rows += [(b, "x"), (b, m)]
    out = [r.neighbor for r in item_knn(_baskets(spark, rows), "b", "i",
                                        k=2, min_cooc=2)
           .where("item = 'x'").orderBy("rank").collect()]
    assert out == ["m1", "m2"]


def test_item_knn_max_basket_size_cap(spark):
    """A whale basket is dropped BEFORE the self-join: capped output ==
    uncapped output on the corpus minus the whale."""
    normal = [(1, "a"), (1, "b"), (2, "a"), (2, "b")]
    whale = [(99, x) for x in ("a", "b", "c", "d", "e", "f")]
    capped = sorted(map(tuple, item_knn(
        _baskets(spark, normal + whale), "b", "i",
        k=5, min_cooc=1, max_basket_size=4).collect()))
    without = sorted(map(tuple, item_knn(
        _baskets(spark, normal), "b", "i", k=5, min_cooc=1).collect()))
    assert capped == without
    # generous cap == uncapped bit-for-bit
    gen = sorted(map(tuple, item_knn(
        _baskets(spark, normal + whale), "b", "i",
        k=5, min_cooc=1, max_basket_size=100).collect()))
    unc = sorted(map(tuple, item_knn(
        _baskets(spark, normal + whale), "b", "i",
        k=5, min_cooc=1).collect()))
    assert gen == unc


def test_item_knn_matches_duckdb(spark):
    import duckdb

    rows = [(b, f"i{(b * 7 + j) % 5}") for b in range(12) for j in range(3)]
    got = sorted(map(tuple, item_knn(
        _baskets(spark, rows), "b", "i", k=3, min_cooc=2).collect()))
    vals = ",".join(f"({b}, '{i}')" for b, i in rows)
    want = sorted(map(tuple, duckdb.connect().execute(item_knn_sql(
        f"SELECT * FROM (VALUES {vals}) t(b, i)", "b", "i",
        k=3, min_cooc=2)).fetchall()))
    assert got == want


def test_item_knn_validation(spark):
    df = _baskets(spark, [(1, "a")])
    with pytest.raises(ValueError):
        item_knn(df, "b", "i", k=0)
    with pytest.raises(ValueError):
        item_knn(df, "b", "i", min_cooc=0)
    with pytest.raises(ValueError):
        item_knn(df, "b", "i", max_basket_size=1)


# --- SCD Type-2 ----------------------------------------------------------


def _events(spark, rows):
    return spark.createDataFrame(rows, "u long, state string, ts long, id long")


def test_scd2_hand_computed(spark):
    """Consecutive equal states collapse into one version; valid_to
    chains to the next version's valid_from; last version is current.
    A state REVISITED after a gap opens a NEW version (type-2, not
    type-1 dedup)."""
    rows = [(1, "A", 10, 1), (1, "A", 20, 2), (1, "B", 30, 3),
            (1, "A", 40, 4), (2, "Z", 5, 5)]
    got = {(r.u, r.version): (r.state, r.valid_from, r.valid_to,
                              r.n_events, r.is_current)
           for r in scd2_intervals(_events(spark, rows), ["u"], "state",
                                   "ts", "id").collect()}
    assert got == {
        (1, 1): ("A", 10, 30, 2, 0),
        (1, 2): ("B", 30, 40, 1, 0),
        (1, 3): ("A", 40, None, 1, 1),
        (2, 1): ("Z", 5, None, 1, 1),
    }


def test_scd2_ts_tie_breaks_by_id(spark):
    """Two observations at the same ts order by id — deterministic
    versioning either way the shuffle lands."""
    rows = [(1, "A", 10, 2), (1, "B", 10, 1)]  # B first by id
    got = sorted((r.version, r.state)
                 for r in scd2_intervals(_events(spark, rows), ["u"],
                                         "state", "ts", "id").collect())
    assert got == [(1, "B"), (2, "A")]


def test_scd2_matches_duckdb(spark):
    import duckdb

    rows = [(u, "ABC"[(u * t + t * t) % 3], t * 10, u * 100 + t)
            for u in range(4) for t in range(8)]
    got = sorted(map(tuple, scd2_intervals(
        _events(spark, rows), ["u"], "state", "ts", "id").collect()))
    vals = ",".join(f"({u}, '{s}', {ts}, {i})" for u, s, ts, i in rows)
    want = sorted(map(tuple, duckdb.connect().execute(scd2_intervals_sql(
        f"SELECT * FROM (VALUES {vals}) t(u, state, ts, id)",
        ["u"], "state", "ts", "id")).fetchall()))
    assert got == want


def test_scd2_validation(spark):
    with pytest.raises(ValueError):
        scd2_intervals(_events(spark, [(1, "A", 1, 1)]), [], "state",
                       "ts", "id")


def test_scd2_null_states_are_real_states(spark):
    """Review: a NULL state is an observed state — NULL→'A' and
    'A'→NULL open versions, NULL→NULL collapses, and a leading NULL
    still opens version 1 (lag-of-constant first-row marker)."""
    rows = [(1, None, 10, 1), (1, None, 20, 2), (1, "A", 30, 3),
            (1, None, 40, 4)]
    ev = spark.createDataFrame(rows, "u long, state string, ts long, id long")
    got = {(r.u, r.version): (r.state, r.valid_from, r.valid_to,
                              r.n_events, r.is_current)
           for r in scd2_intervals(ev, ["u"], "state", "ts",
                                   "id").collect()}
    assert got == {
        (1, 1): (None, 10, 30, 2, 0),
        (1, 2): ("A", 30, 40, 1, 0),
        (1, 3): (None, 40, None, 1, 1),
    }
    # the SQL twin agrees
    import duckdb

    vals = ",".join(
        f"({u}, {'NULL' if s is None else repr(s)}, {ts}, {i})"
        for u, s, ts, i in rows)
    want = {(r[0], r[1]): tuple(r[2:])
            for r in duckdb.connect().execute(scd2_intervals_sql(
                f"SELECT * FROM (VALUES {vals}) t(u, state, ts, id)",
                ["u"], "state", "ts", "id")).fetchall()}
    assert want == got


def test_item_knn_sql_validation():
    with pytest.raises(ValueError):
        item_knn_sql("SELECT 1", "b", "i", k=0)
    with pytest.raises(ValueError):
        item_knn_sql("SELECT 1", "b", "i", min_cooc=0)
    with pytest.raises(ValueError):
        scd2_intervals_sql("SELECT 1", [], "state", "ts", "id")
