"""GlobalRank property tests: the distributed exact rank/ntile/quantile
operator must match the single-partition window forms row-for-row on
adversarial inputs — ties, nulls, skew, tiny/empty groups — and be stable
under re-execution (the repartitionByRange-nondeterminism failure mode it
was built to avoid)."""

import os
import sys

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from systems_spark.operators.global_rank import (
    GlobalRank,
    exact_quantiles,
    ntile_expr,
)

ROWS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),          # group
        st.one_of(st.none(), st.integers(-50, 50)),     # value (ties + nulls)
    ),
    min_size=1,
    max_size=60,
)


@settings(max_examples=6, deadline=None)
@given(rows=ROWS, k=st.integers(min_value=1, max_value=7))
def test_ntile_matches_window(spark, rows, k):
    data = [(i, g, v) for i, (g, v) in enumerate(rows)]
    df = spark.createDataFrame(data, "id long, g long, v long")
    w = Window.orderBy(F.col("v").asc_nulls_first(), F.col("id"))
    want = sorted(
        (r.id, r.b) for r in df.select("id", F.ntile(k).over(w).alias("b")).collect()
    )
    got = sorted(
        (r.id, r.b)
        for r in GlobalRank(["v", "id"], num_partitions=5)
        .with_ntile(df, k, "b").select("id", "b").collect()
    )
    assert got == want


@settings(max_examples=6, deadline=None)
@given(rows=ROWS)
def test_grouped_rank_matches_window(spark, rows):
    data = [(i, g, v) for i, (g, v) in enumerate(rows)]
    df = spark.createDataFrame(data, "id long, g long, v long")
    w = Window.partitionBy("g").orderBy(F.col("v").asc_nulls_first(), F.col("id"))
    want = sorted(
        (r.id, r.r) for r in df.select("id", F.row_number().over(w).alias("r")).collect()
    )
    gr = GlobalRank(["v", "id"], group_cols=["g"], rank_col="r", num_partitions=4)
    out = gr(df)
    got = sorted((r.id, r.r) for r in out.select("id", "r").collect())
    assert got == want
    # total_col is the true group size
    sizes = {r.g: r.grp_total for r in out.select("g", "grp_total").distinct().collect()}
    from collections import Counter

    want_sizes = Counter(g for _, (g, _) in zip(range(len(rows)), rows))
    assert sizes == dict(want_sizes)


def test_rank_stable_across_reexecutions(spark):
    """The SAME lazy output DataFrame must yield identical ranks when the
    plan executes twice (separate actions) — physical-partition-keyed
    bookkeeping would not (repartitionByRange samples new bounds per
    execution; see the operator docstring)."""
    df = spark.range(0, 5000).select(
        F.col("id"),
        (F.col("id") % 7).alias("g"),
        F.pmod(F.col("id") * 2654435761, F.lit(97)).alias("v"),
    )
    out = GlobalRank(["v", "id"], group_cols=["g"], rank_col="r")(df).select("id", "r")
    first = sorted(map(tuple, out.collect()))
    second = sorted(map(tuple, out.orderBy("r").collect()))
    assert first == second


def test_quantiles_match_percentile(spark):
    """exact_quantiles == Spark's exact percentile (and therefore DuckDB
    quantile_cont, proven separately by the driver oracle) at 6dp."""
    df = spark.range(0, 4000).select(
        (F.col("id") % 5).cast("string").alias("g"),
        (F.pmod(F.col("id") * 48271, F.lit(10007)) / 10.0).alias("v"),
    )
    want = {
        (r.g, round(r.p5, 6), round(r.p95, 6))
        for r in df.groupBy("g").agg(
            F.expr("percentile(v, 0.5)").alias("p5"),
            F.expr("percentile(v, 0.95)").alias("p95"),
        ).collect()
    }
    q = exact_quantiles(df, "v", [0.5, 0.95], group_cols=["g"])
    got = {
        (r.g, round(r.p5, 6), round(r.p95, 6))
        for r in q.collect()
    }
    assert got == want


def test_approx_quantiles_within_rank_error(spark):
    """approx_quantiles (GK sketch, one aggregation) lands within its
    advertised rank-error envelope of the exact statistic: with
    accuracy=A the returned value's true rank is within n/A of p·n, so
    it must lie between the exact (p±2/A) quantiles. Also: plan shape is
    a single aggregation — no bucket pass, no semi-join, no window."""
    from systems_spark.operators import approx_quantiles
    from systems_spark.operators.global_rank import _p_label

    df = spark.range(0, 20000).select(
        (F.col("id") % 4).cast("string").alias("g"),
        (F.pmod(F.col("id") * 48271, F.lit(100003)) / 10.0).alias("v"),
    )
    acc = 1000
    ps = [0.25, 0.5, 0.9]
    eps = 2.0 / acc
    lo = exact_quantiles(df, "v", [max(p - eps, 0.0) for p in ps],
                         group_cols=["g"])
    hi = exact_quantiles(df, "v", [min(p + eps, 1.0) for p in ps],
                         group_cols=["g"])
    approx = approx_quantiles(df, "v", ps, group_cols=["g"], accuracy=acc)

    label = _p_label
    lo_m = {r.g: r for r in lo.collect()}
    hi_m = {r.g: r for r in hi.collect()}
    for r in approx.collect():
        for p in ps:
            v = r[label(p)]
            assert lo_m[r.g][label(max(p - eps, 0.0))] <= v <= \
                hi_m[r.g][label(min(p + eps, 1.0))], (r.g, p, v)

    # one aggregation, no window/join stages
    from systems_spark.plans import formatted_plan
    plan = formatted_plan(approx)
    assert "Window" not in plan and "Join" not in plan
    # groupless form returns a single global row
    assert approx_quantiles(df, "v", [0.5]).count() == 1
    # endpoint labels must not collide: 0.1 → p1, 1.0 → p100, 0.0 → p0
    cols = approx_quantiles(df, "v", [0.0, 0.1, 1.0]).columns
    assert cols == ["p0", "p1", "p100"], cols


def test_string_order_key_fallback(spark, tables):
    """Non-numeric first order key uses the seeded-sample bucketing path;
    ranks must still be an exact permutation matching the window."""
    c = tables["customer"].select("c_custkey", "c_mktsegment").limit(400)
    w = Window.orderBy("c_mktsegment", "c_custkey")
    want = sorted(
        (r.c_custkey, r.r)
        for r in c.select("c_custkey", F.row_number().over(w).alias("r")).collect()
    )
    got = sorted(
        (r.c_custkey, r.r)
        for r in GlobalRank(["c_mktsegment", "c_custkey"], rank_col="r",
                            num_partitions=6)(c).select("c_custkey", "r").collect()
    )
    assert got == want


def test_empty_input(spark):
    df = spark.createDataFrame([], "g long, v long")
    out = GlobalRank(["v"], group_cols=["g"])(df)
    assert out.count() == 0
    assert exact_quantiles(df, "v", [0.5], group_cols=["g"]).count() == 0


def test_high_cardinality_group_guard(spark):
    """group_cols with ~unique keys would collect n_buckets x #groups rows
    to the driver — the guard raises with the Window.partitionBy pointer
    instead of OOMing (the LIMIT caps what reaches the driver)."""
    import pytest

    df = spark.range(500).select(
        F.col("id").alias("g"), (F.col("id") % 7).alias("v")
    )
    with pytest.raises(ValueError, match="Window.partitionBy"):
        GlobalRank(["v"], group_cols=["g"], max_layout_rows=100)(df).count()
    # few huge groups (the intended regime) still works under the same bound
    ok = spark.range(500).select((F.col("id") % 3).alias("g"),
                                 (F.col("id") % 7).alias("v"))
    assert GlobalRank(["v"], group_cols=["g"], max_layout_rows=100,
                      num_partitions=8)(ok).count() == 500


def test_grouped_rank_matches_global_rank(spark, tables):
    """The many-small-groups twin produces the same (rank, total) contract
    as GlobalRank on the same frame."""
    from systems_spark.operators import grouped_rank

    c = tables["customer"].select("c_custkey", "c_nationkey", "c_acctbal").limit(500)
    a = sorted(
        (r.c_custkey, r.rank, r.grp_total)
        for r in GlobalRank(["c_acctbal", "c_custkey"], group_cols=["c_nationkey"],
                            num_partitions=6)(c).collect()
    )
    b = sorted(
        (r.c_custkey, r.rank, r.grp_total)
        for r in grouped_rank(c, ["c_acctbal", "c_custkey"], ["c_nationkey"]).collect()
    )
    assert a == b
    with pytest.raises(ValueError, match="group_cols"):
        grouped_rank(c, ["c_acctbal"], [])
