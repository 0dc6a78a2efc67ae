"""Fitted quantile binning (operators/binning.py)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from systems_spark.operators import QuantileBin


def _vals(spark, xs):
    return spark.createDataFrame([(i, x) for i, x in enumerate(xs)],
                                 "id long, v double")


def test_deciles_on_uniform_values(spark):
    """0..99 in deciles: ten clean bins of ten, edges at the
    interpolated 10th/20th/... percentiles."""
    df = _vals(spark, [float(x) for x in range(100)])
    op = QuantileBin("v", n_bins=10).fit(df)
    got = {r.id: r.v_bin for r in op.transform(df).collect()}
    edges = op.edges_micros["v"]
    assert len(edges) == 9
    for i in range(100):
        want = sum(1 for e in edges if i * 1_000_000 > e)
        assert got[i] == want
    assert got[0] == 0 and got[99] == 9
    assert sorted(set(got.values())) == list(range(10))


def test_serve_split_new_data_and_nulls(spark):
    """Fit on train, transform NEW values: out-of-range clamps to the
    extreme bins, NULL stays NULL — the fit/serve split ntile can't do."""
    train = _vals(spark, [float(x) for x in range(100)])
    op = QuantileBin("v", n_bins=4).fit(train)
    serve = spark.createDataFrame(
        [(1, -50.0), (2, 12.0), (3, 950.0), (4, None)],
        "id long, v double")
    got = {r.id: r.v_bin for r in op.transform(serve).collect()}
    assert got[1] == 0 and got[3] == 3 and got[4] is None
    assert 0 <= got[2] <= 1


def test_pipeline_roundtrip_preserves_edges(spark, tmp_path):
    from systems_spark.pipeline import Pipeline

    df = _vals(spark, [float(x) for x in range(50)])
    pipe = Pipeline([QuantileBin("v", n_bins=5)]).fit(df)
    before = sorted(map(tuple, pipe.transform(df).collect()))
    path = str(tmp_path / "qbin_pipe")
    pipe.save(path)
    loaded = Pipeline.load(path, spark=spark)
    after = sorted(map(tuple, loaded.transform(df).collect()))
    assert before == after
    assert loaded.operators[0].edges_micros == pipe.operators[0].edges_micros


def test_matches_duckdb_via_sql_expr(spark):
    import duckdb

    xs = [1.5, 2.25, 3.0, 3.0, 7.125, 10.0, 42.5, 42.5, 99.0, -4.25]
    df = _vals(spark, xs)
    op = QuantileBin("v", n_bins=4).fit(df)
    got = sorted((r.id, r.v_bin) for r in op.transform(df).collect())
    vals = ",".join(f"({i}, {x!r})" for i, x in enumerate(xs))
    want = sorted(map(tuple, duckdb.connect().execute(
        f"SELECT id, {op.sql_bin_expr('v')} AS v_bin "
        f"FROM (VALUES {vals}) t(id, v) ORDER BY id").fetchall()))
    assert got == want


def test_validation(spark):
    with pytest.raises(ValueError):
        QuantileBin("v", n_bins=1)
    df = _vals(spark, [1.0])
    with pytest.raises(RuntimeError):
        QuantileBin("v").transform(df)


def test_fit_on_all_null_column_raises(spark):
    """Review r6: a zero-edge fit would silently bin everything to 0."""
    df = spark.createDataFrame([(1, None), (2, None)], "id long, v double")
    with pytest.raises(ValueError, match="no non-NULL"):
        QuantileBin("v", n_bins=4).fit(df)


def test_value_equal_to_edge_bins_low(spark):
    """The documented tie rule holds by exact integer comparison even
    for non-dyadic edge values like 9.9 (review r6: the unquantized
    float compare binned edge-equal values HIGH)."""
    xs = [0.0, 9.9, 9.9, 9.9, 20.0, 30.0, 40.0, 50.0]
    df = _vals(spark, xs)
    op = QuantileBin("v", n_bins=2).fit(df)
    [edge] = op.edges_micros["v"]
    got = {r.id: r.v_bin for r in op.transform(df).collect()}
    import math
    for i, x in enumerate(xs):
        assert got[i] == (1 if math.floor(x * 1e6 + 0.5) > edge else 0)
