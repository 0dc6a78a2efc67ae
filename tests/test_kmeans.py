"""KMeansMicros: exact-integer Lloyd training vs a pure-Python
reference and the DuckDB twin; assignment argmin; emptied-cluster
carry; validation."""

import os
import random
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from systems_spark.operators.kmeans import KMeansMicros, kmeans_oracle_sql

SCALE = 1_000_000


def _tdiv(s, n):
    return s // n if s >= 0 else -((-s) // n)


def _f32(x):
    import struct
    return struct.unpack("f", struct.pack("f", x))[0]


def _py_kmeans(rows, k, iters):
    # replicate the column's float32 storage before quantizing — the
    # Spark/DuckDB side reads array<float>
    pts = {i: [int(round(_f32(x) * SCALE)) for x in v] for i, v in rows}
    cents = {i: list(pts[i]) for i in sorted(pts)[:k]}
    for _ in range(iters):
        groups = {}
        for i in sorted(pts):
            v = pts[i]
            best = min(
                cents.items(),
                key=lambda c: (sum((a - b) ** 2 for a, b in zip(v, c[1])),
                               c[0]))[0]
            groups.setdefault(best, []).append(v)
        for cid in cents:
            g = groups.get(cid)
            if g:
                cents[cid] = [_tdiv(sum(col), len(g))
                              for col in zip(*g)]
    return cents


def _rows(n, d, seed):
    rnd = random.Random(seed)
    return [(i, [float(rnd.gauss(0, 1)) for _ in range(d)])
            for i in range(n)]


def test_centroids_match_python_reference(spark):
    rows = _rows(60, 5, 3)
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    km = KMeansMicros(k=4, iters=3).fit(df)
    got = {}
    for r in km.centroid_table().collect():
        got.setdefault(r.cluster, {})[r.pos] = r.value_micros
    got = {c: [v[i] for i in range(len(v))] for c, v in got.items()}
    assert got == _py_kmeans(rows, 4, 3)


def test_matches_duckdb_twin(spark):
    import duckdb

    rows = _rows(80, 6, 9)
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = sorted(tuple(r) for r in
                 KMeansMicros(k=5, iters=2).fit(df)
                 .centroid_table().collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE emb (vec_id BIGINT, embedding FLOAT[])")
    con.executemany("INSERT INTO emb VALUES (?, ?)", rows)
    want = sorted(tuple(r) for r in con.execute(
        kmeans_oracle_sql("emb", "vec_id", "embedding",
                          k=5, iters=2)).fetchall())
    assert got == want


def test_assign_is_exact_argmin(spark):
    rows = _rows(40, 4, 5)
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    km = KMeansMicros(k=3, iters=2).fit(df)
    cents = _py_kmeans(rows, 3, 2)
    got = {r.vec_id: r.cluster
           for r in km.assign(df).select("vec_id", "cluster").collect()}
    for i, v in rows:
        vm = [int(round(_f32(x) * SCALE)) for x in v]
        want = min(cents.items(),
                   key=lambda c: (sum((a - b) ** 2
                                      for a, b in zip(vm, c[1])), c[0]))[0]
        assert got[i] == want


def test_emptied_cluster_keeps_previous_centroid(spark):
    # two tight groups far apart, k=3: the third seed (inside group A)
    # empties after round 1 and must carry its centroid forward
    rows = [(0, [0.0, 0.0]), (1, [0.1, 0.0]), (2, [0.05, 0.05]),
            (10, [100.0, 100.0]), (11, [100.1, 100.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    km = KMeansMicros(k=3, iters=3).fit(df)
    got = {}
    for r in km.centroid_table().collect():
        got.setdefault(r.cluster, {})[r.pos] = r.value_micros
    want = _py_kmeans(rows, 3, 3)
    assert {c: [v[i] for i in range(len(v))]
            for c, v in got.items()} == want
    assert len(got) == 3


def test_validation(spark):
    with pytest.raises(ValueError, match="k must"):
        KMeansMicros(k=0)
    with pytest.raises(ValueError, match="iters"):
        KMeansMicros(iters=-1)
    with pytest.raises(ValueError, match="fit"):
        KMeansMicros().centroid_table()


def test_save_load_roundtrip(spark, tmp_path):
    rows = _rows(30, 4, 7)
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    km = KMeansMicros(k=3, iters=2).fit(df)
    want = sorted(tuple(r) for r in km.centroid_table().collect())
    km.save_artifacts(str(tmp_path))
    cold = KMeansMicros(k=3, iters=2)
    cold.load_artifacts(str(tmp_path), spark=spark)
    assert sorted(tuple(r) for r in cold.centroid_table().collect()) == want
    a = sorted(tuple(r) for r in km.assign(df)
               .select("vec_id", "cluster").collect())
    b = sorted(tuple(r) for r in cold.assign(df)
               .select("vec_id", "cluster").collect())
    assert a == b


def test_null_vectors_are_dropped(spark):
    """A NULL vector must not participate: its NULL distance sorts
    first under Spark asc but last under DuckDB — the silent engine
    split the filter prevents."""
    rows = _rows(20, 3, 13)
    df = spark.createDataFrame(rows + [(99, None)],
                               "vec_id long, embedding array<float>")
    km = KMeansMicros(k=3, iters=2).fit(df)
    got = {}
    for r in km.centroid_table().collect():
        got.setdefault(r.cluster, {})[r.pos] = r.value_micros
    want = _py_kmeans(rows, 3, 2)
    assert {c: [v[i] for i in range(len(v))]
            for c, v in got.items()} == want
    assigned = {r.vec_id for r in km.assign(df).collect()}
    assert 99 not in assigned


def test_numpy_assign_impl_is_bit_identical(spark):
    """The large-k*d escape hatch (assign_impl="numpy", Arrow-batched
    int64 argmin) must train the EXACT same centroids and assign the
    exact same labels as the Catalyst crossjoin fold — including the
    lower-cid tie break (duplicated points make real ties)."""
    rows = _rows(80, 6, 9)
    rows += [(100 + i, list(v)) for i, (_, v) in enumerate(rows[:10])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    km_cj = KMeansMicros(k=5, iters=3, assign_impl="crossjoin").fit(df)
    km_np = KMeansMicros(k=5, iters=3, assign_impl="numpy").fit(df)
    cj = sorted(map(tuple, km_cj.centroid_table().collect()))
    np_ = sorted(map(tuple, km_np.centroid_table().collect()))
    assert cj == np_

    a_cj = sorted(map(tuple, km_cj.assign(df)
                      .select("vec_id", "cluster").collect()))
    a_np = sorted(map(tuple, km_np.assign(df)
                      .select("vec_id", "cluster").collect()))
    assert a_cj == a_np


def test_auto_impl_dim_probe_and_selection(spark):
    """auto probes the vector dim once and routes on k*d: the probe job
    only runs under auto, and the crossjoin/numpy cut sits at 8192."""
    rows = _rows(40, 8, 11)
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    auto = KMeansMicros(k=4, iters=1)
    assert auto._dim(auto._points(df)) == 8
    forced = KMeansMicros(k=4, iters=1, assign_impl="numpy")
    assert forced._dim(forced._points(df)) is None  # no probe when forced
    with pytest.raises(ValueError, match="assign_impl"):
        KMeansMicros(assign_impl="pandas")
