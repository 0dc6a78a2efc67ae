"""SemanticDedup (SemDeDup-style cluster-then-prune) semantics.

The oracle-parity test covers the graded query; these pin the keeper
policies, the training path, and the cluster-boundary property on
hand-built geometry where the expected answer is known by construction.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from systems_spark.dedup import SemanticDedup


def _emb(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    )


@pytest.fixture(scope="module")
def geo(spark):
    # seeds (two lowest ids): 1 → x-axis, 2 → y-axis
    return _emb(spark, [
        (1, (1, 0, 0, 0)),      # cell 1, cent_sim 1.0
        (2, (0, 1, 0, 0)),      # cell 2, cent_sim 1.0
        (5, (0.9, 0.1, 0, 0)),  # cell 1, near-dup of 1, less prototypical
        (7, (0, 1, 0, 0)),      # cell 2, identical to 2
        (9, (0, 0, 1, 0)),      # cell is a cosine-0 tie → lower cent id (1)
    ])


def _decisions(df):
    return {r["vec_id"]: (r["cell"], r["keep"]) for r in df.collect()}


def test_low_centroid_sim_keeps_least_prototypical(spark, geo):
    out = SemanticDedup(n_clusters=2, threshold=0.95).transform(geo)
    d = _decisions(out)
    # cluster 1: {1, 5} are near-dups → keeper is 5 (lower cent_sim)
    assert d[1] == (1, False) and d[5] == (1, True)
    # cluster 2: {2, 7} identical → cent_sim ties, keeper is lower id
    assert d[2] == (2, True) and d[7] == (2, False)
    # orthogonal outlier: no neighbor above threshold → kept
    assert d[9][1] is True


def test_min_id_keeps_canonical(spark, geo):
    out = SemanticDedup(n_clusters=2, threshold=0.95, keep="min_id").transform(geo)
    d = _decisions(out)
    assert d[1] == (1, True) and d[5] == (1, False)
    assert d[2] == (2, True) and d[7] == (2, False)


def test_prune_confined_to_cells(spark):
    # identical vectors land in the SAME cell by construction (same argmax),
    # so cross-cell leakage can only come from a bug in the join key; build
    # two cells whose members are mutually >threshold similar ACROSS cells
    # only via the seed axis they were assigned to
    df = _emb(spark, [
        (1, (1, 0, 0, 0)),
        (2, (0.8, 0.6, 0, 0)),   # seed 2, cos(1,2)=0.8 > τ — but different cells
        (3, (0.99, 0.01, 0, 0)),  # cell 1 (closer to seed 1)
        (4, (0.81, 0.59, 0, 0)),  # cell 2 (closer to seed 2)
    ])
    out = SemanticDedup(n_clusters=2, threshold=0.7).transform(df)
    d = _decisions(out)
    cells = {i: c for i, (c, _) in d.items()}
    assert cells[3] == 1 and cells[4] == 2
    # each cell has one pruned member (its seed is more prototypical than
    # the off-axis member? no — keeper is the LESS prototypical one)
    kept = {i for i, (_, k) in d.items() if k}
    assert len(kept) == 2 and 1 not in kept.intersection({1, 3}) | {0}
    # exactly one survivor per cell despite cross-cell similarity > τ
    from collections import Counter
    per_cell = Counter(cells[i] for i in kept)
    assert per_cell == {1: 1, 2: 1}


def test_all_rows_present_exactly_once(spark, geo):
    out = SemanticDedup(n_clusters=2, threshold=0.95).transform(geo)
    ids = [r["vec_id"] for r in out.collect()]
    assert sorted(ids) == [1, 2, 5, 7, 9]


def test_train_moves_centroids_to_cluster_means(spark):
    # two tight cosine clusters; the two lowest ids sit one in each, so
    # Lloyd converges to the per-cluster mean directions
    rows = []
    for i, eps in enumerate((0.0, 0.05, -0.05, 0.1), start=0):
        rows.append((1 + 2 * i, (1.0, eps, 0, 0)))       # odd ids: x-cluster
        rows.append((2 + 2 * i, (eps, 0, 1.0, 0)))       # even ids: z-cluster
    df = _emb(spark, rows)
    op = SemanticDedup(n_clusters=2, threshold=0.99, train_iters=3).train(df)
    cents = {r["_cent_id"]: r["_cent_vec"] for r in op._centroids.collect()}
    assert len(cents) == 2
    cx, cz = cents[1], cents[2]
    assert cx[0] > 0.9 and abs(cx[2]) < 0.1      # stayed on the x cluster
    assert cz[2] > 0.9 and abs(cz[0]) < 0.1      # stayed on the z cluster
    assert abs(cx[1] - 0.025) < 1e-6             # mean of eps values
    # trained assignment is perfect
    cells = {r["vec_id"]: r["cell"] for r in op.assign(df).collect()}
    assert all(c == 1 for i, c in cells.items() if i % 2 == 1)
    assert all(c == 2 for i, c in cells.items() if i % 2 == 0)


def test_train_empty_cell_keeps_previous_centroid(spark):
    # 3 requested cells but only 2 populated directions: the starved cell's
    # centroid must survive training un-NaN'd (FAISS keeps it)
    df = _emb(spark, [
        (1, (1, 0, 0, 0)), (2, (0.99, 0.01, 0, 0)), (3, (0.98, 0.02, 0, 0)),
        (4, (1, 0.01, 0, 0)), (5, (0.97, 0.01, 0, 0)),
    ])
    op = SemanticDedup(n_clusters=3, threshold=0.99, train_iters=2).train(df)
    cents = op._centroids.collect()
    assert len(cents) == 3
    for r in cents:
        assert all(v == v for v in r["_cent_vec"])  # no NaN


def test_oracle_sql_refuses_trained_state(spark, geo):
    op = SemanticDedup(n_clusters=2, train_iters=2)
    with pytest.raises(ValueError):
        op.train(geo).oracle_sql()


def test_single_assignment_exchange(spark, geo):
    # assignment is one broadcast pass: no Exchange in the assign plan
    # beyond the window's (which partitions by _id); the vectors must not
    # shuffle for centroid scoring
    plan = SemanticDedup(n_clusters=2).assign(geo)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
