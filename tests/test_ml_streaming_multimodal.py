"""Tests for model scoring, fitted transforms, streaming runtime, and
multimodal plumbing (reference test patterns: golden-model parity —
tests/unit/systems/ops/tf/test_ensemble.py:276-278; executor parity —
test_executors.py:34-129)."""

import os
import sys
import tempfile

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from systems_spark import Pipeline
from systems_spark.operators.multimodal import FrameSample, MediaFeatureExtract
from systems_spark.operators.normalize import FillMissing, Normalize
from systems_spark.operators.predict import (
    PredictForest,
    PredictImplicit,
    PredictModel,
    PredictModelBatched,
)
from systems_spark.streaming import serve_pipeline, transform_stream, windowed_rollup


# -- fitted transforms -----------------------------------------------------

def test_normalize_fit_transform(spark):
    df = spark.createDataFrame([(1.0,), (2.0,), (3.0,)], "x double")
    op = Normalize(["x"]).fit(df)
    vals = sorted(r.x for r in op(df).collect())
    assert abs(sum(vals)) < 1e-9  # zero-mean
    assert abs(max(vals) - 1.2247448) < 1e-5  # unit pop-std


def test_fill_missing_mean(spark):
    df = spark.createDataFrame([(1.0,), (None,), (3.0,)], "x double")
    op = FillMissing(["x"], strategy="mean").fit(df)
    assert sorted(r.x for r in op(df).collect()) == [1.0, 2.0, 3.0]


# -- model scoring ---------------------------------------------------------

def test_predict_model_golden_parity(spark):
    """Distributed scoring must equal in-process predict (golden parity)."""
    import numpy as np
    import pandas as pd

    class ToyModel:
        def predict(self, x):
            return x[:, 0] * 2.0 + x[:, 1]

    rows = [(i, float(i), float(i % 5)) for i in range(100)]
    df = spark.createDataFrame(rows, "id long, f0 double, f1 double")

    op = PredictModel(
        loader=lambda: ToyModel(),
        predict_fn=lambda m, pdf: pd.DataFrame(
            {"yhat": m.predict(pdf.to_numpy(dtype="float64"))}
        ),
        input_cols=["f0", "f1"],
        output_schema="yhat double",
    )
    got = {r.id: r.yhat for r in op(df).collect()}
    want = {i: i * 2.0 + (i % 5) for i in range(100)}
    assert got == want


def test_schema_from_signature_ragged_and_scalar():
    """Signature→schema derivation mirrors the reference's SavedModel
    translation (tensorflow.py:138-170): values/offsets pairs reassemble
    into ONE ragged list column; rank-1 tensors become scalars; rank-2
    fixed dims become fixed lists. Stub signature objects — no TF needed."""
    from types import SimpleNamespace

    from systems_spark.operators import schema_from_signature

    sig = {
        "user_id": {"dtype": "int64", "shape": (None,)},
        "item_ids__values": {"dtype": "int32", "shape": (None,)},
        "item_ids__offsets": {"dtype": "int32", "shape": (None,)},
        # TensorSpec duck type: .dtype has .name, shape has wildcard -1
        "dense_vec": SimpleNamespace(
            dtype=SimpleNamespace(name="float32"), shape=(-1, 64)
        ),
    }
    schema = schema_from_signature(sig)
    assert schema.column_names == ["user_id", "item_ids", "dense_vec"]
    by_name = {c.name: c for c in schema}
    assert not by_name["user_id"].is_list
    assert by_name["item_ids"].is_list and by_name["item_ids"].dims == (None, None)
    assert by_name["dense_vec"].is_list and by_name["dense_vec"].dims == (None, 64)
    # ragged offsets never surface as their own column
    assert "item_ids__offsets" not in schema.column_names

    import pytest as _pt

    with _pt.raises(ValueError, match="ragged pairs"):
        schema_from_signature({"a__values": {"dtype": "int32", "shape": (None,)}})
    with _pt.raises(ValueError, match="ragged pairs"):
        schema_from_signature({"a__offsets": {"dtype": "int32", "shape": (None,)}})


def test_predict_model_from_signature_end_to_end(spark):
    """A PredictModel built purely from signatures scores correctly —
    the PredictTensorflow(model) ergonomics with a stub 'framework'."""
    import pandas as pd

    from systems_spark.operators import predict_model_from_signature

    in_sig = {"f0": {"dtype": "float64", "shape": (None,)},
              "f1": {"dtype": "float64", "shape": (None,)}}
    out_sig = {"yhat": {"dtype": "float64", "shape": (None,)}}

    op = predict_model_from_signature(
        loader=lambda: None,
        predict_fn=lambda m, pdf: pd.DataFrame({"yhat": pdf["f0"] * 2 + pdf["f1"]}),
        input_signature=in_sig,
        output_signature=out_sig,
    )
    assert op.input_cols == ["f0", "f1"]
    assert [f.name for f in op.output_schema.fields] == ["yhat"]

    df = spark.createDataFrame(
        [(i, float(i), float(i % 5)) for i in range(50)],
        "id long, f0 double, f1 double",
    )
    got = {r.id: r.yhat for r in op(df).collect()}
    assert got == {i: i * 2.0 + (i % 5) for i in range(50)}


def test_predict_batch_udf_parity_with_mapinpandas(spark):
    """The predict_batch_udf path must score identically to the
    mapInPandas path (executor-parity pattern, test_executors.py:34-129),
    including multi-output struct returns."""
    import pandas as pd

    class ToyModel:
        def predict(self, x):
            return x[:, 0] * 2.0 + x[:, 1]

    rows = [(i, float(i), float(i % 5)) for i in range(100)]
    df = spark.createDataFrame(rows, "id long, f0 double, f1 double")

    batched = PredictModelBatched(
        loader=lambda: ToyModel(),
        predict_fn=lambda m, x: m.predict(x).astype("float64"),
        input_cols=["f0", "f1"],
        return_type="double",
        output_col="yhat",
        batch_size=16,
    )
    got = {r.id: r.yhat for r in batched(df).collect()}

    mip = PredictModel(
        loader=lambda: ToyModel(),
        predict_fn=lambda m, pdf: pd.DataFrame(
            {"yhat": m.predict(pdf.to_numpy(dtype="float32")).astype("float64")}
        ),
        input_cols=["f0", "f1"],
        output_schema="yhat double",
    )
    want = {r.id: r.yhat for r in mip(df).collect()}
    assert got == want

    # struct return: multi-output heads in one pass
    from pyspark.sql.types import DoubleType, StructField, StructType

    multi = PredictModelBatched(
        loader=lambda: ToyModel(),
        predict_fn=lambda m, x: {
            "y1": m.predict(x).astype("float64"),
            "y2": (x[:, 0] * -1.0).astype("float64"),
        },
        input_cols=["f0", "f1"],
        return_type=StructType([StructField("y1", DoubleType()),
                                StructField("y2", DoubleType())]),
        output_col="preds",
    )
    row = multi(df).where(F.col("id") == 7).select("preds.*").first()
    assert (row.y1, row.y2) == (7 * 2.0 + 2.0, -7.0)


def test_predict_forest_mllib_and_knobs(spark):
    from pyspark.ml.classification import RandomForestClassifier
    from pyspark.ml.feature import VectorAssembler

    rows = [(float(i), float(i % 3), 1.0 if i % 2 else 0.0) for i in range(200)]
    df = spark.createDataFrame(rows, "f0 double, f1 double, label double")
    assembled = VectorAssembler(inputCols=["f0", "f1"], outputCol="features").transform(df)
    model = RandomForestClassifier(numTrees=5, maxDepth=3, seed=1).fit(assembled)

    out = PredictForest(model, ["f0", "f1"])(df)
    assert "output__0" in out.columns
    assert dict(out.dtypes)["output__0"] == "float"
    assert out.count() == 200

    proba = PredictForest(model, ["f0", "f1"], predict_proba=True)(df)
    first = proba.select("output__0").first()[0]
    assert len(first) == 2  # per-class probabilities (fil.py predict_proba)


def test_predict_forest_python_model(spark):
    class SkLike:
        def predict(self, x):
            return (x[:, 0] > 50).astype("float32")

    rows = [(i, float(i)) for i in range(100)]
    df = spark.createDataFrame(rows, "id long, f0 double")
    out = PredictForest(SkLike(), ["f0"], output_class=True, threshold=0.5)(df)
    got = {r.id: r.output__0 for r in out.collect()}
    assert got[10] == 0.0 and got[60] == 1.0


def test_predict_implicit_shapes(spark, tables):
    """implicit.py:92-113: per user, ids+scores arrays of length N."""
    from pyspark.ml.recommendation import ALS

    ev = tables["events"]
    inter = ev.select(
        F.col("user_id").cast("int").alias("user"),
        F.pmod(F.col("event_id"), F.lit(50)).cast("int").alias("item"),
        F.lit(1.0).alias("rating"),
    ).groupBy("user", "item").agg(F.count(F.lit(1)).cast("float").alias("rating"))
    model = ALS(rank=4, maxIter=3, seed=1, implicitPrefs=True, userCol="user",
                itemCol="item", ratingCol="rating").fit(inter)
    req = inter.select(F.col("user").cast("long").alias("user_id")).distinct().limit(5)
    out = PredictImplicit(model, num_to_recommend=7)(req).collect()
    assert len(out) == 5
    for r in out:
        assert len(r.ids) == 7 and len(r.scores) == 7
        assert sorted(r.scores, reverse=True) == list(r.scores)  # ranked


# -- streaming -------------------------------------------------------------

def test_streaming_foreachbatch_parity(spark, tables, tmp_path):
    """The same Pipeline produces identical results in batch and streaming
    (executor-parity pattern, test_executors.py:34-129)."""
    from systems_spark.operators import SelectColumns
    from systems_spark.operators.selection import FilterRows

    src = str(tmp_path / "src")
    tables["events"].limit(500).write.mode("overwrite").parquet(src)
    static = spark.read.parquet(src)

    pipe = Pipeline([
        SelectColumns(["event_id", "event_type", "value"]),
        FilterRows("event_type = 'purchase'"),
    ])
    batch_result = sorted(map(tuple, pipe.transform(static).collect()))

    stream = spark.readStream.schema(static.schema).parquet(src)
    collected = []
    q = serve_pipeline(
        pipe, stream,
        sink_fn=lambda df, bid: collected.extend(map(tuple, df.collect())),
        checkpoint=str(tmp_path / "ckpt"),
        trigger={"availableNow": True},
    )
    q.awaitTermination(120)
    assert sorted(collected) == batch_result


def test_streaming_windowed_rollup(spark, tables, tmp_path):
    src = str(tmp_path / "wsrc")
    ev = tables["events"].limit(1000).withColumn(
        "ts_ts", F.timestamp_micros(F.expr("ts div 1000"))
    )
    ev.write.mode("overwrite").parquet(src)
    static = spark.read.parquet(src)
    stream = spark.readStream.schema(static.schema).parquet(src)
    agg = windowed_rollup(stream, "ts_ts", "event_type", "1 hour", "1 minute")
    q = (agg.writeStream.outputMode("complete").format("memory")
         .queryName("rollup_test").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.sql("select count(*) c from rollup_test").first().c
    # batch equivalent
    want = (static.groupBy(F.window("ts_ts", "1 hour"), "event_type").count().count())
    assert got == want


# -- multimodal ------------------------------------------------------------

def test_media_feature_extract_plumbing(spark):
    rows = [(1, b"\x01\x02\x03" * 100), (2, b"\xff" * 50), (3, None)]
    df = spark.createDataFrame(rows, "id long, payload binary")
    out = MediaFeatureExtract("payload", dim=8)(df)
    got = {r.id: r.features for r in out.collect()}
    assert all(len(v) == 8 for v in got.values())
    # deterministic: re-run equals
    got2 = {r.id: r.features for r in MediaFeatureExtract("payload", dim=8)(df).collect()}
    assert got == got2
    # distinct payloads → distinct features; null payload handled
    assert got[1] != got[2] and got[3] is not None


def test_media_byte_budget_partitioning(spark):
    """target_batch_bytes is a REAL knob: partition count = ceil(total
    payload bytes / budget), so bigger payloads → more partitions at the
    same row count."""
    small = spark.createDataFrame(
        [(i, b"x" * 100) for i in range(64)], "id long, payload binary"
    )
    big = spark.createDataFrame(
        [(i, b"x" * 10_000) for i in range(64)], "id long, payload binary"
    )
    budget = 64_000  # bytes per task
    op = MediaFeatureExtract("payload", dim=4, target_batch_bytes=budget)
    # small: 64*100 = 6.4 KB → 1 partition; big: 640 KB → 10 partitions
    n_small = op.transform(small).rdd.getNumPartitions()
    n_big = op.transform(big).rdd.getNumPartitions()
    assert n_small == 1
    assert n_big == 10
    # results identical regardless of partitioning
    got = {r.id: r.features for r in op(big).collect()}
    base = {r.id: r.features
            for r in MediaFeatureExtract("payload", dim=4)(big).collect()}
    assert got == base


def test_media_byte_budget_size_skewed_input(spark):
    """r4 regression test for the r3 ``limit(2048)`` bias: when payload
    size correlates with row order (first rows tiny, later rows huge — the
    one-source-shards-images-another-videos shape), the estimate must
    still reflect the TRUE total, not the head of the data."""
    rows = [(i, b"x" * 10) for i in range(2048)] + \
           [(2048 + i, b"x" * 10_000) for i in range(2048)]
    df = spark.createDataFrame(rows, "id long, payload binary")
    budget = 1_000_000
    op = MediaFeatureExtract("payload", dim=4, target_batch_bytes=budget)
    n = op.transform(df).rdd.getNumPartitions()
    # true total = 2048*10 + 2048*10_000 ≈ 20.5 MB → 21 partitions; the
    # old head-sample saw only the 10-byte rows and would have chosen 1
    import math
    true_total = 2048 * 10 + 2048 * 10_000
    assert n == math.ceil(true_total / budget)


def test_media_byte_budget_bare_scan_uses_file_stats(spark, tmp_path):
    """For a bare parquet scan the byte budget comes from file-system
    statistics — no Spark job — and equals the actual on-disk bytes."""
    import math
    import os as _os
    import random

    from systems_spark.operators.multimodal import _bare_scan_total_bytes

    rng = random.Random(7)
    rows = [(i, bytes(rng.getrandbits(8) for _ in range(4000)))
            for i in range(256)]  # incompressible → on-disk ≈ payload bytes
    path = str(tmp_path / "media.parquet")
    spark.createDataFrame(rows, "id long, payload binary") \
        .coalesce(2).write.parquet(path)
    scan = spark.read.parquet(path)

    disk_bytes = sum(
        _os.path.getsize(_os.path.join(dp, f))
        for dp, _, fs in _os.walk(path) for f in fs if f.endswith(".parquet")
    )
    est = _bare_scan_total_bytes(scan)
    assert est == disk_bytes
    # projection/filter above the scan: still bare (overestimate is the
    # memory-safe direction); compute above the scan: falls back to None
    assert _bare_scan_total_bytes(
        scan.where(F.col("id") < 10).select("payload")) == disk_bytes
    assert _bare_scan_total_bytes(scan.groupBy("id").count()) is None
    assert _bare_scan_total_bytes(scan.join(scan.select("id"), "id")) is None

    budget = 100_000
    op = MediaFeatureExtract("payload", dim=4, target_batch_bytes=budget)
    assert (op.transform(scan).rdd.getNumPartitions()
            == math.ceil(disk_bytes / budget))


def test_implicit_recommend_matches_numpy_factor_scoring(spark, tables):
    """ADVICE r3 (medium): the graded implicit_recommend oracle is a
    pinned regression snapshot (generated from the query itself), so this
    test supplies the INDEPENDENT correctness leg: rebuild the same
    pinned-layout ALS fit, then score every (user, item) pair in NumPy
    straight from the fitted factor matrices and check that MLlib's
    recommendForUserSubset returns exactly the top-k of that score
    matrix, in order."""
    import numpy as np
    from pyspark.ml.recommendation import ALS

    ev = tables["events"]
    inter = (
        ev.select(
            F.col("user_id").cast("int").alias("user"),
            F.pmod(F.col("event_id"), F.lit(200)).cast("int").alias("item"),
        )
        .groupBy("user", "item")
        .agg(F.count(F.lit(1)).cast("float").alias("rating"))
        .repartition(1)
        .sortWithinPartitions("user", "item")
    )
    als = ALS(rank=8, maxIter=5, seed=42, implicitPrefs=True,
              userCol="user", itemCol="item", ratingCol="rating",
              numUserBlocks=1, numItemBlocks=1, coldStartStrategy="drop")
    model = als.fit(inter)

    uf = {r.id: np.array(r.features, dtype=np.float32)
          for r in model.userFactors.collect()}
    itf = {r.id: np.array(r.features, dtype=np.float32)
           for r in model.itemFactors.collect()}
    users = sorted(uf)[:20]
    k = 5
    got = {
        r.user: [(c.item, c.rating) for c in r.recommendations]
        for r in model.recommendForUserSubset(
            inter.select("user").distinct().orderBy("user").limit(20), k
        ).collect()
    }
    assert sorted(got) == users
    item_ids = sorted(itf)
    idx = {i: j for j, i in enumerate(item_ids)}
    V = np.stack([itf[i] for i in item_ids])
    # MLlib's fused float32 dot can differ from NumPy's by ~1 ulp, which
    # can swap genuinely tied neighbors — so assert top-k VALIDITY within
    # a float tolerance, not identical tie order: every returned score
    # matches the factor recomputation, the returned list is
    # non-increasing, and no unreturned item beats the returned minimum.
    tol = 1e-5
    for u in users:
        scores = V @ uf[u]  # float32, mirroring MLlib's BLAS dot
        sel = np.array([idx[i] for i, _ in got[u]])
        for (item, rating) in got[u]:
            np.testing.assert_allclose(rating, float(scores[idx[item]]),
                                       rtol=1e-5)
        sel_scores = scores[sel]
        assert all(sel_scores[i] >= sel_scores[i + 1] - tol
                   for i in range(k - 1)), (u, sel_scores)
        rest = np.delete(scores, sel)
        assert float(sel_scores.min()) >= float(rest.max()) - tol, (
            u, float(sel_scores.min()), float(rest.max()))


def test_predict_forest_matches_python_tree_traversal(spark, tables):
    """ADVICE r3 (medium), forest leg: walk each fitted tree's structure
    (public Node API: split featureIndex/threshold, leaf prediction) in
    pure Python and combine per-tree probability vectors in NumPy —
    independent of MLlib's predict path — then check (a) per-tree
    traversal reproduces each tree's own predictions and (b) the NumPy
    probability-sum argmax reproduces the forest's predictions, hence the
    graded histogram."""
    import numpy as np
    from pyspark.ml.classification import RandomForestClassifier
    from pyspark.ml.feature import VectorAssembler

    li = tables["lineitem"]
    data = li.select(
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        (F.col("l_returnflag") == "R").cast("double").alias("label"),
    ).repartition(8, "l_quantity", "l_extendedprice").sortWithinPartitions(
        "l_quantity", "l_extendedprice", "l_discount", "l_tax", "label"
    )
    assembled = VectorAssembler(
        inputCols=["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        outputCol="features",
    ).transform(data)
    model = RandomForestClassifier(numTrees=8, maxDepth=4, seed=42).fit(assembled)

    def read_tree(jnode):
        if jnode.getClass().getSimpleName() == "LeafNode":
            return ("leaf", float(jnode.prediction()))
        split = jnode.split()
        assert split.getClass().getSimpleName() == "ContinuousSplit"
        return ("split", split.featureIndex(), split.threshold(),
                read_tree(jnode.leftChild()), read_tree(jnode.rightChild()))

    def walk(tree, x):
        while tree[0] == "split":
            _, fi, thr, left, right = tree
            tree = left if x[fi] <= thr else right
        return tree[1]

    trees = [read_tree(t._java_obj.rootNode()) for t in model.trees]

    rows = assembled.limit(300).collect()
    X = [list(r.features) for r in rows]
    # (a) per-tree: pure-Python traversal == the tree's own transform
    per_tree_probs = []
    for py_tree, jtree in zip(trees, model.trees):
        preds = jtree.transform(assembled.limit(300)).select(
            "prediction", "probability").collect()
        for x, p in zip(X, preds):
            assert walk(py_tree, x) == p.prediction, (x, py_tree)
        per_tree_probs.append(np.array([list(p.probability) for p in preds]))
    # (b) forest = argmax of summed per-tree probability vectors
    combined = np.sum(per_tree_probs, axis=0)
    forest_preds = [r.prediction for r in
                    model.transform(assembled.limit(300)).select("prediction").collect()]
    np.testing.assert_array_equal(np.argmax(combined, axis=1), forest_preds)


def test_predict_implicit_id_overflow_raises(spark, tables):
    """A 64-bit user id must raise, not silently wrap to int32
    (ALS ids are 32-bit)."""
    from pyspark.ml.recommendation import ALS

    ev = tables["events"]
    inter = ev.select(
        F.col("user_id").cast("int").alias("user"),
        F.pmod(F.col("event_id"), F.lit(50)).cast("int").alias("item"),
    ).groupBy("user", "item").agg(F.count(F.lit(1)).cast("float").alias("rating"))
    model = ALS(rank=2, maxIter=1, seed=1, userCol="user", itemCol="item",
                ratingCol="rating").fit(inter)
    bad = spark.createDataFrame([(2**40,)], "user_id long")
    with pytest.raises(Exception, match="overflows int32"):
        PredictImplicit(model, num_to_recommend=3)(bad).collect()


def test_predict_tensorflow_torchscript_constructors(spark):
    """Reference-constructor-surface parity (tensorflow.py:31-52,
    pytorch.py:27-119): schemas derived from signatures, import-gated
    loaders — testable without the frameworks installed."""
    from systems_spark.operators import predict_tensorflow, predict_torchscript

    sig = {
        "inputs": {
            "f0": {"dtype": "float32", "shape": (None,)},
            "emb__values": {"dtype": "float32", "shape": (None,)},
            "emb__offsets": {"dtype": "int32", "shape": (None,)},
        },
        "outputs": {"score": {"dtype": "float32", "shape": (None,)}},
    }
    tf_op = predict_tensorflow("/nonexistent/saved_model", signature=sig)
    assert tf_op.input_cols == ["f0", "emb"]
    assert [f.name for f in tf_op.output_schema.fields] == ["score"]
    # executor-side loader is import-gated on tensorflow (absent here)
    with pytest.raises(ImportError):
        tf_op.loader()
    # no signature + no TF → clean ImportError at construct time
    with pytest.raises(ImportError, match="signature"):
        predict_tensorflow("/nonexistent/saved_model")

    pt_op = predict_torchscript(
        "/nonexistent/model.pt",
        input_signature={"f0": {"dtype": "float32", "shape": (None,)},
                         "f1": {"dtype": "float32", "shape": (None,)}},
        output_signature={"y0": {"dtype": "float32", "shape": (None,)},
                          "y1": {"dtype": "float32", "shape": (None,)}},
    )
    assert pt_op.input_cols == ["f0", "f1"]
    assert [f.name for f in pt_op.output_schema.fields] == ["y0", "y1"]
    with pytest.raises(ImportError):
        pt_op.loader()
    # the predict_fn splits the output matrix by column index
    # (pytorch.py:97-115) — verify with a duck-typed 'model' (the numpy
    # fallback path exercises the same reshape/split code torch would)
    import numpy as np
    import pandas as pd

    class FakeTensor:
        def __init__(self, a):
            self._a = a

        def numpy(self):
            return self._a

    class FakeModule:
        def __call__(self, x):
            a = np.asarray(x)
            return FakeTensor(np.stack([a[:, 0] * 2, a[:, 1] * -1], axis=1))

    out = pt_op.predict_fn(FakeModule(),
                           pd.DataFrame({"f0": [1.0, 2.0], "f1": [3.0, 4.0]}))
    assert list(out.columns) == ["y0", "y1"]
    assert out["y0"].tolist() == [2.0, 4.0]
    assert out["y1"].tolist() == [-3.0, -4.0]


def test_frame_sample_explodes(spark):
    df = spark.createDataFrame([(1, bytes(range(64)))], "id long, payload binary")
    out = FrameSample("payload", n_frames=4)(df).collect()
    assert len(out) == 4
    assert [r.frame_idx for r in out] == [0, 1, 2, 3]
    assert all(isinstance(r.frame, (bytes, bytearray)) for r in out)
    # frames partition the payload deterministically
    assert b"".join(r.frame for r in sorted(out, key=lambda r: r.frame_idx)) == bytes(range(64))


def test_media_resize_composes_with_extract(spark):
    """Resize updates payload AND metadata struct together; downstream
    media ops (feature extract) compose after it on the resized bytes."""
    from systems_spark.operators.multimodal import MediaResize

    rows = [(1, b"\x01\x02\x03" * 50, {"media_type": "image", "width": 640,
                                       "height": 480, "duration_ms": None,
                                       "codec": "raw"}),
            (2, b"", {"media_type": "image", "width": 0, "height": 0,
                      "duration_ms": None, "codec": "raw"})]
    df = spark.createDataFrame(
        rows,
        "id long, payload binary, media_meta struct<media_type:string,"
        "width:int,height:int,duration_ms:bigint,codec:string>",
    )
    op = MediaResize("payload", "media_meta", width=8, height=4, bytes_per_pixel=3)
    out = {r.id: r for r in op(df).collect()}
    # payload length = target pixel bytes; empty stays empty
    assert len(out[1].payload) == 8 * 4 * 3
    assert len(out[2].payload) == 0
    # metadata struct updated in lockstep, other fields preserved
    assert (out[1].media_meta.width, out[1].media_meta.height) == (8, 4)
    assert out[1].media_meta.media_type == "image"
    # deterministic and composable with feature extraction
    resized = op(df)
    feats = MediaFeatureExtract("payload", dim=4)(resized)
    got = {r.id: r.features for r in feats.collect()}
    got2 = {r.id: r.features for r in MediaFeatureExtract("payload", dim=4)(op(df)).collect()}
    assert got == got2 and len(got[1]) == 4


def test_media_resize_pipeline_roundtrip(spark, tmp_path):
    """MediaResize persists through the generic plan JSON path (get_params)
    and reloads to an identical transform."""
    from systems_spark.operators.multimodal import MediaResize

    df = spark.createDataFrame(
        [(i, bytes([i]) * (10 + i)) for i in range(20)],
        "id long, payload binary",
    )
    pipe = Pipeline([MediaResize("payload", meta_col=None, width=4, height=2,
                                 bytes_per_pixel=1)])
    d = str(tmp_path / "resize_pipe")
    pipe.save(d)
    loaded = Pipeline.load(d)
    want = sorted((r.id, bytes(r.payload)) for r in pipe.transform(df).collect())
    got = sorted((r.id, bytes(r.payload)) for r in loaded.transform(df).collect())
    assert got == want
    assert all(len(p) == 8 for _, p in got)


def test_predict_forest_survives_observation_poisoned_session(spark, tables):
    """r13 regression: pyspark.sql.Observation initializes the session's
    lazy ObservationManager (not Serializable); after that, transform()
    on an MLlib model still carrying its trainingSummary (which references
    the SparkSession) dies with "Task not serializable". The CDC staging
    write uses Observation, and the driver's correctness gate runs every
    declared query in ONE session — so q_predict_forest must score through
    a summary-stripped copy. This test poisons the session exactly the way
    a preceding CDC lane does, then runs the declared query."""
    from pyspark.sql import Observation

    import __spark_entry__ as entry

    obs = Observation()
    (spark.range(8).observe(obs, F.count(F.lit(1)).alias("n"))
     .write.format("noop").mode("overwrite").save())
    assert obs.get["n"] == 8  # manager initialized for real
    sf = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
    out = entry.queries()["predict_forest"](spark, sf)
    hist = {(r.label, r.prediction): r.n for r in out.collect()}
    assert sum(hist.values()) > 0
