"""End-to-end recommender pipeline persistence: the reference's
Ensemble save/load equivalence (tests/unit/systems/dag/test_ensemble.py:27-58)
for a FULL retrieval→filter→features→sampling pipeline, plus dims-metadata
and native-vs-pandas executor-parity tests."""

import os
import sys
import tempfile

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from systems_spark import ColumnSchema, Pipeline, Schema, Tags
from systems_spark.operators import (
    QueryANN,
    QueryFeatureTable,
    SoftmaxSampling,
)
from systems_spark.operators.filter_candidates import FilterCandidatesRelational


def _requests(spark, tables):
    emb = tables["embeddings"]
    return (
        tables["customer"].where(F.col("c_custkey") < 20)
        .select(F.col("c_custkey").alias("request_id"),
                F.pmod(F.col("c_custkey"), F.lit(500)).cast("long").alias("vec_id"))
        .join(emb.select("vec_id", F.col("embedding").alias("user_vec")), "vec_id")
        .drop("vec_id")
    )


def _pipeline(tables):
    emb = tables["embeddings"]
    seen = emb.select(F.col("vec_id").alias("ann_id")).where(F.col("ann_id") % 7 == 0)
    return Pipeline([
        QueryANN(emb, item_id_col="vec_id", item_vec_col="embedding",
                 query_vec_col="user_vec", query_id_col="request_id",
                 topk=20, metric="ip"),
        FilterCandidatesRelational(seen, on="ann_id"),
        QueryFeatureTable(emb.select(F.col("vec_id").alias("ann_id"), "label"),
                          "ann_id", features=["label"], prefix="item_"),
        SoftmaxSampling("ann_score", topk=5, input_col="ann_id",
                        request_col="request_id", seed="1"),
    ])


def _result_rows(pipe, req):
    out = pipe.transform(req).select(
        "request_id", "ann_id", "item_label", "sample_rank"
    )
    return sorted(map(tuple, out.collect()))


def test_full_recommender_pipeline_save_load(spark, tables):
    req = _requests(spark, tables)
    pipe = _pipeline(tables)
    before = _result_rows(pipe, req)
    assert len(before) > 0
    with tempfile.TemporaryDirectory() as d:
        pipe.save(d)
        files = set()
        for root, _, fs in os.walk(d):
            files.update(fs)
        assert "pipeline.json" in files
        loaded = Pipeline.load(d, spark=spark)
        after = _result_rows(loaded, req)
    assert before == after


def _stub_forest():
    """Picklable stand-in for a python forest model (container has no
    xgboost/lightgbm): predict = row-sum. Built ONLY from importable
    stdlib/numpy pieces — executor workers and artifact loads can't import
    this test module, so a locally-defined class would not unpickle."""
    import functools
    import types

    import numpy as np

    return types.SimpleNamespace(predict=functools.partial(np.sum, axis=1))


def test_forest_pipeline_save_load_python_model(spark, tables):
    """A pipeline containing PredictForest(python model) survives
    Pipeline.save/load with identical scores (reference
    tests/unit/systems/dag/test_ensemble.py:27-58; model-file-as-artifact
    semantics from fil.py:349-493 — pickle fallback here, xgboost.json /
    model.txt when those frameworks are present)."""
    from systems_spark.operators import PredictForest

    feats = tables["customer"].select(
        "c_custkey",
        F.col("c_acctbal").cast("float").alias("f0"),
        (F.col("c_custkey") % 7).cast("float").alias("f1"),
    ).where(F.col("c_custkey") < 200)

    pipe = Pipeline([PredictForest(_stub_forest(), ["f0", "f1"])])
    before = sorted(
        (r.c_custkey, round(r.output__0, 5))
        for r in pipe.transform(feats).collect()
    )
    assert len(before) > 0
    with tempfile.TemporaryDirectory() as d:
        pipe.save(d)
        loaded = Pipeline.load(d, spark=spark)
        after = sorted(
            (r.c_custkey, round(r.output__0, 5))
            for r in loaded.transform(feats).collect()
        )
    assert before == after


def test_forest_pipeline_save_load_mllib_model(spark, tables):
    """MLlib forest models persist through their native write()/load()
    inside the pipeline artifact dir and rescore identically."""
    from pyspark.ml.classification import RandomForestClassifier
    from pyspark.ml.feature import VectorAssembler

    from systems_spark.operators import PredictForest

    feats = tables["customer"].select(
        "c_custkey",
        F.col("c_acctbal").cast("float").alias("f0"),
        (F.col("c_custkey") % 7).cast("float").alias("f1"),
        (F.col("c_acctbal") > 0).cast("double").alias("label"),
    ).where(F.col("c_custkey") < 300)
    assembled = VectorAssembler(
        inputCols=["f0", "f1"], outputCol="features"
    ).transform(feats)
    model = RandomForestClassifier(
        numTrees=5, maxDepth=3, seed=42, labelCol="label"
    ).fit(assembled)

    pipe = Pipeline([
        PredictForest(model, ["f0", "f1"], predict_proba=True)
    ])
    before = sorted(
        (r.c_custkey, tuple(round(v, 6) for v in r.output__0))
        for r in pipe.transform(feats).collect()
    )
    assert len(before) > 0
    with tempfile.TemporaryDirectory() as d:
        pipe.save(d)
        loaded = Pipeline.load(d, spark=spark)
        after = sorted(
            (r.c_custkey, tuple(round(v, 6) for v in r.output__0))
            for r in loaded.transform(feats).collect()
        )
    assert before == after


def test_pipeline_sparse_max_padding(spark, tables):
    """Pipeline-level sparse_max pads ragged outputs to fixed length at
    serve time (reference workflow.py:31-61 TransformWorkflow sparse_max),
    survives save/load, and is reflected in compute_output_schema dims."""
    from systems_spark.operators import LambdaOp

    docs = tables["documents"].select("doc_id", "text").limit(50)
    tokenize = LambdaOp(
        lambda df: df.withColumn("tokens", F.split(F.col("text"), r"\s+")),
        name="tokenize",
    )
    pipe = Pipeline([tokenize], sparse_max={"tokens": 8}, sparse_fill="")
    out = pipe.transform(docs)
    lens = {r[0] for r in out.select(F.size("tokens")).distinct().collect()}
    assert lens == {8}

    in_schema = Schema([
        ColumnSchema("doc_id", "int64"),
        ColumnSchema("text", "string"),
        ColumnSchema("tokens", "string", is_list=True),
    ])
    dims = {c.name: c.dims for c in pipe.compute_output_schema(in_schema)}
    assert dims["tokens"] == (None, 8)

    with tempfile.TemporaryDirectory() as d:
        # LambdaOp isn't declaratively persistable; test the knob itself
        Pipeline([], sparse_max={"tokens": 8}, sparse_fill="").save(d)
        loaded = Pipeline.load(d, spark=spark)
        assert loaded.sparse_max == {"tokens": 8}
        assert loaded.sparse_fill == ""
        relens = {
            r[0]
            for r in loaded.transform(out.drop("tokens").withColumn(
                "tokens", F.split(F.col("text"), r"\s+")
            )).select(F.size("tokens")).distinct().collect()
        }
        assert relens == {8}


def test_dims_and_tags_metadata_roundtrip(spark):
    """reference compute_dims table (tests/unit/systems/dag/ops/test_ops.py:33-45):
    list-ness/shape/tags survive StructType conversion and parquet IO."""
    schema = Schema([
        ColumnSchema("ids", "int64", is_list=True, dims=(None, 10),
                     tags=[Tags.ITEM, Tags.ID]),
        ColumnSchema("score", "float32", tags=[Tags.CONTINUOUS]),
    ])
    st = schema.to_struct_type()
    back = Schema.from_struct_type(st)
    assert back["ids"].is_list and back["ids"].dims == (None, 10)
    assert back["ids"].tags == frozenset({"item", "id"})
    # parquet round-trip preserves the metadata
    df = spark.createDataFrame([], st)
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/t")
        rb = Schema.of(spark.read.parquet(f"{d}/t"))
    assert rb["ids"].tags == frozenset({"item", "id"})
    assert rb["ids"].dims == (None, 10)


def test_executor_parity_jvm_vs_pandas(spark, tables):
    """reference executor-parity pattern (test_executors.py:34-129): the
    native-expression path and the Arrow/pandas path compute the same
    result (dot products, rounded to absorb summation-order ulps)."""
    import pandas as pd

    from systems_spark.functions.similarity import dot_product
    from systems_spark.operators.predict import PredictModel

    emb = tables["embeddings"].limit(200)
    pairs = (
        emb.select(F.col("vec_id").alias("a"), F.col("embedding").alias("va"))
        .join(emb.select(F.col("vec_id").alias("b"), F.col("embedding").alias("vb")),
              F.col("a") == F.col("b") - 1)
    )
    jvm = {
        (r.a, r.b): r.dot
        for r in pairs.withColumn("dot", F.round(dot_product(F.col("va"), F.col("vb")), 6))
        .select("a", "b", "dot").collect()
    }

    def predict_fn(model, pdf):
        import numpy as np

        dots = [
            round(float(np.dot(np.asarray(x, dtype="float64"),
                               np.asarray(y, dtype="float64"))), 6)
            for x, y in zip(pdf["va"], pdf["vb"])
        ]
        return pd.DataFrame({"dot": dots})

    op = PredictModel(lambda: None, predict_fn, ["va", "vb"], "dot double")
    pandas_path = {(r.a, r.b): r.dot for r in op(pairs).select("a", "b", "dot").collect()}
    assert jvm == pandas_path
