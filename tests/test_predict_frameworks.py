"""Real-framework integration tests for the TF/Torch scoring path
(VERDICT r3 item 5, reference semantics merlin/systems/dag/ops/
tensorflow.py:69-107 and pytorch.py:97-115).

TensorFlow and Torch are NOT installed in this container, so the two
integration tests skip cleanly here (``pytest.importorskip``) and run
golden-parity end-to-end automatically wherever the frameworks exist —
fixtures are built in-test, nothing is checked in. The ragged
values/offsets wire-format helpers are pure NumPy and test everywhere.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from systems_spark.operators.predict import (
    predict_tensorflow,
    predict_torchscript,
    ragged_to_values_offsets,
    values_offsets_to_ragged,
)


def test_ragged_values_offsets_roundtrip():
    """The reference wire format (conversions.py:183-189): int32 cumulative
    offsets, length batch+1, starting at 0; empty rows allowed."""
    rows = [[1.0, 2.0], [3.0], [], [4.0, 5.0, 6.0]]
    values, offsets = ragged_to_values_offsets(rows)
    assert offsets.dtype == np.int32
    assert offsets.tolist() == [0, 2, 3, 3, 6]
    assert values.tolist() == [1.0, 2.0, 3.0, 4.0, 5.0, 6.0]
    back = values_offsets_to_ragged(values, offsets)
    assert [b.tolist() for b in back] == rows
    # empty batch
    v0, o0 = ragged_to_values_offsets([])
    assert o0.tolist() == [0] and len(v0) == 0
    assert values_offsets_to_ragged(v0, o0) == []
    # (batch+1, 1)-shaped offsets (Triton's column shape) also accepted
    assert [b.tolist() for b in
            values_offsets_to_ragged(values, offsets.reshape(-1, 1))] == rows


def test_predict_tensorflow_real_ragged_savedmodel(spark, tmp_path):
    """End-to-end against a REAL SavedModel with a ragged
    values/offsets input: schemas derived from the signature, list column
    split back into the two tensors, golden parity vs in-process call."""
    tf = pytest.importorskip("tensorflow")

    class M(tf.Module):
        @tf.function(input_signature=[
            tf.TensorSpec([None], tf.float32, name="emb__values"),
            tf.TensorSpec([None], tf.int32, name="emb__offsets"),
            tf.TensorSpec([None], tf.float32, name="f0"),
        ])
        def serve(self, emb__values, emb__offsets, f0):
            rt = tf.RaggedTensor.from_row_splits(
                emb__values, tf.cast(emb__offsets, tf.int64)
            )
            return {"score": tf.reduce_sum(rt, axis=1) + f0}

    m = M()
    path = str(tmp_path / "saved_model")
    tf.saved_model.save(m, path, signatures={"serving_default": m.serve})

    op = predict_tensorflow(path)  # schemas derived from the SavedModel
    assert sorted(op.input_cols) == ["emb", "f0"]
    assert [f.name for f in op.output_schema.fields] == ["score"]

    rows = [(1, [1.0, 2.0], 0.5), (2, [3.0], 1.5), (3, [], -1.0)]
    df = spark.createDataFrame(rows, "id long, emb array<float>, f0 float")
    got = {r.id: r.score for r in op(df).collect()}
    # golden: in-process concrete-function call on the same wire format
    values, offsets = ragged_to_values_offsets([r[1] for r in rows])
    golden = m.serve(
        emb__values=tf.constant(values, tf.float32),
        emb__offsets=tf.constant(offsets, tf.int32),
        f0=tf.constant([r[2] for r in rows], tf.float32),
    )["score"].numpy()
    for (rid, _, _), want in zip(rows, golden):
        assert got[rid] == pytest.approx(float(want), rel=1e-6)


def test_predict_torchscript_real_model(spark, tmp_path):
    """End-to-end against a REAL TorchScript module: load per executor,
    index-split outputs (pytorch.py:97-115), golden parity vs in-process
    forward."""
    torch = pytest.importorskip("torch")

    lin = torch.nn.Linear(2, 2)
    with torch.no_grad():
        lin.weight.copy_(torch.tensor([[1.0, 2.0], [3.0, 4.0]]))
        lin.bias.copy_(torch.tensor([0.5, -0.5]))
    path = str(tmp_path / "model.pt")
    torch.jit.script(lin).save(path)

    spec = {"dtype": "float32", "shape": (None,)}
    op = predict_torchscript(
        path,
        input_signature={"f0": spec, "f1": spec},
        output_signature={"y0": spec, "y1": spec},
    )
    rows = [(1, 1.0, 2.0), (2, 0.0, -1.0), (3, -3.0, 0.25)]
    df = spark.createDataFrame(rows, "id long, f0 float, f1 float")
    got = {r.id: (r.y0, r.y1) for r in op(df).collect()}
    with torch.no_grad():
        golden = lin(torch.tensor([[r[1], r[2]] for r in rows])).numpy()
    for (rid, _, _), want in zip(rows, golden):
        assert got[rid][0] == pytest.approx(float(want[0]), rel=1e-6)
        assert got[rid][1] == pytest.approx(float(want[1]), rel=1e-6)
