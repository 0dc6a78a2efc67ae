"""VocabTokenizer: id assignment, OOV, order preservation, strategy parity."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from systems_spark.operators.tokenizer import VocabTokenizer


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [(1, "the cat sat on the mat"),
         (2, "the dog sat"),
         (3, "cat and dog and cat"),
         (4, "")],
        "doc_id long, text string")


def test_vocab_ranked_by_freq_then_token(spark, corpus):
    tk = VocabTokenizer(vocab_size=3).fit(corpus)
    v = {r["token"]: r["tok_id"] for r in tk.vocab().collect()}
    # freq: the=3, cat=3, sat=2, and=2, dog=2 ... → ties broken token-asc
    assert v == {"cat": 1, "the": 2, "and": 3}


def test_encode_preserves_order_and_oov(spark, corpus):
    tk = VocabTokenizer(vocab_size=3).fit(corpus)
    out = {r["doc_id"]: r for r in tk.transform(corpus).collect()}
    # "the cat sat on the mat" → the=2 cat=1 sat=OOV on=OOV the=2 mat=OOV
    assert out[1]["input_ids"] == [2, 1, 0, 0, 2, 0]
    assert out[3]["input_ids"] == [1, 3, 0, 3, 1]
    assert all(out[i]["n_tokens"] == len(out[i]["input_ids"]) for i in (1, 2, 3, 4))


def test_empty_doc_empty_array_not_null(spark, corpus):
    tk = VocabTokenizer(vocab_size=3).fit(corpus)
    r = [x for x in tk.transform(corpus).collect() if x["doc_id"] == 4][0]
    assert r["input_ids"] == [] and r["n_tokens"] == 0


def test_map_strategy_identical_to_join(spark, corpus):
    a = VocabTokenizer(vocab_size=5, strategy="join").fit(corpus)
    b = VocabTokenizer(vocab_size=5, strategy="map").fit(corpus)
    ra = sorted(map(tuple, a.transform(corpus).collect()))
    rb = sorted(map(tuple, b.transform(corpus).collect()))
    assert ra == rb


def test_map_strategy_zero_exchanges(spark, corpus):
    # encode must fuse into the scan: no shuffle exchange in the plan
    tk = VocabTokenizer(vocab_size=5, strategy="map").fit(corpus)
    plan = tk.transform(corpus)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan
    assert "Exchange rangepartitioning" not in plan


def test_unfit_raises(spark, corpus):
    with pytest.raises(ValueError):
        VocabTokenizer().transform(corpus)
    with pytest.raises(ValueError):
        VocabTokenizer().vocab()


def test_composes_with_sequence_packer(spark, corpus):
    # the tokenize → pack composition: pack by the encoded length
    from systems_spark.operators.packing import SequencePacker

    tk = VocabTokenizer(vocab_size=5).fit(corpus)
    enc = tk.transform(corpus)
    packed = SequencePacker(id_col="doc_id", token_col="n_tokens",
                            budget=8).transform(enc)
    rows = packed.collect()
    assert len(rows) > 0


def test_join_strategy_raises_on_duplicate_ids(spark):
    """ADVICE r4: a duplicated id_col would silently merge two docs'
    (pos, id) streams into one array — the join strategy now raises
    instead of emitting corrupt encodings."""
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PySparkException

    fit = spark.createDataFrame([("alpha beta gamma",)], "text string")
    dup = spark.createDataFrame(
        [(1, "alpha beta"), (1, "gamma"), (2, "alpha")],
        "doc_id long, text string")
    vt = VocabTokenizer(vocab_size=8, strategy="join").fit(fit)
    with pytest.raises((Py4JJavaError, PySparkException)):
        vt.transform(dup).collect()
    # unique ids still encode fine
    ok = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma")], "doc_id long, text string")
    rows = {r.doc_id: r.input_ids for r in vt.transform(ok).collect()}
    assert len(rows[1]) == 2 and len(rows[2]) == 1
