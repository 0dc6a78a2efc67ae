"""NaiveBayesTextClassifier semantics on hand-built corpora.

The oracle-parity test covers the graded query; these pin the NB math
(verified against an independent pure-Python implementation), the
prior-only empty-doc path, unseen-token smoothing, and tie behavior.
"""

import math
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from systems_spark.operators import NaiveBayesTextClassifier


TRAIN = [
    (1, "good clean prose text", "hq"),
    (2, "good great text", "hq"),
    (3, "spam spam buy now", "lq"),
    (4, "buy spam click", "lq"),
]


def _fit(spark, **kw):
    df = spark.createDataFrame(TRAIN, "doc_id long, text string, label string")
    return NaiveBayesTextClassifier(classes=("hq", "lq"), **kw).fit(df)


def _python_nb(scale=1_000_000):
    """Independent reference: plain-Python multinomial NB in micros."""
    toks = {c: [] for c in ("hq", "lq")}
    for _, text, c in TRAIN:
        toks[c].extend(text.split())
    vocab = {t for ts in toks.values() for t in ts}
    n_docs = {c: sum(1 for r in TRAIN if r[2] == c) for c in toks}
    out = {}
    for c, ts in toks.items():
        tot = len(ts)
        w = {t: round(math.log((ts.count(t) + 1) / (tot + len(vocab))) * scale)
             for t in vocab}
        out[c] = {
            "prior": round(math.log(n_docs[c] / len(TRAIN)) * scale),
            "dflt": round(math.log(1.0 / (tot + len(vocab))) * scale),
            "w": w,
        }
    def score(text):
        res = {}
        for c, m in out.items():
            res[c] = m["prior"] + sum(m["w"].get(t, m["dflt"]) for t in text.split())
        return res
    return score


def test_scores_match_independent_python_nb(spark):
    nb = _fit(spark)
    apply_df = spark.createDataFrame(
        [(10, "good text"), (11, "buy spam spam"), (12, "unseen words only"),
         (13, "")],
        "doc_id long, text string")
    got = {r["doc_id"]: r for r in nb.transform(apply_df).collect()}
    ref = _python_nb()
    for did, text in [(10, "good text"), (11, "buy spam spam"),
                      (12, "unseen words only"), (13, "")]:
        exp = ref(text)
        assert got[did]["score_hq"] == exp["hq"], (did, text)
        assert got[did]["score_lq"] == exp["lq"], (did, text)


def test_classifies_separable_corpus(spark):
    nb = _fit(spark)
    apply_df = spark.createDataFrame(
        [(10, "clean prose"), (11, "spam buy now click")],
        "doc_id long, text string")
    d = {r["doc_id"]: r["pred_label"] for r in nb.transform(apply_df).collect()}
    assert d == {10: "hq", 11: "lq"}


def test_empty_doc_scores_prior_only(spark):
    nb = _fit(spark)
    apply_df = spark.createDataFrame([(13, "")], "doc_id long, text string")
    r = nb.transform(apply_df).collect()[0]
    ref = _python_nb()("")
    assert (r["score_hq"], r["score_lq"]) == (ref["hq"], ref["lq"])
    # balanced priors here → integer tie → lexicographically smaller class
    assert r["pred_label"] == "hq"


def test_unfit_transform_raises(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        NaiveBayesTextClassifier(classes=("a", "b")).transform(df)


def test_classes_discovered_when_unset(spark):
    df = spark.createDataFrame(TRAIN, "doc_id long, text string, label string")
    nb = NaiveBayesTextClassifier().fit(df)
    assert nb.classes == ("hq", "lq")


def test_shuffle_join_variant_same_answer(spark):
    # broadcast=False routes the weight join through a shuffle join —
    # same integer scores (the determinism contract is partition-free)
    a = _fit(spark, broadcast=True)
    b = _fit(spark, broadcast=False)
    apply_df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(["good text spam", "buy buy buy",
                                       "clean great prose now"])],
        "doc_id long, text string")
    ra = sorted(map(tuple, a.transform(apply_df).collect()))
    rb = sorted(map(tuple, b.transform(apply_df).collect()))
    assert ra == rb
