"""BigramLM semantics on hand-built corpora.

The oracle-parity test covers the graded query; these pin the LM math
against an independent pure-Python implementation, the three backoff
tiers (observed bigram / seen context / unseen context), the
no-bigram edge (empty and one-token docs), and partition invariance.
"""

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from systems_spark.operators.lm_perplexity import BigramLM


CORPUS = [
    (1, "the cat sat on the mat"),
    (2, "the cat ate the fish"),
    (3, "a dog sat on a log"),
]


def _fit(spark, **kw):
    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    return BigramLM(**kw).fit(df), df


def _python_lm(scale=1_000_000):
    """Independent reference: plain-Python add-one bigram LM in micros."""
    toks = [t for _, text in CORPUS for t in text.split()]
    uni = {}
    for t in toks:
        uni[t] = uni.get(t, 0) + 1
    big = {}
    for _, text in CORPUS:
        ts = text.split()
        for a, b in zip(ts, ts[1:]):
            big[(a, b)] = big.get((a, b), 0) + 1
    V = len(uni)

    def w(a, b):
        if (a, b) in big:
            p = (big[(a, b)] + 1) / (uni[a] + V)
        elif a in uni:
            p = 1.0 / (uni[a] + V)
        else:
            p = 1.0 / V
        return round(math.log(p) * scale)

    def score(text):
        ts = text.split()
        pairs = list(zip(ts, ts[1:]))
        nll = -sum(w(a, b) for a, b in pairs)
        n = len(pairs)
        return n, nll, (nll // n if n else None)

    return score


def _collect(lm, df):
    out = lm.transform(df).select("doc_id", "n_bigrams", "nll_micros", "ppl_micros")
    return {r.doc_id: (r.n_bigrams, r.nll_micros, r.ppl_micros) for r in out.collect()}


def test_scores_match_independent_python_lm(spark):
    lm, corpus = _fit(spark)
    ref = _python_lm()
    apply_rows = [
        (10, "the cat sat"),            # all bigrams observed
        (11, "the dog sat"),            # "the dog" unseen, context "the" seen
        (12, "zebra quark flies"),      # contexts entirely unseen
        (13, "the zebra"),              # seen context, unseen bigram+word
    ]
    apply_df = spark.createDataFrame(apply_rows, "doc_id long, text string")
    got = _collect(lm, apply_df)
    for did, text in apply_rows:
        assert got[did] == ref(text), (did, text, got[did], ref(text))


def test_in_distribution_scores_lower_than_gibberish(spark):
    lm, _ = _fit(spark)
    apply_df = spark.createDataFrame(
        [(1, "the cat sat on the mat"), (2, "qq zz xx vv ww yy")],
        "doc_id long, text string")
    got = _collect(lm, apply_df)
    assert got[1][2] < got[2][2]


def test_no_bigram_docs_survive_with_null_ppl(spark):
    lm, _ = _fit(spark)
    apply_df = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "single"), (4, "the cat")],
        "doc_id long, text string")
    got = _collect(lm, apply_df)
    assert got[1] == (0, 0, None)
    assert got[2] == (0, 0, None)
    assert got[3] == (0, 0, None)      # one token -> zero bigrams
    assert got[4][0] == 1 and got[4][2] == got[4][1]


def test_partition_invariance(spark):
    lm, corpus = _fit(spark)
    base = _collect(lm, corpus)
    for n in (1, 7):
        assert _collect(lm, corpus.repartition(n)) == base


def test_save_load_roundtrip(spark, tmp_path):
    lm, corpus = _fit(spark)
    base = _collect(lm, corpus)
    lm.save_artifacts(str(tmp_path))
    fresh = BigramLM()
    fresh.load_artifacts(str(tmp_path), spark=spark)
    assert _collect(fresh, corpus) == base


def test_score_many_matches_independent_transforms(spark):
    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    target = BigramLM().fit(df.where("doc_id < 3"))
    corpus = BigramLM().fit(df)
    fused = {r.doc_id: (r.nll_micros_t, r.nll_micros_c)
             for r in BigramLM.score_many({"t": target, "c": corpus}, df).collect()}
    t = {r.doc_id: r.nll_micros for r in target.transform(df).collect()}
    c = {r.doc_id: r.nll_micros for r in corpus.transform(df).collect()}
    assert fused == {k: (t[k], c[k]) for k in t}


def test_score_many_custom_text_col(spark):
    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    lm = BigramLM().fit(df)
    renamed = df.withColumnRenamed("text", "body")
    got = {r.doc_id: r.nll_micros_m
           for r in BigramLM.score_many({"m": lm}, renamed,
                                        text_col="body").collect()}
    ref = {r.doc_id: r.nll_micros for r in lm.transform(df).collect()}
    assert got == ref


def test_random_corpora_match_python_lm(spark):
    from hypothesis import given, settings, strategies as st

    WORD = st.text(alphabet="abc", min_size=1, max_size=2)
    DOC = st.lists(WORD, min_size=0, max_size=10).map(" ".join)

    @settings(max_examples=5, deadline=None)
    @given(docs=st.lists(DOC, min_size=1, max_size=8))
    def inner(docs):
        import math
        rows = [(i, d) for i, d in enumerate(docs)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        lm = BigramLM().fit(df)
        got = _collect(lm, df)
        # independent python LM over the same random corpus
        toks = [t for _, d in rows for t in d.split()]
        if not toks:
            assert all(v == (0, 0, None) for v in got.values())
            return
        uni, big = {}, {}
        for t in toks:
            uni[t] = uni.get(t, 0) + 1
        for _, d in rows:
            ts = d.split()
            for a, b in zip(ts, ts[1:]):
                big[(a, b)] = big.get((a, b), 0) + 1
        V = len(uni)

        def w(a, b):
            if (a, b) in big:
                p = (big[(a, b)] + 1) / (uni[a] + V)
            else:
                p = 1.0 / (uni[a] + V)
            return round(math.log(p) * 1_000_000)

        for i, d in rows:
            ts = d.split()
            pairs = list(zip(ts, ts[1:]))
            nll = -sum(w(a, b) for a, b in pairs)
            n = len(pairs)
            assert got[i] == (n, nll, nll // n if n else None), (d, got[i])

    inner()


def test_broadcast_strategy_identical(spark):
    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    a = _collect(BigramLM(broadcast=False).fit(df), df)
    b = _collect(BigramLM(broadcast=True).fit(df), df)
    assert a == b


def test_default_transform_plan_has_no_broadcast_hint(spark):
    """VERDICT r4 item 4: the bigram weight table is vocab-scale — the
    DEFAULT plan must carry no broadcast hint on it (AQE decides at
    runtime); broadcast=True stays the explicit small-reference-LM
    opt-in."""
    df = spark.createDataFrame(
        [(i, f"w{i} w{i+1} w{i+2}") for i in range(6)],
        "doc_id long, text string")
    lm = BigramLM().fit(df)
    analyzed = lm.transform(df)._jdf.queryExecution().analyzed().toString()
    # sanctioned hints: the three 1-row broadcasts (vocab inside each of
    # the two fit-time weight plans + the global-backoff crossJoin); the
    # two vocab-scale weight-table joins (h2/h1) must add NO hint
    default_hints = analyzed.count("ResolvedHint")
    assert default_hints <= 3, analyzed
    hinted = BigramLM(broadcast=True).fit(df)
    analyzed_b = hinted.transform(df)._jdf.queryExecution().analyzed().toString()
    assert analyzed_b.count("ResolvedHint") == default_hints + 2, analyzed_b
