"""BpeTokenizer vs an independent pure-Python BPE (Sennrich et al. 2016
reference algorithm): learned merges, tie rule, greedy-left application,
save/load, transform round-trip."""

import os
import re
import sys
from collections import Counter

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from systems_spark.operators.bpe import BpeTokenizer

EOW = "</w>"


def _python_bpe(texts, num_merges, min_pair_count=2):
    """Independent reference: same weighted-vocab algorithm, same
    count-desc / lexicographic tie rule, same greedy-left merging."""
    words = Counter()
    for t in texts:
        for w in re.split(r"\s+", t.strip()):
            if w:
                words[w] += 1
    vocab = {w: list(w) + [EOW] for w in words}
    merges = []
    for _ in range(num_merges):
        pairs = Counter()
        for w, sym in vocab.items():
            for i in range(len(sym) - 1):
                pairs[(sym[i], sym[i + 1])] += words[w]
        if not pairs:
            break
        (l, r), c = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if c < min_pair_count:
            break
        merges.append((l, r, c))
        for w, sym in vocab.items():
            out, carry = [], None
            for s in sym:
                if carry == l and s == r:
                    out.append(l + r)
                    carry = None
                else:
                    if carry is not None:
                        out.append(carry)
                    carry = s
            if carry is not None:
                out.append(carry)
            vocab[w] = out
    return merges, vocab


CORPUS = [
    "low low low low low",
    "lower lower newest newest",
    "newest newest newest newest",
    "wider wider new new",
]


def _fit(spark, texts, m):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id long, text string")
    return BpeTokenizer(num_merges=m).fit(df)


def test_learned_merges_match_reference(spark):
    bpe = _fit(spark, CORPUS, 8)
    want, _ = _python_bpe(CORPUS, 8)
    assert bpe.merges == want


def test_tie_breaks_lexicographically(spark):
    # "ab" and "cd" both appear exactly twice: (a,b) must win the tie
    texts = ["ab ab cd cd"]
    bpe = _fit(spark, texts, 1)
    assert bpe.merges[0][:2] == ("a", "b")


def test_transform_matches_reference_tokenization(spark):
    bpe = _fit(spark, CORPUS, 8)
    merges, vocab = _python_bpe(CORPUS, 8)
    df = spark.createDataFrame([(0, CORPUS[1])], "doc_id long, text string")
    got = bpe.transform(df).collect()[0]["tokens"]
    want = vocab["lower"] + vocab["lower"] + vocab["newest"] + vocab["newest"]
    assert got == want


def test_greedy_left_on_repeats(spark):
    # "aaa": pair (a,a) merges greedily left -> ["aa", "a", EOW-ish]
    bpe = _fit(spark, ["aaa aaa"], 1)
    assert bpe.merges[0][:2] == ("a", "a")
    df = spark.createDataFrame([(0, "aaa")], "doc_id long, text string")
    assert bpe.transform(df).collect()[0]["tokens"] == ["aa", "a", EOW]


def test_min_pair_count_stops_early(spark):
    bpe = BpeTokenizer(num_merges=50, min_pair_count=3)
    df = spark.createDataFrame([(0, "xy xy")], "doc_id long, text string")
    bpe.fit(df)  # best pair count = 2 < 3: learns nothing
    assert bpe.merges == []


def test_save_load_roundtrip(spark, tmp_path):
    bpe = _fit(spark, CORPUS, 6)
    bpe.save_artifacts(str(tmp_path), spark=spark)
    again = BpeTokenizer(num_merges=6)
    again.load_artifacts(str(tmp_path), spark=spark)
    assert again.merges == bpe.merges
    df = spark.createDataFrame([(0, "lowest")], "doc_id long, text string")
    assert (again.transform(df).collect()[0]["tokens"]
            == bpe.transform(df).collect()[0]["tokens"])


def test_pipeline_roundtrip(spark, tmp_path):
    """BPE through the Pipeline persistence protocol: fit, save, cold
    load, identical tokenization."""
    from systems_spark.pipeline import Pipeline

    df = spark.createDataFrame([(i, t) for i, t in enumerate(CORPUS)],
                               "doc_id long, text string")
    pipe = Pipeline([BpeTokenizer(num_merges=6)])
    pipe.fit(df)
    want = [r["tokens"] for r in pipe.transform(df).collect()]
    pipe.save(str(tmp_path / "p"))
    again = Pipeline.load(str(tmp_path / "p"), spark=spark)
    got = [r["tokens"] for r in again.transform(df).collect()]
    assert got == want


def test_validation(spark):
    with pytest.raises(ValueError, match="num_merges"):
        BpeTokenizer(num_merges=0)
    with pytest.raises(ValueError, match="fit"):
        BpeTokenizer().merge_table(spark)


def _python_apply(word, merges):
    """Apply learned merges to ONE word (greedy-left per rule, learned
    order) — the reference for OOV tokenization."""
    sym = list(word) + [EOW]
    for l, r, _ in merges:
        out, carry = [], None
        for s in sym:
            if carry == l and s == r:
                out.append(l + r)
                carry = None
            else:
                if carry is not None:
                    out.append(carry)
                carry = s
        if carry is not None:
            out.append(carry)
        sym = out
    return sym


def test_oov_words_tokenize_like_reference(spark):
    """Disjoint fit/transform corpora: words unseen at fit time go
    through the per-batch OOV rewrite and must equal the pure-Python
    application of the learned merges (VERDICT r9 item 6)."""
    bpe = _fit(spark, CORPUS, 8)
    oov_text = "lowestest widest newlow zz"
    df = spark.createDataFrame([(0, oov_text)], "doc_id long, text string")
    got = bpe.transform(df).collect()[0]["tokens"]
    want = []
    for w in oov_text.split():
        want += _python_apply(w, bpe.merges)
    assert got == want


def test_null_and_empty_text_semantics(spark):
    """NULL text -> NULL tokens; empty/whitespace text -> [] (the r8
    flatten semantics, preserved across the dictionary-join rewrite)."""
    bpe = _fit(spark, CORPUS, 4)
    df = spark.createDataFrame(
        [(0, None), (1, ""), (2, "   "), (3, "low")],
        "doc_id long, text string")
    got = {r.doc_id: r.tokens for r in bpe.transform(df).collect()}
    assert got[0] is None
    assert got[1] == []
    assert got[2] == []
    assert got[3] == _python_apply("low", bpe.merges)


def test_256_merges_train_and_apply_end_to_end(spark):
    """num_merges=256 trained AND applied — impossible under the r8
    per-occurrence transform (256 folds cannot nest in one Catalyst
    expression). Merge table must match the pure-Python reference and
    tokenization must match its vocab rewrite."""
    import random

    rnd = random.Random(3)
    alphabet = "abcdefgh"
    words = ["".join(rnd.choice(alphabet) for _ in range(12))
             for _ in range(96)]
    texts = [" ".join(words[i::8] + words[(i + 3) % 8::8])
             for i in range(8)]
    bpe = _fit(spark, texts, 256)
    want_merges, vocab = _python_bpe(texts, 256)
    assert len(want_merges) == 256, "corpus must sustain 256 merges"
    assert bpe.merges == want_merges
    df = spark.createDataFrame([(0, texts[0])], "doc_id long, text string")
    got = bpe.transform(df).collect()[0]["tokens"]
    want = []
    for w in texts[0].split():
        want += vocab[w]
    assert got == want


def test_fit_update_equals_fit_of_union(spark):
    """fit(a) + fit_update(b) == fit(a ∪ b) bit-for-bit — the (word,
    freq) vocab is the mergeable training state; the standing corpus is
    never re-tokenized."""
    a, b = CORPUS[:2], CORPUS[2:]
    inc = _fit(spark, a, 8)
    inc.fit_update(spark.createDataFrame(
        [(i, t) for i, t in enumerate(b)], "doc_id long, text string"))
    full = _fit(spark, CORPUS, 8)
    assert inc.merges == full.merges
    df = spark.createDataFrame([(0, CORPUS[1] + " lowest")],
                               "doc_id long, text string")
    assert (inc.transform(df).collect()[0]["tokens"]
            == full.transform(df).collect()[0]["tokens"])


def test_fit_update_chained_and_cold_load(spark, tmp_path):
    """Three chained batches equal one fit; the training state survives
    save/load so a cold-loaded tokenizer keeps absorbing batches."""
    parts = [CORPUS[:1], CORPUS[1:3], CORPUS[3:]]
    inc = _fit(spark, parts[0], 6)
    inc.fit_update(spark.createDataFrame(
        [(i, t) for i, t in enumerate(parts[1])], "doc_id long, text string"))
    inc.save_artifacts(str(tmp_path), spark=spark)
    cold = BpeTokenizer(num_merges=6)
    cold.load_artifacts(str(tmp_path), spark=spark)
    cold.fit_update(spark.createDataFrame(
        [(i, t) for i, t in enumerate(parts[2])], "doc_id long, text string"))
    full = _fit(spark, CORPUS, 6)
    assert cold.merges == full.merges


def test_fit_update_requires_fit(spark):
    df = spark.createDataFrame([(0, "x y")], "doc_id long, text string")
    with pytest.raises(ValueError, match="fit"):
        BpeTokenizer().fit_update(df)
