"""BM25 semantics on hand-built corpora: integer scoring verified against
an independent pure-Python implementation of the same quantization."""

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from systems_spark.operators.bm25 import BM25

M = 1_000_000
K1, B = 1_200_000, 750_000

CORPUS = [
    (1, "hash join fast"),
    (2, "hash hash hash table scan"),
    (3, "merge join sort join"),
    (4, "scan filter scan filter scan"),
    (5, "window"),
]


def _python_bm25(corpus, query_terms):
    docs = {i: t.split() for i, t in corpus}
    n = len(docs)
    avgdl = sum(len(t) for t in docs.values()) // n
    scores = {}
    for d, toks in docs.items():
        dl = len(toks)
        s = 0
        for t in set(query_terms):
            tf = toks.count(t)
            if tf == 0:
                continue
            df = sum(1 for ts in docs.values() if t in ts)
            idf = round(math.log((n - df + 0.5) / (df + 0.5) + 1.0) * M)
            ratio = (dl * M) // avgdl
            norm = M - B + (B * ratio) // M
            denom = tf * M + (K1 * norm) // M
            factor = (tf * (M + K1) * M) // denom
            s += (idf * factor) // M
        if s:
            scores[d] = s
    return scores


def _search(spark, corpus, qtext, topk=10):
    docs = spark.createDataFrame(corpus, "doc_id long, text string")
    qs = spark.createDataFrame([(1, qtext)], "query_id long, query_text string")
    bm = BM25().fit(docs)
    return {r.doc_id: (r.rank, r.score_micros)
            for r in bm.search(qs, topk=topk).collect()}


def test_scores_match_independent_python_bm25(spark):
    for q in ("hash join", "scan", "window merge", "absent terms only"):
        got = _search(spark, CORPUS, q)
        ref = _python_bm25(CORPUS, q.split())
        assert {d: s for d, (_, s) in got.items()} == ref, q
        # ranks follow (score desc, doc_id asc)
        order = sorted(ref.items(), key=lambda kv: (-kv[1], kv[0]))
        assert [d for d, _ in order] == [
            d for d, (r, _) in sorted(got.items(), key=lambda kv: kv[1][0])]


def test_rare_term_outweighs_common(spark):
    # 'window' appears in 1 doc, 'scan' in 2: doc 5 should top a
    # window-query; repeated-tf saturates (doc 2 ≠ 3x doc 1 for 'hash')
    got = _search(spark, CORPUS, "window")
    assert min(got, key=lambda d: got[d][0]) == 5
    hash_scores = {d: s for d, (_, s) in _search(spark, CORPUS, "hash").items()}
    assert hash_scores[2] < 3 * hash_scores[1]


def test_duplicate_query_terms_count_once(spark):
    a = _search(spark, CORPUS, "hash join")
    b = _search(spark, CORPUS, "hash hash join join")
    assert a == b


def test_long_document_does_not_overflow(spark):
    # dl >= 2148 overflowed int32 in (dl * 1e6) before the bigint widening
    long_doc = " ".join(["filler"] * 3000) + " hash"
    corpus = CORPUS + [(9, long_doc)]
    got = _search(spark, corpus, "hash")
    ref = _python_bm25(corpus, ["hash"])
    assert {d: s for d, (_, s) in got.items()} == ref
    assert all(s > 0 for _, s in got.values())


def test_save_load_roundtrip(spark, tmp_path):
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    qs = spark.createDataFrame([(1, "hash scan join")],
                               "query_id long, query_text string")
    bm = BM25().fit(docs)
    base = {(r.query_id, r.doc_id): (r.rank, r.score_micros)
            for r in bm.search(qs).collect()}
    bm.save_artifacts(str(tmp_path))
    fresh = BM25()
    fresh.load_artifacts(str(tmp_path), spark=spark)
    got = {(r.query_id, r.doc_id): (r.rank, r.score_micros)
           for r in fresh.search(qs).collect()}
    assert got == base


def test_partition_invariance(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    qs = spark.createDataFrame([(1, "hash scan join")],
                               "query_id long, query_text string")
    base = {(r.query_id, r.doc_id): (r.rank, r.score_micros)
            for r in BM25().fit(docs).search(qs).collect()}
    for n in (1, 7):
        got = {(r.query_id, r.doc_id): (r.rank, r.score_micros)
               for r in BM25().fit(docs.repartition(n)).search(qs).collect()}
        assert got == base


def test_min_idf_prune_keeps_surviving_term_scores(spark):
    """VERDICT r4 item 7: pruning sub-threshold (stopword) terms before
    the postings join leaves every surviving term's contribution
    bit-identical — the pruned search equals searching the query with the
    stopword textually removed."""
    docs = spark.createDataFrame(
        [(i, "the common filler text " + ("alpha " if i % 3 == 0 else "beta ")
          + f"tail{i % 5}") for i in range(30)], "doc_id long, text string")
    bm = BM25().fit(docs)
    # 'the' appears in every doc -> idf = ln((N-df+0.5)/(df+0.5)+1) is tiny
    idf = {r.h: r.idf_micros for r in bm._idf.collect()}
    from systems_spark.functions.hashing import hash64
    from pyspark.sql import functions as F
    h_the = spark.range(1).select(hash64(F.lit("the")).alias("h")).first().h
    thr = idf[h_the] + 1
    q = spark.createDataFrame([(1, "the alpha tail2")],
                              "query_id long, query_text string")
    q_stripped = spark.createDataFrame([(1, "alpha tail2")],
                                       "query_id long, query_text string")
    pruned = sorted(map(tuple, bm.search(q, topk=30,
                                         min_idf_micros=thr).collect()))
    stripped = sorted(map(tuple, bm.search(q_stripped, topk=30).collect()))
    full = sorted(map(tuple, bm.search(q, topk=30).collect()))
    assert pruned == stripped
    assert pruned != full  # the stopword really contributed before


def test_fit_update_equals_scratch_fit(spark):
    """Incremental index maintenance (r8): fit(corpus) + fit_update(batch)
    must score every query identically to fit(corpus ∪ batch) — the
    union of per-half tokenizations IS the whole-corpus tokenization, and
    idf/avgdl re-derive from the merged postings."""
    corpus = CORPUS[:3]
    batch = CORPUS[3:]
    docs_all = spark.createDataFrame(CORPUS, "doc_id long, text string")
    qs = spark.createDataFrame(
        [(1, "hash join"), (2, "scan window")],
        "query_id long, query_text string")
    scratch = {(r.query_id, r.doc_id): (r.rank, r.score_micros)
               for r in BM25().fit(docs_all).search(qs, topk=10).collect()}

    inc = BM25().fit(spark.createDataFrame(corpus, "doc_id long, text string"))
    inc.fit_update(spark.createDataFrame(batch, "doc_id long, text string"))
    got = {(r.query_id, r.doc_id): (r.rank, r.score_micros)
           for r in inc.search(qs, topk=10).collect()}
    assert got == scratch


def test_fit_update_rejects_reoffered_doc(spark):
    import pytest

    bm = BM25().fit(spark.createDataFrame(CORPUS, "doc_id long, text string"))
    dup = spark.createDataFrame([(3, "new text for doc three")],
                                "doc_id long, text string")
    with pytest.raises(ValueError, match="disjoint"):
        bm.fit_update(dup)
    bm.fit_update(dup, check_disjoint=False)  # opt-out path still runs


def test_with_postings_roundtrip(spark, tmp_path):
    """with_postings over a parquet-persisted postings table serves
    identically to the fitted index — the StateStore consumption shape."""
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    qs = spark.createDataFrame([(1, "hash join")],
                               "query_id long, query_text string")
    fitted = BM25().fit(docs)
    want = {(r.doc_id): (r.rank, r.score_micros)
            for r in fitted.search(qs).collect()}
    path = str(tmp_path / "postings")
    fitted._postings.write.parquet(path)
    served = BM25().with_postings(spark.read.parquet(path))
    got = {(r.doc_id): (r.rank, r.score_micros)
           for r in served.search(qs).collect()}
    assert got == want
