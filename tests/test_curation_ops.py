"""Semantics tests for the r4 corpus-curation lanes: PII redaction,
benchmark decontamination, repetition filters, mixture resampling, and
sequence packing. The oracle-parity test checks engine agreement; these
check the operators compute the RIGHT thing on hand-built inputs."""

import pytest
from pyspark.sql import functions as F


# -- PII --------------------------------------------------------------------

def test_pii_redact_known_strings(spark):
    from systems_spark.functions import pii

    df = spark.createDataFrame(
        [
            (1, "mail me at jane.doe+x@sub.example.org thanks"),
            (2, "server 192.168.0.1 and http://a.example/p?q=1#f here"),
            (3, "call +1 (555) 010-1234 now"),
            (4, "no pii in this sentence at all"),
            # URL embedding an '@' must be eaten as URL, not email
            (5, "see https://example.com/u@name/path today"),
        ],
        ["id", "t"],
    )
    counts = pii.pii_counts(F.col("t"))
    rows = {
        r["id"]: r
        for r in df.select(
            "id",
            pii.redact(F.col("t")).alias("red"),
            counts["email"].alias("n_email"),
            counts["url"].alias("n_url"),
            counts["ipv4"].alias("n_ip"),
            counts["phone"].alias("n_phone"),
        ).collect()
    }
    assert rows[1]["red"] == "mail me at <EMAIL> thanks"
    assert rows[1]["n_email"] == 1
    assert rows[2]["red"] == "server <IP> and <URL> here"
    assert (rows[2]["n_ip"], rows[2]["n_url"]) == (1, 1)
    assert rows[3]["red"] == "call <PHONE> now"
    assert rows[3]["n_phone"] == 1
    assert rows[4]["red"] == "no pii in this sentence at all"
    assert rows[5]["red"] == "see <URL> today"
    assert (rows[5]["n_url"], rows[5]["n_email"]) == (1, 0)


# -- decontamination --------------------------------------------------------

def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_decontaminate_flags_verbatim_overlap(spark):
    from systems_spark.dedup.decontaminate import decontaminate

    eval_text = "the quick brown fox jumps over the lazy dog"
    docs = _docs(spark, [
        (1, eval_text),                                  # verbatim eval doc
        (2, "completely different words entirely here now friends"),
        (3, "tiny"),                                     # < k tokens
    ])
    bench = _docs(spark, [(100, eval_text)])
    out = {r["doc_id"]: r for r in decontaminate(docs, bench, k=3,
                                                 threshold=0.5).collect()}
    assert out[1]["overlap_frac"] == 1.0 and out[1]["contaminated"]
    assert out[2]["n_overlap"] == 0 and not out[2]["contaminated"]
    # short doc preserved, zero-shingle row
    assert out[3]["n_shingles"] == 0 and out[3]["overlap_frac"] == 0.0
    assert not out[3]["contaminated"]


def test_decontaminate_partial_overlap_fraction(spark):
    from systems_spark.dedup.decontaminate import decontaminate

    # doc: 6 tokens -> 4 distinct 3-shingles; bench shares exactly the
    # first 3 tokens -> 1 shingle -> overlap 1/4
    docs = _docs(spark, [(1, "a b c d e f")])
    bench = _docs(spark, [(9, "a b c")])
    row = decontaminate(docs, bench, k=3, threshold=0.25).collect()[0]
    assert row["n_shingles"] == 4 and row["n_overlap"] == 1
    assert row["overlap_frac"] == 0.25 and row["contaminated"]


# -- repetition -------------------------------------------------------------

def test_repetition_stats_flags_repeated_ngrams(spark):
    from systems_spark.operators.repetition import repetition_stats

    docs = _docs(spark, [
        (1, "spam spam spam spam spam spam"),   # one bigram repeated 5x
        (2, "one two three four five six"),     # all bigrams unique
        (3, "x"),                               # < k tokens
    ])
    out = {r["doc_id"]: r for r in repetition_stats(docs, k=2).collect()}
    assert out[1]["top_frac"] == 1.0 and out[1]["dup_frac"] == 1.0
    assert out[1]["repetitive"]
    assert out[2]["n_ngrams"] == 5 and out[2]["dup_frac"] == 0.0
    assert not out[2]["repetitive"]
    assert out[3]["n_ngrams"] == 0 and not out[3]["repetitive"]


# -- mixture sampling -------------------------------------------------------

def test_mixture_sampler_hits_target_mixture(spark, tables):
    from systems_spark.operators.sampler import MixtureSampler

    docs = tables["documents"]
    op = MixtureSampler("doc_id", "source",
                        {"src0": 0.5, "src1": 0.25, "src2": 0.25})
    got = {r["source"]: r["n"] for r in
           op(docs).groupBy("source").agg(F.count("*").alias("n")).collect()}
    n0 = docs.where(F.col("source") == "src0").count()
    # uniform corpus → src0 is the scarcest-per-weight group → kept whole
    assert got["src0"] == n0
    # others target n0/2 each; hash sampling is binomial around the rate
    for s in ("src1", "src2"):
        assert abs(got[s] - n0 / 2) <= max(3, 0.5 * n0)
    # groups outside the mixture are dropped entirely
    assert set(got) == {"src0", "src1", "src2"}


def test_mixture_sampler_deterministic_and_partition_invariant(spark, tables):
    from systems_spark.operators.sampler import MixtureSampler

    docs = tables["documents"]
    op = MixtureSampler("doc_id", "source", {"src0": 0.4, "src3": 0.6})
    a = sorted(r["doc_id"] for r in op(docs).select("doc_id").collect())
    b = sorted(r["doc_id"] for r in
               op(docs.repartition(13)).select("doc_id").collect())
    assert a == b and len(a) > 0


def test_mixture_sampler_validates_weights(spark):
    from systems_spark.operators.sampler import MixtureSampler

    with pytest.raises(ValueError):
        MixtureSampler("id", "g", {})
    with pytest.raises(ValueError):
        MixtureSampler("id", "g", {"a": 0.0})


# -- sequence packing -------------------------------------------------------

def test_sequence_packer_layout_invariants(spark):
    from systems_spark.operators.packing import SequencePacker

    rows = [(i, (i * 37) % 300) for i in range(200)] + [(900, 0)]
    df = spark.createDataFrame(rows, ["doc_id", "n_tokens"])
    budget = 100
    out = SequencePacker("doc_id", "n_tokens", budget, n_shards=4)(df).collect()
    assert len(out) == len(rows)  # row-preserving

    by_shard = {}
    for r in sorted(out, key=lambda r: (r["shard"], r["doc_id"])):
        cum = by_shard.get(r["shard"], 0)
        # layout is exactly the running concatenation of the shard stream
        assert r["seq_in_shard"] == cum // budget
        assert r["begin_offset"] == cum % budget
        ntok = r["n_tokens"]
        want_span = 0 if ntok <= 0 else (cum + ntok - 1) // budget - cum // budget + 1
        assert r["n_seqs"] == want_span
        by_shard[r["shard"]] = cum + ntok

    zero = [r for r in out if r["doc_id"] == 900][0]
    assert zero["n_seqs"] == 0
    # a doc longer than the budget must span >= 2 sequences
    long_docs = [r for r in out if r["n_tokens"] > budget]
    assert long_docs and all(r["n_seqs"] >= 2 for r in long_docs)


def test_sequence_packer_validates_params(spark):
    from systems_spark.operators.packing import SequencePacker

    with pytest.raises(ValueError):
        SequencePacker("id", "n", 0)
    with pytest.raises(ValueError):
        SequencePacker("id", "n", 10, n_shards=0)


# -- boilerplate removal ----------------------------------------------------

def test_remove_boilerplate_drops_corpus_wide_repeats(spark):
    from systems_spark.operators.boilerplate import remove_boilerplate

    footer = "all rights reserved contact us terms of service"  # 8 words
    docs = _docs(spark, [
        (1, "unique prose about graphs and joins here now " + footer),
        (2, "different unique sentence with other words entirely too " + footer),
        (3, "third document body totally distinct content words also " + footer),
        (4, ""),  # empty doc must survive with empty clean_text
    ])
    out = {r["doc_id"]: r for r in
           remove_boilerplate(docs, seg_words=8, max_freq=2).collect()}
    # each doc = 2 segments: its unique 8 words + the shared footer (3x > 2)
    for i in (1, 2, 3):
        assert out[i]["n_segments"] == 2 and out[i]["n_kept"] == 1
        assert footer not in out[i]["clean_text"]
    assert out[1]["clean_text"] == "unique prose about graphs and joins here now"
    assert out[4]["n_segments"] == 0 and out[4]["clean_text"] == ""


def test_remove_boilerplate_preserves_segment_order(spark):
    from systems_spark.operators.boilerplate import remove_boilerplate

    # 3 segments of 2 words; middle one repeats in another doc 2 more times
    docs = _docs(spark, [
        (1, "aa bb XX YY cc dd"),
        (2, "XX YY"),
        (3, "XX YY"),
    ])
    out = {r["doc_id"]: r for r in
           remove_boilerplate(docs, seg_words=2, max_freq=2).collect()}
    assert out[1]["clean_text"] == "aa bb cc dd"  # order kept, middle gone
    assert out[2]["clean_text"] == "" and out[2]["n_kept"] == 0


def test_k_anonymity_report(spark):
    """Risky classes = exactly the quasi-identifier combos below k;
    empty report certifies k-anonymity; validation errors."""
    import pytest as _pt

    from systems_spark.functions.pii import k_anonymity_report

    rows = ([("DE", "A")] * 5 + [("DE", "B")] * 2 + [("FR", "A")] * 1)
    df = spark.createDataFrame(rows, "nation string, seg string")
    got = {(r.nation, r.seg): r.class_size
           for r in k_anonymity_report(df, ["nation", "seg"], k=5).collect()}
    assert got == {("DE", "B"): 2, ("FR", "A"): 1}
    assert k_anonymity_report(df, ["nation", "seg"], k=2).count() == 1
    with _pt.raises(ValueError, match="quasi_cols"):
        k_anonymity_report(df, [], k=5)
    with _pt.raises(ValueError, match="k must"):
        k_anonymity_report(df, ["nation"], k=1)
