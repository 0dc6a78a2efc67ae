"""Token-level file skipping (operators/zorder.py file_token_bloom /
StatsIndex.token_bloom): per-file blooms over the DISTINCT TOKENS of a
text column serve all-terms text search by opening only the files
whose bloom holds every query token — the needle-in-100 TB grep.
Soundness: bloom = no false negatives, so a skipped file provably
lacks a query token; the row-level predicate makes the result exact.
Build and probe hash through the SAME JVM expression; the tokenizer is
the simplest portable contract (lowercase, split on ASCII
non-alphanumerics) so an oracle engine reproduces it exactly.
"""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from systems_spark.operators.zorder import (StatsIndex, file_token_bloom,
                                            token_bloom_pruned_files,
                                            token_search_read)
from systems_spark.state import StateStore


def _corpus(spark, path):
    """16 docs in 8 files; the token 'zebra' lives in exactly one doc,
    'qux' in two docs in two different files, 'common' everywhere."""
    rows = []
    for i in range(16):
        words = ["common", f"word{i}"]
        if i == 3:
            words.append("Zebra")           # case-folded at build
        if i in (5, 12):
            words.append("qux")
        rows.append((i, " ".join(words) + ", filler-text!"))
    df = spark.createDataFrame(rows, "doc_id long, body string")
    df.repartition(8, "doc_id").write.mode("overwrite").parquet(path)


def test_token_search_exact_and_skips_files(spark, tmp_path):
    path = str(tmp_path / "docs")
    _corpus(spark, path)
    bloom = file_token_bloom(spark, path, "body", bits_log2=14)
    n_files = bloom.count()
    assert n_files > 1

    kept = token_bloom_pruned_files(spark, bloom, "zebra", bits_log2=14)
    assert 0 < len(kept) < n_files          # real skipping happened
    got = token_search_read(spark, path, bloom, "body", "zebra",
                            bits_log2=14)
    assert [r.doc_id for r in got.collect()] == [3]

    # all-terms (AND) semantics: both tokens must be in the same doc
    got = token_search_read(spark, path, bloom, "body", "qux common",
                            bits_log2=14)
    assert sorted(r.doc_id for r in got.collect()) == [5, 12]
    got = token_search_read(spark, path, bloom, "body", "qux zebra",
                            bits_log2=14)
    assert got.count() == 0                  # no doc has both

    # absent token: zero files read, empty frame with the table schema
    got = token_search_read(spark, path, bloom, "body", "absenttoken",
                            bits_log2=14)
    assert got.count() == 0
    assert got.columns == ["doc_id", "body"]


def test_tokenizer_is_case_and_punct_insensitive(spark, tmp_path):
    path = str(tmp_path / "docs")
    _corpus(spark, path)
    bloom = file_token_bloom(spark, path, "body", bits_log2=14)
    # 'Zebra' in the doc, probed lowercase; punctuation splits tokens
    assert token_search_read(spark, path, bloom, "body", "ZEBRA",
                             bits_log2=14).count() == 1
    assert token_search_read(spark, path, bloom, "body", "filler",
                             bits_log2=14).count() == 16
    with pytest.raises(ValueError, match="tokenizes to nothing"):
        token_search_read(spark, path, bloom, "body", "!!!",
                          bits_log2=14)


def test_param_mismatch_raises(spark, tmp_path):
    path = str(tmp_path / "docs")
    _corpus(spark, path)
    bloom = file_token_bloom(spark, path, "body", bits_log2=14)
    with pytest.raises(ValueError, match="built with"):
        token_bloom_pruned_files(spark, bloom, "zebra", bits_log2=15)


def test_persisted_token_bloom_reuse_and_staleness(spark, tmp_path,
                                                   monkeypatch):
    path = str(tmp_path / "docs")
    _corpus(spark, path)
    root = str(tmp_path / "state")
    idx = StatsIndex(StateStore(root=root))
    assert idx.search_tokens(spark, path, "body", "zebra",
                             bits_log2=14).count() == 1

    # a fresh index instance must serve from the marker, not rebuild
    import systems_spark.operators.zorder as zz

    def boom(*a, **k):
        raise AssertionError("token bloom rebuilt on unchanged layout")

    monkeypatch.setattr(zz, "file_token_bloom", boom)
    idx2 = StatsIndex(StateStore(root=root))
    assert idx2.search_tokens(spark, path, "body", "zebra",
                              bits_log2=14).count() == 1
    monkeypatch.undo()

    # a rewrite moves the fingerprint: rebuild, new content served
    spark.createDataFrame([(99, "only zebra here")],
                          "doc_id long, body string") \
        .write.mode("overwrite").parquet(path)
    got = idx.search_tokens(spark, path, "body", "zebra", bits_log2=14)
    assert [r.doc_id for r in got.collect()] == [99]
