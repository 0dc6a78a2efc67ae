"""DocumentChunker layout semantics on hand-built documents.

The oracle-parity test covers the graded query; these pin the integer
window layout against an independent Python reference, overlap coverage,
the empty-doc edge, and the zero-shuffle plan claim.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from systems_spark.operators.chunker import DocumentChunker


def _python_chunks(text, chunk, overlap):
    toks = text.split()
    stride = chunk - overlap
    if not toks:
        return []
    n = len(toks)
    k = 1 + max(0, -(-(n - chunk) // stride)) if n > chunk else 1
    out = []
    for i in range(k):
        w = toks[i * stride: i * stride + chunk]
        out.append((i, i * stride, len(w), " ".join(w)))
    return out


def _collect(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = DocumentChunker(**kw).transform(df).collect()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r.doc_id, []).append(
            (r.chunk_id, r.token_start, r.n_tokens, r.chunk_text))
    return {k: sorted(v) for k, v in by_doc.items()}


def test_layout_matches_python_reference(spark):
    rows = [
        (1, " ".join(f"t{i}" for i in range(25))),   # multi-chunk + ragged tail
        (2, " ".join(f"t{i}" for i in range(10))),   # exactly one chunk
        (3, "a b"),                                   # shorter than chunk
        (4, " ".join(f"t{i}" for i in range(20))),   # exact multiple boundary
    ]
    got = _collect(spark, rows, chunk_tokens=10, overlap=5)
    for did, text in rows:
        assert got[did] == _python_chunks(text, 10, 5), (did, got[did])


def test_empty_docs_yield_zero_chunks(spark):
    got = _collect(spark, [(1, ""), (2, "   "), (3, "one two")],
                   chunk_tokens=4, overlap=1)
    assert 1 not in got and 2 not in got
    assert got[3] == [(0, 0, 2, "one two")]


def test_overlap_gives_shared_context(spark):
    text = " ".join(f"t{i}" for i in range(12))
    got = _collect(spark, [(1, text)], chunk_tokens=8, overlap=4)[1]
    first, second = got[0][3].split(), got[1][3].split()
    assert first[-4:] == second[:4]          # shared overlap tokens
    assert second[0] == "t4"                 # stride = 4


def test_no_overlap_partitions_exactly(spark):
    text = " ".join(f"t{i}" for i in range(20))
    got = _collect(spark, [(1, text)], chunk_tokens=7, overlap=0)[1]
    rebuilt = " ".join(c[3] for c in got)
    assert rebuilt == text
    assert [c[2] for c in got] == [7, 7, 6]


def test_validation(spark):
    with pytest.raises(ValueError):
        DocumentChunker(chunk_tokens=0)
    with pytest.raises(ValueError):
        DocumentChunker(chunk_tokens=4, overlap=4)


def test_zero_shuffle_plan(spark):
    df = spark.createDataFrame([(1, "a b c d e")], "doc_id long, text string")
    plan = (DocumentChunker(chunk_tokens=2)
            .transform(df)._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan
