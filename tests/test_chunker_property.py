"""Property tests for DocumentChunker on randomized documents.

Algebraic guarantees, independent of any fixture:
- overlap=0: chunks partition the token stream exactly (lossless
  reassembly, sizes all `chunk` except a ragged tail);
- any overlap: every token position is covered, consecutive chunks start
  exactly `stride` apart, and the chunk count matches the closed-form
  integer formula.
"""

import os
import sys

from hypothesis import given, settings, strategies as st

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from systems_spark.operators.chunker import DocumentChunker

WORD = st.text(alphabet="abcxyz", min_size=1, max_size=4)
DOC = st.lists(WORD, min_size=0, max_size=40).map(" ".join)
PARAMS = st.tuples(st.integers(2, 9), st.integers(0, 8)).filter(
    lambda t: t[1] < t[0])  # (chunk, overlap), stride > 0


@settings(max_examples=8, deadline=None)
@given(docs=st.lists(DOC, min_size=1, max_size=8), params=PARAMS)
def test_layout_invariants(spark, docs, params):
    chunk, overlap = params
    stride = chunk - overlap
    rows = [(i, d) for i, d in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {}
    for r in DocumentChunker(chunk_tokens=chunk, overlap=overlap).transform(df).collect():
        got.setdefault(r.doc_id, []).append(r)
    for i, d in rows:
        toks = d.split()
        n = len(toks)
        chunks = sorted(got.get(i, []), key=lambda r: r.chunk_id)
        if n == 0:
            assert chunks == []
            continue
        k = 1 + max(0, -(-(n - chunk) // stride))
        assert [c.chunk_id for c in chunks] == list(range(k))
        covered = set()
        for c in chunks:
            assert c.token_start == c.chunk_id * stride
            w = toks[c.token_start:c.token_start + chunk]
            assert c.chunk_text == " ".join(w) and c.n_tokens == len(w)
            covered.update(range(c.token_start, c.token_start + c.n_tokens))
        assert covered == set(range(n))  # every token position appears
        if overlap == 0:
            assert " ".join(c.chunk_text for c in chunks) == " ".join(toks)
