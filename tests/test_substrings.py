"""Cross-document duplicated-substring removal (dedup/substrings.py)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from systems_spark.dedup.substrings import remove_duplicate_substrings

BLOCK = "all rights reserved contact us about privacy terms of service"  # 10 tokens


def _run(spark, rows, k=8):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {r.doc_id: r for r in
            remove_duplicate_substrings(df, k=k).collect()}


def test_cross_doc_block_kept_once(spark):
    rows = [(1, f"unique opening one {BLOCK}"),
            (2, f"different story here {BLOCK}"),
            (3, f"third page text {BLOCK}"),
            (4, "no shared content whatsoever in this one at all")]
    got = _run(spark, rows, k=8)
    # canonical = global min (doc_id, pos): doc 1 keeps the block
    assert got[1].clean_text == f"unique opening one {BLOCK}"
    assert got[1].n_removed == 0
    # every other occurrence is removed wholly (coverage unions overlaps)
    assert got[2].clean_text == "different story here"
    assert got[3].clean_text == "third page text"
    assert got[2].n_removed == 10 and got[3].n_removed == 10
    assert got[4].n_removed == 0


def test_within_doc_repeat_removed(spark):
    text = f"{BLOCK} middle words now {BLOCK}"
    got = _run(spark, [(7, text)], k=8)
    assert got[7].clean_text == f"{BLOCK} middle words now"
    assert got[7].n_removed == 10


def test_short_doc_passes_through_ws_canonical(spark):
    got = _run(spark, [(1, "  too   short\tdoc "), (2, "too short doc")], k=8)
    # < k tokens: no window fits, even though the docs duplicate each other
    assert got[1].clean_text == "too short doc"
    assert got[1].n_removed == 0 and got[2].n_removed == 0


def test_overlapping_windows_merge(spark):
    # 12-token shared span: 5 overlapping 8-gram windows, one covered run
    span = "a b c d e f g h i j k l"
    got = _run(spark, [(1, f"x {span}"), (2, f"y {span} z")], k=8)
    assert got[1].n_removed == 0
    assert got[2].clean_text == "y z"
    assert got[2].n_removed == 12


def test_validation_and_empty_result(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        remove_duplicate_substrings(df, k=1)
    got = _run(spark, [(1, BLOCK), (2, BLOCK)], k=8)
    # doc 2 is removed entirely -> empty string, not NULL
    assert got[2].clean_text == "" and got[2].n_removed == 10
    assert got[1].clean_text == BLOCK


def test_partition_invariance(spark):
    rows = [(i, f"filler {i} " + (BLOCK if i % 3 == 0 else "solo words only"))
            for i in range(1, 30)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = sorted(map(tuple, remove_duplicate_substrings(df, k=8).collect()))
    b = sorted(map(tuple,
                   remove_duplicate_substrings(df.repartition(7), k=8)
                   .collect()))
    assert a == b


def test_canonical_windows_are_protected(spark):
    """Review r5 regression: overlapping duplicated grams with DIFFERENT
    canonical docs must not erase every copy of a gram — tokens inside a
    canonical window survive."""
    rows = [(0, "b c d e f g h i"),
            (1, "a b c d e f g h i"),
            (2, "a b c d e f g h")]
    got = _run(spark, rows, k=8)
    # doc0 holds the canonical 'b..i' window: untouched
    assert got[0].clean_text == "b c d e f g h i" and got[0].n_removed == 0
    # doc1 holds the canonical 'a..h' window (protected); only 'i' — part
    # of the non-canonical 'b..i' occurrence outside the protection — goes
    assert got[1].clean_text == "a b c d e f g h" and got[1].n_removed == 1
    # doc2's single window is non-canonical: removed wholly
    assert got[2].clean_text == "" and got[2].n_removed == 8
    # the invariant itself: every duplicated gram survives somewhere
    texts = " | ".join(r.clean_text for r in got.values())
    assert "a b c d e f g h" in texts and "b c d e f g h i" in texts


def test_parity_with_duckdb_on_protection_case(spark):
    import duckdb

    from systems_spark.dedup.substrings import remove_duplicate_substrings_sql

    rows = [(0, "b c d e f g h i"), (1, "a b c d e f g h i"),
            (2, "a b c d e f g h"), (3, BLOCK), (4, BLOCK),
            (5, f"x {BLOCK} y")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(map(tuple, remove_duplicate_substrings(df, k=8).collect()))
    vals = ",".join(f"({i}, '{t}')" for i, t in rows)
    want = sorted(map(tuple, duckdb.connect().execute(
        remove_duplicate_substrings_sql(
            f"SELECT * FROM (VALUES {vals}) t(id, text)", k=8)).fetchall()))
    assert got == want


def test_null_text_doc_matches_duckdb(spark):
    """ADVICE r5: n_tokens for a NULL-text doc must be NULL (as DuckDB
    yields), not the legacy size(NULL) = -1."""
    import duckdb

    from systems_spark.dedup.substrings import remove_duplicate_substrings_sql

    rows = [(0, BLOCK), (1, BLOCK), (2, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(map(tuple, remove_duplicate_substrings(df, k=8).collect()))
    vals = ",".join(
        f"({i}, " + ("NULL" if t is None else f"'{t}'") + ")" for i, t in rows)
    want = sorted(map(tuple, duckdb.connect().execute(
        remove_duplicate_substrings_sql(
            f"SELECT * FROM (VALUES {vals}) t(id, text)", k=8)).fetchall()))
    assert got == want
    by_id = {r[0]: r for r in got}
    assert by_id[2][2] is None  # n_tokens NULL, not -1


def _brute(rows, k):
    """Reference implementation of the protected-canonical semantics."""
    toks = {i: t.split() for i, t in rows}
    occ = {}
    for i, tk in sorted(toks.items()):
        for q in range(len(tk) - k + 1):
            occ.setdefault(tuple(tk[q:q + k]), []).append((i, q))
    covered, protected = set(), set()
    for g, sites in occ.items():
        if len(sites) < 2:
            continue
        first = min(sites)
        for p in range(k):
            protected.add((first[0], first[1] + p))
        for (d, q) in sites:
            if (d, q) == first:
                continue
            for p in range(k):
                covered.add((d, q + p))
    out = {}
    for i, tk in toks.items():
        rm = {p for (d, p) in (covered - protected) if d == i}
        kept = [t for p, t in enumerate(tk) if p not in rm]
        out[i] = (" ".join(kept), len(tk), len(rm))
    return out


from hypothesis import given, settings
from hypothesis import strategies as st

_words = st.sampled_from(list("abcdef"))


@settings(max_examples=8, deadline=None)
@given(docs=st.lists(st.lists(_words, min_size=0, max_size=12),
                     min_size=1, max_size=6),
       k=st.integers(2, 4))
def test_matches_bruteforce(spark, docs, k):
    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    got = {r.doc_id: (r.clean_text, r.n_tokens, r.n_removed)
           for r in _run(spark, rows, k=k).values()}
    assert got == _brute(rows, k)
