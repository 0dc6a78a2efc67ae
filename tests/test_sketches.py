"""Portable HyperLogLog (functions/sketches.py)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from systems_spark.functions.sketches import (
    hll_distinct,
    hll_distinct_sql,
    hll_estimate,
    hll_merge,
    hll_registers,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "grp string, key long")


def test_estimate_accuracy_and_exactness_of_integers(spark):
    """p=8 → ~6.5% std error; 1000 distinct keys must estimate within
    20%, and n_buckets_used/s_int are exact integers."""
    rows = [("a", k) for k in range(1000) for _ in range(2)]  # dups ignored
    got = hll_distinct(_df(spark, rows), "key", ["grp"], p=8).collect()
    assert len(got) == 1
    r = got[0]
    assert abs(r.approx_distinct - 1000) / 1000 < 0.20
    assert 0 < r.n_buckets_used <= 256
    assert isinstance(r.s_int, int)


def test_small_range_linear_counting(spark):
    """A handful of keys lands in the linear-counting branch and is
    nearly exact."""
    rows = [("a", k) for k in range(10)]
    r = hll_distinct(_df(spark, rows), "key", ["grp"], p=8).collect()[0]
    assert abs(r.approx_distinct - 10) < 2


def test_merge_equals_whole(spark):
    """THE sketch property: registers built on two disjoint halves and
    merged give bit-identical estimates to registers built on the
    union."""
    rows = [("a", k) for k in range(500)] + [("b", k) for k in range(50)]
    half1 = [r for r in rows if r[1] % 2 == 0]
    half2 = [r for r in rows if r[1] % 2 == 1]
    whole = hll_registers(_df(spark, rows), "key", ["grp"], p=8)
    merged = hll_merge(
        hll_registers(_df(spark, half1), "key", ["grp"], p=8),
        hll_registers(_df(spark, half2), "key", ["grp"], p=8))
    est_w = {r.grp: (r.n_buckets_used, r.s_int, r.approx_distinct)
             for r in hll_estimate(whole, ["grp"], p=8).collect()}
    est_m = {r.grp: (r.n_buckets_used, r.s_int, r.approx_distinct)
             for r in hll_estimate(merged, ["grp"], p=8).collect()}
    assert est_w == est_m and set(est_w) == {"a", "b"}


def test_overlapping_merge_is_idempotent(spark):
    """Merging a sketch with itself changes nothing (max is idempotent) —
    re-ingesting a day's data cannot inflate the estimate."""
    regs = hll_registers(
        _df(spark, [("a", k) for k in range(200)]), "key", ["grp"], p=8)
    merged = hll_merge(regs, regs)
    a = hll_estimate(regs, ["grp"], p=8).collect()[0]
    b = hll_estimate(merged, ["grp"], p=8).collect()[0]
    assert (a.s_int, a.approx_distinct) == (b.s_int, b.approx_distinct)


def test_matches_duckdb_bit_for_bit(spark):
    import duckdb

    rows = ([("a", k) for k in range(300)]
            + [("b", k) for k in range(7)]
            + [("a", k) for k in range(100)])  # dups
    got = sorted(map(tuple, hll_distinct(
        _df(spark, rows), "key", ["grp"], p=8).collect()))
    vals = ",".join(f"('{g}', {k})" for g, k in rows)
    want = sorted(map(tuple, duckdb.connect().execute(hll_distinct_sql(
        f"SELECT * FROM (VALUES {vals}) t(grp, key)",
        "key", ["grp"], p=8)).fetchall()))
    assert got == want


def test_p_validation(spark):
    with pytest.raises(ValueError):
        hll_registers(_df(spark, [("a", 1)]), "key", ["grp"], p=3)
    with pytest.raises(ValueError):
        hll_distinct_sql("SELECT 1", "key", ["grp"], p=15)


def test_sql_group_alias_handling(spark):
    """Review r6: lowercase 'as' aliases resolve; an unaliased
    non-identifier expression raises instead of emitting broken SQL."""
    import duckdb

    rows = [("aa", k) for k in range(40)] + [("ab", k) for k in range(5)]
    vals = ",".join(f"('{g}', {k})" for g, k in rows)
    got = duckdb.connect().execute(hll_distinct_sql(
        f"SELECT * FROM (VALUES {vals}) t(grp, key)", "key",
        ["substr(grp, 1, 1) as g1"], p=8)).fetchall()
    assert len(got) == 1 and got[0][0] == "a"
    with pytest.raises(ValueError):
        hll_distinct_sql("SELECT 1", "key", ["substr(grp, 1, 1)"])


def test_hll_plan_has_single_md5(spark):
    """Review r6: bucket+rank reference the hash 4x — the fence must
    keep the md5 to ONE evaluation per row (same discipline as CMS)."""
    plan = hll_registers(
        _df(spark, [("a", 1)]), "key", ["grp"], p=8) \
        ._jdf.queryExecution().executedPlan().toString()
    assert plan.count("md5") == 1


# --- Count-Min sketch ----------------------------------------------------

from systems_spark.functions.sketches import (  # noqa: E402
    cms_counters,
    cms_counters_sql,
    cms_lookup,
    cms_lookup_sql,
    cms_merge,
)


def _keys(spark, ids):
    return spark.createDataFrame([(k,) for k in ids], "key long")


def test_cms_never_underestimates_and_is_tight_when_wide(spark):
    """One-sided error: est >= exact for every key; with width >> keys,
    collisions are rare and most estimates are exact."""
    import collections

    rows = [("x", k % 50) for k in range(500)]  # key k appears 10 times
    exact = collections.Counter(k for _, k in rows)
    df = _df(spark, rows)
    ctr = cms_counters(df, "key", depth=4, width=4096)
    est = {r.key: r.est_n for r in cms_lookup(
        ctr, _keys(spark, range(50)), "key", depth=4, width=4096).collect()}
    assert all(est[k] >= exact[k] for k in exact)
    assert sum(est[k] == exact[k] for k in exact) >= 45  # mostly exact


def test_cms_merge_equals_whole(spark):
    rows = [("x", k % 20) for k in range(200)]
    half1, half2 = rows[:100], rows[100:]
    whole = cms_counters(_df(spark, rows), "key", depth=3, width=256)
    merged = cms_merge(
        cms_counters(_df(spark, half1), "key", depth=3, width=256),
        cms_counters(_df(spark, half2), "key", depth=3, width=256))
    k = _keys(spark, range(20))
    a = {r.key: r.est_n for r in cms_lookup(
        whole, k, "key", depth=3, width=256).collect()}
    b = {r.key: r.est_n for r in cms_lookup(
        merged, k, "key", depth=3, width=256).collect()}
    assert a == b


def test_cms_absent_key_estimates_small(spark):
    rows = [("x", k % 10) for k in range(100)]
    ctr = cms_counters(_df(spark, rows), "key", depth=4, width=4096)
    est = {r.key: r.est_n for r in cms_lookup(
        ctr, _keys(spark, [999_999]), "key", depth=4, width=4096).collect()}
    assert est[999_999] == 0  # wide sketch, no collisions


def test_cms_matches_duckdb_bit_for_bit(spark):
    import duckdb

    rows = [("x", k % 17) for k in range(300)]
    ctr = cms_counters(_df(spark, rows), "key", depth=4, width=512)
    got = sorted(
        (r.key, r.est_n) for r in cms_lookup(
            ctr, _keys(spark, range(25)), "key",
            depth=4, width=512).collect())
    vals = ",".join(f"({k})" for _, k in rows)
    kvals = ",".join(f"({k})" for k in range(25))
    csql = cms_counters_sql(
        f"SELECT * FROM (VALUES {vals}) t(key)", "key", depth=4, width=512)
    want = sorted(map(tuple, duckdb.connect().execute(cms_lookup_sql(
        csql, f"SELECT * FROM (VALUES {kvals}) t(key)", "key",
        depth=4, width=512)).fetchall()))
    assert got == want


def test_streaming_hll_registers_match_batch(spark, tmp_path):
    """Incremental register maintenance: a two-batch drain produces the
    SAME register table as the batch builder over all events, and the
    same estimate — one sketch, two runtimes. Re-delivering batch 1's
    keys in batch 2 (at-least-once replay) must not change anything
    (max is idempotent)."""
    import os as _os
    import time as _time

    from systems_spark.functions.sketches import hll_estimate
    from systems_spark.streaming import streaming_hll_registers

    rows = [("a", k) for k in range(300)] + [("b", k) for k in range(40)]
    b1 = rows[:170]
    b2 = rows[170:] + rows[:30]  # replayed duplicates
    src = str(tmp_path / "hllsrc")
    _os.makedirs(src)
    for i, batch in enumerate([b1, b2]):
        p = f"{src}/b{i}.parquet"
        _df(spark, batch).coalesce(1).write.mode("overwrite").parquet(p)
        t = _time.time() + i * 10
        for root, _, files in _os.walk(p):
            for f in files:
                _os.utime(_os.path.join(root, f), (t, t))
    stream = (spark.readStream.schema("grp string, key long")
              .option("maxFilesPerTrigger", "1").parquet(src + "/*"))
    q = (streaming_hll_registers(stream, "key", ["grp"], p=8)
         .writeStream.outputMode("complete").format("memory")
         .queryName("hllregs").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {(r.grp, r.bucket): r.register
           for r in spark.sql("SELECT * FROM hllregs").collect()}
    want = {(r.grp, r.bucket): r.register
            for r in hll_registers(_df(spark, rows), "key",
                                   ["grp"], p=8).collect()}
    assert got == want
    est_s = {r.grp: r.approx_distinct for r in hll_estimate(
        spark.sql("SELECT * FROM hllregs"), ["grp"], p=8).collect()}
    est_b = {r.grp: r.approx_distinct for r in hll_estimate(
        hll_registers(_df(spark, rows), "key", ["grp"], p=8),
        ["grp"], p=8).collect()}
    assert est_s == est_b


from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_CORPUS = st.lists(
    st.tuples(st.sampled_from(["a", "b"]), st.integers(0, 400)),
    min_size=1, max_size=120)


@settings(max_examples=6, deadline=None)
@given(rows=_CORPUS, cut=st.integers(0, 119))
def test_hll_merge_equals_whole_property(spark, rows, cut):
    """For ANY corpus and ANY split point, merged half-sketches equal
    the whole-corpus sketch bit-for-bit."""
    from systems_spark.functions.sketches import hll_estimate, hll_merge

    cut = min(cut, len(rows) - 1)
    h1, h2 = rows[:cut] or [rows[0]], rows[cut:] or [rows[-1]]
    merged = hll_merge(
        hll_registers(_df(spark, h1), "key", ["grp"], p=6),
        hll_registers(_df(spark, h2), "key", ["grp"], p=6))
    # compare against exactly h1+h2 (the empty-half fallbacks above can
    # make h1+h2 differ from rows)
    whole = hll_registers(_df(spark, h1 + h2), "key", ["grp"], p=6)
    w = {r.grp: (r.n_buckets_used, r.s_int, r.approx_distinct)
         for r in hll_estimate(whole, ["grp"], p=6).collect()}
    m = {r.grp: (r.n_buckets_used, r.s_int, r.approx_distinct)
         for r in hll_estimate(merged, ["grp"], p=6).collect()}
    assert w == m


@settings(max_examples=6, deadline=None)
@given(rows=st.lists(st.integers(0, 60), min_size=1, max_size=150))
def test_cms_never_underestimates_property(spark, rows):
    """One-sided error on ANY corpus: est >= exact for every key."""
    import collections

    exact = collections.Counter(rows)
    df = _df(spark, [("x", k) for k in rows])
    ctr = cms_counters(df, "key", depth=3, width=64)  # small → collisions
    est = {r.key: r.est_n for r in cms_lookup(
        ctr, _keys(spark, sorted(exact)), "key",
        depth=3, width=64).collect()}
    assert all(est[k] >= exact[k] for k in exact)


def test_cms_validation(spark):
    with pytest.raises(ValueError):
        cms_counters(_df(spark, [("a", 1)]), "key", depth=0)
    with pytest.raises(ValueError):
        cms_counters(_df(spark, [("a", 1)]), "key", width=1000)  # not 2^k
    with pytest.raises(ValueError):
        cms_lookup_sql("SELECT 1", "SELECT 1", "key", depth=9)


# --- HDR histogram quantile sketch ---------------------------------------

from systems_spark.functions.sketches import (  # noqa: E402
    hdr_buckets,
    hdr_buckets_sql,
    hdr_merge,
    hdr_quantiles,
    hdr_quantiles_sql,
)


def _vdf(spark, vals, grp="a"):
    return spark.createDataFrame([(grp, v) for v in vals], "grp string, v long")


def _true_q(vals, p):
    """Type-1 discrete quantile, 1-based ceil(p*n) — the contract
    hdr_quantiles targets."""
    s = sorted(vals)
    k = -(-len(s) * int(round(p * 1_000_000)) // 1_000_000)
    return s[max(k, 1) - 1]


def test_hdr_error_bound_and_exact_small_values(spark):
    """The sketch guarantee: est <= true < est*(1 + 2^-sb); values below
    2^(sb+1) are bucketed exactly (est == true)."""
    sb = 5
    big = [(k * k * 7919 + 13) % 10_000_000 for k in range(400)]
    small = list(range(60))  # all < 2^(sb+1) = 64 → exact buckets
    for vals in (big, small):
        b = hdr_buckets(_vdf(spark, vals), "v", ["grp"], sb=sb)
        r = hdr_quantiles(b, ["grp"], [0.5, 0.9, 0.99], sb=sb).collect()[0]
        assert r.n_rows == len(vals)
        for p, est in ((0.5, r.p5), (0.9, r.p9), (0.99, r.p99)):
            true = _true_q(vals, p)
            assert est <= true, (p, est, true)
            assert true <= est * (1 + 2.0 ** -sb), (p, est, true)
            if max(vals) < (1 << (sb + 1)):
                assert est == true, (p, est, true)


def test_hdr_merge_equals_whole(spark):
    """Mergeability: buckets built on two halves and merged give
    bit-identical quantiles to buckets built on the union."""
    vals = [(k * 2654435761) % 5_000_000 for k in range(500)]
    whole = hdr_buckets(_vdf(spark, vals), "v", ["grp"], sb=5)
    merged = hdr_merge(
        hdr_buckets(_vdf(spark, vals[::2]), "v", ["grp"], sb=5),
        hdr_buckets(_vdf(spark, vals[1::2]), "v", ["grp"], sb=5))
    qw = sorted(map(tuple, hdr_quantiles(whole, ["grp"], [0.5, 0.99],
                                         sb=5).collect()))
    qm = sorted(map(tuple, hdr_quantiles(merged, ["grp"], [0.5, 0.99],
                                         sb=5).collect()))
    assert qw == qm


def test_hdr_matches_duckdb_bit_for_bit(spark):
    import duckdb

    vals = ([3, 17, 64, 65, 1023, 1024, 123456789, 2**52 + 7]
            + [(k * 48271) % 900_000 for k in range(200)])
    got = sorted(map(tuple, hdr_quantiles(
        hdr_buckets(_vdf(spark, vals), "v", ["grp"], sb=5),
        ["grp"], [0.5, 0.9, 0.99], sb=5).collect()))
    rows = ",".join(f"('a', {v})" for v in vals)
    sql = hdr_quantiles_sql(
        hdr_buckets_sql(f"SELECT * FROM (VALUES {rows}) t(grp, v)",
                        "v", ["grp"], sb=5),
        ["grp"], [0.5, 0.9, 0.99], sb=5)
    want = sorted(map(tuple, duckdb.connect().execute(sql).fetchall()))
    assert got == want


def test_hdr_bucket_monotone_in_value(spark):
    """idx must be monotone non-decreasing in v (cumulative counts locate
    quantiles only if bucketing preserves order) — checked over a dense
    sweep crossing several band boundaries, plus exactness below 2^sb."""
    vals = list(range(0, 4096)) + [2**40, 2**40 + 1, 2**59]
    from pyspark.sql import functions as F
    from systems_spark.functions.sketches import _hdr_idx_spark

    df = _vdf(spark, vals).select(
        "v", F.expr(_hdr_idx_spark("v", 4)).alias("idx")).collect()
    pairs = sorted((r.v, r.idx) for r in df)
    for (v0, i0), (v1, i1) in zip(pairs, pairs[1:]):
        assert i0 <= i1, (v0, i0, v1, i1)
    for v, i in pairs:
        if v < 16:
            assert i == v


def test_hdr_negative_raises_and_validation(spark):
    with pytest.raises(Exception, match="negative"):
        hdr_buckets(_vdf(spark, [5, -1]), "v", ["grp"], sb=5).collect()
    with pytest.raises(ValueError):
        hdr_buckets(_vdf(spark, [1]), "v", ["grp"], sb=1)
    with pytest.raises(ValueError):
        hdr_quantiles_sql("SELECT 1", ["grp"], [1.5], sb=5)
    with pytest.raises(ValueError):
        hdr_merge()


def test_hdr_null_values_excluded(spark):
    rows = [("a", 10), ("a", None), ("a", 20), ("a", 30)]
    df = spark.createDataFrame(rows, "grp string, v long")
    b = hdr_buckets(df, "v", ["grp"], sb=5)
    r = hdr_quantiles(b, ["grp"], [0.5], sb=5).collect()[0]
    assert r.n_rows == 3 and r.p5 == 20


# --- Bloom filter --------------------------------------------------------


def _bkeys(spark, names):
    return spark.createDataFrame([(n,) for n in names], "key string")


def test_bloom_no_false_negatives(spark):
    """EVERY inserted key answers 1 — the guarantee that makes the
    filter safe as a join pruner (a false negative would silently drop
    join rows)."""
    from systems_spark.functions.sketches import bloom_bits, bloom_contains

    ins = [f"k{i}" for i in range(200)]
    blm = bloom_bits(_bkeys(spark, ins), "key", k=4, m_bits=1 << 12)
    got = {r.key: r.maybe_present
           for r in bloom_contains(blm, _bkeys(spark, ins), "key",
                                   k=4, m_bits=1 << 12).collect()}
    assert all(got[k] == 1 for k in ins)


def test_bloom_false_positive_rate_sane(spark):
    """Absent keys mostly answer 0 at a comfortable m/n ratio (k=4,
    n=100, m=4096 → theoretical FP ≈ 0.2%); a saturated tiny filter
    answers 1 often — both ends sanity-checked."""
    from systems_spark.functions.sketches import bloom_bits, bloom_contains

    ins = [f"in{i}" for i in range(100)]
    absent = [f"out{i}" for i in range(300)]
    blm = bloom_bits(_bkeys(spark, ins), "key", k=4, m_bits=1 << 12)
    got = [r.maybe_present
           for r in bloom_contains(blm, _bkeys(spark, absent), "key",
                                   k=4, m_bits=1 << 12).collect()]
    assert sum(got) <= 10  # generous: ~0.6 expected
    tiny = bloom_bits(_bkeys(spark, ins), "key", k=1, m_bits=64)
    sat = [r.maybe_present
           for r in bloom_contains(tiny, _bkeys(spark, absent), "key",
                                   k=1, m_bits=64).collect()]
    assert sum(sat) > 200  # 64 bits for 100 keys ≈ saturated


def test_bloom_merge_equals_whole(spark):
    """OR-merge of two half filters equals the filter over the union,
    word-for-word (the mergeability law)."""
    from systems_spark.functions.sketches import bloom_bits, bloom_merge

    names = [f"k{i}" for i in range(120)]
    whole = sorted(map(tuple, bloom_bits(
        _bkeys(spark, names), "key", k=3, m_bits=1 << 10).collect()))
    a = bloom_bits(_bkeys(spark, names[:60]), "key", k=3, m_bits=1 << 10)
    b = bloom_bits(_bkeys(spark, names[60:]), "key", k=3, m_bits=1 << 10)
    merged = sorted(map(tuple, bloom_merge(a, b).collect()))
    assert merged == whole


def test_bloom_matches_duckdb_bit_for_bit(spark):
    import duckdb

    from systems_spark.functions.sketches import (
        bloom_bits,
        bloom_bits_sql,
        bloom_contains,
        bloom_contains_sql,
    )

    ins = [f"k{i}" for i in range(50)]
    probe = [f"k{i}" for i in range(100)]
    blm = bloom_bits(_bkeys(spark, ins), "key", k=4, m_bits=1 << 10)
    got_b = sorted(map(tuple, blm.collect()))
    got_c = sorted(map(tuple, bloom_contains(
        blm, _bkeys(spark, probe), "key", k=4, m_bits=1 << 10).collect()))
    vals = ",".join(f"('{k}')" for k in ins)
    pvals = ",".join(f"('{k}')" for k in probe)
    bs = bloom_bits_sql(f"SELECT * FROM (VALUES {vals}) t(key)", "key",
                        k=4, m_bits=1 << 10)
    want_b = sorted(duckdb.connect().execute(bs).fetchall())
    cs = bloom_contains_sql(bs, f"SELECT * FROM (VALUES {pvals}) t(key)",
                            "key", k=4, m_bits=1 << 10)
    want_c = sorted(duckdb.connect().execute(cs).fetchall())
    assert got_b == want_b
    assert got_c == want_c


def test_bloom_words_positive_and_bounded(spark):
    """63-bit words: every word id < ceil(m/63), every bits value
    strictly positive (bit 63 never used — the cross-engine overflow
    fence)."""
    from systems_spark.functions.sketches import bloom_bits

    rows = bloom_bits(_bkeys(spark, [f"k{i}" for i in range(500)]),
                      "key", k=8, m_bits=1 << 10).collect()
    assert all(0 <= r.word <= (1 << 10) // 63 for r in rows)
    assert all(r.bits > 0 for r in rows)


def test_bloom_validation(spark):
    from systems_spark.functions.sketches import (
        bloom_bits,
        bloom_bits_sql,
        bloom_contains_sql,
        bloom_merge,
    )

    df = _bkeys(spark, ["a"])
    with pytest.raises(ValueError):
        bloom_bits(df, "key", k=0)
    with pytest.raises(ValueError):
        bloom_bits(df, "key", k=9)
    with pytest.raises(ValueError):
        bloom_bits(df, "key", k=4, m_bits=100)  # not a power of two
    with pytest.raises(ValueError):
        bloom_bits_sql("SELECT 1", "key", k=4, m_bits=32)  # < 64
    with pytest.raises(ValueError):
        bloom_contains_sql("SELECT 1", "SELECT 1", "key", k=0)
    with pytest.raises(ValueError):
        bloom_merge()


# --- HLL overlap (inclusion-exclusion) -----------------------------------


def test_hll_overlap_accuracy(spark):
    """300 ∪ 400 with a 100-key intersection: every estimate within HLL
    error of truth, overlap non-negative; the union estimate never
    exceeds est_a + est_b."""
    from systems_spark.functions.sketches import hll_overlap

    rows = ([("a", k) for k in range(300)]
            + [("b", k) for k in range(200, 600)])
    r = hll_overlap(spark.createDataFrame(rows, "lbl string, key long"),
                    "key", "lbl", "a", "b", p=10).collect()[0]
    assert abs(r.est_a - 300) / 300 < 0.15
    assert abs(r.est_b - 400) / 400 < 0.15
    assert abs(r.est_union - 600) / 600 < 0.15
    assert r.est_overlap >= 0.0
    assert r.est_union <= r.est_a + r.est_b


def test_hll_overlap_disjoint_and_identical(spark):
    """Disjoint sets → overlap near 0 (clamped at 0 exactly when
    inclusion-exclusion dips negative); identical sets → union equals
    each side bit-for-bit, overlap equals the single-set estimate."""
    from systems_spark.functions.sketches import hll_overlap

    dis = ([("a", k) for k in range(200)]
           + [("b", k) for k in range(1000, 1200)])
    r = hll_overlap(spark.createDataFrame(dis, "lbl string, key long"),
                    "key", "lbl", "a", "b", p=10).collect()[0]
    assert r.est_overlap < 0.15 * 200
    same = ([("a", k) for k in range(150)]
            + [("b", k) for k in range(150)])
    r2 = hll_overlap(spark.createDataFrame(same, "lbl string, key long"),
                     "key", "lbl", "a", "b", p=10).collect()[0]
    assert r2.est_a == r2.est_b == r2.est_union
    assert r2.est_overlap == r2.est_a


def test_hll_overlap_matches_duckdb_bit_for_bit(spark):
    import duckdb

    from systems_spark.functions.sketches import hll_overlap, hll_overlap_sql

    rows = ([(1993, k) for k in range(120)]
            + [(1995, k) for k in range(60, 180)])
    got = tuple(hll_overlap(
        spark.createDataFrame(rows, "y int, key long"),
        "key", "y", 1993, 1995, p=8).collect()[0])
    vals = ",".join(f"({y}, {k})" for y, k in rows)
    want = duckdb.connect().execute(hll_overlap_sql(
        f"SELECT * FROM (VALUES {vals}) t(y, key)", "key", "y",
        1993, 1995, p=8)).fetchall()[0]
    assert got == want


def test_hll_overlap_label_escaping_and_validation(spark):
    import duckdb

    from systems_spark.functions.sketches import hll_overlap, hll_overlap_sql

    rows = [("it's", 1), ("it's", 2), ("other", 2)]
    got = tuple(hll_overlap(
        spark.createDataFrame(rows, "lbl string, key long"),
        "key", "lbl", "it's", "other", p=8).collect()[0])
    vals = ",".join(f"('{l.replace(chr(39), chr(39) * 2)}', {k})"
                    for l, k in rows)
    want = duckdb.connect().execute(hll_overlap_sql(
        f"SELECT * FROM (VALUES {vals}) t(lbl, key)", "key", "lbl",
        "it's", "other", p=8)).fetchall()[0]
    assert got == want
    with pytest.raises(ValueError):
        hll_overlap_sql("SELECT 1", "key", "lbl", 1.5, "b")


def test_hll_overlap_double_label_column_and_sentinel_labels(spark):
    """The review-r6 silent-NULL scenario: int labels against a DOUBLE
    label column must estimate, not pivot to NULL; and a label equal to
    an internal tag value ('u') must not collide with the union row."""
    import duckdb

    from systems_spark.functions.sketches import hll_overlap, hll_overlap_sql

    rows = [(1995.0, k) for k in range(80)] + [(2001.0, k) for k in range(40, 120)]
    r = hll_overlap(spark.createDataFrame(rows, "y double, key long"),
                    "key", "y", 1995, 2001, p=8).collect()[0]
    assert r.est_a is not None and r.est_b is not None
    assert r.est_overlap > 0
    srows = [("u", k) for k in range(50)] + [("b", k) for k in range(25, 75)]
    got = tuple(hll_overlap(
        spark.createDataFrame(srows, "lbl string, key long"),
        "key", "lbl", "u", "b", p=8).collect()[0])
    vals = ",".join(f"('{l}', {k})" for l, k in srows)
    want = duckdb.connect().execute(hll_overlap_sql(
        f"SELECT * FROM (VALUES {vals}) t(lbl, key)", "key", "lbl",
        "u", "b", p=8)).fetchall()[0]
    assert got == want
    assert got[0] is not None and abs(got[0] - 50) / 50 < 0.2
    with pytest.raises(ValueError):
        hll_overlap(spark.createDataFrame(srows, "lbl string, key long"),
                    "key", "lbl", "x", "x")


def test_bloom_m_bits_capped_at_probe_hash_range(spark):
    from systems_spark.functions.sketches import bloom_bits

    with pytest.raises(ValueError):
        bloom_bits(_bkeys(spark, ["a"]), "key", k=2, m_bits=1 << 31)
