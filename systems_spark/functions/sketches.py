"""Portable mergeable sketches — HyperLogLog with a bit-exact SQL twin.

Flajolet, Fusy, Gandouet, Meunier, "HyperLogLog: the analysis of a
near-optimal cardinality estimation algorithm" (AofA 2007). Spark has
``approx_count_distinct`` (a JVM HLL++), but its register state is
opaque: it cannot be persisted as a table, merged across days/sources,
or replayed by an independent engine. At 100 TB the profile you
actually operate is INCREMENTAL — per-partition register tables that
merge by ``max`` — so this module keeps the registers as plain rows:

    registers:  (group..., bucket, register)   -- m = 2^p rows max per group
    merge:      union → groupBy(group, bucket).agg(max(register))
    estimate:   one map-side-combined aggregation over the registers

Everything derives from the portable 60-bit md5 hash
(functions/hashing.py), so the whole sketch — bucket assignment, rank
(leading-zero count), register maxima, and the integer-scaled harmonic
sum — is reproducible bit-for-bit in DuckDB. The estimator's harmonic
sum is computed as an INTEGER (``sum(2^(R - register))`` with R the
max rank; ≤ m·2^R ≤ 2^61, exact in int64 in both engines), so the only
floating-point steps are one division and the small-range ``ln`` — both
rounded before output, like every transcendental in this repo.

100 TB shape: building registers is ONE hash aggregation shuffling
(group, bucket, rank) rows — at most m per group survive the map-side
combine, regardless of input rows; the estimate aggregates m rows per
group. No distinct, no wide state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from systems_spark.functions.hashing import hash64, hash64_sql

HASH_BITS = 60  # hash64 yields 15 hex chars = 60 bits


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def _check_p(p: int) -> None:
    if not 4 <= p <= 14:
        raise ValueError("p must be in [4, 14]")


def hll_bucket_rank(hash_col, p: int = 8):
    """(bucket, rank) column pair from a MATERIALIZED hash64 column —
    the per-row kernel the batch builder and the streaming register
    maintainer share. bucket = low ``p`` hash bits; rank = leading-zero
    count of the remaining ``60 - p`` bits + 1. Must receive a real
    column reference (fence the hash first): bucket and rank together
    reference it 4×, and ProjectCollapsing would re-inline the md5 into
    each (the functions/fence.py discipline — review r6)."""
    _check_p(p)
    m = 1 << p
    w_bits = HASH_BITS - p
    bucket = hash_col % m
    w = F.shiftright(hash_col, p)
    # rank: for w > 0, (w_bits - bit_length(w)) leading zeros + 1; the
    # bit length of a positive int is the length of its base-2 string
    # (conv() emits no leading zeros). w == 0 → all-zero suffix → rank
    # w_bits + 1.
    rank = F.when(w > 0, F.lit(w_bits + 1) - F.length(F.conv(w, 10, 2))) \
            .otherwise(F.lit(w_bits + 1))
    return bucket, rank


def hll_registers(df: DataFrame, key_col: str, group_cols: "list[str]",
                  p: int = 8) -> DataFrame:
    """(group..., bucket, register): the HLL register table for the
    distinct count of ``key_col`` per group. Only touched buckets appear
    (absent bucket ≡ register 0). Works on batch AND streaming frames
    (the fence's Generate and the aggregation are both stream-safe)."""
    from systems_spark.functions.fence import fence_columns

    hashed = fence_columns(df.select(*group_cols, key_col),
                           _hh=hash64(F.col(key_col)))
    bucket, rank = hll_bucket_rank(F.col("_hh"), p)
    return (hashed.select(*group_cols, bucket.alias("bucket"),
                          rank.alias("_rank"))
            .groupBy(*group_cols, "bucket")
            .agg(F.max("_rank").cast("long").alias("register")))


def hll_registers_sql(source_sql: str, key_expr: str,
                      group_exprs: "list[str]", p: int = 8) -> str:
    """DuckDB twin of :func:`hll_registers`. ``group_exprs`` are
    SELECT-able expressions (aliased columns ok)."""
    _check_p(p)
    m = 1 << p
    w_bits = HASH_BITS - p
    h = hash64_sql(key_expr)
    gsel = ", ".join(group_exprs)
    gby = ", ".join(str(i + 1) for i in range(len(group_exprs)))
    return f"""
SELECT {gsel}, ({h}) % {m} AS bucket,
       max(CASE WHEN (({h}) >> {p}) > 0
                THEN {w_bits + 1} - {_bitlen_duckdb(f"(({h}) >> {p})")}
                ELSE {w_bits + 1} END)::BIGINT AS register
FROM ({source_sql})
GROUP BY {gby}, bucket
"""


def hll_merge(*register_tables: DataFrame) -> DataFrame:
    """Merge register tables (identical schemas): union → max per
    (group..., bucket). The mergeability that makes the sketch usable
    incrementally — per-day/per-source sketches combine without
    touching raw data."""
    if not register_tables:
        raise ValueError("need at least one register table")
    out = register_tables[0]
    for t in register_tables[1:]:
        out = out.unionByName(t)
    keys = [c for c in out.columns if c != "register"]
    return out.groupBy(*keys).agg(F.max("register").alias("register"))


def hll_estimate(registers: DataFrame, group_cols: "list[str]",
                 p: int = 8, out_col: str = "approx_distinct") -> DataFrame:
    """Per-group HLL estimate from a register table.

    Integer-scaled harmonic sum: with R = max rank = 60 - p + 1,
    ``s_int = Σ_buckets 2^(R - register)`` (absent buckets contribute
    2^R each) is EXACT in int64; raw estimate = α·m²·2^R / s_int is one
    double division of exact integers. Small-range correction (raw ≤
    2.5m with empty buckets): linear counting m·ln(m/zeros). No
    large-range correction — the 60-bit hash space makes collision
    correction irrelevant below ~2^55 distinct keys. Output rounded to
    4 decimals (the repo's transcendental-output contract); the exact
    integers (``n_buckets_used``, ``s_int``) are emitted alongside so
    the oracle comparison is anchored on integers."""
    _check_p(p)
    m = 1 << p
    r = HASH_BITS - p + 1
    a_const = _alpha(m) * m * m * float(1 << r)  # exact: α·m²·2^R
    used = F.count(F.lit(1))
    # shiftleft's shift operand must be an expression, not a python int,
    # so go through F.expr (the pyspark wrapper only accepts int)
    s_present = F.sum(F.expr(
        f"shiftleft(CAST(1 AS BIGINT), CAST({r} - register AS INT))"))
    agg = registers.groupBy(*group_cols).agg(
        used.cast("long").alias("n_buckets_used"),
        s_present.cast("long").alias("_s_present"))
    zeros = F.lit(m) - F.col("n_buckets_used")
    s_int = (F.col("_s_present")
             + zeros * F.lit(1 << r).cast("long")).alias("s_int")
    withs = agg.select(*group_cols, "n_buckets_used", s_int)
    raw = F.lit(a_const) / F.col("s_int").cast("double")
    zeros2 = F.lit(m) - F.col("n_buckets_used")
    est = F.when((raw <= 2.5 * m) & (zeros2 > 0),
                 F.lit(float(m)) * F.log(F.lit(float(m)) /
                                         zeros2.cast("double"))) \
           .otherwise(raw)
    return withs.select(*group_cols, "n_buckets_used", "s_int",
                        F.round(est, 4).alias(out_col))


def hll_estimate_sql(registers_sql: str, group_exprs: "list[str]",
                     p: int = 8, out_col: str = "approx_distinct") -> str:
    """DuckDB twin of :func:`hll_estimate` — ``registers_sql`` yields
    (group..., bucket, register)."""
    _check_p(p)
    m = 1 << p
    r = HASH_BITS - p + 1
    a_const = _alpha(m) * m * m * float(1 << r)
    gsel = ", ".join(group_exprs)
    gby = ", ".join(str(i + 1) for i in range(len(group_exprs)))
    return f"""
WITH regs AS ({registers_sql}),
agg AS (
  SELECT {gsel}, count(*)::BIGINT AS n_buckets_used,
         (sum((1::BIGINT << ({r} - register))::BIGINT)
          + ({m} - count(*)) * (1::BIGINT << {r}))::BIGINT AS s_int
  FROM regs GROUP BY {gby}
)
SELECT {gsel}, n_buckets_used, s_int,
       round(CASE WHEN ({a_const!r} / s_int::DOUBLE) <= {2.5 * m}
                   AND {m} - n_buckets_used > 0
                  THEN {float(m)!r} * ln({float(m)!r} /
                                         ({m} - n_buckets_used)::DOUBLE)
                  ELSE {a_const!r} / s_int::DOUBLE END, 4)::DOUBLE
         AS {out_col}
FROM agg
"""


def hll_distinct(df: DataFrame, key_col: str, group_cols: "list[str]",
                 p: int = 8, out_col: str = "approx_distinct") -> DataFrame:
    """registers → estimate in one call (the non-incremental path)."""
    return hll_estimate(hll_registers(df, key_col, group_cols, p),
                        group_cols, p, out_col)


# --- Count-Min sketch ----------------------------------------------------
# Cormode & Muthukrishnan, "An improved data stream summary: the
# count-min sketch and its applications" (J. Algorithms 2005). The
# frequency twin of HLL: d×w integer counters answer "how often did key
# k appear" with one-sided error (NEVER an underestimate; overestimate
# ≤ 2N/w with prob ≥ 1 − 2^−d). Counters are plain rows that merge by
# SUM — per-day sketches combine without raw data, like HLL registers.
#
# Row hashes use Kirsch–Mitzenmeyer double hashing ("Less hashing, same
# performance", ESA 2006): ONE portable md5 per key split into
# (h1, h2), row r probing bucket (h1 + r·h2) mod w with h2 forced odd
# (coprime to the power-of-two width, so the probe sequence never
# collapses). Measured 4× cheaper than d independent salted md5s on the
# counter build — the md5 is the hot instruction at corpus scale — and
# still bit-replayable in DuckDB.


def _check_cms(depth: int, width: int) -> None:
    if not 1 <= depth <= 8:
        raise ValueError("depth must be in [1, 8]")
    if width < 2 or width & (width - 1):
        raise ValueError("width must be a power of two >= 2")


def _cms_hash(key):
    """The ONE md5 per key the probe rows derive from."""
    return hash64(F.concat(F.lit("cms:"), key.cast("string")))


def _cms_h12_from(h):
    """(h1, h2) from a MATERIALIZED hash column: h1 = low 30 bits'
    residue, h2 = next 29 bits forced odd. Max probe value
    h1 + 7·h2 < 2^34 — exact int64 in both engines. Must receive a real
    column reference (fence the hash first), not the md5 expression
    inline — both outputs reference it, and re-inlining would compute
    the md5 twice per row."""
    h1 = h % (1 << 30)
    h2 = (F.shiftright(h, 30) % (1 << 29)) * 2 + 1
    return h1, h2


_CMS_H12_SQL = (
    "SELECT {cols} ({h}) % 1073741824 AS _h1, "
    "((({h}) >> 30) % 536870912) * 2 + 1 AS _h2 FROM {src}"
)


def _cms_h12_sql(src: str, key_expr: str, extra_cols: str = "",
                 prefix: str = "cms:") -> str:
    h = hash64_sql(f"'{prefix}' || CAST({key_expr} AS VARCHAR)")
    return _CMS_H12_SQL.format(cols=extra_cols, h=h, src=src)


def _cms_probes(df: DataFrame, key_col: str, depth: int, width: int,
                keep_key: bool) -> DataFrame:
    """The shared (row, bucket) probe stream the counter build AND the
    lookup derive from — ONE fenced md5 per key, d derived probes; a
    single definition so build and lookup can never probe different
    buckets (review r6). The hash is FENCED so ProjectCollapsing cannot
    re-inline the md5 into every probe expr — that would silently
    restore the d-md5 cost the double hashing removes."""
    from systems_spark.functions.fence import fence_columns

    _check_cms(depth, width)
    hashed = fence_columns(df.select(key_col),
                           _ch=_cms_hash(F.col(key_col)))
    h1, h2 = _cms_h12_from(F.col("_ch"))
    lead = [key_col] if keep_key else []
    return hashed.select(*lead, F.posexplode(F.array(*[
        (h1 + r * h2) % width for r in range(depth)
    ])).alias("row", "bucket"))


def cms_counters(df: DataFrame, key_col: str, depth: int = 4,
                 width: int = 4096) -> DataFrame:
    """(row, bucket, n): the d×w counter table for the frequency of
    ``key_col`` values. ONE aggregation shuffling ≤ d·w rows after the
    map-side combine, regardless of input size. Merge sketches by
    union → groupBy(row, bucket).sum(n)."""
    return (_cms_probes(df, key_col, depth, width, keep_key=False)
            .groupBy("row", "bucket")
            .agg(F.count(F.lit(1)).alias("n")))


def cms_counters_sql(source_sql: str, key_expr: str, depth: int = 4,
                     width: int = 4096) -> str:
    """DuckDB twin of :func:`cms_counters`."""
    _check_cms(depth, width)
    rows = " UNION ALL ".join(
        f"SELECT {r} AS row, (_h1 + {r} * _h2) % {width} AS bucket"
        f" FROM hashed"
        for r in range(depth))
    return f"""
WITH src AS ({source_sql}),
hashed AS ({_cms_h12_sql('src', key_expr)}),
pairs AS ({rows})
SELECT row, bucket, count(*)::BIGINT AS n
FROM pairs GROUP BY 1, 2
"""


def cms_merge(*counter_tables: DataFrame) -> DataFrame:
    """Merge counter tables: union → sum per (row, bucket)."""
    if not counter_tables:
        raise ValueError("need at least one counter table")
    out = counter_tables[0]
    for t in counter_tables[1:]:
        out = out.unionByName(t)
    return out.groupBy("row", "bucket").agg(F.sum("n").alias("n"))


def cms_lookup(counters: DataFrame, keys: DataFrame, key_col: str,
               depth: int = 4, width: int = 4096,
               out_col: str = "est_n") -> DataFrame:
    """Estimated frequency for every row of ``keys``: min over the d
    rows of the counter each key hashes to (absent counter ≡ 0). The
    counter table is ≤ d·w rows, so it broadcasts; keys never
    shuffle."""
    probes = _cms_probes(keys, key_col, depth, width, keep_key=True)
    joined = probes.join(F.broadcast(counters), on=["row", "bucket"],
                         how="left")
    return (joined.groupBy(key_col)
            .agg(F.min(F.coalesce(F.col("n"), F.lit(0)))
                 .cast("long").alias(out_col)))


def cms_lookup_sql(counters_sql: str, keys_sql: str, key_col: str,
                   depth: int = 4, width: int = 4096,
                   out_col: str = "est_n") -> str:
    """DuckDB twin of :func:`cms_lookup` — ``keys_sql`` yields
    (``key_col``)."""
    _check_cms(depth, width)
    probes = " UNION ALL ".join(
        f"SELECT {key_col}, {r} AS row, (_h1 + {r} * _h2) % {width}"
        f" AS bucket FROM khashed"
        for r in range(depth))
    return f"""
WITH counters AS ({counters_sql}),
keys AS ({keys_sql}),
khashed AS ({_cms_h12_sql('keys', key_col, extra_cols=key_col + ',')}),
probes AS ({probes})
SELECT p.{key_col}, min(coalesce(c.n, 0))::BIGINT AS {out_col}
FROM probes p LEFT JOIN counters c ON c.row = p.row AND c.bucket = p.bucket
GROUP BY 1
"""


def _sql_label_literal(v) -> str:
    if isinstance(v, bool) or not isinstance(v, (int, str)):
        raise ValueError("labels must be int or str")
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    return str(v)


def hll_overlap(df: DataFrame, key_col: str, label_col: str,
                label_a, label_b, p: int = 8) -> DataFrame:
    """One row (est_a, est_b, est_union, est_overlap): audience overlap
    between two labeled key sets by inclusion–exclusion over HLL
    registers — |A∩B| ≈ |A| + |B| − |A∪B|, where the union estimate
    comes from MERGING the two register tables (max per bucket), never
    from touching raw keys twice. The sketch-algebra answer to "how
    many users did both": at 100 TB each side is one register build
    (≤ 2^p rows), and the union is free — the reason mergeable
    registers beat ``approx_count_distinct``'s opaque state. Overlap is
    clamped at 0 (inclusion–exclusion of estimates can go slightly
    negative); all four outputs are rounded doubles on exact integer
    anchors, replayed bit-for-bit in DuckDB by
    :func:`hll_overlap_sql`.

    Labels are rewritten to internal tags ('a'/'b'/'u') BEFORE the
    register build, so label values never meet any sentinel string and
    no cross-engine string-cast of the label column is needed (an int
    label against a double column used to pivot to NULL silently —
    review r6). Labels must be equality-comparable to the column's
    type in both engines."""
    _check_p(p)
    if label_a == label_b:
        raise ValueError("label_a and label_b must differ")
    tag = (F.when(F.col(label_col) == F.lit(label_a), F.lit("a"))
           .when(F.col(label_col) == F.lit(label_b), F.lit("b")))
    pair = (df.select(tag.alias("_lbl"), F.col(key_col).alias("_k"))
            .where(F.col("_lbl").isNotNull()))
    # pinned: two consumers (its own label rows + the union relabel) —
    # without the pin the register aggregation runs twice
    regs = hll_registers(pair, "_k", ["_lbl"], p) \
        .localCheckpoint(eager=False)
    union_regs = regs.select(F.lit("u").alias("_lbl"),
                             "bucket", "register")
    merged = hll_merge(regs, union_regs)
    est = hll_estimate(merged, ["_lbl"], p)
    piv = est.groupBy().agg(
        F.max(F.when(F.col("_lbl") == "a",
                     F.col("approx_distinct"))).alias("est_a"),
        F.max(F.when(F.col("_lbl") == "b",
                     F.col("approx_distinct"))).alias("est_b"),
        F.max(F.when(F.col("_lbl") == "u",
                     F.col("approx_distinct"))).alias("est_union"))
    overlap = F.greatest(
        F.round(F.col("est_a") + F.col("est_b") - F.col("est_union"), 4),
        F.lit(0.0))
    return piv.select("est_a", "est_b", "est_union",
                      overlap.alias("est_overlap"))


def hll_overlap_sql(source_sql: str, key_expr: str, label_expr: str,
                    label_a, label_b, p: int = 8) -> str:
    """DuckDB twin of :func:`hll_overlap` — the same tag rewrite, so
    label values are compared against the column with its native type
    and never meet a sentinel."""
    _check_p(p)
    if label_a == label_b:
        raise ValueError("label_a and label_b must differ")
    sa, sb = _sql_label_literal(label_a), _sql_label_literal(label_b)
    pair = (f"SELECT * FROM (SELECT CASE"
            f" WHEN ({label_expr}) = {sa} THEN 'a'"
            f" WHEN ({label_expr}) = {sb} THEN 'b' END AS _lbl,"
            f" {key_expr} AS _k FROM ({source_sql}))"
            f" WHERE _lbl IS NOT NULL")
    regs = hll_registers_sql(pair, "_k", ["_lbl"], p)
    # `oregs` computes the register build ONCE; hll_estimate_sql wraps
    # its input in its own `regs` CTE, which may reference the earlier
    # outer CTE but must not share its name (self-collision)
    merged = """SELECT _lbl, bucket, max(register) AS register FROM (
  SELECT _lbl, bucket, register FROM oregs
  UNION ALL
  SELECT 'u' AS _lbl, bucket, register FROM oregs
) GROUP BY 1, 2"""
    est = hll_estimate_sql(merged, ["_lbl"], p)
    return f"""
WITH oregs AS ({regs}),
est AS ({est}),
piv AS (
  SELECT max(CASE WHEN _lbl = 'a' THEN approx_distinct END) AS est_a,
         max(CASE WHEN _lbl = 'b' THEN approx_distinct END) AS est_b,
         max(CASE WHEN _lbl = 'u' THEN approx_distinct END) AS est_union
  FROM est
)
SELECT est_a, est_b, est_union,
       greatest(round(est_a + est_b - est_union, 4), 0.0)::DOUBLE
         AS est_overlap
FROM piv
"""


# --- Bloom filter ---------------------------------------------------------
# Bloom, "Space/time trade-offs in hash coding with allowable errors"
# (CACM 1970). The membership member of the sketch family (HLL =
# distinct, CMS = frequency, HDR = quantiles): k probe bits over an
# m-bit array answer "might key x be in this set" with NO false
# negatives and a false-positive rate ≈ (1 − e^{−kn/m})^k. The array is
# plain (word, bits) int64 rows — ≤ ceil(m/63) rows no matter how many
# keys went in — merging by bitwise OR. This is the runtime-filter /
# semi-join-pushdown shape at 100 TB: build over the dim side's join
# keys, broadcast the tiny word table, prune fact rows BEFORE the
# shuffle (no false negatives = the join result is exactly preserved;
# false positives only cost shuffle rows, never correctness).
#
# Same Kirsch–Mitzenmeyer double hashing as CMS (one fenced md5 per
# key under a 'bloom:' prefix for family independence; probe r hits
# bit (h1 + r·h2) mod m, h2 odd so the sequence never collapses on the
# power-of-two m). WORDS HOLD 63 BITS (word = pos div 63, bit =
# pos mod 63): bit index 63 would need 1<<63, which DuckDB's BIGINT
# shift rejects as overflow and Spark wraps negative — 63-bit words
# keep every word positive and bit-identical in both engines.


def _check_bloom(k: int, m_bits: int) -> None:
    if not 1 <= k <= 8:
        raise ValueError("k must be in [1, 8]")
    if m_bits < 64 or m_bits & (m_bits - 1):
        raise ValueError("m_bits must be a power of two >= 64")
    # probe positions derive from 30-bit h1/h2: a larger m would leave
    # the upper bits permanently zero, silently doubling the FP rate
    # instead of halving it (review r6)
    if m_bits > 1 << 30:
        raise ValueError("m_bits must be <= 2^30 (30-bit probe hashes)")


def _bloom_hash(key):
    """The ONE md5 per key the k probe bits derive from."""
    return hash64(F.concat(F.lit("bloom:"), key.cast("string")))


def _bloom_probes(df: DataFrame, key_col: str, k: int, m_bits: int,
                  keep_key: bool) -> DataFrame:
    """The shared (word, bit) probe stream the build AND the membership
    check derive from — one definition so they can never probe
    different bits (the _cms_probes discipline). Hash FENCED for the
    same reason: ProjectCollapsing would otherwise re-inline the md5
    into every probe expression."""
    from systems_spark.functions.fence import fence_columns

    _check_bloom(k, m_bits)
    hashed = fence_columns(df.select(key_col),
                           _bh=_bloom_hash(F.col(key_col)))
    h1, h2 = _cms_h12_from(F.col("_bh"))
    lead = [key_col] if keep_key else []
    pos = F.explode(F.array(*[
        (h1 + r * h2) % m_bits for r in range(k)
    ])).alias("_pos")
    return (hashed.select(*lead, pos)
            .select(*lead, F.expr("_pos DIV 63").alias("word"),
                    (F.col("_pos") % 63).cast("int").alias("bit")))


def bloom_bits(df: DataFrame, key_col: str, k: int = 4,
               m_bits: int = 1 << 14) -> DataFrame:
    """(word, bits): the Bloom filter word table for the set of
    ``key_col`` values — ≤ ceil(m/63) rows after ONE map-side-combined
    aggregation, regardless of input size. Absent word ≡ all-zero.
    Merge filters (same k, m) with :func:`bloom_merge`."""
    return (_bloom_probes(df, key_col, k, m_bits, keep_key=False)
            .groupBy("word")
            .agg(F.bit_or(F.expr(
                "shiftleft(CAST(1 AS BIGINT), bit)")).alias("bits")))


def bloom_bits_sql(source_sql: str, key_expr: str, k: int = 4,
                   m_bits: int = 1 << 14) -> str:
    """DuckDB twin of :func:`bloom_bits`."""
    _check_bloom(k, m_bits)
    rows = " UNION ALL ".join(
        f"SELECT (_h1 + {r} * _h2) % {m_bits} AS pos FROM hashed"
        for r in range(k))
    return f"""
WITH src AS ({source_sql}),
hashed AS ({_cms_h12_sql('src', key_expr, prefix='bloom:')}),
pos AS ({rows})
SELECT pos // 63 AS word,
       bit_or(1::BIGINT << (pos % 63)::INT)::BIGINT AS bits
FROM pos GROUP BY 1
"""


def bloom_merge(*word_tables: DataFrame) -> DataFrame:
    """Merge word tables (same k and m_bits): union → OR per word."""
    if not word_tables:
        raise ValueError("need at least one word table")
    out = word_tables[0]
    for t in word_tables[1:]:
        out = out.unionByName(t)
    return out.groupBy("word").agg(F.bit_or("bits").alias("bits"))


def bloom_contains(bloom: DataFrame, keys: DataFrame, key_col: str,
                   k: int = 4, m_bits: int = 1 << 14,
                   out_col: str = "maybe_present") -> DataFrame:
    """(key, maybe_present 0/1) for every row of ``keys``: 1 iff ALL k
    probe bits are set (the no-false-negative side: every inserted key
    answers 1). The word table is ≤ ceil(m/63) rows, so it broadcasts;
    keys never shuffle wide."""
    probes = _bloom_probes(keys, key_col, k, m_bits, keep_key=True)
    joined = probes.join(F.broadcast(bloom), on="word", how="left")
    bit_set = F.expr("(shiftright(coalesce(bits, CAST(0 AS BIGINT)), bit)"
                     " & CAST(1 AS BIGINT))")
    return (joined.groupBy(key_col)
            .agg(F.min(bit_set).cast("long").alias(out_col)))


def bloom_contains_sql(bloom_sql: str, keys_sql: str, key_col: str,
                       k: int = 4, m_bits: int = 1 << 14,
                       out_col: str = "maybe_present") -> str:
    """DuckDB twin of :func:`bloom_contains` — ``keys_sql`` yields
    (``key_col``)."""
    _check_bloom(k, m_bits)
    probes = " UNION ALL ".join(
        f"SELECT {key_col}, (_h1 + {r} * _h2) % {m_bits} AS pos"
        f" FROM khashed"
        for r in range(k))
    return f"""
WITH blm AS ({bloom_sql}),
keys AS ({keys_sql}),
khashed AS ({_cms_h12_sql('keys', key_col, extra_cols=key_col + ',',
                          prefix='bloom:')}),
probes AS ({probes}),
wp AS (SELECT {key_col}, pos // 63 AS word, (pos % 63)::INT AS bit
       FROM probes)
SELECT wp.{key_col},
       min((coalesce(b.bits, 0::BIGINT) >> wp.bit) & 1)::BIGINT
         AS {out_col}
FROM wp LEFT JOIN blm b ON b.word = wp.word
GROUP BY 1
"""


# --- HDR histogram quantile sketch ---------------------------------------
# The quantile member of the sketch family (HLL = distinct, CMS =
# frequency): a log-scaled histogram in the HdrHistogram tradition
# (Tene, hdrhistogram.org; the same bucket law DDSketch formalizes —
# Masson, Rim, Lee, VLDB 2019, with a guaranteed RELATIVE error). A
# nonnegative integer value v (this repo's micros discipline supplies
# one for any metric) maps to
#
#     idx = v                                    if v < 2^sb
#           ((msb − sb)·2^sb) + (v >> (msb − sb)) otherwise
#
# with msb = floor(log2 v) and sb the sub-bucket bits: the top 1+sb
# significant bits survive, so each bucket spans a relative width of
# 2^−sb (sb=5 → ≤ 3.2% error), values below 2^sb are EXACT, and idx is
# monotone in v — cumulative bucket counts locate any quantile. The
# sketch is a plain (group…, idx, n) row table: merge = union → sum
# (per-day/per-source sketches combine without raw data, like HLL
# registers and CMS counters), and every step — bucket law, cumulative
# scan, ceil-rank targeting — is integer arithmetic replayed bit-for-bit
# in DuckDB.
#
# vs the two existing quantile paths: exact_quantiles (GlobalRank) pays
# three jobs and moves the needed buckets; percentile_approx is one
# pass but its GK sketch state is opaque (not persistable/mergeable
# across engines). This is the 100 TB monitoring shape: ONE map-side-
# combined aggregation whose shuffled state is ≤ ~(64−sb)·2^sb tiny
# rows per group, persistable as parquet, with a GUARANTEED 2^−sb
# relative error (GK's guarantee is on rank, not value).


def _check_sb(sb: int) -> None:
    if not 2 <= sb <= 12:
        raise ValueError("sb must be in [2, 12]")


# the ONE bit-length idiom both sketch families build on (HLL's rank =
# leading zeros derives from it via w_bits − bitlen; HDR's msb is
# bitlen − 1) — a single definition per engine so the families can
# never drift (hll_bucket_rank's Column-API form is the same conv()
# construction, cross-checked by its own plan test)
def _bitlen_spark(e: str) -> str:
    """Bit length of a POSITIVE integer expression (conv emits no
    leading zeros)."""
    return f"length(conv({e}, 10, 2))"


def _bitlen_duckdb(e: str) -> str:
    return f"length(ltrim(bin({e}), '0'))"


def _hdr_idx_spark(v: str, sb: int) -> str:
    m = 1 << sb
    msb = f"({_bitlen_spark(v)} - 1)"
    sh = f"({msb} - {sb})"
    return (f"CASE WHEN {v} < 0 THEN"
            f" CAST(raise_error('hdr: negative value') AS BIGINT)"
            f" WHEN {v} < {m} THEN {v}"
            f" ELSE CAST({sh} AS BIGINT) * {m} + shiftright({v}, {sh}) END")


def _hdr_idx_duckdb(v: str, sb: int) -> str:
    m = 1 << sb
    msb = f"({_bitlen_duckdb(v)} - 1)"
    sh = f"({msb} - {sb})"
    return (f"CASE WHEN {v} < 0 THEN error('hdr: negative value')::BIGINT"
            f" WHEN {v} < {m} THEN {v}"
            f" ELSE ({sh})::BIGINT * {m} + ({v} >> ({sh})) END")


def _hdr_lo_spark(idx: str, sb: int) -> str:
    """Bucket lower bound (the reported quantile estimate): exact value
    for idx < 2^(sb+1), else top · 2^band with band = idx div 2^sb − 1,
    top = idx − band·2^sb. True quantile ∈ [lo, lo·(1 + 2^−sb))."""
    m = 1 << sb
    band = f"({idx} DIV {m} - 1)"
    return (f"CASE WHEN {idx} < {m} THEN {idx}"
            f" ELSE shiftleft({idx} - {band} * {m}, CAST({band} AS INT)) END")


def _hdr_lo_duckdb(idx: str, sb: int) -> str:
    m = 1 << sb
    band = f"({idx} // {m} - 1)"
    return (f"CASE WHEN {idx} < {m} THEN {idx}"
            f" ELSE ({idx} - {band} * {m}) << ({band}) END")


def hdr_buckets(df: DataFrame, value_col: str, group_cols: "list[str]",
                sb: int = 5) -> DataFrame:
    """(group..., idx, n): the HDR bucket table of nonnegative integer
    ``value_col`` per group. NULLs are excluded (quantile semantics);
    negative values raise in-expression (both engines). ONE map-side-
    combined aggregation — at most ~(64−sb)·2^sb rows per group survive
    regardless of input size."""
    _check_sb(sb)
    pruned = df.select(*group_cols, value_col) \
        .where(F.col(value_col).isNotNull())
    return (pruned
            .select(*group_cols,
                    F.expr(_hdr_idx_spark(value_col, sb)).alias("idx"))
            .groupBy(*group_cols, "idx")
            .agg(F.count(F.lit(1)).alias("n")))


def hdr_buckets_sql(source_sql: str, value_expr: str,
                    group_exprs: "list[str]", sb: int = 5) -> str:
    """DuckDB twin of :func:`hdr_buckets`."""
    _check_sb(sb)
    gsel = ", ".join(group_exprs)
    gby = ", ".join(str(i + 1) for i in range(len(group_exprs)))
    return f"""
SELECT {gsel}, {_hdr_idx_duckdb(value_expr, sb)} AS idx,
       count(*)::BIGINT AS n
FROM ({source_sql})
WHERE {value_expr} IS NOT NULL
GROUP BY {gby}, idx
"""


def hdr_merge(*bucket_tables: DataFrame) -> DataFrame:
    """Merge bucket tables (identical schemas): union → sum per
    (group..., idx)."""
    if not bucket_tables:
        raise ValueError("need at least one bucket table")
    out = bucket_tables[0]
    for t in bucket_tables[1:]:
        out = out.unionByName(t)
    keys = [c for c in out.columns if c != "n"]
    return out.groupBy(*keys).agg(F.sum("n").alias("n"))


def _p_micros(ps: "list[float]") -> "list[int]":
    out = []
    for p in ps:
        pm = int(round(p * 1_000_000))
        if not 0 < pm <= 1_000_000:
            raise ValueError(f"p={p} outside (0, 1]")
        out.append(pm)
    return out


def hdr_quantiles(buckets: DataFrame, group_cols: "list[str]",
                  ps: "list[float]", sb: int = 5) -> DataFrame:
    """Per-group quantile estimates from a bucket table: for each p the
    LOWER BOUND of the bucket holding order statistic ceil(p·n) (type-1
    discrete quantile, 1-based) — true value ∈ [est, est·(1 + 2^−sb)).
    Output: one row per group, ``n_rows`` + one BIGINT ``p<digits>``
    column per p. The cumulative scan runs on the aggregated bucket
    table (≤ ~(64−sb)·2^sb rows per group), never on raw data."""
    from systems_spark.operators.global_rank import _p_label

    _check_sb(sb)
    pms = _p_micros(ps)
    wc = Window.partitionBy(*group_cols).orderBy("idx") \
        .rowsBetween(Window.unboundedPreceding, 0)
    wt = Window.partitionBy(*group_cols)
    lo = _hdr_lo_spark("idx", sb)
    cum = buckets.withColumn("_cum", F.sum("n").over(wc)) \
        .withColumn("_tot", F.sum("n").over(wt))
    aggs = [F.max("_tot").cast("long").alias("n_rows")]
    for p, pm in zip(ps, pms):
        # _tot widened before the ×pm: a >9·10¹²-row group would wrap
        # the int64 product (review — the repo's widen-before-multiply
        # class); decimal(38,0) matches the twin's HUGEINT
        k = (f"CAST((CAST(_tot AS DECIMAL(38,0)) * {pm} + 999999)"
             f" DIV 1000000 AS BIGINT)")
        aggs.append(F.min(F.when(F.col("_cum") >= F.expr(k),
                                 F.expr(lo))).cast("long")
                    .alias(_p_label(p)))
    return cum.groupBy(*group_cols).agg(*aggs)


def hdr_quantiles_sql(buckets_sql: str, group_names: "list[str]",
                      ps: "list[float]", sb: int = 5) -> str:
    """DuckDB twin of :func:`hdr_quantiles` — ``buckets_sql`` yields
    (group..., idx, n) with plain-identifier group columns."""
    from systems_spark.operators.global_rank import _p_label

    _check_sb(sb)
    pms = _p_micros(ps)
    gsel = ", ".join(group_names)
    lo = _hdr_lo_duckdb("idx", sb)
    cols = []
    for p, pm in zip(ps, pms):
        k = f"((_tot::HUGEINT * {pm} + 999999) // 1000000)"
        cols.append(f"min(CASE WHEN _cum >= {k} THEN {lo} END)::BIGINT"
                    f" AS {_p_label(p)}")
    sel = ",\n       ".join(cols)
    return f"""
WITH b AS ({buckets_sql}),
cum AS (
  SELECT *, sum(n) OVER (PARTITION BY {gsel} ORDER BY idx
                         ROWS UNBOUNDED PRECEDING) AS _cum,
         sum(n) OVER (PARTITION BY {gsel}) AS _tot
  FROM b
)
SELECT {gsel}, max(_tot)::BIGINT AS n_rows,
       {sel}
FROM cum GROUP BY {gsel}
"""


def hll_distinct_sql(source_sql: str, key_expr: str,
                     group_exprs: "list[str]", p: int = 8,
                     out_col: str = "approx_distinct") -> str:
    import re as _re

    # the register CTE aliases group exprs to their output names, so the
    # estimate layer selects them as plain identifiers; alias matching is
    # case-insensitive, and a non-identifier expression WITHOUT an alias
    # raises here rather than emitting broken SQL (review r6)
    names = []
    for e in group_exprs:
        parts = _re.split(r"\s+as\s+", e, flags=_re.IGNORECASE)
        name = parts[-1].strip()
        if not _re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", name):
            raise ValueError(
                f"group expression {e!r} needs an 'AS <identifier>' alias")
        names.append(name)
    return hll_estimate_sql(
        hll_registers_sql(source_sql, key_expr, group_exprs, p),
        names, p, out_col)
