"""Z-order (Morton-curve) write layout — multi-column data skipping.

The lakehouse layout optimizer (Delta ``OPTIMIZE ZORDER BY``, Iceberg
``rewrite_data_files(strategy => 'sort', sort_order => 'zorder')``):
interleave the bits of several columns into one key and range-partition
+ sort the write by it, so every FILE covers a small hyper-rectangle of
the combined key space and parquet min/max footer stats prune scans on
ANY of the z-ordered columns — not just the leading sort column of a
linear order. A 100 TB fact table laid out this way answers both
"customer = X" and "date between ..." with file-level skipping from
one layout.

Exactness contract: values map to fixed-bit grid cells with pure
INTEGER arithmetic over a caller-supplied (lo, hi) range — truncating
division, no float detour — and the interleave is a sum of shifted
bits, so the z-value is bit-for-bit reproducible in the DuckDB twin
(:func:`z_value_sql`). Rows outside [lo, hi] clamp to the grid edge
(layout stays valid; skipping just degrades for them).

Scale shape: the z-value is a per-row JVM expression (no shuffle);
``zorder_layout`` adds exactly one range exchange (sampled bounds, the
same exchange a plain sorted write pays) + an in-partition sort that
parquet writers need anyway for run-length wins.
"""

from __future__ import annotations

from hashlib import md5

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["z_value", "z_value_sql", "zorder_layout",
           "file_stats", "pruned_files", "pruned_read",
           "layout_fingerprint", "StatsIndex"]


def z_value(cols, ranges, bits: int = 16) -> Column:
    """The Morton key (long) of ``cols`` (names or Columns), each
    mapped onto a ``bits``-bit grid over its ``(lo, hi)`` range.
    ``len(cols) * bits`` must be ≤ 63 (a signed-long key)."""
    cols = [F.col(c) if isinstance(c, str) else c for c in cols]
    k = len(cols)
    if k < 1:
        raise ValueError("z_value needs at least one column")
    if k * bits > 63:
        raise ValueError(f"{k} cols x {bits} bits exceeds a long "
                         f"({k * bits} > 63)")
    if len(ranges) != k:
        raise ValueError("one (lo, hi) range per column")
    grids = []
    for col, (lo, hi) in zip(cols, ranges):
        lo, hi = int(lo), int(hi)
        if hi <= lo:
            raise ValueError(f"range ({lo}, {hi}) is empty")
        cells = (1 << bits) - 1
        if (hi - lo) * cells >= (1 << 53):
            # floor(a / b) on doubles equals integer div only below
            # 2^53 — refuse the silent precision loss; shrink bits
            raise ValueError(
                f"range span {hi - lo} x {bits} bits exceeds exact "
                f"float-division bounds; reduce bits")
        v = F.greatest(F.lit(lo), F.least(F.lit(hi), col.cast("long")))
        # clamp guarantees non-negative operands, so floor-div is the
        # same truncating integer division DuckDB's // performs
        grids.append(F.floor((v - F.lit(lo)) * F.lit(cells)
                             / F.lit(hi - lo)).cast("long"))
    z = F.lit(0).cast("long")
    for j in range(bits):
        for i, g in enumerate(grids):
            bit = F.shiftright(g, j).bitwiseAND(F.lit(1))
            z = z + F.shiftleft(bit, j * k + i)
    return z


def z_value_sql(exprs, ranges, bits: int = 16) -> str:
    """DuckDB twin of :func:`z_value` over SQL expressions — the same
    clamp, the same truncating fixed-point grid, the same interleave."""
    k = len(exprs)
    terms = []
    for i, (e, (lo, hi)) in enumerate(zip(exprs, ranges)):
        lo, hi = int(lo), int(hi)
        cells = (1 << bits) - 1
        g = (f"(((greatest({lo}, least({hi}, ({e})::BIGINT)) - {lo}) "
             f"* {cells}) // {hi - lo})")
        for j in range(bits):
            terms.append(f"((({g} >> {j}) & 1) << {j * k + i})")
    return "(" + " + ".join(terms) + ")"


def zorder_layout(df: DataFrame, cols, ranges, bits: int = 16,
                  partitions: "int | None" = None,
                  z_col: str = "_zorder") -> DataFrame:
    """``df`` re-laid-out along the Morton curve: one range exchange on
    the z-value + an in-partition sort, ready to write. The z column is
    kept under ``z_col`` so tests and layout audits can see it; drop it
    at write time if the table schema must stay closed."""
    z = z_value(cols, ranges, bits)
    out = df.withColumn(z_col, z)
    out = (out.repartitionByRange(partitions, F.col(z_col))
           if partitions else out.repartitionByRange(F.col(z_col)))
    return out.sortWithinPartitions(z_col)


def file_stats(spark, path: str, cols) -> DataFrame:
    """Per-FILE min/max/rows for ``cols`` over a parquet dataset — the
    data-skipping stats index every table format keeps (Delta's
    add-file stats, Iceberg manifests), built here as one scan that
    amortizes over every pruned read after it. Persist it as standing
    state (StateStore) next to the table; rebuild on layout changes."""
    cols = list(cols)
    df = spark.read.parquet(path)
    aggs = [F.count(F.lit(1)).alias("rows")]
    for c in cols:
        aggs += [F.min(c).alias(f"{c}_min"), F.max(c).alias(f"{c}_max")]
    return (df.groupBy(F.input_file_name().alias("file"))
            .agg(*aggs))


def pruned_files(stats: DataFrame, predicates: dict) -> "list[str]":
    """Files whose [min, max] stats OVERLAP every predicate range —
    ``predicates`` maps column → (lo, hi), either bound None for
    half-open. NULL stats (all-NULL column chunk) keep the file: skip
    decisions must be sound, never lossy. Returns the file list (a
    driver-side decision bounded by the FILE count — the same decision
    every format's planner makes)."""
    cond = F.lit(True)
    for c, (lo, hi) in predicates.items():
        if lo is not None:
            keep = F.col(f"{c}_max").isNull() | (F.col(f"{c}_max") >= lo)
            cond = cond & keep
        if hi is not None:
            keep = F.col(f"{c}_min").isNull() | (F.col(f"{c}_min") <= hi)
            cond = cond & keep
    return [r["file"] for r in stats.where(cond).select("file").collect()]


def pruned_read(spark, stats: DataFrame, predicates: dict) -> DataFrame:
    """Read ONLY the files :func:`pruned_files` keeps. The caller still
    applies the row-level filter — skipping is a superset guarantee,
    exactly like footer-stats pruning. Raises if nothing survives (an
    empty parquet read has no schema to offer; filter a 0-file result
    from the stats frame instead)."""
    files = pruned_files(stats, predicates)
    if not files:
        raise ValueError("pruned_read: no file overlaps the predicate "
                         "ranges — read the table head for a schema "
                         "instead of an empty path list")
    return spark.read.parquet(*files)


def layout_fingerprint(spark, path: str) -> str:
    """Identity of a dataset's CURRENT file layout: md5 over the sorted
    (path, length, mtime) listing of its data files (dot/underscore
    side files excluded). Any writer that changes the layout — a
    ``zorder_layout`` rewrite, a CDC snapshot commit, a compaction —
    changes the fingerprint, which is exactly the staleness signal a
    stats index needs. A driver-side listing, bounded by the FILE
    count: the same listing every table format's planner does."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    it = fs.listFiles(p, True)
    entries = []
    while it.hasNext():
        s = it.next()
        full = s.getPath().toString()
        if full.rsplit("/", 1)[-1].startswith(("_", ".")):
            continue
        entries.append(f"{full}:{s.getLen()}:{s.getModificationTime()}")
    return md5("\n".join(sorted(entries)).encode()).hexdigest()[:16]


class StatsIndex:
    """The data-skipping stats index as STANDING STATE (VERDICT r9 item
    6): per-file min/max/rows persisted through the
    :class:`~systems_spark.state.StateStore` next to the table — the
    role Delta's add-file stats / Iceberg's manifests play — instead of
    rebuilt by every caller.

    Freshness contract: the state tag embeds :func:`layout_fingerprint`
    of the table's current file listing, so

    - a SECOND session over an unchanged table hits the commit marker
      and reuses the stats scan (the store key is the table path, not
      the applicationId);
    - ANY layout change (z-order rewrite, CDC commit, compaction) moves
      the fingerprint → fresh tag → the stats rebuild on first use, and
      the stale entry is dropped eagerly so the store never serves it.

    >>> idx = StatsIndex()
    >>> stats = idx.stats(spark, "/lake/orders", ["o_custkey"])
    >>> df = idx.read(spark, "/lake/orders", ["o_custkey"],
    ...               {"o_custkey": (1000, 2000)})
    """

    _TAG_PREFIX = "zstats"

    def __init__(self, store=None):
        from systems_spark.state import StateStore
        self.store = store if store is not None else StateStore()

    def _key(self, path: str) -> str:
        return f"table:{path.rstrip('/')}"

    def _tag(self, path: str, cols, fingerprint: str) -> str:
        col_id = md5(",".join(cols).encode()).hexdigest()[:12]
        return f"{self._TAG_PREFIX}:{col_id}:{fingerprint}"

    def stats(self, spark, path: str, cols) -> DataFrame:
        """The persisted per-file stats for ``(path, cols)`` at the
        table's CURRENT layout — one stats scan on first use per
        layout version, a marker-gated parquet read ever after.
        Stale (other-fingerprint) entries for the same table+cols are
        invalidated before the fresh one commits."""
        cols = list(cols)
        fp = layout_fingerprint(spark, path)
        tag = self._tag(path, cols, fp)
        key = self._key(path)
        if not self.store.is_committed(spark, tag, key=key):
            for entry in self.store.entries(spark):
                m = entry["manifest"]
                if (m is not None
                        and m["tag"].startswith(self._tag(path, cols, ""))
                        and m["tag"] != tag):
                    self.store.invalidate(spark, m["tag"], key=key)
        return self.store.materialize(
            lambda: file_stats(spark, path, cols), tag, key=key,
            spark=spark)

    def read(self, spark, path: str, cols, predicates: dict) -> DataFrame:
        """:func:`pruned_read` through the persisted index — the scan a
        100 TB table actually runs: files whose stats rule them out are
        never opened. The caller still applies the row-level filter."""
        return pruned_read(spark, self.stats(spark, path, cols),
                           predicates)

    def invalidate(self, spark, path: str, cols) -> None:
        """Drop the CURRENT layout's entry (callers that rewrote the
        table in-place with identical listing metadata can force a
        rebuild; normal writers never need this — the fingerprint
        already moves)."""
        fp = layout_fingerprint(spark, path)
        self.store.invalidate(spark, self._tag(path, list(cols), fp),
                              key=self._key(path))
