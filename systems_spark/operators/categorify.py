"""Categorify — fit a vocabulary, encode categoricals as contiguous codes.

Reference semantics: NVTabular ``Categorify`` fitted inside
``TransformWorkflow`` — fit builds a vocabulary, transform maps string/int
categories to contiguous integer codes whose cardinality feeds embedding
sizes (reference usage: tests/unit/systems/dag/test_graph.py:53-54,
tests/unit/systems/ops/tf/test_ensemble.py:128-139; embedding-size
properties merlin/systems/workflow/__init__.py:18-65).

Spark-first: fit = one distributed ``groupBy(col).count()`` (map-side partial
aggregation; at 100 TB this is the canonical scalable vocab build — no
driver-side collect unless the vocab itself is collected for broadcast, and
vocabularies are small by construction). transform = broadcast join against
the vocab table.

**Deterministic code assignment** (unlike StringIndexer's tie order):
codes are 1..N ordered by (frequency DESC, value ASC); 0 is reserved for
null / out-of-vocabulary (the NVTabular convention). Fully expressible in
SQL → oracle-checkable:

    SELECT value, ROW_NUMBER() OVER (ORDER BY cnt DESC, value ASC) AS code ...
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from systems_spark.operators.base import Operator


class Categorify(Operator):
    def __init__(self, columns, out_suffix: str = "", freq_threshold: int = 0,
                 encode_type: str = "per-col", code_strategy: str = "window",
                 max_size: int = 0, num_buckets: int = 0):
        """``encode_type="per-col"`` (default): independent vocab per column.
        ``encode_type="joint"``: one shared vocab over the union of all
        columns' values (NVTabular joint encoding — e.g. two item-id
        columns that must map to the same code space); requires all
        columns to share a dtype.

        ``code_strategy``: how codes 1..N are assigned over the counted
        vocabulary. ``"window"`` (default) ranks with a global window —
        right for true categorical vocabularies (bounded size).
        ``"distributed"`` ranks via GlobalRank (operators/global_rank.py) —
        identical codes, no single-task stage; use when "categorifying" an
        id-like column whose vocabulary is itself huge.

        ``max_size``: cap the encoded vocabulary at ``max_size`` codes
        INCLUDING the reserved 0 (null/OOV) slot — i.e. keep the
        ``max_size - 1`` most-frequent values, everything rarer maps to 0
        (the NVTabular ``Categorify(max_size=...)`` convention; it bounds
        embedding-table rows regardless of data cardinality).

        ``num_buckets`` > 0: STATELESS hash-bucket encoding instead of a
        fitted vocabulary — ``code = 1 + portable_hash(col_name|value) %
        num_buckets``, null → 0 (NVTabular's hashing mode for unbounded
        id spaces: no fit pass, no vocab artifact, collisions by design).
        Mutually exclusive with the fitted knobs."""
        if encode_type not in ("per-col", "joint"):
            raise ValueError(f"encode_type must be per-col|joint, got {encode_type}")
        if code_strategy not in ("window", "distributed"):
            raise ValueError(
                f"code_strategy must be window|distributed, got {code_strategy}"
            )
        if num_buckets and (freq_threshold or max_size):
            raise ValueError(
                "num_buckets (stateless hashing) excludes freq_threshold/"
                "max_size (fitted-vocabulary knobs)"
            )
        if max_size and max_size < 2:
            raise ValueError("max_size must be >= 2 (one code + the OOV slot)")
        self.columns = [columns] if isinstance(columns, str) else list(columns)
        self.out_suffix = out_suffix
        self.freq_threshold = int(freq_threshold)
        self.encode_type = encode_type
        self.code_strategy = code_strategy
        self.max_size = int(max_size)
        self.num_buckets = int(num_buckets)
        self.vocabs = {}  # col -> DataFrame(value, code)
        self.requires = tuple(self.columns)

    @classmethod
    def _rank_codes(cls, counts: DataFrame, partition_cols=(),
                    code_strategy: str = "window",
                    max_size: int = 0) -> DataFrame:
        """codes 1..N by (frequency DESC, value ASC) within each partition
        group — via a window (small vocabs) or GlobalRank (huge vocabs,
        same codes, no single-task stage). ``max_size`` keeps only codes
        ``<= max_size - 1`` (slot 0 is OOV)."""
        keep = [*partition_cols, "value"]
        if code_strategy == "distributed":
            from systems_spark.operators.global_rank import GlobalRank

            neg = counts.withColumn("_negcnt", -F.col("cnt"))
            gr = GlobalRank(["_negcnt", "value"],
                            group_cols=list(partition_cols), rank_col="code")
            out = gr(neg).select(*keep, "code")
        else:
            w = Window.partitionBy(*partition_cols).orderBy(
                F.col("cnt").desc(), F.col("value").asc()
            )
            out = counts.select(*keep, F.row_number().over(w).alias("code"))
        if max_size:
            out = out.where(F.col("code") <= max_size - 1)
        return out

    @classmethod
    def build_vocab(cls, df: DataFrame, column: str, freq_threshold: int = 0,
                    code_strategy: str = "window",
                    max_size: int = 0) -> DataFrame:
        counts = (
            df.where(F.col(column).isNotNull())
            .groupBy(F.col(column).alias("value"))
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        if freq_threshold > 0:
            counts = counts.where(F.col("cnt") >= freq_threshold)
        return cls._rank_codes(counts, (), code_strategy, max_size)

    def fit(self, df: DataFrame) -> "Categorify":
        """Single-job fit: columns sharing a dtype are counted in ONE pass
        (explode an array of (col, value) structs → one groupBy), instead
        of one full table scan per column. At 100 TB the difference is
        N scans vs 1 — the explode multiplies rows but partial aggregation
        collapses them map-side, so the shuffle stays vocab-sized."""
        if self.num_buckets:
            return self  # stateless hashing: nothing to fit
        dtypes = dict(df.dtypes)
        groups: dict[str, list[str]] = {}
        for c in self.columns:
            groups.setdefault(dtypes[c], []).append(c)
        self._persisted = []

        if self.encode_type == "joint":
            if len(groups) > 1:
                raise ValueError(
                    f"joint encoding needs one shared dtype, got {sorted(groups)}"
                )
            cols = self.columns
            kv = self._stacked(df, cols)
            counts = kv.groupBy("value").agg(F.count(F.lit(1)).alias("cnt"))
            if self.freq_threshold > 0:
                counts = counts.where(F.col("cnt") >= self.freq_threshold)
            vocab = self._rank_codes(
                counts, (), self.code_strategy, self.max_size
            ).persist()
            self._persisted.append(vocab)
            for c in cols:
                self.vocabs[c] = vocab
            return self

        for dt, cols in groups.items():
            if len(cols) == 1:
                self.vocabs[cols[0]] = self.build_vocab(
                    df, cols[0], self.freq_threshold, self.code_strategy,
                    self.max_size,
                )
                continue
            kv = self._stacked(df, cols)
            counts = kv.groupBy("_col", "value").agg(
                F.count(F.lit(1)).alias("cnt")
            )
            if self.freq_threshold > 0:
                counts = counts.where(F.col("cnt") >= self.freq_threshold)
            coded = self._rank_codes(
                counts, ("_col",), self.code_strategy, self.max_size
            ).persist()  # persisted: each column's transform reuses ONE job
            self._persisted.append(coded)
            for c in cols:
                self.vocabs[c] = coded.where(F.col("_col") == c).select(
                    "value", "code"
                )
        return self

    def fit_update(self, df: DataFrame) -> "Categorify":
        """APPEND-ONLY vocabulary update for category drift: values the
        fitted vocab has never seen get fresh codes ``max_code+1..``
        (ranked frequency DESC, value ASC within the new batch); existing
        codes NEVER change — the contract an already-trained embedding
        table depends on (row *i* must keep meaning value *v*; a refit
        would reshuffle every code as frequencies shift). NVTabular has no
        incremental story — this is engine-side capability for pipelines
        whose id spaces grow daily.

        ``freq_threshold`` is applied to the NEW batch's counts alone.
        Not available with ``num_buckets`` (stateless hashing needs no
        update — that's its point) or ``max_size`` (a global
        most-frequent-K cap is unsatisfiable append-only).

        One tiny driver read per column (the current max code, a scalar);
        the unseen-value count + rank is vocab-sized, like fit."""
        if self.num_buckets:
            raise ValueError("num_buckets (stateless hashing) needs no "
                             "fit_update — every value already has a code")
        if self.max_size:
            raise ValueError("max_size cannot be honored append-only: the "
                             "cap is a global most-frequent-K statement; "
                             "refit instead")
        if set(self.vocabs) != set(self.columns):
            raise RuntimeError("Categorify.fit_update called before fit")

        def unseen_ranked(counts: DataFrame, vocab: DataFrame) -> DataFrame:
            if self.freq_threshold > 0:
                counts = counts.where(F.col("cnt") >= self.freq_threshold)
            fresh = counts.join(vocab.select("value"), on="value", how="anti")
            ranked = self._rank_codes(fresh, (), self.code_strategy)
            base = vocab.agg(F.max("code")).first()[0] or 0
            return vocab.select("value", "code").unionByName(
                ranked.select("value", (F.col("code") + base).alias("code"))
            )

        if self.encode_type == "joint":
            kv = self._stacked(df, self.columns)
            counts = kv.groupBy("value").agg(F.count(F.lit(1)).alias("cnt"))
            vocab = unseen_ranked(counts, self.vocabs[self.columns[0]]).persist()
            self._persisted = getattr(self, "_persisted", [])
            self._persisted.append(vocab)
            for c in self.columns:
                self.vocabs[c] = vocab
            return self

        self._persisted = getattr(self, "_persisted", [])
        for c in self.columns:
            counts = (
                df.where(F.col(c).isNotNull())
                .groupBy(F.col(c).alias("value"))
                .agg(F.count(F.lit(1)).alias("cnt"))
            )
            # persist like fit does: without it, daily updates chain an
            # unbounded union lineage and every later action (max-code
            # read, transform broadcast, save) recomputes all prior
            # batches — which must then still exist unchanged
            updated = unseen_ranked(counts, self.vocabs[c]).persist()
            self._persisted.append(updated)
            self.vocabs[c] = updated
        return self

    @staticmethod
    def _stacked(df: DataFrame, cols: list[str]) -> DataFrame:
        """(col_name, value) pairs for all ``cols`` in one projection —
        array-of-structs explode (type-safe within a dtype group)."""
        pairs = F.array(*[
            F.struct(F.lit(c).alias("_col"), F.col(c).alias("value"))
            for c in cols
        ])
        return (
            df.select(F.explode(pairs).alias("kv"))
            .select("kv._col", "kv.value")
            .where(F.col("value").isNotNull())
        )

    def transform(self, df: DataFrame) -> DataFrame:
        if self.num_buckets:
            from systems_spark.functions.hashing import hash64

            out = df
            for c in self.columns:
                # salt with the column name: two columns sharing a value
                # must not share a bucket stream (independent hash spaces)
                h = hash64(F.concat(F.lit(c + "|"), F.col(c).cast("string")))
                out = out.withColumn(
                    f"{c}{self.out_suffix}",
                    F.when(F.col(c).isNull(), F.lit(0))
                    .otherwise(F.pmod(h, F.lit(self.num_buckets)) + 1)
                    .cast("long"),
                )
            return out
        if set(self.vocabs) != set(self.columns):
            raise RuntimeError("Categorify.transform called before fit")
        out = df
        for c in self.columns:
            vocab = F.broadcast(
                self.vocabs[c].select(
                    F.col("value").alias(c), F.col("code").alias(f"_code_{c}")
                )
            )
            out = (
                out.join(vocab, on=c, how="left")
                .withColumn(
                    f"{c}{self.out_suffix}",
                    F.coalesce(F.col(f"_code_{c}"), F.lit(0)).cast("long"),
                )
                .drop(f"_code_{c}")
            )
        return out

    # cardinality feeds embedding sizes (workflow/__init__.py:46-57)
    def cardinality(self, column: str) -> int:
        if self.num_buckets:
            return self.num_buckets
        return self.vocabs[column].count()

    def unpersist(self) -> "Categorify":
        """Release the cached combined-vocab frames from executor memory
        (the multi-column fit persists them so every column's transform
        reuses ONE fit job — call this when the operator is retired)."""
        for frame in getattr(self, "_persisted", []):
            frame.unpersist()
        self._persisted = []
        return self

    def compute_output_schema(self, input_schema):
        from systems_spark.schema import ColumnSchema, Schema

        added = Schema([
            ColumnSchema(f"{c}{self.out_suffix}", "int64",
                         tags=frozenset({"CATEGORICAL"}))
            for c in self.columns
        ])
        return input_schema + added

    def get_params(self):
        return {"columns": self.columns, "out_suffix": self.out_suffix,
                "freq_threshold": self.freq_threshold,
                "encode_type": self.encode_type,
                "code_strategy": self.code_strategy,
                "max_size": self.max_size,
                "num_buckets": self.num_buckets}

    def save_artifacts(self, path: str) -> None:
        for c, v in self.vocabs.items():
            v.write.mode("overwrite").parquet(f"{path}/vocab_{c}.parquet")

    def load_artifacts(self, path: str, spark=None) -> None:
        if self.num_buckets:
            return  # stateless: no vocab artifacts
        for c in self.columns:
            self.vocabs[c] = spark.read.parquet(f"{path}/vocab_{c}.parquet")
