"""Fitted quantile binning — the numeric twin of Categorify.

NVTabular-style workflows discretize skewed numerics into quantile
buckets (GBDT features, embedding indices for numeric ranges). The
batch-analytics path already exists in this repo (GlobalRank's exact
distributed ntile — balance_deciles_scalable); what ntile CANNOT do is
the FIT/SERVE split: bucket edges learned on the training corpus must
be applied verbatim to tomorrow's data, where each new row is binned
against the FITTED edges, not re-ranked against its own batch.

``QuantileBin`` fits n−1 exact interpolated quantile edges per column
(operators/global_rank.py exact_quantiles — no single-task stage even
when fitting on the full corpus) and applies them as a chain of
comparisons against PLAN-EMBEDDED literals — serve-time binning is a
zero-shuffle projection that fuses into the scan.

Determinism contract: edges are quantized to integer MICROS at fit
(round(edge · 1e6), driver-side Python — the BM25/NDCG plan-time
quantization pattern); the transform quantizes the value side the SAME
way (floor(v·1e6 + 0.5)) before comparing against those integer
literals, so identical inputs bin identically in every engine and
every retry, and a value EQUAL to an edge bins LOW by exact integer
comparison. Fitted edges per column are n−1 longs — driver state in
the Normalize-stats class, persisted as a tiny JSON artifact through
the Hadoop FileSystem API.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from systems_spark.operators.base import Operator

_M = 1_000_000


class QuantileBin(Operator):
    def __init__(self, columns, n_bins: int = 10, out_suffix: str = "_bin"):
        """``columns``: numeric columns to bin; each gets a
        ``<col><out_suffix>`` LongType output 0..n_bins−1 (NULL in →
        NULL out). Values equal to an edge bin LOW (bin = count of
        edge micros strictly below the value's micros — both sides
        quantized identically, so the tie is an exact integer
        comparison, not a float one)."""
        if n_bins < 2:
            raise ValueError("n_bins must be >= 2")
        self.columns = [columns] if isinstance(columns, str) else list(columns)
        self.n_bins = n_bins
        self.out_suffix = out_suffix
        self.edges_micros: "dict[str, list[int]]" = {}
        self.requires = tuple(self.columns)

    # -- fit ---------------------------------------------------------------
    def fit(self, df: DataFrame) -> "QuantileBin":
        from systems_spark.operators.global_rank import exact_quantiles

        import math

        ps = [i / self.n_bins for i in range(1, self.n_bins)]
        self._spark = df.sparkSession  # for artifact I/O
        for c in self.columns:
            row = exact_quantiles(df, c, ps).first()
            # floor(x + 0.5), not python round(): banker's rounding has
            # no SQL twin — HALF_UP is expressible identically in DuckDB
            self.edges_micros[c] = [
                int(math.floor(v * _M + 0.5)) for v in row if v is not None
            ]
            if not self.edges_micros[c]:
                # exact_quantiles' global agg returns one all-NULL row
                # for empty/all-NULL input — a zero-edge fit would bin
                # everything to 0 silently (review r6)
                raise ValueError(
                    f"QuantileBin: cannot fit quantiles for {c!r} — "
                    "no non-NULL values")
        return self

    # -- transform ---------------------------------------------------------
    def transform(self, df: DataFrame) -> DataFrame:
        if set(self.edges_micros) != set(self.columns):
            raise RuntimeError("QuantileBin.transform before fit")
        out = df
        for c in self.columns:
            edges = self.edges_micros[c]
            # the value is quantized EXACTLY like the edges were at fit
            # (floor(x·1e6 + 0.5)), so edge ties compare as equal
            # integers and bin LOW per the documented contract
            v = F.floor(F.col(c).cast("double") * _M + 0.5)
            bin_expr = sum((v > F.lit(e)).cast("int") for e in edges)
            out = out.withColumn(
                c + self.out_suffix,
                F.when(F.col(c).isNotNull(), bin_expr).cast("long"))
        return out

    def sql_bin_expr(self, col: str) -> str:
        """The transform as a SQL expression over ``col`` — for oracle
        twins (same embedded integer-micros edge literals, same value
        quantization)."""
        edges = self.edges_micros[col]
        terms = " + ".join(
            f"CASE WHEN floor({col} * {_M} + 0.5) > {e} THEN 1 ELSE 0 END"
            for e in edges)
        return (f"CASE WHEN {col} IS NULL THEN NULL "
                f"ELSE ({terms}) END::BIGINT")

    def compute_output_schema(self, input_schema):
        from systems_spark.schema import ColumnSchema, Schema

        added = Schema([
            ColumnSchema(f"{c}{self.out_suffix}", "int64",
                         tags=frozenset({"CATEGORICAL"}))
            for c in self.columns
        ])
        return input_schema + added

    # -- persistence -------------------------------------------------------
    def get_params(self):
        return {"columns": self.columns, "n_bins": self.n_bins,
                "out_suffix": self.out_suffix}

    def save_artifacts(self, path: str) -> None:
        import json

        from systems_spark.sources import _fs_write_text

        _fs_write_text(self._spark, f"{path}/edges.json",
                       json.dumps(self.edges_micros, sort_keys=True))

    def load_artifacts(self, path: str, spark=None) -> None:
        import json

        from systems_spark.sources import _fs_read_text

        self._spark = spark
        self.edges_micros = {
            c: [int(x) for x in v]
            for c, v in json.loads(
                _fs_read_text(spark, f"{path}/edges.json")).items()
        }
