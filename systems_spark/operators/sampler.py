"""HashSampler — deterministic row sampling and split assignment.

Training-data curation needs reproducible sampling: downsample a corpus,
stratify by a quality/language bucket, carve train/validation/test splits —
and get the SAME rows on every run, every retry, every engine. Spark's
``df.sample`` is seed-dependent on partitioning (a repartition changes the
sample); this operator derives inclusion from a portable md5 hash of a key
column (functions/hashing.py), so the sample is a pure function of the data
— task retries, AQE re-plans, and the DuckDB oracle all agree row-for-row.

Scale shape: a narrow projection + filter, no shuffle, fully pushed into
the scan stage; stratified fractions compile to one CASE expression.

(The reference has no sampling op — SoftmaxSampling is weighted top-k per
request, not corpus sampling; this is part of the LLM-data-pipeline
extension surface.)
"""

from __future__ import annotations

from typing import Mapping, Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from systems_spark.functions.hashing import unit_uniform, unit_uniform_sql
from systems_spark.operators.base import Operator


class HashSampler(Operator):
    """Keep rows whose hash-uniform falls below a fraction.

    ``fraction``: global keep-rate in (0, 1]. ``stratify_col`` +
    ``fractions``: per-stratum keep-rates (strata absent from the mapping
    get ``fraction``). ``split_col``: instead of filtering, append a split
    label column assigned by cumulative ``splits`` fractions (must sum to
    1) — the deterministic train/val/test carve.
    """

    def __init__(self, key_col: str, fraction: float = 1.0,
                 stratify_col: Optional[str] = None,
                 fractions: Optional[Mapping] = None,
                 split_col: Optional[str] = None,
                 splits: Optional[Sequence] = None,
                 salt: str = "sample"):
        self.key_col = key_col
        self.fraction = float(fraction)
        self.stratify_col = stratify_col
        self.fractions = dict(fractions) if fractions else None
        self.split_col = split_col
        self.splits = list(splits) if splits else None
        self.salt = salt
        if self.splits is not None:
            total = sum(f for _, f in self.splits)
            if abs(total - 1.0) > 1e-9:
                raise ValueError(f"splits must sum to 1, got {total}")
        self.requires = (key_col,) + ((stratify_col,) if stratify_col else ())

    def _u(self) -> Column:
        return unit_uniform(F.col(self.key_col), self.salt)

    def transform(self, df: DataFrame) -> DataFrame:
        if self.split_col is not None:
            expr = None
            acc = 0.0
            # first match wins: u <= cumulative bound, checked in order
            for name, frac in self.splits:
                acc += frac
                cond = self._u() <= F.lit(acc)
                expr = F.when(cond, F.lit(name)) if expr is None else \
                    expr.when(cond, F.lit(name))
            # float-sum slack: anything past the last bound joins the tail
            expr = expr.otherwise(F.lit(self.splits[-1][0]))
            return df.withColumn(self.split_col, expr)

        if self.stratify_col is not None and self.fractions is not None:
            frac = None
            for value, f_keep in sorted(self.fractions.items(), key=repr):
                cond = F.col(self.stratify_col) == F.lit(value)
                frac = F.when(cond, F.lit(float(f_keep))) if frac is None else \
                    frac.when(cond, F.lit(float(f_keep)))
            frac = frac.otherwise(F.lit(self.fraction))
            return df.where(self._u() <= frac)

        return df.where(self._u() <= F.lit(self.fraction))

    # -- oracle twin -------------------------------------------------------
    def keep_predicate_sql(self) -> str:
        u = unit_uniform_sql(self.key_col, self.salt)
        if self.stratify_col is not None and self.fractions is not None:
            whens = " ".join(
                f"WHEN {self.stratify_col} = '{v}' THEN {float(f)!r}"
                for v, f in sorted(self.fractions.items(), key=repr)
            )
            return f"({u}) <= (CASE {whens} ELSE {self.fraction!r} END)"
        return f"({u}) <= {self.fraction!r}"

    def split_case_sql(self) -> str:
        u = unit_uniform_sql(self.key_col, self.salt)
        acc, whens = 0.0, []
        for name, frac in self.splits:
            acc += frac
            whens.append(f"WHEN ({u}) <= {acc!r} THEN '{name}'")
        return (f"CASE {' '.join(whens)} "
                f"ELSE '{self.splits[-1][0]}' END")

    def get_params(self):
        return {"key_col": self.key_col, "fraction": self.fraction,
                "stratify_col": self.stratify_col, "fractions": self.fractions,
                "split_col": self.split_col, "splits": self.splits,
                "salt": self.salt}


class MixtureSampler(Operator):
    """Resample a corpus to a target group mixture (domain reweighting).

    Training mixes are specified as weights over a group column ("40% web,
    30% code, 30% books"); the observed corpus has whatever proportions it
    has. This operator downsamples each group deterministically so the kept
    rows follow the target weights while retaining as much data as possible:
    the group with the scarcest supply relative to its weight is kept whole
    (rate 1.0) and every other group's keep-rate scales down around it —

        scale  = min over groups of (count_g / weight_g)
        rate_g = weight_g * scale / count_g          (<= 1.0 by scale-min)
        keep   = unit_uniform(salt || key) <= rate_g

    100 TB shape: ONE tiny aggregation (group counts — map-side combined,
    #groups rows) joined back as a broadcast, then a pure hash predicate;
    no driver collect, no second pass over the data, retry-idempotent
    (functions/hashing.py determinism). Rates are computed IN-PLAN with
    IEEE double arithmetic, so Spark and the DuckDB oracle derive
    bit-identical rates from the same counts — the sampled set matches
    row-for-row. Groups absent from ``weights`` are dropped (weight 0).
    """

    def __init__(self, key_col: str, group_col: str, weights: Mapping,
                 salt: str = "mix"):
        if not weights:
            raise ValueError("weights must be non-empty")
        if any(w <= 0 for w in weights.values()):
            raise ValueError("weights must be strictly positive")
        self.key_col = key_col
        self.group_col = group_col
        self.weights = dict(weights)
        self.salt = salt
        self.requires = (key_col, group_col)

    def _weight_case(self) -> Column:
        expr = None
        for value, w in sorted(self.weights.items(), key=repr):
            cond = F.col(self.group_col) == F.lit(value)
            expr = F.when(cond, F.lit(float(w))) if expr is None else \
                expr.when(cond, F.lit(float(w)))
        return expr  # no otherwise → NULL for unlisted groups (dropped)

    def _weight_case_sql(self) -> str:
        whens = " ".join(
            f"WHEN {self.group_col} = '{v}' THEN {float(w)!r}"
            for v, w in sorted(self.weights.items(), key=repr)
        )
        return f"CASE {whens} END"

    def transform(self, df: DataFrame) -> DataFrame:
        in_mix = df.where(self._weight_case().isNotNull())
        # r12 perf: pin the #groups-row count table — `scale` and `rates`
        # both reference it, and each lazy reference re-executed the FULL
        # input lineage (for curation_pipeline that was the whole
        # redact→boilerplate→quality chain). One pinned pass + the output
        # predicate pass = the documented two-pass shape.
        counts = in_mix.groupBy(self.group_col).agg(
            F.count(F.lit(1)).cast("double").alias("_cnt")
        ).withColumn("_w", self._weight_case()).localCheckpoint(eager=False)
        scale = counts.agg(F.min(F.col("_cnt") / F.col("_w")).alias("_scale"))
        rates = counts.crossJoin(F.broadcast(scale)).select(
            self.group_col,
            (F.col("_w") * F.col("_scale") / F.col("_cnt")).alias("_rate"),
        )
        u = unit_uniform(F.col(self.key_col), self.salt)
        return (
            in_mix.join(F.broadcast(rates), self.group_col)
            .where(u <= F.col("_rate"))
            .drop("_rate")
        )

    # -- oracle twin -------------------------------------------------------
    def sql(self, table: str, select_cols: str) -> str:
        """DuckDB query selecting ``select_cols`` of the sampled rows."""
        w = self._weight_case_sql()
        u = unit_uniform_sql(self.key_col, self.salt)
        return f"""
WITH in_mix AS (
  SELECT *, ({w}) AS _w FROM {table} WHERE ({w}) IS NOT NULL
), counts AS (
  SELECT {self.group_col}, _w, COUNT(*)::DOUBLE AS _cnt
  FROM in_mix GROUP BY {self.group_col}, _w
), rates AS (
  SELECT {self.group_col}, _w * (SELECT MIN(_cnt / _w) FROM counts) / _cnt AS _rate
  FROM counts
)
SELECT {select_cols}
FROM in_mix JOIN rates USING ({self.group_col})
WHERE ({u}) <= _rate
"""

    def get_params(self):
        return {"key_col": self.key_col, "group_col": self.group_col,
                "weights": self.weights, "salt": self.salt}
