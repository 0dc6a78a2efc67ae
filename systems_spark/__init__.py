"""systems_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of NVIDIA-Merlin/systems.

The reference system (read-only at /root/reference) is a declarative
operator-DAG library for recommender pipelines: feature lookups, ANN
retrieval, candidate filtering, feature broadcasting, model scoring and
weighted top-k sampling over columnar batches
(reference: merlin/systems/dag/ensemble.py:29-78, README.md:56-104).

This package re-expresses every one of those capabilities Spark-first:

- one data plane: ``pyspark.sql.DataFrame`` (columnar via Tungsten/Arrow);
- operators are thin classes that compose lazy DataFrame transforms, so the
  Catalyst logical plan *is* the operator DAG and Catalyst provides column
  pruning, predicate pushdown, join planning and whole-stage codegen;
- Python only enters at model-scoring / index-probe boundaries, always as
  Arrow-batched pandas UDFs (never per-row Python);
- beyond the reference surface: large-scale training-data pipeline operators
  (exact/minhash/simhash/jaccard/embedding dedup, ANN similarity search,
  text analysis, multimodal column plumbing) built on the same kernel.
"""

from systems_spark.schema import ColumnSchema, Schema, Tags
from systems_spark.pipeline import Pipeline
from systems_spark.operators.base import Operator
from systems_spark.state import StateStore

__version__ = "0.1.0"

__all__ = [
    "ColumnSchema",
    "Schema",
    "Tags",
    "Pipeline",
    "Operator",
    "StateStore",
]
