from systems_spark.operators.base import Operator, LambdaOp
from systems_spark.operators.selection import SelectColumns, DropColumns, Rename, FilterRows
from systems_spark.operators.filter_candidates import FilterCandidates
from systems_spark.operators.softmax_sampling import SoftmaxSampling
from systems_spark.operators.unroll_features import UnrollFeatures
from systems_spark.operators.feature_table import QueryFeatureTable
from systems_spark.operators.embedding_lookup import EmbeddingLookup
from systems_spark.operators.padding import Padding
from systems_spark.operators.categorify import Categorify

__all__ = [
    "Operator",
    "LambdaOp",
    "SelectColumns",
    "DropColumns",
    "Rename",
    "FilterRows",
    "FilterCandidates",
    "SoftmaxSampling",
    "UnrollFeatures",
    "QueryFeatureTable",
    "EmbeddingLookup",
    "Padding",
    "Categorify",
]
