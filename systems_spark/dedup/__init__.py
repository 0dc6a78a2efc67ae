from systems_spark.dedup.exact import ExactDedup
from systems_spark.dedup.minhash import MinHashDedup
from systems_spark.dedup.simhash import SimHashDedup
from systems_spark.dedup.ngram import NGramJaccardDedup
from systems_spark.dedup.embedding import EmbeddingDedup
from systems_spark.dedup.semantic import SemanticDedup
from systems_spark.dedup.clusters import canonical_documents, canonical_from_labels, connected_components, decremental_components, incremental_components
from systems_spark.dedup.substrings import remove_duplicate_substrings
from systems_spark.dedup.winnow import winnow_pairs
from systems_spark.dedup.eval import pair_quality_report, pair_quality_report_sql

__all__ = [
    "ExactDedup",
    "MinHashDedup",
    "SimHashDedup",
    "NGramJaccardDedup",
    "EmbeddingDedup",
    "SemanticDedup",
    "connected_components",
    "canonical_documents",
    "decremental_components",
    "incremental_components",
    "canonical_from_labels",
    "remove_duplicate_substrings",
    "winnow_pairs",
    "pair_quality_report",
    "pair_quality_report_sql",
]
