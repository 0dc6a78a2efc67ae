from systems_spark.operators.base import Operator, LambdaOp
from systems_spark.operators.selection import SelectColumns, DropColumns, Rename, FilterRows
from systems_spark.operators.filter_candidates import FilterCandidates
from systems_spark.operators.softmax_sampling import SoftmaxSampling
from systems_spark.operators.unroll_features import UnrollFeatures
from systems_spark.operators.feature_table import QueryFeatureTable
from systems_spark.operators.embedding_lookup import EmbeddingLookup
from systems_spark.operators.padding import Padding
from systems_spark.operators.binning import QuantileBin
from systems_spark.operators.categorify import Categorify
from systems_spark.operators.normalize import Normalize, FillMissing
from systems_spark.operators.asof import AsofJoin
from systems_spark.operators.ann import QueryANN
from systems_spark.operators.predict import (
    PredictModel,
    PredictForest,
    PredictImplicit,
    predict_model_from_signature,
    predict_tensorflow,
    predict_torchscript,
    schema_from_signature,
)
from systems_spark.operators.multimodal import (MediaFeatureExtract,
                                                MediaProbe, MediaResize,
                                                FrameSample, probe_media)
from systems_spark.operators.sessionize import Sessionize
from systems_spark.operators.range_join import RangeJoin
from systems_spark.operators.branch import BranchConcat, Subgraph
from systems_spark.operators.classifier import NaiveBayesTextClassifier
from systems_spark.operators.global_rank import GlobalRank, approx_quantiles, exact_quantiles, grouped_rank, ntile_expr
from systems_spark.operators.sampler import HashSampler, MixtureSampler
from systems_spark.operators.repetition import repetition_stats
from systems_spark.operators.boilerplate import remove_boilerplate
from systems_spark.operators.packing import SequencePacker
from systems_spark.operators.tokenizer import VocabTokenizer
from systems_spark.operators.chunker import DocumentChunker
from systems_spark.operators.lm_perplexity import BigramLM
from systems_spark.operators.bm25 import BM25
from systems_spark.operators.bpe import BpeTokenizer
from systems_spark.operators.target_encode import TargetEncode
from systems_spark.operators.negatives import sample_negatives
from systems_spark.operators.pagerank import pagerank
from systems_spark.operators.triangles import triangle_count
from systems_spark.operators.kcore import kcore
from systems_spark.operators.communities import label_propagation
from systems_spark.operators.funnel import funnel, funnel_summary
from systems_spark.operators.bloom_join import bloom_prefilter, bloom_prefilter_join
from systems_spark.operators.linkage import fellegi_sunter_scores, fellegi_sunter_sql
from systems_spark.operators.cdc import apply_cdc, apply_cdc_sql
from systems_spark.operators.resample import resample_ffill, resample_ffill_sql
from systems_spark.operators.zorder import z_value, z_value_sql, zorder_layout
from systems_spark.operators.kmeans import KMeansMicros, kmeans_oracle_sql
from systems_spark.operators.tablediff import table_diff, table_diff_sql
from systems_spark.operators.survival import kaplan_meier, kaplan_meier_sql
from systems_spark.operators.pca import (
    gram_matrix, gram_matrix_sql, pc1_sql, pca_project,
    top_eigenvector, top_eigenvector_micros)

__all__ = [
    "bloom_prefilter",
    "bloom_prefilter_join",
    "fellegi_sunter_scores",
    "fellegi_sunter_sql",
    "apply_cdc",
    "apply_cdc_sql",
    "resample_ffill",
    "resample_ffill_sql",
    "KMeansMicros",
    "kmeans_oracle_sql",
    "z_value",
    "z_value_sql",
    "zorder_layout",
    "table_diff",
    "table_diff_sql",
    "kaplan_meier",
    "kaplan_meier_sql",
    "gram_matrix",
    "gram_matrix_sql",
    "pc1_sql",
    "pca_project",
    "top_eigenvector",
    "top_eigenvector_micros",
    "pagerank",
    "triangle_count",
    "kcore",
    "label_propagation",
    "funnel",
    "funnel_summary",
    "BM25",
    "BpeTokenizer",
    "TargetEncode",
    "sample_negatives",
    "HashSampler",
    "MixtureSampler",
    "repetition_stats",
    "remove_boilerplate",
    "SequencePacker",
    "VocabTokenizer",
    "DocumentChunker",
    "BigramLM",
    "NaiveBayesTextClassifier",
    "Sessionize",
    "RangeJoin",
    "BranchConcat",
    "Subgraph",
    "Normalize",
    "FillMissing",
    "AsofJoin",
    "QueryANN",
    "PredictModel",
    "PredictForest",
    "PredictImplicit",
    "MediaFeatureExtract",
    "MediaProbe",
    "probe_media",
    "MediaResize",
    "FrameSample",
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
    "QuantileBin",
    "GlobalRank",
    "approx_quantiles",
    "exact_quantiles",
    "grouped_rank",
    "ntile_expr",
    "schema_from_signature",
    "predict_model_from_signature",
    "predict_tensorflow",
    "predict_torchscript",
]
