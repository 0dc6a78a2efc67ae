from systems_spark.functions.hashing import (
    hash64,
    hash64_sql,
    unit_uniform,
    unit_uniform_sql,
    minhash_permuted,
)
from systems_spark.functions.similarity import dot_product, cosine_similarity, l2_norm
