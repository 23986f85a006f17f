from graphdbetl_spark.functions.vectors import cosine_similarity, dot, l2_norm
from graphdbetl_spark.functions.text import (
    nfkd_ascii_fold,
    token_count,
    quality_score,
    language_id,
    rolling_fingerprint,
)

__all__ = [
    "cosine_similarity",
    "dot",
    "l2_norm",
    "nfkd_ascii_fold",
    "token_count",
    "quality_score",
    "language_id",
    "rolling_fingerprint",
]
