from graphdbetl_spark.operators.dedup import (
    dedup_merge_first_wins,
    dedup_exact_text,
    minhash_near_duplicates,
    simhash_fingerprints,
    ngram_jaccard_pairs,
)
from graphdbetl_spark.operators.joins import asof_join, topk_per_group
from graphdbetl_spark.operators.similarity import cosine_topk_bruteforce, lsh_cosine_topk

__all__ = [
    "dedup_merge_first_wins",
    "dedup_exact_text",
    "minhash_near_duplicates",
    "simhash_fingerprints",
    "ngram_jaccard_pairs",
    "asof_join",
    "topk_per_group",
    "cosine_topk_bruteforce",
    "lsh_cosine_topk",
]
