"""Similarity search over embedding columns."""

from bigdata_rags_spark.similarity.knn import (
    brute_force_topk,
    cosine_pairs_above,
    cosine_pairs_above_blocked,
    lsh_bucketed_topk,
)

__all__ = [
    "brute_force_topk",
    "cosine_pairs_above",
    "cosine_pairs_above_blocked",
    "lsh_bucketed_topk",
]
