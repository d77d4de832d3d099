"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
and sub-document segment dedup."""

from bigdata_rags_spark.dedup.exact import (
    dup_clusters,
    exact_dedup,
    incremental_new_keepers,
    with_content_hash,
)
from bigdata_rags_spark.dedup.minhash import (
    incremental_minhash_keepers,
    lsh_candidate_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
)
from bigdata_rags_spark.dedup.semantic import incremental_semantic_keepers
from bigdata_rags_spark.dedup.segments import segment_dedup
from bigdata_rags_spark.dedup.simhash import simhash16, simhash_near_pairs
from bigdata_rags_spark.dedup.spans import substring_dedup

__all__ = [
    "dup_clusters",
    "exact_dedup",
    "incremental_new_keepers",
    "with_content_hash",
    "incremental_minhash_keepers",
    "incremental_semantic_keepers",
    "lsh_candidate_pairs",
    "minhash_signatures",
    "ngram_jaccard_pairs",
    "segment_dedup",
    "simhash16",
    "simhash_near_pairs",
    "substring_dedup",
]
