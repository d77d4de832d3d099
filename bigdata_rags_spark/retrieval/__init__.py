"""Retrieval operators: BM25 lexical ranking and hybrid lexical+vector search."""

from bigdata_rags_spark.retrieval.bm25 import bm25_scores, hybrid_search
from bigdata_rags_spark.retrieval.eval import ranking_quality
from bigdata_rags_spark.retrieval.mmr import mmr_rerank

__all__ = ["bm25_scores", "hybrid_search", "mmr_rerank", "ranking_quality"]
