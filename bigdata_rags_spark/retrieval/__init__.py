"""Retrieval operators: BM25 lexical ranking and hybrid lexical+vector search."""

from bigdata_rags_spark.retrieval.bm25 import bm25_scores, hybrid_search

__all__ = ["bm25_scores", "hybrid_search"]
