"""BM25 ranking + hybrid lexical/vector retrieval — the RAG-serving surface.

BM25 (Robertson/Spärck Jones; the Okapi formulation) over the corpus:

    score(D, Q) = sum_t idf(t) * tf(t,D) * (k1+1)
                  / (tf(t,D) + k1 * (1 - b + b * |D|/avgdl))
    idf(t) = ln((N - df + 0.5) / (df + 0.5) + 1)

computed entirely with joins/aggregations (no index structure needed: the
"inverted index" IS the (token -> doc) exploded relation, and Catalyst's
hash joins do the posting-list intersection).  ``hybrid_search`` fuses the
normalized lexical score with embedding cosine similarity — the standard
RAG retrieval pattern (sparse + dense, weighted sum).

Scale: the term-document relation shuffles once on token; query terms are a
tiny broadcast side; per-query cost is proportional to the matched posting
lists, not the corpus.  All arithmetic is double, rounded only at the
output, and deterministic per the catalog's parity discipline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from bigdata_rags_spark.functions.text import ws_tokens
from bigdata_rags_spark.functions.vectors import as_double_array, dot, norm

K1 = 1.2
B = 0.75


def bm25_scores(
    docs: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
) -> DataFrame:
    """Top-k docs for a bag-of-words query by BM25 (k1=1.2, b=0.75)."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(ws_tokens(F.col(text_col))).alias("token"),
    )
    doc_len = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    n_docs = docs.count()
    avgdl = doc_len.agg(F.avg("dl")).collect()[0][0]

    tf = (
        toks.filter(F.col("token").isin(query_terms))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = (
        toks.filter(F.col("token").isin(query_terms))
        .select("doc_id", "token")
        .distinct()
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    idf = F.log((F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
    per_term = (
        tf.join(F.broadcast(dfreq), "token")
        .join(doc_len, "doc_id")
        .withColumn(
            "term_score",
            idf
            * (F.col("tf") * (K1 + 1))
            / (F.col("tf") + K1 * (1 - B + B * F.col("dl") / F.lit(float(avgdl)))),
        )
    )
    scored = per_term.groupBy("doc_id").agg(
        F.round(F.sum("term_score"), 6).alias("bm25"),
        F.count(F.lit(1)).alias("matched_terms"),
    )
    w = Window.orderBy(F.col("bm25").desc(), F.col("doc_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("doc_id", "bm25", "matched_terms", "rnk")
    )


def hybrid_search(
    docs: DataFrame,
    embeddings: DataFrame,
    query_terms: list[str],
    query_vec_id: int,
    alpha: float = 0.5,
    id_col: str = "doc_id",
    vec_id_col: str = "vec_id",
    k: int = 10,
) -> DataFrame:
    """Hybrid RAG retrieval: alpha * normalized-BM25 + (1-alpha) * cosine.

    The lexical side ranks by terms; the dense side scores every doc against
    the query vector (documents and embeddings align by id).  BM25 is
    normalized by the query's max score so both signals live in [0, 1]
    before fusion.  Fully join-based — no services, no state.
    """
    lexical = bm25_scores(docs, query_terms, id_col=id_col, k=1_000_000_000)
    max_bm25 = F.max("bm25").over(Window.partitionBy())
    lexical = lexical.withColumn(
        "lex_norm", F.col("bm25") / F.nullif(max_bm25, F.lit(0.0))
    ).select("doc_id", "bm25", "lex_norm")

    qv = embeddings.filter(F.col(vec_id_col) == query_vec_id).select(
        as_double_array(F.col("embedding")).alias("qv")
    )
    dense = (
        embeddings.select(
            F.col(vec_id_col).alias("doc_id"), as_double_array(F.col("embedding")).alias("cv")
        )
        .crossJoin(F.broadcast(qv))
        .withColumn("cosine", dot(F.col("qv"), F.col("cv")) / norm(F.col("qv")) / norm(F.col("cv")))
        .select("doc_id", "cosine")
    )
    fused = (
        dense.join(lexical, "doc_id", "left")
        .select(
            "doc_id",
            F.round(F.coalesce(F.col("bm25"), F.lit(0.0)), 6).alias("bm25"),
            F.round(F.col("cosine"), 6).alias("cosine"),
            F.round(
                F.lit(alpha) * F.coalesce(F.col("lex_norm"), F.lit(0.0))
                + F.lit(1 - alpha) * F.col("cosine"),
                6,
            ).alias("hybrid_score"),
        )
    )
    w = Window.orderBy(F.col("hybrid_score").desc(), F.col("doc_id"))
    return (
        fused.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("doc_id", "bm25", "cosine", "hybrid_score", "rnk")
    )
