"""Product quantization (PQ) ANN serving: codes + asymmetric-distance top-k.

Third classic ANN family next to LSH (`similarity/knn.py`) and IVF
(`similarity/ivf.py`): split the embedding into M subspaces, quantize each
to one of K codebook centroids (Jégou, Douze, Schmid, "Product quantization
for nearest neighbor search", TPAMI 2011).  The corpus is then M small ints
per vector (here 16 codes in [0,16) — a nibble each at scale, 8 bytes vs
256 for the raw float32 vector) and a query scores ANY corpus vector with M
table lookups instead of a d-dim dot product — the asymmetric distance
computation (ADC).  Raw ADC ranking is lossy (the codebooks here are
untrained md5 literals and the fixture embeddings are near-random — the
ANN adversarial case, same note as the LSH recall test), so the production
serving path is `pq_search_rerank`: ADC shortlist, then EXACT cosine
rerank of the shortlist only — FAISS's IVFPQ+refine shape.

Spark-first, fully oracle-checkable (the whole reason this exists next to
`embedding_ivf_probe_fixed`):
- codebooks are FIXED md5-derived literals, exact multiples of 1/256, the
  same repr-stable construction as the LSH planes / IVF codebook — k-means
  PQ training would be rows-only, serving shouldn't be;
- encode = per-subspace argmax of (dot - ||c||^2/2) over literal centroids
  (equivalent to argmin L2 since ||x||^2 is constant per subspace), ranked
  by a descending struct sort so ties break identically everywhere;
- ADC scores are ROUNDED per subspace to integer micro-units BEFORE the
  M-way sum: the sum of M bigints is order-independent, so the ranking is
  bit-stable under any partitioning/engine (a float sum would not be).

100 TB shape: corpus vectors are read ONCE to encode; after that only
(id, m, code) rows — a few bytes — cross any exchange.  The query-side
lookup table is |Q| x M x K rows (tiny, broadcast); the ADC join is an
equi-join on (m, code) followed by a partial+final SUM and a per-query
window top-k.  No full-dim vector ever moves after encoding.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from bigdata_rags_spark.functions.vectors import as_double_array

M_SUB = 16
K_CODES = 16
SUB_DIM = 4  # M_SUB * SUB_DIM must equal the embedding dim (64)


def pq_codebooks(
    dim: int = 64, m: int = M_SUB, k: int = K_CODES, seed: str = "pq"
) -> list[list[list[float]]]:
    """Per-subspace literal codebooks: m lists of k centroids of dim/m."""
    from bigdata_rags_spark.similarity.knn import _deterministic_hyperplanes

    sub = dim // m
    return [_deterministic_hyperplanes(sub, k, seed=f"{seed}{j}") for j in range(m)]


def _sub_dot(vec: Column, j: int, centroid: list[float]) -> Column:
    """Dot product of subspace j of ``vec`` with a literal centroid —
    F.aggregate's sequential fold matches DuckDB's list_dot_product
    accumulation order (proven by the IVF oracle)."""
    sub = F.slice(vec, j * SUB_DIM + 1, SUB_DIM)
    lit = F.array(*[F.lit(x) for x in centroid])
    return F.aggregate(
        F.zip_with(sub, lit, lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x
    )


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, m, code): per-subspace nearest-centroid assignment.

    score = dot - ||c||^2/2 (argmin-L2 without the per-vector constant);
    descending struct(score, code) sort breaks ties on higher code id,
    mirroring `similarity/ivf.py:_nearest_cells`.
    """
    v = as_double_array(F.col(vec_col))
    bests = []
    for j, book in enumerate(codebooks):
        scored = F.array(
            *[
                F.struct(
                    (_sub_dot(v, j, c) - F.lit(sum(x * x for x in c) / 2.0)).alias(
                        "score"
                    ),
                    F.lit(code).alias("code"),
                )
                for code, c in enumerate(book)
            ]
        )
        bests.append(F.sort_array(scored, asc=False)[0].getField("code").cast("int"))
    # all M assignments in ONE projection over ONE scan, then posexplode —
    # element position IS the subspace index
    return df.select(
        F.col(id_col).alias("id"), F.posexplode(F.array(*bests)).alias("m", "code")
    ).select("id", F.col("m").cast("int").alias("m"), "code")


def pq_lut(
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, m, code, dot_micro): per-query lookup table of subspace
    dots against every centroid, rounded to integer micro-units so the
    downstream M-way sum is exact."""
    v = as_double_array(F.col(vec_col))
    entries = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(j).alias("m"),
                    F.lit(code).alias("code"),
                    F.round(_sub_dot(v, j, c) * 1_000_000)
                    .cast("bigint")
                    .alias("dot_micro"),
                )
                for j, book in enumerate(codebooks)
                for code, c in enumerate(book)
            ]
        )
    ).alias("e")
    return queries.select(F.col(id_col).alias("query_id"), entries).select(
        "query_id", "e.m", "e.code", "e.dot_micro"
    )


def pq_adc_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    codebooks: list[list[list[float]]] | None = None,
) -> DataFrame:
    """Approximate top-k neighbors per query via PQ asymmetric distance:
    encode corpus once, broadcast the query LUT, equi-join on (m, code),
    SUM the M integer-micro dots, window top-k per query."""
    books = codebooks if codebooks is not None else pq_codebooks()
    codes = pq_encode(corpus, books)
    lut = pq_lut(queries, books)
    scored = (
        codes.join(F.broadcast(lut), ["m", "code"])
        .filter(F.col("id") != F.col("query_id"))
        .groupBy("query_id", F.col("id").alias("neighbor_id"))
        .agg(F.sum("dot_micro").cast("bigint").alias("approx_sim_micro"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("approx_sim_micro"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "approx_sim_micro", "rank")
    )


def pq_search_rerank(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    shortlist: int = 100,
    codebooks: list[list[list[float]]] | None = None,
) -> DataFrame:
    """Production PQ serving: ADC shortlist (cheap, code-space) -> exact
    cosine rerank of the shortlist only -> top-k.  Full vectors are touched
    for |Q| x shortlist rows, never the whole corpus; the rerank join is
    id-keyed with the query side broadcast."""
    from bigdata_rags_spark.functions.vectors import cosine

    short = pq_adc_topk(queries, corpus, k=shortlist, codebooks=codebooks)
    qv = queries.select(
        F.col("vec_id").alias("query_id"), as_double_array(F.col("embedding")).alias("qv")
    )
    cv = corpus.select(
        F.col("vec_id").alias("neighbor_id"),
        as_double_array(F.col("embedding")).alias("cv"),
    )
    scored = (
        short.select("query_id", "neighbor_id")
        .join(F.broadcast(qv), "query_id")
        .join(cv, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("similarity"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("similarity"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "similarity", "rank")
    )
