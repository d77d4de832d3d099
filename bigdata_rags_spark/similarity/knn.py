"""Approximate-nearest-neighbor search over an ``array<float>`` column.

Two tiers (BASELINE.json mandate):
- ``brute_force_topk``: exact cosine top-k — broadcast the (small) query set
  against the full corpus; one pass, no shuffle of the corpus, a window
  per-query top-k.  This is the correctness baseline and the right plan
  whenever |queries| x |corpus| work fits the cluster.
- ``lsh_bucketed_topk``: random-hyperplane LSH (sign-of-projection sketch,
  Charikar 2002) — corpus and queries are bucketed by an n-bit signature and
  only same-bucket candidates are scored.  Multi-probe over ``probes``
  signatures raises recall.  Hyperplanes are derived deterministically from
  md5 bytes, so results are reproducible run-to-run (no RNG state).

All math is ``zip_with``/``aggregate`` column expressions (codegen'd); no
Python in the scoring loop.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bigdata_rags_spark.functions.vectors import as_double_array, cosine, dot, norm


def _scored(queries: DataFrame, corpus: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    # norms are precomputed per vector (one pass per side), so each pair
    # costs ONE dot product instead of three; dot/na/nb keeps the exact
    # op order of the oracle's dot/sqrt(dot(a,a))/sqrt(dot(b,b)).
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double_array(F.col(vec_col)).alias("qv")
    ).withColumn("qn", norm(F.col("qv")))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double_array(F.col(vec_col)).alias("cv")
    ).withColumn("cn", norm(F.col("cv")))
    return (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "similarity",
            F.round(dot(F.col("qv"), F.col("cv")) / F.col("qn") / F.col("cn"), 6),
        )
    )


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k neighbors per query vector by cosine similarity.

    Rounded similarity is the ranking key (ties broken by neighbor id) so
    the result set is fully deterministic and oracle-matchable.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("similarity").desc(), F.col("neighbor_id")
    )
    return (
        _scored(queries, corpus, id_col, vec_col)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "similarity", "rank")
    )


def cosine_pairs_above(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
) -> DataFrame:
    """Embedding near-dup pairs: all (a < b) with cosine >= threshold.

    Quadratic by construction — correct baseline for modest corpora; use
    ``lsh_bucketed_topk`` buckets as the pre-filter at scale.
    """
    a = df.select(
        F.col(id_col).alias("id_a"), as_double_array(F.col(vec_col)).alias("va")
    ).withColumn("na", norm(F.col("va")))
    b = df.select(
        F.col(id_col).alias("id_b"), as_double_array(F.col(vec_col)).alias("vb")
    ).withColumn("nb", norm(F.col("vb")))
    # broadcast one side: BroadcastNestedLoopJoin = one pass over `a`'s
    # partitions instead of a P_a x P_b cartesian task grid.  Norms are
    # precomputed per vector (dot/na/nb == the oracle's op order).  Only
    # viable while the corpus fits a broadcast; beyond that use
    # lsh_bucketed_topk.
    return (
        a.crossJoin(F.broadcast(b))
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "similarity",
            F.round(dot(F.col("va"), F.col("vb")) / F.col("na") / F.col("nb"), 6),
        )
        .filter(F.col("similarity") >= threshold)
        .select("id_a", "id_b", "similarity")
    )


def cosine_pairs_above_mm(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
) -> DataFrame:
    """All-pairs cosine >= threshold via Arrow-batched numpy matmul.

    Same semantics as ``cosine_pairs_above`` but the O(N^2 * d) inner loop
    runs as BLAS sgemm inside ``mapInPandas`` instead of per-row array
    expressions — the classic ~100x Pandas-UDF-over-row-expressions win for
    dense numeric kernels.  The corpus is shipped once per executor as a
    normalized float64 matrix (broadcast variable); each Arrow batch of the
    row side multiplies against it.  Use while the corpus matrix fits in
    executor memory (2M x 64 doubles = 1 GB); shard the corpus or pre-bucket
    with LSH beyond that.

    Note: BLAS reductions are not sequential, so values can differ from the
    expression path in the last ulps — rounding to 6 dp makes that visible
    only at astronomically unlikely boundaries; registered rows-only with
    the driver (no value-hash oracle) for that reason.
    """
    import numpy as np
    import pandas as pd

    spark = df.sparkSession
    corpus = df.select(id_col, vec_col).toPandas()
    ids = np.asarray(corpus[id_col].values, dtype=np.int64)
    mat = np.asarray([np.asarray(v, dtype=np.float64) for v in corpus[vec_col]])
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    b_ids = spark.sparkContext.broadcast(ids)
    b_mat = spark.sparkContext.broadcast(mat)

    out_schema = "id_a long, id_b long, similarity double"

    def score(batches):
        c_ids, c_mat = b_ids.value, b_mat.value
        for pdf in batches:
            a_ids = np.asarray(pdf[id_col].values, dtype=np.int64)
            a_mat = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            a_mat = a_mat / np.linalg.norm(a_mat, axis=1, keepdims=True)
            sims = np.round(a_mat @ c_mat.T, 6)
            keep_a, keep_c = np.nonzero(
                (sims >= threshold) & (a_ids[:, None] < c_ids[None, :])
            )
            yield pd.DataFrame(
                {
                    "id_a": a_ids[keep_a],
                    "id_b": c_ids[keep_c],
                    "similarity": sims[keep_a, keep_c],
                }
            )

    return df.select(id_col, vec_col).mapInPandas(score, out_schema)


def _deterministic_hyperplanes(dim: int, n_planes: int, seed: str = "lsh") -> list[list[float]]:
    """Pseudo-random unit-free hyperplanes from md5 bytes — reproducible
    across runs/processes without RNG state.  Values in [-0.5, 0.5)."""
    planes: list[list[float]] = []
    for p in range(n_planes):
        vals: list[float] = []
        i = 0
        while len(vals) < dim:
            h = hashlib.md5(f"{seed}:{p}:{i}".encode()).digest()
            vals.extend(b / 256.0 - 0.5 for b in h)
            i += 1
        planes.append(vals[:dim])
    return planes


def lsh_bucketed_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_planes: int = 8,
    dim: int = 64,
) -> DataFrame:
    """ANN top-k: sign-of-projection LSH bucketing, then exact cosine within
    buckets.

    The signature is n bits (bit p = sign of <v, plane_p>), computed as a
    column expression over a literal plane matrix — the corpus is hashed in
    one codegen'd pass and shuffled only by (signature) for the candidate
    join.  Recall < 1 by design; raise n_planes for precision, lower for
    recall, or union multiple plane sets (multi-probe) for both.
    """
    from pyspark.sql import Window

    planes = _deterministic_hyperplanes(dim, n_planes)

    def signature(vec: F.Column) -> F.Column:
        sig = F.lit(0)
        for p, plane in enumerate(planes):
            lit_plane = F.array(*[F.lit(x) for x in plane])
            proj = F.aggregate(
                F.zip_with(vec, lit_plane, lambda x, y: x * y),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            sig = sig + F.when(proj > 0, F.lit(1 << p)).otherwise(F.lit(0))
        return sig

    # multi-probe: each query also probes every 1-bit-flip of its signature,
    # so a single hyperplane landing between two near-identical vectors
    # (the dominant recall-loss mode) still finds them.  Cost: n_planes+1
    # probe rows per query — queries are the small side, so this is cheap.
    probe_sigs = F.array(
        F.col("sig"), *[F.col("sig").bitwiseXOR(F.lit(1 << p)) for p in range(n_planes)]
    )
    q = (
        queries.select(
            F.col(id_col).alias("query_id"), as_double_array(F.col(vec_col)).alias("qv")
        )
        .withColumn("sig", signature(F.col("qv")))
        .withColumn("sig", F.explode(probe_sigs))
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double_array(F.col(vec_col)).alias("cv")
    ).withColumn("sig", signature(F.col("cv")))

    w = Window.partitionBy("query_id").orderBy(
        F.col("similarity").desc(), F.col("neighbor_id")
    )
    return (
        q.join(c, "sig")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("similarity", F.round(cosine(F.col("qv"), F.col("cv")), 6))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "similarity", "rank")
    )
