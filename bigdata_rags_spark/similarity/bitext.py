"""Bitext mining via the margin criterion (Artetxe & Schwenk, ACL 2019;
the CCMatrix/LASER parallel-corpus recipe).

Raw cosine is a bad translation detector in embedding space because of
HUB vectors — points close to everything — and anisotropic similarity
scales between languages.  The margin criterion scores a candidate pair
by its cosine RELATIVE to each side's neighborhood density:

    margin(x, y) = cos(x, y) / ( (avg_{z in NNk(x)} cos(x, z)
                                 + avg_{z in NNk(y)} cos(y, z)) / 2 )

— a hub's high cosine is divided away by its own high neighborhood
average, while a true translation pair stands above both neighborhoods.
Pairs are emitted when the forward-best candidate clears a margin
threshold (ratio > 1 means "closer than the average near neighbor").

Exactness contract: cosines are integer micro-units (one ROUND of the
shared fold order), k-NN averages stay as SUMS so the margin is the pure
bigint ratio ``cos_micro * 2000 * k DIV (sum_x + sum_y)`` — milli-units,
no float division anywhere after the rounding, every tie broken on ids.

Scale shape: the demo query scores a bounded anchor set against one
target language (broadcast anchors, one corpus pass); both directions'
k-NN sums derive from that SAME score matrix (materialized once — the
multi-branch rule), so mining costs one scan + two window-rank top-k
aggregations.  At 100 TB the score matrix comes from the ANN index
(IVFPQ probed candidates) instead of the dense sweep; the margin math on
top is unchanged.

Extension beyond the reference (no multilingual surface — SURVEY.md §2
extension tier).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bigdata_rags_spark.functions.vectors import as_double_array, dot, norm


def margin_mining(
    src: DataFrame,
    tgt: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 4,
    margin_threshold_milli: int = 1000,
) -> DataFrame:
    """Forward-best margin mining: for every src anchor, the tgt candidate
    maximizing the margin, kept when ``margin_milli >= threshold``.

    Returns (src_id, tgt_id, cos_micro bigint, margin_milli bigint).
    Only positive-cosine candidates participate (the standard candidate
    precondition; it also keeps every integer division positive, where
    Spark ``DIV`` and DuckDB ``//`` agree)."""
    from pyspark.sql import Window

    a = src.select(
        F.col(id_col).alias("src_id"), as_double_array(F.col(vec_col)).alias("av")
    ).withColumn("an", norm(F.col("av")))
    b = tgt.select(
        F.col(id_col).alias("tgt_id"), as_double_array(F.col(vec_col)).alias("bv")
    ).withColumn("bn", norm(F.col("bv")))
    scored = (
        F.broadcast(a)
        .crossJoin(b)
        .select(
            "src_id",
            "tgt_id",
            F.round((dot(F.col("av"), F.col("bv")) / F.col("an") / F.col("bn")) * 1_000_000)
            .cast("bigint")
            .alias("cos_micro"),
        )
        .localCheckpoint()  # feeds fwd kNN, bwd kNN, and the margin join
    )
    w_fwd = Window.partitionBy("src_id").orderBy(F.col("cos_micro").desc(), "tgt_id")
    fwd = (
        scored.withColumn("rn", F.row_number().over(w_fwd))
        .filter(F.col("rn") <= k)
        .groupBy("src_id")
        .agg(F.sum("cos_micro").cast("bigint").alias("src_knn_sum"))
    )
    w_bwd = Window.partitionBy("tgt_id").orderBy(F.col("cos_micro").desc(), "src_id")
    bwd = (
        scored.withColumn("rn", F.row_number().over(w_bwd))
        .filter(F.col("rn") <= k)
        .groupBy("tgt_id")
        .agg(F.sum("cos_micro").cast("bigint").alias("tgt_knn_sum"))
    )
    # fwd is anchor-bounded (always tiny) -> force the broadcast; bwd is
    # |tgt|-sized, so its join is left to the planner (SMJ is the honest
    # shape when the target language is corpus-sized)
    margins = (
        scored.filter(F.col("cos_micro") > 0)
        .join(F.broadcast(fwd), "src_id")
        .join(bwd, "tgt_id")
        .filter(F.col("src_knn_sum") + F.col("tgt_knn_sum") > 0)
        .withColumn(
            "margin_milli",
            F.expr(f"cos_micro * {2000 * k} DIV (src_knn_sum + tgt_knn_sum)").cast(
                "bigint"
            ),
        )
    )
    w_best = Window.partitionBy("src_id").orderBy(
        F.col("margin_milli").desc(), "tgt_id"
    )
    return (
        margins.withColumn("best", F.row_number().over(w_best))
        .filter((F.col("best") == 1) & (F.col("margin_milli") >= margin_threshold_milli))
        .select("src_id", "tgt_id", "cos_micro", "margin_milli")
    )
