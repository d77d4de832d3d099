"""Exact deduplication via content hashing (hash-groupBy).

Scale shape: one shuffle on a 32-hex-char key; partial aggregation means the
shuffle carries one row per distinct hash per partition.  At 100 TB the only
knob that matters is shuffle partition count — no driver-side state, no
collects.  Keeper choice (min id) is deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bigdata_rags_spark.functions.text import content_hash


def with_content_hash(df: DataFrame, text_col: str = "text", out: str = "content_hash") -> DataFrame:
    """Add the normalized-text md5 dedup key."""
    return df.withColumn(out, content_hash(F.col(text_col)))


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """One surviving row id per distinct normalized text: (hash, keeper id,
    cluster size).  Keeper = min id (deterministic, join back to recover the
    full row without shuffling the text payload twice)."""
    return (
        with_content_hash(df, text_col)
        .groupBy("content_hash")
        .agg(
            F.min(F.col(id_col)).alias("keeper_id"),
            F.count(F.lit(1)).alias("cluster_size"),
        )
    )


def dup_clusters(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Only the clusters with >1 member (the actual duplicates)."""
    return exact_dedup(df, id_col, text_col).filter(F.col("cluster_size") > 1)
