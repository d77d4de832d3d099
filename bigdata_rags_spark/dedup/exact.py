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


def incremental_new_keepers(
    batch: DataFrame,
    existing: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Incremental corpus ingestion dedup: rows of ``batch`` that survive
    (a) intra-batch exact dedup (keeper = min id per content hash) and
    (b) an anti-join against the content hashes already in ``existing`` —
    the snapshot-over-snapshot pattern (e.g. a new crawl against the
    accumulated corpus).

    Scale shape: both sides reduce to (content_hash[, id]) before any join —
    the text payload never crosses an exchange; the historical side ships
    one 32-byte hash per distinct historical document, and the survivors
    rejoin the batch by id (left semi).  At 100 TB keep the historical hash
    set as its own compact table and let AQE pick broadcast vs shuffle for
    the anti-join.
    """
    b = with_content_hash(batch, text_col)
    seen = with_content_hash(existing, text_col).select("content_hash").distinct()
    keepers = b.groupBy("content_hash").agg(F.min(id_col).alias(id_col))
    fresh = keepers.join(seen, "content_hash", "left_anti")
    return batch.join(fresh.select(id_col), id_col, "left_semi")


def prefix_dup_clusters(
    df: DataFrame,
    k: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact-PREFIX duplicate clusters: documents sharing their first ``k``
    whitespace tokens (RefinedWeb/CCNet-style prefix dedup — catches
    boilerplate-headed and truncated-tail variants that whole-document
    hashing misses because the suffixes differ).

    Same scale shape as ``exact_dedup``: the shuffle key is the 32-hex-char
    md5 of the joined prefix (never the text), partial aggregation, keeper =
    min id.  Documents shorter than ``k`` tokens key on their full token
    sequence — a whole-short-doc exact dedup, the standard degenerate case.
    """
    from bigdata_rags_spark.functions.text import ws_tokens

    prefix = F.array_join(F.slice(ws_tokens(F.col(text_col)), 1, k), " ")
    return (
        df.select(F.col(id_col), F.md5(prefix).alias("prefix_key"))
        .groupBy("prefix_key")
        .agg(
            F.min(F.col(id_col)).alias("keeper_id"),
            F.count(F.lit(1)).alias("cluster_size"),
        )
        .filter(F.col("cluster_size") > 1)
    )


def quality_aware_keepers(
    docs: DataFrame,
    scores: DataFrame,
    k: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    score_col: str = "score_micro",
) -> DataFrame:
    """QUALITY-AWARE keeper selection for prefix-duplicate clusters: keep
    each cluster's HIGHEST-quality member (ties to the lowest id) instead
    of blindly keeping the minimum id — the curation upgrade over
    ``prefix_dup_clusters``' min-id rule (re-crawl variants share a
    boilerplate head but differ in body; a classifier should pick which
    copy survives, the RefinedWeb/FineWeb-style "best version" rule).

    ``scores`` is any (id, score_micro) frame — the NB quality scorer in
    the registered query, but any per-doc signal works.  Returns
    (prefix_key, keeper_id, keeper_score_micro, cluster_size,
    min_id_keeper, quality_upgraded int) for clusters of size > 1;
    ``quality_upgraded = 1`` marks clusters where quality overrode the
    min-id choice — the report a pipeline reviews before swapping rules.

    Scale shape: the cluster key is the 32-hex prefix md5 (text never
    shuffles); scores join by id; ONE exchange serves both windows
    (same partition key)."""
    from pyspark.sql import Window

    from bigdata_rags_spark.functions.text import ws_tokens

    prefix = F.array_join(F.slice(ws_tokens(F.col(text_col)), 1, k), " ")
    keyed = docs.select(
        F.col(id_col).alias("doc_id"), F.md5(prefix).alias("prefix_key")
    ).join(
        scores.select(F.col(id_col).alias("doc_id"), F.col(score_col)), "doc_id"
    )
    wp = Window.partitionBy("prefix_key")
    ranked = (
        keyed.withColumn(
            "rn",
            F.row_number().over(
                wp.orderBy(F.col(score_col).desc(), F.col("doc_id"))
            ),
        )
        .withColumn("cluster_size", F.count(F.lit(1)).over(wp).cast("bigint"))
        .withColumn("min_id_keeper", F.min("doc_id").over(wp))
    )
    return ranked.filter((F.col("rn") == 1) & (F.col("cluster_size") > 1)).select(
        "prefix_key",
        F.col("doc_id").alias("keeper_id"),
        F.col(score_col).alias("keeper_score_micro"),
        "cluster_size",
        "min_id_keeper",
        (F.col("doc_id") != F.col("min_id_keeper")).cast("int").alias(
            "quality_upgraded"
        ),
    )
