"""Zone maintenance operators: upsert (merge) and small-file compaction.

Neither exists in the reference (its load is full drop-and-replace,
dag-load.py:95), but no 100 TB lake survives without them:

- ``merge_upsert``: SCD-1 merge of a change batch into a keyed zone —
  new keys inserted, existing keys overwritten by the newest version.
  Without a table format (Delta/Iceberg aren't in this environment) the
  portable implementation is read-union-dedup-rewrite with a staging
  directory swap; on a format-backed lake the same call maps to MERGE INTO.
- ``compact_zone``: rewrite a zone's many small files into
  target-sized files.  Small-file explosion is the #1 operational failure
  of streaming/incremental writers at scale (every file is a task +
  NameNode/liststore entry).
"""

from __future__ import annotations

import shutil

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def merge_upsert(
    spark: SparkSession,
    zone_path: str,
    updates: DataFrame,
    key: str,
    version_col: str | None = None,
) -> int:
    """Merge ``updates`` into the parquet zone at ``zone_path`` by ``key``.

    Winner per key: the updates row; with ``version_col``, the max-version
    row across existing+updates (ties -> updates).  Rewrites atomically via
    a staging dir + swap.  Returns the post-merge row count.

    Scale shape: one union + one window (shuffle on key) + rewrite of the
    zone.  For zones too large to rewrite, partition the zone and merge
    only the partitions the updates touch (partition pruning on the
    update keys) — or use a table format's MERGE INTO.
    """
    try:
        existing = spark.read.parquet(zone_path).withColumn("__src", F.lit(0))
        merged_input = existing.unionByName(updates.withColumn("__src", F.lit(1)))
    except Exception:
        merged_input = updates.withColumn("__src", F.lit(1))

    order = (
        [F.col(version_col).desc(), F.col("__src").desc()]
        if version_col
        else [F.col("__src").desc()]
    )
    w = Window.partitionBy(key).orderBy(*order)
    merged = (
        merged_input.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__src")
    )
    staging = zone_path.rstrip("/") + "__staging"
    merged.write.mode("overwrite").parquet(staging)
    shutil.rmtree(zone_path, ignore_errors=True)
    shutil.move(staging, zone_path)
    return spark.read.parquet(zone_path).count()


def compact_zone(
    spark: SparkSession,
    zone_path: str,
    target_rows_per_file: int = 1_000_000,
) -> tuple[int, int]:
    """Rewrite the zone into ceil(rows / target_rows_per_file) files.

    Returns (files_before, files_after).  Uses row-count sizing (portable);
    production variants size by bytes via file statistics.  The rewrite is
    a full-scan + round-robin repartition — run it per partition directory
    on partitioned zones so only hot partitions pay.
    """
    import glob
    import math

    df = spark.read.parquet(zone_path)
    rows = df.count()
    files_before = len(glob.glob(f"{zone_path}/part-*"))
    n_files = max(1, math.ceil(rows / target_rows_per_file))
    staging = zone_path.rstrip("/") + "__compact"
    df.repartition(n_files).write.mode("overwrite").parquet(staging)
    shutil.rmtree(zone_path, ignore_errors=True)
    shutil.move(staging, zone_path)
    files_after = len(glob.glob(f"{zone_path}/part-*"))
    return files_before, files_after
