"""Bucketed tables: pre-shuffled on-disk layout for repeat-join keys.

The single biggest shuffle eliminator Spark offers for a 100 TB lake: write
each fact table ONCE bucketed (hash-partitioned into N files) and sorted on
its join key, and every subsequent equi-join or aggregation on that key reads
co-located buckets — SortMergeJoin with NO Exchange on either side, at any
data size.  The shuffle is paid once at ingest, not per query.

The reference re-reads and re-joins the same staged CSVs every DAG run
(dag-transform.py:134-181 re-joins the same 9 tables each day); bucketing is
the Spark-native answer to that workload shape.

Rules that make bucket joins actually fire (pinned in tests/test_bucketing.py):
- both sides bucketed INTO THE SAME NUMBER OF BUCKETS on the join key
  (or one side's count a divisor of the other with
  ``spark.sql.bucketing.coalesceBucketedTableScan.enabled``),
- ``spark.sql.sources.bucketing.enabled`` on (default),
- the join key must be the bucket column, untransformed (``key % 2`` or a
  cast breaks bucket pruning),
- ``sortBy`` on the bucket column additionally removes the per-task Sort
  before the merge join.

At 100 TB, pick bucket counts so one bucket of the LARGEST co-bucketed table
fits an executor's read budget (e.g. 100 TB / 4096 buckets ~= 25 GB/bucket —
large; prefer 16-64k buckets for petabyte facts; keep counts a power of two
so table families can coalesce pairwise).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) managed table.

    Bucketed writes go through ``saveAsTable`` — the metastore records the
    bucket spec so later reads can prove co-partitioning to the planner."""
    writer = df.write.mode(mode).format("parquet").bucketBy(num_buckets, bucket_col)
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table with its bucket metadata attached (plain
    ``spark.table`` — listed here so call sites document intent)."""
    return spark.table(table)


def cobucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str, how: str = "inner"
) -> DataFrame:
    """Join two co-bucketed tables on their shared bucket key.

    When both tables were written by ``write_bucketed`` with the same
    ``num_buckets`` on ``key``, the plan is a SortMergeJoin with no Exchange
    on either side (asserted in tests/test_bucketing.py) — the join runs
    bucket-by-bucket, each task reading one pre-sorted file pair."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, on=key, how=how)


def drop_managed_table(spark: SparkSession, table: str) -> None:
    """DROP a managed table AND clear its warehouse directory.

    A killed earlier run can leave the warehouse directory behind with no
    metastore entry, which makes the next managed-table write fail with
    LOCATION_ALREADY_EXISTS — so idempotent builders (index builds, test
    fixtures) must clean both layers before overwriting."""
    import shutil
    from urllib.parse import urlparse

    spark.sql(f"DROP TABLE IF EXISTS {table}")
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    shutil.rmtree(f"{wh}/{table}", ignore_errors=True)
