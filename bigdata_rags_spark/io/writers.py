"""Sink connectors (reference S2, S8, S9, S13 — SURVEY.md §2.1).

Scale stance: the default sink is *partitioned parquet* written by executors
directly to the target filesystem.  The reference's ``coalesce(1)`` CSV write
(dag-transform.py:91-101) is a scale killer — one task writes all data — so it
survives only as the explicitly-named ``export_single_csv`` small-export op
(SURVEY.md §4).
"""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import DataFrame


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Default zone sink: executor-parallel write, Hive-style partitions
    (replaces reference S3/S9's upload-one-csv-per-day layout).  Spark's
    commit protocol emits the ``_SUCCESS`` marker."""
    writer = df.write.mode(mode).format(fmt)
    if fmt == "csv":
        writer = writer.option("header", "true")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)


def export_single_csv(df: DataFrame, dest_file: str) -> str:
    """Reference S8 (dag-transform.py:91-101): collapse to one partition,
    write a directory, pluck the single ``part-*`` file out to ``dest_file``.

    Only for small exports (the reference uses it on ~20-row outputs); the
    single writer task makes it O(total data) on one core by construction.
    """
    tmp_dir = dest_file + "__spark_tmp"
    df.coalesce(1).write.mode("overwrite").option("header", "true").csv(tmp_dir)
    part = glob.glob(os.path.join(tmp_dir, "part-*"))[0]
    os.makedirs(os.path.dirname(dest_file) or ".", exist_ok=True)
    shutil.move(part, dest_file)
    shutil.rmtree(tmp_dir, ignore_errors=True)
    return dest_file


def write_jdbc_replace(
    df: DataFrame,
    url: str,
    table: str,
    user: str | None = None,
    password: str | None = None,
    driver: str | None = None,
    truncate: bool = True,
) -> None:
    """Reference S13 (dag-load.py:92-102): full replace of an exploration
    table.  ``truncate=True`` keeps the DDL (the reference's pandas
    ``to_sql(if_exists="replace")`` re-derives DDL every run).  Writes in
    parallel, one connection per partition."""
    writer = (
        df.write.format("jdbc")
        .mode("overwrite")
        .option("url", url)
        .option("dbtable", table)
        .option("truncate", str(truncate).lower())
    )
    if user is not None:
        writer = writer.option("user", user)
    if password is not None:
        writer = writer.option("password", password)
    if driver is not None:
        writer = writer.option("driver", driver)
    writer.save()


def write_clustered(
    df: DataFrame,
    path: str,
    cluster_by: list[str],
    n_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Zone write clustered for data skipping: range-partition the rows by
    ``cluster_by`` (so each output file owns a disjoint key range) and sort
    within each partition (so each parquet row group's min/max stats are tight).

    Readers filtering on the cluster columns then skip whole files AND whole
    row groups from footer statistics alone — the plain-parquet version of
    what table formats call clustering/Z-ordering.  Worth one extra shuffle
    (the range exchange) on any zone that is write-once / read-many.
    """
    from pyspark.sql import functions as F

    cols = [F.col(c) for c in cluster_by]
    out = df.repartitionByRange(*([n_files] if n_files else []), *cols)
    out.sortWithinPartitions(*cols).write.mode(mode).parquet(path)


def zorder_code(x, y, bits: int = 16):
    """Morton (Z-order) interleave of two non-negative int columns — the
    multi-column clustering key: sorting by the code keeps rows close in
    BOTH dimensions, so range filters on either column skip row groups
    (plain-parquet version of Delta/Iceberg Z-ordering; public technique).

    Pure codegen'd bit arithmetic (shift/and/or chains), no UDF.  ``bits``
    bounds each input (values must fit in ``bits`` bits; 16 covers most
    dimension ids — raise it for wider keys, the expression just grows).
    """
    from functools import reduce

    from pyspark.sql import functions as F

    def bit_terms(col, offset):
        return [
            F.shiftleft(F.shiftright(col.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i + offset)
            for i in range(bits)
        ]

    terms = bit_terms(x, 0) + bit_terms(y, 1)
    return reduce(lambda a, b: a.bitwiseOR(b), terms)
