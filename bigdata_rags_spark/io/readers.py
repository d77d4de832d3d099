"""Source connectors (reference S1, S7, S12 — SURVEY.md §2.1).

Differences from the reference, by design:
- explicit schemas instead of ``inferSchema=True`` (no extra full pass;
  reference dag-transform.py:135);
- Spark reads storage directly (``s3a://``/local path) instead of the
  boto3-download-to-/tmp hop (reference dag-transform.py:66-88, S6);
- no pandas intermediary (reference dag-extract.py:62, dag-load.py:86) —
  DataFrames end-to-end so nothing ever funnels through the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from bigdata_rags_spark.schemas import TESTDATA


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Columnar scan; Catalyst pushes filters/projections into the footer-aware
    parquet reader (check ``PushedFilters``/``ReadSchema`` in .explain)."""
    return spark.read.parquet(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    header: bool = True,
    infer: bool = False,
) -> DataFrame:
    """CSV scan (reference S7, dag-transform.py:134-163).

    Schema-first: pass a ``StructType``; ``infer=True`` reproduces the
    reference's inference behavior as an explicit opt-in fallback only.
    """
    reader = spark.read.option("header", str(header).lower())
    if schema is not None:
        reader = reader.schema(schema)
    elif infer:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    user: str | None = None,
    password: str | None = None,
    driver: str | None = None,
    partition_column: str | None = None,
    num_partitions: int = 8,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
) -> DataFrame:
    """JDBC source (reference S1, dag-extract.py:58-63 — a sequential
    full-table ``SELECT *`` into pandas).

    Spark-native replacement reads in parallel when ``partition_column`` is
    given (each executor issues a bounded range query), which is the only way
    a relational extract scales past one connection's throughput.
    """
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
    )
    if user is not None:
        reader = reader.option("user", user)
    if password is not None:
        reader = reader.option("password", password)
    if driver is not None:
        reader = reader.option("driver", driver)
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError("partitioned JDBC read needs lower_bound/upper_bound")
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", str(num_partitions))
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
        )
    return reader.load()


def read_testdata(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    """Load driver testdata tables by name from an sf directory.

    Schemas are known (schemas.TESTDATA) but parquet carries its own — no
    inference pass either way.
    """
    out: dict[str, DataFrame] = {}
    for name in names:
        if name not in TESTDATA:
            raise KeyError(f"unknown testdata table: {name}")
        out[name] = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    return out


def input_bytes(spark: SparkSession, path: str) -> int:
    """Total bytes under ``path`` via Hadoop FileSystem metadata — no Spark
    job, works on any Spark-reachable FS.  Used to gate broadcast-vs-shuffle
    decisions (e.g. vocabulary joins, SCALE.md) on a cheap size estimate."""
    jpath = spark._jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return int(fs.getContentSummary(jpath).getLength())
