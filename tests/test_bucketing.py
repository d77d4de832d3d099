"""Bucketed-table joins: the pre-shuffled layout must actually eliminate the
join Exchange — asserted on the physical plan, and results must match the
plain (shuffling) join exactly."""

from __future__ import annotations

import pytest

from bigdata_rags_spark.io.bucketing import cobucketed_join, write_bucketed
from bigdata_rags_spark.io.readers import read_testdata


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def _drop(spark, table):
    """DROP plus location cleanup: a killed earlier run can leave the
    warehouse directory behind with no metastore entry, which makes the
    next managed-table write fail with LOCATION_ALREADY_EXISTS."""
    import shutil
    from urllib.parse import urlparse

    spark.sql(f"DROP TABLE IF EXISTS {table}")
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    shutil.rmtree(f"{wh}/{table}", ignore_errors=True)


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_smoke):
    t = read_testdata(spark, sf_smoke, "orders", "lineitem")
    _drop(spark, "b_orders")
    _drop(spark, "b_lineitem")
    write_bucketed(t["orders"], "b_orders", "o_orderkey", 4)
    write_bucketed(
        t["lineitem"].withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem",
        "o_orderkey",
        4,
    )
    yield ("b_orders", "b_lineitem")
    _drop(spark, "b_orders")
    _drop(spark, "b_lineitem")


def test_cobucketed_join_has_no_exchange(spark, bucketed_tables):
    left, right = bucketed_tables
    # the smoke fixture is small enough to auto-broadcast, which would hide
    # the bucket path — disable it so the plan is what a 100 TB fact-fact
    # join would get
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = cobucketed_join(spark, left, right, "o_orderkey")
        plan = _plan(joined)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, plan[:2000]


def test_cobucketed_join_matches_plain_join(spark, sf_smoke, bucketed_tables):
    left, right = bucketed_tables
    t = read_testdata(spark, sf_smoke, "orders", "lineitem")
    plain = (
        t["orders"]
        .join(
            t["lineitem"].withColumnRenamed("l_orderkey", "o_orderkey"),
            on="o_orderkey",
        )
        .count()
    )
    assert cobucketed_join(spark, left, right, "o_orderkey").count() == plain


def test_bucketed_aggregation_skips_shuffle(spark, bucketed_tables):
    """groupBy on the bucket key is also Exchange-free: the hash
    partitioning recorded in the bucket spec satisfies the agg's
    distribution requirement."""
    from pyspark.sql import functions as F

    agg = (
        spark.table(bucketed_tables[1])
        .groupBy("o_orderkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    assert "Exchange" not in _plan(agg)
