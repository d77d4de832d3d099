"""Scale-strategy verification at the PLAN level: bucketed co-located joins
eliminate the shuffle, salted joins spread hot keys, broadcast hints stick.
These pin the physical behaviors the 100 TB design depends on."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdata_rags_spark.operators.skew import salted_join


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "simple")


@pytest.fixture(scope="module")
def warehouse(spark, tmp_path_factory):
    return str(tmp_path_factory.mktemp("warehouse"))


def test_bucketed_join_has_no_shuffle(spark, sf_smoke, tmp_path_factory):
    """Two tables bucketed on the join key co-locate: the join plan contains
    no Exchange — the shape that makes repeated large-fact joins viable at
    100 TB (shuffle once at write time, never again)."""
    import shutil

    li = spark.read.parquet(f"{sf_smoke}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_smoke}/orders.parquet")
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for tbl in ("b_lineitem", "b_orders"):
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        # a fresh session's in-memory catalog forgets managed tables, but
        # their warehouse directories persist -> clear both
        shutil.rmtree(f"{warehouse}/{tbl}", ignore_errors=True)
    (li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
       .mode("overwrite").saveAsTable("b_lineitem"))
    (orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
       .mode("overwrite").saveAsTable("b_orders"))

    joined = (
        spark.table("b_lineitem")
        .join(spark.table("b_orders"), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    # disable auto-broadcast so the co-location (not a broadcast) is what
    # kills the shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(joined)
        assert "SortMergeJoin" in plan
        join_section = plan.split("SortMergeJoin")[1] if "SortMergeJoin" in plan else plan
        # no Exchange feeding the join inputs (only the post-agg exchange)
        pre_join = plan.split("SortMergeJoin")[0]
        assert "Exchange hashpartitioning(l_orderkey" not in plan
        assert "Exchange hashpartitioning(o_orderkey" not in plan
        # and it still computes the right answer
        assert joined.count() > 0
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_salted_join_matches_plain_join(spark):
    """Salted join = same result set as the plain join, with the hot key's
    rows spread across num_salts shards."""
    hot = [(1, f"v{i}") for i in range(500)] + [(k, f"x{k}") for k in range(2, 30)]
    skewed = spark.createDataFrame(hot, ["k", "payload"])
    dim = spark.createDataFrame([(k, f"d{k}") for k in range(0, 30)], ["k", "label"])

    plain = skewed.join(dim, "k").select("k", "payload", "label")
    salted = salted_join(skewed, dim, "k", num_salts=8).select("k", "payload", "label")
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salt_is_deterministic_across_runs(spark):
    skewed = spark.createDataFrame([(1, "a"), (1, "b")], ["k", "v"])
    dim = spark.createDataFrame([(1, "d")], ["k", "label"])
    r1 = sorted(map(tuple, salted_join(skewed, dim, "k").collect()))
    r2 = sorted(map(tuple, salted_join(skewed, dim, "k").collect()))
    assert r1 == r2


def test_broadcast_hint_sticks(spark, sf_smoke):
    n = spark.read.parquet(f"{sf_smoke}/nation.parquet")
    c = spark.read.parquet(f"{sf_smoke}/customer.parquet")
    joined = c.join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
    assert "BroadcastHashJoin" in _plan(joined)