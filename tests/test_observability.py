"""Observation-API metrics: counters must match independently computed
values and must not launch extra jobs beyond the action they ride on."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_rags_spark.io.readers import read_testdata
from bigdata_rags_spark.operators.observability import observe_metrics


def test_observed_metrics_match_direct_aggregates(spark, sf_smoke):
    orders = read_testdata(spark, sf_smoke, "orders")["orders"]
    observed, obs = observe_metrics(
        orders,
        {
            "n_rows": F.count(F.lit(1)),
            "null_keys": F.sum(F.col("o_custkey").isNull().cast("long")),
            "total_price": F.round(F.sum("o_totalprice"), 2),
        },
    )
    # one action drives both the data and the metrics
    n_out = observed.count()
    got = obs.get
    assert got["n_rows"] == n_out
    assert got["null_keys"] == 0
    direct = orders.agg(F.round(F.sum("o_totalprice"), 2)).collect()[0][0]
    assert got["total_price"] == direct


def test_observed_metrics_survive_downstream_transforms(spark, sf_smoke):
    """Metrics observe the relation at the point of attachment — filters
    applied AFTER observe must not change the observed counts (the
    ingest-health use case: rows-in vs rows-out)."""
    orders = read_testdata(spark, sf_smoke, "orders")["orders"]
    observed, obs_in = observe_metrics(orders, {"rows_in": F.count(F.lit(1))})
    kept = observed.filter(F.col("o_orderpriority") == "1-URGENT")
    rows_out = kept.count()
    assert obs_in.get["rows_in"] == orders.count()
    assert 0 < rows_out < obs_in.get["rows_in"]
