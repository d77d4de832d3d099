"""Reference-tier operator shapes realized over the oracle tables.

The football pipelines themselves run on football-shaped inputs (unit-tested
in tests/test_football_pipeline.py); the driver's DuckDB oracle only has the
TPC-H-ish tables, so each reference operator family is ALSO registered here
as the same shape over those tables (FIXTURES.md §C mapping):

- attack shape  = multi-way join -> agg -> 10 ratio/blend metrics
  (reference dag-transform.py:171-236)
- defense shape = join -> agg -> ratios + identity copy (:262-318)
- discipline shape = 3-way join -> weighted-index metrics (:339-387)

All formulas go through ``operators.relational.derive_metrics`` — the same
code path the football pipelines use — so the oracle gate exercises the
actual library operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_rags_spark.io.readers import read_testdata
from bigdata_rags_spark.operators.relational import derive_metrics
from bigdata_rags_spark.queries.catalog import TIER_REFERENCE, query

# Metric formulas over the aggregated (already-rounded) columns.  Shapes match
# the reference families: a/b, (a+b)/2, a*b/100, (a*1 + b*2 + c)/d.
_ATTACK_SHAPE = {
    "revenue_per_order": "ROUND(total_revenue / NULLIF(num_orders, 0), 6)",
    "orders_per_customer": "ROUND(num_orders / NULLIF(num_customers, 0), 6)",
    "urgent_rate_pct": "ROUND(urgent_orders * 100e0 / NULLIF(num_orders, 0), 6)",
    # avg_price is coarsened to 4 decimals before the blend: a 6-decimal
    # value halved yields an exact 7th-decimal 5 whenever the sum's 6th
    # digit is odd, and Spark/DuckDB ROUND disagree on decimal ties (seen
    # at sf0.1).  (4-dec + 2-dec)/2 has at most 5 decimals -> tie-free.
    "blended_price": "ROUND((ROUND(avg_price, 4) + max_price) / 2, 6)",
    "priority_index": (
        "ROUND((urgent_orders * 1 + high_orders * 2 + num_orders)"
        " / NULLIF(num_customers, 0), 6)"
    ),
}

_DEFENSE_SHAPE = {
    "qty_per_item": "ROUND(total_qty / NULLIF(num_items, 0), 6)",
    "avg_balance_copy": "avg_balance",  # identity copy (reference :291)
    "discount_burden": "ROUND(total_discount / NULLIF(total_price, 0), 6)",
    "items_per_supplier": "ROUND(num_items / NULLIF(num_suppliers, 0), 6)",
    "tax_to_discount": "ROUND(total_tax / NULLIF(total_discount, 0), 6)",
}

_DISCIPLINE_SHAPE = {
    "return_rate_pct": "ROUND(returned_items * 100e0 / NULLIF(num_items, 0), 6)",
    "open_to_closed": "ROUND(open_orders / NULLIF(closed_orders, 0), 6)",
    "severity_index": (
        "ROUND((returned_items * 1 + open_orders * 2 + num_items)"
        " / NULLIF(num_orders, 0), 6)"
    ),
    "items_per_order": "ROUND(num_items / NULLIF(num_orders, 0), 6)",
}


@query(
    "attack_shape_metrics",
    oracle="""
WITH agg AS (
  SELECT n_name,
         CAST(COUNT(*) AS BIGINT)           AS num_orders,
         COUNT(DISTINCT o_custkey)          AS num_customers,
         CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS urgent_orders,
         CAST(SUM(CASE WHEN o_orderpriority = '2-HIGH'   THEN 1 ELSE 0 END) AS BIGINT) AS high_orders,
         ROUND(SUM(o_totalprice), 2)        AS total_revenue,
         ROUND(AVG(o_totalprice), 6)        AS avg_price,
         ROUND(MAX(o_totalprice), 2)        AS max_price
  FROM orders
  JOIN customer ON o_custkey   = c_custkey
  JOIN nation   ON c_nationkey = n_nationkey
  GROUP BY n_name
)
SELECT *,
       ROUND(total_revenue / NULLIF(num_orders, 0), 6)      AS revenue_per_order,
       ROUND(num_orders / NULLIF(num_customers, 0), 6)      AS orders_per_customer,
       ROUND(urgent_orders * 100e0 / NULLIF(num_orders, 0), 6) AS urgent_rate_pct,
       ROUND((ROUND(avg_price, 4) + max_price) / 2, 6)      AS blended_price,
       ROUND((urgent_orders * 1 + high_orders * 2 + num_orders)
             / NULLIF(num_customers, 0), 6)                 AS priority_index
FROM agg
""",
    tier=TIER_REFERENCE,
)
def attack_shape_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = read_testdata(spark, sf_dir, "orders", "customer", "nation")
    agg = (
        t["orders"]
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("num_orders"),
            F.count_distinct(F.col("o_custkey")).alias("num_customers"),
            F.sum(F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)).alias(
                "urgent_orders"
            ),
            F.sum(F.when(F.col("o_orderpriority") == "2-HIGH", 1).otherwise(0)).alias(
                "high_orders"
            ),
            F.round(F.sum("o_totalprice"), 2).alias("total_revenue"),
            F.round(F.avg("o_totalprice"), 6).alias("avg_price"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
        )
    )
    return derive_metrics(agg, _ATTACK_SHAPE)


@query(
    "defense_shape_metrics",
    oracle="""
WITH agg AS (
  SELECT n_name,
         CAST(COUNT(*) AS BIGINT)        AS num_items,
         COUNT(DISTINCT s_suppkey)       AS num_suppliers,
         ROUND(SUM(l_quantity), 2)       AS total_qty,
         ROUND(SUM(l_extendedprice), 2)  AS total_price,
         ROUND(SUM(l_extendedprice * l_discount), 2) AS total_discount,
         ROUND(SUM(l_extendedprice * l_tax), 2)      AS total_tax,
         ROUND(AVG(s_acctbal), 6)        AS avg_balance
  FROM lineitem
  JOIN supplier ON l_suppkey   = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  GROUP BY n_name
)
SELECT *,
       ROUND(total_qty / NULLIF(num_items, 0), 6)          AS qty_per_item,
       avg_balance                                          AS avg_balance_copy,
       ROUND(total_discount / NULLIF(total_price, 0), 6)   AS discount_burden,
       ROUND(num_items / NULLIF(num_suppliers, 0), 6)      AS items_per_supplier,
       ROUND(total_tax / NULLIF(total_discount, 0), 6)     AS tax_to_discount
FROM agg
""",
    tier=TIER_REFERENCE,
)
def defense_shape_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = read_testdata(spark, sf_dir, "lineitem", "supplier", "nation")
    agg = (
        t["lineitem"]
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("num_items"),
            F.count_distinct(F.col("s_suppkey")).alias("num_suppliers"),
            F.round(F.sum("l_quantity"), 2).alias("total_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("total_price"),
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "total_discount"
            ),
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_tax")), 2).alias("total_tax"),
            F.round(F.avg("s_acctbal"), 6).alias("avg_balance"),
        )
    )
    return derive_metrics(agg, _DEFENSE_SHAPE)


@query(
    "discipline_shape_metrics",
    oracle="""
WITH agg AS (
  SELECT c_mktsegment,
         CAST(COUNT(*) AS BIGINT)  AS num_items,
         COUNT(DISTINCT o_orderkey) AS num_orders,
         CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS returned_items,
         CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS open_orders,
         CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS closed_orders
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey  = c_custkey
  GROUP BY c_mktsegment
)
SELECT *,
       ROUND(returned_items * 100e0 / NULLIF(num_items, 0), 6) AS return_rate_pct,
       ROUND(open_orders / NULLIF(closed_orders, 0), 6)        AS open_to_closed,
       ROUND((returned_items * 1 + open_orders * 2 + num_items)
             / NULLIF(num_orders, 0), 6)                       AS severity_index,
       ROUND(num_items / NULLIF(num_orders, 0), 6)             AS items_per_order
FROM agg
""",
    tier=TIER_REFERENCE,
)
def discipline_shape_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = read_testdata(spark, sf_dir, "lineitem", "orders", "customer")
    agg = (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("num_items"),
            F.count_distinct(F.col("o_orderkey")).alias("num_orders"),
            F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias("returned_items"),
            F.sum(F.when(F.col("o_orderstatus") == "O", 1).otherwise(0)).alias("open_orders"),
            F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).alias("closed_orders"),
        )
    )
    return derive_metrics(agg, _DISCIPLINE_SHAPE)
