"""Extension tier: relational operators absent from the reference
(SURVEY.md §2.4's verified-absent list), added as first-class engine surface.

Every query here is declarative DataFrame API -> Catalyst; the oracle SQL is
the semantic contract.  Determinism notes:
- top-k queries order by a total order (unique key as tiebreak);
- window orderings include a unique key so rank/lag are deterministic;
- timestamps are emitted as formatted strings (engine-neutral).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bigdata_rags_spark.io.readers import read_testdata
from bigdata_rags_spark.operators.skew import salted_join
from bigdata_rags_spark.queries.catalog import TIER_EXTENSION, query


def _q(name: str, oracle: str | None):
    return query(name, oracle, tier=TIER_EXTENSION)


# ---------------------------------------------------------------------------
# filter / predicate pushdown
# ---------------------------------------------------------------------------


@_q(
    "filter_pushdown_highvalue",
    """
SELECT l_orderkey, l_linenumber, l_quantity, ROUND(l_extendedprice, 2) AS price
FROM lineitem
WHERE l_quantity > 45 AND l_returnflag = 'R' AND l_discount BETWEEN 0.02 AND 0.08
""",
)
def filter_pushdown_highvalue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive predicate + projection: both reach the parquet scan
    (PushedFilters/ReadSchema in .explain) — nothing else is read."""
    li = read_testdata(spark, sf_dir, "lineitem")["lineitem"]
    return (
        li.filter(
            (F.col("l_quantity") > 45)
            & (F.col("l_returnflag") == "R")
            & F.col("l_discount").between(0.02, 0.08)
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_quantity",
            F.round("l_extendedprice", 2).alias("price"),
        )
    )


@_q(
    "topk_orders_by_price",
    """
SELECT o_orderkey, ROUND(o_totalprice, 2) AS total_price, o_orderpriority
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 25
""",
)
def topk_orders_by_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k: planned as TakeOrderedAndProject (per-partition k + driver
    merge of k*P rows) — no global sort at any scale.  o_orderkey breaks
    price ties for determinism."""
    o = read_testdata(spark, sf_dir, "orders")["orders"]
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(25)
        .select(
            "o_orderkey",
            F.round("o_totalprice", 2).alias("total_price"),
            "o_orderpriority",
        )
    )


@_q(
    "distinct_nation_segments",
    """
SELECT DISTINCT c_nationkey, c_mktsegment FROM customer
""",
)
def distinct_nation_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT = hash aggregate on all columns; partial agg keeps the
    shuffle at |distinct| per partition."""
    c = read_testdata(spark, sf_dir, "customer")["customer"]
    return c.select("c_nationkey", "c_mktsegment").distinct()


# ---------------------------------------------------------------------------
# non-inner joins
# ---------------------------------------------------------------------------


@_q(
    "left_join_customer_orders",
    """
SELECT c_custkey, c_mktsegment,
       CAST(COUNT(o_orderkey) AS BIGINT) AS num_orders,
       ROUND(COALESCE(SUM(o_totalprice), 0), 2) AS total_spend
FROM customer
LEFT JOIN orders ON o_custkey = c_custkey
GROUP BY c_custkey, c_mktsegment
""",
)
def left_join_customer_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving customers with zero orders (the reference
    only ever inner-joins; SURVEY §2.4)."""
    t = read_testdata(spark, sf_dir, "customer", "orders")
    return (
        t["customer"]
        .join(t["orders"], F.col("o_custkey") == F.col("c_custkey"), "left")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            F.count("o_orderkey").alias("num_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias("total_spend"),
        )
    )


@_q(
    "semi_join_customers_with_urgent",
    """
SELECT c_custkey, c_name
FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
""",
)
def semi_join_customers_with_urgent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join — dedup-free existence check; Spark never materializes
    right-side columns."""
    t = read_testdata(spark, sf_dir, "customer", "orders")
    urgent = t["orders"].filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        t["customer"]
        .join(urgent, F.col("o_custkey") == F.col("c_custkey"), "left_semi")
        .select("c_custkey", "c_name")
    )


@_q(
    "anti_join_customers_no_orders",
    """
SELECT c_custkey, c_mktsegment
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
""",
)
def anti_join_customers_no_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join against the URGENT order subset (every customer has
    SOME order in the testdata, so the unrestricted anti-join is vacuously
    empty — VERDICT r1; 203 rows at sf0.01 evidences the anti semantics)."""
    t = read_testdata(spark, sf_dir, "customer", "orders")
    urgent = t["orders"].filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        t["customer"]
        .join(urgent, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .select("c_custkey", "c_mktsegment")
    )


@_q(
    "full_outer_join_supplier_customer_nations",
    """
WITH s AS (SELECT s_nationkey, CAST(COUNT(*) AS BIGINT) AS num_suppliers
           FROM supplier WHERE s_nationkey < 12 GROUP BY s_nationkey),
     c AS (SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS num_customers
           FROM customer WHERE c_nationkey >= 8 GROUP BY c_nationkey)
SELECT COALESCE(s_nationkey, c_nationkey) AS nationkey,
       COALESCE(num_suppliers, 0) AS num_suppliers,
       COALESCE(num_customers, 0) AS num_customers
FROM s FULL OUTER JOIN c ON s_nationkey = c_nationkey
""",
)
def full_outer_join_supplier_customer_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-outer join with deliberately disjoint-ish inputs (suppliers from
    nations < 12, customers from nations >= 8) so BOTH null-producing
    branches fire — all 25 nations have both in the raw data, which made the
    unrestricted outer join vacuously inner (VERDICT r1).  At sf0.01: 8
    supplier-only + 13 customer-only + 4 matched nations."""
    t = read_testdata(spark, sf_dir, "supplier", "customer")
    s = (
        t["supplier"]
        .filter(F.col("s_nationkey") < 12)
        .groupBy("s_nationkey")
        .agg(F.count(F.lit(1)).alias("num_suppliers"))
    )
    c = (
        t["customer"]
        .filter(F.col("c_nationkey") >= 8)
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("num_customers"))
    )
    return (
        s.join(c, F.col("s_nationkey") == F.col("c_nationkey"), "full_outer")
        .select(
            F.coalesce("s_nationkey", "c_nationkey").alias("nationkey"),
            F.coalesce("num_suppliers", F.lit(0)).alias("num_suppliers"),
            F.coalesce("num_customers", F.lit(0)).alias("num_customers"),
        )
    )


# ---------------------------------------------------------------------------
# aggregation breadth
# ---------------------------------------------------------------------------


@_q(
    "agg_suite_by_segment",
    """
SELECT c_mktsegment,
       CAST(COUNT(*) AS BIGINT)           AS num_customers,
       COUNT(DISTINCT c_nationkey)        AS num_nations,
       ROUND(AVG(c_acctbal), 6)           AS avg_bal,
       ROUND(MIN(c_acctbal), 2)           AS min_bal,
       ROUND(MAX(c_acctbal), 2)           AS max_bal,
       ROUND(SUM(c_acctbal), 2)           AS sum_bal,
       ROUND(STDDEV_SAMP(c_acctbal), 4)   AS std_bal
FROM customer
GROUP BY c_mktsegment
""",
)
def agg_suite_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """avg/min/max/count-distinct/stddev (none exist in the reference).
    stddev rounded to 4: both engines use Welford-style accumulation whose
    merge order can differ in the last ulps."""
    c = read_testdata(spark, sf_dir, "customer")["customer"]
    return c.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("num_customers"),
        F.count_distinct("c_nationkey").alias("num_nations"),
        F.round(F.avg("c_acctbal"), 6).alias("avg_bal"),
        F.round(F.min("c_acctbal"), 2).alias("min_bal"),
        F.round(F.max("c_acctbal"), 2).alias("max_bal"),
        F.round(F.sum("c_acctbal"), 2).alias("sum_bal"),
        F.round(F.stddev_samp("c_acctbal"), 4).alias("std_bal"),
    )


@_q(
    "rollup_status_priority",
    """
SELECT COALESCE(o_orderstatus, 'ALL')   AS status,
       COALESCE(o_orderpriority, 'ALL') AS priority,
       CAST(COUNT(*) AS BIGINT)         AS num_orders,
       ROUND(SUM(o_totalprice), 2)      AS revenue
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
""",
)
def rollup_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets (absent from the reference).  NULL group keys are
    COALESCEd to a sentinel on both sides so the value-hash is well-defined."""
    o = read_testdata(spark, sf_dir, "orders")["orders"]
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("num_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "num_orders",
            "revenue",
        )
    )


@_q(
    "cube_returnflag_linestatus",
    """
SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
       COALESCE(l_linestatus, 'ALL') AS linestatus,
       CAST(COUNT(*) AS BIGINT)      AS num_items,
       ROUND(SUM(l_quantity), 2)     AS total_qty
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
""",
)
def cube_returnflag_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_testdata(spark, sf_dir, "lineitem")["lineitem"]
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("num_items"),
            F.round(F.sum("l_quantity"), 2).alias("total_qty"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "num_items",
            "total_qty",
        )
    )


@_q(
    "tpch_q1_pricing_summary",
    """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2)      AS sum_qty,
       ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       ROUND(AVG(l_quantity), 6)      AS avg_qty,
       ROUND(AVG(l_extendedprice), 6) AS avg_price,
       ROUND(AVG(l_discount), 6)      AS avg_disc,
       CAST(COUNT(*) AS BIGINT)       AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2024-09-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
)
def tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 analog — the canonical wide-aggregate scan; one pass, partial
    agg, 4-6 rows out regardless of input size."""
    li = read_testdata(spark, sf_dir, "lineitem")["lineitem"]
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2024-09-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "sum_disc_price"
            ),
            F.round(
                F.sum(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
                ),
                2,
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# window functions
# ---------------------------------------------------------------------------


@_q(
    "window_rank_orders_in_segment",
    """
WITH ranked AS (
  SELECT c_mktsegment, o_orderkey, ROUND(o_totalprice, 2) AS total_price,
         RANK()       OVER (PARTITION BY c_mktsegment ORDER BY o_totalprice DESC, o_orderkey) AS rnk,
         ROW_NUMBER() OVER (PARTITION BY c_mktsegment ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders JOIN customer ON o_custkey = c_custkey
)
SELECT * FROM ranked WHERE rnk <= 5
""",
)
def window_rank_orders_in_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank/row_number windows + filter-on-rank (top-N per group).  The window
    shuffles once on the partition key; o_orderkey tiebreak makes it
    deterministic."""
    t = read_testdata(spark, sf_dir, "orders", "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        t["orders"]
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_mktsegment",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("total_price"),
            F.rank().over(w).alias("rnk"),
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rnk") <= 5)
    )


@_q(
    "window_lag_running_sum",
    """
SELECT o_custkey, o_orderkey,
       ROUND(o_totalprice, 2) AS total_price,
       ROUND(COALESCE(LAG(o_totalprice) OVER w, 0), 2) AS prev_price,
       ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey
             ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend,
       ROUND(AVG(o_totalprice) OVER (PARTITION BY o_custkey
             ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS moving_avg_3
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
""",
)
def window_lag_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag + running sum + moving average over a per-customer time order
    (ROWS frames; unique-key tiebreak for determinism)."""
    o = read_testdata(spark, sf_dir, "orders")["orders"]
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round("o_totalprice", 2).alias("total_price"),
        F.round(F.coalesce(F.lag("o_totalprice").over(w), F.lit(0.0)), 2).alias("prev_price"),
        F.round(
            F.sum("o_totalprice").over(w.rowsBetween(Window.unboundedPreceding, 0)), 2
        ).alias("running_spend"),
        F.round(F.avg("o_totalprice").over(w.rowsBetween(-2, 0)), 6).alias("moving_avg_3"),
    )


# ---------------------------------------------------------------------------
# set operations
# ---------------------------------------------------------------------------


@_q(
    "set_ops_nation_membership",
    """
WITH sup_nations  AS (SELECT DISTINCT s_nationkey AS nationkey FROM supplier),
     cust_nations AS (SELECT DISTINCT c_nationkey AS nationkey FROM customer),
     both_n   AS (SELECT nationkey FROM sup_nations INTERSECT SELECT nationkey FROM cust_nations),
     cust_only AS (SELECT nationkey FROM cust_nations EXCEPT SELECT nationkey FROM sup_nations),
     all_n    AS (SELECT nationkey FROM sup_nations UNION SELECT nationkey FROM cust_nations)
SELECT 'both' AS membership, CAST(COUNT(*) AS BIGINT) AS n FROM both_n
UNION ALL
SELECT 'customer_only', CAST(COUNT(*) AS BIGINT) FROM cust_only
UNION ALL
SELECT 'any', CAST(COUNT(*) AS BIGINT) FROM all_n
""",
)
def set_ops_nation_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """union / intersect / except (all absent from the reference)."""
    t = read_testdata(spark, sf_dir, "supplier", "customer")
    sup = t["supplier"].select(F.col("s_nationkey").alias("nationkey")).distinct()
    cust = t["customer"].select(F.col("c_nationkey").alias("nationkey")).distinct()
    counts = [
        sup.intersect(cust).agg(F.count(F.lit(1)).alias("n")).select(
            F.lit("both").alias("membership"), "n"
        ),
        cust.exceptAll(sup).distinct().agg(F.count(F.lit(1)).alias("n")).select(
            F.lit("customer_only").alias("membership"), "n"
        ),
        sup.union(cust).distinct().agg(F.count(F.lit(1)).alias("n")).select(
            F.lit("any").alias("membership"), "n"
        ),
    ]
    out = counts[0]
    for c in counts[1:]:
        out = out.unionAll(c)
    return out


# ---------------------------------------------------------------------------
# scalar functions: string / date / math / conditional
# ---------------------------------------------------------------------------


@_q(
    "string_functions_parts",
    """
SELECT p_partkey,
       UPPER(p_brand)                       AS brand_upper,
       LOWER(p_type)                        AS type_lower,
       CAST(LENGTH(p_name) AS INT)          AS name_len,
       SUBSTRING(p_type, 1, 5)              AS type_prefix,
       REPLACE(p_name, ' ', '_')            AS name_snake,
       CONCAT(p_brand, ':', p_type)         AS brand_type,
       CASE WHEN p_size >= 25 THEN 'large'
            WHEN p_size >= 10 THEN 'medium'
            ELSE 'small' END                AS size_class
FROM part
""",
)
def string_functions_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = read_testdata(spark, sf_dir, "part")["part"]
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.lower("p_type").alias("type_lower"),
        F.length("p_name").cast("int").alias("name_len"),
        F.substring("p_type", 1, 5).alias("type_prefix"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_snake"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.when(F.col("p_size") >= 25, "large")
        .when(F.col("p_size") >= 10, "medium")
        .otherwise("small")
        .alias("size_class"),
    )


@_q(
    "date_functions_orders",
    """
SELECT CAST(YEAR(o_orderdate) AS INT)   AS order_year,
       CAST(MONTH(o_orderdate) AS INT)  AS order_month,
       STRFTIME(DATE_TRUNC('month', o_orderdate), '%Y-%m-%d') AS month_start,
       CAST(COUNT(*) AS BIGINT)         AS num_orders,
       ROUND(SUM(o_totalprice), 2)      AS revenue
FROM orders
GROUP BY 1, 2, 3
""",
)
def date_functions_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """year/month extraction + date_trunc, emitted as engine-neutral strings."""
    o = read_testdata(spark, sf_dir, "orders")["orders"]
    return (
        o.groupBy(
            F.year("o_orderdate").alias("order_year"),
            F.month("o_orderdate").alias("order_month"),
            F.date_format(F.date_trunc("month", F.col("o_orderdate")), "yyyy-MM-dd").alias(
                "month_start"
            ),
        )
        .agg(
            F.count(F.lit(1)).alias("num_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
    )


@_q(
    "math_functions_lineitem",
    """
SELECT l_orderkey, l_linenumber,
       ROUND(SQRT(l_extendedprice), 6)        AS price_sqrt,
       ROUND(LN(l_extendedprice + 1), 6)      AS price_ln,
       CAST(CEIL(l_quantity) AS BIGINT)       AS qty_ceil,
       CAST(FLOOR(l_quantity) AS BIGINT)      AS qty_floor,
       ABS(l_quantity - 25)                   AS qty_dev,
       ROUND(POWER(l_discount, 2), 8)         AS disc_sq,
       CAST(l_quantity AS BIGINT) % 7         AS qty_mod
FROM lineitem
WHERE l_linenumber = 1
""",
)
def math_functions_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_testdata(spark, sf_dir, "lineitem")["lineitem"]
    return li.filter(F.col("l_linenumber") == 1).select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.sqrt("l_extendedprice"), 6).alias("price_sqrt"),
        F.round(F.log(F.col("l_extendedprice") + 1), 6).alias("price_ln"),
        F.ceil("l_quantity").alias("qty_ceil"),
        F.floor("l_quantity").alias("qty_floor"),
        F.abs(F.col("l_quantity") - 25).alias("qty_dev"),
        F.round(F.pow("l_discount", 2), 8).alias("disc_sq"),
        (F.col("l_quantity").cast("bigint") % 7).alias("qty_mod"),
    )


@_q(
    "conditional_agg_priority_matrix",
    """
SELECT o_orderstatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_priority,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_priority,
       ROUND(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN o_totalprice ELSE 0 END), 2) AS high_revenue
FROM orders
GROUP BY o_orderstatus
""",
)
def conditional_agg_priority_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot-style conditional aggregation (TPC-H Q12 shape)."""
    o = read_testdata(spark, sf_dir, "orders")["orders"]
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return o.groupBy("o_orderstatus").agg(
        F.sum(F.when(high, 1).otherwise(0)).alias("high_priority"),
        F.sum(F.when(~high, 1).otherwise(0)).alias("low_priority"),
        F.round(F.sum(F.when(high, F.col("o_totalprice")).otherwise(0.0)), 2).alias(
            "high_revenue"
        ),
    )


@_q(
    "pivot_returnflag_by_status",
    """
SELECT l_linestatus,
       ROUND(COALESCE(SUM(CASE WHEN l_returnflag = 'A' THEN l_quantity END), 0), 2) AS A,
       ROUND(COALESCE(SUM(CASE WHEN l_returnflag = 'N' THEN l_quantity END), 0), 2) AS N,
       ROUND(COALESCE(SUM(CASE WHEN l_returnflag = 'R' THEN l_quantity END), 0), 2) AS R
FROM lineitem
GROUP BY l_linestatus
""",
)
def pivot_returnflag_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (wide conditional aggregation).  Pivot values are declared
    explicitly — at scale, never let Spark run the extra distinct-values
    job an implicit pivot needs."""
    li = read_testdata(spark, sf_dir, "lineitem")["lineitem"]
    return (
        li.groupBy("l_linestatus")
        .pivot("l_returnflag", ["A", "N", "R"])
        .sum("l_quantity")
        .select(
            "l_linestatus",
            *[F.round(F.coalesce(F.col(c), F.lit(0.0)), 2).alias(c) for c in ("A", "N", "R")],
        )
    )


@_q(
    "percentiles_by_priority",
    """
SELECT o_orderpriority,
       ROUND(quantile_cont(o_totalprice, 0.25), 6) AS p25,
       ROUND(quantile_cont(o_totalprice, 0.5), 6)  AS p50,
       ROUND(quantile_cont(o_totalprice, 0.9), 6)  AS p90
FROM orders
GROUP BY o_orderpriority
""",
)
def percentiles_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (both engines implement the standard
    linear-interpolation percentile_cont/quantile_cont definition).  At
    extreme scale swap for approx_percentile and drop the oracle."""
    o = read_testdata(spark, sf_dir, "orders")["orders"]
    return o.groupBy("o_orderpriority").agg(
        F.round(F.percentile("o_totalprice", F.lit(0.25)), 6).alias("p25"),
        F.round(F.percentile("o_totalprice", F.lit(0.5)), 6).alias("p50"),
        F.round(F.percentile("o_totalprice", F.lit(0.9)), 6).alias("p90"),
    )


@_q(
    "mad_outlier_orders",
    """
WITH med AS (
  SELECT o_orderpriority, median(o_totalprice) AS med FROM orders GROUP BY 1
),
dev AS (
  SELECT o.o_orderpriority, median(abs(o.o_totalprice - m.med)) AS mad
  FROM orders o JOIN med m USING (o_orderpriority) GROUP BY 1
)
SELECT o.o_orderpriority,
       ROUND(MIN(m.med), 2) AS med,
       ROUND(MIN(d.mad), 2) AS mad,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CASE WHEN abs(o.o_totalprice - m.med) > 1.5 * d.mad THEN 1 ELSE 0 END) AS BIGINT)
         AS n_outliers
FROM orders o
JOIN med m USING (o_orderpriority)
JOIN dev d USING (o_orderpriority)
GROUP BY 1
""",
)
def mad_outlier_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection by median absolute deviation (the
    median/MAD robust z-score — outlier-resistant, unlike mean/stddev):
    per-priority median, MAD, and the count of orders deviating more than
    1.5 MAD (k tuned so ~25% flag on the uniform fixture — both branches
    real).  Median interpolation matches DuckDB's percentile_cont
    (pinned by ``percentiles_by_priority``), so the comparison runs on
    bit-identical med/mad doubles in both engines.

    100 TB: exact medians need a sort-based percentile per group — two
    grouped aggregations plus a broadcast of the |groups|-row med/mad
    tables back onto the fact scan; swap in approx_percentile for
    sketch-based medians when groups are huge (see
    ``approx_percentile_prices``)."""
    t = read_testdata(spark, sf_dir, "orders")
    o = t["orders"].select("o_orderpriority", "o_totalprice")
    med = o.groupBy("o_orderpriority").agg(
        F.expr("percentile(o_totalprice, 0.5)").alias("med")
    )
    dev = (
        o.join(F.broadcast(med), "o_orderpriority")
        .groupBy("o_orderpriority")
        .agg(F.expr("percentile(abs(o_totalprice - med), 0.5)").alias("mad"))
    )
    return (
        o.join(F.broadcast(med), "o_orderpriority")
        .join(F.broadcast(dev), "o_orderpriority")
        .groupBy("o_orderpriority")
        .agg(
            F.round(F.min("med"), 2).alias("med"),
            F.round(F.min("mad"), 2).alias("mad"),
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum(
                F.when(
                    F.abs(F.col("o_totalprice") - F.col("med")) > 1.5 * F.col("mad"), 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_outliers"),
        )
    )


@_q(
    "window_trailing_7d_range_frame",
    """
WITH o AS (
  SELECT o_orderkey, o_custkey, epoch(o_orderdate) // 86400 AS day_num, o_totalprice
  FROM orders WHERE o_custkey < 50
)
SELECT o_orderkey, o_custkey, CAST(day_num AS BIGINT) AS day_num,
       CAST(COUNT(*) OVER w AS BIGINT)   AS n_7d,
       ROUND(SUM(o_totalprice) OVER w, 2) AS sum_7d
FROM o
WINDOW w AS (PARTITION BY o_custkey ORDER BY day_num
             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
""",
)
def window_trailing_7d_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame window (value-based, not row-based): each order sees the
    trailing 7 calendar DAYS of same-customer orders — however many rows
    that is — the frame variant ``window_lag_running_sum``'s ROWS frames
    can't express.  Time is converted to an integer day number because
    Spark RANGE frames take numeric offsets; partitioned by customer, so
    no global window."""
    from pyspark.sql import Window

    t = read_testdata(spark, sf_dir, "orders")
    o = t["orders"].filter(F.col("o_custkey") < 50).select(
        "o_orderkey",
        "o_custkey",
        F.expr("unix_timestamp(o_orderdate) div 86400").alias("day_num"),
        "o_totalprice",
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("day_num")
        .rangeBetween(-6, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.col("day_num").cast("bigint").alias("day_num"),
        F.count(F.lit(1)).over(w).cast("bigint").alias("n_7d"),
        F.round(F.sum("o_totalprice").over(w), 2).alias("sum_7d"),
    )


@_q(
    "tpch_q2_cheapest_supplier",
    """
WITH offers AS (
  SELECT l.l_partkey, l.l_suppkey, MIN(l.l_extendedprice) AS best_price
  FROM lineitem l GROUP BY 1, 2
),
best AS (
  SELECT l_partkey, MIN(best_price) AS min_price FROM offers GROUP BY 1
)
SELECT p.p_brand, n.n_name,
       CAST(COUNT(*) AS BIGINT)   AS n_offers,
       ROUND(SUM(o.best_price), 2) AS total_best_price
FROM offers o
JOIN best b ON o.l_partkey = b.l_partkey AND o.best_price = b.min_price
JOIN part p     ON o.l_partkey = p.p_partkey
JOIN supplier s ON o.l_suppkey = s.s_suppkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
WHERE p.p_size <= 20
GROUP BY 1, 2
""",
)
def tpch_q2_cheapest_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 analog (min-cost-supplier): the correlated 'row matching the
    per-group minimum' shape, decorrelated into an aggregate + self-join —
    the plan TPC-H engines use for Q2 (there is no partsupp table in the
    testdata, so supplier offers derive from lineitem's cheapest line per
    (part, supplier)).  Exercises part/supplier/nation joins the other
    extension queries don't touch.

    100 TB: both aggs are partial-agg friendly on (partkey[, suppkey]);
    the min-price join is co-keyed with the offers relation (ReusedExchange
    candidate); part/supplier/nation are dimension joins."""
    t = read_testdata(spark, sf_dir, "lineitem", "part", "supplier", "nation")
    offers = t["lineitem"].groupBy("l_partkey", "l_suppkey").agg(
        F.min("l_extendedprice").alias("best_price")
    )
    best = offers.groupBy("l_partkey").agg(F.min("best_price").alias("min_price"))
    return (
        offers.join(
            best,
            (offers["l_partkey"] == best["l_partkey"])
            & (offers["best_price"] == best["min_price"]),
        )
        .drop(best["l_partkey"])
        .join(t["part"].filter(F.col("p_size") <= 20), F.col("l_partkey") == F.col("p_partkey"))
        .join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("p_brand", "n_name")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_offers"),
            F.round(F.sum("best_price"), 2).alias("total_best_price"),
        )
    )


@_q(
    "histogram_order_prices",
    """
WITH b AS (
  SELECT CAST(LEAST(FLOOR(o_totalprice / 50000), 9) AS BIGINT) AS bucket
  FROM orders
)
SELECT bucket,
       bucket * 50000        AS lo,
       (bucket + 1) * 50000  AS hi,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM b GROUP BY bucket
""",
)
def histogram_order_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram (width_bucket shape): price distribution in
    50k bins with a clamped top bucket — the distribution-profiling
    primitive behind every data-exploration UI.  Pure integer bucket math,
    one partial-agg scan; bucket count is constant so output is
    dimension-sized at any data scale."""
    t = read_testdata(spark, sf_dir, "orders")
    bucket = F.least(F.floor(F.col("o_totalprice") / 50000), F.lit(9)).cast("bigint")
    return (
        t["orders"]
        .select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_orders"))
        .select(
            "bucket",
            (F.col("bucket") * 50000).alias("lo"),
            ((F.col("bucket") + 1) * 50000).alias("hi"),
            "n_orders",
        )
    )


@_q(
    "data_quality_report",
    """
WITH base AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v_null,
         CAST(SUM(CASE WHEN o_totalprice IS NOT NULL
                        AND o_totalprice NOT BETWEEN 0 AND 400000 THEN 1 ELSE 0 END) AS BIGINT) AS v_range,
         CAST(SUM(CASE WHEN o_orderpriority IS NOT NULL AND o_orderpriority NOT IN
                        ('1-URGENT', '2-HIGH', '3-MEDIUM', '4-NOT SPECIFIED') THEN 1 ELSE 0 END) AS BIGINT) AS v_set
  FROM orders
),
uq AS (
  SELECT CAST(COALESCE(SUM(c), 0) AS BIGINT) AS v FROM (
    SELECT COUNT(*) AS c FROM orders GROUP BY o_orderkey HAVING COUNT(*) > 1)
),
fk AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS v FROM orders o
  WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
),
long AS (
  SELECT 'not_null_o_orderkey' AS check_name, v_null AS violations, n_rows FROM base
  UNION ALL SELECT 'range_o_totalprice', v_range, n_rows FROM base
  UNION ALL SELECT 'in_set_o_orderpriority', v_set, n_rows FROM base
  UNION ALL SELECT 'unique_o_orderkey', uq.v, base.n_rows FROM uq, base
  UNION ALL SELECT 'fk_o_custkey', fk.v, base.n_rows FROM fk, base
)
SELECT check_name, violations, n_rows,
       CAST(CASE WHEN violations = 0 THEN 1 ELSE 0 END AS BIGINT) AS passed
FROM long
""",
)
def data_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality gate (Deequ / Great-Expectations pattern,
    public) over orders: null / range / accepted-set checks compiled into
    ONE scan, plus key-uniqueness and referential-integrity checks.
    Thresholds are deliberately tight so BOTH outcome branches are real at
    sf0.01 (range and set checks fire — 2978 and ~2k violations — while
    null/unique/FK pass; vacuous-check rule).  See
    ``operators/expectations.py`` for the 100 TB design."""
    from bigdata_rags_spark.operators.expectations import (
        expect_in_range,
        expect_in_set,
        expect_not_null,
        expect_references,
        expect_unique,
        expectation_suite,
    )

    t = read_testdata(spark, sf_dir, "orders", "customer")
    col_checks = expectation_suite(
        t["orders"],
        {
            "not_null_o_orderkey": expect_not_null("o_orderkey"),
            "range_o_totalprice": expect_in_range("o_totalprice", 0, 400_000),
            "in_set_o_orderpriority": expect_in_set(
                "o_orderpriority", ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED"]
            ),
        },
    )
    return col_checks.unionByName(expect_unique(t["orders"], "o_orderkey")).unionByName(
        expect_references(t["orders"], "o_custkey", t["customer"], "c_custkey")
    )


@_q("approx_percentile_prices", None)
def approx_percentile_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile-SKETCH per group (Greenwald-Khanna via ``approx_percentile``)
    — the scale path for groupwise quantiles: mergeable fixed-memory
    sketches, one pass, no per-group sort, unlike exact ``percentile``
    (which ``percentiles_by_priority`` covers with a full oracle).
    Rows-only driver check: sketch internals are engine-specific by nature
    (same policy as the HLL entry); accuracy vs the exact percentiles is
    pinned in ``tests/test_llm_ops.py::test_approx_percentile_accuracy``."""
    t = read_testdata(spark, sf_dir, "orders")
    return t["orders"].groupBy("o_orderpriority").agg(
        F.approx_percentile("o_totalprice", 0.5, 1000).alias("p50_approx"),
        F.approx_percentile("o_totalprice", 0.95, 1000).alias("p95_approx"),
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
    )


@_q("approx_count_distinct_orders", None)
def approx_count_distinct_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct estimate per segment — the scale path for
    distinct counting (fixed memory, one pass, no Expand).  Rows-only
    driver check: HLL sketches are engine-specific by nature."""
    t = read_testdata(spark, sf_dir, "orders", "customer")
    return (
        t["orders"]
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(
            F.approx_count_distinct("o_orderkey").alias("approx_orders"),
            F.approx_count_distinct("o_custkey").alias("approx_customers"),
        )
    )


@_q(
    "explode_embedding_dim_stats",
    """
WITH dims AS (
  SELECT label,
         generate_subscripts(embedding, 1) - 1 AS dim,
         unnest(embedding::DOUBLE[]) AS val
  FROM embeddings
)
SELECT label, dim,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(AVG(val), 6) AS avg_val,
       ROUND(MIN(val), 6) AS min_val,
       ROUND(MAX(val), 6) AS max_val
FROM dims
WHERE dim < 8
GROUP BY label, dim
""",
)
def explode_embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode over array columns: per-dimension stats across vectors
    (array surface the reference never had)."""
    e = read_testdata(spark, sf_dir, "embeddings")["embeddings"]
    return (
        e.select("label", F.posexplode(F.col("embedding").cast("array<double>")).alias("dim", "val"))
        .filter(F.col("dim") < 8)
        .groupBy("label", "dim")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("val"), 6).alias("avg_val"),
            F.round(F.min("val"), 6).alias("min_val"),
            F.round(F.max("val"), 6).alias("max_val"),
        )
    )


@_q(
    "range_join_shipments_in_window",
    """
SELECT o_orderkey, l_linenumber,
       CAST(YEAR(o_orderdate) AS INT) AS order_year,
       ROUND(l_extendedprice, 2) AS price
FROM orders JOIN lineitem
  ON l_orderkey = o_orderkey
 AND l_shipdate >= o_orderdate
 AND l_shipdate <= o_orderdate + INTERVAL 30 DAY
""",
)
def range_join_shipments_in_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi + band (range) join: lineitems shipped within 30 days of their
    order date.  The equi key keeps this a hash join with the band as a
    post-condition — no cartesian at any scale."""
    from bigdata_rags_spark.operators.extensions import range_join

    t = read_testdata(spark, sf_dir, "orders", "lineitem")
    joined = range_join(
        t["orders"],
        t["lineitem"],
        F.col("l_orderkey") == F.col("o_orderkey"),
        F.col("l_shipdate") >= F.col("o_orderdate"),
        F.col("l_shipdate") <= F.col("o_orderdate") + F.expr("INTERVAL 30 DAY"),
    )
    return joined.select(
        "o_orderkey",
        "l_linenumber",
        F.year("o_orderdate").alias("order_year"),
        F.round("l_extendedprice", 2).alias("price"),
    )


@_q(
    "asof_join_events_orders",
    """
WITH ranked AS (
  SELECT e.event_id, e.user_id,
         (epoch_ns(e.ts) // 1000000000) AS event_sec,
         o.o_orderkey, o.o_totalprice,
         ROW_NUMBER() OVER (
           PARTITION BY e.event_id
           ORDER BY o.o_orderdate DESC, o.o_orderkey
         ) AS rn
  FROM events e
  LEFT JOIN orders o
    ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
)
SELECT event_id, user_id, event_sec, o_orderkey AS last_orderkey,
       ROUND(o_totalprice, 2) AS last_order_price
FROM ranked WHERE rn = 1
""",
)
def asof_join_events_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (backward): each event picks the customer's most recent
    order at event time (operators/extensions.asof_join); ties broken by
    o_orderkey.  The event keeps NULLs when no prior order exists."""
    from bigdata_rags_spark.operators.extensions import asof_join
    from bigdata_rags_spark.streaming.events import read_events_batch

    events = read_events_batch(spark, sf_dir).select("event_id", "user_id", "ts", "ts_ns")
    orders = read_testdata(spark, sf_dir, "orders")["orders"].select(
        "o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"
    )
    joined = asof_join(
        events.withColumnRenamed("user_id", "cust"),
        orders.withColumnRenamed("o_custkey", "cust"),
        left_key="event_id",
        on="cust",
        left_time="ts",
        right_time="o_orderdate",
        tie_breaker="o_orderkey",
    )
    return joined.select(
        "event_id",
        F.col("cust").alias("user_id"),
        F.expr("ts_ns div 1000000000").alias("event_sec"),
        F.col("o_orderkey").alias("last_orderkey"),
        F.round("o_totalprice", 2).alias("last_order_price"),
    )


@_q(
    "tpch_q3_shipping_priority",
    """
WITH agg AS (
  SELECT l_orderkey,
         ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
         STRFTIME(o_orderdate, '%Y-%m-%d') AS orderdate,
         o_orderpriority
  FROM customer
  JOIN orders   ON c_custkey = o_custkey
  JOIN lineitem ON l_orderkey = o_orderkey
  WHERE c_mktsegment = 'BUILDING'
    AND o_orderdate < TIMESTAMP '1996-03-15 00:00:00'
    AND l_shipdate  > TIMESTAMP '1996-03-15 00:00:00'
  GROUP BY l_orderkey, o_orderdate, o_orderpriority
)
SELECT * FROM agg ORDER BY revenue DESC, l_orderkey LIMIT 10
""",
)
def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 analog: selective filters on both join sides (pushed to the
    scans), 3-way join, agg, top-10 — the canonical composite OLAP shape.
    The 1996-03-15 cutoff (classic Q3 split) sits inside the testdata's
    1995-2001 date range so the check is non-vacuous (510 candidate groups
    at sf0.01; VERDICT r1 flagged the old 2024 literal as 0-row)."""
    t = read_testdata(spark, sf_dir, "customer", "orders", "lineitem")
    cutoff = F.lit("1996-03-15 00:00:00").cast("timestamp")
    return (
        t["customer"]
        .filter(F.col("c_mktsegment") == "BUILDING")
        .join(
            t["orders"].filter(F.col("o_orderdate") < cutoff),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        .join(
            t["lineitem"].filter(F.col("l_shipdate") > cutoff),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
        .select("l_orderkey", "revenue", "orderdate", "o_orderpriority")
    )


@_q(
    "unpivot_lineitem_measures",
    """
WITH src AS (
  SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax
  FROM lineitem WHERE l_orderkey < 100
)
SELECT l_orderkey, l_linenumber, measure, ROUND(value, 6) AS value
FROM src
UNPIVOT (value FOR measure IN (l_quantity, l_extendedprice, l_discount, l_tax))
""",
)
def unpivot_lineitem_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide-to-long melt (``DataFrame.unpivot`` — the inverse of pivot,
    completing the reshape pair with ``pivot_returnflag_by_status``).  Plans
    as an Expand node: 4 output rows per input row, produced in the scan
    stage with no shuffle — the 100 TB cost is output volume, not exchange."""
    li = read_testdata(spark, sf_dir, "lineitem")["lineitem"]
    return (
        li.filter(F.col("l_orderkey") < 100)
        .unpivot(
            ["l_orderkey", "l_linenumber"],
            ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
            "measure",
            "raw_value",
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            "measure",
            F.round("raw_value", 6).alias("value"),
        )
    )


@_q(
    "salted_join_revenue_by_priority",
    """
SELECT o_orderpriority,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
""",
)
def salted_join_revenue_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fact-fact join routed through ``operators/skew.salted_join`` —
    proves the salted plan (8-way key sharding, deterministic xxhash64 salt)
    is RESULT-EQUIVALENT to the plain join: the oracle is the unsalted SQL.
    Salting spreads each hot l_orderkey over 8 reducers; the salt column is
    internal and dropped, so output is salt-invariant by construction."""
    t = read_testdata(spark, sf_dir, "orders", "lineitem")
    joined = salted_join(
        t["lineitem"].select("l_orderkey", "l_extendedprice", "l_discount"),
        t["orders"].select(
            F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
        ),
        key="l_orderkey",
        num_salts=8,
    )
    return joined.groupBy("o_orderpriority").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
    )


@_q(
    "tpch_q4_order_priority",
    """
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
GROUP BY o_orderpriority
""",
)
def tpch_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 analog: EXISTS decorrelated to a LEFT SEMI join + hash agg.
    The testdata lacks l_commitdate/l_receiptdate, so the EXISTS predicate is
    'order has a returned line' (l_returnflag = 'R') — same semi-join shape,
    non-vacuous at sf0.01 (5 priorities, 77-97 orders each in the window).

    100 TB: the date filter pushes to the orders scan; the semi-join shuffles
    only (l_orderkey) from lineitem — no payload columns — and stops probing
    a key after the first match."""
    t = read_testdata(spark, sf_dir, "orders", "lineitem")
    lo = F.lit("1996-07-01 00:00:00").cast("timestamp")
    hi = F.lit("1996-10-01 00:00:00").cast("timestamp")
    returned = t["lineitem"].filter(F.col("l_returnflag") == "R").select("l_orderkey")
    return (
        t["orders"]
        .filter((F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi))
        .join(returned, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).cast("bigint").alias("order_count"))
    )


@_q(
    "tpch_q13_customer_distribution",
    """
WITH per_cust AS (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority = '1-URGENT'
  GROUP BY c_custkey
)
SELECT CAST(c_count AS BIGINT) AS c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM per_cust GROUP BY c_count
""",
)
def tpch_q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 analog: left-outer join with a join-side filter, per-customer
    count (COUNT(col) null-skipping -> 0 for unmatched), then a count-of-counts
    histogram.  The URGENT restriction makes the outer branch real: 203 of
    1500 sf0.01 customers have no URGENT order (VERDICT r1 flagged the
    unfiltered variant as vacuous — every customer has *some* order).

    100 TB: filter applied below the join (equivalent to the ON-clause
    predicate), so only URGENT orders shuffle; both aggs are partial-agg
    friendly and the second one is tiny (distinct counts)."""
    t = read_testdata(spark, sf_dir, "customer", "orders")
    urgent = t["orders"].filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey", "o_orderkey")
    per_cust = (
        t["customer"]
        .select("c_custkey")
        .join(urgent, F.col("c_custkey") == F.col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("bigint").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).cast("bigint").alias("custdist"))


@_q(
    "sql_grouping_sets",
    """
SELECT COALESCE(o_orderstatus, 'ALL')  AS status,
       COALESCE(c_mktsegment, 'ALL')   AS segment,
       CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
       CAST(GROUPING(c_mktsegment) AS INT)  AS g_segment,
       CAST(COUNT(*) AS BIGINT)        AS n,
       ROUND(SUM(o_totalprice), 2)     AS revenue
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY GROUPING SETS ((o_orderstatus), (c_mktsegment), (o_orderstatus, c_mktsegment), ())
""",
)
def sql_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS + GROUPING() disambiguation through the SQL
    front-end (temp views + spark.sql) — the same Catalyst plan the
    DataFrame API produces, exercising the engine's second query surface."""
    t = read_testdata(spark, sf_dir, "orders", "customer")
    t["orders"].createOrReplaceTempView("v_orders")
    t["customer"].createOrReplaceTempView("v_customer")
    return spark.sql(
        """
        SELECT COALESCE(o_orderstatus, 'ALL')  AS status,
               COALESCE(c_mktsegment, 'ALL')   AS segment,
               CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
               CAST(GROUPING(c_mktsegment) AS INT)  AS g_segment,
               COUNT(*)                        AS n,
               ROUND(SUM(o_totalprice), 2)     AS revenue
        FROM v_orders JOIN v_customer ON o_custkey = c_custkey
        GROUP BY GROUPING SETS ((o_orderstatus), (c_mktsegment),
                                (o_orderstatus, c_mktsegment), ())
        """
    )


@_q(
    "pandas_udf_harmonic_price",
    """
SELECT l_orderkey, l_linenumber,
       ROUND(2 * l_extendedprice * l_quantity / (l_extendedprice + l_quantity), 6)
         AS harmonic
FROM lineitem
WHERE l_linenumber <= 2
""",
)
def pandas_udf_harmonic_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered scalar @pandas_udf (Arrow-vectorized, the UDF surface the
    reference never had).  numpy float64 elementwise ops are IEEE-identical
    to the oracle's expression, so even the UDF path is value-hash-checked."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def harmonic(x: pd.Series, y: pd.Series) -> pd.Series:
        return 2 * x * y / (x + y)

    li = read_testdata(spark, sf_dir, "lineitem")["lineitem"]
    return li.filter(F.col("l_linenumber") <= 2).select(
        "l_orderkey",
        "l_linenumber",
        F.round(harmonic(F.col("l_extendedprice"), F.col("l_quantity")), 6).alias(
            "harmonic"
        ),
    )


@_q(
    "pandas_udaf_geometric_mean",
    """
SELECT o_orderpriority,
       ROUND(EXP(AVG(LN(o_totalprice))), 4) AS geo_mean_price,
       CAST(COUNT(*) AS BIGINT) AS n
FROM orders
GROUP BY o_orderpriority
""",
)
def pandas_udaf_geometric_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-defined AGGREGATE via grouped-agg @pandas_udf (geometric mean)
    — completes the UDF surface (scalar / grouped-map / grouped-agg /
    mapInPandas / stateful).  numpy's log-mean-exp matches the oracle's
    EXP(AVG(LN)) to well past 4 decimals."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def geo_mean(v: pd.Series) -> float:
        return float(np.exp(np.log(v.to_numpy(dtype=np.float64)).mean()))

    # grouped-agg pandas UDFs can't mix with built-in aggregates in one
    # agg(), so the row count is a second pandas UDAF
    @pandas_udf("long")
    def pd_count(v: pd.Series) -> int:
        return int(len(v))

    o = read_testdata(spark, sf_dir, "orders")["orders"]
    return o.groupBy("o_orderpriority").agg(
        F.round(geo_mean(F.col("o_totalprice")), 4).alias("geo_mean_price"),
        pd_count(F.col("o_totalprice")).alias("n"),
    )


@_q(
    "hash_functions_documents",
    """
SELECT doc_id,
       md5(text)    AS text_md5,
       sha256(text) AS text_sha256,
       md5(CAST(doc_id AS VARCHAR) || ':' || source) AS row_key
FROM documents
""",
)
def hash_functions_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cryptographic hash surface (md5/sha2) — the portable content-key
    primitives every dedup/fingerprint operator builds on."""
    d = read_testdata(spark, sf_dir, "documents")["documents"]
    return d.select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        F.sha2(F.col("text"), 256).alias("text_sha256"),
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":"), F.col("source"))).alias(
            "row_key"
        ),
    )


@_q(
    "collect_sorted_lists",
    """
SELECT c_nationkey,
       string_agg(DISTINCT c_mktsegment, ',' ORDER BY c_mktsegment) AS segments,
       CAST(COUNT(*) AS BIGINT) AS n_customers
FROM customer
GROUP BY c_nationkey
""",
)
def collect_sorted_lists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_set -> sorted array (deterministic list-valued aggregation).
    Emitted comma-joined: array cell encoding differs between pandas paths
    (list vs numpy) across engines, so the driver-facing value is a string."""
    c = read_testdata(spark, sf_dir, "customer")["customer"]
    return c.groupBy("c_nationkey").agg(
        F.array_join(F.array_sort(F.collect_set("c_mktsegment")), ",").alias("segments"),
        F.count(F.lit(1)).alias("n_customers"),
    )


@_q(
    "window_ntile_lead_firstvalue",
    """
SELECT o_orderkey, o_orderpriority,
       ROUND(o_totalprice, 2) AS total_price,
       CAST(NTILE(4) OVER w AS INT) AS quartile,
       ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
       ROUND(CUME_DIST() OVER w, 6) AS cume,
       ROUND(COALESCE(LEAD(o_totalprice) OVER w, 0), 2) AS next_price,
       ROUND(FIRST_VALUE(o_totalprice) OVER w, 2) AS min_in_priority
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
""",
)
def window_ntile_lead_firstvalue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile / percent_rank / cume_dist / lead / first_value over a total
    order (unique-key tiebreak keeps every function deterministic)."""
    o = read_testdata(spark, sf_dir, "orders")["orders"]
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.round("o_totalprice", 2).alias("total_price"),
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.round(F.coalesce(F.lead("o_totalprice").over(w), F.lit(0.0)), 2).alias("next_price"),
        F.round(F.first("o_totalprice").over(w), 2).alias("min_in_priority"),
    )


@_q(
    "string_functions_extended",
    """
SELECT doc_id,
       lpad(lang, 5, '_')                  AS lang_padded,
       reverse(source)                     AS source_rev,
       split_part(source, 'c', 2)          AS src_num,
       CAST(regexp_extract(source, '([0-9]+)', 1) AS INT) AS src_id,
       left(text, 10)                      AS text_head,
       CASE WHEN contains(text, 'dup') THEN 1 ELSE 0 END AS has_dup_marker
FROM documents
""",
)
def string_functions_extended(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lpad/reverse/split_part/regexp capture groups/left/contains."""
    d = read_testdata(spark, sf_dir, "documents")["documents"]
    return d.select(
        "doc_id",
        F.lpad("lang", 5, "_").alias("lang_padded"),
        F.reverse("source").alias("source_rev"),
        F.split_part(F.col("source"), F.lit("c"), F.lit(2)).alias("src_num"),
        F.regexp_extract("source", "([0-9]+)", 1).cast("int").alias("src_id"),
        F.substring("text", 1, 10).alias("text_head"),
        F.when(F.contains(F.col("text"), F.lit("dup")), 1).otherwise(0).alias("has_dup_marker"),
    )


@_q(
    "date_arithmetic_orders",
    """
SELECT o_orderkey,
       CAST(date_diff('day', DATE '2024-01-01', o_orderdate) AS INT) AS days_since_epoch_start,
       STRFTIME(CAST(o_orderdate AS DATE) + INTERVAL 90 DAY, '%Y-%m-%d') AS due_date,
       CAST(dayofweek(o_orderdate) AS INT)  AS dow,
       CAST(quarter(o_orderdate) AS INT)    AS qtr,
       CAST(last_day(CAST(o_orderdate AS DATE)) AS VARCHAR) AS month_end
FROM orders
""",
)
def date_arithmetic_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """datediff / date_add / dayofweek / quarter / last_day.  DuckDB
    dayofweek is 0=Sunday; Spark dayofweek is 1=Sunday -> subtract 1."""
    o = read_testdata(spark, sf_dir, "orders")["orders"]
    return o.select(
        "o_orderkey",
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("2024-01-01").cast("date")).alias(
            "days_since_epoch_start"
        ),
        F.date_format(F.date_add(F.col("o_orderdate").cast("date"), 90), "yyyy-MM-dd").alias(
            "due_date"
        ),
        (F.dayofweek("o_orderdate") - 1).alias("dow"),
        F.quarter("o_orderdate").alias("qtr"),
        F.last_day(F.col("o_orderdate").cast("date")).cast("string").alias("month_end"),
    )


@_q(
    "correlated_scalar_above_avg",
    """
SELECT c_custkey, ROUND(c_acctbal, 2) AS acctbal, c_mktsegment
FROM customer c
WHERE c_acctbal > (SELECT AVG(c2.c_acctbal) FROM customer c2
                   WHERE c2.c_mktsegment = c.c_mktsegment)
""",
)
def correlated_scalar_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery, decorrelated by hand into an agg+join —
    the plan Spark/Catalyst would produce anyway (broadcast of 5 group rows).
    Strict `>` comparison uses unrounded averages on both sides (the filter,
    not the output, decides membership)."""
    c = read_testdata(spark, sf_dir, "customer")["customer"]
    seg_avg = c.groupBy(F.col("c_mktsegment").alias("seg")).agg(
        F.avg("c_acctbal").alias("seg_avg")
    )
    return (
        c.join(F.broadcast(seg_avg), F.col("c_mktsegment") == F.col("seg"))
        .filter(F.col("c_acctbal") > F.col("seg_avg"))
        .select("c_custkey", F.round("c_acctbal", 2).alias("acctbal"), "c_mktsegment")
    )


# ---------------------------------------------------------------------------
# TPC-H analog suite, continued (Q5 / Q6 / Q10 / Q14 / Q18 shapes)
# ---------------------------------------------------------------------------


@_q(
    "tpch_q5_local_supplier_volume",
    """
SELECT n_name, ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer
JOIN orders   ON c_custkey   = o_custkey
JOIN lineitem ON l_orderkey  = o_orderkey
JOIN supplier ON l_suppkey   = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
""",
)
def tpch_q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 analog: the two-path join (customer's nation must equal the
    line's supplier nation) that makes Q5 the canonical join-graph-with-a-
    cycle shape.  Non-vacuous: ASIA nations all have same-nation matches in
    the 1996 window at sf0.01.

    100 TB: nation/region broadcast prunes suppliers to one region before the
    fact join; the supplier join adds the s_nationkey = c_nationkey residual
    as a post-probe filter on a broadcast build side (supplier is the small
    dimension), so only orders/lineitem shuffle — on their join keys, once."""
    t = read_testdata(
        spark, sf_dir, "customer", "orders", "lineitem", "supplier", "nation", "region"
    )
    lo = F.lit("1996-01-01 00:00:00").cast("timestamp")
    hi = F.lit("1997-01-01 00:00:00").cast("timestamp")
    asia_nations = (
        t["nation"]
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "ASIA")
        .select("n_nationkey", "n_name")
    )
    asia_supp = t["supplier"].join(
        F.broadcast(asia_nations), F.col("s_nationkey") == F.col("n_nationkey")
    )
    return (
        t["orders"]
        .filter((F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(t["lineitem"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(asia_supp),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@_q(
    "tpch_q6_forecast_revenue",
    """
SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
)
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 analog: pure filter + global agg, the predicate-pushdown
    showcase — every one of the three range predicates reaches the parquet
    scan (pinned for the same predicate family in tests/test_plans.py).

    100 TB: no shuffle at all beyond the single-row final agg; parquet
    row-group stats skip non-1996 files entirely when the lake is
    date-partitioned (io/zones.py layout)."""
    li = read_testdata(spark, sf_dir, "lineitem")["lineitem"]
    lo = F.lit("1996-01-01 00:00:00").cast("timestamp")
    hi = F.lit("1997-01-01 00:00:00").cast("timestamp")
    return (
        li.filter(
            (F.col("l_shipdate") >= lo)
            & (F.col("l_shipdate") < hi)
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue"
            ),
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        )
    )


@_q(
    "tpch_q10_returned_items",
    """
WITH agg AS (
  SELECT c_custkey, c_name, n_name,
         ROUND(c_acctbal, 2) AS acctbal,
         CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                  * CAST(ROUND((1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS rev_micro
  FROM customer
  JOIN orders   ON c_custkey  = o_custkey
  JOIN lineitem ON l_orderkey = o_orderkey
  JOIN nation   ON c_nationkey = n_nationkey
  WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
    AND l_returnflag = 'R'
  GROUP BY c_custkey, c_name, c_acctbal, n_name
)
SELECT c_custkey, c_name, n_name, acctbal,
       (rev_micro // 100) / 100.0 AS revenue
FROM agg ORDER BY revenue DESC, c_custkey LIMIT 20
""",
)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 analog: who returned the most revenue last quarter — join
    + filter + per-customer agg + deterministic top-20.  Revenue is summed
    in integer 10^-4 units (price cents x discount cents) then floor-divided
    to cents — per-line products of 2-decimal inputs land on exact .xx50
    ties SYSTEMATICALLY, where Spark and DuckDB ROUND diverge (catalog.py
    DECIMAL-TIE hazard; one of the top 20 rows hits it at sf0.01).

    100 TB: l_returnflag and the date window filter before the join;
    orderBy().limit(20) plans as TakeOrderedAndProject (per-partition heaps,
    no global sort)."""
    t = read_testdata(spark, sf_dir, "customer", "orders", "lineitem", "nation")
    lo = F.lit("1996-01-01 00:00:00").cast("timestamp")
    hi = F.lit("1996-04-01 00:00:00").cast("timestamp")
    micro = F.round(F.col("l_extendedprice") * 100).cast("bigint") * F.round(
        (1 - F.col("l_discount")) * 100
    ).cast("bigint")
    agg = (
        t["orders"]
        .filter((F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi))
        .join(
            t["lineitem"].filter(F.col("l_returnflag") == "R"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(micro).alias("rev_micro"))
        .select(
            "c_custkey",
            "c_name",
            "n_name",
            F.round("c_acctbal", 2).alias("acctbal"),
            (F.expr("rev_micro div 100") / 100.0).alias("revenue"),
        )
    )
    return agg.orderBy(F.col("revenue").desc(), F.col("c_custkey")).limit(20)


@_q(
    "tpch_q14_promo_effect",
    """
WITH s AS (
  SELECT ROUND(SUM(CASE WHEN p_type LIKE 'PROMO%'
                        THEN l_extendedprice * (1 - l_discount) ELSE 0 END), 2) AS promo_rev,
         ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS total_rev
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-10-01 00:00:00'
)
SELECT promo_rev, total_rev,
       ROUND(100 * promo_rev / NULLIF(total_rev, 0), 6) AS promo_pct
FROM s
""",
)
def tpch_q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 analog: conditional aggregation after a fact⋈dimension join
    (promo revenue share).  The percentage is derived from the two
    already-rounded sums, never from raw doubles (float discipline).
    Non-vacuous: 116 PROMO lines in the 1996-09 window at sf0.01.

    100 TB: part is the broadcast side; the CASE folds into the partial agg
    so one scan produces both sums — no second pass, no shuffle of line
    payloads."""
    t = read_testdata(spark, sf_dir, "lineitem", "part")
    lo = F.lit("1996-09-01 00:00:00").cast("timestamp")
    hi = F.lit("1996-10-01 00:00:00").cast("timestamp")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    s = (
        t["lineitem"]
        .filter((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))
        .join(F.broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                F.sum(F.when(F.col("p_type").startswith("PROMO"), rev).otherwise(0.0)), 2
            ).alias("promo_rev"),
            F.round(F.sum(rev), 2).alias("total_rev"),
        )
    )
    return s.select(
        "promo_rev",
        "total_rev",
        F.round(
            100 * F.col("promo_rev") / F.nullif(F.col("total_rev"), F.lit(0.0)), 6
        ).alias("promo_pct"),
    )


@_q(
    "tpch_q18_large_volume_customers",
    """
WITH big AS (
  SELECT l_orderkey, SUM(l_quantity) AS sum_qty
  FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 180
)
SELECT c_custkey, c_name, o_orderkey,
       ROUND(o_totalprice, 2) AS totalprice,
       ROUND(sum_qty, 2) AS sum_qty
FROM big
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON o_custkey  = c_custkey
ORDER BY totalprice DESC, o_orderkey LIMIT 100
""",
)
def tpch_q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 analog: HAVING-filtered aggregate driving a join (large-
    volume orders -> their customers), deterministic top-100 on the rounded
    totalprice with o_orderkey tie-break.  Non-vacuous: 1455 orders exceed
    the 180-quantity threshold at sf0.01.

    100 TB: the groupBy(l_orderkey) agg shuffles only (key, qty) pairs; the
    HAVING filter cuts the join input to the heavy tail before any wide row
    is assembled; top-100 is TakeOrderedAndProject."""
    t = read_testdata(spark, sf_dir, "lineitem", "orders", "customer")
    big = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty_raw"))
        .filter(F.col("sum_qty_raw") > 180)
    )
    out = (
        big.join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("totalprice"),
            F.round("sum_qty_raw", 2).alias("sum_qty"),
        )
    )
    return out.orderBy(F.col("totalprice").desc(), F.col("o_orderkey")).limit(100)


@_q(
    "tpch_q7_volume_shipping",
    """
WITH pairs AS (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(year(l_shipdate) AS INT) AS yr,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT)
           * CAST(ROUND((1 - l_discount) * 100) AS BIGINT) AS micro
  FROM supplier
  JOIN lineitem ON s_suppkey  = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey  = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
     OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
)
SELECT supp_nation, cust_nation, yr,
       (CAST(SUM(micro) AS BIGINT) // 100) / 100.0 AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM pairs GROUP BY supp_nation, cust_nation, yr
""",
)
def tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 analog: bilateral trade volume between two nations by year —
    the nation table joined TWICE under different roles (supplier side and
    customer side), with a symmetric pair predicate.  Revenue uses the
    integer micro-unit discipline (catalog.py DECIMAL-TIE hazard).

    100 TB: both nation joins broadcast (and the pair predicate prunes to 2
    nations before the fact join on the supplier side); lineitem⋈orders⋈
    customer shuffle on keys once each; the final agg has ~2 x years groups."""
    t = read_testdata(
        spark, sf_dir, "supplier", "lineitem", "orders", "customer", "nation"
    )
    n1 = t["nation"].select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = t["nation"].select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    micro = F.round(F.col("l_extendedprice") * 100).cast("bigint") * F.round(
        (1 - F.col("l_discount")) * 100
    ).cast("bigint")
    pair = (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2") | (
        F.col("supp_nation") == "NATION_2"
    ) & (F.col("cust_nation") == "NATION_1")
    return (
        t["lineitem"]
        .join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .withColumn("micro", micro)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("int").alias("yr"))
        .agg(
            F.sum("micro").alias("rev_micro"),
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        )
        .select(
            "supp_nation",
            "cust_nation",
            "yr",
            (F.expr("rev_micro div 100") / 100.0).alias("revenue"),
            "n_lines",
        )
    )


@_q(
    "tpch_q16_supplier_part_counts",
    """
SELECT p_brand, p_size, CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_size IN (5, 10, 15, 20)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_size
""",
)
def tpch_q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 analog: how many distinct suppliers serve each part
    brand/size bucket, excluding blacklisted suppliers (negative acctbal
    stands in for the reference's complaints NOT IN — 6 suppliers match at
    sf0.01, so the anti-join branch is real).  NOT IN is safe as an
    anti-join here because s_suppkey is non-null by schema.

    100 TB: part filter broadcasts, the blacklist broadcasts (dimension-
    sized), and COUNT(DISTINCT one column) plans as a two-phase aggregate —
    no Expand duplication, only (brand, size, suppkey) tuples shuffle."""
    t = read_testdata(spark, sf_dir, "lineitem", "part", "supplier")
    sizes = t["part"].filter(F.col("p_size").isin(5, 10, 15, 20)).select(
        "p_partkey", "p_brand", "p_size"
    )
    bad = t["supplier"].filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        t["lineitem"]
        .select("l_partkey", "l_suppkey")
        .join(F.broadcast(sizes), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").cast("bigint").alias("supplier_cnt"))
    )


@_q(
    "map_functions_status_scores",
    """
WITH per AS (
  SELECT o_custkey, o_orderstatus AS status, COUNT(*) AS cnt
  FROM orders GROUP BY o_custkey, o_orderstatus
)
SELECT o_custkey, status,
       CAST(cnt * 10 + length(status) AS BIGINT) AS score
FROM per
WHERE cnt * 10 + length(status) > 10
""",
)
def map_functions_status_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed column breadth: per-customer status counts round-trip
    through a genuine MapType column — collect_list(struct) ->
    map_from_entries -> transform_values (k,v lambda) -> map_filter ->
    explode — and land back as verifiable rows.  The oracle states the
    same semantics relationally; the Spark side proves the map operators
    compose without corrupting entries.

    100 TB: per-customer maps are bounded (3 order statuses), so the
    collect_list is a small-group aggregate, not an unbounded collect;
    every map lambda is a codegen'd higher-order function, no UDF."""
    o = read_testdata(spark, sf_dir, "orders")["orders"]
    per = o.groupBy("o_custkey", "o_orderstatus").agg(F.count(F.lit(1)).alias("cnt"))
    maps = per.groupBy("o_custkey").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("o_orderstatus", "cnt")))
        ).alias("m")
    )
    scored = maps.select(
        "o_custkey",
        F.map_filter(
            F.transform_values(
                F.col("m"), lambda k, v: v * 10 + F.length(k).cast("bigint")
            ),
            lambda k, v: v > 10,
        ).alias("m"),
    )
    return scored.select(
        "o_custkey", F.explode("m").alias("status", "score")
    ).select("o_custkey", "status", F.col("score").cast("bigint").alias("score"))


@_q(
    "tpch_q11_important_parts",
    """
WITH pr AS (
  SELECT l_partkey,
         CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                  * CAST(ROUND((1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS micro
  FROM lineitem GROUP BY l_partkey
),
tot AS (SELECT CAST(SUM(micro) AS BIGINT) AS total_micro FROM pr)
SELECT l_partkey, (micro // 100) / 100.0 AS part_revenue
FROM pr CROSS JOIN tot
WHERE micro * 10000 > total_micro * 6
""",
)
def tpch_q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 analog: parts whose revenue exceeds a FRACTION of the
    global total (0.06%) — the scalar-subquery-threshold shape, decorrelated
    into a 1-row aggregate broadcast-crossJoined against the per-part
    rollup.  The share test is pure integer arithmetic on micro-unit sums
    (micro * 10000 > total * 6), so both engines decide membership on exact
    integers — no float threshold can flake at any scale.

    100 TB: one shuffle for the per-part agg; the global total reuses the
    same micro sums (partial-agg friendly), and the 1-row threshold
    broadcasts — no second pass over lineitem, no driver round-trip."""
    li = read_testdata(spark, sf_dir, "lineitem")["lineitem"]
    micro = F.round(F.col("l_extendedprice") * 100).cast("bigint") * F.round(
        (1 - F.col("l_discount")) * 100
    ).cast("bigint")
    pr = li.withColumn("micro", micro).groupBy("l_partkey").agg(
        F.sum("micro").alias("micro")
    )
    tot = pr.agg(F.sum("micro").alias("total_micro"))
    return (
        pr.crossJoin(F.broadcast(tot))
        .filter(F.col("micro") * 10000 > F.col("total_micro") * 6)
        .select("l_partkey", (F.expr("micro div 100") / 100.0).alias("part_revenue"))
    )


@_q(
    "tpch_q19_disjunctive_predicates",
    """
SELECT p_brand,
       (CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                 * CAST(ROUND((1 - l_discount) * 100) AS BIGINT)) AS BIGINT) // 100)
         / 100.0 AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1  AND 15 AND l_quantity BETWEEN 1  AND 11)
   OR (p_brand = 'Brand#22' AND p_size BETWEEN 16 AND 30 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#33' AND p_size BETWEEN 31 AND 50 AND l_quantity BETWEEN 20 AND 30)
GROUP BY p_brand
""",
)
def tpch_q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 analog: OR-of-ANDs predicates spanning BOTH join sides —
    the classic disjunctive-pushdown shape.  Catalyst extracts the common
    implications (p_brand IN (...), p_size <= 50, l_quantity <= 30) below
    the join, evaluates the full disjunction after it, and still broadcasts
    the filtered part side.  Revenue follows the integer micro-unit
    discipline (catalog.py DECIMAL-TIE hazard).

    100 TB: the brand IN-list and size bound prune the part scan; quantity
    bounds prune the lineitem scan (PushedFilters on both) — the join sees
    orders of magnitude fewer rows than a naive post-join filter."""
    t = read_testdata(spark, sf_dir, "lineitem", "part")
    branch = (
        (F.col("p_brand") == "Brand#11")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 11)
    ) | (
        (F.col("p_brand") == "Brand#22")
        & F.col("p_size").between(16, 30)
        & F.col("l_quantity").between(10, 20)
    ) | (
        (F.col("p_brand") == "Brand#33")
        & F.col("p_size").between(31, 50)
        & F.col("l_quantity").between(20, 30)
    )
    micro = F.round(F.col("l_extendedprice") * 100).cast("bigint") * F.round(
        (1 - F.col("l_discount")) * 100
    ).cast("bigint")
    return (
        t["lineitem"]
        .join(F.broadcast(t["part"]), F.col("p_partkey") == F.col("l_partkey"))
        .filter(branch)
        .withColumn("micro", micro)
        .groupBy("p_brand")
        .agg(
            F.sum("micro").alias("rev_micro"),
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        )
        .select(
            "p_brand",
            (F.expr("rev_micro div 100") / 100.0).alias("revenue"),
            "n_lines",
        )
    )


@_q(
    "tpch_q15_top_supplier",
    """
WITH rev AS (
  SELECT l_suppkey,
         CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                  * CAST(ROUND((1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS micro
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
),
mx AS (SELECT MAX(micro) AS max_micro FROM rev)
SELECT s_suppkey, s_name, (micro // 100) / 100.0 AS total_revenue
FROM rev JOIN supplier ON s_suppkey = l_suppkey
CROSS JOIN mx
WHERE micro = max_micro
""",
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 analog: the top supplier by quarterly revenue — argmax via
    an equality join against a broadcast 1-row MAX, which (unlike a LIMIT 1)
    returns ALL tied maxima deterministically.  Exact integer micro-unit
    revenue makes the equality test tie-safe across engines.

    100 TB: one shuffle for the per-supplier agg; the max reuses those
    partial sums and broadcasts back as one row — the same
    two-aggregates-one-scan shape as Q11."""
    t = read_testdata(spark, sf_dir, "lineitem", "supplier")
    lo = F.lit("1996-01-01 00:00:00").cast("timestamp")
    hi = F.lit("1996-04-01 00:00:00").cast("timestamp")
    micro = F.round(F.col("l_extendedprice") * 100).cast("bigint") * F.round(
        (1 - F.col("l_discount")) * 100
    ).cast("bigint")
    rev = (
        t["lineitem"]
        .filter((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))
        .withColumn("micro", micro)
        .groupBy("l_suppkey")
        .agg(F.sum("micro").alias("micro"))
    )
    mx = rev.agg(F.max("micro").alias("max_micro"))
    return (
        rev.join(F.broadcast(t["supplier"]), F.col("s_suppkey") == F.col("l_suppkey"))
        .crossJoin(F.broadcast(mx))
        .filter(F.col("micro") == F.col("max_micro"))
        .select(
            "s_suppkey",
            "s_name",
            (F.expr("micro div 100") / 100.0).alias("total_revenue"),
        )
    )


@_q(
    "tpch_q21_sole_blamed_supplier",
    """
WITH per AS (
  SELECT l_orderkey, l_suppkey,
         MAX(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS has_r
  FROM lineitem GROUP BY l_orderkey, l_suppkey
),
o AS (
  SELECT l_orderkey, COUNT(*) AS n_supp, SUM(has_r) AS n_r
  FROM per GROUP BY l_orderkey
),
blamed AS (
  SELECT per.l_suppkey
  FROM per JOIN o USING (l_orderkey)
  WHERE per.has_r = 1 AND o.n_supp > 1 AND o.n_r = 1
)
SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM blamed JOIN supplier ON s_suppkey = l_suppkey
GROUP BY s_name
""",
)
def tpch_q21_sole_blamed_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 analog: suppliers SOLELY responsible for a problem on a
    multi-supplier order (returned lines stand in for late delivery — the
    testdata lacks receipt/commit dates).  The classic
    EXISTS(another supplier) AND NOT EXISTS(another problem supplier)
    double-quantification collapses into ONE aggregation over
    (order, supplier) — counting suppliers and problem-suppliers per order
    answers both existentials at once, instead of two correlated probes of
    the fact table.

    100 TB: one shuffle on (l_orderkey, l_suppkey), one map-side rollup to
    order grain, a key-only self-join back, and a broadcast supplier-name
    join — the fact table is scanned ONCE (vs three times for naive
    EXISTS/NOT EXISTS rewrites)."""
    t = read_testdata(spark, sf_dir, "lineitem", "supplier")
    per = (
        t["lineitem"]
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max((F.col("l_returnflag") == "R").cast("int")).alias("has_r"))
    )
    o = per.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"), F.sum("has_r").alias("n_r")
    )
    blamed = (
        per.join(o, "l_orderkey")
        .filter((F.col("has_r") == 1) & (F.col("n_supp") > 1) & (F.col("n_r") == 1))
        .select("l_suppkey")
    )
    return (
        blamed.join(
            F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey")
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("bigint").alias("numwait"))
    )


@_q(
    "tpch_q8_market_share",
    """
WITH lines AS (
  SELECT CAST(year(o_orderdate) AS INT) AS yr,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT)
           * CAST(ROUND((1 - l_discount) * 100) AS BIGINT) AS micro,
         n2.n_name AS supp_nation
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey  = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region   ON n1.n_regionkey = r_regionkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'AMERICA'
)
SELECT yr,
       ROUND(CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN micro ELSE 0 END) AS BIGINT)
             / CAST(CAST(SUM(micro) AS BIGINT) AS DOUBLE), 6) AS mkt_share,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lines GROUP BY yr
""",
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 analog: one supplier nation's share of a region's purchase
    volume per year — a conditional-sum / total-sum ratio per group.  Both
    sums are exact integer micro-units, so the engines divide IDENTICAL
    integers and round identical doubles.

    100 TB: same join topology as the flagship (dimensions broadcast,
    facts shuffle once); the share needs no second pass — numerator and
    denominator come out of one partial-agg."""
    t = read_testdata(
        spark, sf_dir, "lineitem", "orders", "customer", "supplier", "nation", "region"
    )
    n1 = t["nation"].select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = t["nation"].select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    micro = F.round(F.col("l_extendedprice") * 100).cast("bigint") * F.round(
        (1 - F.col("l_discount")) * 100
    ).cast("bigint")
    lines = (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(
            F.broadcast(t["region"].filter(F.col("r_name") == "AMERICA")),
            F.col("n1_region") == F.col("r_regionkey"),
        )
        .join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .select(
            F.year("o_orderdate").cast("int").alias("yr"),
            micro.alias("micro"),
            "supp_nation",
        )
    )
    return lines.groupBy("yr").agg(
        F.round(
            F.sum(F.when(F.col("supp_nation") == "NATION_3", F.col("micro")).otherwise(F.lit(0)))
            / F.sum("micro").cast("double"),
            6,
        ).alias("mkt_share"),
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
    )


@_q(
    "tpch_q17_small_quantity_revenue",
    """
WITH pa AS (
  SELECT l_partkey AS pk, 0.2 * AVG(l_quantity) AS threshold
  FROM lineitem GROUP BY l_partkey
)
SELECT (CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) // 100) / 100.0
         AS small_lot_revenue,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem JOIN pa ON l_partkey = pk
WHERE l_quantity < threshold
""",
)
def tpch_q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 analog: revenue locked in below-average small lots — the
    correlated per-group-average threshold, decorrelated into a self-agg
    join on the SAME fact table.  The 0.2*AVG threshold is a quotient of
    exact integer-valued doubles (quantities are whole numbers), identical
    in both engines; the strict < decides membership on those identical
    doubles.

    100 TB: the per-part average is one shuffle over (partkey, qty) pairs;
    joining it back is a shuffle join on the same key, which AQE can
    satisfy from the agg's existing partitioning — the wide price column
    moves only for surviving rows."""
    li = read_testdata(spark, sf_dir, "lineitem")["lineitem"]
    pa = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (F.avg("l_quantity") * 0.2).alias("threshold")
    )
    return (
        li.join(pa, F.col("l_partkey") == F.col("pk"))
        .filter(F.col("l_quantity") < F.col("threshold"))
        .agg(
            (
                F.expr("sum(cast(round(l_extendedprice * 100) as bigint)) div 100")
                / 100.0
            ).alias("small_lot_revenue"),
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        )
    )


@_q(
    "tpch_q20_concentrated_suppliers",
    """
WITH ps AS (
  SELECT l_partkey, l_suppkey, SUM(l_quantity) AS q
  FROM lineitem GROUP BY l_partkey, l_suppkey
),
p AS (
  SELECT l_partkey, SUM(q) AS tot, COUNT(*) AS nsup FROM ps GROUP BY l_partkey
)
SELECT s_name, CAST(COUNT(*) AS BIGINT) AS n_concentrated_parts
FROM ps
JOIN p USING (l_partkey)
JOIN supplier ON s_suppkey = l_suppkey
WHERE q * nsup > 2 * tot
GROUP BY s_name
""",
)
def tpch_q20_concentrated_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 analog: suppliers holding an outsized share of a part's
    volume (> 2x the fair 1/nsup share — the testdata's parts each have
    13+ suppliers, so the reference's 50%-dominance test is vacuous here;
    2x-fair flags ~3% of (part, supplier) pairs).  The nested semi-join
    chain collapses to two stacked aggregations on the same shuffle key.

    100 TB: both aggs reuse one (l_partkey) shuffle partitioning; the
    share test is exact integer arithmetic on whole-number quantities; only
    flagged key pairs reach the broadcast name join."""
    t = read_testdata(spark, sf_dir, "lineitem", "supplier")
    ps = t["lineitem"].groupBy("l_partkey", "l_suppkey").agg(
        F.sum("l_quantity").alias("q")
    )
    p = ps.groupBy("l_partkey").agg(
        F.sum("q").alias("tot"), F.count(F.lit(1)).alias("nsup")
    )
    return (
        ps.join(p, "l_partkey")
        .filter(F.col("q") * F.col("nsup") > 2 * F.col("tot"))
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_concentrated_parts"))
    )


@_q(
    "tpch_q22_dormant_rich_customers",
    """
WITH ab AS (SELECT AVG(c_acctbal) AS avg_bal FROM customer WHERE c_acctbal > 0),
recent AS (
  SELECT DISTINCT o_custkey FROM orders
  WHERE o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'
)
SELECT c_nationkey,
       CAST(COUNT(*) AS BIGINT) AS n_custs,
       ROUND(SUM(ROUND(c_acctbal, 2)), 2) AS total_bal
FROM customer CROSS JOIN ab
LEFT JOIN recent ON c_custkey = o_custkey
WHERE c_acctbal > avg_bal AND o_custkey IS NULL
GROUP BY c_nationkey
""",
)
def tpch_q22_dormant_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 analog: well-funded customers gone dormant — acctbal above
    the positive-balance average (global scalar threshold) AND no order in
    the recent window (NOT EXISTS -> anti-join), rolled up by nation.
    Summing ROUND(bal, 2) values keeps the 2-decimal sum exact in both
    engines (14 qualifying customers at sf0.01).

    100 TB: the scalar average broadcasts; the anti-join probes a
    DISTINCT-custkey build side (date-filtered first, so the build is the
    small recent slice, not all orders)."""
    t = read_testdata(spark, sf_dir, "customer", "orders")
    ab = t["customer"].filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    recent = (
        t["orders"]
        .filter(F.col("o_orderdate") >= F.lit("1999-01-01 00:00:00").cast("timestamp"))
        .select("o_custkey")
        .distinct()
    )
    return (
        t["customer"]
        .crossJoin(F.broadcast(ab))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_custs"),
            F.round(F.sum(F.round(F.col("c_acctbal"), 2)), 2).alias("total_bal"),
        )
    )


@_q(
    "winsorized_price_stats",
    """
WITH bounds AS (
  SELECT o_orderpriority AS pr,
         quantile_cont(o_totalprice, 0.05) AS lo,
         quantile_cont(o_totalprice, 0.95) AS hi
  FROM orders GROUP BY o_orderpriority
),
clipped AS (
  SELECT o_orderpriority,
         CAST(ROUND(LEAST(GREATEST(o_totalprice, lo), hi) * 100) AS BIGINT) AS cents,
         CASE WHEN o_totalprice < lo THEN 1 ELSE 0 END AS clip_lo,
         CASE WHEN o_totalprice > hi THEN 1 ELSE 0 END AS clip_hi
  FROM orders JOIN bounds ON o_orderpriority = pr
)
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(clip_lo) AS BIGINT) AS n_clipped_low,
       CAST(SUM(clip_hi) AS BIGINT) AS n_clipped_high,
       (CAST(SUM(cents) AS BIGINT) // COUNT(*)) / 100.0 AS winsorized_mean
FROM clipped GROUP BY o_orderpriority
""",
)
def winsorized_price_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group winsorization (clip at p05/p95) — the outlier treatment a
    training-data pipeline applies before fitting mixture weights or length
    targets; complements the MAD detector (mad_outlier_orders) which flags
    instead of clipping.  Clipped values are cent-quantized BEFORE summing
    and the mean is an integer floor division, so the output is exact under
    any partitioning / summation order (catalog.py float discipline).

    100 TB: the percentile bounds are one agg per group (exact here; swap
    for approx_percentile at extreme cardinality), broadcast back; clipping
    is a row-local expression — one shuffle for bounds, one for the final
    rollup."""
    o = read_testdata(spark, sf_dir, "orders")["orders"]
    bounds = o.groupBy(F.col("o_orderpriority").alias("pr")).agg(
        F.percentile("o_totalprice", F.lit(0.05)).alias("lo"),
        F.percentile("o_totalprice", F.lit(0.95)).alias("hi"),
    )
    clip = F.least(F.greatest(F.col("o_totalprice"), F.col("lo")), F.col("hi"))
    clipped = (
        o.join(F.broadcast(bounds), F.col("o_orderpriority") == F.col("pr"))
        .select(
            "o_orderpriority",
            F.round(clip * 100).cast("bigint").alias("cents"),
            (F.col("o_totalprice") < F.col("lo")).cast("long").alias("clip_lo"),
            (F.col("o_totalprice") > F.col("hi")).cast("long").alias("clip_hi"),
        )
    )
    return clipped.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("clip_lo").cast("bigint").alias("n_clipped_low"),
        F.sum("clip_hi").cast("bigint").alias("n_clipped_high"),
        (F.expr("sum(cents) div count(*)") / 100.0).alias("winsorized_mean"),
    )


# ---------------------------------------------------------------------------
# TPC-H analog suite, final shapes (Q9 / Q12 substitutes — VERDICT r4 #5).
# The driver testdata lacks partsupp (ps_supplycost), l_shipmode and
# l_commitdate/l_receiptdate, so the two remaining TPC-H plan SHAPES are
# reproduced with substitute columns: an expression-derived supply-cost proxy
# (p_retailprice * 0.6) for Q9, and l_returnflag + a cross-column shipdate/
# orderdate lag window standing in for Q12's shipmode + commit/receipt
# predicates.  COVERAGE.md documents the substitution.
# ---------------------------------------------------------------------------


@_q(
    "tpch_q9_profit_by_nation_year",
    """
SELECT n_name, CAST(year(o_orderdate) AS INT) AS yr,
       CAST(SUM(CAST(ROUND((l_extendedprice * (1 - l_discount)
                 - p_retailprice * 0.6 * l_quantity) * 100) AS BIGINT)) AS BIGINT)
         / 100.0 AS profit,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem
JOIN supplier ON l_suppkey  = s_suppkey
JOIN part     ON l_partkey  = p_partkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '%red%'
GROUP BY n_name, yr
""",
)
def tpch_q9_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape analog (product-type profit measure): 5-way join
    lineitem-supplier-part-orders-nation, part-name LIKE filter, profit =
    revenue minus an expression-derived supply cost (p_retailprice * 0.6
    proxies the missing ps_supplycost), grouped by supplier nation x order
    year.  Reference shape: TPC-H Q9; non-vacuous at sf0.01 (175 groups).

    100 TB: part and supplier join BEFORE orders so the LIKE filter prunes
    lineitem early via the broadcast part side; nation broadcasts; the
    profit expression folds into the partial agg, so the final shuffle
    carries one row per (nation, year) per partition.

    Float discipline (ADVICE r5): profit is a CANCELLING revenue-minus-cost
    sum, so ROUND(SUM(double), 2) is partitioning-order-fragile — each line
    amount is rounded to integer cents BEFORE the aggregation (order-free)
    and the bigint cent sum divides once at the end, the same
    integer-accumulation rule as winsorized_price_stats."""
    t = read_testdata(spark, sf_dir, "lineitem", "supplier", "part", "orders", "nation")
    red_parts = t["part"].filter(F.col("p_name").like("%red%"))
    joined = (
        t["lineitem"]
        .join(F.broadcast(red_parts), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
    )
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col(
        "p_retailprice"
    ) * F.lit(0.6) * F.col("l_quantity")
    cents = F.round(amount * 100).cast("bigint")
    return (
        joined.select("n_name", F.year("o_orderdate").alias("yr"), cents.alias("amt_cents"))
        .groupBy("n_name", "yr")
        .agg(
            (F.sum("amt_cents") / F.lit(100.0)).alias("profit"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@_q(
    "tpch_q12_priority_by_returnflag",
    """
SELECT l_returnflag,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders
JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_returnflag IN ('A', 'R')
  AND l_shipdate >= o_orderdate
  AND l_shipdate <  o_orderdate + INTERVAL 90 DAY
  AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_returnflag
""",
)
def tpch_q12_priority_by_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape analog (shipping-modes-and-priority): orders-lineitem
    join with a categorical IN filter (l_returnflag for the missing
    l_shipmode), a CROSS-COLUMN date-lag predicate (shipped within 90 days
    of ordering, for commit/receipt ordering), a one-year receipt window,
    and the two-level conditional aggregation that is Q12's signature —
    high/low priority line counts per class.  Reference shape: TPC-H Q12.

    100 TB: the shipdate window and returnflag IN push to the lineitem scan
    (PushedFilters); the date-lag predicate evaluates post-join but before
    the agg; the CASE pair folds into one partial agg — 2 output rows."""
    t = read_testdata(spark, sf_dir, "orders", "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        t["orders"]
        .join(t["lineitem"], F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(
            F.col("l_returnflag").isin("A", "R")
            & (F.col("l_shipdate") >= F.col("o_orderdate"))
            & (F.col("l_shipdate") < F.col("o_orderdate") + F.expr("INTERVAL 90 DAY"))
            & (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
        )
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


# ---------------------------------------------------------------------------
# Zone maintenance as a driver query (VERDICT r5 #8): the snapshot diff is
# SQL-expressible, so the last test-only component family earns a value-hash
# row.  Two deterministic "snapshots" are derived from orders — removals
# (key % 7 == 0 dropped from new), additions (key % 10 == 9 absent from
# old), and in-place changes (key % 3 == 0 gets o_totalprice + 1.0; exact
# double addition, no ROUND, so equality is engine-neutral) — and every key
# is classified added/removed/changed/unchanged.
# ---------------------------------------------------------------------------


@_q(
    "zone_snapshot_diff",
    """
WITH old_s AS (
  SELECT o_orderkey, o_orderstatus, o_orderpriority, o_totalprice
  FROM orders WHERE o_orderkey % 10 < 9
),
new_s AS (
  SELECT o_orderkey, o_orderstatus, o_orderpriority,
         CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice + 1.0
              ELSE o_totalprice END AS o_totalprice
  FROM orders WHERE o_orderkey % 7 > 0
)
SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
       CASE WHEN o.o_orderkey IS NULL THEN 'added'
            WHEN n.o_orderkey IS NULL THEN 'removed'
            WHEN o.o_orderstatus != n.o_orderstatus
              OR o.o_orderpriority != n.o_orderpriority
              OR o.o_totalprice != n.o_totalprice THEN 'changed'
            ELSE 'unchanged' END AS status
FROM old_s o FULL OUTER JOIN new_s n ON o.o_orderkey = n.o_orderkey
""",
)
def zone_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot reconciliation (``io/maintenance.snapshot_diff``): both zone
    versions reduce to (key, md5 attr-hash) BEFORE the full outer join, so
    the diff's one exchange ships 16-byte hashes regardless of row width —
    the oracle replays the hash-equality semantics as direct value equality
    (equal values <-> equal hashes; md5 over an injective string rendering).
    All four statuses are non-vacuous at sf0.01."""
    from bigdata_rags_spark.io.maintenance import snapshot_diff

    o = read_testdata(spark, sf_dir, "orders")["orders"].select(
        "o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice"
    )
    old_s = o.filter(F.col("o_orderkey") % 10 < 9)
    new_s = o.filter(F.col("o_orderkey") % 7 > 0).withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % 3 == 0, F.col("o_totalprice") + F.lit(1.0)
        ).otherwise(F.col("o_totalprice")),
    )
    return snapshot_diff(old_s, new_s, "o_orderkey")


@_q(
    "scd2_current_rows",
    """
WITH changed AS (SELECT o_orderkey FROM orders WHERE o_orderkey % 5 = 0),
closed AS (
  SELECT o.o_orderkey, o.o_orderstatus, o.o_orderpriority,
         STRFTIME(CAST(o.o_orderdate AS DATE), '%Y-%m-%d') AS valid_from,
         STRFTIME(CAST(o.o_orderdate AS DATE) + INTERVAL 30 DAY, '%Y-%m-%d') AS valid_to,
         FALSE AS is_current
  FROM orders o JOIN changed USING (o_orderkey)
),
opened AS (
  SELECT o.o_orderkey, 'X' AS o_orderstatus, o.o_orderpriority,
         STRFTIME(CAST(o.o_orderdate AS DATE) + INTERVAL 30 DAY, '%Y-%m-%d') AS valid_from,
         CAST(NULL AS VARCHAR) AS valid_to,
         TRUE AS is_current
  FROM orders o JOIN changed USING (o_orderkey)
),
untouched AS (
  SELECT o_orderkey, o_orderstatus, o_orderpriority,
         STRFTIME(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS valid_from,
         CAST(NULL AS VARCHAR) AS valid_to,
         TRUE AS is_current
  FROM orders WHERE o_orderkey % 5 != 0
)
SELECT * FROM closed
UNION ALL SELECT * FROM opened
UNION ALL SELECT * FROM untouched
""",
)
def scd2_current_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """History-preserving SCD-2 merge as a value-hashed query
    (``io/maintenance.scd2_apply``): batch 1 loads every order's status/
    priority valid from its (date-cast) order date; batch 2 flips status to
    'X' for every 5th key 30 days later.  The merge must CLOSE exactly
    those keys' first versions (valid_to = close ts, is_current = false),
    OPEN their new versions, and leave the rest untouched — the oracle
    states that outcome declaratively.  Change detection diffs only (key,
    md5 attr-hash) pairs; attribute payloads cross one exchange."""
    from bigdata_rags_spark.io.maintenance import scd2_apply

    o = read_testdata(spark, sf_dir, "orders")["orders"].select(
        "o_orderkey",
        "o_orderstatus",
        "o_orderpriority",
        F.col("o_orderdate").cast("date").alias("change_d"),
    )
    b1 = o.select(
        "o_orderkey", "o_orderstatus", "o_orderpriority",
        F.col("change_d").alias("change_ts"),
    )
    b2 = o.filter(F.col("o_orderkey") % 5 == 0).select(
        "o_orderkey",
        F.lit("X").alias("o_orderstatus"),
        "o_orderpriority",
        F.date_add("change_d", 30).alias("change_ts"),
    )
    hist = scd2_apply(
        scd2_apply(None, b1, "o_orderkey", "change_ts"), b2, "o_orderkey", "change_ts"
    )
    return hist.select(
        "o_orderkey",
        "o_orderstatus",
        "o_orderpriority",
        F.date_format("__valid_from", "yyyy-MM-dd").alias("valid_from"),
        F.date_format("__valid_to", "yyyy-MM-dd").alias("valid_to"),
        F.col("__is_current").alias("is_current"),
    )


@_q(
    "upsert_current_rows",
    """
SELECT o_orderkey, o_orderstatus,
       o_totalprice + 1000.0 AS o_totalprice,
       CAST(2 AS INTEGER) AS version
FROM orders WHERE o_orderkey % 4 = 0
UNION ALL
SELECT o_orderkey + 1000000000 AS o_orderkey, o_orderstatus, o_totalprice,
       CAST(2 AS INTEGER) AS version
FROM orders WHERE o_orderkey % 11 = 0
UNION ALL
SELECT o_orderkey, o_orderstatus, o_totalprice,
       CAST(1 AS INTEGER) AS version
FROM orders WHERE o_orderkey % 4 != 0
""",
)
def upsert_current_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD-1 merge as a value-hashed query (``io/maintenance.upsert_apply``):
    the existing zone is every order at version 1; the update batch bumps
    o_totalprice (+1000.0, exact double addition) for every 4th key at
    version 2 and INSERTS a re-keyed copy of every 11th key.  The merge
    must overwrite exactly the updated keys, insert the new ones, and pass
    everything else through — the oracle states that outcome declaratively
    while the Spark plan realizes it as one union + one max-version window
    (the portable MERGE INTO).  All three paths non-vacuous at sf0.01."""
    from bigdata_rags_spark.io.maintenance import upsert_apply

    o = read_testdata(spark, sf_dir, "orders")["orders"].select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    existing = o.withColumn("version", F.lit(1).cast("int"))
    updated = o.filter(F.col("o_orderkey") % 4 == 0).select(
        "o_orderkey",
        "o_orderstatus",
        (F.col("o_totalprice") + F.lit(1000.0)).alias("o_totalprice"),
        F.lit(2).cast("int").alias("version"),
    )
    inserted = o.filter(F.col("o_orderkey") % 11 == 0).select(
        (F.col("o_orderkey") + F.lit(1_000_000_000)).alias("o_orderkey"),
        "o_orderstatus",
        "o_totalprice",
        F.lit(2).cast("int").alias("version"),
    )
    return upsert_apply(
        existing, updated.unionByName(inserted), "o_orderkey", version_col="version"
    )


@_q("zone_compaction_invariant", None)
def zone_compaction_invariant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction invariant (``io/maintenance.compact_zone`` —
    VERDICT r6 #5): write the documents table as a deterministic 8-file
    zone, compact it to one file, and report (files_before, files_after,
    rows_before, rows_after, row_delta).  Rows-only by nature: the checked
    effect is a FILESYSTEM layout change (part-file count), which SQL
    cannot observe — the row invariant (row_delta = 0, files 8 -> 1) is
    the correctness contract and is additionally pinned with planted data
    in tests/test_io.py.  Scale shape: compaction is one scan + one
    round-robin repartition sized by target rows per file; on partitioned
    zones it runs per hot partition (see compact_zone docstring)."""
    import tempfile

    from bigdata_rags_spark.io.maintenance import compact_zone

    docs = read_testdata(spark, sf_dir, "documents")["documents"]
    zone = tempfile.mkdtemp(prefix="bdrs_compact_") + "/zone"
    docs.repartition(8).write.mode("overwrite").parquet(zone)
    rows_before = spark.read.parquet(zone).count()
    files_before, files_after = compact_zone(
        spark, zone, target_rows_per_file=1_000_000_000
    )
    rows_after = spark.read.parquet(zone).count()
    return spark.createDataFrame(
        [(files_before, files_after, rows_before, rows_after, rows_after - rows_before)],
        "files_before int, files_after int, rows_before bigint, rows_after bigint, "
        "row_delta bigint",
    )


@_q(
    "join_key_skew_report",
    """
WITH k AS (
  SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS c FROM orders GROUP BY 1
),
t AS (SELECT c FROM k ORDER BY c DESC, o_custkey LIMIT 10),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
         CAST(SUM(c) AS BIGINT)   AS n_rows,
         CAST(MAX(c) AS BIGINT)   AS max_count
  FROM k
),
tt AS (SELECT CAST(SUM(c) AS BIGINT) AS top10_rows FROM t)
SELECT n_keys, n_rows, max_count,
       ROUND(max_count / CAST(n_rows AS DOUBLE), 6) AS max_share,
       top10_rows,
       ROUND(top10_rows / CAST(n_rows AS DOUBLE), 6) AS top10_share,
       n_rows * 1000000 // n_keys AS avg_rows_per_key_micro
FROM agg, tt
""",
)
def join_key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew profile — the diagnostic that decides between a plain
    shuffle join, AQE skew handling, and ``operators/skew.salted_join``
    BEFORE burning a cluster-hour on a lopsided exchange: per-key row
    counts reduce to key cardinality, hottest-key share, and top-10 share.

    Scale shape: one partial+final count per key (shuffle carries
    |keys|/partition rows), a top-10 via TakeOrderedAndProject (never a
    global sort), and 1-row broadcast crossJoins for the report row; the
    average is integer micro-unit floor division (engine-neutral)."""
    o = read_testdata(spark, sf_dir, "orders")["orders"]
    k = o.groupBy("o_custkey").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    top10 = k.orderBy(F.col("c").desc(), F.col("o_custkey")).limit(10)
    agg = k.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        F.sum("c").cast("bigint").alias("n_rows"),
        F.max("c").cast("bigint").alias("max_count"),
    )
    tt = top10.agg(F.sum("c").cast("bigint").alias("top10_rows"))
    return (
        agg.crossJoin(F.broadcast(tt))
        .select(
            "n_keys",
            "n_rows",
            "max_count",
            F.round(F.col("max_count") / F.col("n_rows").cast("double"), 6).alias("max_share"),
            "top10_rows",
            F.round(F.col("top10_rows") / F.col("n_rows").cast("double"), 6).alias("top10_share"),
            F.expr("n_rows * 1000000 div n_keys").alias("avg_rows_per_key_micro"),
        )
    )


@_q(
    "histogram_quantile_prices",
    """
WITH b AS (
  SELECT o_orderpriority AS pr, CAST(FLOOR(o_totalprice / 600.0) AS BIGINT) AS bin,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM orders GROUP BY 1, 2
),
w AS (
  SELECT pr, bin, c,
         CAST(SUM(c) OVER (PARTITION BY pr ORDER BY bin) AS BIGINT) AS cum,
         CAST(SUM(c) OVER (PARTITION BY pr) AS BIGINT) AS n
  FROM b
)
SELECT pr AS o_orderpriority, MAX(n) AS n,
       CAST(MIN(CASE WHEN cum >= (n + 1) // 2 THEN bin END) * 600 AS BIGINT) AS p50_lo,
       CAST(MIN(CASE WHEN cum >= (9 * n + 9) // 10 THEN bin END) * 600 AS BIGINT) AS p90_lo,
       CAST(MIN(CASE WHEN cum >= (99 * n + 99) // 100 THEN bin END) * 600 AS BIGINT) AS p99_lo
FROM w GROUP BY pr
""",
)
def histogram_quantile_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mergeable quantile estimation — the oracle-checkable
    sibling of the rows-only GK sketch (``approx_percentile_prices``):
    fixed-width 600-unit bins per priority, cumulative counts, and the
    quantile estimate is the lower edge of the first bin whose cumulative
    count reaches ceil(q*n) — pure integer arithmetic end to end, so two
    engines (or two cluster runs with different partitioning) agree
    bit-for-bit, and bin histograms MERGE by addition (the property that
    makes this the 100 TB pattern: per-partition histograms combine
    associatively, unlike exact percentiles).  Estimate error is bounded by
    bin width by construction."""
    o = read_testdata(spark, sf_dir, "orders")["orders"]
    b = o.select(
        F.col("o_orderpriority").alias("pr"),
        F.floor(F.col("o_totalprice") / F.lit(600.0)).cast("bigint").alias("bin"),
    ).groupBy("pr", "bin").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    from pyspark.sql import Window

    wcum = Window.partitionBy("pr").orderBy("bin").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wall = Window.partitionBy("pr")
    w = b.select(
        "pr", "bin", "c",
        F.sum("c").over(wcum).cast("bigint").alias("cum"),
        F.sum("c").over(wall).cast("bigint").alias("n"),
    )
    def q_lo(thresh_expr: str, name: str):
        return (F.min(F.when(F.expr(thresh_expr), F.col("bin"))) * 600).cast(
            "bigint"
        ).alias(name)

    return w.groupBy(F.col("pr").alias("o_orderpriority")).agg(
        F.max("n").alias("n"),
        q_lo("cum >= (n + 1) div 2", "p50_lo"),
        q_lo("cum >= (9 * n + 9) div 10", "p90_lo"),
        q_lo("cum >= (99 * n + 99) div 100", "p99_lo"),
    )


_LL_RHO_SQL = "(54 - (CASE WHEN rest >= 9007199254740992 THEN 54 WHEN rest >= 4503599627370496 THEN 53 WHEN rest >= 2251799813685248 THEN 52 WHEN rest >= 1125899906842624 THEN 51 WHEN rest >= 562949953421312 THEN 50 WHEN rest >= 281474976710656 THEN 49 WHEN rest >= 140737488355328 THEN 48 WHEN rest >= 70368744177664 THEN 47 WHEN rest >= 35184372088832 THEN 46 WHEN rest >= 17592186044416 THEN 45 WHEN rest >= 8796093022208 THEN 44 WHEN rest >= 4398046511104 THEN 43 WHEN rest >= 2199023255552 THEN 42 WHEN rest >= 1099511627776 THEN 41 WHEN rest >= 549755813888 THEN 40 WHEN rest >= 274877906944 THEN 39 WHEN rest >= 137438953472 THEN 38 WHEN rest >= 68719476736 THEN 37 WHEN rest >= 34359738368 THEN 36 WHEN rest >= 17179869184 THEN 35 WHEN rest >= 8589934592 THEN 34 WHEN rest >= 4294967296 THEN 33 WHEN rest >= 2147483648 THEN 32 WHEN rest >= 1073741824 THEN 31 WHEN rest >= 536870912 THEN 30 WHEN rest >= 268435456 THEN 29 WHEN rest >= 134217728 THEN 28 WHEN rest >= 67108864 THEN 27 WHEN rest >= 33554432 THEN 26 WHEN rest >= 16777216 THEN 25 WHEN rest >= 8388608 THEN 24 WHEN rest >= 4194304 THEN 23 WHEN rest >= 2097152 THEN 22 WHEN rest >= 1048576 THEN 21 WHEN rest >= 524288 THEN 20 WHEN rest >= 262144 THEN 19 WHEN rest >= 131072 THEN 18 WHEN rest >= 65536 THEN 17 WHEN rest >= 32768 THEN 16 WHEN rest >= 16384 THEN 15 WHEN rest >= 8192 THEN 14 WHEN rest >= 4096 THEN 13 WHEN rest >= 2048 THEN 12 WHEN rest >= 1024 THEN 11 WHEN rest >= 512 THEN 10 WHEN rest >= 256 THEN 9 WHEN rest >= 128 THEN 8 WHEN rest >= 64 THEN 7 WHEN rest >= 32 THEN 6 WHEN rest >= 16 THEN 5 WHEN rest >= 8 THEN 4 WHEN rest >= 4 THEN 3 WHEN rest >= 2 THEN 2 WHEN rest >= 1 THEN 1 ELSE 0 END) + 1)"  # rank of first 1-bit from the MSB of the 54-bit rest


@_q(
    "loglog_distinct_customers",
    f"""
WITH h AS (
  SELECT DISTINCT ('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 15))::BIGINT AS hv
  FROM orders
),
rb AS (SELECT hv % 64 AS bucket, hv // 64 AS rest FROM h),
mx AS (
  SELECT bucket, CAST(MAX({_LL_RHO_SQL}) AS INT) AS m_j
  FROM rb GROUP BY bucket
),
spine AS (SELECT CAST(unnest(range(0, 64)) AS BIGINT) AS bucket),
filled AS (
  SELECT s.bucket, COALESCE(mx.m_j, 0) AS m_j
  FROM spine s LEFT JOIN mx ON s.bucket = mx.bucket
),
agg AS (
  SELECT CAST(SUM(CAST(1 AS BIGINT) << (55 - m_j)) AS BIGINT) AS s_scaled,
         CAST(SUM(CASE WHEN m_j = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_empty
  FROM filled
),
ex AS (SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_exact FROM orders)
SELECT 64 AS m, n_empty, n_exact,
       ROUND((0.7213 / (1 + 1.079 / 64)) * 64 * 64
             / (CAST(s_scaled AS DOUBLE) / CAST(CAST(1 AS BIGINT) << 55 AS DOUBLE)),
             4) AS estimate,
       ROUND(abs((0.7213 / (1 + 1.079 / 64)) * 64 * 64
             / (CAST(s_scaled AS DOUBLE) / CAST(CAST(1 AS BIGINT) << 55 AS DOUBLE))
             - n_exact) / n_exact, 4) AS rel_error
FROM agg, ex
""",
)
def loglog_distinct_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic HyperLogLog-style distinct estimation — the
    oracle-checkable sibling of the rows-only HLL sketch
    (``approx_count_distinct_orders``): md5-derived 60-bit hashes split
    into 64 buckets, per-bucket max rank-of-first-1-bit, and the classic
    bias-corrected harmonic estimate (Flajolet et al. 2007) — every step
    integer or single-rounded, so two engines agree bit-for-bit.

    Determinism details: the harmonic sum is computed as an INTEGER
    (sum of 2^(55-M_j) <= 2^61, exact in bigint, order-free) and divides
    by 2^55 once — a float SUM of 2^-M_j terms would round differently
    per partition order.  Per-partition bucket maxima merge associatively,
    the same property that makes HLL the 100 TB distinct-count pattern;
    the exact COUNT(DISTINCT) rides along so the report shows its own
    relative error (~1.3/sqrt(64) = 16% theoretical)."""
    o = read_testdata(spark, sf_dir, "orders")["orders"]
    hv = F.conv(
        F.substring(F.md5(F.col("o_custkey").cast("string")), 1, 15), 16, 10
    ).cast("long")
    rb = o.select(hv.alias("hv")).distinct().select(
        (F.col("hv") % 64).alias("bucket"),
        F.expr("hv div 64").alias("rest"),
    )
    mx = rb.groupBy("bucket").agg(
        F.expr(f"CAST(MAX({_LL_RHO_SQL}) AS INT)").alias("m_j")
    )
    spine = spark.range(64).select(F.col("id").alias("bucket"))
    filled = spine.join(mx, "bucket", "left").select(
        "bucket", F.coalesce("m_j", F.lit(0)).alias("m_j")
    )
    agg = filled.agg(
        F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 55 - m_j)")).cast("bigint").alias("s_scaled"),
        F.sum(F.when(F.col("m_j") == 0, 1).otherwise(0)).cast("bigint").alias("n_empty"),
    )
    ex = o.agg(F.countDistinct("o_custkey").cast("bigint").alias("n_exact"))
    est = (
        F.lit(0.7213 / (1 + 1.079 / 64)) * 64 * 64
        / (F.col("s_scaled").cast("double") / F.expr("CAST(shiftleft(CAST(1 AS BIGINT), 55) AS DOUBLE)"))
    )
    return (
        agg.crossJoin(F.broadcast(ex))
        .select(
            F.lit(64).cast("int").alias("m"),
            "n_empty",
            "n_exact",
            F.round(est, 4).alias("estimate"),
            F.round(F.abs(est - F.col("n_exact")) / F.col("n_exact"), 4).alias("rel_error"),
        )
    )



@_q(
    "decimal_exact_revenue",
    """
SELECT l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(18,2))))
            AS DOUBLE) AS sum_discounted
FROM lineitem GROUP BY l_returnflag
""",
)
def decimal_exact_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed-DECIMAL aggregation — the money-arithmetic surface: casting
    prices/discounts to DECIMAL(18,2) makes every product and sum EXACT
    (base-10 fixed point), so no rounding discipline, accumulation-order
    argument, or micro-unit trick is needed at all — the principled fix
    for the float-tie hazards catalog.py documents, demonstrated
    end-to-end (the doubles in the fixture sit ~1e-13 off the decimal
    grid, so both engines' nearest-decimal cast lands on the same grid
    point).  The exact decimal totals convert to double once at the end
    for the engine-neutral report.  Scale shape: plain partial+final hash
    agg; Spark's decimal sums run in the same codegen'd path as longs."""
    li = read_testdata(spark, sf_dir, "lineitem")["lineitem"]
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    one = F.lit(1).cast("decimal(3,2)")
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        F.sum(price).cast("double").alias("sum_base"),
        F.sum(price * (one - disc)).cast("double").alias("sum_discounted"),
    )


@_q(
    "null_safe_join_semantics",
    """
WITH a AS (SELECT NULLIF(o_orderkey % 7, 0) AS k, o_totalprice FROM orders),
b AS (SELECT DISTINCT k FROM a)
SELECT b.k, CAST(COUNT(*) AS BIGINT) AS n_rows,
       ROUND(SUM(a.o_totalprice), 2) AS total
FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
GROUP BY b.k
""",
)
def null_safe_join_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (`<=>` / IS NOT DISTINCT FROM): the NULL key
    bucket JOINS (one output group with k IS NULL) instead of silently
    dropping, the semantic difference from `=` that bites every pipeline
    joining on nullable dimensions.  Spark plans eqNullSafe as a regular
    hash-join key (null hashes to a bucket like any value — no skew cliff,
    no cartesian fallback), pinned in the plan tests."""
    o = read_testdata(spark, sf_dir, "orders")["orders"]
    a = o.select(
        F.nullif(F.col("o_orderkey") % 7, F.lit(0)).alias("k"), "o_totalprice"
    )
    b = a.select("k").distinct().select(F.col("k").alias("bk"))
    return (
        a.join(b, F.col("k").eqNullSafe(F.col("bk")))
        .groupBy(F.col("bk").alias("k"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
    )


@_q(
    "correlation_price_quantity",
    """
WITH m AS (
  SELECT l_returnflag,
         CAST(ROUND(l_quantity) AS BIGINT)      AS x,
         CAST(ROUND(l_extendedprice) AS BIGINT) AS y
  FROM lineitem
),
agg AS (
  SELECT l_returnflag,
         CAST(COUNT(*) AS BIGINT)   AS n,
         CAST(SUM(x) AS BIGINT)     AS sx,
         CAST(SUM(y) AS BIGINT)     AS sy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(y * y) AS BIGINT) AS syy,
         CAST(SUM(x * y) AS BIGINT) AS sxy
  FROM m GROUP BY l_returnflag
)
SELECT l_returnflag, n,
       ROUND((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
             / (CAST(n AS DOUBLE) * n), 6) AS covariance,
       ROUND((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
             / NULLIF(sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                           * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)),
                      0.0), 6) AS correlation
FROM agg
""",
)
def correlation_price_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group Pearson correlation and population covariance between
    quantity and price — the bivariate-statistics surface, computed the
    DETERMINISTIC way: the five moment sums accumulate as EXACT bigints
    over unit-rounded values (quantities are integral; prices round to
    whole dollars so y^2 sums stay far inside int64), then the correlation
    assembles in double from identical integers — identical IEEE ops both
    engines, no dependence on float accumulation order (the reason the
    built-in corr()/covar_pop() can't be value-hashed across engines).
    Scale shape: one partial+final hash agg; the moment trick is also the
    mergeable form (per-partition moment vectors add associatively)."""
    li = read_testdata(spark, sf_dir, "lineitem")["lineitem"]
    m = li.select(
        "l_returnflag",
        F.round("l_quantity").cast("bigint").alias("x"),
        F.round("l_extendedprice").cast("bigint").alias("y"),
    )
    agg = m.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
    )
    n_d = F.col("n").cast("double")
    cov_num = n_d * F.col("sxy") - F.col("sx").cast("double") * F.col("sy")
    var_x = n_d * F.col("sxx") - F.col("sx").cast("double") * F.col("sx")
    var_y = n_d * F.col("syy") - F.col("sy").cast("double") * F.col("sy")
    return agg.select(
        "l_returnflag",
        "n",
        F.round(cov_num / (n_d * F.col("n")), 6).alias("covariance"),
        F.round(
            cov_num / F.nullif(F.sqrt(var_x * var_y), F.lit(0.0)), 6
        ).alias("correlation"),
    )


@_q(
    "scd2_point_in_time_lookup",
    """
WITH changed AS (SELECT o_orderkey FROM orders WHERE o_orderkey % 5 = 0),
closed AS (
  SELECT o.o_orderkey, o.o_orderstatus,
         STRFTIME(CAST(o.o_orderdate AS DATE), '%Y-%m-%d') AS valid_from,
         STRFTIME(CAST(o.o_orderdate AS DATE) + INTERVAL 30 DAY, '%Y-%m-%d') AS valid_to,
         FALSE AS is_current
  FROM orders o JOIN changed USING (o_orderkey)
),
opened AS (
  SELECT o.o_orderkey, 'X' AS o_orderstatus,
         STRFTIME(CAST(o.o_orderdate AS DATE) + INTERVAL 30 DAY, '%Y-%m-%d') AS valid_from,
         CAST(NULL AS VARCHAR) AS valid_to,
         TRUE AS is_current
  FROM orders o JOIN changed USING (o_orderkey)
),
untouched AS (
  SELECT o_orderkey, o_orderstatus,
         STRFTIME(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS valid_from,
         CAST(NULL AS VARCHAR) AS valid_to,
         TRUE AS is_current
  FROM orders WHERE o_orderkey % 5 != 0
),
hist AS (
  SELECT * FROM closed UNION ALL SELECT * FROM opened
  UNION ALL SELECT * FROM untouched
),
probes AS (
  SELECT o_orderkey,
         STRFTIME(CAST(o_orderdate AS DATE) + INTERVAL 15 DAY, '%Y-%m-%d') AS lookup_date
  FROM orders
  UNION ALL
  SELECT o_orderkey,
         STRFTIME(CAST(o_orderdate AS DATE) + INTERVAL 45 DAY, '%Y-%m-%d') AS lookup_date
  FROM orders
)
SELECT p.o_orderkey, p.lookup_date, h.o_orderstatus, h.is_current
FROM probes p
JOIN hist h
  ON p.o_orderkey = h.o_orderkey
 AND h.valid_from <= p.lookup_date
 AND (h.valid_to IS NULL OR p.lookup_date < h.valid_to)
""",
)
def scd2_point_in_time_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal-table (point-in-time) join against the SCD-2 history that
    ``scd2_current_rows`` builds: every order is probed at order date + 15
    days (hits the CLOSED pre-change version for every 5th key) and + 45
    days (hits the OPENED post-change version) — the "what did this row
    look like when the fact happened" lookup that is the entire reason
    SCD-2 history exists, and the batch analog of a stream's
    versioned-dim enrichment.  Validity bounds compare as 'YYYY-MM-DD'
    strings (lexicographic == chronological, engine-neutral); the open
    interval is NULL-terminated.

    Scale shape: the history reduces to (key, attrs, validity) rows; the
    probe join is an equi-join on the key with a residual interval
    predicate — co-partitioned by key, never a range cross-product; at
    most |versions-per-key| candidates meet each probe."""
    from bigdata_rags_spark.io.maintenance import scd2_apply

    o = read_testdata(spark, sf_dir, "orders")["orders"].select(
        "o_orderkey",
        "o_orderstatus",
        F.col("o_orderdate").cast("date").alias("change_d"),
    )
    b1 = o.select("o_orderkey", "o_orderstatus", F.col("change_d").alias("change_ts"))
    b2 = o.filter(F.col("o_orderkey") % 5 == 0).select(
        "o_orderkey",
        F.lit("X").alias("o_orderstatus"),
        F.date_add("change_d", 30).alias("change_ts"),
    )
    hist = scd2_apply(
        scd2_apply(None, b1, "o_orderkey", "change_ts"), b2, "o_orderkey", "change_ts"
    ).select(
        "o_orderkey",
        "o_orderstatus",
        F.date_format("__valid_from", "yyyy-MM-dd").alias("valid_from"),
        F.date_format("__valid_to", "yyyy-MM-dd").alias("valid_to"),
        F.col("__is_current").alias("is_current"),
    )
    probes = (
        o.select("o_orderkey", F.date_format(F.date_add("change_d", 15), "yyyy-MM-dd").alias("lookup_date"))
        .unionByName(
            o.select("o_orderkey", F.date_format(F.date_add("change_d", 45), "yyyy-MM-dd").alias("lookup_date"))
        )
    )
    return probes.join(
        hist,
        (probes["o_orderkey"] == hist["o_orderkey"])
        & (hist["valid_from"] <= probes["lookup_date"])
        & (hist["valid_to"].isNull() | (probes["lookup_date"] < hist["valid_to"])),
    ).select(
        probes["o_orderkey"], "lookup_date", "o_orderstatus", "is_current"
    )


@_q(
    "zone_time_travel_read",
    """
WITH v1 AS (
  SELECT o_orderkey, o_orderstatus, '1995-01-01' AS vf,
         CASE WHEN o_orderkey % 5 = 0 THEN '1995-06-01'
              WHEN o_orderkey % 7 = 0 THEN '1995-12-01'
              ELSE NULL END AS vt
  FROM orders
),
v2 AS (
  SELECT o_orderkey, 'X' AS o_orderstatus, '1995-06-01' AS vf,
         CASE WHEN o_orderkey % 7 = 0 THEN '1995-12-01' ELSE NULL END AS vt
  FROM orders WHERE o_orderkey % 5 = 0
),
v3 AS (
  SELECT o_orderkey, 'Y' AS o_orderstatus, '1995-12-01' AS vf,
         CAST(NULL AS VARCHAR) AS vt
  FROM orders WHERE o_orderkey % 7 = 0
),
hist AS (
  SELECT * FROM v1 UNION ALL SELECT * FROM v2 UNION ALL SELECT * FROM v3
),
snap AS (
  SELECT 'as_of_1995-03-01' AS as_of_label, o_orderstatus FROM hist
   WHERE vf <= '1995-03-01' AND (vt IS NULL OR '1995-03-01' < vt)
  UNION ALL
  SELECT 'as_of_1995-09-01', o_orderstatus FROM hist
   WHERE vf <= '1995-09-01' AND (vt IS NULL OR '1995-09-01' < vt)
  UNION ALL
  SELECT 'current', o_orderstatus FROM hist WHERE vt IS NULL
)
SELECT as_of_label, o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n_keys
FROM snap GROUP BY 1, 2
""",
)
def zone_time_travel_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone TIME-TRAVEL read (`io/maintenance.as_of_snapshot` /
    `read_zone_as_of` — VERDICT r13 next #6): reconstruct a
    SCD-2-maintained table at three moments and report its status
    composition at each.  Three merge batches build the history (all keys
    at 1995-01-01 with their real status; every 5th key flips to 'X' at
    1995-06-01; every 7th to 'Y' at 1995-12-01), then
    as-of(1995-03-01) != as-of(1995-09-01) != current — each probe
    non-vacuously selects a different version mix, the lakehouse
    "SELECT ... AS OF" surface the snapshot/SCD2/CDC tier was missing.
    Scale: each as-of read is one scan with a row-local interval
    predicate (no join); the three labeled snapshots union into one
    status rollup."""
    from bigdata_rags_spark.io.maintenance import as_of_snapshot, scd2_apply

    o = read_testdata(spark, sf_dir, "orders")["orders"]
    b1 = o.select(
        "o_orderkey", "o_orderstatus", F.lit("1995-01-01").alias("change_ts")
    )
    b2 = o.filter(F.col("o_orderkey") % 5 == 0).select(
        "o_orderkey",
        F.lit("X").alias("o_orderstatus"),
        F.lit("1995-06-01").alias("change_ts"),
    )
    b3 = o.filter(F.col("o_orderkey") % 7 == 0).select(
        "o_orderkey",
        F.lit("Y").alias("o_orderstatus"),
        F.lit("1995-12-01").alias("change_ts"),
    )
    hist = scd2_apply(
        scd2_apply(
            scd2_apply(None, b1, "o_orderkey", "change_ts"),
            b2,
            "o_orderkey",
            "change_ts",
        ),
        b3,
        "o_orderkey",
        "change_ts",
    )

    def labeled(label: str, snap: DataFrame) -> DataFrame:
        return snap.select(
            F.lit(label).alias("as_of_label"), "o_orderstatus"
        )

    snaps = (
        labeled("as_of_1995-03-01", as_of_snapshot(hist, "1995-03-01"))
        .unionByName(labeled("as_of_1995-09-01", as_of_snapshot(hist, "1995-09-01")))
        .unionByName(labeled("current", hist.filter(F.col("__is_current"))))
    )
    return snaps.groupBy("as_of_label", "o_orderstatus").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_keys")
    )


def _zorder_oracle(n_files: int = 64) -> str:
    """Oracle for the Z-order layout stats: the same 16-bit grid `div`
    normalization and the same 32-term shift-add Morton interleave,
    all exact bigint."""
    from bigdata_rags_spark.io.layout import GRID_BITS

    cell_max = (1 << GRID_BITS) - 1
    width = (1 << (2 * GRID_BITS)) // n_files
    terms = " + ".join(
        f"(((ca >> {i}) & 1) << {2 * i + 1}) + (((cb >> {i}) & 1) << {2 * i})"
        for i in range(GRID_BITS)
    )
    return f"""
WITH base AS (
  SELECT CAST(o_custkey AS BIGINT) AS a,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS b
  FROM orders
),
bounds AS (SELECT MIN(a) AS a_lo, MAX(a) AS a_hi, MIN(b) AS b_lo, MAX(b) AS b_hi FROM base),
cells AS (
  SELECT a, b,
         CASE WHEN a_hi > a_lo THEN (a - a_lo) * {cell_max} // (a_hi - a_lo) ELSE 0 END AS ca,
         CASE WHEN b_hi > b_lo THEN (b - b_lo) * {cell_max} // (b_hi - b_lo) ELSE 0 END AS cb
  FROM base, bounds
),
z AS (SELECT a, b, {terms} AS zkey FROM cells)
SELECT zkey // {width} AS file_id,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(MIN(a) AS BIGINT) AS a_min, CAST(MAX(a) AS BIGINT) AS a_max,
       CAST(MIN(b) AS BIGINT) AS b_min, CAST(MAX(b) AS BIGINT) AS b_max
FROM z GROUP BY 1
"""


@_q("zorder_file_skipping_stats", _zorder_oracle())
def zorder_file_skipping_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order layout quality report (`io/layout.py`): orders are laid out
    on the Morton interleave of (o_custkey, price-cents) into 64
    fixed-width key ranges — the deterministic stand-in for
    `repartitionByRange(zkey)` + write — and each "file" reports the
    min/max zone map of BOTH dimensions.  Narrow ranges on both axes are
    what make 2-D predicates prune row groups at 100 TB; a single-column
    sort would pin one axis and leave the other spanning the full domain
    (pinned by the clustering test).  The lakehouse OPTIMIZE ZORDER
    analog; the reference writes unsorted zone parquet
    (`reference/dag-load.py`)."""
    from bigdata_rags_spark.io.layout import zorder_stats

    o = read_testdata(spark, sf_dir, "orders")["orders"]
    base = o.select(
        F.col("o_custkey").cast("bigint").alias("ck"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    return zorder_stats(base, "ck", "cents", n_files=64)


@_q(
    "cdc_apply_log_compaction",
    """
WITH log AS (
  SELECT o_orderkey, 1 AS seq, 'I' AS op, o_totalprice FROM orders
  UNION ALL
  SELECT o_orderkey, 2 AS seq, 'U' AS op, o_totalprice + 1000.0 AS o_totalprice
  FROM orders WHERE o_orderkey % 4 = 0
  UNION ALL
  SELECT o_orderkey, 3 AS seq, 'D' AS op, CAST(0.0 AS DOUBLE) AS o_totalprice
  FROM orders WHERE o_orderkey % 6 = 0
  UNION ALL
  SELECT o_orderkey, 4 AS seq, 'I' AS op, o_totalprice + 5000.0 AS o_totalprice
  FROM orders WHERE o_orderkey % 12 = 0
)
SELECT o_orderkey, CAST(seq AS INTEGER) AS seq, op, o_totalprice
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderkey ORDER BY seq DESC) AS rn
  FROM log
) WHERE rn = 1 AND op != 'D'
""",
)
def cdc_apply_log_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC log compaction (`io/maintenance.cdc_apply`): a synthetic change
    log over orders exercises every path non-vacuously — insert (seq 1,
    all keys), update (seq 2, every 4th), delete (seq 3, every 6th), and
    INSERT-AFTER-DELETE (seq 4, every 12th — the ordering trap: the key
    must survive with the new payload, which op-kind-based merges get
    wrong).  Latest-seq-wins, latest 'D' drops the key.  One key-hash
    window exchange, no join."""
    from bigdata_rags_spark.io.maintenance import cdc_apply

    o = read_testdata(spark, sf_dir, "orders")["orders"].select(
        "o_orderkey", "o_totalprice"
    )

    def part(flt, seq, op, price):
        return o.filter(flt).select(
            "o_orderkey",
            F.lit(seq).cast("int").alias("seq"),
            F.lit(op).alias("op"),
            price.alias("o_totalprice"),
        )

    log = (
        part(F.lit(True), 1, "I", F.col("o_totalprice"))
        .unionByName(part(F.col("o_orderkey") % 4 == 0, 2, "U", F.col("o_totalprice") + F.lit(1000.0)))
        .unionByName(part(F.col("o_orderkey") % 6 == 0, 3, "D", F.lit(0.0).cast("double")))
        .unionByName(part(F.col("o_orderkey") % 12 == 0, 4, "I", F.col("o_totalprice") + F.lit(5000.0)))
    )
    return cdc_apply(log, ["o_orderkey"], seq_col="seq", op_col="op").select(
        "o_orderkey", "seq", "op", "o_totalprice"
    )


def _drift_profile_sql(src: str) -> str:
    return f"""
  SELECT '_table' AS "column", 'n_rows' AS metric, CAST(COUNT(*) AS BIGINT) AS v FROM {src}
  UNION ALL SELECT 'price', 'n_null', CAST(SUM(CASE WHEN cents IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM {src}
  UNION ALL SELECT 'price', 'min_cents', CAST(MIN(cents) AS BIGINT) FROM {src}
  UNION ALL SELECT 'price', 'max_cents', CAST(MAX(cents) AS BIGINT) FROM {src}
  UNION ALL SELECT 'status', 'n_null', CAST(SUM(CASE WHEN status IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM {src}
  UNION ALL SELECT 'price', 'n_distinct', CAST(COUNT(DISTINCT cents) AS BIGINT) FROM {src}
  UNION ALL SELECT 'status', 'n_distinct', CAST(COUNT(DISTINCT status) AS BIGINT) FROM {src}
"""


@_q(
    "snapshot_drift_report",
    f"""
WITH v1 AS (
  SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents, o_orderstatus AS status
  FROM orders
),
v2 AS (
  SELECT CASE WHEN o_orderkey % 5 = 0
              THEN CAST(ROUND(o_totalprice * 100) AS BIGINT) + 2500
              ELSE CAST(ROUND(o_totalprice * 100) AS BIGINT) END AS cents,
         CASE WHEN o_orderkey % 3 = 0 THEN NULL ELSE o_orderstatus END AS status
  FROM orders WHERE o_orderkey % 7 != 0
),
pa AS ({_drift_profile_sql("v1")}),
pb AS ({_drift_profile_sql("v2")})
SELECT COALESCE(pa."column", pb."column") AS "column",
       COALESCE(pa.metric, pb.metric)     AS metric,
       pa.v AS v_prev, pb.v AS v_curr,
       CAST(COALESCE(pb.v, 0) - COALESCE(pa.v, 0) AS BIGINT) AS delta
FROM pa FULL OUTER JOIN pb ON pa."column" = pb."column" AND pa.metric = pb.metric
""",
)
def snapshot_drift_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-over-snapshot DISTRIBUTION drift monitor
    (`operators/expectations.column_profile` + `drift_report`):
    `zone_snapshot_diff` answers "which rows changed", this answers "did
    the data's SHAPE change" — null-rate spikes, range expansion,
    cardinality collapse, row-count cliffs — the check a scheduled
    pipeline runs before promoting a zone.  The v2 snapshot plants every
    drift class deterministically: every 7th row dropped (row-count +
    distinct drift), every 5th price shifted +2500 cents (max drift),
    every 3rd status nulled (null-rate drift).  All metrics exact bigints;
    at 100 TB the distinct counts swap to HLL sketches with identical
    comparison logic."""
    from bigdata_rags_spark.operators.expectations import column_profile, drift_report

    o = read_testdata(spark, sf_dir, "orders")["orders"]
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    v1 = o.select(cents.alias("cents"), F.col("o_orderstatus").alias("status"))
    v2 = o.filter(F.col("o_orderkey") % 7 != 0).select(
        F.when(F.col("o_orderkey") % 5 == 0, cents + 2500).otherwise(cents).alias("cents"),
        F.when(F.col("o_orderkey") % 3 == 0, F.lit(None).cast("string"))
        .otherwise(F.col("o_orderstatus"))
        .alias("status"),
    )
    prof = lambda df: column_profile(df, {"price": F.col("cents")}, ["status"])  # noqa: E731
    return drift_report(prof(v1), prof(v2))


@_q(
    "rfm_customer_segmentation",
    """
WITH cents AS (
  SELECT o_custkey, CAST(o_orderdate AS DATE) AS od,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS v
  FROM orders
),
g AS (SELECT MAX(od) AS gmax FROM cents),
per_cust AS (
  SELECT o_custkey,
         CAST(date_diff('day', MAX(od), (SELECT gmax FROM g)) AS BIGINT) AS recency_days,
         CAST(COUNT(*) AS BIGINT) AS frequency,
         CAST(SUM(v) AS BIGINT) AS monetary_cents
  FROM cents GROUP BY o_custkey
),
ranked AS (
  SELECT *,
         ROW_NUMBER() OVER (ORDER BY recency_days, o_custkey)    AS rr,
         ROW_NUMBER() OVER (ORDER BY frequency, o_custkey)       AS rf,
         ROW_NUMBER() OVER (ORDER BY monetary_cents, o_custkey)  AS rm,
         CAST(COUNT(*) OVER () AS BIGINT) AS n
  FROM per_cust
),
b AS (
  SELECT
    MAX(CASE WHEN rr = (n + 3) // 4 THEN recency_days END)     AS r1,
    MAX(CASE WHEN rr = (n + 1) // 2 THEN recency_days END)     AS r2,
    MAX(CASE WHEN rr = (3 * n + 3) // 4 THEN recency_days END) AS r3,
    MAX(CASE WHEN rf = (n + 3) // 4 THEN frequency END)        AS f1,
    MAX(CASE WHEN rf = (n + 1) // 2 THEN frequency END)        AS f2,
    MAX(CASE WHEN rf = (3 * n + 3) // 4 THEN frequency END)    AS f3,
    MAX(CASE WHEN rm = (n + 3) // 4 THEN monetary_cents END)   AS m1,
    MAX(CASE WHEN rm = (n + 1) // 2 THEN monetary_cents END)   AS m2,
    MAX(CASE WHEN rm = (3 * n + 3) // 4 THEN monetary_cents END) AS m3
  FROM ranked
)
SELECT o_custkey, recency_days, frequency, monetary_cents,
       CAST(CASE WHEN recency_days <= r1 THEN 4 WHEN recency_days <= r2 THEN 3
                 WHEN recency_days <= r3 THEN 2 ELSE 1 END AS BIGINT) AS r_score,
       CAST(CASE WHEN frequency <= f1 THEN 1 WHEN frequency <= f2 THEN 2
                 WHEN frequency <= f3 THEN 3 ELSE 4 END AS BIGINT) AS f_score,
       CAST(CASE WHEN monetary_cents <= m1 THEN 1 WHEN monetary_cents <= m2 THEN 2
                 WHEN monetary_cents <= m3 THEN 3 ELSE 4 END AS BIGINT) AS m_score
FROM per_cust, b
""",
)
def rfm_customer_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation — recency / frequency / monetary quartile
    scores, the classic marketing-analytics operator: per-customer stats
    from one orders scan, quartile BOUNDARIES extracted by exact rank
    arithmetic (value at rank ceil(n/4), ceil(n/2), ceil(3n/4) — the
    discrete-percentile trick from `events_hourly_value_percentiles`),
    then a broadcast of the 1-row boundary set scores every customer
    map-side.  Only the boundary extraction funnels the per-customer AGG
    (not the facts) through a global window, once; at 100 TB swap that one
    step for approx_percentile — the scoring join is unchanged.  Integer
    cents/days/counts end to end."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    o = read_testdata(spark, sf_dir, "orders")["orders"]
    cents = o.select(
        "o_custkey",
        F.col("o_orderdate").cast("date").alias("od"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("v"),
    )
    g = cents.agg(F.max("od").alias("gmax"))
    per_cust = (
        cents.groupBy("o_custkey")
        .agg(
            F.max("od").alias("last_od"),
            F.count(F.lit(1)).cast("bigint").alias("frequency"),
            F.sum("v").cast("bigint").alias("monetary_cents"),
        )
        .join(F.broadcast(g))
        .select(
            "o_custkey",
            F.datediff(F.col("gmax"), F.col("last_od")).cast("bigint").alias("recency_days"),
            "frequency",
            "monetary_cents",
        )
    )
    ranked = per_cust.select(
        "*",
        F.row_number().over(Window.orderBy("recency_days", "o_custkey")).alias("rr"),
        F.row_number().over(Window.orderBy("frequency", "o_custkey")).alias("rf"),
        F.row_number().over(Window.orderBy("monetary_cents", "o_custkey")).alias("rm"),
        F.count(F.lit(1)).over(Window.partitionBy()).cast("bigint").alias("n"),
    )
    pick = lambda rank_col, val, idx: F.max(  # noqa: E731
        F.when(F.col(rank_col) == F.expr(idx), F.col(val))
    )
    b = ranked.agg(
        pick("rr", "recency_days", "(n + 3) div 4").alias("r1"),
        pick("rr", "recency_days", "(n + 1) div 2").alias("r2"),
        pick("rr", "recency_days", "(3 * n + 3) div 4").alias("r3"),
        pick("rf", "frequency", "(n + 3) div 4").alias("f1"),
        pick("rf", "frequency", "(n + 1) div 2").alias("f2"),
        pick("rf", "frequency", "(3 * n + 3) div 4").alias("f3"),
        pick("rm", "monetary_cents", "(n + 3) div 4").alias("m1"),
        pick("rm", "monetary_cents", "(n + 1) div 2").alias("m2"),
        pick("rm", "monetary_cents", "(3 * n + 3) div 4").alias("m3"),
    )
    lo_good = lambda v, b1, b2, b3: (  # noqa: E731
        F.when(F.col(v) <= F.col(b1), 4)
        .when(F.col(v) <= F.col(b2), 3)
        .when(F.col(v) <= F.col(b3), 2)
        .otherwise(1)
        .cast("bigint")
    )
    hi_good = lambda v, b1, b2, b3: (  # noqa: E731
        F.when(F.col(v) <= F.col(b1), 1)
        .when(F.col(v) <= F.col(b2), 2)
        .when(F.col(v) <= F.col(b3), 3)
        .otherwise(4)
        .cast("bigint")
    )
    return per_cust.join(F.broadcast(b)).select(
        "o_custkey", "recency_days", "frequency", "monetary_cents",
        lo_good("recency_days", "r1", "r2", "r3").alias("r_score"),
        hi_good("frequency", "f1", "f2", "f3").alias("f_score"),
        hi_good("monetary_cents", "m1", "m2", "m3").alias("m_score"),
    )


@_q(
    "basket_affinity_lift",
    """
WITH b AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
n AS (SELECT CAST(COUNT(DISTINCT ok) AS BIGINT) AS n_orders FROM b),
item AS (SELECT pk, CAST(COUNT(*) AS BIGINT) AS n_item FROM b GROUP BY pk),
pairs AS (
  SELECT a.pk AS part_a, c.pk AS part_b, CAST(COUNT(*) AS BIGINT) AS n_pair
  FROM b a JOIN b c ON a.ok = c.ok AND a.pk < c.pk
  GROUP BY 1, 2
)
SELECT part_a, part_b, n_pair, ia.n_item AS n_a, ib.n_item AS n_b,
       n_pair * n.n_orders * 1000000 // (ia.n_item * ib.n_item) AS lift_micro
FROM pairs
JOIN item ia ON pairs.part_a = ia.pk
JOIN item ib ON pairs.part_b = ib.pk
CROSS JOIN n
WHERE n_pair >= 2
""",
)
def basket_affinity_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket affinity (association-rule support + lift, the Apriori
    pair level): which parts co-occur in the same order more than their
    independent popularity predicts — lift = P(a,b)/(P(a)P(b)) in exact
    integer micro-units (n_pair * n_orders * 1e6 div (n_a * n_b)).  The
    pair self-join is keyed on the BASKET id, so the blowup is bounded by
    basket size squared (TPC-H baskets are <= 7 lines), never corpus
    size squared — the classic market-basket shape; at 100 TB a hot
    basket cap (filter baskets above ~1k items) keeps the bound.  One
    distinct shuffle + one basket-keyed equi-join + id-keyed support
    joins; the 1-row order count is broadcast."""
    from pyspark.sql import functions as F

    li = read_testdata(spark, sf_dir, "lineitem")["lineitem"]
    b = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk")).distinct()
    n = b.agg(F.countDistinct("ok").cast("bigint").alias("n_orders"))
    item = b.groupBy("pk").agg(F.count(F.lit(1)).cast("bigint").alias("n_item"))
    a = b.select("ok", F.col("pk").alias("part_a"))
    c = b.select("ok", F.col("pk").alias("part_b"))
    pairs = (
        a.join(c, "ok")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pair"))
        .filter(F.col("n_pair") >= 2)
    )
    ia = item.select(F.col("pk").alias("part_a"), F.col("n_item").alias("n_a"))
    ib = item.select(F.col("pk").alias("part_b"), F.col("n_item").alias("n_b"))
    return (
        pairs.join(ia, "part_a")
        .join(ib, "part_b")
        .join(F.broadcast(n))
        .select(
            "part_a", "part_b", "n_pair", "n_a", "n_b",
            F.expr("n_pair * n_orders * 1000000 div (n_a * n_b)").alias("lift_micro"),
        )
    )


@_q(
    "pareto_abc_customers",
    """
WITH per_cust AS (
  SELECT o_custkey, CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM orders GROUP BY o_custkey
),
tot AS (SELECT CAST(SUM(cents) AS BIGINT) AS total FROM per_cust),
r AS (
  SELECT o_custkey, cents,
         CAST(SUM(cents) OVER (ORDER BY cents DESC, o_custkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_cents
  FROM per_cust
)
SELECT o_custkey, cents, cum_cents,
       cum_cents * 1000000 // tot.total AS cum_share_micro,
       CASE WHEN cum_cents * 100 <= tot.total * 80 THEN 'A'
            WHEN cum_cents * 100 <= tot.total * 95 THEN 'B'
            ELSE 'C' END AS abc_class
FROM r, tot
""",
)
def pareto_abc_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto / ABC revenue classification — the 80/20 analysis: customers
    ranked by revenue, cumulative share in exact integer micro-units
    (cum * 1e6 div total; class thresholds compared as cross-multiplied
    bigints, no float shares), class A = the head covering 80% of revenue.
    The ordered cumulative window runs over the PER-CUSTOMER aggregate
    (|customers| rows, not facts) — the one global sort this op inherently
    needs; at 100 TB pre-bin by revenue range (range-partitioned cumsum)
    or accept the agg-sized funnel.  Deterministic ties on custkey."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    o = read_testdata(spark, sf_dir, "orders")["orders"]
    per_cust = o.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("cents")
    )
    tot = per_cust.agg(F.sum("cents").cast("bigint").alias("total"))
    w = (
        Window.orderBy(F.desc("cents"), F.asc("o_custkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    r = per_cust.withColumn("cum_cents", F.sum("cents").over(w).cast("bigint"))
    return r.join(F.broadcast(tot)).select(
        "o_custkey",
        "cents",
        "cum_cents",
        F.expr("cum_cents * 1000000 div total").alias("cum_share_micro"),
        F.when(F.expr("cum_cents * 100 <= total * 80"), "A")
        .when(F.expr("cum_cents * 100 <= total * 95"), "B")
        .otherwise("C")
        .alias("abc_class"),
    )


@_q(
    "gini_revenue_concentration",
    """
WITH per_cust AS (
  SELECT o_custkey, CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM orders GROUP BY o_custkey
),
r AS (
  SELECT cents,
         CAST(ROW_NUMBER() OVER (ORDER BY cents, o_custkey) AS BIGINT) AS rnk
  FROM per_cust
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(cents) AS BIGINT) AS total_cents,
       ROUND(CAST(2 * CAST(SUM(rnk * cents) AS BIGINT)
                  - (CAST(COUNT(*) AS BIGINT) + 1) * CAST(SUM(cents) AS BIGINT) AS DOUBLE)
             / CAST(CAST(COUNT(*) AS BIGINT) * CAST(SUM(cents) AS BIGINT) AS DOUBLE), 6) AS gini
FROM r
""",
)
def gini_revenue_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer revenue — the concentration scalar next
    to the Pareto/ABC detail view (also the dedup-cluster / corpus-source
    concentration metric when pointed at those tables): computed with the
    exact rank formula G = (2*sum(i*x_(i)) - (n+1)*sum(x)) / (n*sum(x))
    over ascending-sorted values: the rank-weighted sums are exact
    bigints and only the FINAL scalar ratio is one double division
    (exact-rounded IEEE, identical in both engines; an integer-micro form
    overflows int64 at sum(rank*cents)*1e6).  The rank window runs over the
    per-customer AGGREGATE; ties break on custkey so the rank-weighted sum
    is identical in both engines (sum(rnk*cents) is tie-order-invariant
    anyway: equal cents commute)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    o = read_testdata(spark, sf_dir, "orders")["orders"]
    per_cust = o.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("cents")
    )
    r = per_cust.select(
        "cents",
        F.row_number()
        .over(Window.orderBy(F.asc("cents"), F.asc("o_custkey")))
        .cast("bigint")
        .alias("rnk"),
    )
    return r.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        F.sum("cents").cast("bigint").alias("total_cents"),
        F.expr(
            "ROUND(CAST(2 * CAST(SUM(rnk * cents) AS BIGINT)"
            " - (CAST(COUNT(*) AS BIGINT) + 1) * CAST(SUM(cents) AS BIGINT) AS DOUBLE)"
            " / CAST(CAST(COUNT(*) AS BIGINT) * CAST(SUM(cents) AS BIGINT) AS DOUBLE), 6)"
        ).alias("gini"),
    )
