"""Data-quality expectations: declarative constraint checks with violation
counts (the Deequ / Great-Expectations pattern, public) — the gate a lake
pipeline runs before promoting a zone.

Each check compiles to ONE aggregate expression, so a whole expectation
suite is a single scan with map-side partial aggregation — no per-check
passes, no driver-side row inspection.  Referential checks are a left-anti
join counted in-plan.  Output is one row per check: (check_name, violations,
n_rows, passed) — dimension-sized, cheap to store per batch.

100 TB: one scan per table regardless of how many column checks run on it;
the FK check shuffles only the key column (or broadcasts, when the parent
side is dimension-sized).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _suite(df: DataFrame, checks: dict[str, Column]) -> DataFrame:
    """checks: name -> boolean VIOLATION predicate (true == bad row)."""
    n = F.count(F.lit(1))
    aggs = [
        F.sum(F.when(pred, 1).otherwise(0)).cast("bigint").alias(name)
        for name, pred in checks.items()
    ]
    wide = df.agg(n.cast("bigint").alias("__n"), *aggs)
    # wide (1 row) -> long (one row per check), all in-plan
    pairs = F.array(
        *[
            F.struct(
                F.lit(name).alias("check_name"),
                F.col(name).alias("violations"),
                F.col("__n").alias("n_rows"),
            )
            for name in checks
        ]
    )
    return (
        wide.select(F.explode(pairs).alias("p"))
        .select("p.check_name", "p.violations", "p.n_rows")
        .withColumn(
            "passed", F.when(F.col("violations") == 0, 1).otherwise(0).cast("bigint")
        )
    )


def expect_not_null(col: str) -> Column:
    return F.col(col).isNull()


def expect_in_range(col: str, lo: float, hi: float) -> Column:
    return F.col(col).isNotNull() & ~F.col(col).between(lo, hi)


def expect_in_set(col: str, allowed: list[str]) -> Column:
    return F.col(col).isNotNull() & ~F.col(col).isin(allowed)


def expect_unique(df: DataFrame, col: str) -> DataFrame:
    """Rows participating in a key collision (count > 1 groups), as a
    1-row frame: (check_name, violations, n_rows, passed)."""
    n_rows = df.agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"))
    dups = (
        df.groupBy(col)
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > 1)
        .agg(F.coalesce(F.sum("c"), F.lit(0)).cast("bigint").alias("violations"))
    )
    return (
        dups.crossJoin(F.broadcast(n_rows))
        .select(
            F.lit(f"unique_{col}").alias("check_name"),
            "violations",
            "n_rows",
            F.when(F.col("violations") == 0, 1).otherwise(0).cast("bigint").alias("passed"),
        )
    )


def expect_references(
    child: DataFrame, child_key: str, parent: DataFrame, parent_key: str
) -> DataFrame:
    """Orphaned foreign keys: child rows with no matching parent row."""
    n_rows = child.agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"))
    orphans = (
        child.select(F.col(child_key))
        .join(parent.select(F.col(parent_key).alias(child_key)), child_key, "left_anti")
        .agg(F.count(F.lit(1)).cast("bigint").alias("violations"))
    )
    return (
        orphans.crossJoin(F.broadcast(n_rows))
        .select(
            F.lit(f"fk_{child_key}").alias("check_name"),
            "violations",
            "n_rows",
            F.when(F.col("violations") == 0, 1).otherwise(0).cast("bigint").alias("passed"),
        )
    )


def expectation_suite(df: DataFrame, checks: dict[str, Column]) -> DataFrame:
    """Run all column-level checks in one scan; see ``_suite``."""
    return _suite(df, checks)
