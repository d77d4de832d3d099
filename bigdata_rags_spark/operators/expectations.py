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


def column_profile(df: DataFrame, numeric_cents: dict[str, Column], strings: list[str]) -> DataFrame:
    """Long-form per-column profile of one snapshot: (column, metric, v)
    with every metric an exact bigint — counts, null counts, exact distinct
    counts, and min/max in integer cents for numeric columns.

    One full-scan aggregate produces all scalar metrics; each distinct
    count is its own partial+final agg (exact here for oracle parity — at
    100 TB swap in approx_count_distinct/HLL sketches, which make the
    profile a single pass; the DRIFT comparison logic is identical).
    """
    metrics = []
    aggs = [F.count(F.lit(1)).cast("bigint").alias("__n")]
    for name, cents in numeric_cents.items():
        aggs += [
            F.sum(F.when(cents.isNull(), 1).otherwise(0)).cast("bigint").alias(f"__null_{name}"),
            F.min(cents).cast("bigint").alias(f"__min_{name}"),
            F.max(cents).cast("bigint").alias(f"__max_{name}"),
        ]
    for name in strings:
        aggs.append(
            F.sum(F.when(F.col(name).isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias(f"__null_{name}")
        )
    base = df.agg(*aggs)

    rows = [("_table", "n_rows", F.col("__n"))]
    for name in numeric_cents:
        rows += [
            (name, "n_null", F.col(f"__null_{name}")),
            (name, "min_cents", F.col(f"__min_{name}")),
            (name, "max_cents", F.col(f"__max_{name}")),
        ]
    for name in strings:
        rows.append((name, "n_null", F.col(f"__null_{name}")))
    stacked = base.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"), F.lit(m).alias("metric"), v.alias("v")
                    )
                    for c, m, v in rows
                ]
            )
        ).alias("e")
    ).select("e.column", "e.metric", "e.v")

    for name in list(numeric_cents) + strings:
        d = (
            df.select(
                (numeric_cents[name] if name in numeric_cents else F.col(name)).alias("x")
            )
            .agg(F.count_distinct(F.col("x")).cast("bigint").alias("v"))
            .select(
                F.lit(name).alias("column"), F.lit("n_distinct").alias("metric"), "v"
            )
        )
        stacked = stacked.unionByName(d)
    return stacked


def drift_report(profile_a: DataFrame, profile_b: DataFrame) -> DataFrame:
    """Join two long-form column profiles and emit per-(column, metric)
    deltas — the snapshot-over-snapshot distribution-drift monitor every
    scheduled pipeline wants before promoting a zone (null-rate spikes,
    range expansion, cardinality collapse).  Full-outer so added/dropped
    columns surface instead of vanishing."""
    a = profile_a.withColumnRenamed("v", "v_prev")
    b = profile_b.withColumnRenamed("v", "v_curr")
    return a.join(b, ["column", "metric"], "full_outer").select(
        "column",
        "metric",
        "v_prev",
        "v_curr",
        (F.coalesce(F.col("v_curr"), F.lit(0)) - F.coalesce(F.col("v_prev"), F.lit(0)))
        .cast("bigint")
        .alias("delta"),
    )
