"""Z-order (Morton-curve) write-layout optimization — the lakehouse
`OPTIMIZE ZORDER BY (a, b)` analog (Delta Lake / Iceberg / Hudi all ship
one; the reference writes unsorted zone parquet, `reference/dag-load.py`).

Why it matters at 100 TB: parquet readers skip row groups via min/max zone
maps, but min/max on an unsorted layout spans the whole domain — nothing
skips.  Sorting by ONE column fixes that column and destroys the other;
interleaving the bits of BOTH dimensions (a Morton key) keeps rows that are
close in EITHER dimension close in the file order, so per-file min/max
stays narrow on BOTH columns and 2-D predicates prune.

Everything here is exact integer arithmetic so a SQL oracle can replay it:
- dimensions are min/max-normalized to 16-bit grid cells with bigint `div`
  (the 1-row min/max aggregate is broadcast — no second scan shuffle);
- the Morton key interleaves the two 16-bit cells with shift-adds (bit
  ranges are disjoint, so SUM == OR — no engine-specific bit ops needed);
- files are fixed-width RANGES of the 32-bit Morton domain (value-range
  buckets), the deterministic stand-in for `repartitionByRange(zkey)` +
  per-partition write that production uses (range partitioning samples at
  runtime and is not replayable; the skipping quality it produces is the
  same and is what the per-file stats measure).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

GRID_BITS = 16


def morton_key(a: Column, b: Column) -> Column:
    """Interleave two GRID_BITS-wide ints: bit i of ``a`` lands at 2i+1,
    bit i of ``b`` at 2i.  Disjoint targets make the shift-add exact."""
    parts = []
    for i in range(GRID_BITS):
        parts.append(
            F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
        parts.append(F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i))
    out = parts[0]
    for p in parts[1:]:
        out = out + p
    return out.cast("bigint")


def zorder_stats(
    df: DataFrame, col_a: str, col_b: str, n_files: int = 64
) -> DataFrame:
    """Per-file zone-map stats under a Z-ordered layout: assign each row's
    Morton key to one of ``n_files`` fixed-width key ranges and report the
    min/max of BOTH dimensions per file — narrow ranges = effective
    data skipping.  One scan + a broadcast 1-row min/max + one
    partial+final agg on the file id."""
    cell_max = (1 << GRID_BITS) - 1
    bounds = df.agg(
        F.min(col_a).cast("bigint").alias("a_lo"),
        F.max(col_a).cast("bigint").alias("a_hi"),
        F.min(col_b).cast("bigint").alias("b_lo"),
        F.max(col_b).cast("bigint").alias("b_hi"),
    )
    cells = (
        df.select(
            F.col(col_a).cast("bigint").alias("a"),
            F.col(col_b).cast("bigint").alias("b"),
        )
        .join(F.broadcast(bounds))
        .select(
            "a",
            "b",
            F.expr(
                f"CASE WHEN a_hi > a_lo THEN (a - a_lo) * {cell_max} div (a_hi - a_lo)"
                " ELSE CAST(0 AS BIGINT) END"
            ).alias("ca"),
            F.expr(
                f"CASE WHEN b_hi > b_lo THEN (b - b_lo) * {cell_max} div (b_hi - b_lo)"
                " ELSE CAST(0 AS BIGINT) END"
            ).alias("cb"),
        )
    )
    width = (1 << (2 * GRID_BITS)) // n_files
    return (
        cells.select(
            "a", "b", morton_key(F.col("ca"), F.col("cb")).alias("zkey")
        )
        .withColumn("file_id", F.expr(f"zkey div {width}").cast("bigint"))
        .groupBy("file_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.min("a").alias("a_min"),
            F.max("a").alias("a_max"),
            F.min("b").alias("b_min"),
            F.max("b").alias("b_max"),
        )
    )
