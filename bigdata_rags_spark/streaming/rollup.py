"""Multi-resolution rollup cascade — hypertable-style continuous aggregates.

The reference has no time-series rollup surface (its transform DAG is a
one-shot pandas pass, `reference/dag-transform.py`; SURVEY.md §2.4), but any
events pipeline at scale needs one: serve day-level dashboards by merging
hour partials, hour partials by merging minute partials — never by
rescanning raw events.  The whole design rests on the partials being a
MERGEABLE aggregate algebra (Agarwal et al., "Mergeable Summaries", PODS'12):

    n_events   -> SUM        sum_cents -> SUM (exact bigint, no float drift)
    min_cents  -> MIN        max_cents -> MAX
    n_buckets  -> SUM        (finer buckets merged so far)

Every op is associative + commutative, so ``merge_up`` is the SAME function
for hour-from-minute, day-from-hour, re-merging after a stream restart, or
compacting late-arriving partials — and the cascade provably equals a direct
aggregation of the raw events (the registered query's DuckDB oracle checks
exactly that equality).

100 TB shape: the raw-event scan happens ONCE (minute level, partial+final
hash agg); every coarser level aggregates ~60x fewer rows than the one
below it, so the cascade's total cost is the finest level + a geometric
tail.  Partials are (key, 5 bigints) — the exchanges after level 0 ship
kilobytes per key, not events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

NS_PER_MINUTE = 60_000_000_000


def minute_partials(ev: DataFrame) -> DataFrame:
    """Finest-grain partials straight off the raw stream: one row per
    (event_type, epoch-minute) carrying the mergeable algebra above.
    ``value`` enters as exact integer cents so every later SUM is bigint.

    Expects the ``ts_ns`` column `read_events_batch` derives.
    """
    return (
        ev.select(
            "event_type",
            F.expr(f"ts_ns div {NS_PER_MINUTE}").alias("bucket"),
            F.round(F.col("value") * 100).cast("bigint").alias("v_cents"),
        )
        .groupBy("event_type", "bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum("v_cents").cast("bigint").alias("sum_cents"),
            F.min("v_cents").alias("min_cents"),
            F.max("v_cents").alias("max_cents"),
        )
        .withColumn("n_buckets", F.lit(1).cast("bigint"))
    )


def merge_up(partials: DataFrame, ratio: int) -> DataFrame:
    """Merge partials into buckets ``ratio``x coarser using ONLY the partial
    columns — never the raw events.  Associativity makes this the single
    merge operator for every level of the cascade and for incremental
    re-merges (restart, late partials, backfill)."""
    return (
        partials.withColumn("bucket", F.expr(f"bucket div {ratio}"))
        .groupBy("event_type", "bucket")
        .agg(
            F.sum("n_events").cast("bigint").alias("n_events"),
            F.sum("sum_cents").cast("bigint").alias("sum_cents"),
            F.min("min_cents").alias("min_cents"),
            F.max("max_cents").alias("max_cents"),
            F.sum("n_buckets").cast("bigint").alias("n_buckets"),
        )
    )
