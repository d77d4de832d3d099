"""Deterministic hash-based sampling (exact, reproducible, join-free).

``DataFrame.sample``/``sampleBy`` draw from an RNG seeded per-partition, so
results change under repartitioning and cannot be replayed by another engine.
For training-data pipelines the sample must be REPRODUCIBLE (same rows on
every run, every engine, any partitioning) — so we derive a uniform bucket
from ``md5(salt || ':' || key)`` and keep rows whose bucket clears the
stratum's threshold.  Same idiom as the train/val/test split
(``queries/llm_ops.py::train_test_split_assignment``).

100 TB design: pure row-local column expressions — no shuffle, no join, no
RNG state; filters push down to the scan when keys are scan columns.
Thresholds are integers out of 10_000 (md5 % 10000), so an exact DuckDB
oracle exists and fraction resolution is 0.01%.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BUCKETS = 10_000


def hash_bucket(key: Column, salt: str) -> Column:
    """Deterministic uniform bucket in [0, 10000) from md5 of salt:key."""
    h = F.md5(F.concat(F.lit(f"{salt}:"), key.cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") % BUCKETS


def hash_sample(df: DataFrame, key: Column, fraction: float, salt: str = "s0") -> DataFrame:
    """Keep ~``fraction`` of rows, deterministically by key hash."""
    return df.filter(hash_bucket(key, salt) < int(round(fraction * BUCKETS)))


def stratified_hash_sample(
    df: DataFrame,
    key: Column,
    strata: Column,
    fractions: dict[str, float],
    *,
    default_fraction: float = 0.0,
    salt: str = "s0",
) -> DataFrame:
    """Per-stratum deterministic sampling (``sampleBy`` semantics, replayable).

    ``fractions`` maps stratum value -> keep fraction; strata not listed get
    ``default_fraction``.  The keep decision depends only on (salt, key,
    stratum fraction) — independent of partitioning, row order, and engine.
    """
    threshold = F.lit(int(round(default_fraction * BUCKETS)))
    for value, frac in sorted(fractions.items()):
        threshold = F.when(strata == value, int(round(frac * BUCKETS))).otherwise(threshold)
    return df.withColumn("sample_bucket", hash_bucket(key, salt)).filter(
        F.col("sample_bucket") < threshold
    )
