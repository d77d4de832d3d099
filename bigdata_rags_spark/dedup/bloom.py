"""Broadcast Bloom-filter prefilter for incremental dedup.

`dedup/exact.py:incremental_new_keepers` dedups a new batch against history
with a hash anti-join — correct, but at 100 TB the history side of that join
is the whole corpus's hash set shuffled every ingest.  The standard fix is a
Bloom filter built ONCE over history and broadcast (KBs-MBs): batch docs
whose bits are not all set are PROVABLY novel and skip the join entirely;
only the bloom-positive sliver (true dups + the tuned false-positive rate)
reaches the exact verify join.  Spark's own `bloomFilter`/runtime filters
are engine-private (not oracle-replayable), so this one is deterministic
md5 bit math an external engine can recompute bit-for-bit.

Layout: m bits packed as 32-bit words stored in BIGINTs (bit index < 2^31 —
no sign games in either engine), j hash probes per key derived from
md5("bf{i}#" || key).  Build = explode j bits -> groupBy word -> BIT_OR —
a partial+final agg producing <= m/32 rows regardless of corpus size; the
filter is mergeable across sources/batches by the same BIT_OR.

The reference's load DAG re-ingests blindly (`reference/dag-load.py` has no
dedup gate at all); this is the gate you'd want in front of it at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

M_BITS = 4096
WORD = 32
N_HASH = 3


def _bit_position(i: int, key) -> "F.Column":
    """Probe-i bit position in [0, M_BITS) for a string key."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"bf{i}#"), key)), 1, 8), 16, 10
        ).cast("bigint")
        % M_BITS
    )


def _bit_rows(df: DataFrame, key_col: str) -> DataFrame:
    """One row per (input row, probe): word index + bit-within-word."""
    probes = F.explode(
        F.array(*[_bit_position(i, F.col(key_col)) for i in range(N_HASH)])
    ).alias("bitp")
    return df.select("*", probes).select(
        *df.columns,
        F.expr(f"bitp div {WORD}").alias("w"),
        (F.col("bitp") % WORD).cast("int").alias("b"),
    )


def bloom_build(keys: DataFrame, key_col: str) -> DataFrame:
    """(w, mask) words of the filter over the DISTINCT keys — <= M_BITS/WORD
    rows, mergeable across builds with another BIT_OR on w."""
    return (
        _bit_rows(keys.select(key_col).distinct(), key_col)
        .groupBy("w")
        .agg(F.expr("bit_or(shiftleft(CAST(1 AS BIGINT), b))").alias("mask"))
    )


def bloom_probe(batch: DataFrame, key_col: str, words: DataFrame) -> DataFrame:
    """batch + ``bloom_maybe`` (1 = all probe bits set; 0 = provably novel).
    ``words`` is broadcast — the probe is a map-side join, no shuffle of the
    batch beyond the per-doc regroup."""
    bits = _bit_rows(batch, key_col)
    hit = F.when(
        F.col("mask").isNotNull()
        & (F.expr("shiftright(mask, b) & CAST(1 AS BIGINT)") == 1),
        1,
    ).otherwise(0)
    per_probe = bits.join(F.broadcast(words), "w", "left").select(
        *batch.columns, hit.alias("hit")
    )
    return per_probe.groupBy(*batch.columns).agg(
        F.min("hit").cast("bigint").alias("bloom_maybe")
    )
