"""Skew mitigation: salted joins (explicit) alongside AQE skew-join (automatic).

AQE's skew-join splitting (on by default in session.py) handles most skew by
subdividing oversized shuffle partitions at runtime.  ``salted_join`` is the
explicit fallback for the cases AQE can't fix — e.g. a single hot key on the
BUILD side of a non-broadcastable join, or pre-AQE engines: the hot side's
keys are salted with a random shard id, the other side is replicated across
all shards, so one key's rows spread over ``num_salts`` reducers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    key: str,
    num_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``skewed ⋈ other`` on ``key`` with the skewed side salted.

    ``skewed`` gets a uniform shard in [0, num_salts); ``other`` is exploded
    num_salts times (one copy per shard) — correct for any join type whose
    null-extension happens on the skewed side (inner/left with skewed as
    left).  Join keys become (key, salt), so a hot key's rows land on
    num_salts reducers instead of one.

    The salt uses a deterministic spread (xxhash64 of the whole row modulo
    shards) rather than rand() so retried tasks produce identical output —
    nondeterministic salts break Spark's task-retry model.
    """
    salt = (
        F.abs(F.xxhash64(*[F.col(c) for c in skewed.columns])) % num_salts
    ).cast("int")
    s = skewed.withColumn("__salt", salt)
    o = other.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(num_salts)]))
    )
    return s.join(o, [key, "__salt"], how).drop("__salt")
