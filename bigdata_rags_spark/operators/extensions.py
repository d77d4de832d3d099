"""Operators beyond plain relational algebra: as-of joins and range joins.

These are the time-series-style joins the reference lacks entirely
(SURVEY.md §2.4 absence list) but any analytics engine needs; both are
expressed as compositions of existing DataFrame ops so Catalyst plans them
(no custom physical operators needed).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    on: str | None,
    left_time: str,
    right_time: str,
    tolerance: Column | None = None,
    direction: str = "backward",
    tie_breaker: str | None = None,
) -> DataFrame:
    """As-of join: for every left row (uniquely identified by ``left_key``),
    attach the single right row with the greatest ``right_time <=
    left_time`` (direction="backward"; "forward" symmetric), optionally
    within ``tolerance`` and per equality key ``on``.

    Plan shape: equi-join on the key (shuffle/broadcast as Catalyst picks)
    with the time inequality as a join predicate, then a per-left-row
    window (partitioned by ``left_key``) keeps the closest match.  The
    fan-out before the window is bounded by matches-per-key; for dense
    right sides at extreme scale, pre-bucket ``right`` by time range first.
    ``tie_breaker`` (a unique right column) makes equal-time matches
    deterministic.  Left rows with no match survive with NULL right columns
    (left-join semantics, like pandas merge_asof).
    """
    lt, rt = F.col(left_time), F.col(right_time)
    if direction == "backward":
        cond = rt <= lt
        closeness = [rt.desc_nulls_last()]
    elif direction == "forward":
        cond = rt >= lt
        closeness = [rt.asc_nulls_last()]
    else:
        raise ValueError(f"direction must be backward/forward, got {direction!r}")
    if tolerance is not None:
        cond = cond & (F.abs(lt - rt) <= tolerance)

    right_side = right
    if on is not None:
        right_side = right.withColumnRenamed(on, f"__r_{on}")
        cond = (F.col(on) == F.col(f"__r_{on}")) & cond

    joined = left.join(right_side, cond, "left")
    order = closeness + (
        [F.col(tie_breaker).asc_nulls_last()] if tie_breaker else []
    )
    w = Window.partitionBy(left_key).orderBy(*order)
    out = (
        joined.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    if on is not None:
        out = out.drop(f"__r_{on}")
    return out


def range_join(
    left: DataFrame,
    right: DataFrame,
    equi: Column,
    lower: Column,
    upper: Column,
) -> DataFrame:
    """Equi + range (band) join: rows pair when the equality key matches AND
    the range predicate holds.  With the equi key present, Catalyst plans a
    hash join with the band condition as a post-filter — no cartesian."""
    return left.join(right, equi & lower & upper)
