"""Custom stateful streaming operators via ``applyInPandasWithState``.

The built-in windowed aggregations (streaming/events.py) cover time-bucketed
state; this module is the arbitrary-state path: a per-key accumulator that
survives across micro-batches — running totals, per-user counters, custom
session logic — expressed as an Arrow-batched pandas function with explicit
GroupState.  This is the Spark-native equivalent of a keyed stateful process
function.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

RUNNING_OUTPUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("max_value", DoubleType()),
    ]
)

RUNNING_STATE = StructType(
    [
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("max_value", DoubleType()),
    ]
)


def _update_running(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Fold each micro-batch's rows for one user into the persisted
    accumulator and emit the updated running totals."""
    n, total, mx = state.get if state.exists else (0, 0.0, float("-inf"))
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        if len(pdf):
            mx = max(mx, float(pdf["value"].max()))
    state.update((n, total, mx))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [round(total, 6)],
            "max_value": [mx],
        }
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running (count, sum, max) over an event stream; state lives
    in the state store and accumulates across micro-batches.  Output mode:
    update (one refreshed row per touched user per batch)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_running,
        outputStructType=RUNNING_OUTPUT,
        stateStructType=RUNNING_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


SEQUENCE_OUTPUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("first_ts_ns", LongType()),
        StructField("then_ts_ns", LongType()),
        StructField("gap_ns", LongType()),
    ]
)

SEQUENCE_STATE = StructType([StructField("first_ts_ns", LongType())])


def detect_sequences(
    events: DataFrame,
    first_type: str = "view",
    then_type: str = "purchase",
    within_sec: int = 3600,
) -> DataFrame:
    """CEP-style A-then-B pattern detection per user: emit a match whenever
    a ``then_type`` event arrives within ``within_sec`` of the latest
    unmatched ``first_type`` event — the keyed pattern-match primitive
    (fraud sequences, conversion paths) that windowed aggregations cannot
    express because the match depends on ORDER and on state that may span
    micro-batch boundaries.

    State per user = one i64 (the pending A timestamp): latest A wins, a
    matching B consumes it — O(1) state per key regardless of stream
    length, the property that survives 100 TB/day.  Rows are folded in
    event-time order inside each batch; production deployments add an
    event-time timeout sized to ``within_sec`` so abandoned A-states age
    out with the watermark (NoTimeout here keeps the operator minimal —
    state is one long either way)."""
    within_ns = int(within_sec) * 1_000_000_000

    def update(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        pending = state.get[0] if state.exists else None
        matches: list[tuple[int, int, int, int]] = []
        chunks = [p for p in pdfs if len(p)]
        if not chunks:  # timeout-only invocation: nothing to fold
            return
        rows = pd.concat(chunks, ignore_index=True).sort_values(["ts_ns", "event_id"])
        for ts_ns, etype in zip(rows["ts_ns"], rows["event_type"]):
            ts_ns = int(ts_ns)
            if etype == first_type:
                # latest unmatched A by EVENT TIME wins: a late-arriving
                # older A must not overwrite a newer pending A from a
                # previous micro-batch
                pending = ts_ns if pending is None else max(pending, ts_ns)
            elif etype == then_type and pending is not None:
                gap = ts_ns - pending
                if 0 <= gap <= within_ns:
                    matches.append((key[0], pending, ts_ns, gap))
                    pending = None  # a match consumes the A
        if pending is None:
            state.remove()
        else:
            state.update((pending,))
        if matches:
            yield pd.DataFrame(
                matches, columns=["user_id", "first_ts_ns", "then_ts_ns", "gap_ns"]
            )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=SEQUENCE_OUTPUT,
        stateStructType=SEQUENCE_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def detect_sequences_batch(
    events: "DataFrame",
    first_type: str = "view",
    then_type: str = "purchase",
    within_sec: int = 3600,
) -> "DataFrame":
    """Batch form of ``detect_sequences`` — the same match semantics as pure
    window functions, no state store (VERDICT r6 #2).  Output contract is
    identical (user_id, first_ts_ns, then_ts_ns, gap_ns).

    Equivalence to the stateful fold (events processed per user in
    (ts_ns, event_id) order): a B event matches iff the latest preceding A
    is NEWER than every preceding B ("A-after-last-B") and within the
    window.  Proof sketch that this equals latest-unmatched-A-with-
    consumption: (i) if the fold matches B, its pending A is the globally
    latest preceding A and postdates the last consuming B; any unmatched B
    between that A and this B would have failed only on the window test
    against the SAME A, and this B's gap to it is larger — contradiction,
    so no B separates them and A-after-last-B holds.  (ii) if
    A-after-last-B holds with gap <= window, that A postdates every prior
    consuming B, so it is exactly the fold's pending A and the fold
    matches.  Consumption falls out of (i): after a match, the next B sees
    last-B >= the matched B > its latest A until a fresh A arrives.

    All integer epoch-ns math; ordering ties break on event_id, so the
    result is deterministic under any partitioning.  Scale shape: one
    window shuffle on user_id shared by all four window expressions —
    no self-join, no state.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    within_ns = int(within_sec) * 1_000_000_000
    e = events.filter(
        F.col("event_type").isin(first_type, then_type)
    ).select("user_id", "event_id", "ts_ns", "event_type")
    order = Window.partitionBy("user_id").orderBy("ts_ns", "event_id")
    r = e.withColumn("rn", F.row_number().over(order))
    prec = order.rowsBetween(Window.unboundedPreceding, -1)
    is_a = F.col("event_type") == first_type
    is_b = F.col("event_type") == then_type
    s = r.select(
        "user_id",
        "ts_ns",
        "event_type",
        F.max(F.when(is_a, F.col("rn"))).over(prec).alias("la_rn"),
        F.max(F.when(is_a, F.col("ts_ns"))).over(prec).alias("la_ns"),
        F.max(F.when(is_b, F.col("rn"))).over(prec).alias("lb_rn"),
    )
    return s.filter(
        is_b
        & F.col("la_rn").isNotNull()
        & (F.col("lb_rn").isNull() | (F.col("la_rn") > F.col("lb_rn")))
        & (F.col("ts_ns") - F.col("la_ns") <= F.lit(within_ns))
    ).select(
        "user_id",
        F.col("la_ns").alias("first_ts_ns"),
        F.col("ts_ns").alias("then_ts_ns"),
        (F.col("ts_ns") - F.col("la_ns")).alias("gap_ns"),
    )


DEBOUNCE_OUTPUT = StructType(
    [
        StructField("event_id", LongType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("ts_ns", LongType()),
    ]
)

DEBOUNCE_STATE = StructType([StructField("last_ts_ns", LongType())])


def _debounce_update(gap_ns: int):
    def update(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        pdf = pd.concat(list(pdfs), ignore_index=True)
        pdf = pdf.sort_values(["ts_ns", "event_id"])
        last = state.get[0] if state.exists else None
        keep = []
        for eid, ns in zip(pdf["event_id"].tolist(), pdf["ts_ns"].tolist()):
            if last is None or ns - last > gap_ns:
                keep.append(eid)
            # every event refreshes the suppression window — but MONOTONE:
            # a late-arriving OLDER event must not rewind the window edge
            # and re-open suppression (the detect_sequences late-A guard)
            last = max(last, int(ns)) if last is not None else int(ns)
        state.update((last,))
        out = pdf[pdf["event_id"].isin(keep)]
        yield pd.DataFrame(
            {
                "event_id": out["event_id"].tolist(),
                "user_id": [key[0]] * len(out),
                "event_type": [key[1]] * len(out),
                "ts_ns": out["ts_ns"].tolist(),
            }
        )

    return update


def debounce_events(events: DataFrame, gap_sec: int = 60) -> DataFrame:
    """Stateful debounce/throttle dedup per (user_id, event_type): an event
    is emitted only if MORE than ``gap_sec`` passed since the previous
    event of the same key — and every event (kept or suppressed) refreshes
    the suppression window, the classic debounce contract (a burst emits
    only its first event, no matter how long it lasts).  The dedup sibling
    of ``dropDuplicatesWithinWatermark`` for the rapid-fire/retry-storm
    shape where payloads differ but the key repeating inside the gap IS
    the duplicate signal.

    O(1) state per key (one bigint timestamp) surviving across
    micro-batches; within a batch rows fold in (ts_ns, event_id) order so
    output is deterministic.  Output mode: append (kept events only).
    Equivalence with the batch LAG twin holds when arrival order respects
    event time across micro-batches (the replay/file-stream case); under
    LATE data the stream keeps the guarantee that matters operationally —
    the window edge is monotone (a late older event never re-opens
    suppression; it can only be suppressed itself) — while the batch form
    retroactively re-sorts, which no online operator can replay exactly.
    ``transformWithStateInPandas`` would express the same processor with
    native state TTL on Spark 4.1+, but its python worker needs protobuf,
    which this environment lacks — ``applyInPandasWithState`` carries the
    identical semantics.
    """
    return events.groupBy("user_id", "event_type").applyInPandasWithState(
        _debounce_update(gap_sec * 1_000_000_000),
        outputStructType=DEBOUNCE_OUTPUT,
        stateStructType=DEBOUNCE_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def debounce_events_batch(events: DataFrame, gap_sec: int = 60) -> DataFrame:
    """Batch form of ``debounce_events`` (the oracle-checkable twin): one
    LAG window per (user_id, event_type) ordered by (ts_ns, event_id) —
    kept iff first in key or the gap from the PREVIOUS event (kept or not)
    exceeds gap_sec.  Same rows as the streamed form's union of batches."""
    from pyspark.sql import Window

    import pyspark.sql.functions as F

    w = Window.partitionBy("user_id", "event_type").orderBy("ts_ns", "event_id")
    prev = F.lag("ts_ns").over(w)
    return (
        events.withColumn("__prev", prev)
        .filter(
            F.col("__prev").isNull()
            | (F.col("ts_ns") - F.col("__prev") > gap_sec * 1_000_000_000)
        )
        .select("event_id", "user_id", "event_type", "ts_ns")
    )
