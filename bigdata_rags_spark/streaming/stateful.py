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
