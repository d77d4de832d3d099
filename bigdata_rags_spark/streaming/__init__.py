"""Structured Streaming surface over the events stream."""

from bigdata_rags_spark.streaming.events import (
    read_events_batch,
    read_events_stream,
    session_agg,
    sliding_agg,
    tumbling_agg,
)

__all__ = [
    "read_events_batch",
    "read_events_stream",
    "session_agg",
    "sliding_agg",
    "tumbling_agg",
]
