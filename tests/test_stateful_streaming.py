"""applyInPandasWithState: per-key state must persist ACROSS micro-batches
(the property that distinguishes stateful processing from per-batch aggs)."""

from __future__ import annotations

from bigdata_rags_spark.streaming.events import NS, read_events_stream
from bigdata_rags_spark.streaming.stateful import running_user_totals


def test_state_accumulates_across_batches(spark, tmp_path):
    path = str(tmp_path / "stream")
    schema = "event_id long, ts_ns long, user_id long, event_type string, value double, props string"
    b1 = [(1, 1 * NS, 7, "click", 2.0, ""), (2, 2 * NS, 7, "click", 3.0, ""),
          (3, 3 * NS, 8, "view", 10.0, "")]
    b2 = [(4, 4 * NS, 7, "click", 5.0, "")]
    spark.createDataFrame(b1, schema).coalesce(1).write.mode("overwrite").parquet(path)

    out = running_user_totals(read_events_stream(spark, path))
    q = (
        out.writeStream.format("memory").queryName("t_state")
        .outputMode("update").start()
    )
    try:
        q.processAllAvailable()
        first = {r["user_id"]: r for r in spark.table("t_state").collect()}
        assert first[7]["n_events"] == 2 and first[7]["total_value"] == 5.0
        assert first[8]["n_events"] == 1 and first[8]["max_value"] == 10.0

        spark.createDataFrame(b2, schema).coalesce(1).write.mode("append").parquet(path)
        q.processAllAvailable()
        rows = [r for r in spark.table("t_state").collect() if r["user_id"] == 7]
        latest = max(rows, key=lambda r: r["n_events"])
        # batch 2 folded into persisted state: 2 prior events + 1 new
        assert latest["n_events"] == 3
        assert latest["total_value"] == 10.0
        assert latest["max_value"] == 5.0
    finally:
        q.stop()

def test_sequence_detection_matches_across_batches(spark, tmp_path):
    """detect_sequences must match an A event from batch 1 against a B
    event arriving in batch 2 (state crosses micro-batches), must NOT
    match beyond the window, and a match must consume the pending A."""
    from bigdata_rags_spark.streaming.stateful import detect_sequences

    path = str(tmp_path / "seq_stream")
    schema = "event_id long, ts_ns long, user_id long, event_type string, value double, props string"
    b1 = [
        (1, 10 * NS, 7, "view", 1.0, ""),        # pending A for user 7
        (2, 11 * NS, 7, "click", 1.0, ""),       # irrelevant type
        (3, 10 * NS, 8, "view", 1.0, ""),        # pending A for user 8
        (4, 5000 * NS, 9, "purchase", 1.0, ""),  # B with no prior A: no match
    ]
    b2 = [
        (5, 40 * NS, 7, "purchase", 1.0, ""),      # matches batch-1 A (gap 30s)
        (6, 90 * NS, 7, "purchase", 1.0, ""),      # A consumed: no second match
        (7, 10_000 * NS, 8, "purchase", 1.0, ""),  # beyond 3600s window
    ]
    spark.createDataFrame(b1, schema).coalesce(1).write.mode("overwrite").parquet(path)
    out = detect_sequences(read_events_stream(spark, path), "view", "purchase", 3600)
    q = (
        out.writeStream.format("memory").queryName("t_seq")
        .outputMode("append").start()
    )
    try:
        q.processAllAvailable()
        assert spark.table("t_seq").count() == 0  # no B yet in batch 1
        spark.createDataFrame(b2, schema).coalesce(1).write.mode("append").parquet(path)
        q.processAllAvailable()
        rows = [tuple(r) for r in spark.table("t_seq").collect()]
        assert rows == [(7, 10 * NS, 40 * NS, 30 * NS)], rows
    finally:
        q.stop()


def test_sequence_detection_late_old_a_does_not_regress_pending(spark, tmp_path):
    """A late-arriving OLDER A in a later batch must not overwrite the
    newer pending A: the match must use the event-time-latest A."""
    from bigdata_rags_spark.streaming.stateful import detect_sequences

    path = str(tmp_path / "seq_late")
    schema = "event_id long, ts_ns long, user_id long, event_type string, value double, props string"
    b1 = [(1, 100 * NS, 7, "view", 1.0, "")]
    b2 = [
        (2, 50 * NS, 7, "view", 1.0, ""),       # late, OLDER A
        (3, 120 * NS, 7, "purchase", 1.0, ""),  # must match A@100, gap 20s
    ]
    spark.createDataFrame(b1, schema).coalesce(1).write.mode("overwrite").parquet(path)
    out = detect_sequences(read_events_stream(spark, path), "view", "purchase", 60)
    q = out.writeStream.format("memory").queryName("t_seq_late").outputMode("append").start()
    try:
        q.processAllAvailable()
        spark.createDataFrame(b2, schema).coalesce(1).write.mode("append").parquet(path)
        q.processAllAvailable()
        rows = [tuple(r) for r in spark.table("t_seq_late").collect()]
        assert rows == [(7, 100 * NS, 120 * NS, 20 * NS)], rows
    finally:
        q.stop()
