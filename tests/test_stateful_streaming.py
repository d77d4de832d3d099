"""applyInPandasWithState: per-key state must persist ACROSS micro-batches
(the property that distinguishes stateful processing from per-batch aggs)."""

from __future__ import annotations

import pytest

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

@pytest.mark.slow  # ~16 s measured r17
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


def _write_time_split_batches(spark, path, batches):
    schema = "event_id long, ts_ns long, user_id long, event_type string, value double, props string"
    spark.createDataFrame(batches[0], schema).coalesce(1).write.mode("overwrite").parquet(path)
    for b in batches[1:]:
        spark.createDataFrame(b, schema).coalesce(1).write.mode("append").parquet(path)


@pytest.mark.slow  # ~23 s measured r17
def test_cep_batch_form_equals_stream_across_batches(spark, tmp_path):
    """detect_sequences_batch (the window-function form behind the
    events_cep_view_purchase driver query) must emit EXACTLY the rows the
    stateful stream emits when micro-batches arrive in event-time order —
    consumption, latest-A-wins, window expiry, same-ts ties, and
    back-to-back re-arming all planted."""
    from bigdata_rags_spark.streaming.stateful import (
        detect_sequences,
        detect_sequences_batch,
    )

    path = str(tmp_path / "cep_eq")
    b1 = [
        (1, 10 * NS, 7, "view", 1.0, ""),
        (2, 11 * NS, 7, "click", 1.0, ""),    # irrelevant type interleaved
        (3, 10 * NS, 8, "view", 1.0, ""),
        (4, 10 * NS, 10, "view", 1.0, ""),
        (5, 20 * NS, 10, "purchase", 1.0, ""),   # match, then re-arm below
        (6, 50 * NS, 11, "view", 1.0, ""),
        (7, 50 * NS, 11, "purchase", 1.0, ""),   # same-ts tie: A sorts first -> gap 0
    ]
    b2 = [
        (8, 40 * NS, 7, "purchase", 1.0, ""),    # matches batch-1 A across batches
        (9, 90 * NS, 7, "purchase", 1.0, ""),    # A consumed: no second match
        (10, 100 * NS, 7, "view", 1.0, ""),
        (11, 110 * NS, 7, "view", 1.0, ""),      # latest A wins
        (12, 5000 * NS, 9, "purchase", 1.0, ""), # no prior A: no match
        (13, 30 * NS, 10, "view", 1.0, ""),
    ]
    b3 = [
        (14, 120 * NS, 7, "purchase", 1.0, ""),  # matches A@110
        (15, 10000 * NS, 8, "purchase", 1.0, ""),  # beyond 3600s window
        (16, 40 * NS, 10, "purchase", 1.0, ""),  # second match after re-arm
    ]
    _write_time_split_batches(spark, path, [b1, b2, b3])

    out = detect_sequences(read_events_stream(spark, path), "view", "purchase", 3600)
    q = out.writeStream.format("memory").queryName("t_cep_eq").outputMode("append").start()
    try:
        q.processAllAvailable()
        stream_rows = sorted(tuple(r) for r in spark.table("t_cep_eq").collect())
    finally:
        q.stop()

    batch_df = spark.read.parquet(path)
    from bigdata_rags_spark.streaming.events import _normalize_events

    batch_rows = sorted(
        tuple(r)
        for r in detect_sequences_batch(
            _normalize_events(batch_df), "view", "purchase", 3600
        ).collect()
    )
    assert stream_rows == batch_rows, (stream_rows, batch_rows)
    expected = [
        (7, 10 * NS, 40 * NS, 30 * NS),
        (7, 110 * NS, 120 * NS, 10 * NS),
        (10, 10 * NS, 20 * NS, 10 * NS),
        (10, 30 * NS, 40 * NS, 10 * NS),
        (11, 50 * NS, 50 * NS, 0),
    ]
    assert batch_rows == sorted(expected), batch_rows


def test_cep_registered_query_runs_on_planted_zone(spark, tmp_path):
    """The registered driver query applied to a planted events.parquet zone
    (bigint ts path of the type-adaptive reader) reproduces the library
    function's rows."""
    from bigdata_rags_spark.queries.catalog import REGISTRY

    path = str(tmp_path / "events.parquet")
    rows = [
        (1, 10 * NS, 7, "view", 1.0, ""),
        (2, 40 * NS, 7, "purchase", 1.0, ""),
        (3, 90 * NS, 7, "purchase", 1.0, ""),
    ]
    schema = "event_id long, ts_ns long, user_id long, event_type string, value double, props string"
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(path)
    got = sorted(
        tuple(r)
        for r in REGISTRY["events_cep_view_purchase"].spark(spark, str(tmp_path)).collect()
    )
    assert got == [(7, 10 * NS, 40 * NS, 30 * NS)], got


def test_running_totals_batch_final_rows_equal_stream_state(spark, tmp_path):
    """events_running_user_totals' LAST row per user must equal the stateful
    stream's final accumulated state (count/sum/max), across micro-batch
    boundaries.  Values are exact cents on both sides."""
    from bigdata_rags_spark.queries.catalog import REGISTRY

    zone = tmp_path / "rt"
    path = str(zone / "events.parquet")
    b1 = [(1, 1 * NS, 7, "click", 2.25, ""), (2, 2 * NS, 7, "click", 3.5, ""),
          (3, 3 * NS, 8, "view", 10.0, "")]
    b2 = [(4, 4 * NS, 7, "click", 5.0, ""), (5, 5 * NS, 8, "view", -1.25, "")]
    _write_time_split_batches(spark, path, [b1, b2])

    out = running_user_totals(read_events_stream(spark, path))
    q = out.writeStream.format("memory").queryName("t_rt_eq").outputMode("update").start()
    try:
        q.processAllAvailable()
        final = {}
        for r in spark.table("t_rt_eq").collect():
            if r["user_id"] not in final or r["n_events"] > final[r["user_id"]]["n_events"]:
                final[r["user_id"]] = r
    finally:
        q.stop()

    batch = REGISTRY["events_running_user_totals"].spark(spark, str(zone))
    last = {}
    for r in batch.collect():
        if r["user_id"] not in last or r["n_events"] > last[r["user_id"]]["n_events"]:
            last[r["user_id"]] = r
    assert set(last) == set(final)
    for uid, b in last.items():
        s = final[uid]
        assert b["n_events"] == s["n_events"]
        assert b["total_cents"] == round(s["total_value"] * 100)
        assert b["max_cents"] == round(s["max_value"] * 100)
    assert last[7]["total_cents"] == 1075 and last[7]["max_cents"] == 500
    assert last[8]["total_cents"] == 875 and last[8]["max_cents"] == 1000


def test_debounce_stream_equals_batch_and_refreshes_window(spark, tmp_path):
    """Debounce semantics across micro-batches: suppressed events still
    refresh the window (a burst spanning batches emits only its first
    event), independent keys don't interact, and the streamed output
    equals the batch LAG form over the full event set."""
    from bigdata_rags_spark.streaming.stateful import (
        debounce_events,
        debounce_events_batch,
    )

    path = str(tmp_path / "deb_stream")
    schema = "event_id long, ts_ns long, user_id long, event_type string, value double, props string"
    # user 7 'click': burst at 0/30/59s then 130s (gap from 59s is 71s > 60)
    b1 = [
        (1, 0 * NS, 7, "click", 1.0, ""),
        (2, 30 * NS, 7, "click", 1.0, ""),   # suppressed, refreshes window
        (3, 10 * NS, 7, "view", 1.0, ""),    # different key: kept
        (4, 0 * NS, 8, "click", 1.0, ""),    # different user: kept
    ]
    b2 = [
        (5, 59 * NS, 7, "click", 1.0, ""),   # 29s after event 2: suppressed
        (6, 130 * NS, 7, "click", 1.0, ""),  # 71s after event 5: kept
        (7, 61 * NS, 8, "click", 1.0, ""),   # 61s after event 4: kept
    ]
    spark.createDataFrame(b1, schema).coalesce(1).write.mode("overwrite").parquet(path)
    out = debounce_events(read_events_stream(spark, path), gap_sec=60)
    q = (
        out.writeStream.format("memory").queryName("t_deb")
        .outputMode("append").start()
    )
    try:
        q.processAllAvailable()
        spark.createDataFrame(b2, schema).coalesce(1).write.mode("append").parquet(path)
        q.processAllAvailable()
        streamed = sorted(r["event_id"] for r in spark.table("t_deb").collect())
    finally:
        q.stop()
    assert streamed == [1, 3, 4, 6, 7], streamed
    full = spark.createDataFrame(b1 + b2, schema)
    batch = sorted(r["event_id"] for r in debounce_events_batch(full, 60).collect())
    assert batch == streamed


def test_debounce_late_event_does_not_reopen_window(spark, tmp_path):
    """A late-arriving OLDER event must not rewind the suppression window:
    it is suppressed itself and subsequent in-gap events stay suppressed
    (without the monotone guard, state would regress to the late ts and
    re-emit the in-gap event)."""
    from bigdata_rags_spark.streaming.stateful import debounce_events

    path = str(tmp_path / "deb_late")
    schema = "event_id long, ts_ns long, user_id long, event_type string, value double, props string"
    b1 = [(1, 1000 * NS, 7, "click", 1.0, "")]
    b2 = [
        (2, 0 * NS, 7, "click", 1.0, ""),     # LATE: suppressed, must not rewind
        (3, 1005 * NS, 7, "click", 1.0, ""),  # 5s after event 1: stays suppressed
    ]
    spark.createDataFrame(b1, schema).coalesce(1).write.mode("overwrite").parquet(path)
    out = debounce_events(read_events_stream(spark, path), gap_sec=60)
    q = (
        out.writeStream.format("memory").queryName("t_deb_late")
        .outputMode("append").start()
    )
    try:
        q.processAllAvailable()
        spark.createDataFrame(b2, schema).coalesce(1).write.mode("append").parquet(path)
        q.processAllAvailable()
        got = sorted(r["event_id"] for r in spark.table("t_deb_late").collect())
    finally:
        q.stop()
    assert got == [1], got
