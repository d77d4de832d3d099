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