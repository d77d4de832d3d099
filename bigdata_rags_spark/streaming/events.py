"""Event-stream operators: one transform definition, two execution modes.

The reference has no streaming surface at all (SURVEY.md §2.4); the driver's
``events`` table adds it.  Design rule: every windowed aggregation is written
as a pure ``DataFrame -> DataFrame`` function that works identically on a
batch frame and a ``readStream`` frame — Structured Streaming's contract —
so correctness is oracle-checked in batch (driver/DuckDB) and the streaming
execution path is tested with real micro-batches in pytest.

Timestamp discipline: the batch reader is TYPE-ADAPTIVE because the driver
fixture has shipped the ``ts`` column as both parquet ``timestamp[ns]``
(which Spark reads as BIGINT epoch-ns under
``spark.sql.legacy.parquet.nanosAsLong=true``, set per-session here) and
``timestamp[us]`` (which Spark reads as a real TIMESTAMP / TIMESTAMP_NTZ —
``nanosAsLong`` is inert on µs columns).  Whatever the physical type, the
reader normalizes to the same two-column contract every downstream operator
uses: exact integer epoch nanoseconds ``ts_ns`` (bit-exact, timezone-free,
mirrors DuckDB's ``epoch_ns``) plus a wall-clock ``ts`` rebuilt at
microsecond precision via ``timestamp_micros`` for Spark's native
window/session_window operators (epoch-aligned, tz-independent).  The NTZ →
ns conversion uses ``timestampdiff`` against the NTZ epoch literal, which is
pure integer math on naive timestamps — no session-timezone dependency.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from bigdata_rags_spark.io.maintenance import _hadoop_fs

NS = 1_000_000_000

EVENTS_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts_ns", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def _with_ts(df: DataFrame) -> DataFrame:
    """Attach microsecond wall-clock ts (for window operators) to the exact
    integer ``ts_ns``."""
    return df.withColumn("ts", F.timestamp_micros(F.expr(f"ts_ns div 1000")))


def read_events_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch source: type-adaptive read + derived ``ts_ns``/``ts`` columns.

    Handles every physical type the driver fixture has used for ``ts``:

    - ``bigint`` — parquet ``timestamp[ns]`` read under ``nanosAsLong``
      (historical fixtures) or a pre-derived long column: already epoch-ns,
      just rename.
    - ``timestamp_ntz`` — parquet ``timestamp[us]`` (current fixtures,
      ``isAdjustedToUTC=false``): exact epoch-µs via ``timestampdiff``
      against the naive epoch literal (pure NTZ integer math, no session
      timezone involved), then ×1000.
    - ``timestamp`` — µs parquet read as LTZ (e.g. with NTZ inference off):
      ``unix_micros`` is exact epoch-µs regardless of session timezone.

    All three paths then rebuild ``ts`` from ``ts_ns`` via
    ``timestamp_micros`` so downstream window/session operators see the
    identical column type in every environment.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    return _normalize_events(raw)


def _normalize_events(raw: DataFrame) -> DataFrame:
    """Shared batch/stream normalization: whatever physical type ``ts`` (or a
    pre-derived ``ts_ns``) arrived as, emit the stream-schema column order
    with exact bigint epoch-ns ``ts_ns`` plus rebuilt microsecond ``ts``."""
    dtypes = dict(raw.dtypes)
    ts_type = dtypes.get("ts", "bigint" if "ts_ns" in dtypes else None)
    if "ts_ns" in dtypes and "ts" not in dtypes:
        norm = raw
    elif ts_type == "bigint":
        norm = raw.withColumnRenamed("ts", "ts_ns")
    elif ts_type == "timestamp_ntz":
        norm = raw.withColumn(
            "ts_ns",
            F.expr(
                "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
            ).cast("long")
            * F.lit(1000).cast("long"),
        ).drop("ts")
    elif ts_type == "timestamp":
        norm = raw.withColumn(
            "ts_ns", F.unix_micros(F.col("ts")) * F.lit(1000).cast("long")
        ).drop("ts")
    else:  # pragma: no cover - fixture drift guard
        raise TypeError(
            f"events.ts has unsupported type {ts_type!r}; expected bigint, "
            "timestamp_ntz, or timestamp"
        )
    # pin column order to the stream schema so batch and stream frames are
    # interchangeable regardless of which branch produced ts_ns
    return _with_ts(norm.select([f.name for f in EVENTS_STREAM_SCHEMA.fields]))


def read_events_stream(spark: SparkSession, path: str, max_files_per_trigger: int = 1) -> DataFrame:
    """File-source stream with the same column contract as the batch reader.

    ``readStream`` needs the schema up front, so it is probed from the
    existing files with a static reader (footer listing only, no job) and
    the same type-adaptive normalization as ``read_events_batch`` applies —
    streaming the driver's actual ``events.parquet`` directory (µs
    timestamps) and streaming self-written ``ts_ns`` long fixtures both
    work unchanged."""
    import posixpath

    from pyspark.errors import AnalysisException

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try:
        probed = spark.read.parquet(path).schema
    except AnalysisException:
        # empty or not-yet-existing landing directory (the standard
        # files-arrive-later streaming pattern): fall back to the canonical
        # stream schema instead of refusing to start
        probed = EVENTS_STREAM_SCHEMA
    reader = spark.readStream.schema(probed).option(
        "maxFilesPerTrigger", str(max_files_per_trigger)
    )
    # The driver fixture ships events.parquet as a SINGLE FILE, which the
    # file-stream source rejects: for a non-glob path it forces
    # basePath := path and then requires basePath to be a directory.  Turn
    # a single-file path into an exact-match glob so our explicit
    # parent-directory basePath survives — then a directory of part files
    # and a bare file stream identically.  EVERY glob metacharacter in the
    # path is bracket-escaped (ADVICE r5: escaping only the last char left
    # earlier components glob-expandable — a path like ``run[3]/events``
    # could match unintended files); the trailing char is always bracketed
    # so the result is glob-shaped even for metachar-free paths.  A bare
    # filename with no directory component gets basePath "." (the working
    # directory).
    def _escape_glob(s: str) -> str:
        # backslash is Hadoop GlobPattern's escape char ("[c]" classes can't
        # express a literal "]": re2j rejects "[]]" as an unclosed class)
        return "".join("\\" + c if c in "*?{}[]\\" else c for c in s)

    stream_path = path
    fs, jvm = _hadoop_fs(spark, path)
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    if fs.exists(jpath) and fs.getFileStatus(jpath).isFile():
        # bracket the (safe) trailing char so even a metachar-free path is
        # glob-shaped; a metachar trailing char is backslash-escaped, which
        # is glob-shaped already
        last = path[-1]
        tail = f"[{last}]" if last not in "*?{}[]\\" else "\\" + last
        stream_path = _escape_glob(path[:-1]) + tail
        reader = reader.option(
            "basePath", posixpath.dirname(path.rstrip("/")) or "."
        )
    return _normalize_events(reader.parquet(stream_path))


def tumbling_agg(events: DataFrame, width: str = "1 hour", watermark: str | None = None) -> DataFrame:
    """Tumbling-window counts/sums per event type.  Windows are epoch-aligned
    (Spark aligns to 1970-01-01 UTC), so ``unix_timestamp(window.start)`` is
    engine-neutral.  With ``watermark`` set this is a valid append-mode
    streaming aggregation (late rows beyond the watermark are dropped)."""
    src = events.withWatermark("ts", watermark) if watermark else events
    return (
        src.groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
            # avg via integer micro-units: ROUND(avg, 6) ties exactly when
            # n_events is 2^a*5^b (e.g. 32 events -> sum/32 terminates in a
            # decimal 5) and Spark/DuckDB ROUND disagree on ties (seen at
            # sf0.1).  cents*10^4 div n is exact integer math in both
            # engines -> bit-identical 6-decimal truncated average.
            F.round(F.sum("value") * 100, 0).cast("bigint").alias("__cents"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start_sec"),
            "event_type",
            "n_events",
            "total_value",
            (F.expr("__cents * 10000 div n_events") / F.lit(1_000_000.0)).alias(
                "avg_value"
            ),
        )
    )


def sliding_agg(
    events: DataFrame, width: str = "1 hour", slide: str = "30 minutes"
) -> DataFrame:
    """Sliding-window counts (each event lands in width/slide windows)."""
    return (
        events.groupBy(F.window("ts", width, slide).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start_sec"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def stream_to_zone(
    stream_df: DataFrame,
    path: str,
    checkpoint: str,
    mode: str = "update",
):
    """foreachBatch sink: land each micro-batch's output in a parquet zone
    (append), with exactly-once bookkeeping via the checkpoint location +
    batch id.  foreachBatch is the right sink whenever a streaming result
    must feed the same zone layout batch queries read — it reuses the batch
    writer verbatim."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.withColumn("__batch_id", F.lit(batch_id)).write.mode("append").parquet(
            path
        )

    return (
        stream_df.writeStream.foreachBatch(write_batch)
        .outputMode(mode)
        .option("checkpointLocation", checkpoint)
        .start()
    )


def dedupe_events(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Exactly-once event dedup by ``event_id`` — same definition, two modes.

    Streaming: ``dropDuplicatesWithinWatermark`` keeps the dedup state
    BOUNDED — ids older than the watermark are evicted, so state is O(events
    per watermark window), not O(stream lifetime).  That is the only
    formulation that survives an unbounded 100 TB/day stream; plain
    ``dropDuplicates`` on a stream grows state forever.  Batch: the same
    semantic is plain ``dropDuplicates`` (first-seen row wins; duplicates
    beyond one watermark apart are the source's replay bug, not dedup's).
    The testdata's event_ids are unique, so correctness is pinned on PLANTED
    duplicates in ``tests/test_streaming.py`` (vacuous-oracle rule)."""
    if events.isStreaming:
        return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
            ["event_id"]
        )
    return events.dropDuplicates(["event_id"])


def enrich_with_dim(events: DataFrame, dim: DataFrame, key: str = "user_id") -> DataFrame:
    """Stream-static enrichment join: the static dim is broadcast to every
    task, so the stream never shuffles — the canonical pattern for joining a
    firehose against reference data (dims re-read per micro-batch pick up
    slowly-changing updates).  Left join: events without a dim row survive
    with nulls (gate downstream, don't drop silently)."""
    return events.join(F.broadcast(dim), key, "left")


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    within: str = "10 minutes",
    watermark: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream equi-join with an event-time interval bound: pair each
    left event with right events for the same key whose timestamp falls in
    [left.ts, left.ts + within) — the attribution-join shape (click ->
    conversion).  Works identically on batch frames.

    On streams BOTH sides carry watermarks and the join condition bounds
    event time in both directions, which is exactly what lets Spark expire
    join state: a buffered row can be dropped once the other side's
    watermark passes its interval.  Without the time bound a stream-stream
    inner join would buffer forever.

    ``how="left_outer"`` keeps every left event, null-extended when no
    same-key right event falls in the interval — on streams Spark emits
    that row only once the right watermark passes the left row's interval
    (it can then prove no match will arrive), with the same bounded state.
    """
    l, r = left.alias("l"), right.alias("r")
    if left.isStreaming:
        l = left.withWatermark("ts", watermark).alias("l")
    if right.isStreaming:
        r = right.withWatermark("ts", watermark).alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col("r.ts") >= F.col("l.ts"))
        & (F.col("r.ts") < F.col("l.ts") + F.expr(f"INTERVAL {within}"))
    )
    # lag at MICROsecond precision — the precision of ``ts`` (and of the
    # join condition itself); sub-micro nanos don't survive engines whose
    # timestamps are micro-grained (DuckDB), so ns-exact lag can't be
    # oracle-matched
    return l.join(r, cond, how).select(
        F.col(f"l.{key}").alias(key),
        F.col("l.event_id").alias("left_event_id"),
        F.col("r.event_id").alias("right_event_id"),
        F.expr("r.ts_ns div 1000 - l.ts_ns div 1000").alias("lag_us"),
    )


def session_agg(events: DataFrame, gap: str = "5 minutes") -> DataFrame:
    """Per-user session windows (gap-based).  Spark merges events whose gap
    is strictly less than ``gap`` (session range is [start, last+gap)); the
    oracle's gaps-and-islands formulation uses ``diff >= gap`` for session
    breaks — identical semantics."""
    return (
        events.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts_ns").alias("min_ns"),
            F.max("ts_ns").alias("max_ns"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            "user_id",
            F.expr(f"min_ns div {NS}").alias("session_start_sec"),
            F.expr(f"(max_ns - min_ns) div {NS}").alias("span_sec"),
            "n_events",
            "total_value",
        )
    )


def interval_join_left(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    within: str = "10 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """LEFT OUTER variant of ``interval_join`` (see its docstring): every
    left event survives, null-extended when unmatched — the
    unattributed-clicks shape."""
    return interval_join(left, right, key, within, watermark, how="left_outer")


def decayed_trending(events: DataFrame, half_life_ns: int = 86_400_000_000_000) -> DataFrame:
    """Half-life-decayed trending per event type over a (ts_ns,
    event_type) frame: each event weighs 1e12 >> floor(age / half_life)
    — exponential decay as an exact integer right shift (no float exp,
    bit-stable in every engine), age measured from the frame's max ts.
    Returns (event_type, n_events, decayed_weight, decayed_rank,
    raw_rank); decayed_rank != raw_rank rows are the recency re-ranks.
    One scan + a 1-row broadcast max + one hash agg; the rank windows see
    |event_type| rows.  Streaming form: per-key O(1) bigint state (halve
    on period rollover, add 1e12 per event)."""
    from pyspark.sql import Window

    mx = events.agg(F.max("ts_ns").alias("max_ns"))
    d = (
        events.crossJoin(F.broadcast(mx))
        .withColumn("age_p", F.expr(f"(max_ns - ts_ns) DIV {half_life_ns}"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum(
                F.expr(
                    "1000000000000 DIV shiftleft(CAST(1 AS BIGINT),"
                    " CAST(least(age_p, 40) AS INT))"
                )
            )
            .cast("bigint")
            .alias("decayed_weight"),
        )
    )
    return d.select(
        "event_type",
        "n_events",
        "decayed_weight",
        F.row_number()
        .over(Window.orderBy(F.col("decayed_weight").desc(), F.col("event_type")))
        .cast("int")
        .alias("decayed_rank"),
        F.row_number()
        .over(Window.orderBy(F.col("n_events").desc(), F.col("event_type")))
        .cast("int")
        .alias("raw_rank"),
    )
