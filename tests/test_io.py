"""Source/sink connectors (reference S2, S7, S8 — SURVEY.md §2.1)."""

from __future__ import annotations

import csv
from pathlib import Path

from bigdata_rags_spark.io.readers import read_csv
from bigdata_rags_spark.io.writers import export_single_csv, write_partitioned
from bigdata_rags_spark.schemas import FOOTBALL


def test_csv_roundtrip_with_explicit_schema(spark, tmp_path):
    pdf_rows = [("Arsenal", 50), ("Derby", 0)]
    df = spark.createDataFrame(pdf_rows, FOOTBALL["big_chance_team"])
    out = str(tmp_path / "csv_zone")
    write_partitioned(df, out, fmt="csv")
    back = read_csv(spark, out, schema=FOOTBALL["big_chance_team"])
    assert {tuple(r) for r in back.collect()} == set(pdf_rows)
    assert dict(back.dtypes) == {"Team": "string", "Big Chances": "int"}


def test_csv_schema_inference_is_opt_in(spark, tmp_path):
    df = spark.createDataFrame([("A", 1)], ["k", "v"])
    out = str(tmp_path / "infer")
    write_partitioned(df, out, fmt="csv")
    inferred = read_csv(spark, out, infer=True)
    assert dict(inferred.dtypes)["v"] == "int"
    raw = read_csv(spark, out)  # no schema, no inference -> all strings
    assert dict(raw.dtypes)["v"] == "string"


def test_export_single_csv_produces_one_file(spark, tmp_path):
    df = spark.createDataFrame([(i, f"r{i}") for i in range(100)], ["id", "name"]).repartition(8)
    dest = str(tmp_path / "export" / "out.csv")
    export_single_csv(df, dest)
    p = Path(dest)
    assert p.is_file()
    with p.open() as fh:
        rows = list(csv.reader(fh))
    assert rows[0] == ["id", "name"] and len(rows) == 101


def test_csv_malformed_row_modes(spark, tmp_path):
    """Corrupt-record handling: PERMISSIVE nulls the bad fields,
    DROPMALFORMED removes the row, FAILFAST raises — the knobs that decide
    whether one bad row in 100 TB kills the job or is quarantined."""
    import pytest
    from pyspark.sql import types as T

    p = tmp_path / "bad.csv"
    p.write_text("k,v\na,1\nb,not_an_int\nc,3\n")
    schema = T.StructType(
        [T.StructField("k", T.StringType()), T.StructField("v", T.IntegerType())]
    )
    permissive = spark.read.schema(schema).option("header", True).csv(str(p))
    assert {(r["k"], r["v"]) for r in permissive.collect()} == {
        ("a", 1), ("b", None), ("c", 3)
    }
    dropped = (
        spark.read.schema(schema)
        .option("header", True)
        .option("mode", "DROPMALFORMED")
        .csv(str(p))
    )
    assert {r["k"] for r in dropped.collect()} == {"a", "c"}
    failfast = (
        spark.read.schema(schema)
        .option("header", True)
        .option("mode", "FAILFAST")
        .csv(str(p))
    )
    with pytest.raises(Exception, match="(?i)malformed|FAILFAST"):
        failfast.collect()


def test_partitioned_write_creates_hive_layout(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "2024", "01"), (2, "2024", "02")], ["id", "year", "month"]
    )
    out = tmp_path / "zone"
    write_partitioned(df, str(out), partition_by=["year", "month"])
    assert (out / "year=2024" / "month=01").exists()
    back = spark.read.parquet(str(out))
    assert back.count() == 2

def test_jdbc_roundtrip_embedded_derby(spark, tmp_path):
    """Reference S1/S13 (dag-extract.py:58-63, dag-load.py:92-102) exercised
    end-to-end against embedded Derby (ships in Spark's own jars): parallel
    partitioned read, full-replace write, replace-again idempotence."""
    from bigdata_rags_spark.io.readers import read_jdbc
    from bigdata_rags_spark.io.writers import write_jdbc_replace

    url = f"jdbc:derby:{tmp_path}/db;create=true"
    driver = "org.apache.derby.jdbc.EmbeddedDriver"
    df = spark.createDataFrame(
        [(i, f"name{i}", float(i) * 1.5) for i in range(100)], ["id", "name", "score"]
    )
    write_jdbc_replace(df, url, "people", driver=driver)

    back = read_jdbc(spark, url, "people", driver=driver)
    assert back.count() == 100
    assert {r["name"] for r in back.filter("id < 3").collect()} == {
        "name0", "name1", "name2"
    }

    # partitioned parallel read: same rows, split into bounded range queries
    part = read_jdbc(
        spark, url, "people", driver=driver,
        partition_column="id", num_partitions=4, lower_bound=0, upper_bound=100,
    )
    assert part.rdd.getNumPartitions() == 4
    assert sorted(r["id"] for r in part.collect()) == list(range(100))

    # replace semantics: second write fully supersedes the first
    df2 = spark.createDataFrame([(1, "only", 9.0)], ["id", "name", "score"])
    write_jdbc_replace(df2, url, "people", driver=driver)
    again = read_jdbc(spark, url, "people", driver=driver)
    assert [(r["id"], r["name"]) for r in again.collect()] == [(1, "only")]


def test_orc_and_json_roundtrip_preserve_data(spark, tmp_path):
    """Format breadth beyond CSV/parquet: ORC (columnar, predicate-pushdown
    capable) and newline-delimited JSON (interchange) round-trip through the
    same partitioned writer."""
    from pyspark.sql import types as T

    from bigdata_rags_spark.io.writers import write_partitioned

    df = spark.createDataFrame(
        [(1, "a", 1.5, [1, 2]), (2, "b", -0.25, []), (3, None, None, [7])],
        "k long, s string, x double, arr array<long>",
    )
    want = sorted(map(tuple, df.fillna({"s": ""}).collect()))

    orc_out = str(tmp_path / "orc")
    write_partitioned(df, orc_out, fmt="orc")
    back_orc = spark.read.orc(orc_out)
    assert back_orc.schema == df.schema
    assert sorted(map(tuple, back_orc.fillna({"s": ""}).collect())) == want

    json_out = str(tmp_path / "json")
    write_partitioned(df, json_out, fmt="json")
    # JSON needs the schema supplied on read (no types in the file)
    back_json = spark.read.schema(df.schema).json(json_out)
    assert sorted(map(tuple, back_json.fillna({"s": ""}).collect())) == want
    # ORC pushes filters to the scan like parquet
    plan = back_orc.filter("k = 2")._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "k" in plan


def test_write_clustered_produces_skippable_stats(spark, sf_smoke, tmp_path):
    """Clustered writes must yield disjoint per-file key ranges and tight
    row-group min/max stats — verified from the parquet footers themselves
    (what a scan's skipping logic actually reads)."""
    import glob as _glob

    import pyarrow.parquet as pq

    from bigdata_rags_spark.io.writers import write_clustered
    from bigdata_rags_spark.streaming.events import read_events_batch

    out = str(tmp_path / "clustered")
    ev = read_events_batch(spark, sf_smoke).select("event_id", "user_id", "value")
    write_clustered(ev, out, cluster_by=["user_id"], n_files=4)

    ranges = []
    for f in sorted(_glob.glob(out + "/part-*.parquet")):
        md = pq.ParquetFile(f).metadata
        col_idx = next(
            i for i in range(md.num_columns)
            if md.row_group(0).column(i).path_in_schema == "user_id"
        )
        stats = [md.row_group(g).column(col_idx).statistics for g in range(md.num_row_groups)]
        ranges.append((min(s.min for s in stats), max(s.max for s in stats)))
    assert len(ranges) >= 2
    # disjoint file-level ranges (range partitioning)
    for (lo1, hi1), (lo2, hi2) in zip(sorted(ranges), sorted(ranges)[1:]):
        assert hi1 <= lo2, (ranges,)
    # read back intact
    assert spark.read.parquet(out).count() == ev.count()


def test_zorder_code_matches_python_reference(spark):
    from pyspark.sql import functions as F

    from bigdata_rags_spark.io.writers import zorder_code

    def morton_py(x, y, bits=16):
        z = 0
        for i in range(bits):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    rows = [(x, y) for x in (0, 1, 5, 255, 65535) for y in (0, 2, 7, 1024, 65535)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.select("x", "y", zorder_code(F.col("x"), F.col("y")).alias("z")).collect()
    }
    for (x, y), z in got.items():
        assert z == morton_py(x, y), (x, y)
    # locality: adjacent points get nearby codes; distant y dominates high bits
    assert abs(got[(5, 2)] - got[(5, 7)]) < abs(got[(5, 2)] - got[(5, 1024)])


# ---------------------------------------------------------------------------
# Fixture-drift early warning (VERDICT r4 #7).  The r4 incident — the driver
# regenerated events.parquet from timestamp[ns] to timestamp[us], silently
# breaking 11 queries and the whole bench — was detectable with one cheap
# schema probe.  This test pins the READ dtypes of every driver fixture table
# to what the readers assume, so a driver-side regeneration fails ONE named
# test instead of 21 scattered ones.
# ---------------------------------------------------------------------------

FIXTURE_DTYPES = {
    "region": {"r_regionkey": "int", "r_name": "string"},
    "nation": {"n_nationkey": "int", "n_name": "string", "n_regionkey": "int"},
    "customer": {
        "c_custkey": "bigint", "c_name": "string", "c_nationkey": "int",
        "c_acctbal": "double", "c_mktsegment": "string",
    },
    "supplier": {
        "s_suppkey": "bigint", "s_name": "string", "s_nationkey": "int",
        "s_acctbal": "double",
    },
    "part": {
        "p_partkey": "bigint", "p_name": "string", "p_brand": "string",
        "p_type": "string", "p_size": "int", "p_retailprice": "double",
    },
    "orders": {
        "o_orderkey": "bigint", "o_custkey": "bigint", "o_orderstatus": "string",
        "o_totalprice": "double", "o_orderdate": {"timestamp", "timestamp_ntz"},
        "o_orderpriority": "string",
    },
    "lineitem": {
        "l_orderkey": "bigint", "l_partkey": "bigint", "l_suppkey": "bigint",
        "l_linenumber": "int", "l_quantity": "double", "l_extendedprice": "double",
        "l_discount": "double", "l_tax": "double", "l_returnflag": "string",
        "l_linestatus": "string", "l_shipdate": {"timestamp", "timestamp_ntz"},
    },
    "events": {
        "event_id": "bigint",
        # every physical type read_events_batch adapts to; anything else is
        # new drift and must fail here first
        "ts": {"bigint", "timestamp", "timestamp_ntz"},
        "user_id": "bigint", "event_type": "string", "value": "double",
        "props": "string",
    },
    "documents": {
        "doc_id": "bigint", "text": "string", "lang": "string",
        "source": "string", "n_chars": "bigint",
    },
    "embeddings": {
        "vec_id": "bigint", "embedding": "array<float>", "label": "int",
    },
}


def test_fixture_schema_contract(spark, sf_smoke):
    """Every driver fixture table reads with the dtypes the library assumes."""
    problems = []
    for table, want in FIXTURE_DTYPES.items():
        got = dict(spark.read.parquet(f"{sf_smoke}/{table}.parquet").dtypes)
        if set(got) != set(want):
            problems.append(f"{table}: columns {sorted(got)} != {sorted(want)}")
            continue
        for col, exp in want.items():
            ok = got[col] in exp if isinstance(exp, set) else got[col] == exp
            if not ok:
                problems.append(f"{table}.{col}: read as {got[col]!r}, expected {exp!r}")
    assert not problems, "\n".join(problems)


def test_events_reader_output_contract(spark, sf_smoke):
    """read_events_batch normalizes ANY fixture type to the two-column
    contract every downstream operator uses: exact bigint epoch-ns ``ts_ns``
    plus a microsecond-precision ``ts`` rebuilt from it."""
    from pyspark.sql import functions as F

    from bigdata_rags_spark.streaming.events import EVENTS_STREAM_SCHEMA, read_events_batch

    ev = read_events_batch(spark, sf_smoke)
    dts = dict(ev.dtypes)
    assert dts["ts_ns"] == "bigint"
    assert dts["ts"] == "timestamp"
    # column order matches the stream schema (+ trailing ts) so batch and
    # stream frames are interchangeable
    assert [c for c, _ in ev.dtypes] == [f.name for f in EVENTS_STREAM_SCHEMA.fields] + ["ts"]
    # ts is exactly ts_ns truncated to micros — no timezone drift
    bad = ev.filter(F.unix_micros("ts") != F.expr("ts_ns div 1000")).count()
    assert bad == 0


def test_events_reader_handles_historical_bigint_fixture(spark, tmp_path, sf_smoke):
    """The type-adaptive reader's bigint branch (pre-r4 fixtures shipped ts
    as int64 epoch-ns) must normalize identically to the timestamp branch:
    same ts_ns values, same rebuilt ts."""
    from pyspark.sql import functions as F

    from bigdata_rags_spark.streaming.events import read_events_batch

    current = read_events_batch(spark, sf_smoke)
    legacy_dir = str(tmp_path / "legacy_sf")
    (
        current.select(
            "event_id",
            F.col("ts_ns").alias("ts"),  # historical layout: ts IS epoch-ns
            "user_id",
            "event_type",
            "value",
            "props",
        ).write.parquet(f"{legacy_dir}/events.parquet")
    )
    legacy = read_events_batch(spark, legacy_dir)
    assert dict(legacy.dtypes) == dict(current.dtypes)
    cols = ["event_id", "ts_ns", "user_id", "event_type", "value"]
    assert sorted(map(tuple, legacy.select(cols).collect())) == sorted(
        map(tuple, current.select(cols).collect())
    )


def test_parquet_codec_matrix_roundtrips(spark, sf_smoke, tmp_path):
    """Zone writes must round-trip under every codec the lake might
    standardize on (snappy default, zstd for cold storage, gzip legacy,
    lz4) — same rows, same values, per-codec directories.  (Avro is the
    one builtin-but-external format: its module jar is not deployable in
    this offline environment, so the format matrix is parquet/orc/json/csv
    — see io/readers.py.)"""
    src = spark.read.parquet(f"{sf_smoke}/nation.parquet")
    want = sorted(map(tuple, src.collect()))
    for codec in ("snappy", "zstd", "gzip", "lz4"):
        p = str(tmp_path / f"codec_{codec}")
        src.write.option("compression", codec).parquet(p)
        assert sorted(map(tuple, spark.read.parquet(p).collect())) == want, codec


def test_partitioned_zone_scan_prunes_partitions(spark, tmp_path):
    """Hive-layout date partitioning must actually prune: a filter on the
    partition column reaches the scan as a PartitionFilter and the plan
    reports fewer files read than the zone holds — the mechanism that
    makes a 100 TB date-partitioned lake scan only the queried days."""
    from pyspark.sql import functions as F

    from bigdata_rags_spark.io.writers import write_partitioned

    df = spark.range(1000).select(
        F.col("id"),
        (F.col("id") % 10).cast("string").alias("day"),
    )
    out = str(tmp_path / "bydate")
    write_partitioned(df, out, partition_by=["day"])
    scan = spark.read.parquet(out).filter(F.col("day") == "3")
    plan = scan._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    pf = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "day" in pf
    assert scan.count() == 100
    # non-partition columns must NOT appear inside the partition-filter list
    assert "id" not in pf


def test_parquet_schema_evolution_merge(spark, tmp_path):
    """Additive schema evolution: batches written before a column existed
    must read back (null-filled) next to newer batches via mergeSchema —
    the lake's standard forward-compatible evolution path."""
    from pyspark.sql import functions as F

    out = str(tmp_path / "evolving")
    spark.range(5).select("id").write.parquet(out)
    spark.range(5, 10).select(
        "id", (F.col("id") * 2).alias("extra")
    ).write.mode("append").parquet(out)
    merged = spark.read.option("mergeSchema", True).parquet(out)
    assert set(merged.columns) == {"id", "extra"}
    rows = {r["id"]: r["extra"] for r in merged.collect()}
    assert rows[2] is None and rows[7] == 14


def test_zone_compaction_invariant_query(spark, sf_smoke):
    """The registered rows-only compaction query must report the planted
    8 -> 1 file collapse with zero row delta (VERDICT r6 #5)."""
    from bigdata_rags_spark.queries.catalog import REGISTRY

    row = REGISTRY["zone_compaction_invariant"].spark(spark, sf_smoke).collect()[0]
    assert row["files_before"] == 8
    assert row["files_after"] == 1
    assert row["rows_before"] > 0
    assert row["row_delta"] == 0


def test_zorder_layout_prunes_both_dimensions(spark):
    """On a uniform 2-D grid, the Z-ordered layout must keep per-file
    min/max narrow on BOTH dimensions, unlike a single-column sort which
    pins one axis and leaves the other spanning the full domain."""
    from pyspark.sql import functions as F

    from bigdata_rags_spark.io.layout import zorder_stats

    n = 64
    rows = [(x, y) for x in range(n) for y in range(n)]
    df = spark.createDataFrame(rows, "a long, b long")
    n_files = 64

    z = zorder_stats(df, "a", "b", n_files=n_files).collect()
    assert sum(r["n_rows"] for r in z) == n * n
    span = n - 1

    def avg_range(stats, lo_key, hi_key):
        widths = [(r[hi_key] - r[lo_key]) for r in stats if r["n_rows"] > 0]
        return sum(widths) / len(widths)

    # single-column sort baseline: files = equal-width ranges of `a`
    sorted_stats = (
        df.withColumn("file_id", F.expr(f"a * {n_files} div {n}"))
        .groupBy("file_id")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("a").alias("a_min"),
            F.max("a").alias("a_max"),
            F.min("b").alias("b_min"),
            F.max("b").alias("b_max"),
        )
        .collect()
    )
    # the sorted layout leaves b unpruned (full span per file)
    assert avg_range(sorted_stats, "b_min", "b_max") >= span
    # z-order keeps BOTH axes well under half the span on average
    assert avg_range(z, "a_min", "a_max") < 0.5 * span
    assert avg_range(z, "b_min", "b_max") < 0.5 * span


def test_cdc_apply_all_paths(spark):
    """insert / update / delete / insert-after-delete each resolve to the
    correct final state."""
    from pyspark.sql import functions as F

    from bigdata_rags_spark.io.maintenance import cdc_apply

    log = spark.createDataFrame(
        [
            (1, 1, "I", 10.0),  # plain insert -> survives at v1
            (2, 1, "I", 20.0), (2, 2, "U", 25.0),  # update wins
            (3, 1, "I", 30.0), (3, 2, "D", 0.0),   # deleted -> gone
            (4, 1, "I", 40.0), (4, 2, "D", 0.0), (4, 3, "I", 45.0),  # re-insert
        ],
        "k long, seq int, op string, v double",
    )
    out = {r["k"]: (r["op"], r["v"]) for r in cdc_apply(log, ["k"]).collect()}
    assert out == {1: ("I", 10.0), 2: ("U", 25.0), 4: ("I", 45.0)}
    # partitioning-independence
    out2 = {
        r["k"]: (r["op"], r["v"])
        for r in cdc_apply(log.repartition(7, "seq"), ["k"]).collect()
    }
    assert out2 == out
