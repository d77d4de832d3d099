"""Zone maintenance: upsert merge semantics and small-file compaction."""

from __future__ import annotations

from bigdata_rags_spark.io.maintenance import compact_zone, merge_upsert


def _rows(spark, path):
    return {r["k"]: (r["v"], r["ver"]) for r in spark.read.parquet(path).collect()}


def test_merge_upsert_inserts_and_overwrites(spark, tmp_path):
    zone = str(tmp_path / "zone")
    base = spark.createDataFrame([(1, "a", 1), (2, "b", 1)], ["k", "v", "ver"])
    base.write.parquet(zone)
    updates = spark.createDataFrame([(2, "b2", 2), (3, "c", 1)], ["k", "v", "ver"])
    n = merge_upsert(spark, zone, updates, key="k", version_col="ver")
    assert n == 3
    assert _rows(spark, zone) == {1: ("a", 1), 2: ("b2", 2), 3: ("c", 1)}


def test_merge_upsert_version_keeps_newest_existing(spark, tmp_path):
    zone = str(tmp_path / "zone")
    spark.createDataFrame([(1, "new", 5)], ["k", "v", "ver"]).write.parquet(zone)
    stale = spark.createDataFrame([(1, "stale", 2)], ["k", "v", "ver"])
    merge_upsert(spark, zone, stale, key="k", version_col="ver")
    assert _rows(spark, zone) == {1: ("new", 5)}


def test_merge_upsert_without_versions_prefers_updates(spark, tmp_path):
    zone = str(tmp_path / "zone")
    spark.createDataFrame([(1, "old", 1)], ["k", "v", "ver"]).write.parquet(zone)
    upd = spark.createDataFrame([(1, "new", 1)], ["k", "v", "ver"])
    merge_upsert(spark, zone, upd, key="k")
    assert _rows(spark, zone)[1][0] == "new"


def test_merge_upsert_creates_zone_when_missing(spark, tmp_path):
    zone = str(tmp_path / "fresh")
    upd = spark.createDataFrame([(1, "a", 1)], ["k", "v", "ver"])
    assert merge_upsert(spark, zone, upd, key="k") == 1


def test_compact_zone_reduces_files(spark, tmp_path):
    zone = str(tmp_path / "zone")
    df = spark.range(10_000).withColumnRenamed("id", "k")
    df.repartition(64).write.parquet(zone)
    before, after = compact_zone(spark, zone, target_rows_per_file=10_000)
    assert before == 64 and after == 1
    assert spark.read.parquet(zone).count() == 10_000