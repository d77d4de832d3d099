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

def test_merge_scd2_tracks_history_and_is_reapply_idempotent(spark, tmp_path):
    from bigdata_rags_spark.io.maintenance import merge_scd2

    zone = str(tmp_path / "scd2")
    b1 = spark.createDataFrame(
        [(1, "alice", 100), (2, "bob", 100)], ["k", "name", "ts"]
    )
    n = merge_scd2(spark, zone, b1, key="k", change_ts_col="ts")
    assert n == 2
    cur = {r["k"]: r for r in spark.read.parquet(zone).collect()}
    assert cur[1]["__is_current"] and cur[1]["__valid_from"] == 100
    assert cur[1]["__valid_to"] is None

    # batch 2: key 1 changes, key 2 unchanged, key 3 new
    b2 = spark.createDataFrame(
        [(1, "alicia", 200), (2, "bob", 200), (3, "carol", 200)], ["k", "name", "ts"]
    )
    n = merge_scd2(spark, zone, b2, key="k", change_ts_col="ts")
    assert n == 4  # 2 current survivors + 1 closed + 1 new
    rows = spark.read.parquet(zone).collect()
    by = {}
    for r in rows:
        by.setdefault(r["k"], []).append(r)
    # key 1: closed v1 + open v2
    v1 = [r for r in by[1] if not r["__is_current"]][0]
    v2 = [r for r in by[1] if r["__is_current"]][0]
    assert (v1["name"], v1["__valid_from"], v1["__valid_to"]) == ("alice", 100, 200)
    assert (v2["name"], v2["__valid_from"], v2["__valid_to"]) == ("alicia", 200, None)
    # key 2: unchanged -> single row, original valid_from
    assert len(by[2]) == 1 and by[2][0]["__valid_from"] == 100 and by[2][0]["__is_current"]
    # key 3: inserted current
    assert len(by[3]) == 1 and by[3][0]["__is_current"]

    # re-applying batch 2 is a no-op (no new versions from identical attrs)
    n = merge_scd2(spark, zone, b2, key="k", change_ts_col="ts")
    assert n == 4
    assert spark.read.parquet(zone).filter("__is_current").count() == 3


def test_zone_diff_classifies_all_transitions(spark, tmp_path):
    from bigdata_rags_spark.io.maintenance import zone_diff

    old = str(tmp_path / "v1")
    new = str(tmp_path / "v2")
    spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], ["k", "v"]
    ).write.parquet(old)
    spark.createDataFrame(
        [(2, "b"), (3, "c2"), (4, "d")], ["k", "v"]
    ).write.parquet(new)
    got = {r["k"]: r["status"] for r in zone_diff(spark, old, new, key="k").collect()}
    assert got == {1: "removed", 2: "unchanged", 3: "changed", 4: "added"}


def test_merge_refuses_to_treat_corrupt_zone_as_first_load(spark, tmp_path):
    """ADVICE r2 (pinned per VERDICT r4 #4): a zone that EXISTS but cannot
    be read must raise — never silently fall back to the first-load path,
    which would replace real history with just the fresh batch."""
    import pytest

    from bigdata_rags_spark.io.maintenance import merge_scd2, merge_upsert

    zone = str(tmp_path / "corrupt_zone")
    spark.createDataFrame([(1, "a")], ["k", "v"]).write.parquet(zone)
    # corrupt every parquet footer in place
    from pathlib import Path

    for p in Path(zone).glob("part-*"):
        p.write_bytes(b"not a parquet file")
    updates = spark.createDataFrame([(2, "b", "2026-01-01")], ["k", "v", "ts"])
    corrupt = "(?i)parquet|footer|magic|checksum|corrupt"
    with pytest.raises(Exception, match=corrupt):
        merge_upsert(spark, zone, updates.drop("ts"), key="k")
    with pytest.raises(Exception, match=corrupt):
        merge_scd2(spark, zone, updates, key="k", change_ts_col="ts")
    # and the corrupt zone was not clobbered by a staging swap
    assert Path(zone).exists()
    assert all(p.read_bytes() == b"not a parquet file" for p in Path(zone).glob("part-*"))


def test_zone_snapshot_diff_query_covers_all_statuses(spark, sf_oracle):
    """The registered zone_snapshot_diff must exercise every branch of the
    classifier at the driver's correctness SF — a diff where some status
    never occurs proves nothing about that branch."""
    from collections import Counter

    from bigdata_rags_spark.queries.catalog import REGISTRY

    rows = REGISTRY["zone_snapshot_diff"].spark(spark, sf_oracle).collect()
    counts = Counter(r["status"] for r in rows)
    assert set(counts) == {"added", "removed", "changed", "unchanged"}, counts
    assert all(v > 10 for v in counts.values()), counts


def test_read_zone_as_of_three_epochs_differ(spark, tmp_path):
    """VERDICT r13 #6: time-travel over an SCD-2-maintained zone — the
    table as-of(T1) != as-of(T2) != current, each reconstructed from the
    retained history with a row-local interval predicate."""
    from bigdata_rags_spark.io.maintenance import merge_scd2, read_zone_as_of

    zone = str(tmp_path / "tt")
    cols = ["k", "val", "ts"]
    merge_scd2(
        spark,
        zone,
        spark.createDataFrame(
            [(1, "a", "2025-01-01"), (2, "b", "2025-01-01")], cols
        ),
        key="k",
        change_ts_col="ts",
    )
    merge_scd2(
        spark,
        zone,
        spark.createDataFrame([(1, "a2", "2025-02-01")], cols),
        key="k",
        change_ts_col="ts",
    )
    merge_scd2(
        spark,
        zone,
        spark.createDataFrame(
            [(2, "b3", "2025-03-01"), (3, "c3", "2025-03-01")], cols
        ),
        key="k",
        change_ts_col="ts",
    )

    def snap(ts):
        return {r["k"]: r["val"] for r in read_zone_as_of(spark, zone, ts).collect()}

    # as-of BEFORE the first load: empty
    assert snap("2024-12-31") == {}
    # the three epochs differ pairwise
    assert snap("2025-01-15") == {1: "a", 2: "b"}
    assert snap("2025-02-15") == {1: "a2", 2: "b"}
    assert snap("2025-03-15") == {1: "a2", 2: "b3", 3: "c3"}
    # as-of exactly at a change ts sees the NEW version (half-open interval)
    assert snap("2025-02-01")[1] == "a2"
    # current state == the latest as-of
    cur = {
        r["k"]: r["val"]
        for r in spark.read.parquet(zone).filter("__is_current").collect()
    }
    assert cur == snap("2025-03-15")
