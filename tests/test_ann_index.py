"""IVFPQ index build/serve split: the persisted index must serve results
value-identical to the on-the-fly pipeline, with a serving plan that (a)
contains NO corpus encode stage and (b) actually prunes unprobed buckets of
the codes table (the whole point of persisting the index bucketed on cell)."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from bigdata_rags_spark.io.readers import read_testdata
from bigdata_rags_spark.similarity.pq import (
    build_ivfpq_index,
    ivfpq_index_serve,
    ivfpq_search_rerank,
)

PREFIX = "t_ann_idx"


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


@pytest.fixture(scope="module")
def built_index(spark, sf_smoke):
    from bigdata_rags_spark.io.bucketing import drop_managed_table

    e = read_testdata(spark, sf_smoke, "embeddings")["embeddings"]
    build_ivfpq_index(e, table_prefix=PREFIX)
    yield e
    drop_managed_table(spark, f"{PREFIX}_codes")
    drop_managed_table(spark, f"{PREFIX}_vectors")
    drop_managed_table(spark, f"{PREFIX}_meta")


def test_index_serve_matches_on_the_fly(spark, built_index):
    e = built_index
    q = e.filter(F.col("vec_id") < 5)
    served = ivfpq_index_serve(q, k=5, table_prefix=PREFIX).collect()
    direct = ivfpq_search_rerank(q, e, k=5, n_probe=4, shortlist=50).collect()
    key = lambda r: (r["query_id"], r["rank"])  # noqa: E731
    assert sorted(served, key=key) == sorted(direct, key=key)
    assert len(served) > 0


def _n_arrow_stages(plan: str) -> int:
    # formatted explain prints every node twice (tree line + details
    # header) — count the "(nn) MapInPandas" details headers, one per node
    return len(re.findall(r"^\(\d+\) MapInPandas", plan, re.M))


def test_serving_plan_has_no_corpus_encode(spark, built_index):
    q = built_index.filter(F.col("vec_id") < 5)
    plan = _plan(ivfpq_index_serve(q, k=5, table_prefix=PREFIX))
    # exactly two Arrow stages: the per-QUERY lookup table + the r13
    # partition-local pre-top-k ahead of the shortlist window
    # (similarity/topk.py).  The corpus encode (pq_encode's MapInPandas)
    # must not appear — that's the build half, paid once at
    # build_ivfpq_index time.
    assert _n_arrow_stages(plan) == 2, plan[:3000]
    # and the on-the-fly sibling DOES encode the corpus in-plan (one MORE
    # Arrow stage), which is exactly the repeated cost the split amortizes
    fly = _plan(ivfpq_search_rerank(q, built_index, k=5, n_probe=4, shortlist=50))
    assert _n_arrow_stages(fly) >= 3


def test_serving_scan_prunes_unprobed_buckets(spark, built_index):
    q = built_index.filter(F.col("vec_id") == 0)  # 1 query -> 4 probed cells
    plan = _plan(ivfpq_index_serve(q, k=5, table_prefix=PREFIX))
    m = re.search(r"SelectedBucketsCount: (\d+) out of (\d+)", plan)
    assert m, f"codes scan is not bucket-pruned:\n{plan[:3000]}"
    assert int(m.group(1)) < int(m.group(2))


@pytest.fixture()
def _drop_tables(spark):
    from bigdata_rags_spark.io.bucketing import drop_managed_table

    created: list[str] = []
    yield created
    for prefix in created:
        for suffix in ("_codes", "_vectors", "_meta", "_tombstones"):
            drop_managed_table(spark, f"{prefix}{suffix}")


@pytest.mark.slow  # ~70 s measured r17
def test_append_serve_equals_rebuild_from_union(spark, sf_smoke, _drop_tables):
    """Serve after append == serve after a full rebuild over the unioned
    corpus: ingest is a batch write, never a corpus rewrite."""
    from bigdata_rags_spark.similarity.pq import append_ivfpq_index

    _drop_tables.extend(["t_ann_app", "t_ann_full"])
    e = read_testdata(spark, sf_smoke, "embeddings")["embeddings"]
    old = e.filter(F.col("vec_id") % 3 != 0)
    batch = e.filter(F.col("vec_id") % 3 == 0)
    build_ivfpq_index(old, table_prefix="t_ann_app")
    append_ivfpq_index(batch, table_prefix="t_ann_app")
    build_ivfpq_index(e, table_prefix="t_ann_full")
    q = e.filter(F.col("vec_id") < 5)
    key = lambda r: (r["query_id"], r["rank"])  # noqa: E731
    appended = sorted(ivfpq_index_serve(q, k=5, table_prefix="t_ann_app").collect(), key=key)
    rebuilt = sorted(ivfpq_index_serve(q, k=5, table_prefix="t_ann_full").collect(), key=key)
    assert appended == rebuilt and len(appended) == 25
    # the appended index still prunes unprobed cell buckets
    q1 = e.filter(F.col("vec_id") == 0)
    plan = _plan(ivfpq_index_serve(q1, k=5, table_prefix="t_ann_app"))
    m = re.search(r"SelectedBucketsCount: (\d+) out of (\d+)", plan)
    assert m and int(m.group(1)) < int(m.group(2)), plan[:3000]


@pytest.mark.slow  # ~49 s measured r17
def test_trained_index_serves_its_own_quantizers(spark, sf_smoke, _drop_tables):
    """build(train=True) freezes the TRAINED quantizers into {prefix}_meta
    and serving reloads them: serve == on-the-fly with the same quantizers
    passed explicitly, the serving plan still has no corpus encode, and
    trained-index recall@5 is not below the fixed-codebook floor."""
    from bigdata_rags_spark.similarity.knn import brute_force_topk
    from bigdata_rags_spark.similarity.pq import _read_index_meta

    _drop_tables.append("t_ann_tr")
    e = read_testdata(spark, sf_smoke, "embeddings")["embeddings"]
    build_ivfpq_index(e, table_prefix="t_ann_tr", train=True, train_iter=2)
    cents, books, _ = _read_index_meta(spark, "t_ann_tr_meta")
    # trained quantizers actually differ from the fixed literals
    from bigdata_rags_spark.similarity.ivf import fixed_centroids
    from bigdata_rags_spark.similarity.pq import pq_codebooks

    assert cents != fixed_centroids(64, 16) and books != pq_codebooks()

    q = e.filter(F.col("vec_id") < 5)
    key = lambda r: (r["query_id"], r["rank"])  # noqa: E731
    served = sorted(ivfpq_index_serve(q, k=5, table_prefix="t_ann_tr").collect(), key=key)
    fly = sorted(
        ivfpq_search_rerank(
            q, e, k=5, n_probe=4, shortlist=50, centroids=cents, codebooks=books
        ).collect(),
        key=key,
    )
    assert served == fly and len(served) == 25
    assert _n_arrow_stages(_plan(ivfpq_index_serve(q, k=5, table_prefix="t_ann_tr"))) == 2

    def recall(rows) -> float:
        truth: dict[int, set[int]] = {}
        for r in brute_force_topk(q, e, k=5).collect():
            truth.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        got: dict[int, set[int]] = {}
        for r in rows:
            got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        return sum(len(truth[i] & got.get(i, set())) for i in truth) / (5 * len(truth))

    fixed_served = ivfpq_search_rerank(q, e, k=5, n_probe=4, shortlist=50).collect()
    assert recall(served) >= recall(fixed_served)


def test_delete_then_compact_lifecycle(spark, sf_smoke, _drop_tables):
    """Tombstoned ids vanish from serving immediately (logical delete);
    compaction physically removes them, clears the tombstone table, and
    serving is value-identical before/after compaction and to a rebuild
    over the surviving corpus.  The serving plan keeps its no-encode and
    bucket-pruning properties through the whole lifecycle."""
    from bigdata_rags_spark.similarity.pq import (
        compact_ivfpq_index,
        delete_from_ivfpq_index,
    )

    _drop_tables.extend(["t_ann_del", "t_ann_ref"])
    e = read_testdata(spark, sf_smoke, "embeddings")["embeddings"]
    q = e.filter(F.col("vec_id") < 5)
    key = lambda r: (r["query_id"], r["rank"])  # noqa: E731

    build_ivfpq_index(e, table_prefix="t_ann_del")
    delete_from_ivfpq_index(
        e.filter(F.col("vec_id") % 3 == 0).select("vec_id"), table_prefix="t_ann_del"
    )
    deleted = sorted(ivfpq_index_serve(q, k=5, table_prefix="t_ann_del").collect(), key=key)
    # reference: rebuild over only the surviving corpus
    build_ivfpq_index(e.filter(F.col("vec_id") % 3 != 0), table_prefix="t_ann_ref")
    rebuilt = sorted(ivfpq_index_serve(q, k=5, table_prefix="t_ann_ref").collect(), key=key)
    assert deleted == rebuilt and len(deleted) == 25
    assert not any(r["neighbor_id"] % 3 == 0 for r in deleted)

    codes_before = spark.table("t_ann_del_codes").count()
    removed_codes, removed_vecs = compact_ivfpq_index(spark, table_prefix="t_ann_del")
    assert removed_codes > 0 and removed_vecs > 0
    assert spark.table("t_ann_del_codes").count() == codes_before - removed_codes
    assert not spark.catalog.tableExists("t_ann_del_tombstones")
    compacted = sorted(ivfpq_index_serve(q, k=5, table_prefix="t_ann_del").collect(), key=key)
    assert compacted == deleted
    # plan properties survive compaction
    plan = _plan(ivfpq_index_serve(e.filter(F.col("vec_id") == 1), k=5, table_prefix="t_ann_del"))
    assert _n_arrow_stages(plan) == 2
    m = re.search(r"SelectedBucketsCount: (\d+) out of (\d+)", plan)
    assert m and int(m.group(1)) < int(m.group(2)), plan[:3000]

@pytest.mark.slow  # ~35 s measured r17
def test_reappend_revives_deleted_id(spark, sf_smoke, _drop_tables):
    """Appending a previously deleted id clears its tombstone (ADVICE r10
    #1): the vector is visible at serve time again, and a later compact
    keeps its rows instead of silently dropping the re-ingest."""
    from bigdata_rags_spark.similarity.pq import (
        append_ivfpq_index,
        compact_ivfpq_index,
        delete_from_ivfpq_index,
        ivfpq_index_serve,
    )

    _drop_tables.append("t_ann_rev")
    e = read_testdata(spark, sf_smoke, "embeddings")["embeddings"]
    build_ivfpq_index(e, table_prefix="t_ann_rev")
    victim = e.filter(F.col("vec_id") == 7)
    # probe with a CLONE of the victim's embedding under a fresh id: serving
    # excludes self-matches (neighbor_id != query_id), but the clone's exact
    # cosine with the live victim is 1.0 -> rank 1 whenever 7 is visible
    clone = victim.select(F.lit(99999).cast("long").alias("vec_id"), "embedding")

    def neighbors(prefix: str) -> set[int]:
        return {
            r["neighbor_id"]
            for r in ivfpq_index_serve(clone, k=5, table_prefix=prefix).collect()
        }

    assert 7 in neighbors("t_ann_rev")  # live before the delete
    delete_from_ivfpq_index(victim.select("vec_id"), table_prefix="t_ann_rev")
    assert 7 not in neighbors("t_ann_rev")  # tombstone masks the id
    # re-ingest: dedupe the physical rows is NOT needed — the tombstone
    # clear is.  Delete-then-compact first so the stale rows are gone,
    # mirroring the documented re-ingest flow.
    compact_ivfpq_index(spark, table_prefix="t_ann_rev")
    append_ivfpq_index(victim, table_prefix="t_ann_rev")
    assert 7 in neighbors("t_ann_rev")  # revived
    # tombstone table is gone or no longer lists 7
    if spark.catalog.tableExists("t_ann_rev_tombstones"):
        assert (
            spark.table("t_ann_rev_tombstones").filter(F.col("vec_id") == 7).count() == 0
        )
    # compacting after the re-ingest must keep the revived rows
    compact_ivfpq_index(spark, table_prefix="t_ann_rev")
    assert spark.table("t_ann_rev_vectors").filter(F.col("vec_id") == 7).count() == 1
    assert 7 in neighbors("t_ann_rev")


@pytest.mark.slow  # ~20 s measured r17
def test_reappend_without_compact_clears_tombstone(spark, sf_smoke, _drop_tables):
    """Append directly over a live tombstone (no compact in between): the
    batch's ids leave the tombstone set, others stay masked — AND the
    revived id exists physically exactly once (ADVICE r11 high: the logical
    delete left the old code/vector rows in place, so the append must purge
    them before inserting, or serving double-counts the ADC score and emits
    the revived neighbor at two ranks)."""
    from bigdata_rags_spark.similarity.pq import (
        append_ivfpq_index,
        delete_from_ivfpq_index,
    )

    _drop_tables.append("t_ann_rev2")
    e = read_testdata(spark, sf_smoke, "embeddings")["embeddings"]
    build_ivfpq_index(e.filter(F.col("vec_id") >= 10), table_prefix="t_ann_rev2")
    delete_from_ivfpq_index(
        e.filter(F.col("vec_id").isin(11, 12)).select("vec_id"), table_prefix="t_ann_rev2"
    )
    append_ivfpq_index(e.filter(F.col("vec_id") == 11), table_prefix="t_ann_rev2")
    left = {r["vec_id"] for r in spark.table("t_ann_rev2_tombstones").collect()}
    assert left == {12}  # 11 revived, 12 still masked
    # physical uniqueness: the stale pre-delete rows for 11 were purged —
    # exactly one code row per subquantizer (same as a never-deleted id)
    codes = spark.table("t_ann_rev2_codes")
    per_sub = codes.filter(F.col("id") == 13).count()  # never deleted
    assert codes.filter(F.col("id") == 11).count() == per_sub
    assert spark.table("t_ann_rev2_vectors").filter(F.col("vec_id") == 11).count() == 1
    # serving returns each neighbor at most once per query (the ADVICE r11
    # repro: without the purge, the duplicated vectors row made the rerank
    # join emit the revived neighbor at two ranks).  Self-matches are
    # excluded by design, so probe with OTHER vectors as queries.
    served = ivfpq_index_serve(
        e.filter(F.col("vec_id").between(13, 20)), k=5, table_prefix="t_ann_rev2"
    ).collect()
    pairs = [(r["query_id"], r["neighbor_id"]) for r in served]
    assert len(pairs) == len(set(pairs)), pairs
    # and a later compact (tombstone for 12 still live) keeps 11 unique
    from bigdata_rags_spark.similarity.pq import compact_ivfpq_index

    compact_ivfpq_index(spark, table_prefix="t_ann_rev2")
    codes2 = spark.table("t_ann_rev2_codes")
    assert codes2.filter(F.col("id") == 11).count() == per_sub
    assert codes2.filter(F.col("id") == 12).count() == 0


@pytest.mark.slow  # ~14 s measured r17
def test_compact_preserves_bucket_spec(spark, sf_smoke, _drop_tables):
    """The write-then-swap compact (ADVICE r10 #2) must leave the renamed
    tables with their bucket metadata: serving still prunes unprobed cell
    buckets, and no staging leftovers remain."""
    from bigdata_rags_spark.similarity.pq import (
        compact_ivfpq_index,
        delete_from_ivfpq_index,
        ivfpq_index_serve,
    )

    _drop_tables.append("t_ann_cb")
    e = read_testdata(spark, sf_smoke, "embeddings")["embeddings"]
    build_ivfpq_index(e, table_prefix="t_ann_cb")
    delete_from_ivfpq_index(
        e.filter(F.col("vec_id") % 5 == 0).select("vec_id"), table_prefix="t_ann_cb"
    )
    compact_ivfpq_index(spark, table_prefix="t_ann_cb")
    assert not spark.catalog.tableExists("t_ann_cb_codes__compacting")
    assert not spark.catalog.tableExists("t_ann_cb_vectors__compacting")
    plan = _plan(
        ivfpq_index_serve(e.filter(F.col("vec_id") == 1), k=5, table_prefix="t_ann_cb")
    )
    m = re.search(r"SelectedBucketsCount: (\d+) out of (\d+)", plan)
    assert m and int(m.group(1)) < int(m.group(2)), plan[:3000]


def test_incremental_minhash_half_params_raise(spark, sf_smoke):
    """Half-specifying the frozen banding parameters is an explicit error
    (ADVICE r10 #4), not a bare assert."""
    from bigdata_rags_spark.dedup.minhash import incremental_minhash_keepers

    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet").limit(10)
    with pytest.raises(ValueError, match="BOTH num_hashes and rows_per_band"):
        incremental_minhash_keepers(docs, docs, rows_per_band=2)
    with pytest.raises(ValueError, match="BOTH num_hashes and rows_per_band"):
        incremental_minhash_keepers(docs, docs, num_hashes=8)

def test_tuning_report_monotone_and_complete(spark, sf_smoke, _drop_tables):
    """ivfpq_tuning_report: recall and scanned cost are non-decreasing in
    n_probe, and probing every cell reaches exactly recall 1e6 (cell
    coverage is total)."""
    from bigdata_rags_spark.similarity.pq import build_ivfpq_index, ivfpq_tuning_report

    _drop_tables.append("t_ann_tune")
    e = read_testdata(spark, sf_smoke, "embeddings")["embeddings"]
    build_ivfpq_index(e, table_prefix="t_ann_tune")
    rows = (
        ivfpq_tuning_report(e.filter(F.col("vec_id") < 5), k=5, table_prefix="t_ann_tune")
        .orderBy("n_probe")
        .collect()
    )
    assert [r["n_probe"] for r in rows] == [1, 2, 4, 8, 16]
    recalls = [r["recall_micro"] for r in rows]
    scanned = [r["scanned_codes"] for r in rows]
    assert recalls == sorted(recalls) and scanned == sorted(scanned)
    assert recalls[-1] == 1_000_000
    assert scanned[-1] == 5 * e.count()  # every query scans the whole corpus
    assert 0 < recalls[0] < 1_000_000    # partial probing is genuinely partial


@pytest.mark.slow  # ~18 s measured r17
def test_compact_recovers_from_drop_rename_crash_window(spark, sf_smoke, _drop_tables):
    """Simulate a crash between compact's drop and rename (codes table
    gone, fully-written staging left behind): a compact rerun must finish
    the rename FIRST — not destroy the staging as 'stale' — and serving
    afterwards equals the uninterrupted-compact result."""
    from bigdata_rags_spark.io.bucketing import drop_managed_table
    from bigdata_rags_spark.similarity.pq import (
        compact_ivfpq_index,
        delete_from_ivfpq_index,
    )

    _drop_tables.extend(["t_ann_crash"])
    e = read_testdata(spark, sf_smoke, "embeddings")["embeddings"]
    q = e.filter(F.col("vec_id") < 5)
    key = lambda r: (r["query_id"], r["rank"])  # noqa: E731

    build_ivfpq_index(e, table_prefix="t_ann_crash")
    delete_from_ivfpq_index(
        e.filter(F.col("vec_id") % 4 == 0).select("vec_id"), table_prefix="t_ann_crash"
    )
    expected = sorted(
        ivfpq_index_serve(q, k=5, table_prefix="t_ann_crash").collect(), key=key
    )

    # reproduce the exact crash window: survivors staged, old table dropped,
    # rename never ran
    tombs = spark.table("t_ann_crash_tombstones").select("vec_id").distinct()
    staged = spark.table("t_ann_crash_codes").join(
        tombs.withColumnRenamed("vec_id", "id"), "id", "left_anti"
    )
    staged.write.saveAsTable("t_ann_crash_codes__compacting")
    drop_managed_table(spark, "t_ann_crash_codes")
    try:
        removed_codes, _ = compact_ivfpq_index(spark, table_prefix="t_ann_crash")
        # the recovered table had the tombstoned rows already removed, so
        # the rerun's own anti-join removes nothing more from codes
        assert removed_codes == 0
        assert spark.catalog.tableExists("t_ann_crash_codes")
        assert not spark.catalog.tableExists("t_ann_crash_codes__compacting")
        assert not spark.catalog.tableExists("t_ann_crash_tombstones")
        got = sorted(
            ivfpq_index_serve(q, k=5, table_prefix="t_ann_crash").collect(), key=key
        )
        assert got == expected
    finally:
        drop_managed_table(spark, "t_ann_crash_codes__compacting")


@pytest.mark.slow  # ~16 s measured r17
def test_filtered_serving_postfilter_starves_prefilter_does_not(spark):
    """VERDICT r14 next #3's done-criterion: under a selective predicate
    whose eligible vectors are NOT in the unfiltered top-k, postfilter
    provably starves (n_results < k) while prefilter returns a full k —
    and prefilter scans strictly fewer candidates."""
    from bigdata_rags_spark.similarity.pq import ivfpq_filtered_serving_report

    dim, k = 64, 10

    def vec(main: float, alt_idx: int, alt: float) -> list[float]:
        v = [0.0] * dim
        v[0] = main
        if alt:
            v[alt_idx] = alt
        return v

    # 15 ineligible vectors essentially parallel to the query, 12 eligible
    # ones slightly rotated — the unfiltered top-10 is all-ineligible
    corpus_rows = [(i, vec(1.0, 1, 0.001 * i)) for i in range(1, 16)]
    corpus_rows += [(i, vec(1.0, 2, 0.15)) for i in range(16, 28)]
    corpus = spark.createDataFrame(
        corpus_rows, "vec_id bigint, embedding array<double>"
    )
    queries = spark.createDataFrame(
        [(1000, vec(1.0, 0, 0.0))], "vec_id bigint, embedding array<double>"
    )
    elig = spark.createDataFrame([(i,) for i in range(16, 28)], "vec_id bigint")
    rep = {
        r["mode"]: r
        for r in ivfpq_filtered_serving_report(
            queries, corpus, elig, k=k, n_probe=4, shortlist=50
        ).collect()
    }
    assert rep["postfilter"]["n_results"] < k  # starved
    assert rep["prefilter"]["n_results"] == k  # recovered by pre-filtering
    assert rep["prefilter"]["recall_micro"] > rep["postfilter"]["recall_micro"]
    assert rep["prefilter"]["scanned_rows"] < rep["postfilter"]["scanned_rows"]
    # exact filtered truth is the top-10 of the 12 eligible: prefilter
    # should recover it fully here (shortlist covers every eligible code)
    assert rep["prefilter"]["recall_micro"] == 1_000_000


@pytest.mark.slow  # ~26 s measured r17
def test_persisted_index_filtered_serve_matches_filtered_corpus(spark):
    """ivfpq_index_serve(eligible_ids=...) — pre-filter on the PERSISTED
    index — must equal serving an index built over only the eligible
    corpus (same quantizers), and the unfiltered serve must be unchanged
    by the new parameter's default."""
    from pyspark.sql import functions as F

    from bigdata_rags_spark.io.bucketing import drop_managed_table
    from bigdata_rags_spark.io.readers import read_testdata
    from bigdata_rags_spark.similarity.pq import build_ivfpq_index, ivfpq_index_serve

    e = read_testdata(spark, "/root/testdata/sf0.001", "embeddings")["embeddings"]
    q = e.filter(F.col("vec_id") < 3)
    elig = e.filter(F.col("vec_id") % 2 == 0).select("vec_id")
    for prefix in ("t_fserve_full", "t_fserve_elig"):
        for s in ("codes", "vectors", "meta", "tombstones"):
            drop_managed_table(spark, f"{prefix}_{s}")
    build_ivfpq_index(e, table_prefix="t_fserve_full")
    build_ivfpq_index(
        e.join(elig, "vec_id", "left_semi"), table_prefix="t_fserve_elig"
    )
    key = lambda r: (r["query_id"], r["rank"])  # noqa: E731
    filtered = sorted(
        ivfpq_index_serve(
            q, k=5, table_prefix="t_fserve_full", eligible_ids=elig
        ).collect(),
        key=key,
    )
    rebuilt = sorted(
        ivfpq_index_serve(q, k=5, table_prefix="t_fserve_elig").collect(), key=key
    )
    assert [tuple(r) for r in filtered] == [tuple(r) for r in rebuilt]
    assert filtered  # non-vacuous
    assert all(r["neighbor_id"] % 2 == 0 for r in filtered)


def test_merge_indexes_lifecycle_and_guards(spark, sf_smoke, _drop_tables):
    """merge_ivfpq_indexes: a delete in a source shard survives the merge
    (tombstone union), bucket pruning holds on the merged index, and the
    three merge preconditions fail loudly — overlapping shard ids,
    mismatched quantizers, mismatched predicate-column schemas."""
    import pytest as _pytest

    from bigdata_rags_spark.similarity.pq import (
        build_ivfpq_index,
        delete_from_ivfpq_index,
        merge_ivfpq_indexes,
    )

    _drop_tables.extend(["t_mrg_a", "t_mrg_b", "t_mrg_out", "t_mrg_bad"])
    e = read_testdata(spark, sf_smoke, "embeddings")["embeddings"]
    a, b = e.filter(F.col("vec_id") % 3 != 0), e.filter(F.col("vec_id") % 3 == 0)
    build_ivfpq_index(a, table_prefix="t_mrg_a")
    build_ivfpq_index(b, table_prefix="t_mrg_b")
    # delete an id from shard A BEFORE the merge: must stay masked after
    dead = a.limit(1).select("vec_id")
    dead_id = dead.collect()[0]["vec_id"]
    delete_from_ivfpq_index(dead, table_prefix="t_mrg_a")
    merge_ivfpq_indexes(spark, ["t_mrg_a", "t_mrg_b"], "t_mrg_out")
    q = e.filter(F.col("vec_id") < 5)
    res = ivfpq_index_serve(q, k=5, table_prefix="t_mrg_out").collect()
    assert len(res) == 25
    assert all(r["neighbor_id"] != dead_id for r in res)  # delete survived
    plan = _plan(ivfpq_index_serve(q.limit(1), k=5, table_prefix="t_mrg_out"))
    m = re.search(r"SelectedBucketsCount: (\d+) out of (\d+)", plan)
    assert m and int(m.group(1)) < int(m.group(2))  # pruning holds post-merge
    # guard 1: overlapping shard ids double-count -> refuse
    with _pytest.raises(ValueError, match="more than one source index"):
        merge_ivfpq_indexes(spark, ["t_mrg_a", "t_mrg_a"], "t_mrg_out")
    # guard 2: different quantizers = different code spaces -> refuse
    build_ivfpq_index(b, table_prefix="t_mrg_bad", n_cells=8)
    with _pytest.raises(ValueError, match="quantizer mismatch"):
        merge_ivfpq_indexes(spark, ["t_mrg_a", "t_mrg_bad"], "t_mrg_out")
    # guard 3: predicate-column schema drift -> refuse
    docs = read_testdata(spark, sf_smoke, "documents")["documents"]
    build_ivfpq_index(
        b, table_prefix="t_mrg_bad", metadata=docs.select("doc_id", "lang")
    )
    with _pytest.raises(ValueError, match="codes schema mismatch"):
        merge_ivfpq_indexes(spark, ["t_mrg_a", "t_mrg_bad"], "t_mrg_out")


def test_predicate_columns_serve_plan_and_parity(spark, sf_smoke, _drop_tables):
    """VERDICT r15 next #2's done-criterion: build with metadata columns,
    serve with predicate="lang = 'en'" — the predicate must appear as a
    PUSHED filter on the codes scan, the plan must contain zero joins
    against documents, bucket pruning must survive, and the result must
    equal the eligible-ids pre-filter form (the r15 path) on the same
    index."""
    from bigdata_rags_spark.similarity.pq import build_ivfpq_index, ivfpq_index_serve

    _drop_tables.append("t_ann_pred")
    e = read_testdata(spark, sf_smoke, "embeddings")["embeddings"]
    docs = read_testdata(spark, sf_smoke, "documents")["documents"]
    build_ivfpq_index(
        e, table_prefix="t_ann_pred", metadata=docs.select("doc_id", "lang", "source")
    )
    q = e.filter(F.col("vec_id") < 5)
    served = ivfpq_index_serve(
        q, k=5, table_prefix="t_ann_pred", predicate="lang = 'en'"
    )
    plan = _plan(served)
    assert re.search(r"PushedFilters: \[[^\]]*lang", plan), plan[:3000]
    assert "documents" not in plan  # zero metadata joins at serve time
    m = re.search(r"SelectedBucketsCount: (\d+) out of (\d+)", plan)
    assert m and int(m.group(1)) < int(m.group(2)), plan[:3000]
    # value parity with the id-frame pre-filter form on the SAME index
    elig = docs.filter(F.col("lang") == "en").select(
        F.col("doc_id").alias("vec_id")
    )
    via_ids = ivfpq_index_serve(
        q, k=5, table_prefix="t_ann_pred", eligible_ids=elig
    )
    key = lambda r: (r["query_id"], r["rank"])  # noqa: E731
    srows = sorted(served.collect(), key=key)
    assert [tuple(r) for r in srows] == [
        tuple(r) for r in sorted(via_ids.collect(), key=key)
    ]
    assert srows  # non-vacuous
    # ... and the unfiltered serve on a metadata-carrying index is
    # unaffected by the stored columns
    unfiltered = ivfpq_index_serve(q, k=5, table_prefix="t_ann_pred")
    assert unfiltered.count() == 25


def test_predicate_columns_append_and_validation(spark, sf_smoke, _drop_tables):
    """Appends into a predicate-carrying index must supply the same
    metadata columns (schema drift fails loudly), and appended rows must
    be predicate-visible; metadata columns colliding with the codes
    schema are rejected at build."""
    import pytest as _pytest

    from bigdata_rags_spark.similarity.pq import (
        append_ivfpq_index,
        build_ivfpq_index,
        ivfpq_index_serve,
    )

    _drop_tables.extend(["t_ann_predapp", "t_ann_predfull"])
    e = read_testdata(spark, sf_smoke, "embeddings")["embeddings"]
    docs = read_testdata(spark, sf_smoke, "documents")["documents"]
    md = docs.select("doc_id", "lang", "source")
    old = e.filter(F.col("vec_id") % 3 != 0)
    batch = e.filter(F.col("vec_id") % 3 == 0)
    build_ivfpq_index(old, table_prefix="t_ann_predapp", metadata=md)
    # schema drift: batch without the index's metadata columns
    with _pytest.raises(ValueError, match="append schema mismatch"):
        append_ivfpq_index(batch, table_prefix="t_ann_predapp")
    append_ivfpq_index(batch, table_prefix="t_ann_predapp", metadata=md)
    build_ivfpq_index(e, table_prefix="t_ann_predfull", metadata=md)
    q = e.filter(F.col("vec_id") < 5)
    key = lambda r: (r["query_id"], r["rank"])  # noqa: E731
    appended = sorted(
        ivfpq_index_serve(
            q, k=5, table_prefix="t_ann_predapp", predicate="lang = 'en'"
        ).collect(),
        key=key,
    )
    rebuilt = sorted(
        ivfpq_index_serve(
            q, k=5, table_prefix="t_ann_predfull", predicate="lang = 'en'"
        ).collect(),
        key=key,
    )
    assert [tuple(r) for r in appended] == [tuple(r) for r in rebuilt]
    assert appended
    # reserved-name collision fails at build
    bad_md = docs.select("doc_id", F.col("lang").alias("cell"))
    with _pytest.raises(ValueError, match="collide with the codes schema"):
        build_ivfpq_index(e, table_prefix="t_ann_predapp", metadata=bad_md)
