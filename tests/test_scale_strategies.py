"""Scale-strategy verification at the PLAN level: bucketed co-located joins
eliminate the shuffle, salted joins spread hot keys, broadcast hints stick.
These pin the physical behaviors the 100 TB design depends on."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdata_rags_spark.operators.skew import salted_join


def _plan(df, mode: str = "simple") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), mode)


@pytest.fixture(scope="module")
def warehouse(spark, tmp_path_factory):
    return str(tmp_path_factory.mktemp("warehouse"))


def test_bucketed_join_has_no_shuffle(spark, sf_smoke, tmp_path_factory):
    """Two tables bucketed on the join key co-locate: the join plan contains
    no Exchange — the shape that makes repeated large-fact joins viable at
    100 TB (shuffle once at write time, never again)."""
    import shutil

    li = spark.read.parquet(f"{sf_smoke}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_smoke}/orders.parquet")
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for tbl in ("b_lineitem", "b_orders"):
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        # a fresh session's in-memory catalog forgets managed tables, but
        # their warehouse directories persist -> clear both
        shutil.rmtree(f"{warehouse}/{tbl}", ignore_errors=True)
    (li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
       .mode("overwrite").saveAsTable("b_lineitem"))
    (orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
       .mode("overwrite").saveAsTable("b_orders"))

    joined = (
        spark.table("b_lineitem")
        .join(spark.table("b_orders"), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    # disable auto-broadcast so the co-location (not a broadcast) is what
    # kills the shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(joined)
        assert "SortMergeJoin" in plan
        join_section = plan.split("SortMergeJoin")[1] if "SortMergeJoin" in plan else plan
        # no Exchange feeding the join inputs (only the post-agg exchange)
        pre_join = plan.split("SortMergeJoin")[0]
        assert "Exchange hashpartitioning(l_orderkey" not in plan
        assert "Exchange hashpartitioning(o_orderkey" not in plan
        # and it still computes the right answer
        assert joined.count() > 0
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_salted_join_matches_plain_join(spark):
    """Salted join = same result set as the plain join, with the hot key's
    rows spread across num_salts shards."""
    hot = [(1, f"v{i}") for i in range(500)] + [(k, f"x{k}") for k in range(2, 30)]
    skewed = spark.createDataFrame(hot, ["k", "payload"])
    dim = spark.createDataFrame([(k, f"d{k}") for k in range(0, 30)], ["k", "label"])

    plain = skewed.join(dim, "k").select("k", "payload", "label")
    salted = salted_join(skewed, dim, "k", num_salts=8).select("k", "payload", "label")
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salt_is_deterministic_across_runs(spark):
    skewed = spark.createDataFrame([(1, "a"), (1, "b")], ["k", "v"])
    dim = spark.createDataFrame([(1, "d")], ["k", "label"])
    r1 = sorted(map(tuple, salted_join(skewed, dim, "k").collect()))
    r2 = sorted(map(tuple, salted_join(skewed, dim, "k").collect()))
    assert r1 == r2


def test_partition_pruning_reads_only_matching_partition(spark, tmp_path):
    """Hive-partitioned zone + partition-key filter -> the scan lists only
    the matching directory (PartitionFilters), so a day query over a year
    of data reads 1/365th of it."""
    from pyspark.sql import functions as F

    zone = str(tmp_path / "zone")
    df = spark.createDataFrame(
        [(i, f"2024-{m:02d}") for m in (1, 2, 3) for i in range(10)], ["id", "month"]
    )
    df.write.partitionBy("month").parquet(zone)
    q = spark.read.parquet(zone).filter(F.col("month") == "2024-02")
    plan = _plan(q, "formatted")
    # the partition-key predicate becomes a PartitionFilter (directory-level
    # pruning at scan time; inputFiles() would still list the unpruned index)
    assert "PartitionFilters: [isnotnull(month" in plan
    assert "(month" in plan.split("PartitionFilters:")[1].splitlines()[0]
    assert q.count() == 10


def test_football_pipeline_at_100k_teams(spark):
    """The reference's pipeline shape at 5000x its data: 100k teams through
    the attack join+metrics plan.  Broadcast sides stay dimension-shaped
    relative to executors and the whole run is one pass — the property that
    makes the plan survive scale-up."""
    from pyspark.sql import functions as F

    from bigdata_rags_spark.pipelines.football import attack_pipeline
    from bigdata_rags_spark.schemas import FOOTBALL

    n = 100_000
    team = F.concat(F.lit("team_"), F.col("id").cast("string"))

    def synth(name):
        cols = FOOTBALL[name]
        df = spark.range(n).select(team.alias("Team"), F.col("id"))
        out = []
        for f in cols.fields:
            if f.name == "Team":
                continue
            if f.name == "Player":
                out.append(F.concat(F.lit("p"), F.col("id").cast("string")).alias("Player"))
            elif str(f.dataType) == "IntegerType()":
                out.append((F.col("id") % 97 + 1).cast("int").alias(f.name))
            else:
                out.append(((F.col("id") % 89 + 1) / 7.0).alias(f.name))
        return df.select("Team", *out)

    tables = {name: synth(name) for name in (
        "big_chance_team", "clean_sheet_team", "effective_clearance_team",
        "expected_goals_team", "ontarget_scoring_att_team", "penalty_won_team",
        "possession_won_att", "team_goals_per_match", "touches_in_opp_box_team",
        "player_expected_assists",
    )}
    out = attack_pipeline(tables)
    assert out.count() == n
    row = out.filter(F.col("Team") == "team_7").collect()[0]
    assert row["Goal Conversion Rate"] is not None


def test_broadcast_hint_sticks(spark, sf_smoke):
    n = spark.read.parquet(f"{sf_smoke}/nation.parquet")
    c = spark.read.parquet(f"{sf_smoke}/customer.parquet")
    joined = c.join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
    assert "BroadcastHashJoin" in _plan(joined)

def test_stratified_hash_sample_is_deterministic_and_accurate(spark):
    from bigdata_rags_spark.operators.sampling import hash_sample, stratified_hash_sample

    df = spark.range(0, 20_000).select(
        F.col("id"), F.when(F.col("id") % 2 == 0, "even").otherwise("odd").alias("parity")
    )
    out = stratified_hash_sample(
        df, key=F.col("id"), strata=F.col("parity"), fractions={"even": 0.3, "odd": 0.0}
    )
    ids = {r["id"] for r in out.collect()}
    assert all(i % 2 == 0 for i in ids)           # odd stratum fully dropped
    assert 0.25 < len(ids) / 10_000 < 0.35        # ~30% of the even stratum
    # identical selection under a different partitioning (replayability)
    ids2 = {r["id"] for r in out.repartition(17).collect()}
    assert ids == ids2
    # plain hash_sample: same rows every call, fraction honored
    s1 = {r["id"] for r in hash_sample(df, F.col("id"), 0.1).collect()}
    s2 = {r["id"] for r in hash_sample(df, F.col("id"), 0.1).collect()}
    assert s1 == s2 and 0.08 < len(s1) / 20_000 < 0.12
    # different salt -> different (mostly disjoint-ish) sample
    s3 = {r["id"] for r in hash_sample(df, F.col("id"), 0.1, salt="other").collect()}
    assert s3 != s1


def test_expectations_detect_planted_violations(spark):
    from bigdata_rags_spark.operators.expectations import (
        expect_in_range,
        expect_not_null,
        expect_references,
        expect_unique,
        expectation_suite,
    )

    child = spark.createDataFrame(
        [(1, 10.0), (1, 20.0), (2, None), (3, 999.0), (9, 5.0)], ["k", "x"]
    )
    parent = spark.createDataFrame([(1,), (2,), (3,)], ["pk"])
    suite = {
        r["check_name"]: (r["violations"], r["passed"])
        for r in expectation_suite(
            child, {"not_null_x": expect_not_null("x"), "range_x": expect_in_range("x", 0, 100)}
        ).collect()
    }
    assert suite["not_null_x"] == (1, 0)       # the None row
    assert suite["range_x"] == (1, 0)          # 999.0 (NULL not double-counted)
    uq = expect_unique(child, "k").collect()[0]
    assert uq["violations"] == 2 and uq["passed"] == 0   # both k=1 rows
    fk = expect_references(child, "k", parent, "pk").collect()[0]
    assert fk["violations"] == 1 and fk["passed"] == 0   # k=9 orphan
    # a clean table passes everything
    clean = expect_unique(parent, "pk").collect()[0]
    assert clean["violations"] == 0 and clean["passed"] == 1


def test_priority_sample_estimator_and_determinism(spark):
    """Priority sampling: exact-k sample, est_weight >= weight, the
    tau-threshold subset-sum estimate lands near the true total weight
    (~1/sqrt(k) relative error), and the sample is identical under a
    different input partitioning."""
    from pyspark.sql import functions as F

    from bigdata_rags_spark.operators.sampling import priority_sample

    rows = [(i, (i * 37) % 997 + 1) for i in range(5000)]
    df = spark.createDataFrame(rows, "id long, w long")
    k = 200
    out = priority_sample(df, F.col("id"), F.col("w"), k=k).collect()
    assert len(out) == k
    assert all(r["est_weight"] >= r["weight"] for r in out)
    true_total = sum(w for _, w in rows)
    est_total = sum(r["est_weight"] for r in out)
    assert abs(est_total - true_total) / true_total < 0.30, (est_total, true_total)

    repart = priority_sample(df.repartition(17, "w"), F.col("id"), F.col("w"), k=k)
    assert {tuple(r) for r in repart.collect()} == {tuple(r) for r in out}


def test_priority_sample_degenerates_below_k(spark):
    """With n <= k the whole table is the sample and est_weight == weight
    (tau = 0)."""
    from pyspark.sql import functions as F

    from bigdata_rags_spark.operators.sampling import priority_sample

    df = spark.createDataFrame([(i, 10 * i + 1) for i in range(5)], "id long, w long")
    out = priority_sample(df, F.col("id"), F.col("w"), k=100).collect()
    assert len(out) == 5
    assert all(r["est_weight"] == r["weight"] for r in out)


def test_snapshot_drift_report_flags_planted_drift(spark, sf_smoke):
    """Each planted drift class must surface: row-count cliff, null-rate
    spike on status, and distinct/cardinality movement on price."""
    from bigdata_rags_spark.queries.catalog import REGISTRY

    rows = {
        (r["column"], r["metric"]): r
        for r in REGISTRY["snapshot_drift_report"].spark(spark, sf_smoke).collect()
    }
    assert rows[("_table", "n_rows")]["delta"] < 0  # every 7th row dropped
    st = rows[("status", "n_null")]
    assert st["v_prev"] == 0 and st["v_curr"] > 0 and st["delta"] == st["v_curr"]
    assert rows[("price", "n_null")]["v_curr"] == 0
    # price range/cardinality must have moved (+2500-cent shift on 20%)
    assert rows[("price", "n_distinct")]["delta"] != 0
    assert rows[("price", "max_cents")]["v_prev"] > 0


def test_rfm_scores_partition_quartiles(spark, sf_oracle):
    """Quartile scores cover 1..4 with ~balanced mass, and score ordering
    respects the underlying metric ordering."""
    from bigdata_rags_spark.queries.catalog import REGISTRY

    rows = REGISTRY["rfm_customer_segmentation"].spark(spark, sf_oracle).collect()
    n = len(rows)
    assert n > 100
    for col, better_high in [("r_score", None), ("f_score", None), ("m_score", None)]:
        counts = {}
        for r in rows:
            counts[r[col]] = counts.get(r[col], 0) + 1
        assert set(counts) <= {1, 2, 3, 4} and len(counts) >= 2, (col, counts)
        # each present quartile holds a non-trivial share (ties can skew)
        assert all(c >= n * 0.02 for c in counts.values()), (col, counts)
    # monetary ordering: every score-4 customer spent more than every score-1
    m4 = min(r["monetary_cents"] for r in rows if r["m_score"] == 4)
    m1 = max(r["monetary_cents"] for r in rows if r["m_score"] == 1)
    assert m4 > m1
    # recency ordering: score 4 = most recent
    r4 = max(r["recency_days"] for r in rows if r["r_score"] == 4)
    r1 = min(r["recency_days"] for r in rows if r["r_score"] == 1)
    assert r4 < r1


def test_basket_affinity_lift_planted(spark, tmp_path):
    """Parts always bought together get high lift; independent parts hover
    near 1e6 (lift 1.0)."""
    from pyspark.sql import functions as F

    from bigdata_rags_spark.queries.catalog import REGISTRY

    rows = []
    # 40 orders: parts 1,2 in ALL orders; part 3 in the first 20; part 4 in
    # the first 10 -> lift(3,4) = 10*40/(20*10) = 2.0, lift(1,2) = 1.0
    for ok in range(40):
        rows += [(ok, 1), (ok, 2)]
        if ok < 20:
            rows.append((ok, 3))
        if ok < 10:
            rows.append((ok, 4))
    li = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    # write a minimal lineitem parquet the query can read
    full = li.select(
        "l_orderkey", "l_partkey",
        F.lit(1).alias("l_suppkey"), F.lit(1).alias("l_linenumber"),
        F.lit(1.0).alias("l_quantity"), F.lit(1.0).alias("l_extendedprice"),
        F.lit(0.0).alias("l_discount"), F.lit(0.0).alias("l_tax"),
        F.lit("N").alias("l_returnflag"), F.lit("O").alias("l_linestatus"),
        F.current_timestamp().alias("l_shipdate"),
    )
    full.write.mode("overwrite").parquet(f"{tmp_path}/lineitem.parquet")
    out = {
        (r["part_a"], r["part_b"]): r
        for r in REGISTRY["basket_affinity_lift"].spark(spark, str(tmp_path)).collect()
    }
    assert out[(1, 2)]["n_pair"] == 40 and out[(1, 2)]["lift_micro"] == 1_000_000
    assert out[(3, 4)]["n_pair"] == 10 and out[(3, 4)]["lift_micro"] == 2_000_000
    assert out[(1, 3)]["lift_micro"] == 1_000_000  # independent of basket membership



def test_pareto_abc_classes_ordered(spark, sf_oracle):
    from bigdata_rags_spark.queries.catalog import REGISTRY

    rows = REGISTRY["pareto_abc_customers"].spark(spark, sf_oracle).collect()
    by_class = {}
    for r in rows:
        by_class.setdefault(r["abc_class"], []).append(r)
    assert set(by_class) == {"A", "B", "C"}
    assert max(r["cum_share_micro"] for r in rows) == 1_000_000
    # every A customer out-earns every C customer
    assert min(r["cents"] for r in by_class["A"]) >= max(r["cents"] for r in by_class["C"])
    # boundary property: class A is exactly the head with cum share <= 80%
    # (TPC-H revenue is near-uniform, so the head is ~80% of customers too)
    total = sum(r["cents"] for r in rows)
    a_rev = sum(r["cents"] for r in by_class["A"])
    assert a_rev * 100 <= total * 80
    max_a_cum = max(r["cum_cents"] for r in by_class["A"])
    min_b_cum = min(r["cum_cents"] for r in by_class["B"])
    assert max_a_cum * 100 <= total * 80 < min_b_cum * 100


def test_vocab_coverage_curve_planted_zipf(spark, tmp_path):
    from pyspark.sql import functions as F

    from bigdata_rags_spark.queries.catalog import REGISTRY

    text = " ".join(["a"] * 8 + ["b"] * 4 + ["c"] * 2 + ["d"])
    docs = spark.createDataFrame([(1, text, "en", "s", len(text))],
                                 "doc_id long, text string, lang string, source string, n_chars long")
    docs.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    out = {r["vocab_size"]: r for r in
           REGISTRY["vocab_coverage_curve"].spark(spark, str(tmp_path)).collect()}
    assert out[1]["covered_tokens"] == 8 and out[1]["coverage_micro"] == 8 * 1_000_000 // 15
    assert out[2]["covered_tokens"] == 12
    assert out[4]["covered_tokens"] == 15 and out[4]["coverage_micro"] == 1_000_000
    assert out[4]["vocab"] == 4


def test_gini_known_distributions(spark):
    """Gini = 0 for perfect equality; the rank formula matches the known
    closed form for a planted linear distribution."""
    from pyspark.sql import functions as F

    from bigdata_rags_spark.io.readers import read_testdata  # noqa: F401
    from bigdata_rags_spark.queries.catalog import REGISTRY

    def gini_of(rows, tmpdir):
        df = spark.createDataFrame(rows, "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double, o_orderdate timestamp, o_orderpriority string")
        df.write.mode("overwrite").parquet(f"{tmpdir}/orders.parquet")
        return REGISTRY["gini_revenue_concentration"].spark(spark, str(tmpdir)).collect()[0]

    import datetime
    ts = datetime.datetime(2024, 1, 1)
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        equal = [(i, i, "O", 100.0, ts, "1") for i in range(10)]
        r = gini_of(equal, d)
        assert r["gini"] == 0.0
    with tempfile.TemporaryDirectory() as d:
        # cents_i = 100*i for i=1..10: closed form G = (2*sum(i*x_i)/(n*sum x)) - (n+1)/n
        linear = [(i, i, "O", float(i), ts, "1") for i in range(1, 11)]
        r = gini_of(linear, d)
        n, xs = 10, [100 * i for i in range(1, 11)]
        s = sum((i + 1) * x for i, x in enumerate(xs))
        expect = round((2 * s - (n + 1) * sum(xs)) / (n * sum(xs)), 6)
        assert abs(r["gini"] - expect) < 1e-9, (r["gini"], expect)
