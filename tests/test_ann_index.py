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
    # exactly one Arrow stage: the per-QUERY lookup table.  The corpus
    # encode (pq_encode's MapInPandas) must not appear — that's the build
    # half, paid once at build_ivfpq_index time.
    assert _n_arrow_stages(plan) == 1, plan[:3000]
    # and the on-the-fly sibling DOES encode the corpus in-plan (>= 2 Arrow
    # stages), which is exactly the repeated cost the split amortizes
    fly = _plan(ivfpq_search_rerank(q, built_index, k=5, n_probe=4, shortlist=50))
    assert _n_arrow_stages(fly) >= 2


def test_serving_scan_prunes_unprobed_buckets(spark, built_index):
    q = built_index.filter(F.col("vec_id") == 0)  # 1 query -> 4 probed cells
    plan = _plan(ivfpq_index_serve(q, k=5, table_prefix=PREFIX))
    m = re.search(r"SelectedBucketsCount: (\d+) out of (\d+)", plan)
    assert m, f"codes scan is not bucket-pruned:\n{plan[:3000]}"
    assert int(m.group(1)) < int(m.group(2))
