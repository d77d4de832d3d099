#!/usr/bin/env python
"""Synthetic 10x scale probe for the LLM-tier heavyweights (VERDICT r6 #7).

Builds a throwaway zone that is sf0.1 with documents/embeddings duplicated
COPIES times, then times the top LLM queries at 1x and at COPIES-x and
prints the wall-time ratio per query — the first empirical point on the
"survives 100x" claim.  Expected: ratios ~<= COPIES (linear scaling); a
superlinear ratio or a plan flip to BNLJ/CartesianProduct is a red flag
(plan shape is additionally asserted here, mirroring the pins in
tests/test_plans.py).

Duplication preserves WORK SHAPE, not just row count:

- embeddings: copy k circularly shifts each vector by k positions (cosine
  is invariant under a shared permutation, so every copy reproduces the
  original near-dup graph internally, while cross-copy similarities are
  uncorrelated).  Naive identical copies would make every original pair
  collide 10x10 ways — a quadratic DATA artifact that says nothing about
  the plan.
- documents: copy k suffixes every token with ~k, so per-copy shingle /
  n-gram structure is identical but cross-copy Jaccard is 0 — again 10x
  the work, not 100x the candidate pairs.

Run:  python scripts/scale_probe.py   (serialize with other Spark work —
CLAUDE.md bench rule; ~6 min).  Results table lives in SCALE.md.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from bigdata_rags_spark.queries.catalog import REGISTRY  # noqa: E402
from bigdata_rags_spark.session import get_session  # noqa: E402

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WORK = os.environ.get("SPARK_GRAFT_SCALE_DIR", "/tmp/bdrs_scale10x")
COPIES = int(os.environ.get("SPARK_GRAFT_SCALE_COPIES", "10"))
DIM = 64
QUERIES = [
    "embedding_fuzzy_dedup_vectors",
    "embedding_near_dup_pairs_lsh",
    "corpus_training_selection",
    "gopher_quality_filters",
    "fuzzy_dedup_surviving_docs",
]
OTHER_TABLES = "region nation customer supplier part orders lineitem events".split()


def build_zone(spark) -> None:
    shutil.rmtree(WORK, ignore_errors=True)
    os.makedirs(WORK)
    for t in OTHER_TABLES:
        src = f"{BASE}/{t}.parquet"
        if os.path.exists(src):
            os.symlink(src, f"{WORK}/{t}.parquet")

    docs = spark.read.parquet(f"{BASE}/documents.parquet")
    doc_copies = [
        docs
        if k == 0
        else docs.select(
            (F.col("doc_id") + F.lit(k * 100_000_000)).alias("doc_id"),
            F.regexp_replace("text", r"(\S+)", f"$1~{k}").alias("text"),
            "lang",
            "source",
            "n_chars",
        )
        for k in range(COPIES)
    ]
    out = doc_copies[0]
    for c in doc_copies[1:]:
        out = out.unionByName(c)
    out.coalesce(1).write.mode("overwrite").parquet(f"{WORK}/documents.parquet")

    emb = spark.read.parquet(f"{BASE}/embeddings.parquet")
    emb_copies = [
        emb
        if k == 0
        else emb.select(
            (F.col("vec_id") + F.lit(k * 100_000_000)).alias("vec_id"),
            F.expr(
                f"concat(slice(embedding, {k + 1}, {DIM - k}), "
                f"slice(embedding, 1, {k}))"
            ).alias("embedding"),
            "label",
        )
        for k in range(COPIES)
    ]
    out = emb_copies[0]
    for c in emb_copies[1:]:
        out = out.unionByName(c)
    out.coalesce(1).write.mode("overwrite").parquet(f"{WORK}/embeddings.parquet")


def timed(spark, name: str, sf_dir: str) -> float:
    best = float("inf")
    for _ in range(2):  # pass 2 is warm; keep the faster (steady-state) one
        t0 = time.perf_counter()
        REGISTRY[name].spark(spark, sf_dir).write.mode("overwrite").format(
            "noop"
        ).save()
        best = min(best, time.perf_counter() - t0)
        for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            rdd.unpersist()
        spark.catalog.clearCache()
    return best


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_session(
        "bdrs-scale-probe", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
    )
    spark.sparkContext.setLogLevel("ERROR")
    build_zone(spark)
    print(f"zone built at {WORK} ({COPIES}x documents/embeddings)", flush=True)
    rows = []
    for name in QUERIES:
        plan = (
            REGISTRY[name]
            .spark(spark, WORK)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "CartesianProduct" not in plan, f"{name} flipped to cartesian at {COPIES}x"
        t1 = timed(spark, name, BASE)
        t10 = timed(spark, name, WORK)
        rows.append((name, t1, t10, t10 / t1))
        print(f"{name}: 1x={t1:.2f}s {COPIES}x={t10:.2f}s ratio={t10 / t1:.2f}", flush=True)
    print()
    print("| query | 1x sec | %dx sec | ratio |" % COPIES)
    print("|---|---|---|---|")
    for name, t1, t10, r in rows:
        print(f"| {name} | {t1:.2f} | {t10:.2f} | {r:.2f} |")


if __name__ == "__main__":
    main()
