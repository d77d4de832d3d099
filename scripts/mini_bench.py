#!/usr/bin/env python
"""Mini-bench: time a subset of registry queries with bench.py's protocol
(noop sink, cold pass + 3 warm passes, per-query median) and print JSON.

Usage: python scripts/mini_bench.py <query> [...more]
Serialize with other Spark work (CLAUDE.md bench rule).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    names = sys.argv[1:]
    from bigdata_rags_spark.queries.catalog import REGISTRY
    from bigdata_rags_spark.session import get_session

    spark = get_session(
        "mini-bench", master=f"local[{CPUS}]", shuffle_partitions=int(CPUS)
    )
    spark.sparkContext.setLogLevel("ERROR")
    for tbl in (
        "region nation customer supplier part orders lineitem documents embeddings"
    ).split():
        spark.read.parquet(f"{SF_DIR}/{tbl}.parquet").count()

    def clear_persisted() -> None:
        for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            rdd.unpersist()
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()

    def run_pass() -> dict[str, float]:
        times: dict[str, float] = {}
        for name in names:
            spec = REGISTRY[name]
            spark.sparkContext.setJobDescription(f"mini-bench: {name}")
            t0 = time.perf_counter()
            spec.spark(spark, SF_DIR).write.mode("overwrite").format("noop").save()
            times[name] = round(time.perf_counter() - t0, 3)
            clear_persisted()
        return times

    cold = run_pass()
    warm = [run_pass() for _ in range(3)]
    med = {n: sorted(p[n] for p in warm)[1] for n in names}
    print(
        json.dumps(
            {
                "cold": cold,
                "warm_med": med,
                "warm_min": {n: min(p[n] for p in warm) for n in names},
                "warm_max": {n: max(p[n] for p in warm) for n in names},
            }
        )
    )


if __name__ == "__main__":
    main()
