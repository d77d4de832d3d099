"""Single shared SparkSession factory.

The reference builds a throwaway local SparkSession inside every transform
function (reference dag-transform.py:50-51, :132, :244, :326).  Here there is
exactly one session per process (SURVEY.md §2.3 O7), configured for scale:
AQE on (runtime re-planning, skew-join splitting), shuffle partitions sized by
the caller, Arrow enabled for any pandas interchange.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))


def get_session(
    app_name: str = "bigdata-rags-spark",
    master: str | None = None,
    shuffle_partitions: int = DEFAULT_SHUFFLE_PARTITIONS,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the process-wide SparkSession.

    Defaults target local mode for tests; on a cluster, ``master`` is left to
    spark-submit.  All settings are plan-level, not data-level, so the same
    code runs unchanged from sf0.001 to 100 TB — only partition counts and
    executor sizing change.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = (
        SparkSession.builder.appName(app_name)
        # local-mode JVM heap: the 1g PySpark default is absurd next to 32
        # executor threads on a 128 GiB host — the r12 bench OOMed its heavy
        # re-passes under it.  Builder-time driver.memory IS honored for the
        # lazily-launched local JVM (verified: Runtime.maxMemory follows it);
        # on a real cluster spark-submit sizing overrides this.
        .config(
            "spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g")
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Sessions created by us pin ANSI off to match the reference's
        # pre-ANSI division semantics (x/0 -> NULL).  Library code still
        # NULLIF-guards every ratio so it is correct under ANSI-on sessions
        # supplied by external drivers (SURVEY.md §7.4 hazard 2).
        .config("spark.sql.ansi.enabled", "false")
    )
    if master:
        builder = builder.master(master)
    elif not os.environ.get("SPARK_GRAFT_ON_CLUSTER"):
        builder = builder.master(f"local[{cpus}]")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
