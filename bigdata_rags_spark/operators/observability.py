"""Zero-cost pipeline metrics via the Observation API.

The reference logs row counts by re-counting dataframes between stages
(dag-extract.py:118-124 logs ``len(df)`` per table; dag-load.py:60-66 counts
again before load).  On Spark each ``df.count()`` is a FULL extra job — at
100 TB that's a second scan of the lake per metric.  ``df.observe()``
attaches aggregate metrics to the EXISTING action: the counters ride along
with the job that writes/collects the data, cost zero extra passes, and are
collected on the driver after the action finishes.

Use for ingest health (rows in/out, null keys, negative amounts) wherever
the pipeline already materializes a result; use the expectations suite
(operators/expectations.py) when a dedicated validation pass is wanted.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation


def observe_metrics(
    df: DataFrame, metrics: dict[str, Column], name: str | None = None
) -> tuple[DataFrame, Observation]:
    """Attach named aggregate metrics to ``df``'s next action.

    Returns the observed frame (use it in place of ``df``) and the
    ``Observation`` handle; after ANY action on the returned frame,
    ``observation.get`` yields ``{metric_name: value}`` without running
    another job.

    The metric expressions must be aggregates over the observed relation
    (count/sum/min/max/...), evaluated streaming-fashion per task and merged
    on the driver — they never shuffle and never spill."""
    obs = Observation(name) if name else Observation()
    observed = df.observe(obs, *[c.alias(n) for n, c in metrics.items()])
    return observed, obs
