"""Duplicate-cluster assignment: connected components over near-dup pairs.

Pairwise detectors (MinHash/LSH, Jaccard, SimHash) emit edges; dedup needs
the transitive closure — if A~B and B~C, then {A,B,C} is one cluster with
one keeper.  Implemented as iterative min-label propagation (the standard
large-graph approach, e.g. Kiveris et al. "Connected Components in
MapReduce"): every node starts labeled with itself; each round it takes the
min label among itself and its neighbors; convergence in O(component
diameter) rounds — tiny for dup clusters.

Everything is joins + groupBy (no driver-side graph); the only driver-side
value per round is the `changed` count that decides convergence.  The edge
set is cached across iterations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    a: str = "doc_a",
    b: str = "doc_b",
    max_iter: int = 20,
) -> DataFrame:
    """(doc_id, cluster_id) for every node appearing in ``pairs``;
    cluster_id = min node id in the component (deterministic keeper)."""
    fwd = pairs.select(F.col(a).alias("u"), F.col(b).alias("v"))
    edges = (
        fwd.union(fwd.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .distinct()
        .cache()
    )
    labels = edges.select("u").distinct().withColumn("label", F.col("u"))
    changed = -1  # sentinel: max_iter <= 0 must hit the RuntimeError, not a NameError
    try:
        for _ in range(max_iter):
            neighbor_min = (
                edges.join(
                    labels.select(
                        F.col("u").alias("v"), F.col("label").alias("nlabel")
                    ),
                    "v",
                )
                .groupBy("u")
                .agg(F.min("nlabel").alias("nmin"))
            )
            # localCheckpoint truncates the lineage each round — without it
            # the logical plan nests one full join per iteration and the
            # driver OOMs on analysis long before the data is big.  (On a
            # real cluster with unreliable executors, set a checkpoint dir
            # and use .checkpoint() instead.)
            new_labels = (
                labels.join(neighbor_min, "u", "left")
                .select(
                    "u",
                    F.least(
                        F.col("label"), F.coalesce(F.col("nmin"), F.col("label"))
                    ).alias("label"),
                )
                .localCheckpoint()
            )
            changed = (
                new_labels.join(
                    labels.select("u", F.col("label").alias("old")), "u"
                )
                .filter(F.col("label") != F.col("old"))
                .count()
            )
            labels = new_labels
            if changed == 0:
                break
        else:
            # loop exhausted max_iter with changed > 0: labels are NOT the
            # transitive closure (a component's diameter exceeds max_iter).
            # Silent wrong answers are worse than loud ones (ADVICE r1).
            raise RuntimeError(
                f"connected_components did not converge in {max_iter} rounds "
                f"({changed} labels still changing); raise max_iter — "
                "rounds needed = max component diameter"
            )
        return labels.select(F.col("u").alias("doc_id"), F.col("label").alias("cluster_id"))
    finally:
        edges.unpersist()
