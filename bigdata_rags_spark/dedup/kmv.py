"""Corpus-pair overlap estimation via k-minimum-values (KMV) signatures.

Before running a cross-source dedup over a 100 TB corpus you want to know
WHICH source pairs overlap at all — a full pairwise content-hash join is
wasted on the (usual) majority of disjoint pairs.  A KMV signature (Beyer et
al., "On synopses for distinct-value estimation under multiset operations",
SIGMOD'07) compresses each source to its k smallest distinct content hashes;
because min-k(A ∪ B) = min-k(min-k(A) ∪ min-k(B)), signatures are MERGEABLE
and a pair's Jaccard is estimated as

    |{h in min-k(sig_A ∪ sig_B) : h ∈ sig_A and h ∈ sig_B}| / k

— per-pair work is O(k), independent of source size.  The reference has no
overlap-planning surface (its pipeline is single-source,
`reference/dag-transform.py`; SURVEY.md §2).

100 TB shape: signatures are built from DISTINCT (source, 60-bit-hash) rows
— the only big shuffle ships 16-byte pairs; everything after is S·k rows
(S = number of sources, tens).  Pair expansion is O(|elements| · S) with the
tiny pair table broadcast, equi-joins only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def kmv_signatures(dist: DataFrame, k: int) -> DataFrame:
    """k smallest distinct hashes per source.  ``dist`` must be distinct
    (src, h) rows; h an integer hash."""
    from pyspark.sql import Window

    w = Window.partitionBy("src").orderBy("h")
    return (
        dist.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def _pair_membership(pairs: DataFrame, elems: DataFrame) -> DataFrame:
    """(sa, sb, h, in_a, in_b) for every element of either side of each
    pair.  Two broadcast equi-joins + a grouped max — no OR-join (which
    would plan as a nested loop)."""
    a = (
        F.broadcast(pairs)
        .join(elems.withColumnRenamed("src", "sa"), "sa")
        .select("sa", "sb", "h", F.lit(1).alias("ia"), F.lit(0).alias("ib"))
    )
    b = (
        F.broadcast(pairs)
        .join(elems.withColumnRenamed("src", "sb"), "sb")
        .select("sa", "sb", "h", F.lit(0).alias("ia"), F.lit(1).alias("ib"))
    )
    return (
        a.unionByName(b)
        .groupBy("sa", "sb", "h")
        .agg(F.max("ia").alias("in_a"), F.max("ib").alias("in_b"))
    )


def source_pair_overlap(dist: DataFrame, k: int) -> DataFrame:
    """KMV overlap estimate + exact rider for every source pair.

    ``dist``: distinct (src, h).  Returns one row per unordered source pair:
    (source_a, source_b, k_used, kmv_matches, exact_common, exact_union) —
    all exact bigints, so est_jaccard = kmv_matches / k_used and true
    jaccard = exact_common / exact_union are derivable without float drift.
    The exact rider exists to make the estimator auditable; a production
    run at scale would keep only the signature branch.
    """
    from pyspark.sql import Window

    srcs = dist.select("src").distinct()
    pairs = (
        srcs.withColumnRenamed("src", "sa")
        .join(srcs.withColumnRenamed("src", "sb"), F.col("sa") < F.col("sb"))
    )

    sig_members = _pair_membership(pairs, kmv_signatures(dist, k))
    rn = F.row_number().over(Window.partitionBy("sa", "sb").orderBy("h"))
    kmv = (
        sig_members.withColumn("rn", rn)
        .filter(F.col("rn") <= k)
        .groupBy("sa", "sb")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("k_used"),
            F.sum((F.col("in_a") * F.col("in_b"))).cast("bigint").alias("kmv_matches"),
        )
    )

    full_members = _pair_membership(pairs, dist)
    exact = full_members.groupBy("sa", "sb").agg(
        F.sum((F.col("in_a") * F.col("in_b"))).cast("bigint").alias("exact_common"),
        F.count(F.lit(1)).cast("bigint").alias("exact_union"),
    )

    return (
        kmv.join(exact, ["sa", "sb"])
        .select(
            F.col("sa").alias("source_a"),
            F.col("sb").alias("source_b"),
            "k_used",
            "kmv_matches",
            "exact_common",
            "exact_union",
        )
    )
