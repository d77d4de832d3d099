"""Edit-distance near-duplicate pairs via blocking + verify — the classic
entity-resolution composition (Fellegi-Sunter blocking; see also Christen,
"Data Matching", 2012): cheap deterministic blocking keys bound the candidate
set, and only candidates pay the O(m*n) Levenshtein verify.

Reference parity note: the reference has no approximate string matching; this
is north-star LLM-pipeline tier (fuzzy dedup of short fields / templated
documents where token-level MinHash over-merges).

Scale shape (100 TB): the self-join shuffles (16-byte block key, id) pairs —
never full text on the build side of the block; candidate volume is bounded
by true block sizes, not corpus^2 (same argument as MinHash banding).  The
Levenshtein verify is quadratic in STRING length, so both sides are capped to
a prefix window (``cap`` chars) — the standard ER practice of matching on a
bounded field, documented in the output contract rather than hidden.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bigdata_rags_spark.functions.text import ws_tokens


def blocked_edit_distance_pairs(
    df: DataFrame,
    max_dist: int = 5,
    block_tokens: int = 4,
    cap: int = 256,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id_a, id_b, edit_distance) for same-block pairs within ``max_dist``.

    Block key = md5 of the first ``block_tokens`` whitespace tokens
    (lowercased) — recall is bounded by the blocking choice exactly as in
    every ER system: edits inside the blocking prefix are missed by design
    (use multiple complementary blocks at scale).  Distance 0 pairs (exact
    dups) are included; the exact-dedup pass upstream normally removes them
    first.
    """
    bk = F.md5(F.array_join(F.slice(ws_tokens(F.col(text_col)), 1, block_tokens), " "))
    capped = F.substring(F.col(text_col), 1, cap)
    base = df.select(F.col(id_col).alias("id"), bk.alias("bk"), capped.alias("t"))
    a = base.select(F.col("id").alias("doc_a"), "bk", F.col("t").alias("ta"))
    b = base.select(F.col("id").alias("doc_b"), "bk", F.col("t").alias("tb"))
    return (
        a.join(b, "bk")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            F.levenshtein("ta", "tb").cast("int").alias("edit_distance"),
        )
        .filter(F.col("edit_distance") <= max_dist)
    )
