"""Substring-level exact dedup — cross-document repeated-span removal.

The strongest exact-dedup tier real pretraining pipelines run (Lee et al.
2022, "Deduplicating Training Data Makes Language Models Better": remove
every substring of >= k tokens that appears more than once in the corpus).
The paper builds a corpus-wide suffix array; the distributed re-expression
here uses the standard rolling-window equivalence: a substring of length
>= k tokens is duplicated across documents iff every k-token window inside
it is duplicated, so marking duplicated k-spans and merging the overlapping
marked spans per document covers exactly the duplicated regions at k-token
granularity.  (Granularity caveat: a duplicated region shorter than k
tokens is below the detection threshold — identical to the paper's own
minimum-match-length parameter.)

Stages (all integer/hash algebra -> fully oracle-checkable):

1. k-token rolling spans per doc; span key = md5 of the space-joined window
   (16-byte key, computed from a codegen'd ``slice``/``array_join`` over the
   token array — no text duplication until the explode, and the exploded
   row carries ONLY (doc_id, start_pos, md5)).
2. spans whose key occurs in > ``max_docs_per_span`` distinct docs are
   duplicated; the dup-key set joins back to the span list (hash equi-join
   on the 16-byte key).
3. marked spans expand to covered token positions (bounded explode:
   k rows per marked span) and merge into islands per doc — run-length
   island algebra (``pos != lag(pos)+1`` starts a new island), the same
   shape as ``events_run_length_islands``.
4. surviving text = tokens at uncovered positions, reassembled in order;
   emitted as (count, md5) so the output row stays narrow.

Scale shape (100 TB): the only corpus-wide shuffles carry (md5, doc_id)
pairs for the distinct-doc count (partial+final agg) and the join back —
both keyed by the 16-byte md5; coverage/island/reassembly work is keyed by
doc_id and bounded per doc by document length.  No stage is ever
pairwise-in-documents; cost is O(total tokens).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from bigdata_rags_spark.functions.text import ws_tokens


def substring_dedup(
    docs: DataFrame,
    k: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_docs_per_span: int = 1,
) -> DataFrame:
    """Per-doc repeated-span removal report.

    Returns ``(id_col, n_tokens, dup_tokens, n_islands, n_surviving,
    surviving_md5)``: ``dup_tokens`` counts token positions covered by any
    cross-doc duplicated k-span, ``n_islands`` the merged contiguous covered
    regions, ``surviving_md5`` the md5 of the space-joined uncovered tokens
    in original order (md5('') when fully covered).  All-bigint + md5 ->
    engine-exact.
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"), ws_tokens(F.col(text_col)).alias("t")
    )
    base = toks.withColumn("n_tokens", F.size("t").cast("bigint"))

    # 1-based span starts; guarded so sequence() never sees a descending
    # range (the word_shingles hazard) on docs shorter than k tokens
    starts = F.when(
        F.size("t") >= k, F.sequence(F.lit(1), F.size("t") - F.lit(k - 1))
    ).otherwise(F.array().cast("array<int>"))
    spans = base.select(
        "doc_id", "t", F.explode(starts).alias("start_pos")
    ).select(
        "doc_id",
        F.col("start_pos").cast("bigint").alias("start_pos"),
        F.md5(F.array_join(F.slice(F.col("t"), F.col("start_pos"), k), " ")).alias("h"),
    )

    dup_keys = (
        spans.groupBy("h")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") > max_docs_per_span)
        .select("h")
    )
    marked = spans.join(dup_keys, "h").select("doc_id", "start_pos")

    covered = marked.select(
        "doc_id",
        F.explode(
            F.sequence(F.col("start_pos"), F.col("start_pos") + F.lit(k - 1))
        ).alias("pos"),
    ).distinct()

    w = Window.partitionBy("doc_id").orderBy("pos")
    isl = covered.withColumn(
        "brk",
        F.when(F.col("pos") - F.lag("pos").over(w) == 1, F.lit(0)).otherwise(F.lit(1)),
    )
    cov_stats = isl.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("dup_tokens"),
        F.sum("brk").cast("bigint").alias("n_islands"),
    )

    tok = base.select("doc_id", F.posexplode("t").alias("p0", "tok")).select(
        "doc_id", (F.col("p0") + 1).cast("bigint").alias("pos"), "tok"
    )
    surv = (
        tok.join(covered, ["doc_id", "pos"], "left_anti")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_surviving"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                        lambda x: x["tok"],
                    ),
                    " ",
                )
            ).alias("surviving_md5"),
        )
    )

    return (
        base.select("doc_id", "n_tokens")
        .join(cov_stats, "doc_id", "left")
        .join(surv, "doc_id", "left")
        .select(
            F.col("doc_id").alias(id_col),
            "n_tokens",
            F.coalesce("dup_tokens", F.lit(0).cast("bigint")).alias("dup_tokens"),
            F.coalesce("n_islands", F.lit(0).cast("bigint")).alias("n_islands"),
            F.coalesce("n_surviving", F.lit(0).cast("bigint")).alias("n_surviving"),
            F.coalesce("surviving_md5", F.md5(F.lit(""))).alias("surviving_md5"),
        )
    )


def intra_doc_repeated_spans(
    docs: DataFrame,
    k: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Within-document repeated-span report — the INTRA-doc complement of
    ``substring_dedup`` (which marks cross-doc repeats): a k-token span
    occurring 2+ times in the SAME document is template/loop content (the
    span-level generalization of Gopher's duplicate-n-gram-fraction
    rules).  Returns ``(id_col, n_spans, n_repeated_spans,
    max_span_occurrences, repeated_token_frac_micro)`` where the fraction
    counts token positions covered by any repeated span, in integer micro.

    Scale shape: the count aggregation is keyed by (doc_id, md5) — all
    work stays doc-local through the shuffle (no corpus-wide key), then a
    bounded k-per-span coverage explode and one doc agg.
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"), ws_tokens(F.col(text_col)).alias("t")
    )
    base = toks.withColumn("n_tokens", F.size("t").cast("bigint"))
    starts = F.when(
        F.size("t") >= k, F.sequence(F.lit(1), F.size("t") - F.lit(k - 1))
    ).otherwise(F.array().cast("array<int>"))
    spans = base.select(
        "doc_id", "t", F.explode(starts).alias("start_pos")
    ).select(
        "doc_id",
        F.col("start_pos").cast("bigint").alias("start_pos"),
        F.md5(F.array_join(F.slice(F.col("t"), F.col("start_pos"), k), " ")).alias("h"),
    )
    per_span = spans.groupBy("doc_id", "h").agg(
        F.count(F.lit(1)).cast("bigint").alias("occ")
    )
    stats = per_span.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_spans"),
        F.sum(F.when(F.col("occ") >= 2, 1).otherwise(0)).cast("bigint").alias(
            "n_repeated_spans"
        ),
        F.max("occ").cast("bigint").alias("max_span_occurrences"),
    )
    rep_keys = per_span.filter(F.col("occ") >= 2).select("doc_id", "h")
    covered = (
        spans.join(rep_keys, ["doc_id", "h"])
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.col("start_pos"), F.col("start_pos") + F.lit(k - 1))
            ).alias("pos"),
        )
        .distinct()
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("rep_tokens"))
    )
    return (
        base.select("doc_id", "n_tokens")
        .join(stats, "doc_id", "left")
        .join(covered, "doc_id", "left")
        .select(
            F.col("doc_id").alias(id_col),
            F.coalesce("n_spans", F.lit(0).cast("bigint")).alias("n_spans"),
            F.coalesce("n_repeated_spans", F.lit(0).cast("bigint")).alias(
                "n_repeated_spans"
            ),
            F.coalesce("max_span_occurrences", F.lit(0).cast("bigint")).alias(
                "max_span_occurrences"
            ),
            F.expr(
                "coalesce(rep_tokens, 0) * 1000000 div n_tokens"
            ).cast("bigint").alias("repeated_token_frac_micro"),
        )
    )
