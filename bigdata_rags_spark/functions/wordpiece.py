"""WordPiece merge training (Schuster & Nakajima, "Japanese and Korean
voice search", ICASSP 2012; the BERT tokenizer's training rule) — the third
tokenizer-trainer family next to BPE (`functions/bpe.py`, frequency-argmax
merges) and unigram-LM (`functions/unigram.py`, prune-based).  Extension
beyond the reference, which has no text surface (SURVEY.md §2 extension
tier).

WordPiece differs from BPE ONLY in the merge-selection rule: instead of the
most frequent adjacent pair, it merges the pair maximizing the likelihood
gain score ``count(ab) / (count(a) * count(b))`` — pairs whose parts are
rare relative to their co-occurrence, i.e. the most "surprising" bigrams,
merge first.  Everything else (distinct-word vocab table, bracketed symbol
encoding, leftmost-non-overlapping replace) reuses the BPE machinery, so
the scale shape is identical: training scans the VOCAB (Zipf-bounded), not
the corpus, with one bounded 1-row argmax collect per round.

Engine-exact scoring: the score is a rational; ordering by a float ratio
would be 1-ulp-fragile across engines.  Instead the score is QUANTIZED to
a bigint by floor division — ``score_q = (c_pair * SCALE) DIV (c_l *
c_r)`` with SCALE = 10^9 — which both Spark (`DIV`) and DuckDB (`//`)
compute identically on positive bigints; ties fall back to
(pair_count DESC, left ASC, right ASC).  The quantization changes the
argmax only when two pairs' true scores differ by < 1e-9 relative — and
then both engines still pick the SAME pair, so training is value-hash
exact.  Overflow contract: ``c_pair * SCALE`` must fit a signed bigint;
the trainer checks the corpus symbol total up front and raises with
guidance (at larger corpora pass a smaller ``scale``) instead of
overflowing mid-round under ANSI.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Row
from pyspark.sql import functions as F

from bigdata_rags_spark.functions.bpe import RS, US, _symbols, encode_word

SCORE_SCALE = 1_000_000_000


def train_wordpiece_merges(
    word_counts: DataFrame,
    n_merges: int = 8,
    word_col: str = "word",
    count_col: str = "cnt",
    scale: int = SCORE_SCALE,
) -> DataFrame:
    """Train ``n_merges`` WordPiece merge rules over a (word, count) vocab.

    Returns (merge_round int, sym_left, sym_right, merged, pair_count
    bigint, score_q bigint) — the ordered merge table with the quantized
    likelihood score that selected each merge.  Per round: one vocab-sized
    explode+groupBy for symbol counts, one for pair counts, two
    broadcast-sized joins to attach part counts, one 1-row argmax collect.
    """
    spark = word_counts.sparkSession
    v = (
        word_counts.filter(~F.col(word_col).rlike(f"[{US}{RS}]"))
        .select(
            F.col(word_col).alias("word"),
            F.col(count_col).cast("bigint").alias("cnt"),
            encode_word(F.col(word_col)).alias("enc"),
        )
        .localCheckpoint()
    )
    # overflow guard: every pair count AND every symbol count is bounded by
    # the corpus symbol total, so the score arithmetic stays inside a
    # signed bigint iff BOTH c_pair * scale <= 2^63-1 (numerator) and
    # total^2 <= 2^63-1 (the cl * cr denominator — isqrt(2^63-1) =
    # 3,037,000,499).  Checking only the numerator would admit corpora
    # where two ubiquitous symbols' counts multiply past 2^63 and throw
    # mid-round under ANSI.
    total = v.select(
        F.sum(F.col("cnt") * F.size(_symbols("enc"))).cast("bigint").alias("t")
    ).collect()[0]["t"]
    limit = min((2**63 - 1) // scale, 3_037_000_499)
    if total is not None and total > limit:
        raise ValueError(
            f"corpus symbol total {total} exceeds the bigint-safe bound "
            f"{limit} for scale {scale} (numerator c*scale and denominator "
            "cl*cr must both fit int64); shard the vocab or pass a smaller scale="
        )

    merges: list[Row] = []
    for rnd in range(1, n_merges + 1):
        s = _symbols("enc")
        sym = (
            v.select(F.explode(s).alias("sym"), "cnt")
            .groupBy("sym")
            .agg(F.sum("cnt").cast("bigint").alias("sc"))
        )
        pairs = v.select(
            "cnt",
            F.explode(
                F.arrays_zip(
                    F.slice(s, 1, F.size(s) - 1).alias("l"),
                    F.slice(s, 2, F.size(s) - 1).alias("r"),
                )
            ).alias("p"),
        )
        pc = pairs.groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r")).agg(
            F.sum("cnt").cast("bigint").alias("c")
        )
        top = (
            pc.join(sym.select(F.col("sym").alias("l"), F.col("sc").alias("cl")), "l")
            .join(sym.select(F.col("sym").alias("r"), F.col("sc").alias("cr")), "r")
            .select(
                "l",
                "r",
                "c",
                F.expr(f"c * CAST({scale} AS BIGINT) DIV (cl * cr)").alias("score_q"),
            )
            .orderBy(F.desc("score_q"), F.desc("c"), F.asc("l"), F.asc("r"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        l, r, c, sq = top[0]["l"], top[0]["r"], top[0]["c"], top[0]["score_q"]
        merges.append(
            Row(
                merge_round=rnd,
                sym_left=l,
                sym_right=r,
                merged=l + r,
                pair_count=c,
                score_q=sq,
            )
        )
        v = v.withColumn(
            "enc",
            F.replace(
                F.col("enc"),
                F.lit(f"{US}{l}{RS}{US}{r}{RS}"),
                F.lit(f"{US}{l + r}{RS}"),
            ),
        )
    return spark.createDataFrame(
        merges,
        schema="merge_round int, sym_left string, sym_right string, "
        "merged string, pair_count bigint, score_q bigint",
    )
