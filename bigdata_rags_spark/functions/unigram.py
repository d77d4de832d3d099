"""Unigram-LM (SentencePiece-style) tokenizer training — the prune-based
sibling of BPE merge training (Kudo, "Subword Regularization", ACL 2018 §3;
`functions/bpe.py` is the merge-based branch; VERDICT r10 #5).  Extension
tier: the reference (dag-transform.py) has no text surface.

Algorithm (hard-EM variant, engine-exact by construction): seed a candidate
piece inventory with every substring of length 1..L of the distinct-word
vocabulary (weighted by word frequency, low-frequency multi-char seeds cut);
then repeat: segment every word with the CURRENT inventory (E-step, hard
assignment), count each piece's segmentation usage (M-step), and prune the
lowest-usage quarter of the multi-char pieces (single characters are the
coverage alphabet and are never pruned).  The surviving inventory with its
final usage counts IS the trained tokenizer.

Where this deviates from Kudo 2018 and why: the E-step decodes with GREEDY
LONGEST-PREFIX match (WordPiece-style) instead of Viterbi over float log
probabilities, and the M-step scores pieces by integer usage mass instead
of likelihood loss.  Both substitutions keep every intermediate an integer
with a total deterministic order, so a SQL oracle replays the whole
training run bit-for-bit (the same trade the repo's k-means/PQ family makes
via fixed codebooks) — a float Viterbi would be rows-only forever.

Scale shape (the BPE contract, `functions/bpe.py` module docstring): the
corpus is scanned ONCE to build the (word, cnt) vocabulary; training then
touches only vocab-sized tables.  The piece inventory is collected to the
driver between rounds — vocab-bounded by the same argument SentencePiece
itself relies on (the inventory must fit in RAM to train; raise
``min_count`` to thin the seed set on petabyte vocabularies), and shipped
to executors in the segmentation closure like a broadcast codebook.  Each
E-step is one Arrow ``mapInPandas`` pass over the vocab (per-word greedy
match against an in-memory set — no shuffle until the usage groupBy).
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def seed_pieces(
    word_counts: DataFrame,
    max_piece_len: int = 4,
    min_count: int = 2,
    word_col: str = "word",
    count_col: str = "cnt",
) -> DataFrame:
    """(piece, seed_count): every substring of length 1..``max_piece_len``
    of every vocabulary word, seed_count = sum over words of word count x
    occurrence positions.  Multi-char pieces below ``min_count`` are cut;
    ALL single characters are kept (coverage alphabet)."""
    w = word_counts.select(
        F.col(word_col).alias("word"), F.col(count_col).cast("bigint").alias("cnt")
    )
    sub = w.select(
        "cnt",
        F.explode(F.sequence(F.lit(1), F.length("word"))).alias("pos"),
        F.col("word"),
    ).select(
        "cnt",
        F.explode(
            F.sequence(
                F.lit(1),
                F.least(F.lit(max_piece_len), F.length("word") - F.col("pos") + 1),
            )
        ).alias("plen"),
        F.expr("substring(word, pos, plen)").alias("piece"),
    )
    agg = sub.groupBy("piece").agg(F.sum("cnt").cast("bigint").alias("seed_count"))
    return agg.filter(
        (F.length("piece") == 1) | (F.col("seed_count") >= min_count)
    )


def greedy_segment_usage(
    word_counts: DataFrame,
    pieces: list[str],
    max_piece_len: int = 4,
    word_col: str = "word",
    count_col: str = "cnt",
) -> DataFrame:
    """(piece, usage, n_words) from greedy longest-prefix segmentation of
    every vocabulary word against ``pieces``: at each position take the
    longest inventory piece prefixing the remainder (ties impossible — one
    candidate per length), usage = sum of word counts per chosen
    occurrence.  Single-char fallback guarantees total coverage.  One
    Arrow pass over the vocab; the piece set rides the closure
    (broadcast-codebook contract)."""
    import pandas as pd

    pset = frozenset(pieces)
    cap = max_piece_len

    def seg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for word, cnt in zip(pdf["word"], pdf["cnt"]):
                pos, n = 0, len(word)
                while pos < n:
                    for plen in range(min(cap, n - pos), 0, -1):
                        cand = word[pos : pos + plen]
                        if cand in pset:
                            out.append((cand, int(cnt), word))
                            pos += plen
                            break
                    else:  # char outside the alphabet: emit it bare
                        out.append((word[pos], int(cnt), word))
                        pos += 1
            yield pd.DataFrame(out, columns=["piece", "cnt", "word"])

    emitted = word_counts.select(
        F.col(word_col).alias("word"), F.col(count_col).cast("bigint").alias("cnt")
    ).mapInPandas(seg, "piece string, cnt long, word string")
    return emitted.groupBy("piece").agg(
        F.sum("cnt").cast("bigint").alias("usage"),
        F.countDistinct("word").cast("bigint").alias("n_words"),
    )


def greedy_segment_pieces(
    word_counts: DataFrame,
    pieces: list[str],
    max_piece_len: int = 4,
    max_word_len: int = 16,
    word_col: str = "word",
) -> DataFrame:
    """ORDERED greedy longest-prefix segmentation: (word, spos int, piece)
    for every word of the vocabulary, spos the 1-based char offset of each
    chosen piece — the serving-side sibling of ``greedy_segment_usage``
    (which aggregates away order), feeding the document ENCODE tail.  Same
    rules: longest inventory prefix wins, single-char fallback, words
    longer than ``max_word_len`` excluded (the trainer's cap — both
    engines apply it identically)."""
    import pandas as pd

    pset = frozenset(pieces)
    cap = max_piece_len

    def seg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for word in pdf["word"]:
                pos, n = 0, len(word)
                while pos < n:
                    for plen in range(min(cap, n - pos), 0, -1):
                        cand = word[pos : pos + plen]
                        if cand in pset:
                            out.append((word, pos + 1, cand))
                            pos += plen
                            break
                    else:
                        out.append((word, pos + 1, word[pos]))
                        pos += 1
            yield pd.DataFrame(out, columns=["word", "spos", "piece"])

    return (
        word_counts.select(F.col(word_col).alias("word"))
        .filter((F.length("word") >= 1) & (F.length("word") <= max_word_len))
        .distinct()
        .mapInPandas(seg, "word string, spos int, piece string")
    )


def train_unigram_pieces(
    word_counts: DataFrame,
    n_prune_rounds: int = 2,
    max_piece_len: int = 4,
    min_count: int = 2,
    prune_denom: int = 4,
    max_word_len: int = 16,
    word_col: str = "word",
    count_col: str = "cnt",
) -> DataFrame:
    """Train a unigram piece inventory: seed -> ``n_prune_rounds`` x
    (segment, count usage, prune floor(n_multi/``prune_denom``) lowest-usage
    multi-char pieces, ties (usage ASC, piece ASC)) -> final segmentation.

    Returns (piece, piece_len int, usage bigint, n_words bigint) for every
    SURVIVING piece — usage/n_words from the final-inventory segmentation
    (0 for survivors the final greedy decode never picks).  Words longer
    than ``max_word_len`` are excluded up front (both engines apply the
    identical cap; the driver fixtures top out at 8 chars)."""
    wc = (
        word_counts.select(
            F.col(word_col).alias("word"), F.col(count_col).cast("bigint").alias("cnt")
        )
        .filter((F.length("word") >= 1) & (F.length("word") <= max_word_len))
        .localCheckpoint()  # vocab materialized once; rounds never re-scan upstream
    )
    seeds = seed_pieces(wc, max_piece_len=max_piece_len, min_count=min_count)
    # vocab-bounded collect (see module docstring); sort only for determinism
    pieces = sorted(r["piece"] for r in seeds.select("piece").collect())
    for _ in range(n_prune_rounds):
        usage_rows = greedy_segment_usage(
            wc, pieces, max_piece_len=max_piece_len
        ).collect()
        usage = {r["piece"]: r["usage"] for r in usage_rows}
        multi = [p for p in pieces if len(p) > 1]
        k = len(multi) // prune_denom
        drop = set(sorted(multi, key=lambda p: (usage.get(p, 0), p))[:k])
        pieces = [p for p in pieces if p not in drop]
    spark = word_counts.sparkSession
    inventory = spark.createDataFrame([(p,) for p in pieces], "piece string")
    final = greedy_segment_usage(wc, pieces, max_piece_len=max_piece_len)
    return (
        inventory.join(final, "piece", "left")
        .select(
            "piece",
            F.length("piece").cast("int").alias("piece_len"),
            F.coalesce(F.col("usage"), F.lit(0)).cast("bigint").alias("usage"),
            F.coalesce(F.col("n_words"), F.lit(0)).cast("bigint").alias("n_words"),
        )
    )
