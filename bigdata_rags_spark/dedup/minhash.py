"""MinHash + LSH near-duplicate detection, fully declarative and portable.

Design (the classic shingle -> minhash -> band -> bucket-join pipeline, e.g.
Broder 1997 / MMDS ch.3, expressed Spark-first):

1. tokens:    distinct words per doc (explode).
2. minhash:   for hash seed s, h_s(doc) = MIN over tokens of
              ``substr(md5(s || ':' || token), 1, 16)``.  The 16-hex-char
              prefix compares lexicographically exactly like the number it
              encodes, so ``MIN(hex)`` IS the minhash — no bigint casts, and
              md5 gives identical bytes in every engine (the whole pipeline
              is therefore DuckDB-oracle-checkable, unlike hash functions
              private to one engine).
3. bands:     concatenate ``rows_per_band`` consecutive minhashes (ordered
              by seed) into a band key.
4. candidates: docs sharing any (band_id, band_key) — a groupBy/self-join on
              the band key, i.e. the only shuffle keys are tiny hashes, never
              the documents.
5. verify:    exact shingle-Jaccard on the (small) candidate set.

Scale: |docs| x num_hashes intermediate rows, all narrow; the band join's
fan-out is bounded by true near-duplicate cluster sizes.  No UDFs anywhere —
everything is codegen'd string/array expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bigdata_rags_spark.functions.text import word_shingles, ws_tokens


def _doc_tokens(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(ws_tokens(F.col(text_col)))).alias("token"),
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 12,
) -> DataFrame:
    """(doc_id, seed, minhash) — one row per doc per hash function."""
    toks = _doc_tokens(df, id_col, text_col)
    seeded = toks.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(num_hashes - 1))).alias("seed"),
        "token",
    )
    h = F.substring(
        F.md5(F.concat(F.col("seed").cast("string"), F.lit(":"), F.col("token"))), 1, 16
    )
    return (
        seeded.withColumn("h", h)
        .groupBy("doc_id", "seed")
        .agg(F.min("h").alias("minhash"))
    )


def lsh_bands(
    signatures: DataFrame, rows_per_band: int = 2
) -> DataFrame:
    """(doc_id, band, band_key): band key = seed-ordered concat of the band's
    minhashes."""
    return (
        signatures.withColumn("band", F.floor(F.col("seed") / rows_per_band).cast("int"))
        .groupBy("doc_id", "band")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("seed", "minhash"))),
                    lambda x: x["minhash"],
                ),
                "",
            ).alias("band_key")
        )
    )


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 12,
    rows_per_band: int = 2,
) -> DataFrame:
    """Distinct candidate near-dup pairs (doc_a < doc_b) sharing >=1 band."""
    bands = lsh_bands(minhash_signatures(df, id_col, text_col, num_hashes), rows_per_band)
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact k-gram-shingle Jaccard similarity for all pairs sharing >=1
    shingle; keeps pairs with jaccard >= threshold.

    The shingle self-join is the scalable trick: pairs that share nothing
    never meet, so the quadratic blowup is bounded by shingle collision
    rates, not |docs|^2.  Jaccard is computed on rounded doubles so the
    threshold boundary is engine-deterministic.
    """
    shingled = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.array_distinct(word_shingles(ws_tokens(F.col(text_col)), k))
        ).alias("shingle"),
    )
    sizes = shingled.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    a, b = shingled.alias("a"), shingled.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("intersection"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_shingles").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_shingles").alias("nb"))
    # plain joins on doc_id: `sizes` is |docs|-sized (never broadcastable at
    # scale); AQE broadcasts the small candidate side at runtime instead
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("intersection")
                / (F.col("na") + F.col("nb") - F.col("intersection")).cast("double"),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "intersection", "jaccard")
    )
