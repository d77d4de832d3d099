"""Binary (1-bit) embedding quantization + Hamming-shortlist serving.

The third rung of the repo's quantization ladder (float32 -> int8
``embedding_int8_quantization`` -> PQ codes -> 1 bit/dim here): each
vector component keeps only its SIGN, so a 64-dim float vector becomes a
64-bit code — a 32x storage cut over float32 and the cheapest possible
first-pass scorer (two XOR + popcount per candidate instead of a 64-mult
dot product).  Serving is the standard binary-rescore architecture:
Hamming distance over the packed codes ranks a per-query SHORTLIST, and
only shortlist survivors are re-scored with the exact float cosine — the
same shortlist->rerank shape as ``similarity/pq.pq_search_rerank``.

Why sign bits work: for vectors drawn around the origin,
``P[sign(a_i) != sign(b_i)] = theta(a,b) / pi`` (the Charikar 2002 /
Goemans-Williamson hyperplane identity with the coordinate axes as the
planes), so Hamming distance over sign bits is a consistent estimator of
angular distance — the identity the repo's LSH tier already relies on;
here the "planes" are the basis itself, which costs zero projections.

Packing follows the repo-wide idiom (``multimodal/codecs.py``
image_ahash128 / video_temporal_fingerprint128): 32 bits per bigint word
so no shift ever reaches a sign bit in any engine, built by
posexplode + conditional-sum aggregation — never a dim-subexpression
projection (the Janino-codegen lesson, CLAUDE.md).

100-TB shape: quantization is one row-local explode + one (id, word)
groupBy; the code table is ~dim/8 bytes per vector, so the Hamming scan
reads 32x less than a float scan and stays in whole-stage codegen
(xor + bit_count are JVM intrinsics).  Exact cosine touches only
|queries| x shortlist rows.  Extension beyond the reference (no ANN
surface in bigdata-rags — SURVEY.md §2 extension tier).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bigdata_rags_spark.functions.vectors import as_double_array, dot, norm
from bigdata_rags_spark.similarity.topk import local_topk_prefilter

WORD_BITS = 32


def n_words(dim: int) -> int:
    return math.ceil(dim / WORD_BITS)


def binary_quantize(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Sign-bit codes: (id, w0..w{n-1} bigint) — bit j of word w is 1 iff
    component ``w*32 + j`` is strictly positive (zeros quantize to 0, the
    deterministic tie rule both engines share).

    ROW-LOCAL fold, no shuffle: each word is one ``aggregate(zip_with(
    slice, bit-literals))`` over 32 elements — the `signature_col` family
    of expression (well inside Janino limits; the PQ lesson only bites at
    hundreds of scalar subexpressions).  The first cut packed via
    posexplode + conditional-sum groupBy, and the groupBy SHUFFLE cost
    more than the Hamming sweep saved (measured r12 at 20k vectors:
    binary path 1.5 s vs float brute force 1.0 s warm); as a projection
    the quantizer is free on the scan.  Bit packing never reaches a sign
    bit."""
    nw = n_words(dim)
    vec = as_double_array(F.col(vec_col))
    words = []
    for w in range(nw):
        width = min(WORD_BITS, dim - w * WORD_BITS)
        bits = F.array(*[F.lit(1 << j).cast("long") for j in range(width)])
        seg = F.slice(vec, w * WORD_BITS + 1, width)
        words.append(
            F.aggregate(
                F.zip_with(
                    seg,
                    bits,
                    lambda x, p: F.when(x > 0, p).otherwise(F.lit(0).cast("long")),
                ),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias(f"w{w}")
        )
    return df.select(F.col(id_col), *words)


def _hamming(nw: int, a_prefix: str = "qw", b_prefix: str = "cw") -> F.Column:
    h = F.lit(0).cast("bigint")
    for w in range(nw):
        h = h + F.bit_count(
            F.col(f"{a_prefix}{w}").bitwiseXOR(F.col(f"{b_prefix}{w}"))
        ).cast("bigint")
    return h


def auto_shortlist(n_rows: int, frac_denom: int = 10, floor: int = 50) -> int:
    """Self-scaling Hamming shortlist: max(floor, N // frac_denom) —
    Hamming over sign bits is a COARSE ranking (31 distinct values at 64
    dims), so a fixed shortlist keeps an ever-thinner slice of the
    candidate mass as the corpus grows and recall decays (measured r12:
    recall@5 = 0.31 at 20k rows with the fixture-calibrated 50).  Scaling
    the shortlist with N keeps the kept-mass fraction constant; the
    rerank stage's cost is |Q| x shortlist, still corpus-free.  The
    floor reproduces the driver-fixture value (N=500 at sf0.01 -> 50),
    so oracle hashes are unchanged — the auto_n_planes calibration
    pattern."""
    return max(floor, n_rows // frac_denom)


def binary_hamming_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    shortlist: int | None = None,
    k: int = 5,
) -> DataFrame:
    """Binary-quantized ANN: Hamming shortlist over packed sign codes, then
    exact-cosine rerank of shortlist rows only.

    Returns (query_id, neighbor_id, hamming bigint, similarity, rank int)
    — the k exact-cosine winners among each query's ``shortlist`` lowest
    Hamming codes.  Both stages are fully deterministic (integer Hamming
    with neighbor-id tiebreak; rounded cosine with neighbor-id tiebreak),
    so a SQL oracle replays the whole plan value-for-value.

    Plan: corpus is quantized once (or read pre-quantized at scale) and the
    broadcast query codes sweep it with xor/bit_count only — the 8-byte-per-
    vector scan that replaces the 256-byte float scan.  The per-query window
    keeps ``shortlist`` rows; full vectors are joined back for ONLY those
    rows (the ``pq_search_rerank`` fetch shape), then the exact cosine in
    the oracle's op order (dot / q-norm / c-norm) ranks the final k.
    ``shortlist >= |corpus|`` degenerates to exact brute force — pinned in
    tests as the equivalence anchor.  ``shortlist=None`` self-scales via
    ``auto_shortlist`` (one cheap metadata count, the `auto_n_planes`
    contract)."""
    from pyspark.sql import Window

    # The partition-local pre-top-k only pays off when it can actually
    # shrink the window exchange: it keeps <= |Q| x P x shortlist rows, so
    # with the auto-scaled shortlist (N // 10) any cluster with P >= 10
    # partitions keeps MORE than the |Q| x N it started with and the Arrow
    # hop is pure overhead (measured in the r13 20k probe: 1.0x reduction).
    # Auto mode therefore skips the prune; explicitly-pinned shortlists
    # (the registered query's 50) get the ~N/(P*shortlist)-fold cut.
    prefilter = shortlist is not None
    if shortlist is None:
        shortlist = auto_shortlist(corpus.count())
    nw = n_words(dim)
    qcodes = binary_quantize(queries, id_col, vec_col, dim).select(
        F.col(id_col).alias("query_id"), *[F.col(f"w{w}").alias(f"qw{w}") for w in range(nw)]
    )
    ccodes = binary_quantize(corpus, id_col, vec_col, dim).select(
        F.col(id_col).alias("neighbor_id"),
        *[F.col(f"w{w}").alias(f"cw{w}") for w in range(nw)],
    )
    w_short = Window.partitionBy("query_id").orderBy(
        F.col("hamming"), F.col("neighbor_id")
    )
    # partition-local pre-top-k (VERDICT r12 #2): the r12 probe measured the
    # per-query window EXCHANGE — not Hamming math — as the dominant cost of
    # this sweep; pruning each partition to its own per-query best `shortlist`
    # rows first shrinks the exchange ~N/shortlist-fold with hash-identical
    # output (superset argument in similarity/topk.py).
    scored = (
        F.broadcast(qcodes)
        .crossJoin(ccodes)
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("hamming", _hamming(nw))
        .select("query_id", "neighbor_id", "hamming")
    )
    if prefilter:
        scored = local_topk_prefilter(
            scored,
            ["query_id"],
            [("hamming", True), ("neighbor_id", True)],
            shortlist,
        )
    short = (
        scored.withColumn("h_rank", F.row_number().over(w_short))
        .filter(F.col("h_rank") <= shortlist)
        .select("query_id", "neighbor_id", "hamming")
    )
    qv = queries.select(
        F.col(id_col).alias("query_id"), as_double_array(F.col(vec_col)).alias("qv")
    ).withColumn("qn", norm(F.col("qv")))
    cv = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double_array(F.col(vec_col)).alias("cv")
    ).withColumn("cn", norm(F.col("cv")))
    w_final = Window.partitionBy("query_id").orderBy(
        F.col("similarity").desc(), F.col("neighbor_id")
    )
    return (
        short.join(F.broadcast(qv), "query_id")
        .join(cv, "neighbor_id")
        .withColumn(
            "similarity",
            F.round(dot(F.col("qv"), F.col("cv")) / F.col("qn") / F.col("cn"), 6),
        )
        .withColumn("rank", F.row_number().over(w_final).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "hamming", "similarity", "rank")
    )
