"""Deterministic hash-based sampling (exact, reproducible, join-free).

``DataFrame.sample``/``sampleBy`` draw from an RNG seeded per-partition, so
results change under repartitioning and cannot be replayed by another engine.
For training-data pipelines the sample must be REPRODUCIBLE (same rows on
every run, every engine, any partitioning) — so we derive a uniform bucket
from ``md5(salt || ':' || key)`` and keep rows whose bucket clears the
stratum's threshold.  Same idiom as the train/val/test split
(``queries/llm_ops.py::train_test_split_assignment``).

100 TB design: pure row-local column expressions — no shuffle, no join, no
RNG state; filters push down to the scan when keys are scan columns.
Thresholds are integers out of 10_000 (md5 % 10000), so an exact DuckDB
oracle exists and fraction resolution is 0.01%.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BUCKETS = 10_000


def hash_bucket(key: Column, salt: str) -> Column:
    """Deterministic uniform bucket in [0, 10000) from md5 of salt:key."""
    h = F.md5(F.concat(F.lit(f"{salt}:"), key.cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") % BUCKETS


def hash_sample(df: DataFrame, key: Column, fraction: float, salt: str = "s0") -> DataFrame:
    """Keep ~``fraction`` of rows, deterministically by key hash."""
    return df.filter(hash_bucket(key, salt) < int(round(fraction * BUCKETS)))


def stratified_hash_sample(
    df: DataFrame,
    key: Column,
    strata: Column,
    fractions: dict[str, float],
    *,
    default_fraction: float = 0.0,
    salt: str = "s0",
) -> DataFrame:
    """Per-stratum deterministic sampling (``sampleBy`` semantics, replayable).

    ``fractions`` maps stratum value -> keep fraction; strata not listed get
    ``default_fraction``.  The keep decision depends only on (salt, key,
    stratum fraction) — independent of partitioning, row order, and engine.
    """
    threshold = F.lit(int(round(default_fraction * BUCKETS)))
    for value, frac in sorted(fractions.items()):
        threshold = F.when(strata == value, int(round(frac * BUCKETS))).otherwise(threshold)
    return df.withColumn("sample_bucket", hash_bucket(key, salt)).filter(
        F.col("sample_bucket") < threshold
    )


PRIORITY_SCALE = 1 << 40  # matches the 40-bit u: priorities land in weight units


def priority_sample(
    df: DataFrame, key: Column, weight: Column, k: int, salt: str = "ps"
) -> DataFrame:
    """Weighted sampling WITHOUT replacement via priority sampling
    (Duffield, Lund, Thorup, "Priority sampling for estimation of arbitrary
    subset sums", JACM 2007): each row gets priority q = w/u with u uniform
    in (0,1]; the k highest-priority rows form the sample, and with
    tau = the (k+1)-th priority, est_weight = max(w, tau) is an unbiased
    estimator of any subset-sum of the weights.

    Determinism contract (same answer on any engine / any partitioning):
      * u is md5-derived (40-bit integer + 1), never an RNG;
      * priorities are INTEGER-scaled: priority = w * 2^40 div u — exact
        bigint in both engines (w <= ~1e6 keeps the product < 2^63), and
        because u is 40-bit the scaled priority is floor(w / u_real),
        ALREADY in weight units;
      * ordering ties break on the key, so est_weight = max(w, tau) is
        exact bigint with no unit conversion.

    100 TB shape: one row-local expression pass, then a global top-(k+1)
    which Spark executes as TakeOrderedAndProject (per-partition heaps +
    a driver merge of k+1 rows — no global sort, no full shuffle).  The
    window splitting sample rows from the threshold row runs on k+1 rows
    only.  The reference has no sampling surface (SURVEY.md §2).

    Returns the k sample rows: (key, weight, u, priority, est_weight).
    """
    from pyspark.sql import Window

    u = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{salt}:"), key.cast("string"))), 1, 10),
            16,
            10,
        ).cast("bigint")
        + 1
    )  # deterministic uniform integer in [1, 2^40]
    scored = df.select(
        key.alias("key"),
        F.greatest(weight.cast("bigint"), F.lit(1)).alias("weight"),
        u.alias("u"),
    ).withColumn("priority", F.expr(f"weight * {PRIORITY_SCALE}L div u"))
    top = scored.orderBy(F.desc("priority"), F.asc("key")).limit(k + 1)
    rn = F.row_number().over(
        Window.orderBy(F.desc("priority"), F.asc("key"))
    )
    ranked = top.withColumn("rn", rn)
    # tau = the (k+1)-th priority; 0 when the table has <= k rows (then the
    # "sample" is the whole table and est_weight degenerates to the exact w).
    tau = ranked.filter(F.col("rn") == k + 1).groupBy().agg(
        F.coalesce(F.min("priority"), F.lit(0)).cast("bigint").alias("tau")
    )
    return (
        ranked.filter(F.col("rn") <= k)
        .join(F.broadcast(tau))
        .select(
            "key",
            "weight",
            "u",
            "priority",
            F.greatest(F.col("weight"), F.col("tau")).alias("est_weight"),
        )
    )


def epoch_shuffle_plan(
    df: DataFrame,
    key: Column,
    n_epochs: int,
    n_shards: int,
    salt: str = "ep",
) -> DataFrame:
    """Deterministic per-epoch global shuffle + shard layout — the data-
    ordering primitive of a training run (each epoch must visit every row
    exactly once, in an order that is pseudo-random, DIFFERENT per epoch,
    and bit-reproducible for restarts/replays; RNG shuffles are none of
    these under repartitioning).

    Every (row, epoch) gets a sort key ``md5(salt:epoch:key)``; the shard is
    a uniform hash bucket of that key and the position is the rank within
    (epoch, shard) ordered by (sort_key, key).  Returns the input columns
    plus (epoch, shard, pos).

    100 TB shape: shard assignment is row-local (no shuffle); the only
    exchange is the per-(epoch, shard) window sort — exactly the per-shard
    sort the data-loader shards need anyway, never a single global
    total-order.  Writing the result partitioned by (epoch, shard) and
    sorted by pos IS the epoch's input layout.
    """
    from pyspark.sql import Window

    epochs = F.explode(
        F.array(*[F.lit(e) for e in range(n_epochs)])
    ).alias("epoch")
    with_epoch = df.select("*", epochs)
    sk = F.md5(
        F.concat(
            F.lit(f"{salt}:"),
            F.col("epoch").cast("string"),
            F.lit(":"),
            key.cast("string"),
        )
    )
    shard = (
        F.conv(F.substring(sk, 1, 8), 16, 10).cast("bigint") % n_shards
    ).cast("int")
    w = Window.partitionBy("epoch", "shard").orderBy(F.col("__sk"), key)
    return (
        with_epoch.withColumn("__sk", sk)
        .withColumn("shard", shard)
        .withColumn("pos", F.row_number().over(w).cast("bigint"))
        .drop("__sk")
    )


def soft_dedup_sample(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "softdedup",
) -> DataFrame:
    """Cluster-mass-preserving probabilistic dedup ("soft dedup"): instead
    of keeping exactly one document per exact-dup cluster, keep each member
    INDEPENDENTLY with probability ~1/cluster_size, so the expected kept
    mass per cluster is one document but popular content still appears with
    diverse ids/provenance — the sampling-based middle ground between hard
    dedup and no dedup studied in the data-mixing literature (e.g. the
    duplication-aware reweighting ablations of the C4/FineWeb reports).

    Deterministic: the per-doc uniform is a 32-bit md5 bucket (same idiom
    as ``hash_bucket``); keep iff ``u32 * cluster_size < 2^32``, i.e.
    P(keep) = ceil(2^32 / size) / 2^32 — exact integer comparison, no
    floats, replayable by any engine and invariant under partitioning.

    Returns (doc_id, cluster_size, kept int).  Scale shape: one hash
    groupBy for sizes (32-byte keys, partial agg) + one join back on the
    hash; the keep decision is row-local.
    """
    from bigdata_rags_spark.dedup.exact import with_content_hash

    hashed = with_content_hash(df, text_col).select(id_col, "content_hash")
    sizes = hashed.groupBy("content_hash").agg(
        F.count(F.lit(1)).cast("bigint").alias("cluster_size")
    )
    u32 = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("bigint")
    return (
        hashed.join(sizes, "content_hash")
        .select(
            id_col,
            "cluster_size",
            F.when(u32 * F.col("cluster_size") < F.lit(2**32), 1)
            .otherwise(0)
            .cast("int")
            .alias("kept"),
        )
    )


def temperature_mixing_plan(
    df: DataFrame,
    domain_col: str = "source",
    budget_num: int = 1,
    budget_den: int = 2,
) -> DataFrame:
    """Temperature-balanced domain mixing plan (the UniMax / T5 multilingual
    sampling family, temperature tau=2): allocate a corpus budget of
    ``total * budget_num // budget_den`` documents across domains
    proportionally to sqrt(domain size), capped at each domain's actual
    size — big domains get down-weighted, small domains up-weighted, and
    no domain is oversampled past one epoch (the UniMax cap).

    Engine-exact by construction: the tau=2 weight is floor(sqrt(n)) —
    IEEE sqrt is correctly rounded, so floor(sqrt(bigint<2^53)) is
    bit-identical in every engine — and all allocation arithmetic is
    integer floor division.  No float ever crosses an aggregate.

    Returns (domain, n_docs, weight, alloc, rate_micro) where rate_micro =
    alloc * 1e6 // n_docs is the per-domain sampling rate in micro-units.
    Scale shape: one groupBy on the domain key + a broadcast 1-row totals
    join; the plan is domain-cardinality-sized, never corpus-sized.
    """
    d = df.groupBy(F.col(domain_col).alias("domain")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )
    d = d.withColumn("weight", F.floor(F.sqrt(F.col("n_docs"))).cast("bigint"))
    t = d.agg(
        F.sum("n_docs").cast("bigint").alias("total"),
        F.sum("weight").cast("bigint").alias("w_total"),
    )
    return (
        d.crossJoin(F.broadcast(t))
        .withColumn(
            "alloc",
            F.least(
                F.col("n_docs"),
                F.expr(
                    f"(total * {budget_num} DIV {budget_den}) * weight DIV w_total"
                ),
            ).cast("bigint"),
        )
        .withColumn("rate_micro", F.expr("alloc * 1000000 DIV n_docs").cast("bigint"))
        .select("domain", "n_docs", "weight", "alloc", "rate_micro")
    )


def quality_weighted_mixing_plan(
    df: DataFrame,
    domain_col: str = "source",
    quality_col: str = "q_micro",
    budget_num: int = 1,
    budget_den: int = 2,
) -> DataFrame:
    """Quality-weighted temperature mixing (VERDICT r11 next #8 — composes
    the tau=2 ``temperature_mixing_plan`` with a per-doc quality signal):
    per-domain allocation proportional to ``floor(sqrt(n_docs)) *
    mean_quality_micro``, capped at domain size.  A small high-quality
    domain outranks a big low-quality one — the knob curation teams
    actually turn (DoReMi/UniMax-style mixing, but weighted by the
    quality classifier instead of size alone).

    ``df`` carries one row per doc with ``domain_col`` and an integer
    micro-unit quality in ``quality_col`` (e.g.
    ``quality_classifier_scores``'s prob_micro).  All arithmetic is
    bigint: mean quality is ``SUM(q) DIV n``, the weight product stays
    < 2^63 for any real corpus (sqrt(n) <= 3e7 at n=1e15 times q <= 1e6),
    and allocation is the same integer floor division as the unweighted
    plan — value-hash exact, no float crosses an aggregate.

    Returns (domain, n_docs, mean_q_micro, weight, alloc, rate_micro).
    Scale shape: one groupBy on the domain key + a broadcast 1-row totals
    join; domain-cardinality-sized output.
    """
    d = (
        df.groupBy(F.col(domain_col).alias("domain"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(F.col(quality_col)).cast("bigint").alias("__sum_q"),
        )
        .withColumn("mean_q_micro", F.expr("__sum_q DIV n_docs").cast("bigint"))
        .withColumn(
            "weight",
            (F.floor(F.sqrt(F.col("n_docs"))).cast("bigint") * F.col("mean_q_micro"))
            .cast("bigint"),
        )
    )
    t = d.agg(
        F.sum("n_docs").cast("bigint").alias("total"),
        F.sum("weight").cast("bigint").alias("w_total"),
    )
    return (
        d.crossJoin(F.broadcast(t))
        .withColumn(
            "alloc",
            F.least(
                F.col("n_docs"),
                F.expr(
                    f"(total * {budget_num} DIV {budget_den}) * weight DIV w_total"
                ),
            ).cast("bigint"),
        )
        .withColumn("rate_micro", F.expr("alloc * 1000000 DIV n_docs").cast("bigint"))
        .select("domain", "n_docs", "mean_q_micro", "weight", "alloc", "rate_micro")
    )


def sequence_packing_plan(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    seq_len: int = 512,
    n_shards: int = 4,
    salt: str = "pack",
    tokens_col: str | None = None,
) -> DataFrame:
    """GPT-style sequence packing plan (concatenate-then-chunk): documents
    are concatenated in a deterministic pseudo-random order (one EOS token
    between docs), and the stream is cut into fixed ``seq_len``-token
    training sequences — each doc's tokens land at a computable (shard,
    start_seq, seq_offset), docs straddle chunk boundaries exactly as the
    standard causal-LM packer does.  This is the layout step AFTER
    ``epoch_shuffle_plan``: the (shard, start_seq, seq_offset) triple tells
    the tokenizing writer where every document's bytes belong without any
    global coordination.

    Determinism (same contract as the rest of this module): shard and
    order come from md5(salt:id) — reproducible on any engine, any
    partitioning.  Token counts are whitespace tokens + 1 (the EOS
    separator) by default; pass ``tokens_col`` naming a precomputed
    per-doc REAL token count (e.g. ``bpe_encode_documents``'s n_tokens)
    to pack on actual tokenizer output instead — the +1 EOS is still
    added here, so callers supply raw counts either way.

    Returns input ids plus (n_tokens, shard, start_seq, seq_offset), where
    ``start_seq = floor(tokens_before / seq_len)`` and ``seq_offset =
    tokens_before % seq_len`` with tokens_before the shard-stream prefix
    sum.  100 TB shape: shard assignment is row-local; the only exchange
    is the per-shard window prefix-sum — the per-shard sort the packing
    writer needs anyway, never a global total order.
    """
    from pyspark.sql import Window

    from bigdata_rags_spark.functions.text import ws_tokens

    sk = F.md5(F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string")))
    raw_tokens = (
        F.col(tokens_col)
        if tokens_col is not None
        else F.size(ws_tokens(F.col(text_col)))
    )
    base = df.select(
        id_col,
        (raw_tokens + 1).cast("bigint").alias("n_tokens"),
        sk.alias("__sk"),
    ).withColumn(
        "shard",
        (F.conv(F.substring("__sk", 1, 8), 16, 10).cast("bigint") % n_shards).cast(
            "int"
        ),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(F.col("__sk"), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        base.withColumn("__prefix", F.sum("n_tokens").over(w))
        .select(
            id_col,
            "n_tokens",
            "shard",
            F.expr(f"(__prefix - n_tokens) DIV {seq_len}").cast("bigint").alias("start_seq"),
            ((F.col("__prefix") - F.col("n_tokens")) % seq_len)
            .cast("bigint")
            .alias("seq_offset"),
        )
    )


def length_bucket_batching(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    batch_size: int = 8,
    min_bucket: int = 16,
    max_bucket: int = 512,
    n_shards: int = 8,
    salt: str = "lbb",
    tokens_col: str | None = None,
) -> DataFrame:
    """Length-bucketed inference/training batching plan — the padding-waste
    killer: docs are grouped into power-of-two token-length buckets
    (ceil-pow2 of the doc's token count, clamped to [min_bucket,
    max_bucket]) and batched WITHIN a bucket, so a batch never pads to a
    far-off global max.  The standard serving/eval layout step (dynamic
    batching by length).

    Returns (id, n_tokens, bucket_cap, shard, batch_no, pos_in_batch,
    padding, truncated): ``padding = max(0, bucket_cap - n_tokens)`` and
    ``truncated = 1`` for docs longer than ``max_bucket`` (they pad 0 and
    truncate at the cap).  Deterministic on any engine/partitioning: batch
    order inside a (bucket, shard) comes from md5(salt:id), the module-wide
    contract.  ``tokens_col`` supplies REAL tokenizer counts (e.g.
    ``bpe_encode_documents``'s n_tokens); the default is whitespace tokens.

    Integer-exact ceil-pow2 via bit length (the ``length(bin(n-1))``
    idiom — never a float log2).  100 TB shape: bucket/shard assignment is
    row-local; the only exchange is the per-(bucket, shard) rank window —
    sharding bounds any one window partition exactly like
    ``sequence_packing_plan``'s packer streams.
    """
    from pyspark.sql import Window

    from bigdata_rags_spark.functions.text import ws_tokens

    raw_tokens = (
        F.col(tokens_col)
        if tokens_col is not None
        else F.size(ws_tokens(F.col(text_col)))
    )
    sk = F.md5(F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string")))
    base = df.select(
        id_col,
        raw_tokens.cast("bigint").alias("n_tokens"),
        sk.alias("__sk"),
    ).withColumn(
        "bucket_cap",
        F.greatest(
            F.lit(min_bucket).cast("bigint"),
            F.least(
                F.lit(max_bucket).cast("bigint"),
                F.expr(
                    "CASE WHEN n_tokens <= 1 THEN CAST(1 AS BIGINT) "
                    "ELSE shiftleft(CAST(1 AS BIGINT), length(bin(n_tokens - 1))) END"
                ),
            ),
        ),
    ).withColumn(
        "shard",
        (F.conv(F.substring("__sk", 1, 8), 16, 10).cast("bigint") % n_shards).cast("int"),
    )
    w = Window.partitionBy("bucket_cap", "shard").orderBy(F.col("__sk"), F.col(id_col))
    return (
        base.withColumn("__rn", F.row_number().over(w))
        .select(
            id_col,
            "n_tokens",
            "bucket_cap",
            "shard",
            F.expr(f"CAST((__rn - 1) DIV {batch_size} AS BIGINT)").alias("batch_no"),
            F.expr(f"CAST((__rn - 1) % {batch_size} AS INT)").alias("pos_in_batch"),
            F.greatest(F.lit(0).cast("bigint"), F.col("bucket_cap") - F.col("n_tokens")).alias(
                "padding"
            ),
            (F.col("n_tokens") > F.col("bucket_cap")).cast("int").alias("truncated"),
        )
    )


def preference_pairs(
    scored: DataFrame,
    group_col: str = "source",
    id_col: str = "doc_id",
    score_col: str = "z_micro",
) -> DataFrame:
    """Preference-pair construction for reward-model / DPO training data:
    within each group (the shared-prompt proxy — source, cluster, or
    query id), pair the HIGHEST-scored doc (chosen) with the LOWEST
    (rejected) and report the margin.  Groups of one (or where no distinct
    pair exists) are dropped — a pair needs two sides.

    Deterministic tie rules make the pair engine-exact: chosen breaks
    score ties toward the LOWEST id, rejected toward the HIGHEST, so an
    all-tied group still yields two distinct docs.  Implemented as ONE
    hash agg with struct min/max (no sort, no window): the NEGATED SCORE
    leads the struct (scores are numeric micro-units by contract; ids are
    any orderable type — string/UUID keys work, ADVICE r12), so
    min(struct(-score, id)) is (best score, lowest id) and
    max(struct(-score, id)) is (worst score, highest id) — the 100-TB
    shape for per-group argmax.

    Returns (group, chosen_id, rejected_id, chosen_micro, rejected_micro,
    margin_micro, n_docs); id columns keep their input type."""
    agg = (
        scored.select(
            F.col(group_col).alias("grp"),
            F.struct(
                (-F.col(score_col).cast("bigint")).alias("ns"),
                F.col(id_col).alias("id"),
            ).alias("kv"),
        )
        .groupBy("grp")
        .agg(
            F.min("kv").alias("best"),
            F.max("kv").alias("worst"),
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        )
    )
    return (
        agg.select(
            F.col("grp").alias(group_col),
            F.col("best.id").alias("chosen_id"),
            F.col("worst.id").alias("rejected_id"),
            (-F.col("best.ns")).alias("chosen_micro"),
            (-F.col("worst.ns")).alias("rejected_micro"),
            (F.col("worst.ns") - F.col("best.ns")).alias("margin_micro"),
            "n_docs",
        )
        .filter(F.col("chosen_id") != F.col("rejected_id"))
    )


def curriculum_anneal_plan(
    df: DataFrame,
    domain_col: str = "source",
    n_epochs: int = 3,
    budget_num: int = 1,
    budget_den: int = 2,
) -> DataFrame:
    """Epoch-ANNEALED curriculum mixing plan — the multi-epoch extension of
    ``temperature_mixing_plan`` (the UniMax/T5 temperature family): epoch 1
    samples domains proportionally to their natural size (tau = 1), and
    each later epoch applies one more sqrt to the weight (tau = 2, 4, ...),
    flattening the mix toward uniform as training progresses — the public
    multilingual/curriculum schedule that starts on the natural
    distribution and up-weights rare domains in later passes.

    Engine-exact by the same construction: epoch e's weight is
    floor(sqrt(...)) iterated (e-1) times on the bigint domain size —
    IEEE sqrt is correctly rounded and every intermediate is re-floored
    to a bigint < 2^53, so the weight chain is bit-identical in every
    engine; allocation stays integer floor division with the UniMax
    per-domain cap.

    Returns (epoch int, domain, n_docs, weight, alloc, rate_micro) —
    n_epochs x |domains| rows.  Scale shape: ONE corpus groupBy on the
    domain key; the per-epoch weight chain and totals are domain-
    cardinality-sized expressions on that tiny frame.
    """
    d = (
        df.groupBy(F.col(domain_col).alias("domain"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
        # domain-cardinality rows feeding ~2 plan branches PER EPOCH (the
        # per-epoch select + its totals agg): materialize once so the
        # corpus groupBy provably runs once under any planner behavior
        # (the CLAUDE.md multi-branch rule; ADVICE r14 #2)
        .localCheckpoint()
    )
    epochs = []
    w = F.col("n_docs")
    for e in range(1, n_epochs + 1):
        de = d.select(
            F.lit(e).cast("int").alias("epoch"),
            "domain",
            "n_docs",
            w.cast("bigint").alias("weight"),
        )
        t = de.agg(
            F.sum("n_docs").cast("bigint").alias("total"),
            F.sum("weight").cast("bigint").alias("w_total"),
        )
        epochs.append(
            de.crossJoin(F.broadcast(t))
            .withColumn(
                "alloc",
                F.least(
                    F.col("n_docs"),
                    F.expr(
                        f"(total * {budget_num} DIV {budget_den}) * weight DIV w_total"
                    ),
                ).cast("bigint"),
            )
            .select(
                "epoch",
                "domain",
                "n_docs",
                "weight",
                "alloc",
                F.expr("alloc * 1000000 DIV n_docs").cast("bigint").alias("rate_micro"),
            )
        )
        w = F.floor(F.sqrt(w)).cast("bigint")
    out = epochs[0]
    for de in epochs[1:]:
        out = out.unionByName(de)
    return out
