"""BPE merge-rule training (Sennrich, Haddow, Birch, "Neural Machine
Translation of Rare Words with Subword Units", ACL 2016 §3.2) — the real
tokenizer-training step behind the repo's "BPE-ish" token counting
(`token_count_stats`); extension beyond the reference, which has no text
surface (SURVEY.md §2 extension tier; VERDICT r8 #7 / r9 gap #3).

Algorithm: start from the character sequence of every distinct word (plus
an end-of-word marker), then repeatedly (a) count adjacent symbol pairs
across the corpus weighted by word frequency, (b) merge the single most
frequent pair everywhere.  The merge LIST, in order, is the trained
tokenizer.

Scale shape (why this is feasible at 100 TB): training never touches the
corpus after one initial scan — it operates on the DISTINCT-WORD frequency
table (vocab rows, not corpus rows; Zipf makes this millions of rows for a
petabyte of text).  Each merge round is one explode+groupBy over the vocab
plus a 1-row TakeOrderedAndProject argmax — the bounded-driver-action
contract shared with FPS sampling and k-means training.  The vocab table is
localCheckpoint'ed once so rounds re-scan vocab, never the corpus.

Determinism: the argmax tiebreak is (count DESC, left ASC, right ASC) and
merge application is leftmost-first non-overlapping — both engines replay
it exactly (see _ENC below), so the whole training run is value-hash exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Row
from pyspark.sql import functions as F

# Symbols are stored BRACKETED — \x1f sym \x1e per symbol, concatenated —
# so the merge of pair (a, b) is one literal string replace of
# "\x1f a \x1e \x1f b \x1e" with "\x1f ab \x1e".  The brackets share no
# boundary character between adjacent symbols, which makes engine-native
# replace() (non-overlapping, leftmost-first in both Spark and DuckDB)
# EXACTLY the greedy left-to-right BPE merge: with a single separator
# (space-joined), replacing " a a " in " a a a a " consumes the shared
# trailing space and silently skips the second merge — the classic
# off-by-one that bracketing eliminates.
US = "\x1f"  # symbol start
RS = "\x1e"  # symbol end
EOW = "</w>"  # end-of-word marker (Sennrich §3.2)


def encode_word(word_col) -> F.Column:
    """word -> bracketed initial symbol string: every char a symbol, plus
    the end-of-word marker."""
    return F.concat(
        F.regexp_replace(word_col, "(.)", f"{US}$1{RS}"), F.lit(f"{US}{EOW}{RS}")
    )


def encode_word_bytes(word_col) -> F.Column:
    """word -> bracketed BYTE-level initial symbols (GPT-2-style byte
    fallback, VERDICT r13 next #5): the word's UTF-8 bytes render as
    two-hex-char symbols ('61', 'C3', ...), plus the end-of-word marker.

    Why bytes: the char-level ``encode_word`` seeds the vocabulary from
    the TRAINING corpus's characters, so a serving document containing an
    out-of-alphabet character has no guaranteed encoding under a frozen
    vocab.  The byte alphabet is CLOSED (exactly 256 symbols + EOW), so
    ``byte_vocab`` covers every possible input by construction and any
    unicode text encodes — and round-trips — losslessly.  Bonus safety: a
    word containing a literal '</w>' (which corrupts char-level decode)
    is hex-encoded here ('3C2F773E'), so the only literal EOW markers in
    the symbol stream are the appended ones."""
    return F.concat(
        F.regexp_replace(
            F.upper(F.hex(F.encode(word_col, "UTF-8"))), "(..)", f"{US}$1{RS}"
        ),
        F.lit(f"{US}{EOW}{RS}"),
    )


def _symbols(enc) -> F.Column:
    """Bracketed string -> array<string> of symbols."""
    return F.split(F.expr(f"trim(BOTH '{US}{RS}' FROM {enc})"), f"{RS}{US}")


def _bracket_safe(word_counts: DataFrame, word_col: str, encoder) -> DataFrame:
    """Drop words whose raw characters would collide with the \\x1f/\\x1e
    symbol delimiters — needed ONLY for the char-level encoder (each raw
    char becomes a symbol, so a literal delimiter corrupts the bracketed
    string).  The byte-level encoder hex-renders every byte ('1F', '1E'),
    so collisions are impossible and filtering would break its closed-
    alphabet "any unicode round-trips" guarantee (ADVICE r14 #1)."""
    if encoder is encode_word_bytes:
        return word_counts
    return word_counts.filter(~F.col(word_col).rlike(f"[{US}{RS}]"))


def train_bpe_merges(
    word_counts: DataFrame,
    n_merges: int = 8,
    word_col: str = "word",
    count_col: str = "cnt",
    encoder=encode_word,
) -> DataFrame:
    """Train ``n_merges`` BPE merge rules over a (word, count) vocabulary.

    Returns a DataFrame (merge_round int, sym_left, sym_right, merged,
    pair_count bigint) — the ordered merge table.  Each round runs one
    vocab-sized explode+groupBy and collects exactly ONE row (the argmax
    pair); the updated vocab encoding is a single string replace.  Under
    the CHAR-level encoder, words containing the bracket control
    characters are excluded up front (a literal \\x1f/\\x1e char symbol
    would corrupt the bracketed encoding); the BYTE-level encoder needs no
    filter — its symbols are hex pairs, which can never collide with the
    delimiters, so the closed-alphabet lossless guarantee really does
    cover ANY input (ADVICE r14 #1).
    """
    spark = word_counts.sparkSession
    v = (
        _bracket_safe(word_counts, word_col, encoder)
        .select(
            F.col(word_col).alias("word"),
            F.col(count_col).cast("bigint").alias("cnt"),
            encoder(F.col(word_col)).alias("enc"),
        )
        .localCheckpoint()  # materialize the vocab once; rounds never re-scan upstream
    )

    merges: list[Row] = []
    for rnd in range(1, n_merges + 1):
        s = _symbols("enc")
        pairs = v.select(
            "cnt",
            F.explode(
                F.arrays_zip(
                    F.slice(s, 1, F.size(s) - 1).alias("l"),
                    F.slice(s, 2, F.size(s) - 1).alias("r"),
                )
            ).alias("p"),
        )
        top = (
            pairs.groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("cnt").cast("bigint").alias("c"))
            .orderBy(F.desc("c"), F.asc("l"), F.asc("r"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        l, r, c = top[0]["l"], top[0]["r"], top[0]["c"]
        merges.append(
            Row(
                merge_round=rnd,
                sym_left=l,
                sym_right=r,
                merged=l + r,
                pair_count=c,
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
        "merged string, pair_count bigint",
    )


def apply_bpe_merges(
    word_counts: DataFrame,
    merges: list[tuple[str, str]],
    word_col: str = "word",
    count_col: str = "cnt",
    encoder=encode_word,
) -> DataFrame:
    """Segment a (word, count) vocabulary with an ORDERED merge list — the
    serving half of BPE (train once with ``train_bpe_merges``, apply the
    frozen rules everywhere; Sennrich §3.2 applies merges "in the order
    they were learned").

    Returns (word, cnt, subwords array<string>).  Application is the same
    bracketed-replace per rule as training — one chained string expression,
    no per-round job, no UDF: applying a 32k-rule tokenizer to 100 TB of
    vocab is a single scan with a deep-but-codegen-friendly replace chain
    (each replace is a literal substring scan).
    """
    enc = encoder(F.col(word_col))
    for l, r in merges:
        enc = F.replace(
            enc, F.lit(f"{US}{l}{RS}{US}{r}{RS}"), F.lit(f"{US}{l + r}{RS}")
        )
    base = _bracket_safe(word_counts, word_col, encoder).select(
        F.col(word_col).alias("word"),
        F.col(count_col).cast("bigint").alias("cnt"),
        enc.alias("__enc"),
    )
    return base.select("word", "cnt", _symbols("__enc").alias("subwords"))


def bpe_encode_documents(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus-scale tokenizer ENCODE — apply a FROZEN ordered merge list to
    every document, producing per-doc token-id sequences (the missing
    middle link of train -> ENCODE -> pack; VERDICT r11 next #2).

    Returns (doc_id, n_words bigint, n_tokens bigint, token_ids string —
    comma-joined ids in document order).  Ids are comma-joined because the
    driver's pandas array-cell encoding differs between engines (the
    ``collect_sorted_lists`` convention).

    Token ids: the vocab is the corpus's own subword inventory under the
    frozen rules, ranked by subword string (dense, deterministic, replayable
    in ANSI SQL).  A production tokenizer would ship its frozen id table
    instead — the plumbing is identical (swap the ``vocab`` frame for the
    shipped one); what matters here is that ids are stable across engines
    and partitionings.

    100-TB shape: the corpus is scanned ONCE to split words
    (``posexplode``, row-local).  Everything merge-related happens on the
    DISTINCT-WORD table (Zipf: millions of rows for a petabyte of text):
    one chained-replace segmentation pass, one vocab ranking (single
    window over the SUBWORD inventory — vocab-bounded by construction,
    same contract as the trainer's argmax collects).  The word -> ids
    dictionary is then broadcast back onto the corpus word stream (a
    dictionary-encode join: the corpus side never shuffles), and per-doc
    sequences reassemble with one groupBy(doc_id) whose arrays are
    doc-length-bounded.  No UDFs anywhere — the whole encode is
    codegen-friendly built-ins.
    """
    from pyspark.sql import Window

    from bigdata_rags_spark.functions.text import ws_tokens

    word_sub = bpe_word_segmentation(docs, merges, id_col, text_col)
    return encode_documents_from_word_pieces(docs, word_sub, id_col, text_col)


def bpe_word_segmentation(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The corpus's DISTINCT-WORD segmentation under frozen merge rules:
    (word, spos int, subword) — the ordered per-word piece table every
    encode/decode stage keys off.  Vocab-bounded by construction."""
    from bigdata_rags_spark.functions.text import ws_tokens

    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(ws_tokens(F.col(text_col))).alias("wpos", "word"),
    )
    words = toks.groupBy("word").agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    seg = apply_bpe_merges(words, merges)
    return seg.select("word", F.posexplode("subwords").alias("spos", "subword"))


def subword_vocab(word_sub: DataFrame) -> DataFrame:
    """Dense deterministic token ids for a segmentation's subword
    inventory: (subword, token_id bigint), ranked by subword string.  One
    unpartitioned window over the DISTINCT subwords — vocab-bounded, the
    documented single-partition exception shared with the trainers."""
    from pyspark.sql import Window

    return (
        word_sub.select("subword")
        .distinct()
        .withColumn(
            "token_id",
            F.row_number().over(Window.orderBy("subword")).cast("bigint"),
        )
    )


def decode_token_ids(
    encoded: DataFrame,
    vocab: DataFrame,
    id_col: str = "doc_id",
    ids_col: str = "token_ids",
) -> DataFrame:
    """DETOKENIZE: (doc_id, token_ids 'i,j,k') + (subword, token_id) back
    to the per-doc character stream — (doc_id, decoded string), subwords
    concatenated in sequence order.  The serving inverse of
    ``encode_documents_from_word_pieces``; word boundaries are not encoded
    (no end-of-word marker in this vocab), so the decode target is the
    document's word stream with whitespace elided — exactly what the
    round-trip audit compares against.

    Scale shape: one row-local split+posexplode of the id CSV, one
    broadcast join against the vocab-sized id table, one per-doc ordered
    reassembly — the same dictionary-encode join as the encoder, run in
    reverse."""
    ids = encoded.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(
            F.transform(F.split(F.col(ids_col), ","), lambda s: s.cast("bigint"))
        ).alias("tpos", "token_id"),
    )
    return (
        ids.join(F.broadcast(vocab), "token_id")
        .groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("tpos", "subword"))),
                    lambda s: s["subword"],
                ),
                "",
            ).alias("decoded")
        )
    )


def byte_vocab(spark, merges: list[tuple[str, str]]) -> DataFrame:
    """The FROZEN byte-level token-id table: the closed 256-symbol byte
    alphabet ('00'..'FF') + the end-of-word marker + one product symbol
    per merge rule, ranked by subword string (the ``subword_vocab``
    convention).  Built from literals — no corpus scan — and COMPLETE by
    construction: every segmentation under ``encode_word_bytes`` +
    ``merges`` emits only symbols from this set, so a frozen-vocab encode
    can never drop an out-of-alphabet piece (the byte-fallback
    guarantee)."""
    from pyspark.sql import Window

    base = spark.range(256).select(
        F.format_string("%02X", F.col("id").cast("int")).alias("subword")
    )
    extra = [EOW] + [l + r for l, r in merges]
    syms = base.unionByName(
        spark.createDataFrame([(s,) for s in extra], "subword string")
    ).distinct()
    return syms.withColumn(
        "token_id", F.row_number().over(Window.orderBy("subword")).cast("bigint")
    )


def bpe_encode_documents_bytes(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Byte-fallback corpus ENCODE (VERDICT r13 next #5): like
    ``bpe_encode_documents`` but over ``encode_word_bytes`` symbols and
    the FROZEN ``byte_vocab`` id table, so ANY unicode document — symbols
    in the training alphabet or not — encodes losslessly.  Same scale
    shape: one corpus scan, all merge work on the distinct-word table,
    dictionary-encode join back onto the word stream."""
    from bigdata_rags_spark.functions.text import ws_tokens

    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(ws_tokens(F.col(text_col))).alias("wpos", "word"),
    )
    words = toks.groupBy("word").agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    seg = apply_bpe_merges(words, merges, encoder=encode_word_bytes)
    word_sub = seg.select("word", F.posexplode("subwords").alias("spos", "subword"))
    return encode_documents_from_word_pieces(
        docs,
        word_sub,
        id_col,
        text_col,
        vocab=byte_vocab(docs.sparkSession, merges),
    )


def decode_byte_token_ids(
    encoded: DataFrame,
    vocab: DataFrame,
    id_col: str = "doc_id",
    ids_col: str = "token_ids",
) -> DataFrame:
    """Byte-level DETOKENIZE: token ids -> hex symbol stream -> (EOW
    markers become the space byte '20') -> unhex -> UTF-8 — reconstructing
    the document's space-joined word stream EXACTLY (one trailing space
    from the final EOW is dropped).  Stronger than the char-level decode
    contract: word boundaries AND every non-ASCII character survive."""
    ids = encoded.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(
            F.transform(F.split(F.col(ids_col), ","), lambda s: s.cast("bigint"))
        ).alias("tpos", "token_id"),
    )
    hexed = (
        ids.join(F.broadcast(vocab), "token_id")
        .groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("tpos", "subword"))),
                    lambda s: s["subword"],
                ),
                "",
            ).alias("hx")
        )
    )
    return (
        hexed.withColumn(
            "__txt",
            F.decode(
                F.unhex(F.replace(F.col("hx"), F.lit(EOW), F.lit("20"))), "UTF-8"
            ),
        )
        .select(
            "doc_id",
            F.expr("substring(__txt, 1, length(__txt) - 1)").alias("decoded"),
        )
    )


def encode_documents_from_word_pieces(
    docs: DataFrame,
    word_sub: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab: DataFrame | None = None,
) -> DataFrame:
    """Shared ENCODE tail for every tokenizer family: given an ORDERED
    per-word segmentation ``word_sub (word, spos int, subword)`` — from
    BPE/WordPiece merge replay or the unigram greedy decode — rank the
    emitted subword inventory into token ids, broadcast the word -> ids
    dictionary onto the corpus word stream, and reassemble per-doc
    sequences in (word position, subword position) order.  Words absent
    from ``word_sub`` (e.g. over the trainer's length cap) are dropped
    from the stream in both engines; ``n_words`` counts ENCODED words."""
    from bigdata_rags_spark.functions.text import ws_tokens

    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(ws_tokens(F.col(text_col))).alias("wpos", "word"),
    )
    # vocab ranking: one unpartitioned window over the DISTINCT subword
    # inventory — vocab-bounded (never corpus-bounded), the documented
    # single-partition exception shared with the tokenizer trainers.
    # A caller-supplied FROZEN vocab (the byte-fallback ``byte_vocab``)
    # replaces the corpus-derived one; coverage is then the caller's
    # contract (the byte alphabet satisfies it by construction).
    if vocab is None:
        vocab = subword_vocab(word_sub)
    wid = (
        word_sub.join(F.broadcast(vocab), "subword")
        .groupBy("word")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("spos", "token_id"))),
                lambda s: s["token_id"],
            ).alias("ids")
        )
    )
    return (
        toks.join(F.broadcast(wid), "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("wpos", "ids"))),
                    lambda s: s["ids"],
                )
            ).alias("__ids"),
        )
        .select(
            "doc_id",
            "n_words",
            F.size("__ids").cast("bigint").alias("n_tokens"),
            F.array_join("__ids", ",").alias("token_ids"),
        )
    )
