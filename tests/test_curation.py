"""Planted-corpus tests for the curation capstone funnel
(`pipelines/curation.py`): every gate must provably remove at least one
document, for a known reason (VERDICT r14 next #2's done-criterion).

The planted word inventory is NB-bucket-collision-checked: seed stopwords
occupy disjoint md5%64 buckets per class (bucket 1 is shared by 'a'/'el',
so neither appears in seed text), filler words hash outside every seed
bucket, and the two seed classes carry EQUAL token mass (18 vs 18) so
unseen-word buckets weigh exactly 0 — making each planted doc's NB score
sign hand-computable.
"""

import hashlib

import pytest
from pyspark.sql import functions as F

# class-1 (en) and class-0 (es) seed stopwords — bucket-disjoint by design
_EN = ["the", "and", "of", "to", "in", "is", "it", "you", "that"]
_ES = ["la", "que", "un", "ser", "no", "se", "de", "y", "en"]
# filler words verified to hash outside every seed bucket
_FILLERS = [
    "quick", "fox", "extra", "tail", "arrive", "alpha", "gamma", "delta",
    "epsilon", "runs", "today", "now", "kiwi", "mango", "cherry", "lemon",
    "melon", "peach", "pear", "lime", "maple", "cedar", "birch", "pine",
    "river", "storm", "ember", "mist", "dawn",
]

_T13 = "the quick fox and in of to is that now"

_ROWS = [
    # probes (doc_id < 5) double as NB seed (even ids): 2 en + later 1 es
    (0, "en", "srcA", "alpha gamma delta epsilon the and of to in"),
    (2, "es", "srcA", "la que un ser no se de y en"),
    (4, "en", "srcA", "the and of to in is it you that"),
    # es seed outside the probe range (drops at quality: all class-0 tokens)
    (6, "es", "srcA", "que la un ser no se de y en"),
    # contaminated: shares 3 distinct 3-gram shingles with probe doc 0
    (7, "en", "srcA", "alpha gamma delta epsilon the fox runs today now quick"),
    # no stopwords from any list -> langid 'unknown'
    (9, "zh", "srcA", "中文 文本 测试 数据 文档 示例 内容 样本 语料 资料"),
    # all class-0 tokens -> negative NB score (passes langid as 'es')
    (11, "es", "srcA", "la que un ser no la que un ser no"),
    (13, "en", "srcA", _T13),
    (15, "en", "srcA", _T13),  # exact duplicate of 13 -> dies at dedup
    # same FIRST-8 tokens as 13, different tail -> prefix dup, dies at dedup
    (17, "en", "srcA", "the quick fox and in of to is extra tail arrive"),
    # clean survivors, all 10 tokens, distinct prefixes, exactly one probe
    # shingle hit each ('the and of')
    (19, "en", "srcA", "the and of kiwi mango in to is it cherry"),
    (21, "en", "srcA", "the and of lemon melon in to is it peach"),
    (23, "en", "srcA", "the and of pear lime in to is it maple"),
    (25, "en", "srcA", "the and of cedar birch in to is it pine"),
    (27, "en", "srcA", "the and of river storm in to is it ember"),
    (31, "en", "srcB", "the and of mist dawn in to is it arrive"),
    (33, "en", "srcB", "the and of extra tail in to is it runs"),
]


def _bucket(w: str) -> int:
    return int(hashlib.md5(w.encode()).hexdigest()[:4], 16) % 64


def test_planted_word_buckets_are_collision_free():
    """Precondition the score-sign reasoning relies on: seed classes in
    disjoint buckets, fillers outside every seed bucket, equal seed mass."""
    en_b = {_bucket(w) for w in _EN}
    es_b = {_bucket(w) for w in _ES}
    assert not (en_b & es_b)
    seed_b = en_b | es_b
    assert all(_bucket(w) not in seed_b for w in _FILLERS)
    assert len(_EN) == len(_ES)  # equal class token mass x2 seed docs each


def _pages(spark):
    docs = spark.createDataFrame(_ROWS, ["doc_id", "lang", "source", "text"])
    return docs.select(
        "doc_id",
        "lang",
        "source",
        F.concat(
            F.lit(
                "<html><head><title></title><style>p{color:red}</style>"
                "<script>var x = 1 < 2;</script></head><body>"
                "<!-- boilerplate --><p>"
            ),
            F.col("text"),
            F.lit("</p></body></html>"),
        ).alias("html"),
    )


def test_curation_funnel_every_gate_drops(spark):
    from bigdata_rags_spark.pipelines.curation import curation_funnel_report

    rep = {
        r["stage"]: r
        for r in curation_funnel_report(_pages(spark)).collect()
    }
    n = {s: rep[s]["n_docs"] for s in range(7)}
    # stage 0: extraction preserved every doc and stripped all markup
    assert n[0] == len(_ROWS)
    assert rep[0]["n_tokens"] == sum(len(t.split()) for *_, t in _ROWS)
    # langid drops exactly the zh doc
    assert n[1] == n[0] - 1
    # quality drops exactly the three all-class-0 docs (2, 6, 11)
    assert n[2] == n[1] - 3
    # dedup drops the exact dup (15) AND the prefix dup (17)
    assert n[3] == n[2] - 2
    # decontamination drops the two surviving probes (0, 4) + the
    # contaminated doc (7)
    assert n[4] == n[3] - 3
    # survivors: 13,19,21,23,25,27 (srcA) + 31,33 (srcB); quota
    # total=8 budget=4, srcA w=2 srcB w=1 -> alloc 2+1
    assert n[4] == 8
    assert n[5] == 3
    assert rep[5]["n_tokens"] == 30  # all survivor docs are 10 tokens
    # packing: 3 docs * (10 + 1 EOS); sequence count bounded by shard count
    assert rep[6]["n_tokens"] == 33
    assert 1 <= n[6] <= 3


def test_curation_funnel_empty_corpus_packs_zero(spark):
    from bigdata_rags_spark.pipelines.curation import curation_funnel_report

    empty = _pages(spark).filter(F.col("doc_id") < 0)
    rep = {r["stage"]: r for r in curation_funnel_report(empty).collect()}
    assert rep[0]["n_docs"] == 0 and rep[0]["n_tokens"] == 0
    assert rep[6]["n_docs"] == 0 and rep[6]["n_tokens"] == 0


def test_cross_modal_gate_drops_same_image_different_caption(spark):
    """VERDICT r14 next #6's done-criterion: a doc whose attached image is
    identical to a lower-id doc's (doc_id + 256 -> same planted PNG) but
    whose CAPTION differs must be dropped with caught_by_text = 0 (text
    dedup misses it); a doc that ALSO shares its 8-token text prefix with
    the keeper flags caught_by_text = 1; docs with unique images survive."""
    from bigdata_rags_spark.multimodal.codecs import (
        attach_png_payload,
        image_ahash128,
        resize_images,
    )
    from bigdata_rags_spark.pipelines.curation import cross_modal_image_gate

    base = "the quick brown fox jumps over the lazy dog today"
    rows = [
        # (doc_id, n_chars, text): PNG = f(doc_id % 256 effects, n_chars)
        (1000, 57, base),
        (1256, 57, "totally different caption words here entirely new text"),
        (1512, 57, base + " trailing extra tail"),  # same image AND same prefix-8
        (2001, 91, "unique image unrelated content survives the gate fine"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "n_chars", "text"])
    h = image_ahash128(
        resize_images(attach_png_payload(docs), out_w=16, out_h=8)
    ).localCheckpoint()
    out = {
        r["doc_id"]: r
        for r in cross_modal_image_gate(h, docs.select("doc_id", "text")).collect()
    }
    assert set(out) == {1256, 1512}  # keeper 1000 and unique 2001 survive
    assert out[1256]["image_keeper_id"] == 1000
    assert out[1256]["caught_by_text"] == 0  # the novel cross-modal catch
    assert out[1512]["image_keeper_id"] == 1000
    assert out[1512]["caught_by_text"] == 1  # text prefix-dedup also catches


def test_incremental_funnel_gates_against_store(spark):
    """The incremental funnel's store-aware behaviors, each planted:
    vs-store exact dup dies, vs-store prefix dup dies, the frozen
    store-fit classifier drops class-0 batch docs, global probes
    decontaminate the batch, and the UniMax quota is partially consumed
    by the store (srcB: combined alloc 4, stored 3 -> only 1 of 2 batch
    survivors kept)."""
    from bigdata_rags_spark.pipelines.curation import (
        incremental_curation_funnel_report,
    )

    t_store = "the quick fox and in of to is that now"
    stored = spark.createDataFrame(
        [
            (2, "en", "srcA", "the and of to in is it you that"),   # seed y=1, probe
            (4, "es", "srcA", "la que un ser no se de y en"),       # seed y=0, probe
            (6, "en", "srcA", t_store),
            (8, "en", "srcB", "the and of kiwi mango in to is it cherry"),
            (10, "en", "srcB", "the and of lemon melon in to is it peach"),
            (12, "en", "srcB", "the and of pear lime in to is it maple"),
        ],
        ["doc_id", "lang", "source", "text"],
    )
    batch_rows = [
        (7, "en", "srcA", t_store),                                  # vs-store exact dup
        (9, "en", "srcA", "the quick fox and in of to is extra tail arrive"),  # vs-store prefix dup
        (11, "en", "srcA", "the and of river storm in to is it ember"),        # novel
        (13, "en", "srcB", "the and of mist dawn in to is it arrive"),         # novel
        (15, "zh", "srcA", "中文 文本 测试 数据 文档 示例 内容 样本 语料 资料"),  # langid
        (17, "es", "srcA", "la que un ser no la que un ser no"),     # frozen NB drops
        (19, "en", "srcA", "the and of to in fox runs today now quick"),  # contaminated
        (21, "en", "srcB", "the and of extra tail in to is it runs"),     # novel srcB
    ]
    batch = spark.createDataFrame(
        batch_rows, ["doc_id", "lang", "source", "text"]
    ).select(
        "doc_id",
        "lang",
        "source",
        F.concat(
            F.lit(
                "<html><head><title></title><style>p{color:red}</style>"
                "<script>var x = 1 < 2;</script></head><body>"
                "<!-- boilerplate --><p>"
            ),
            F.col("text"),
            F.lit("</p></body></html>"),
        ).alias("html"),
    )
    rep = {
        r["stage"]: r
        for r in incremental_curation_funnel_report(batch, stored).collect()
    }
    n = {s: rep[s]["n_docs"] for s in range(7)}
    assert n[0] == 8
    assert n[1] == 7   # zh dropped
    assert n[2] == 6   # frozen classifier drops the class-0 doc
    assert n[3] == 4   # exact + prefix vs-store drops
    assert n[4] == 3   # global-probe contamination drop
    # quota: srcA combined 4 (3 stored + 1), w=2; srcB combined 5 (3 + 2),
    # w=2; total 9, budget 9 -> alloc srcA 4, srcB 4 -> batch keeps 1 + 1
    assert n[5] == 2
    assert rep[6]["n_tokens"] == 22  # 2 survivors x (10 tokens + EOS)
