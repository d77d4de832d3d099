

def test_rrf_fusion_top_in_both_lists_wins(spark):
    """A doc ranked #1 in BOTH lists must win overall; docs present in only
    one list score below docs well-placed in both."""
    from pyspark.sql import functions as F

    from bigdata_rags_spark.retrieval.bm25 import rrf_search

    docs = spark.createDataFrame(
        [
            (1, "spark join stream spark join"),   # strong lexical match
            (2, "spark join"),                      # weaker lexical
            (3, "nothing relevant here at all"),    # lexical miss
            (4, "spark"),                           # weakest lexical
        ],
        ["doc_id", "text"],
    )
    # embeddings: vec 0 is the query; doc 1 is its near-copy (dense #1),
    # doc 3 close, docs 2/4 orthogonal-ish
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.99, 0.1, 0.0, 0.0]),
        (3, [0.8, 0.6, 0.0, 0.0]),
        (2, [0.0, 1.0, 0.0, 0.0]),
        (4, [0.0, 0.0, 1.0, 0.0]),
    ]
    e = spark.createDataFrame(rows, ["vec_id", "embedding"]).select(
        "vec_id", F.col("embedding").cast("array<float>").alias("embedding")
    )
    out = rrf_search(docs, e, ["spark", "join", "stream"], query_vec_id=0, k=5).collect()
    assert out[0]["doc_id"] == 1 and out[0]["rnk"] == 1
    micros = [r["rrf_micro"] for r in out]
    assert micros == sorted(micros, reverse=True)
    # doc 3 (dense-only) and doc 2 (lex #2 + some dense rank) both present
    ids = [r["doc_id"] for r in out]
    assert 2 in ids and 3 in ids


def test_ranking_quality_planted_better_ranker_wins(spark):
    """Planted graded relevance: an oracle ranker (true rel desc) must score
    exactly 1_000_000 nDCG; a reversed ranker must score measurably less,
    with every metric matching an exact integer-arithmetic replay."""
    from pyspark.sql import functions as F

    from bigdata_rags_spark.retrieval.eval import ranking_quality

    # 8 docs, graded relevance 3,3,2,2,1,1,0,0 by doc_id
    grades = {i: g for i, g in enumerate([3, 3, 2, 2, 1, 1, 0, 0])}
    rel = spark.createDataFrame(
        [(i, g) for i, g in grades.items()], ["doc_id", "rel"]
    ).select("doc_id", F.col("rel").cast("bigint").alias("rel"))
    k = 4
    ideal_order = sorted(grades, key=lambda i: (-grades[i], i))
    runs = spark.createDataFrame(
        [("good", d, r + 1) for r, d in enumerate(ideal_order[:k])]
        + [("bad", d, r + 1) for r, d in enumerate(ideal_order[::-1][:k])],
        ["ranker", "doc_id", "rnk"],
    )
    out = {
        r["ranker"]: r.asDict()
        for r in ranking_quality(runs, rel, k=k, rel_threshold=2).collect()
    }
    # exact integer replay of the rank-reciprocal micro-DCG
    def dcg(order):
        return sum(grades[d] * 1_000_000 // (r + 2) for r, d in enumerate(order[:k]))

    idcg = dcg(ideal_order)
    assert out["good"]["dcg_micro"] == idcg
    assert out["good"]["ndcg_micro"] == 1_000_000
    assert out["bad"]["dcg_micro"] == dcg(ideal_order[::-1])
    assert out["bad"]["ndcg_micro"] == dcg(ideal_order[::-1]) * 1_000_000 // idcg
    assert out["good"]["ndcg_micro"] > out["bad"]["ndcg_micro"]
    # 4 docs have rel >= 2; the good ranker retrieves all 4, the bad none
    assert out["good"]["n_relevant"] == 4 and out["bad"]["n_relevant"] == 4
    assert out["good"]["rel_retrieved"] == 4 and out["bad"]["rel_retrieved"] == 0
    assert out["good"]["recall_micro"] == 1_000_000
    assert out["good"]["precision_micro"] == 1_000_000
    assert out["bad"]["recall_micro"] == 0 and out["bad"]["precision_micro"] == 0


def test_retrieval_ranking_eval_registry_shape(spark):
    """Registry query: three rankers, one row each; the term-aware lexical
    rankers (bm25/ql) must not lose to RRF's dense-diluted list on a
    relevance grade defined by term presence."""
    from bigdata_rags_spark.queries.catalog import REGISTRY

    pdf = (
        REGISTRY["retrieval_ranking_eval"]
        .spark(spark, "/root/testdata/sf0.001")
        .toPandas()
        .set_index("ranker")
    )
    assert sorted(pdf.index) == ["bm25", "ql", "rrf"]
    assert (pdf["ndcg_micro"] <= 1_000_000).all()
    assert pdf.loc["bm25", "ndcg_micro"] >= pdf.loc["rrf", "ndcg_micro"]
    assert pdf.loc["ql", "ndcg_micro"] >= pdf.loc["rrf", "ndcg_micro"]
