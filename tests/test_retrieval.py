

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


def test_mmr_rerank_prefers_diverse_over_near_duplicate(spark):
    """Planted MMR scenario: doc 2 is a near-copy of the top pick (sim
    ~1000) with almost-top relevance; docs 3/4 are orthogonal with lower
    relevance.  At lambda=500 the duplicate's penalty (500 * 1000) swamps
    its relevance edge, so the greedy picks the diverse docs first and the
    near-dup dead last — the behavior that distinguishes MMR from every
    independent ranker."""
    from bigdata_rags_spark.retrieval.mmr import mmr_rerank

    rows = [
        (1, 1000, [1.0, 0.0, 0.0, 0.0]),
        (2, 990, [1.0, 0.001, 0.0, 0.0]),  # near-duplicate of doc 1
        (3, 500, [0.0, 1.0, 0.0, 0.0]),
        (4, 400, [0.0, 0.0, 1.0, 0.0]),
    ]
    pool = spark.createDataFrame(rows, "doc_id long, rel_milli long, v array<double>")
    out = mmr_rerank(pool, k=4, lambda_milli=500).collect()
    assert [r["doc_id"] for r in sorted(out, key=lambda r: r["step"])] == [1, 3, 4, 2]
    by_id = {r["doc_id"]: r for r in out}
    # the near-dup's max-sim is to doc 1 (cos ~ 1.0 -> 1000 milli)
    assert by_id[2]["max_sim_milli"] == 1000
    assert by_id[2]["mmr_milli"] == 500 * 990 - 500 * 1000
    # step-1 seed carries no sim/score (pure relevance)
    assert by_id[1]["step"] == 1 and by_id[1]["max_sim_milli"] is None


def test_mmr_rerank_string_ids(spark):
    """ADVICE r12: the output schema derives the id type from the pool, so
    string document keys survive the greedy round-trip."""
    from bigdata_rags_spark.retrieval.mmr import mmr_rerank

    rows = [
        ("p1", 1000, [1.0, 0.0]),
        ("p2", 990, [1.0, 0.001]),
        ("p3", 500, [0.0, 1.0]),
    ]
    pool = spark.createDataFrame(rows, "doc_id string, rel_milli long, v array<double>")
    out = sorted(mmr_rerank(pool, k=3, lambda_milli=500).collect(), key=lambda r: r["step"])
    assert [r["doc_id"] for r in out] == ["p1", "p3", "p2"]
    assert all(isinstance(r["doc_id"], str) for r in out)


def test_mmr_lambda_1000_degenerates_to_relevance_order(spark):
    from bigdata_rags_spark.retrieval.mmr import mmr_rerank

    rows = [
        (1, 1000, [1.0, 0.0, 0.0, 0.0]),
        (2, 990, [1.0, 0.001, 0.0, 0.0]),
        (3, 500, [0.0, 1.0, 0.0, 0.0]),
        (4, 400, [0.0, 0.0, 1.0, 0.0]),
    ]
    pool = spark.createDataFrame(rows, "doc_id long, rel_milli long, v array<double>")
    out = sorted(mmr_rerank(pool, k=4, lambda_milli=1000).collect(), key=lambda r: r["step"])
    assert [r["doc_id"] for r in out] == [1, 2, 3, 4]


def test_mmr_pool_smaller_than_k_returns_all(spark):
    from bigdata_rags_spark.retrieval.mmr import mmr_rerank

    pool = spark.createDataFrame(
        [(1, 1000, [1.0, 0.0]), (2, 500, [0.0, 1.0])],
        "doc_id long, rel_milli long, v array<double>",
    )
    out = mmr_rerank(pool, k=5, lambda_milli=700).collect()
    assert sorted(r["doc_id"] for r in out) == [1, 2]
    assert sorted(r["step"] for r in out) == [1, 2]


def test_rag_capstone_retrieves_planted_needle(spark):
    """VERDICT r12 #6 planted test: a corpus where doc 7 is a near-copy of
    the query doc must come back as the top retrieved chunk through the
    full chain (hashed featurize -> IVFPQ serve -> MMR greedy): the ANN
    similarity puts the needle first, and the MMR seed (pure relevance)
    picks it."""
    from pyspark.sql import functions as F

    from bigdata_rags_spark.functions.featurize import hashed_doc_vectors
    from bigdata_rags_spark.functions.vectors import as_double_array
    from bigdata_rags_spark.retrieval.mmr import mmr_rerank
    from bigdata_rags_spark.similarity.pq import ivfpq_search_rerank

    q_tokens = [f"alpha{i}" for i in range(30)]
    needle = q_tokens[:29] + ["omega"]  # one-token edit of the query
    rows = [(0, " ".join(q_tokens)), (7, " ".join(needle))]
    for d in range(1, 7):
        rows.append((d, " ".join(f"noise{d}_{j}" for j in range(30))))
    docs = spark.createDataFrame(rows, ["doc_id", "text"])

    vecs = hashed_doc_vectors(docs, dim=64).localCheckpoint()
    q = vecs.filter(F.col("vec_id") == 0)
    hits = ivfpq_search_rerank(q, vecs, k=5, n_probe=4, shortlist=50)
    got = sorted(hits.collect(), key=lambda r: r["rank"])
    assert got and got[0]["neighbor_id"] == 7 and got[0]["similarity"] > 0.9

    pool = hits.join(vecs, hits["neighbor_id"] == vecs["vec_id"]).select(
        F.col("neighbor_id").alias("doc_id"),
        F.round(F.col("similarity") * 1000).cast("bigint").alias("rel_milli"),
        as_double_array(F.col("embedding")).alias("v"),
    )
    out = sorted(mmr_rerank(pool, k=3, lambda_milli=700).collect(), key=lambda r: r["step"])
    assert out[0]["doc_id"] == 7  # the needle seeds the diversified list


def test_rm3_expansion_recovers_synonym_shifted_doc(spark):
    """VERDICT r13 #4: the planted-recovery contract — a relevant doc that
    shares NO original query term is invisible to plain BM25 but enters
    the RM3 top-k through expansion terms mined from the feedback docs."""
    from bigdata_rags_spark.retrieval.bm25 import bm25_scores, rm3_expanded_search

    filler = "lorem ipsum dolor sit amet consectetur"
    rows = [
        # feedback docs: contain the query term AND the synonym "catalyst"
        (1, "spark catalyst engine spark catalyst plan"),
        (2, "spark catalyst optimizer spark catalyst rules"),
        (3, "spark catalyst codegen catalyst stage spark"),
        # the synonym-shifted relevant doc: catalyst only, no "spark"
        (4, "catalyst catalyst catalyst optimization deep dive"),
        # background noise
        (5, filler + " one two"),
        (6, filler + " three four"),
        (7, filler + " five six"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    q = ["spark"]

    plain = {r["doc_id"] for r in bm25_scores(docs, q, k=4).collect()}
    assert 4 not in plain  # no query term -> unmatched by BM25

    out = rm3_expanded_search(
        docs, q, fb_k=3, n_expansion=3, alpha_micro=500_000, k=4
    ).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert 4 in by_id, out
    assert by_id[4]["bm25_orig"] == 0.0  # both rankings reported
    assert by_id[4]["rm3_score"] > 0.0


def test_rm3_alpha_zero_reduces_to_bm25_ranking(spark):
    """alpha_micro=0 kills the expansion mass: the RM3 ranking must equal
    the plain BM25 ranking (scores scale by 1/|Q| but order is identical)."""
    from bigdata_rags_spark.retrieval.bm25 import bm25_scores, rm3_expanded_search

    rows = [
        (1, "spark join stream spark"),
        (2, "spark join other words here"),
        (3, "spark alone with filler text"),
        (4, "nothing relevant at all here"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    q = ["spark", "join", "stream"]
    plain = [
        r["doc_id"] for r in sorted(bm25_scores(docs, q, k=3).collect(), key=lambda r: r["rnk"])
    ]
    rm3 = rm3_expanded_search(docs, q, fb_k=2, n_expansion=2, alpha_micro=0, k=3)
    assert [
        r["doc_id"] for r in sorted(rm3.collect(), key=lambda r: r["rnk"])
    ] == plain


def test_proximity_boost_reranks_adjacent_terms(spark):
    """A doc with ADJACENT query terms must outrank a doc with the same
    term bag spread far apart (the phrase-evidence rule), and a doc
    matching only one term gets zero boost."""
    from pyspark.sql import functions as F

    from bigdata_rags_spark.retrieval.bm25 import proximity_boosted_search

    filler = " ".join(f"w{i}" for i in range(40))
    rows = [
        (1, f"spark join {filler}"),                  # adjacent: dist 1
        (2, f"spark {filler} join"),                  # spread: dist 41
        (3, f"spark {filler}"),                       # single term: no boost
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in
           proximity_boosted_search(docs, ["spark", "join"], k=10).collect()}
    assert out[1]["min_pair_dist"] == 1 and out[1]["prox_boost_milli"] == 2000
    assert out[2]["min_pair_dist"] == 41 and out[2]["prox_boost_milli"] == 2000 // 41
    assert out[3]["min_pair_dist"] == 0 and out[3]["prox_boost_milli"] == 0
    # same term bag -> near-equal bm25; the boost must decide the order
    assert out[1]["rnk"] < out[2]["rnk"] < out[3]["rnk"]


def test_proximity_min_dist_is_exact_over_interleavings(spark):
    """The LAG-adjacent rule must equal the true minimum differing-term
    distance on an interleaved pattern (closest pair not first)."""
    from bigdata_rags_spark.retrieval.bm25 import proximity_boosted_search

    # positions: spark@0, spark@3, join@5, spark@6 -> min dist = 1 (5->6)
    text = "spark x y spark z join spark"
    docs = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    r = proximity_boosted_search(docs, ["spark", "join"], k=5).collect()[0]
    assert r["min_pair_dist"] == 1
