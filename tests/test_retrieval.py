

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
