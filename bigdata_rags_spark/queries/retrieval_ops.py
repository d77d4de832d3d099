"""Retrieval tier: BM25 and hybrid sparse+dense search (the repo-namesake
RAG surface), oracle-checked end to end.

The fixed demo query is three corpus terms + embedding #0 as the dense
query vector (documents and embeddings align by id in the testdata).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from bigdata_rags_spark.io.readers import read_testdata
from bigdata_rags_spark.queries.catalog import TIER_LLM, query
from bigdata_rags_spark.queries.llm_ops import _SQL_TOKS, _docs_parallel
from bigdata_rags_spark.retrieval.bm25 import bm25_scores, hybrid_search

@query(
    "document_chunking",
    f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS tk FROM documents),
chunks AS (
  SELECT doc_id,
         unnest(range(0, (len(tk) - 1) // 40 + 1)) AS chunk_id,
         unnest(list_transform(range(0, (len(tk) - 1) // 40 + 1),
                i -> array_to_string(tk[i * 40 + 1 : i * 40 + 50], ' '))) AS chunk_text,
         unnest(list_transform(range(0, (len(tk) - 1) // 40 + 1),
                i -> CAST(LEAST(50, len(tk) - i * 40) AS BIGINT))) AS chunk_tokens
  FROM t
)
SELECT doc_id, CAST(chunk_id AS INT) AS chunk_id, chunk_text, chunk_tokens,
       md5(chunk_text) AS chunk_hash
FROM chunks
""",
    tier=TIER_LLM,
)
def document_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG ingestion chunking: 50-token windows with 10-token overlap
    (stride 40), plus a stable chunk hash for downstream dedup/embedding
    caching.  Pure array expressions — chunking 100 TB is a scan, not a
    UDF job."""
    from pyspark.sql import functions as F

    from bigdata_rags_spark.functions.text import ws_tokens

    docs = _docs_parallel(spark, sf_dir)
    t = docs.select("doc_id", ws_tokens(F.col("text")).alias("tk"))
    n = F.size("tk")
    idx = F.sequence(F.lit(0), F.floor((n - 1) / 40).cast("int"))
    chunk = F.explode(
        F.transform(
            idx,
            lambda i: F.struct(
                i.cast("int").alias("chunk_id"),
                F.concat_ws(" ", F.slice(F.col("tk"), i * 40 + 1, 50)).alias("chunk_text"),
                F.least(F.lit(50), n - i * 40).cast("bigint").alias("chunk_tokens"),
            ),
        )
    )
    return t.select("doc_id", chunk.alias("c")).select(
        "doc_id",
        F.col("c.chunk_id").alias("chunk_id"),
        F.col("c.chunk_text").alias("chunk_text"),
        F.col("c.chunk_tokens").alias("chunk_tokens"),
        F.md5(F.col("c.chunk_text")).alias("chunk_hash"),
    )


QUERY_TERMS = ["spark", "join", "stream"]
_TERMS_SQL = ", ".join(f"'{t}'" for t in QUERY_TERMS)

_SQL_BM25_CORE = f"""
toks AS (SELECT doc_id, unnest({_SQL_TOKS}) AS token FROM documents),
dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM toks GROUP BY doc_id),
stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
avgl AS (SELECT AVG(dl) AS avgdl FROM dl),
tf AS (
  SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
  FROM toks WHERE token IN ({_TERMS_SQL}) GROUP BY doc_id, token
),
dfreq AS (
  SELECT token, COUNT(DISTINCT doc_id) AS df
  FROM toks WHERE token IN ({_TERMS_SQL}) GROUP BY token
),
per_term AS (
  SELECT tf.doc_id,
         ln((stats.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5) + 1.0)
         * (tf.tf * 2.2)
         / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / avgl.avgdl)) AS s
  FROM tf
  JOIN dfreq ON tf.token = dfreq.token
  JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN stats CROSS JOIN avgl
),
bm25 AS (
  SELECT doc_id, ROUND(SUM(s), 6) AS bm25, CAST(COUNT(*) AS BIGINT) AS matched_terms
  FROM per_term GROUP BY doc_id
)
"""


@query(
    "bm25_keyword_search",
    f"""
WITH {_SQL_BM25_CORE}
SELECT doc_id, bm25, matched_terms,
       CAST(ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS INT) AS rnk
FROM bm25
QUALIFY rnk <= 10
""",
    tier=TIER_LLM,
)
def bm25_keyword_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-10 for a bag-of-words query — joins/aggs only; the
    exploded (token, doc) relation IS the inverted index
    (retrieval/bm25.py)."""
    docs = _docs_parallel(spark, sf_dir)
    return bm25_scores(docs, QUERY_TERMS, k=10)


@query(
    "hybrid_rag_search",
    f"""
WITH {_SQL_BM25_CORE},
lex AS (
  SELECT doc_id, bm25, bm25 / NULLIF(MAX(bm25) OVER (), 0) AS lex_norm FROM bm25
),
qv AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
dense AS (
  SELECT vec_id AS doc_id,
         list_dot_product(qv.qv, e.embedding::DOUBLE[])
           / sqrt(list_dot_product(qv.qv, qv.qv))
           / sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) AS cosine
  FROM embeddings e CROSS JOIN qv
),
fused AS (
  SELECT dense.doc_id,
         ROUND(COALESCE(lex.bm25, 0), 6)   AS bm25,
         ROUND(dense.cosine, 6)            AS cosine,
         ROUND(0.5 * COALESCE(lex.lex_norm, 0) + 0.5 * dense.cosine, 6) AS hybrid_score
  FROM dense LEFT JOIN lex ON dense.doc_id = lex.doc_id
)
SELECT doc_id, bm25, cosine, hybrid_score,
       CAST(ROW_NUMBER() OVER (ORDER BY hybrid_score DESC, doc_id) AS INT) AS rnk
FROM fused
QUALIFY rnk <= 10
""",
    tier=TIER_LLM,
)
def hybrid_rag_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid RAG retrieval: 0.5 * normalized BM25 + 0.5 * embedding cosine
    to query vector #0, top-10 (retrieval/bm25.py) — the sparse+dense
    fusion a RAG pipeline serves from."""
    docs = _docs_parallel(spark, sf_dir)
    e = read_testdata(spark, sf_dir, "embeddings")["embeddings"]
    return hybrid_search(docs, e, QUERY_TERMS, query_vec_id=0, alpha=0.5, k=10)


@query(
    "rrf_fusion_search",
    f"""
WITH {_SQL_BM25_CORE},
lex AS (
  SELECT doc_id, CAST(ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS BIGINT) AS r_lex
  FROM (SELECT * FROM bm25 ORDER BY bm25 DESC, doc_id LIMIT 50)
),
qv AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
dsc AS (
  SELECT vec_id AS doc_id,
         ROUND(list_dot_product(qv.qv, e.embedding::DOUBLE[])
               / sqrt(list_dot_product(qv.qv, qv.qv))
               / sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])), 6)
           AS cosine
  FROM embeddings e CROSS JOIN qv
),
dense AS (
  SELECT doc_id, CAST(ROW_NUMBER() OVER (ORDER BY cosine DESC, doc_id) AS BIGINT) AS r_dense
  FROM (SELECT * FROM dsc ORDER BY cosine DESC, doc_id LIMIT 50)
),
fused AS (
  SELECT COALESCE(lex.doc_id, dense.doc_id) AS doc_id, r_lex, r_dense,
         CAST(COALESCE(1000000000000 // (60 + r_lex), 0)
              + COALESCE(1000000000000 // (60 + r_dense), 0) AS BIGINT) AS rrf_micro
  FROM lex FULL OUTER JOIN dense ON lex.doc_id = dense.doc_id
)
SELECT doc_id, r_lex, r_dense, rrf_micro,
       CAST(ROW_NUMBER() OVER (ORDER BY rrf_micro DESC, doc_id) AS INT) AS rnk
FROM fused
QUALIFY rnk <= 10
""",
    tier=TIER_LLM,
)
def rrf_fusion_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion of the BM25 and dense lists
    (`retrieval/bm25.py:rrf_search`) — the calibration-free alternative to
    `hybrid_rag_search`'s weighted sum: scores never mix, only RANKS do
    (1/(60+rank) per list, exact integer micro-units).  Bounded top-50
    lists, k-row rank windows, full-outer fuse, top-10."""
    docs = _docs_parallel(spark, sf_dir)
    e = read_testdata(spark, sf_dir, "embeddings")["embeddings"]
    from bigdata_rags_spark.retrieval.bm25 import rrf_search

    return rrf_search(docs, e, QUERY_TERMS, query_vec_id=0, k=10, list_len=50)


@query(
    "query_likelihood_search",
    f"""
WITH toks AS (SELECT doc_id, unnest({_SQL_TOKS}) AS token FROM documents),
dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM toks GROUP BY doc_id),
ctot AS (SELECT CAST(COUNT(*) AS BIGINT) AS ctot FROM toks),
cf AS (
  SELECT token, CAST(COUNT(*) AS BIGINT) AS cf
  FROM toks WHERE token IN ({_TERMS_SQL}) GROUP BY token
),
tf AS (
  SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
  FROM toks WHERE token IN ({_TERMS_SQL}) GROUP BY doc_id, token
),
grid AS (
  SELECT dl.doc_id,
         ln((COALESCE(tf.tf, 0) + 2000.0 * cf.cf / ctot.ctot)
            / (dl.dl + 2000.0)) AS s,
         CASE WHEN tf.tf IS NOT NULL THEN 1 ELSE 0 END AS hit
  FROM dl CROSS JOIN cf CROSS JOIN ctot
  LEFT JOIN tf ON tf.doc_id = dl.doc_id AND tf.token = cf.token
),
scored AS (
  SELECT doc_id, ROUND(SUM(s), 6) AS ql_score,
         CAST(SUM(hit) AS BIGINT) AS matched_terms
  FROM grid GROUP BY doc_id
)
SELECT doc_id, ql_score, matched_terms,
       CAST(ROW_NUMBER() OVER (ORDER BY ql_score DESC, doc_id) AS INT) AS rnk
FROM scored
QUALIFY rnk <= 10
""",
    tier=TIER_LLM,
)
def query_likelihood_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query-likelihood LM ranking with Dirichlet smoothing (Zhai &
    Lafferty 2001; `retrieval/bm25.py:query_likelihood_scores`) — the
    language-modeling retrieval family completing BM25 / TF-IDF / hybrid
    / RRF.  Every query term scores every doc (zero-tf terms pull toward
    the collection model), so ranking differs from BM25 on partial
    matches."""
    from bigdata_rags_spark.retrieval.bm25 import query_likelihood_scores

    docs = _docs_parallel(spark, sf_dir)
    return query_likelihood_scores(docs, QUERY_TERMS, k=10)


def _mmr_sim_sql(a: str, b: str) -> str:
    """Integer-milli pair cosine in the Spark fold order: (dot / norm_a /
    norm_b) * 1000, one ROUND — identical bigint in both engines."""
    return (
        f"CAST(ROUND((list_dot_product({a}.v, {b}.v)"
        f" / sqrt(list_dot_product({a}.v, {a}.v))"
        f" / sqrt(list_dot_product({b}.v, {b}.v))) * 1000) AS BIGINT)"
    )


def _mmr_greedy_sql(k: int, lam: int) -> tuple[list[str], str]:
    """The greedy-MMR CTE chain (p1/sel/s_i/p_i one-row argmax CTEs + the
    final step UNION), referencing ``cand(doc_id, rel_milli, v)`` and
    ``pairs(ia, ib, sim_milli)`` CTEs the caller defines — shared by the
    BM25-pool oracle and the RAG-capstone oracle."""
    parts = [
        "p1 AS (SELECT doc_id, rel_milli FROM cand ORDER BY rel_milli DESC, doc_id LIMIT 1)",
        "sel1 AS (SELECT doc_id FROM p1)",
    ]
    for i in range(2, k + 1):
        parts.append(
            f"""s{i} AS (
  SELECT c.doc_id, c.rel_milli, MAX(p.sim_milli) AS ms
  FROM cand c JOIN pairs p
    ON p.ia = c.doc_id AND p.ib IN (SELECT doc_id FROM sel{i - 1})
  WHERE c.doc_id NOT IN (SELECT doc_id FROM sel{i - 1})
  GROUP BY 1, 2)"""
        )
        parts.append(
            f"p{i} AS (SELECT doc_id, rel_milli, ms, "
            f"CAST({lam} * rel_milli - {1000 - lam} * ms AS BIGINT) AS score "
            f"FROM s{i} ORDER BY score DESC, doc_id LIMIT 1)"
        )
        if i < k:
            parts.append(
                f"sel{i} AS (SELECT doc_id FROM sel{i - 1} UNION ALL SELECT doc_id FROM p{i})"
            )
    selects = [
        "SELECT 1 AS step, doc_id, rel_milli, CAST(NULL AS BIGINT) AS max_sim_milli,"
        " CAST(NULL AS BIGINT) AS mmr_milli FROM p1"
    ]
    for i in range(2, k + 1):
        selects.append(
            f"SELECT {i}, doc_id, rel_milli, CAST(ms AS BIGINT), score FROM p{i}"
        )
    return parts, "\nUNION ALL ".join(selects)


def _mmr_oracle(k: int = 5, m: int = 10, lam: int = 700) -> str:
    """Chained-CTE replay of the greedy MMR loop (the `_fps_oracle`
    pattern): the BM25 top-m shortlist with milli-normalized relevance and
    its m^2 pair-cosine table feed k-1 argmax CTEs of one row each, with
    the selected set accumulated via UNION ALL sel CTEs."""
    greedy, final = _mmr_greedy_sql(k, lam)
    parts = [
        _SQL_BM25_CORE.strip().rstrip(),
        f"short AS (SELECT doc_id, bm25 FROM bm25 ORDER BY bm25 DESC, doc_id LIMIT {m})",
        "mx AS (SELECT MAX(bm25) AS mx FROM short)",
        """cand AS (
  SELECT s.doc_id, CAST(ROUND(s.bm25 * 1000 / mx.mx) AS BIGINT) AS rel_milli,
         e.embedding::DOUBLE[] AS v
  FROM short s JOIN embeddings e ON e.vec_id = s.doc_id CROSS JOIN mx)""",
        f"""pairs AS (
  SELECT a.doc_id AS ia, b.doc_id AS ib, {_mmr_sim_sql('a', 'b')} AS sim_milli
  FROM cand a JOIN cand b ON a.doc_id != b.doc_id)""",
        *greedy,
    ]
    return "WITH " + ",\n".join(parts) + "\n" + final


@query("retrieval_mmr_rerank", _mmr_oracle(), tier=TIER_LLM)
def retrieval_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR diversified re-ranking (`retrieval/mmr.py`, Carbonell &
    Goldstein 1998) of the BM25 top-10 shortlist: greedy selection of 5
    results maximizing ``0.7 * rel - 0.3 * max-sim-to-selected`` — the
    dependent re-ranking pass that stops the top-k being five paraphrases
    of one passage; the fifth ranker in the retrieval family and the only
    one whose scores interact.  Relevance is the shortlist-max-normalized
    BM25 in integer milli; diversity is the integer-milli embedding cosine
    (documents and embeddings align by id).  The corpus-sized work is the
    upstream BM25 scan; the greedy runs on the bounded shortlist with
    k-bounded 1-row argmax collects (the FPS contract) and the oracle
    replays it as chained CTEs."""
    from pyspark.sql import functions as F

    from bigdata_rags_spark.functions.vectors import as_double_array
    from bigdata_rags_spark.retrieval.mmr import mmr_rerank

    docs = _docs_parallel(spark, sf_dir)
    e = read_testdata(spark, sf_dir, "embeddings")["embeddings"]
    short = bm25_scores(docs, QUERY_TERMS, k=10).select("doc_id", "bm25")
    mx = short.agg(F.max("bm25").alias("mx"))
    pool = (
        short.crossJoin(F.broadcast(mx))
        .join(e, short["doc_id"] == e["vec_id"])
        .select(
            short["doc_id"],
            F.round(F.col("bm25") * 1000 / F.col("mx")).cast("bigint").alias("rel_milli"),
            as_double_array(F.col("embedding")).alias("v"),
        )
    )
    return mmr_rerank(pool, k=5, lambda_milli=700)


_REL_SQL = " + ".join(
    f"(CASE WHEN list_contains(tk, '{t}') THEN 1 ELSE 0 END)" for t in QUERY_TERMS
)

_SQL_RRF_RUN = f"""
lex AS (
  SELECT doc_id, CAST(ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS BIGINT) AS r_lex
  FROM (SELECT * FROM bm25 ORDER BY bm25 DESC, doc_id LIMIT 50)
),
qv AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
dsc AS (
  SELECT vec_id AS doc_id,
         ROUND(list_dot_product(qv.qv, e.embedding::DOUBLE[])
               / sqrt(list_dot_product(qv.qv, qv.qv))
               / sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])), 6)
           AS cosine
  FROM embeddings e CROSS JOIN qv
),
dense AS (
  SELECT doc_id, CAST(ROW_NUMBER() OVER (ORDER BY cosine DESC, doc_id) AS BIGINT) AS r_dense
  FROM (SELECT * FROM dsc ORDER BY cosine DESC, doc_id LIMIT 50)
),
fused AS (
  SELECT COALESCE(lex.doc_id, dense.doc_id) AS doc_id,
         CAST(COALESCE(1000000000000 // (60 + r_lex), 0)
              + COALESCE(1000000000000 // (60 + r_dense), 0) AS BIGINT) AS rrf_micro
  FROM lex FULL OUTER JOIN dense ON lex.doc_id = dense.doc_id
),
rrf_run AS (
  SELECT 'rrf' AS ranker, doc_id,
         CAST(ROW_NUMBER() OVER (ORDER BY rrf_micro DESC, doc_id) AS BIGINT) AS rnk
  FROM fused QUALIFY rnk <= 10
)
"""

_SQL_QL_RUN = f"""
ctot AS (SELECT CAST(COUNT(*) AS BIGINT) AS ctot FROM toks),
cf AS (
  SELECT token, CAST(COUNT(*) AS BIGINT) AS cf
  FROM toks WHERE token IN ({_TERMS_SQL}) GROUP BY token
),
ql_grid AS (
  SELECT dl.doc_id,
         ln((COALESCE(tf.tf, 0) + 2000.0 * cf.cf / ctot.ctot)
            / (dl.dl + 2000.0)) AS s
  FROM dl CROSS JOIN cf CROSS JOIN ctot
  LEFT JOIN tf ON tf.doc_id = dl.doc_id AND tf.token = cf.token
),
ql_scored AS (SELECT doc_id, ROUND(SUM(s), 6) AS ql_score FROM ql_grid GROUP BY doc_id),
ql_run AS (
  SELECT 'ql' AS ranker, doc_id,
         CAST(ROW_NUMBER() OVER (ORDER BY ql_score DESC, doc_id) AS BIGINT) AS rnk
  FROM ql_scored QUALIFY rnk <= 10
)
"""


@query(
    "retrieval_ranking_eval",
    f"""
WITH {_SQL_BM25_CORE},
bm25_run AS (
  SELECT 'bm25' AS ranker, doc_id,
         CAST(ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS BIGINT) AS rnk
  FROM bm25 QUALIFY rnk <= 10
),
{_SQL_QL_RUN.strip().rstrip()},
{_SQL_RRF_RUN.strip().rstrip()},
runs AS (
  SELECT * FROM bm25_run UNION ALL SELECT * FROM ql_run UNION ALL SELECT * FROM rrf_run
),
rel AS (
  SELECT doc_id, CAST({_REL_SQL} AS BIGINT) AS rel
  FROM (SELECT doc_id, {_SQL_TOKS} AS tk FROM documents)
),
ideal AS (
  SELECT rel, CAST(ROW_NUMBER() OVER (ORDER BY rel DESC, doc_id) AS BIGINT) AS r
  FROM rel ORDER BY rel DESC, doc_id LIMIT 10
),
idcg AS (SELECT CAST(SUM(rel * 1000000 // (r + 1)) AS BIGINT) AS idcg FROM ideal),
nrel AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_relevant FROM rel WHERE rel >= 2),
per AS (
  SELECT ranker,
         CAST(SUM(rel.rel * 1000000 // (rnk + 1)) AS BIGINT) AS dcg_micro,
         CAST(SUM(CASE WHEN rel.rel >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS rel_retrieved
  FROM runs JOIN rel ON runs.doc_id = rel.doc_id GROUP BY ranker
)
SELECT ranker, dcg_micro,
       CAST(dcg_micro * 1000000 // NULLIF(idcg, 0) AS BIGINT) AS ndcg_micro,
       rel_retrieved, n_relevant,
       CAST(rel_retrieved * 1000000 // NULLIF(n_relevant, 0) AS BIGINT) AS recall_micro,
       CAST(rel_retrieved * 1000000 // 10 AS BIGINT) AS precision_micro
FROM per CROSS JOIN idcg CROSS JOIN nrel
""",
    tier=TIER_LLM,
)
def retrieval_ranking_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offline ranking-quality scorecard (`retrieval/eval.py:ranking_quality`)
    over the three registered rankers — BM25, query-likelihood LM, RRF — on
    the shared demo query, with graded relevance planted as the number of
    distinct query terms the document contains (0..3, threshold 2).  Extension
    beyond the reference (which has no retrieval surface); the eval harness a
    user runs before trusting one ranker family at corpus scale.  Integer
    micro-unit DCG/nDCG/recall/precision (rank-reciprocal discount — see
    eval.py module docstring for why not log2), so Spark and DuckDB agree
    bit-for-bit.  Scale shape: runs are three bounded top-10 lists; the only
    corpus-sized work is tokenizing documents once for the rel grades."""
    from pyspark.sql import functions as F

    from bigdata_rags_spark.functions.text import ws_tokens
    from bigdata_rags_spark.retrieval.bm25 import query_likelihood_scores, rrf_search
    from bigdata_rags_spark.retrieval.eval import ranking_quality

    docs = _docs_parallel(spark, sf_dir)
    e = read_testdata(spark, sf_dir, "embeddings")["embeddings"]

    def run(name: str, df: DataFrame) -> DataFrame:
        return df.select(
            F.lit(name).alias("ranker"),
            "doc_id",
            F.col("rnk").cast("bigint").alias("rnk"),
        )

    runs = (
        run("bm25", bm25_scores(docs, QUERY_TERMS, k=10))
        .unionByName(run("ql", query_likelihood_scores(docs, QUERY_TERMS, k=10)))
        .unionByName(
            run("rrf", rrf_search(docs, e, QUERY_TERMS, query_vec_id=0, k=10, list_len=50))
        )
    )
    tk = ws_tokens(F.col("text"))
    grade = sum(
        F.array_contains(tk, t).cast("bigint") for t in QUERY_TERMS
    )
    rel = docs.select("doc_id", grade.alias("rel"))
    return ranking_quality(runs, rel, k=10, rel_threshold=2)


# ---------------------------------------------------------------------------
# RAG capstone: docs -> chunk -> featurize -> IVFPQ retrieve -> MMR diversify
# ---------------------------------------------------------------------------


def _rag_capstone_oracle(k: int = 5, m: int = 10, lam: int = 700) -> str:
    """One statement replaying the ENTIRE RAG chain: the chunking CTEs
    (document_chunking's oracle), the hashed featurizer at CHUNK grain
    (`_text_vec_prelude` over chunk_key*100 ids), the full IVFPQ serve
    (`_ivfpq_oracle` with the dense-chunk source, chunk 0 of doc 0 as the
    query), then the greedy MMR CTEs (`_mmr_greedy_sql`) over the
    retrieved top-m with ANN similarity as milli relevance."""
    from bigdata_rags_spark.queries.llm_ops import _ivfpq_oracle, _text_vec_prelude

    chunk_ctes = f"""t0 AS (SELECT doc_id, {_SQL_TOKS} AS tk FROM documents),
chunks AS (
  SELECT doc_id,
         unnest(range(0, (len(tk) - 1) // 40 + 1)) AS chunk_id,
         unnest(list_transform(range(0, (len(tk) - 1) // 40 + 1),
                i -> array_to_string(tk[i * 40 + 1 : i * 40 + 50], ' '))) AS chunk_text
  FROM t0
),
"""
    chunk_src = "(SELECT doc_id * 100 + chunk_id AS doc_id, chunk_text AS text FROM chunks)"
    prelude = chunk_ctes + _text_vec_prelude(chunk_src)
    ivf = _ivfpq_oracle(
        k=m, n_queries=1, prelude_ctes=prelude, source_sql="SELECT vec_id, v FROM dense"
    )
    greedy, final = _mmr_greedy_sql(k, lam)
    # MATERIALIZED is load-bearing: the greedy CTEs reference cand/pairs
    # repeatedly, and DuckDB would otherwise re-inline the nested IVFPQ
    # replay (itself ~20 prelude inlinings) once per reference — measured
    # as a >10 min hang; materialization evaluates hits exactly once.
    parts = [
        prelude.rstrip().rstrip(","),
        f"hits AS MATERIALIZED ({ivf})",
        """cand AS MATERIALIZED (
  SELECT h.neighbor_id AS doc_id,
         CAST(ROUND(h.similarity * 1000) AS BIGINT) AS rel_milli,
         d.v
  FROM hits h JOIN dense d ON d.vec_id = h.neighbor_id)""",
        f"""pairs AS MATERIALIZED (
  SELECT a.doc_id AS ia, b.doc_id AS ib, {_mmr_sim_sql('a', 'b')} AS sim_milli
  FROM cand a JOIN cand b ON a.doc_id != b.doc_id)""",
        *greedy,
    ]
    return "WITH " + ",\n".join(parts) + "\n" + final


@query("rag_capstone_retrieval", _rag_capstone_oracle(), tier=TIER_LLM)
def rag_capstone_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The RAG FLAGSHIP chain (VERDICT r12 next #6) — every similarity-tier
    stage composed into one registry query, from raw text with no
    embeddings fixture anywhere in the plan:

    1. `document_chunking` — 50-token windows, stride 40 (chunk grain key
       ``doc_id * 100 + chunk_id``);
    2. `functions/featurize.hashed_doc_vectors` at chunk grain — the
       dictionary-free docs -> vectors bridge;
    3. `similarity/pq.ivfpq_search_rerank` — coarse cells prune, integer
       ADC scores, exact cosine reranks; query = chunk 0 of doc 0, top-10;
    4. `retrieval/mmr.mmr_rerank` — greedy diversification of the
       retrieved 10 down to 5 (lambda 0.7), relevance = ANN similarity in
       integer milli.

    The oracle replays chunk -> featurize -> ANN -> greedy in ONE SQL
    statement, so the driver hash certifies the composed pipeline, not
    just its parts (the flagship-query treatment the relational tier got
    at `flagship_revenue_by_nation`).  100 TB: chunking/featurizing are
    row-local scans, the ANN serve is bucket-pruned, MMR touches only the
    bounded top-m pool — no stage is corpus-quadratic."""
    from pyspark.sql import functions as F

    from bigdata_rags_spark.functions.featurize import hashed_doc_vectors
    from bigdata_rags_spark.functions.vectors import as_double_array
    from bigdata_rags_spark.retrieval.mmr import mmr_rerank
    from bigdata_rags_spark.similarity.pq import ivfpq_search_rerank

    chunks = document_chunking(spark, sf_dir).select(
        (F.col("doc_id") * 100 + F.col("chunk_id")).cast("long").alias("doc_id"),
        F.col("chunk_text").alias("text"),
    )
    # one materialization: the ANN plan reads the chunk vectors from three
    # branches (cell assign, PQ encode, rerank fetch) plus the query side
    # and the MMR pool join (CLAUDE.md multi-branch rule)
    vecs = hashed_doc_vectors(chunks, dim=64).localCheckpoint()
    q = vecs.filter(F.col("vec_id") < 1)
    hits = ivfpq_search_rerank(q, vecs, k=10, n_probe=4, shortlist=50)
    pool = (
        hits.join(vecs, hits["neighbor_id"] == vecs["vec_id"])
        .select(
            F.col("neighbor_id").alias("doc_id"),
            F.round(F.col("similarity") * 1000).cast("bigint").alias("rel_milli"),
            as_double_array(F.col("embedding")).alias("v"),
        )
    )
    return mmr_rerank(pool, k=5, lambda_milli=700)


@query(
    "chunk_dedup_embedding_cache",
    f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS tk FROM documents),
chunks AS (
  SELECT doc_id,
         unnest(range(0, (len(tk) - 1) // 40 + 1)) AS chunk_id,
         unnest(list_transform(range(0, (len(tk) - 1) // 40 + 1),
                i -> array_to_string(tk[i * 40 + 1 : i * 40 + 50], ' '))) AS chunk_text
  FROM t
)
SELECT md5(chunk_text) AS chunk_hash,
       MIN(doc_id * 100 + chunk_id) AS keeper_key,
       CAST(COUNT(*) AS BIGINT) AS n_copies,
       CAST(COUNT(*) - 1 AS BIGINT) AS embeds_saved
FROM chunks
GROUP BY 1
""",
    tier=TIER_LLM,
)
def chunk_dedup_embedding_cache(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHUNK-grain exact dedup — the embedding-cache step every RAG
    ingestion pipeline runs between chunking and the (expensive) embedding
    call: identical chunks (overlap windows, boilerplate, re-crawled docs)
    embed ONCE under their content hash; `embeds_saved` is the per-hash
    count of skipped calls.  One hash agg on md5(chunk_text) with the
    deterministic keeper rule MIN(doc*100+chunk) — the `exact_dedup_docs`
    shape at chunk grain, feeding `rag_capstone_retrieval`'s featurizer.
    100 TB: chunking is a row-local scan and only (hash, key) pairs
    shuffle; the cache table this materializes is exactly the
    `chunk_hash` join key `document_chunking` already emits."""
    from pyspark.sql import functions as F

    ch = document_chunking(spark, sf_dir)
    return (
        ch.select(
            F.col("chunk_hash"),
            (F.col("doc_id") * 100 + F.col("chunk_id")).cast("long").alias("key"),
        )
        .groupBy("chunk_hash")
        .agg(
            F.min("key").alias("keeper_key"),
            F.count(F.lit(1)).cast("bigint").alias("n_copies"),
            (F.count(F.lit(1)) - 1).cast("bigint").alias("embeds_saved"),
        )
        .select("chunk_hash", "keeper_key", "n_copies", "embeds_saved")
    )


def _rm3_oracle(
    fb_k: int = 10, n_expansion: int = 10, alpha_micro: int = 500_000, k: int = 10
) -> str:
    """Chained-CTE replay of `retrieval/bm25.rm3_expanded_search`: first-pass
    BM25, integer-micro relevance-model weights over the top-fb_k feedback
    docs, RM3 interpolation, weighted second pass.  The weighted term score
    parenthesizes the Okapi factor FIRST — ``(qw/1e6) * (idf * (tf*2.2) /
    den)`` — matching Spark's expression tree exactly (left-assoc `a*b/c`
    would round differently in the last ulp)."""
    orig_micro = (1_000_000 - alpha_micro) // len(QUERY_TERMS)
    values = ", ".join(f"('{t}')" for t in QUERY_TERMS)
    okapi = (
        "ln((stats.n_docs - {df} + 0.5) / ({df} + 0.5) + 1.0)"
        " * ({tf} * 2.2) / ({tf} + 1.2 * (1 - 0.75 + 0.75 * dl.dl / avgl.avgdl))"
    )
    return f"""
WITH toks AS (SELECT doc_id, unnest({_SQL_TOKS}) AS token FROM documents),
pdt AS (
  SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf FROM toks GROUP BY 1, 2
),
dl AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM pdt GROUP BY doc_id),
stats AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM documents),
avgl AS (SELECT AVG(dl) AS avgdl FROM dl),
tfq AS (SELECT * FROM pdt WHERE token IN ({_TERMS_SQL})),
dfq AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS df FROM tfq GROUP BY token),
bm25q AS (
  SELECT tfq.doc_id,
         ROUND(SUM({okapi.format(df="dfq.df", tf="tfq.tf")}), 6) AS bm25_orig
  FROM tfq JOIN dfq USING (token) JOIN dl ON tfq.doc_id = dl.doc_id
  CROSS JOIN stats CROSS JOIN avgl
  GROUP BY tfq.doc_id
),
fb AS (
  SELECT doc_id FROM bm25q
  QUALIFY ROW_NUMBER() OVER (ORDER BY bm25_orig DESC, doc_id) <= {fb_k}
),
w AS (
  SELECT token, CAST(SUM(pdt.tf * 1000000 // dl.dl) AS BIGINT) AS w_micro
  FROM pdt JOIN fb USING (doc_id) JOIN dl ON pdt.doc_id = dl.doc_id
  WHERE token NOT IN ({_TERMS_SQL})
  GROUP BY token
),
expt AS (
  SELECT token, w_micro FROM w
  QUALIFY ROW_NUMBER() OVER (ORDER BY w_micro DESC, token) <= {n_expansion}
),
sumw AS (SELECT CAST(SUM(w_micro) AS BIGINT) AS tot FROM expt),
weights AS (
  SELECT token, CAST({orig_micro} AS BIGINT) AS qw_micro
  FROM (VALUES {values}) AS q(token)
  UNION ALL
  SELECT token, CAST({alpha_micro} * w_micro // tot AS BIGINT) FROM expt, sumw
),
tfa AS (SELECT pdt.* FROM pdt JOIN weights USING (token)),
dfa AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS df FROM tfa GROUP BY token),
rescored AS (
  SELECT tfa.doc_id,
         ROUND(SUM((wt.qw_micro / 1000000.0)
                   * ({okapi.format(df="dfa.df", tf="tfa.tf")})), 6) AS rm3_score,
         CAST(COUNT(*) AS BIGINT) AS matched_terms
  FROM tfa JOIN dfa USING (token) JOIN weights wt USING (token)
  JOIN dl ON tfa.doc_id = dl.doc_id
  CROSS JOIN stats CROSS JOIN avgl
  GROUP BY tfa.doc_id
)
SELECT r.doc_id, r.rm3_score, COALESCE(b.bm25_orig, 0.0) AS bm25_orig,
       r.matched_terms,
       CAST(ROW_NUMBER() OVER (ORDER BY r.rm3_score DESC, r.doc_id) AS INT) AS rnk
FROM rescored r LEFT JOIN bm25q b ON r.doc_id = b.doc_id
QUALIFY rnk <= {k}
"""


@query("rm3_expansion_search", _rm3_oracle(), tier=TIER_LLM)
def rm3_expansion_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pseudo-relevance-feedback retrieval (RM3, Lavrenko & Croft 2001 —
    `retrieval/bm25.rm3_expanded_search`; VERDICT r13 next #4): BM25 top-10
    feedback docs re-weight the query with their term distribution
    (integer-micro relevance model, 10 expansion terms, alpha = 0.5
    interpolation) and a weighted second BM25 pass re-ranks — the standard
    feedback rung above plain BM25, reported with the first-pass score
    alongside.  Scale: one tokenization shuffle (the per-(doc, token)
    relation is checkpointed for its four consumers), all feedback-derived
    frames are fb_k/n_expansion-bounded broadcasts, both top-k stages are
    TakeOrderedAndProject."""
    from bigdata_rags_spark.retrieval.bm25 import rm3_expanded_search

    docs = _docs_parallel(spark, sf_dir)
    return rm3_expanded_search(
        docs, QUERY_TERMS, fb_k=10, n_expansion=10, alpha_micro=500_000, k=10
    )


@query(
    "proximity_boosted_search",
    f"""
WITH {_SQL_BM25_CORE},
allpos AS (
  SELECT doc_id, unnest(tk) AS token, generate_subscripts(tk, 1) AS pos
  FROM (SELECT doc_id, {_SQL_TOKS} AS tk FROM documents)
),
pos AS (SELECT * FROM allpos WHERE token IN ({_TERMS_SQL})),
lagged AS (
  SELECT doc_id, pos, token,
         LAG(token) OVER (PARTITION BY doc_id ORDER BY pos) AS pt,
         LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS pp
  FROM pos
),
mind AS (
  SELECT doc_id, CAST(MIN(pos - pp) AS BIGINT) AS min_pair_dist
  FROM lagged WHERE token != pt GROUP BY doc_id
),
boosted AS (
  SELECT b.doc_id, b.bm25, b.matched_terms,
         CAST(COALESCE(m.min_pair_dist, 0) AS BIGINT) AS min_pair_dist,
         CAST(CASE WHEN m.min_pair_dist IS NOT NULL
                   THEN 2000 // m.min_pair_dist ELSE 0 END AS BIGINT)
           AS prox_boost_milli,
         CAST(FLOOR(b.bm25 * 1000) AS BIGINT)
           + CAST(CASE WHEN m.min_pair_dist IS NOT NULL
                       THEN 2000 // m.min_pair_dist ELSE 0 END AS BIGINT)
           AS score_milli
  FROM bm25 b LEFT JOIN mind m ON m.doc_id = b.doc_id
)
SELECT doc_id, bm25, matched_terms, min_pair_dist, prox_boost_milli, score_milli,
       CAST(ROW_NUMBER() OVER (ORDER BY score_milli DESC, doc_id) AS INT) AS rnk
FROM boosted
QUALIFY rnk <= 10
""",
    tier=TIER_LLM,
)
def proximity_boosted_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Proximity-enhanced BM25 (`retrieval/bm25.proximity_boosted_search`):
    the bag-of-words top-10 re-ranked with an exact positional boost —
    min token distance between DIFFERING query terms via one LAG window
    over the doc's matching positions (the closest differing pair is
    always position-adjacent), boost = 2000 DIV distance milli, added to
    FLOOR(bm25*1000).  The phrase-evidence refinement every lexical
    engine ships next to plain BM25; positions never leave the row until
    filtered to query terms."""
    return proximity_boosted_search_impl(_docs_parallel(spark, sf_dir))


def proximity_boosted_search_impl(docs: DataFrame) -> DataFrame:
    from bigdata_rags_spark.retrieval.bm25 import proximity_boosted_search as pbs

    return pbs(docs, QUERY_TERMS, k=10)
