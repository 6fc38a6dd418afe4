"""Declared queries for the lexical-retrieval operators
(``extensions/search.py``): inverted-index postings statistics, TF-IDF
term weighting, BM25 ranked retrieval.

All three are fully oracle-backed: tokenization is a shared
``lower`` + split-on-``[^a-z]+`` that Java regex and RE2 agree on, and
every weight is built only from correctly-rounded IEEE +,-,*,/ over
exact integers (no ``ln``), so the doubles are bit-identical across
engines — see the module docstring in ``extensions/search.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..extensions import search
from ..sources.catalog import load_table
from .registry import register

# shared tokenization CTE for the DuckDB side
_TERMS_CTE = r"""
    toks AS (
        SELECT doc_id, w AS term
        FROM (SELECT doc_id,
                     unnest(string_split_regex(lower(text), '[^a-z]+')) AS w
              FROM documents)
        WHERE w <> ''
    ),
    tf AS (
        SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2
    )
"""


@register(
    "text_postings_stats",
    f"""
    WITH {_TERMS_CTE}
    SELECT term,
           CAST(COUNT(*) AS BIGINT) AS doc_freq,
           CAST(SUM(tf) AS BIGINT) AS coll_freq
    FROM tf
    GROUP BY term
    ORDER BY doc_freq DESC, coll_freq DESC, term ASC
    LIMIT 20
    """,
    tags=("search",),
    doc="Inverted-index dictionary build: per-term document frequency "
    "and collection frequency, top-20 under a total order.  The "
    "(doc, term) tf pass combines map-side; the df pass shuffles one "
    "row per distinct (doc, term).",
)
def text_postings_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return search.postings_stats(load_table(spark, "documents", sf_dir), top=20)


@register(
    "text_tfidf_topk",
    f"""
    WITH {_TERMS_CTE},
    dfq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
    nd AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.term,
               CAST(tf.tf AS BIGINT) AS tf, CAST(dfq.df AS BIGINT) AS df,
               CAST(tf.tf AS DOUBLE)
                   * (CAST(nd.n_docs AS DOUBLE) / CAST(dfq.df AS DOUBLE)) AS tfidf
        FROM tf JOIN dfq USING (term) CROSS JOIN nd
    )
    SELECT doc_id, term, tf, df, tfidf, CAST(rank AS BIGINT) AS rank
    FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                       ORDER BY tfidf DESC, term ASC) AS rank
          FROM scored)
    WHERE rank <= 3
    """,
    tags=("search", "tiny-bnlj"),
    doc="Top-3 characteristic terms per doc by TF-IDF with a ratio idf "
    "(N/df, no ln — bit-deterministic weights; ranking can differ from "
    "ln-idf since ln(idf) is not monotone in the tf*idf product).  "
    "Window partitioned per doc: no global sort; the n_docs scalar is "
    "a one-row broadcast (tiny-bnlj).",
)
def text_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return search.tfidf_top_terms(load_table(spark, "documents", sf_dir), k=3)


_BM25_TERMS = ("hash", "join", "vector")


def _bm25_sql(terms: tuple[str, ...], limit: int = 10) -> str:
    for t in terms:
        if not t.isascii() or not t.isalpha() or t != t.lower():
            raise ValueError(
                f"BM25 oracle terms must match the [a-z]+ token alphabet: {t!r}"
            )
    tf_cols = ",\n               ".join(
        f"SUM(CASE WHEN term = '{t}' THEN tf END) AS tf_{i}"
        for i, t in enumerate(terms)
    )
    df_cols = ",\n               ".join(
        f"CAST(COUNT(CASE WHEN term = '{t}' THEN 1 END) AS BIGINT) AS df_{i}"
        for i, t in enumerate(terms)
    )
    contribs = " + ".join(
        f"""COALESCE(
            ((CAST(n_docs AS DOUBLE) - CAST(df_{i} AS DOUBLE) + 0.5)
                 / (CAST(df_{i} AS DOUBLE) + 0.5))
            * (CAST(tf_{i} AS DOUBLE) * (1.2 + 1.0))
            / (CAST(tf_{i} AS DOUBLE)
               + 1.2 * (1.0 - 0.75 + 0.75 * (CAST(dl AS DOUBLE)
                   / (CAST(total_tokens AS DOUBLE) / CAST(n_docs AS DOUBLE))))),
            0.0)"""
        for i in range(len(terms))
    )
    return f"""
    WITH {_TERMS_CTE},
    per_doc AS (
        SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl,
               {tf_cols}
        FROM tf GROUP BY 1
    ),
    stats AS (
        SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
               CAST(SUM(tf) AS BIGINT) AS total_tokens,
               {df_cols}
        FROM tf
    )
    SELECT doc_id, dl, score FROM (
        SELECT doc_id, dl, {contribs} AS score
        FROM per_doc CROSS JOIN stats
    )
    WHERE score > 0
    ORDER BY score DESC, doc_id ASC
    LIMIT {limit}
    """


@register(
    "search_bm25_topk",
    _bm25_sql(_BM25_TERMS),
    tags=("search", "tiny-bnlj"),
    doc="BM25 top-10 for the query {hash, join, vector} (k1=1.2, "
    "b=0.75), ratio-form idf.  One (doc,term) shuffle doubles as the "
    "doc-length pass; corpus stats reduce to one broadcast row; "
    "per-term contributions are separate columns summed in fixed "
    "order (no data-order double SUM).",
)
def search_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return search.bm25_topk(
        load_table(spark, "documents", sf_dir), list(_BM25_TERMS), k=10
    )


def _hybrid_sql() -> str:
    return f"""
    WITH lex_base AS (
        SELECT * FROM ({_bm25_sql(_BM25_TERMS, 20)}) tl
    ), lex AS (
        SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS r
        FROM lex_base
    ), vq AS (
        -- isfinite gate mirrors similarity._with_norm (r14 ADVICE 1+2)
        SELECT qv FROM (SELECT embedding::DOUBLE[] AS qv
                        FROM embeddings WHERE vec_id = 0)
        WHERE isfinite(list_dot_product(qv, qv))
    ), vs AS (
        SELECT e.vec_id AS doc_id,
               list_dot_product(vq.qv, e.v)
                   / (sqrt(list_dot_product(vq.qv, vq.qv))
                      * sqrt(list_dot_product(e.v, e.v))) AS cosine
        FROM (SELECT vec_id, v FROM (SELECT vec_id, embedding::DOUBLE[] AS v
                                     FROM embeddings WHERE vec_id <> 0)
              WHERE isfinite(list_dot_product(v, v))) e CROSS JOIN vq
    ), vec AS (
        SELECT doc_id, r FROM (
            SELECT doc_id, row_number() OVER (ORDER BY cosine DESC, doc_id) AS r
            FROM vs
        ) WHERE r <= 20
    )
    SELECT doc_id,
           COALESCE(1.0 / (60 + lex.r), 0.0)
               + COALESCE(1.0 / (60 + vec.r), 0.0) AS rrf
    FROM lex FULL JOIN vec USING (doc_id)
    ORDER BY rrf DESC, doc_id
    LIMIT 10
    """


@register(
    "search_hybrid_rrf",
    _hybrid_sql(),
    tags=("search", "tiny-bnlj", "tiny-global-window", "all-pairs"),
    doc="Hybrid retrieval: BM25 lexical top-20 fused with embedding "
    "cosine top-20 (query = vec 0) by reciprocal-rank fusion "
    "score = sum 1/(60+rank). The modern RAG retrieval shape: both "
    "legs stay distributed (one (doc,term) shuffle; one broadcast "
    "query-vector scan), the fusion join touches 40 rows. RRF uses "
    "only integer ranks -> bit-deterministic doubles. Rank windows "
    "run over the 20-row leg results (tiny-global-window).",
)
def search_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from ..extensions import similarity

    docs = load_table(spark, "documents", sf_dir)
    emb = load_table(spark, "embeddings", sf_dir)

    lex = search.bm25_topk(docs, list(_BM25_TERMS), k=20).select(
        "doc_id",
        F.row_number()
        .over(W.orderBy(F.desc("score"), F.asc("doc_id")))
        .alias("rl"),
    )
    vec = (
        similarity.cosine_topk(emb, emb.filter(F.col("vec_id") == 0), k=20)
        .select(F.col("neighbor_id").alias("doc_id"), F.col("rank").alias("rv"))
    )
    rrf = F.coalesce(F.lit(1.0) / (F.lit(60) + F.col("rl")), F.lit(0.0)) + F.coalesce(
        F.lit(1.0) / (F.lit(60) + F.col("rv")), F.lit(0.0)
    )
    return (
        lex.join(vec, "doc_id", "full")
        .select("doc_id", rrf.alias("rrf"))
        .orderBy(F.desc("rrf"), F.asc("doc_id"))
        .limit(10)
    )
