"""Round-11 extension wave: three corpus/graph analytics operators —
Kneser-Ney smoothed bigram LM estimation, degree-oriented triangle
counting over the kNN graph, and a Heaps-law vocabulary-growth curve.

Cross-engine rules as registry.py: exact integer aggregates first,
then IDENTICAL scalar double expression trees on both engines (each op
is one correctly-rounded IEEE operation on bit-identical inputs, so
the doubles match bit for bit); power-of-two bucketing via string
length of bin() (floor(log2) is libm-dependent, the
corpus_length_histogram lesson).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from .registry import register

_KN_D = 0.75  # absolute discount; exactly representable in binary
_KN_MIN_C1 = 5
_KN_TOPK = 3


@register(
    "lm_kneser_ney_bigram",
    rf"""
    WITH w AS (
        SELECT doc_id,
               unnest(generate_series(1, len(ws))) - 1 AS pos, unnest(ws) AS w
        FROM (SELECT doc_id,
                     string_split_regex(lower(trim(text)), '\s+') AS ws
              FROM documents) t
    ), bg AS (
        SELECT a.w AS w1, b.w AS w2, COUNT(*) AS c12
        FROM w a JOIN w b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
        GROUP BY 1, 2
    ), uni AS (
        SELECT w1, SUM(c12) AS c1, COUNT(*) AS nf FROM bg GROUP BY w1
    ), prec AS (
        SELECT w2, COUNT(*) AS np FROM bg GROUP BY w2
    ), tt AS (
        SELECT COUNT(*) AS n_types FROM bg
    ), scored AS (
        SELECT bg.w1, bg.w2, CAST(bg.c12 AS BIGINT) AS c12,
               CAST(uni.c1 AS BIGINT) AS c1,
               ((CAST(bg.c12 AS DOUBLE) - {_KN_D}) / CAST(uni.c1 AS DOUBLE))
               + (({_KN_D} * CAST(uni.nf AS DOUBLE)) / CAST(uni.c1 AS DOUBLE))
                 * (CAST(prec.np AS DOUBLE) / CAST(tt.n_types AS DOUBLE))
                   AS p_kn
        FROM bg JOIN uni USING (w1) JOIN prec USING (w2) CROSS JOIN tt
    )
    SELECT w1, w2, c12, p_kn FROM (
        SELECT scored.*, ROW_NUMBER() OVER (
            PARTITION BY w1 ORDER BY p_kn DESC, w2) AS rn
        FROM scored
    ) r WHERE rn <= {_KN_TOPK} AND c1 >= {_KN_MIN_C1}
    """,
    tags=("textstats", "lm", "tiny-bnlj"),
    doc="Interpolated Kneser-Ney bigram LM (Kneser & Ney 1995; the "
    "KenLM default): P_KN(w2|w1) = max(c12-D,0)/c1 + lambda(w1) * "
    "Pcont(w2) with absolute discount D=0.75, lambda(w1) = "
    "D*N1+(w1,.)/c1, Pcont(w2) = N1+(.,w2)/N1+(.,.) — the continuation "
    "probability that makes KN strictly better than Katz/MLE backoff "
    "for LM training-data scoring.  Top-3 smoothed continuations per "
    "context with c1 >= 5.  ONE bigram shuffle; every other aggregate "
    "derives from the bigram table (context totals, follower counts, "
    "predecessor counts, the scalar type count broadcast to the scan "
    "— the j6 scalar-join shape, hence the tiny-bnlj tag).  All "
    "counts are exact BIGINTs; the double expression tree is written "
    "identically on both engines, so p_kn is bit-equal (D=0.75 is an "
    "exact binary literal; each op correctly rounded on identical "
    "inputs).",
)
def lm_kneser_ney_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    toks = docs.select(
        "doc_id",
        F.posexplode(F.split(F.lower(F.trim("text")), r"\s+")).alias("pos", "w"),
    )
    nxt = toks.select(
        F.col("doc_id").alias("d2"),
        (F.col("pos") - 1).alias("p2"),
        F.col("w").alias("w2"),
    )
    bg = (
        toks.join(
            nxt, (F.col("doc_id") == F.col("d2")) & (F.col("pos") == F.col("p2"))
        )
        .groupBy(F.col("w").alias("w1"), "w2")
        .agg(F.count("*").alias("c12"))
        .localCheckpoint(eager=False)  # feeds uni/prec/tt + the scan
    )
    uni = bg.groupBy("w1").agg(
        F.sum("c12").alias("c1"), F.count("*").alias("nf")
    )
    prec = bg.groupBy("w2").agg(F.count("*").alias("np"))
    tt = bg.agg(F.count("*").alias("n_types"))
    d = F.lit(_KN_D)
    scored = (
        bg.join(uni, "w1")
        .join(prec, "w2")
        .crossJoin(F.broadcast(tt))
        .select(
            "w1",
            "w2",
            F.col("c12").cast("long").alias("c12"),
            F.col("c1").cast("long").alias("c1"),
            (
                (F.col("c12").cast("double") - d) / F.col("c1").cast("double")
                + (d * F.col("nf").cast("double")) / F.col("c1").cast("double")
                * (F.col("np").cast("double") / F.col("n_types").cast("double"))
            ).alias("p_kn"),
        )
    )
    rn = F.row_number().over(W.partitionBy("w1").orderBy(F.desc("p_kn"), "w2"))
    return (
        scored.withColumn("rn", rn)
        .filter((F.col("rn") <= _KN_TOPK) & (F.col("c1") >= _KN_MIN_C1))
        .select("w1", "w2", "c12", "p_kn")
    )


def _knn_und_edges_ctes(k: int = 5) -> str:
    """Shared head: exact-cosine kNN edges -> symmetrized undirected
    edge set (same s/edges CTEs as the PageRank/LPA oracles)."""
    return f"""e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    s AS (
        SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
               list_dot_product(a.v, b.v)
                   / (sqrt(list_dot_product(a.v, a.v))
                      * sqrt(list_dot_product(b.v, b.v))) AS cosine
        FROM e a JOIN e b ON a.vec_id <> b.vec_id
    ),
    edges AS (
        SELECT vec_id AS src, neighbor_id AS dst FROM (
            SELECT s.*, ROW_NUMBER() OVER (
                PARTITION BY vec_id ORDER BY cosine DESC, neighbor_id) AS rank
            FROM s
        ) t WHERE rank <= {k}
    ),
    und AS (
        SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
        FROM edges
    )"""


@register(
    "graph_triangle_count",
    f"""
    WITH {_knn_und_edges_ctes(5)},
    deg AS (
        SELECT node, COUNT(*) AS degree FROM (
            SELECT u AS node FROM und UNION ALL SELECT v AS node FROM und
        ) GROUP BY node
    ),
    o AS (
        SELECT CASE WHEN (da.degree, und.u) < (db.degree, und.v)
                    THEN und.u ELSE und.v END AS lo,
               CASE WHEN (da.degree, und.u) < (db.degree, und.v)
                    THEN und.v ELSE und.u END AS hi
        FROM und
        JOIN deg da ON da.node = und.u
        JOIN deg db ON db.node = und.v
    ),
    tri AS (
        SELECT a.lo AS x, a.hi AS y, b.hi AS z
        FROM o a
        JOIN o b ON b.lo = a.hi
        JOIN o c ON c.lo = a.lo AND c.hi = b.hi
    ),
    part AS (
        SELECT node, COUNT(*) AS n_triangles FROM (
            SELECT x AS node FROM tri
            UNION ALL SELECT y AS node FROM tri
            UNION ALL SELECT z AS node FROM tri
        ) GROUP BY node
    )
    SELECT deg.node, CAST(deg.degree AS BIGINT) AS degree,
           CAST(COALESCE(part.n_triangles, 0) AS BIGINT) AS n_triangles,
           (2.0 * CAST(COALESCE(part.n_triangles, 0) AS DOUBLE))
               / (CAST(deg.degree AS DOUBLE)
                  * (CAST(deg.degree AS DOUBLE) - 1.0)) AS clustering_coeff
    FROM deg LEFT JOIN part ON part.node = deg.node
    """,
    tags=("graph",),
    doc="Exact triangle counting + local clustering coefficient over "
    "the symmetrized cosine 5-NN graph — the density/cohesion signal "
    "behind community quality checks and SemDeDup-style cluster "
    "auditing.  Degree-oriented node-iterator (Schank & Wagner 2005 "
    "forward algorithm): every undirected edge is oriented from its "
    "lower (degree, id) endpoint, which bounds each node's "
    "out-neighborhood by O(sqrt(m)), so the wedge join (b.lo = a.hi) "
    "fans out at most sqrt(m) per edge REGARDLESS of hub skew — the "
    "property that makes the two equi-joins survive a power-law graph "
    "at 100 TB where id-orientation explodes on hubs.  Each triangle "
    "is counted exactly once (its unique orientation is acyclic); "
    "participation re-credits all three corners.  kNN degree >= k, so "
    "the clustering denominator never divides by zero.",
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..extensions.similarity import knn_graph

    emb = load_table(spark, "embeddings", sf_dir)
    edges = knn_graph(emb, k=5).select("vec_id", "neighbor_id")
    und = (
        edges.select(
            F.least("vec_id", "neighbor_id").alias("u"),
            F.greatest("vec_id", "neighbor_id").alias("v"),
        )
        .distinct()
        .localCheckpoint(eager=False)  # feeds deg + orientation + joins
    )
    deg = (
        und.select(F.col("u").alias("node"))
        .unionAll(und.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("degree"))
    )
    da = deg.select(F.col("node").alias("u"), F.col("degree").alias("du"))
    db = deg.select(F.col("node").alias("v"), F.col("degree").alias("dv"))
    fwd = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    o = (
        und.join(da, "u")
        .join(db, "v")
        .select(
            F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("lo"),
            F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("hi"),
        )
        .localCheckpoint(eager=False)  # three-way self-join input
    )
    a = o.select(F.col("lo").alias("x"), F.col("hi").alias("y"))
    b = o.select(F.col("lo").alias("y"), F.col("hi").alias("z"))
    c = o.select(F.col("lo").alias("x"), F.col("hi").alias("z"))
    tri = a.join(b, "y").join(c, ["x", "z"]).select("x", "y", "z")
    part = (
        tri.select(F.col("x").alias("node"))
        .unionAll(tri.select(F.col("y").alias("node")))
        .unionAll(tri.select(F.col("z").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("n_triangles"))
    )
    degd = F.col("degree").cast("double")
    return (
        deg.join(part, "node", "left")
        .select(
            "node",
            F.col("degree").cast("long").alias("degree"),
            F.coalesce("n_triangles", F.lit(0)).cast("long").alias("n_triangles"),
            (
                (F.lit(2.0) * F.coalesce("n_triangles", F.lit(0)).cast("double"))
                / (degd * (degd - F.lit(1.0)))
            ).alias("clustering_coeff"),
        )
    )


@register(
    "corpus_heaps_curve",
    r"""
    WITH w AS (
        SELECT doc_id, unnest(ws) AS w
        FROM (SELECT doc_id,
                     string_split_regex(lower(trim(text)), '\s+') AS ws
              FROM documents) t
        WHERE len(ws) > 0
    ), tok AS (
        SELECT w, MIN(doc_id) AS first_doc FROM w WHERE w <> '' GROUP BY w
    ), dt AS (
        SELECT doc_id, COUNT(*) AS n_tok FROM w WHERE w <> '' GROUP BY doc_id
    ), hv AS (
        SELECT CASE WHEN first_doc = 0 THEN 0
                    ELSE length(bin(first_doc)) END AS j,
               COUNT(*) AS vocab_new
        FROM tok GROUP BY 1
    ), hd AS (
        SELECT CASE WHEN doc_id = 0 THEN 0
                    ELSE length(bin(doc_id)) END AS j,
               COUNT(*) AS docs_new, SUM(n_tok) AS tokens_new
        FROM dt GROUP BY 1
    ), m AS (
        SELECT COALESCE(hd.j, hv.j) AS j,
               COALESCE(docs_new, 0) AS docs_new,
               COALESCE(tokens_new, 0) AS tokens_new,
               COALESCE(vocab_new, 0) AS vocab_new
        FROM hd FULL OUTER JOIN hv ON hv.j = hd.j
    )
    SELECT CAST(j AS BIGINT) AS j,
           CAST(SUM(docs_new) OVER ord AS BIGINT) AS n_docs,
           CAST(SUM(tokens_new) OVER ord AS BIGINT) AS n_tokens,
           CAST(SUM(vocab_new) OVER ord AS BIGINT) AS vocab_size
    FROM m
    WINDOW ord AS (ORDER BY j ROWS BETWEEN UNBOUNDED PRECEDING
                   AND CURRENT ROW)
    """,
    tags=("textstats", "corpus", "tiny-global-window"),
    doc="Heaps-law vocabulary-growth curve: for doc-id checkpoints "
    "2^j, the cumulative (docs, tokens, DISTINCT vocabulary) seen so "
    "far — the curve V(N) ~ K*N^beta a tokenizer team reads before "
    "sizing a vocabulary, and the saturation check (flattening curve "
    "= duplicated corpus) data-quality reviews use.  One token "
    "shuffle to find each type's FIRST document (min doc_id), one "
    "scan-stage per-doc token count; both collapse into power-of-two "
    "histograms (<= 64 rows — doc-id bit length via length(bin()), "
    "never floor(log2), the corpus_length_histogram libm lesson), "
    "and the curve is a running sum over that tiny frame.  The heavy "
    "work is corpus-linear with ONE shuffle; the single-partition "
    "window touches O(64) rows.",
)
def corpus_heaps_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    w = docs.select(
        "doc_id", F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("w")
    ).filter(F.col("w") != "")
    bucket = lambda c: F.when(  # noqa: E731
        F.col(c) == 0, F.lit(0).cast("long")
    ).otherwise(F.length(F.bin(F.col(c))).cast("long"))
    hv = (
        w.groupBy("w")
        .agg(F.min("doc_id").alias("first_doc"))
        .groupBy(bucket("first_doc").alias("j"))
        .agg(F.count("*").alias("vocab_new"))
    )
    hd = (
        w.groupBy("doc_id")
        .agg(F.count("*").alias("n_tok"))
        .groupBy(bucket("doc_id").alias("j"))
        .agg(F.count("*").alias("docs_new"), F.sum("n_tok").alias("tokens_new"))
    )
    m = (
        hd.join(hv, "j", "full_outer")
        .select(
            "j",
            F.coalesce("docs_new", F.lit(0)).alias("docs_new"),
            F.coalesce("tokens_new", F.lit(0)).alias("tokens_new"),
            F.coalesce("vocab_new", F.lit(0)).alias("vocab_new"),
        )
    )
    ord_w = W.orderBy("j").rowsBetween(W.unboundedPreceding, W.currentRow)
    return m.select(
        F.col("j").cast("long").alias("j"),
        F.sum("docs_new").over(ord_w).cast("long").alias("n_docs"),
        F.sum("tokens_new").over(ord_w).cast("long").alias("n_tokens"),
        F.sum("vocab_new").over(ord_w).cast("long").alias("vocab_size"),
    )
