"""Round-11 extension wave (fifth batch): kNN-graph link prediction
(common-neighbors / Jaccard — the missing-edge counterpart of wave-21's
triangle counting) and Flesch-Kincaid readability scoring (the classic
shallow text-quality signal alongside the Gopher/CCNet features).

Cross-engine rules as registry.py: exact integer counts, single
correctly-rounded IEEE ops on identical inputs, identical expression
trees on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from .registry import register
from .wave21_queries import _knn_und_edges_ctes

# --------------------------------------------------------------------------
# Link prediction over the kNN graph
# --------------------------------------------------------------------------

_LP_MIN_COMMON = 2


@register(
    "graph_link_prediction",
    f"""
    WITH {_knn_und_edges_ctes(5)},
    adj AS (
        SELECT u AS w, v AS n FROM und UNION ALL SELECT v, u FROM und
    ),
    deg AS (SELECT w AS node, COUNT(*) AS degree FROM adj GROUP BY 1),
    wedge AS (
        SELECT a.n AS u, b.n AS v, COUNT(*) AS n_common
        FROM adj a JOIN adj b ON a.w = b.w AND a.n < b.n
        GROUP BY 1, 2
    ),
    cand AS (
        SELECT w.* FROM wedge w
        LEFT JOIN und e ON e.u = w.u AND e.v = w.v
        WHERE e.u IS NULL AND w.n_common >= {_LP_MIN_COMMON}
    )
    SELECT c.u, c.v, CAST(c.n_common AS BIGINT) AS n_common,
           CAST(da.degree AS BIGINT) AS deg_u,
           CAST(db.degree AS BIGINT) AS deg_v,
           CAST(c.n_common AS DOUBLE)
               / CAST(da.degree + db.degree - c.n_common AS DOUBLE)
               AS jaccard
    FROM cand c
    JOIN deg da ON da.node = c.u
    JOIN deg db ON db.node = c.v
    """,
    tags=("graph",),
    doc="Link prediction over the symmetrized cosine 5-NN graph: for "
    "every NON-adjacent node pair sharing >= 2 neighbors, the "
    "common-neighbor count and neighborhood Jaccard "
    "|N(u) n N(v)| / |N(u) u N(v)| — the classic missing-edge scores "
    "(Liben-Nowell & Kleinberg 2003) that flag near-duplicate "
    "clusters the kNN edge set itself missed and candidate merges in "
    "entity resolution.  Complements graph_triangle_count: triangles "
    "audit edges that exist, this scores edges that should.  Exact "
    "integer counts + one division (Adamic-Adar is deliberately NOT "
    "declared — its 1/log(deg) float sum is accumulation-order-"
    "dependent).  Scale shape: the wedge self-join fans out "
    "deg(w)^2 per pivot node, bounded on a kNN graph (deg ~ 2k after "
    "symmetrization, never a power-law hub); candidates prune to an "
    "anti-join against the edge list; degrees broadcast.",
)
def graph_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..extensions.similarity import knn_graph

    emb = load_table(spark, "embeddings", sf_dir)
    edges = knn_graph(emb, k=5).select("vec_id", "neighbor_id")
    und = (
        edges.select(
            F.least("vec_id", "neighbor_id").alias("u"),
            F.greatest("vec_id", "neighbor_id").alias("v"),
        )
        .distinct()
        .localCheckpoint(eager=False)  # feeds adj, the anti-join, and deg
    )
    adj = und.select(F.col("u").alias("w"), F.col("v").alias("n")).unionAll(
        und.select(F.col("v").alias("w"), F.col("u").alias("n"))
    )
    deg = adj.groupBy(F.col("w").alias("node")).agg(F.count("*").alias("degree"))
    a = adj.select("w", F.col("n").alias("u"))
    b = adj.select("w", F.col("n").alias("v"))
    wedge = (
        a.join(b, "w")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count("*").alias("n_common"))
        .filter(F.col("n_common") >= _LP_MIN_COMMON)
    )
    cand = wedge.join(und, ["u", "v"], "left_anti")
    da = deg.select(F.col("node").alias("u"), F.col("degree").alias("deg_u"))
    db = deg.select(F.col("node").alias("v"), F.col("degree").alias("deg_v"))
    return (
        cand.join(F.broadcast(da), "u")
        .join(F.broadcast(db), "v")
        .select(
            "u",
            "v",
            F.col("n_common").cast("long").alias("n_common"),
            F.col("deg_u").cast("long").alias("deg_u"),
            F.col("deg_v").cast("long").alias("deg_v"),
            (
                F.col("n_common").cast("double")
                / (F.col("deg_u") + F.col("deg_v") - F.col("n_common")).cast(
                    "double"
                )
            ).alias("jaccard"),
        )
    )


# --------------------------------------------------------------------------
# Flesch-Kincaid readability
# --------------------------------------------------------------------------


@register(
    "text_readability",
    r"""
    WITH t AS (
        SELECT doc_id,
               string_split_regex(lower(trim(text)), '\s+') AS ws,
               regexp_split_to_array(text, '[.!?]+') AS sents
        FROM documents
    ),
    c AS (
        SELECT doc_id,
               CAST(len(list_filter(ws, w -> w <> '')) AS BIGINT) AS n_words,
               CAST(greatest(len(list_filter(sents, x -> trim(x) <> '')), 1)
                    AS BIGINT) AS n_sentences,
               CAST(list_sum([len(regexp_extract_all(w, '[aeiouy]+'))
                              for w in ws]) AS BIGINT) AS n_syllables
        FROM t
    )
    SELECT doc_id, n_words, n_sentences, n_syllables,
           CASE WHEN n_words = 0 THEN NULL
                ELSE 0.39 * (CAST(n_words AS DOUBLE)
                             / CAST(n_sentences AS DOUBLE))
                     + 11.8 * (CAST(n_syllables AS DOUBLE)
                               / CAST(n_words AS DOUBLE))
                     - 15.59 END AS fk_grade,
           CASE WHEN n_words = 0 THEN NULL
                ELSE 206.835
                     - 1.015 * (CAST(n_words AS DOUBLE)
                                / CAST(n_sentences AS DOUBLE))
                     - 84.6 * (CAST(n_syllables AS DOUBLE)
                               / CAST(n_words AS DOUBLE)) END AS flesch_ease
    FROM c
    """,
    tags=("textstats",),
    doc="Flesch-Kincaid grade level and Flesch reading ease per doc — "
    "the shallow readability signal curation recipes run next to the "
    "Gopher/CCNet features (too-hard AND too-easy both flag non-prose: "
    "code, tables, keyword spam).  Syllables estimated as vowel-group "
    "runs ([aeiouy]+ matches per word — a regex count, not a "
    "dictionary, identical in RE2 and Java regex for this class), "
    "sentences as non-blank [.!?]+ splits (floor 1), words as "
    "non-empty whitespace tokens.  All three counts are exact "
    "integers; the two scores are the textbook linear forms computed "
    "with the identical op sequence both engines (each constant "
    "parses to the same double; each mul/div/add correctly rounded), "
    "NULL on empty docs.  Scan-stage only: no shuffle, no join, no "
    "explode — the counts fold inside the per-row array expressions.",
)
def text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    t = docs.select(
        "doc_id",
        F.split(F.lower(F.trim("text")), r"\s+").alias("ws"),
        F.split("text", r"[.!?]+").alias("sents"),
    )
    c = t.select(
        "doc_id",
        F.expr("size(filter(ws, w -> w != ''))").cast("long").alias("n_words"),
        F.greatest(
            F.expr("size(filter(sents, x -> trim(x) != ''))"), F.lit(1)
        )
        .cast("long")
        .alias("n_sentences"),
        F.expr(
            "aggregate(ws, 0L, (acc, w) -> "
            "acc + size(regexp_extract_all(w, '[aeiouy]+', 0)))"
        )
        .cast("long")
        .alias("n_syllables"),
    )
    wps = F.col("n_words").cast("double") / F.col("n_sentences").cast("double")
    spw = F.col("n_syllables").cast("double") / F.col("n_words").cast("double")
    return c.select(
        "doc_id",
        "n_words",
        "n_sentences",
        "n_syllables",
        F.when(F.col("n_words") == 0, F.lit(None).cast("double"))
        .otherwise(F.lit(0.39) * wps + F.lit(11.8) * spw - F.lit(15.59))
        .alias("fk_grade"),
        F.when(F.col("n_words") == 0, F.lit(None).cast("double"))
        .otherwise(F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * spw)
        .alias("flesch_ease"),
    )
