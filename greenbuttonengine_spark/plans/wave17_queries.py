"""Round-9 extension wave (ninth batch): deterministic fixed-point
k-means (Lloyd's algorithm) — the TRAINED-clustering component whose
MLlib form the engine deliberately keeps rows-only (ivf_topk,
pipeline_learned_quality).  Re-expressed over the 2^-12 integer grid
with seeded-sample init, every step is exact BIGINT arithmetic, so a
fixed iteration count unrolls into a DuckDB oracle the same way
pagerank/PCA/LPA do.

Division discipline: centroid means use sign-explicit truncating
division (CASE WHEN s < 0 THEN -((-s) // n) ELSE s // n END) — the
PCA-oracle trick — because Python's // floors while Spark's `div`
truncates; the abs-form makes all three engines agree bit for bit.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..extensions.similarity import seeded_centroids
from ..sources.catalog import load_table
from .extension_queries import _seeded_cells_cte
from .registry import register
from .wave9_queries import _PQ_GRID

_KM_K = 16
_KM_D = 64
_KM_ITERS = 2  # centroid updates; assignments run ITERS+1 times


def _km_ctes() -> str:
    """The shared training chain (c0 = quantized seeded sample ->
    (assign -> update) x ITERS), ending in ``c{_KM_ITERS}`` — reused by
    the silhouette eval (wave22).  Every CTE is O(n*k) rows at most."""
    head = f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    {_seeded_cells_cte(_KM_K)},
    qz AS MATERIALIZED (
        SELECT vec_id, unnest(list_transform(v,
                   u -> CAST(floor(u * {float(_PQ_GRID)!r}) AS BIGINT))) AS q,
               CAST(generate_subscripts(v, 1) AS BIGINT) - 1 AS d
        FROM e
    ),
    c0 AS MATERIALIZED (
        SELECT cell AS c, unnest(list_transform(v,
                   u -> CAST(floor(u * {float(_PQ_GRID)!r}) AS BIGINT))) AS cv,
               CAST(generate_subscripts(v, 1) AS BIGINT) - 1 AS d
        FROM seeds
    )"""
    steps = []
    for t in range(1, _KM_ITERS + 1):
        steps.append(f""",
    a{t} AS MATERIALIZED (
        SELECT vec_id, c FROM (
            SELECT z.vec_id, cc.c,
                   ROW_NUMBER() OVER (PARTITION BY z.vec_id
                       ORDER BY SUM((z.q - cc.cv) * (z.q - cc.cv)), cc.c)
                       AS rn
            FROM qz z JOIN c{t - 1} cc ON cc.d = z.d
            GROUP BY z.vec_id, cc.c
        ) t WHERE rn = 1
    ),
    s{t} AS MATERIALIZED (
        SELECT a.c, z.d, SUM(z.q) AS sq, COUNT(DISTINCT z.vec_id) AS n
        FROM a{t} a JOIN qz z ON z.vec_id = a.vec_id
        GROUP BY 1, 2
    ),
    c{t} AS MATERIALIZED (
        SELECT p.c, p.d,
               coalesce(CASE WHEN s.sq < 0 THEN -((-s.sq) // s.n)
                             ELSE s.sq // s.n END, p.cv) AS cv
        FROM c{t - 1} p
        LEFT JOIN s{t} s ON s.c = p.c AND s.d = p.d
    )""")
    return head + "".join(steps)


def _km_oracle_sql() -> str:
    """Training chain + final assignment with dist2."""
    return (
        _km_ctes()
        + f"""
    SELECT vec_id, CAST(c AS BIGINT) AS cluster,
           CAST(d2 AS BIGINT) AS dist2
    FROM (
        SELECT z.vec_id, cc.c,
               SUM((z.q - cc.cv) * (z.q - cc.cv)) AS d2,
               ROW_NUMBER() OVER (PARTITION BY z.vec_id
                   ORDER BY SUM((z.q - cc.cv) * (z.q - cc.cv)), cc.c) AS rn
        FROM qz z JOIN c{_KM_ITERS} cc ON cc.d = z.d
        GROUP BY z.vec_id, cc.c
    ) t WHERE rn = 1
    """
    )


def _km_partial_cols(cents: list[list[int]]):
    """Unrolled literal distances as 128 small 8-term partial columns
    plus 16 tiny totals (ann_pq_codes' geometry).  Like the PQ encode,
    the fused 64-input projection still exceeds janino's method limit,
    so the stage runs as interpreted expression eval — which is the
    FAST path here: flat Add/Multiply trees interpret nearly for
    free, while the lambda-dispatch HOF form they replace measured
    52x slower (SCALING.md round-9 scale-bug #2)."""
    cols = []
    for c_i, c in enumerate(cents):
        for h in range(_KM_D // 8):
            terms = [
                f"(q{d} - {c[d]}L) * (q{d} - {c[d]}L)"
                for d in range(8 * h, 8 * h + 8)
            ]
            cols.append(
                F.expr("(" + " + ".join(terms) + ")").alias(f"p_{c_i}_{h}")
            )
    return cols


def _km_dd_expr() -> str:
    totals = [
        "(" + " + ".join(f"p_{c_i}_{h}" for h in range(_KM_D // 8)) + ")"
        for c_i in range(_KM_K)
    ]
    return "array(" + ", ".join(totals) + ")"


@register(
    "embedding_kmeans_fixed",
    _km_oracle_sql(),
    tags=("embeddings", "iterative"),
    doc="Deterministic k-means (Lloyd's): seeded-sample init (the "
    "ann_ivf_topk LCG selection), vectors on the 2^-12 integer grid, "
    "2 full update iterations + a final assignment — every distance "
    "an exact BIGINT, every centroid mean a sign-explicit truncating "
    "integer division, empty clusters keep their previous centroid "
    "(the standard Lloyd guard), ties to the smallest cluster id.  "
    "This is the trained-codebook path the ANN family's honest "
    "recall numbers call for, expressed so that Python, Catalyst and "
    "the unrolled-CTE oracle agree bit for bit — MLlib's float "
    "k-means (similarity.ivf_topk, quality_model) remains the "
    "production variant, this is its driver-checkable twin.  Spark "
    "plan per iteration: ONE map-side-combined (cluster, dim) "
    "aggregate over the corpus + an O(k*d) driver collect (the "
    "PCA-moments pattern; 1024 ints), assignments via unrolled "
    "literal arithmetic (the ann_pq_codes 52x lesson; interpreted "
    "flat expressions, see _km_partial_cols) — no "
    "window, no join, no Python worker in the corpus path; exactly "
    "how MLlib shards Lloyd's, minus the float nondeterminism of "
    "its tree-aggregated doubles.",
)
def embedding_kmeans_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, "embeddings", sf_dir)
    qdf = emb.select(
        "vec_id",
        *[
            F.expr(
                f"CAST(floor(CAST(embedding[{i}] AS DOUBLE) * "
                f"{float(_PQ_GRID)!r}D) AS BIGINT)"
            ).alias(f"q{i}")
            for i in range(_KM_D)
        ],
    )
    # init: quantize the seeded sample driver-side (same floor(u*grid)
    # the engines apply; Python's math.floor on the identical double
    # product yields the identical integer)
    cents = [
        [int(math.floor(x * float(_PQ_GRID))) for x in sv]
        for _, sv, _ in seeded_centroids(emb, _KM_K)
    ]
    for _ in range(_KM_ITERS):
        assign = (
            qdf.select("*", *_km_partial_cols(cents))
            .withColumn("dd", F.expr(_km_dd_expr()))
            .select(
                "*",
                (F.expr("array_position(dd, array_min(dd))") - 1)
                .cast("int")
                .alias("cluster"),
            )
        )
        sums = (
            assign.groupBy("cluster")
            .agg(
                F.count("*").alias("n"),
                *[F.sum(f"q{d}").alias(f"s{d}") for d in range(_KM_D)],
            )
            .collect()
        )
        new = [list(c) for c in cents]
        for r in sums:
            for d in range(_KM_D):
                s, n = r[f"s{d}"], r["n"]
                new[r["cluster"]][d] = (
                    -((-s) // n) if s < 0 else s // n
                )
        cents = new
    final = qdf.select("*", *_km_partial_cols(cents)).withColumn(
        "dd", F.expr(_km_dd_expr())
    )
    return final.select(
        "vec_id",
        (F.expr("array_position(dd, array_min(dd))") - 1)
        .cast("long")
        .alias("cluster"),
        F.expr("array_min(dd)").cast("long").alias("dist2"),
    )
