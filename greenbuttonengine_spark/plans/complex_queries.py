"""Complex-type scalar surface: array / map / lateral-explode queries
(§2.6 widening — the reference's columnar structs are flat, but a
general engine needs first-class nested types; embeddings and JSON
props are the natural carriers in this schema).

All results are SCALARS or exploded rows — never raw array/map cells —
so the cross-engine value-hash comparison stays well-defined.

Scale notes: every operation here is a native Catalyst expression
(higher-order functions, explode) — no Python, no shuffle except where
an aggregation needs one.  Explodes multiply rows; at 100 TB keep the
projection before the explode narrow (Catalyst prunes automatically,
asserted in tests/test_plan_health.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from .registry import register


@register(
    "arr1_array_functions",
    """
    SELECT vec_id,
           len(embedding) AS n_dims,
           CAST(embedding[1] AS DOUBLE) AS first_val,
           CAST(embedding[len(embedding)] AS DOUBLE) AS last_val,
           CAST(list_aggregate(embedding, 'min') AS DOUBLE) AS vmin,
           CAST(list_aggregate(embedding, 'max') AS DOUBLE) AS vmax,
           list_sum(list_transform(embedding[1:8], x -> CAST(x AS DOUBLE)))
               AS head8_sum,
           CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_pos
    FROM embeddings
    """,
    tags=("array",),
    doc="Array scalar surface: size / element_at (head, tail) / min / "
    "max / sliced fold / filtered count, all native HOFs in codegen.",
)
def arr1_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, "embeddings", sf_dir)
    head8 = F.aggregate(
        F.slice("embedding", 1, 8), F.lit(0.0), lambda acc, x: acc + x.cast("double")
    )
    return emb.select(
        "vec_id",
        F.size("embedding").cast("bigint").alias("n_dims"),
        F.element_at("embedding", 1).cast("double").alias("first_val"),
        F.element_at("embedding", -1).cast("double").alias("last_val"),
        F.array_min("embedding").cast("double").alias("vmin"),
        F.array_max("embedding").cast("double").alias("vmax"),
        head8.alias("head8_sum"),
        F.size(F.filter("embedding", lambda x: x > 0)).cast("bigint").alias("n_pos"),
    )


@register(
    "arr2_posexplode",
    """
    SELECT vec_id, CAST(i - 1 AS BIGINT) AS pos,
           CAST(embedding[i] AS DOUBLE) AS val
    FROM embeddings, unnest(range(1, len(embedding) + 1)) t(i)
    WHERE vec_id < 50
    """,
    tags=("array", "explode"),
    doc="Lateral explode with position (posexplode) — array rows to "
    "relational rows, the unnest primitive every nested pipeline needs.",
)
def arr2_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, "embeddings", sf_dir).filter(F.col("vec_id") < 50)
    return emb.select(
        "vec_id", F.posexplode("embedding").alias("pos", "val")
    ).select(
        "vec_id", F.col("pos").cast("bigint").alias("pos"), F.col("val").cast("double").alias("val")
    )


@register(
    "text_word_count",
    """
    SELECT w AS word, COUNT(*) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
    GROUP BY w
    ORDER BY n DESC, word
    LIMIT 50
    """,
    tags=("text", "explode", "agg"),
    doc="The canonical explode+aggregate: token frequency over the "
    "corpus. At scale: partial counts combine map-side; top-50 is "
    "TakeOrderedAndProject.",
)
def text_word_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    return (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "word")
        .limit(50)
    )


@register(
    "map1_map_from_json",
    """
    SELECT event_id,
           CAST(len(json_keys(props)) AS BIGINT) AS n_keys,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
           json_extract_string(props, '$.k') IS NOT NULL AS has_k
    FROM events
    """,
    tags=("map", "json"),
    doc="JSON payload to a typed MAP column (from_json once, then map "
    "ops — the scale pattern for repeated key access, vs re-parsing "
    "with get_json_object per key).",
)
def map1_map_from_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    m = F.from_json("props", "map<string,bigint>")
    return ev.select(
        "event_id",
        F.size(F.map_keys(m)).cast("bigint").alias("n_keys"),
        F.element_at(m, "k").alias("k_val"),
        F.array_contains(F.map_keys(m), "k").alias("has_k"),
    )
