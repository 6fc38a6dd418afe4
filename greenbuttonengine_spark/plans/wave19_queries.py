"""Round-10 extension wave: ORACLE-BACKED approximate aggregates.

``approx_aggregates`` (extension_queries) demonstrates Spark's
production sketches — HLL++ and percentile_approx — which are
engine-specific by construction and therefore rows-only.  This wave
adds the cross-engine sketch family so the approximate-aggregate
OPERATOR CLASS carries a full oracle: a K-minimum-values (bottom-k)
distinct sketch over the md5-60 hash (Bar-Yossef et al., RANDOM'02 —
the mergeable sketch HLL superseded but whose estimate is a pure
function of deterministic integer order statistics) and a fixed-bin
histogram median.  Same cross-engine rules as wave9_queries.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from .registry import register

_KMV_K = 256  # bottom-k sketch size; hash space is 2^60 (md5-60)


@register(
    "approx_sketch_aggregates",
    f"""
    WITH h AS (
        SELECT DISTINCT l_returnflag,
               CAST(concat('0x', substr(md5(CAST(l_orderkey AS VARCHAR)),
                    1, 15)) AS BIGINT) AS h
        FROM lineitem
    ),
    kmv AS (
        SELECT l_returnflag, COUNT(*) AS nk, MAX(h) AS hk FROM (
            SELECT h.*, ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                           ORDER BY h) AS rn
            FROM h
        ) WHERE rn <= {_KMV_K}
        GROUP BY l_returnflag
    ),
    ex AS (
        SELECT l_returnflag,
               CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_exact_orders,
               CAST(COUNT(*) AS BIGINT) AS n,
               (CAST(COUNT(*) AS BIGINT) + 1) // 2 AS mpos
        FROM lineitem GROUP BY l_returnflag
    ),
    bins AS (
        SELECT l_returnflag, CAST(floor(l_extendedprice) AS BIGINT) AS bin,
               COUNT(*) AS c
        FROM lineitem GROUP BY 1, 2
    ),
    med AS (
        SELECT b.l_returnflag, MIN(b.bin) AS med_bin FROM (
            SELECT bins.*, SUM(c) OVER (PARTITION BY l_returnflag
                ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING
                AND CURRENT ROW) AS cum
            FROM bins
        ) b JOIN ex ON ex.l_returnflag = b.l_returnflag
        WHERE b.cum >= ex.mpos
        GROUP BY b.l_returnflag
    )
    SELECT ex.l_returnflag,
           CASE WHEN kmv.nk < {_KMV_K} THEN CAST(kmv.nk AS DOUBLE)
                ELSE CAST({(_KMV_K - 1) * (1 << 60)} AS DOUBLE)
                     / CAST(kmv.hk AS DOUBLE) END AS kmv_distinct_orders,
           ex.n_exact_orders,
           CAST(med.med_bin AS DOUBLE) AS hist_median_price,
           ex.n
    FROM ex
    JOIN kmv ON kmv.l_returnflag = ex.l_returnflag
    JOIN med ON med.l_returnflag = ex.l_returnflag
    """,
    tags=("agg", "approx"),
    doc="Cross-engine approximate aggregates — the oracle-backed "
    "sibling of approx_aggregates (whose HLL++/KLL sketches are "
    "engine-specific by construction): per return flag, a K-minimum-"
    "values bottom-k distinct sketch (k=256 smallest md5-60 hashes; "
    "estimate (k-1)*2^60/h_(k), a pure function of deterministic "
    "integer order statistics — Bar-Yossef et al. RANDOM'02) and a "
    "fixed-bin histogram median (floor-dollar bins, lower-median "
    "cumulative rule), with the exact values alongside so the error "
    "is driver-visible.  Scale shape: the rank<=k filter compiles to "
    "WindowGroupLimit (Spark 4 pushes per-partition bottom-k below "
    "the shuffle), so the sketch side moves O(k * partitions) rows "
    "per group — the mergeability HLL is famous for, in declarative "
    "form; the exact columns are the EVAL, gate-scale only (a 100 TB "
    "run drops them).  pytest bounds KMV relative error and the "
    "median's bin-width error against exact.",
)
def approx_sketch_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    k = _KMV_K
    h = (
        F.conv(F.substring(F.md5(F.col("l_orderkey").cast("string")), 1, 15), 16, 10)
        .cast("long")
        .alias("h")
    )
    dh = li.select("l_returnflag", h).distinct()
    ranked = dh.withColumn(
        "rn", F.row_number().over(W.partitionBy("l_returnflag").orderBy("h"))
    ).filter(F.col("rn") <= k)
    kmv = ranked.groupBy("l_returnflag").agg(
        F.count("*").alias("nk"), F.max("h").alias("hk")
    )
    ex = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_orderkey").cast("long").alias("n_exact_orders"),
        F.count("*").cast("long").alias("n"),
    ).withColumn("mpos", F.expr("(n + 1) div 2"))
    bins = li.groupBy(
        "l_returnflag", F.floor("l_extendedprice").cast("long").alias("bin")
    ).agg(F.count("*").alias("c"))
    cum = bins.withColumn(
        "cum",
        F.sum("c").over(
            W.partitionBy("l_returnflag")
            .orderBy("bin")
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        ),
    )
    med = (
        cum.join(ex.select("l_returnflag", "mpos"), "l_returnflag")
        .filter(F.col("cum") >= F.col("mpos"))
        .groupBy("l_returnflag")
        .agg(F.min("bin").alias("med_bin"))
    )
    est = F.when(F.col("nk") < k, F.col("nk").cast("double")).otherwise(
        F.lit(float((k - 1) * (1 << 60))) / F.col("hk").cast("double")
    )
    return (
        ex.join(kmv, "l_returnflag")
        .join(med, "l_returnflag")
        .select(
            "l_returnflag",
            est.alias("kmv_distinct_orders"),
            "n_exact_orders",
            F.col("med_bin").cast("double").alias("hist_median_price"),
            "n",
        )
    )


_OVL_K = 256


@register(
    "approx_set_overlap_kmv",
    rf"""
    WITH w AS MATERIALIZED (
        SELECT DISTINCT source, word FROM (
            SELECT source,
                   unnest(string_split_regex(lower(trim(text)), '\s+'))
                       AS word
            FROM documents
        ) WHERE word <> ''
    ),
    dh AS (
        SELECT DISTINCT source,
               CAST(concat('0x', substr(md5(word), 1, 15)) AS BIGINT) AS h
        FROM w
    ),
    sk AS MATERIALIZED (
        SELECT source, h FROM (
            SELECT dh.*, ROW_NUMBER() OVER (PARTITION BY source
                                            ORDER BY h) AS rn
            FROM dh
        ) WHERE rn <= {_OVL_K}
    ),
    pairs AS (
        SELECT a.source AS source_a, b.source AS source_b
        FROM (SELECT DISTINCT source FROM sk) a
        JOIN (SELECT DISTINCT source FROM sk) b ON a.source < b.source
    ),
    m AS (
        SELECT p.source_a, p.source_b, s.h
        FROM pairs p JOIN sk s ON s.source = p.source_a
        UNION ALL
        SELECT p.source_a, p.source_b, s.h
        FROM pairs p JOIN sk s ON s.source = p.source_b
    ),
    g AS (
        SELECT source_a, source_b, h, COUNT(*) AS sides
        FROM m GROUP BY 1, 2, 3
    ),
    merged AS (
        SELECT source_a, source_b,
               COUNT(*) AS nk, MAX(h) AS hk,
               SUM(CASE WHEN sides = 2 THEN 1 ELSE 0 END) AS nc
        FROM (
            SELECT g.*, ROW_NUMBER() OVER (PARTITION BY source_a, source_b
                                           ORDER BY h) AS rn
            FROM g
        ) WHERE rn <= {_OVL_K}
        GROUP BY 1, 2
    ),
    ex AS (
        SELECT a.source AS source_a, b.source AS source_b,
               COUNT(*) AS exact_common
        FROM w a JOIN w b ON b.word = a.word AND a.source < b.source
        GROUP BY 1, 2
    ),
    sizes AS (SELECT source, COUNT(*) AS n FROM w GROUP BY source)
    SELECT m.source_a, m.source_b,
           CASE WHEN m.nk < {_OVL_K} THEN CAST(m.nk AS DOUBLE)
                ELSE CAST({(_OVL_K - 1) * (1 << 60)} AS DOUBLE)
                     / CAST(m.hk AS DOUBLE) END AS kmv_union_words,
           CAST(m.nc AS DOUBLE) / CAST(m.nk AS DOUBLE) AS kmv_jaccard,
           CAST(sa.n + sb.n - coalesce(ex.exact_common, 0) AS BIGINT)
               AS exact_union,
           CAST(coalesce(ex.exact_common, 0) AS BIGINT) AS exact_common
    FROM merged m
    JOIN sizes sa ON sa.source = m.source_a
    JOIN sizes sb ON sb.source = m.source_b
    LEFT JOIN ex ON ex.source_a = m.source_a AND ex.source_b = m.source_b
    """,
    tags=("agg", "approx", "dedup", "tiny-bnlj"),
    doc="Cross-source corpus-overlap estimation from MERGED KMV "
    "sketches — the sketch composition that makes bottom-k the "
    "practical HLL alternative: per source, the 256 smallest md5-60 "
    "word hashes; per source pair, the union sketch is the bottom-k "
    "of the two sketches' union (mergeability by construction), "
    "|A u B| ~ (k-1)*2^60/h_(k), and Jaccard ~ the fraction of the "
    "merged bottom-k present in BOTH sketches (Bar-Yossef et al. "
    "RANDOM'02; the cross-source-contamination estimate a curation "
    "pipeline runs before mixing crawls).  Exact union/intersection "
    "ride alongside as the gate-scale eval.  Scale shape: after the "
    "one distinct-shuffle + WindowGroupLimit bottom-k, everything "
    "downstream operates on O(sources * k) rows — source-pair "
    "estimation never touches the corpus again (the exact eval "
    "columns are what a 100 TB run drops).  The tiny-bnlj tag covers "
    "the source-pair generator (an inequality self-join over the "
    "O(sources) distinct-source list, never the corpus).  pytest "
    "bounds both estimators against the exact columns.",
)
def approx_set_overlap_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    k = _OVL_K
    w = (
        docs.select(
            "source",
            F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("word"),
        )
        .filter(F.col("word") != "")
        .distinct()
    )
    dh = w.select(
        "source",
        F.conv(F.substring(F.md5("word"), 1, 15), 16, 10)
        .cast("long")
        .alias("h"),
    ).distinct()
    sk = dh.withColumn(
        "rn", F.row_number().over(W.partitionBy("source").orderBy("h"))
    ).filter(F.col("rn") <= k).select("source", "h")
    srcs = sk.select("source").distinct()
    pairs = (
        srcs.alias("a")
        .join(srcs.alias("b"), F.col("a.source") < F.col("b.source"))
        .select(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
    )
    m = pairs.join(
        sk.select(F.col("source").alias("source_a"), "h"), "source_a"
    ).select("source_a", "source_b", "h").unionByName(
        pairs.join(
            sk.select(F.col("source").alias("source_b"), "h"), "source_b"
        ).select("source_a", "source_b", "h")
    )
    g = m.groupBy("source_a", "source_b", "h").agg(F.count("*").alias("sides"))
    merged = (
        g.withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("source_a", "source_b").orderBy("h")
            ),
        )
        .filter(F.col("rn") <= k)
        .groupBy("source_a", "source_b")
        .agg(
            F.count("*").alias("nk"),
            F.max("h").alias("hk"),
            F.sum(F.when(F.col("sides") == 2, 1).otherwise(0)).alias("nc"),
        )
    )
    ex = (
        w.alias("a")
        .join(
            w.alias("b"),
            (F.col("b.word") == F.col("a.word"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(F.count("*").alias("exact_common"))
    )
    sizes = w.groupBy("source").agg(F.count("*").alias("n"))
    est = F.when(F.col("nk") < k, F.col("nk").cast("double")).otherwise(
        F.lit(float((k - 1) * (1 << 60))) / F.col("hk").cast("double")
    )
    return (
        merged.join(
            sizes.select(F.col("source").alias("source_a"), F.col("n").alias("na")),
            "source_a",
        )
        .join(
            sizes.select(F.col("source").alias("source_b"), F.col("n").alias("nb")),
            "source_b",
        )
        .join(ex, ["source_a", "source_b"], "left")
        .select(
            "source_a",
            "source_b",
            est.alias("kmv_union_words"),
            (F.col("nc").cast("double") / F.col("nk").cast("double")).alias(
                "kmv_jaccard"
            ),
            (
                F.col("na") + F.col("nb") - F.coalesce("exact_common", F.lit(0))
            )
            .cast("long")
            .alias("exact_union"),
            F.coalesce("exact_common", F.lit(0)).cast("long").alias("exact_common"),
        )
    )
