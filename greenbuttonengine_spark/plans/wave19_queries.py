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

_KMV_K = 256
_KMV_M = float(1 << 60)  # hash space size (md5-60)


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
