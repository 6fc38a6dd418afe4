"""Embedding-column utilities for training-data pipelines.

  quantize_int8   symmetric per-vector int8 quantization — the standard
                  4x storage/bandwidth reduction before ANN index build
                  or shipping embeddings to a trainer.
  l2_normalize    unit-norm projection (cosine == dot after this).

All math is native Catalyst higher-order functions in DOUBLE, with
rounding expressed as floor(x + 0.5) so results are bit-deterministic
across engines (Spark's round() and DuckDB's round() disagree on
half-way ties; floor does not).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _as_double(vec_col: str):
    return F.transform(F.col(vec_col), lambda x: x.cast("double"))


def quantize_int8(
    emb: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Per-vector symmetric int8 quantization.

    scale = max(|v|) / 127;  q_i = floor(v_i / scale + 0.5)  (so the
    largest-magnitude component maps to ±127).  Output is EXPLODED to
    (id, dim, q, scale) scalar rows — array columns don't canonicalize
    identically across engines, scalars do.

    Scale shape: one narrow projection + posexplode, no shuffle at all;
    at 100 TB this runs in the scan stage and writes a table 4x
    smaller than the float32 input.
    """
    base = emb.select(F.col(id_col), _as_double(vec_col).alias("v")).withColumn(
        "scale",
        F.array_max(F.transform(F.col("v"), lambda x: F.abs(x))) / F.lit(127.0),
    )
    # all-zero vector -> scale 0: quantize to 0 instead of dividing by
    # zero (nullif/coalesce, mirrored exactly in the oracle SQL)
    q = F.transform(
        F.col("v"),
        lambda x: F.coalesce(
            F.floor(x / F.nullif(F.col("scale"), F.lit(0.0)) + F.lit(0.5)).cast(
                "int"
            ),
            F.lit(0),
        ),
    )
    return base.select(F.col(id_col), F.col("scale"), F.posexplode(q).alias("dim", "q")).select(
        F.col(id_col),
        F.col("dim").cast("int").alias("dim"),
        F.col("q"),
        F.col("scale"),
    )


def l2_normalize(
    emb: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Unit-L2 vectors: v / ||v||; dot products become cosines."""
    base = emb.select(F.col(id_col), _as_double(vec_col).alias("v")).withColumn(
        "norm",
        F.sqrt(
            F.aggregate(
                F.transform(F.col("v"), lambda x: x * x),
                F.lit(0.0),
                lambda a, x: a + x,
            )
        ),
    )
    return base.select(
        F.col(id_col),
        F.transform(F.col("v"), lambda x: x / F.col("norm")).alias("unit"),
        F.col("norm"),
    )


def label_centroids(
    emb: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
    grid: int = 64,
) -> DataFrame:
    """Per-label embedding centroids via fixed-point accumulation.

    Floating-point SUM is partition-order dependent — the one thing a
    reproducible corpus statistic cannot be.  So each component is
    snapped to a 1/``grid`` fixed-point lattice (floor(v*grid + 0.5),
    exact: grid is a power of two so v*grid is a lossless scale), the
    lattice integers are summed (associative, order-free), and ONE
    exact double division sum/(grid*count) converts back at the end.
    Result: bit-identical centroids on any cluster layout, any retry,
    any engine, at 1/128-precision — plenty for routing/monitoring
    (IVF seeding, per-source drift dashboards).

    Output is exploded (label, dim, centroid, n_vecs) scalar rows.
    Scale shape: posexplode in the scan stage, then one (label, dim)
    hash agg with map-side partial sums — the wire carries
    labels x dims rows, independent of corpus size.
    """
    q = emb.select(
        F.col(label_col).alias("label"),
        F.posexplode(
            F.transform(
                _as_double(vec_col),
                lambda x: F.floor(x * F.lit(float(grid)) + F.lit(0.5)).cast("long"),
            )
        ).alias("dim", "qg"),
    )
    agg = q.groupBy("label", "dim").agg(
        F.sum("qg").alias("__s"), F.count("*").alias("__c")
    )
    return agg.select(
        F.col("label").cast("long").alias("label"),
        F.col("dim").cast("long").alias("dim"),
        (
            F.col("__s").cast("double")
            / (F.lit(float(grid)) * F.col("__c").cast("double"))
        ).alias("centroid"),
        F.col("__c").cast("long").alias("n_vecs"),
    )
