"""Catalog over the driver's synthetic star schema (TESTDATA.md).

Parquet scans here are the root of every declared query; keeping them as
plain ``spark.read.parquet`` calls means Catalyst's predicate pushdown,
column pruning and partition pruning all apply — verify with
``df.explain()`` (look for PushedFilters / ReadSchema).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, name: str, sf_dir: str | None = None) -> DataFrame:
    sf_dir = sf_dir or DEFAULT_SF_DIR
    _ensure_nanos_readable(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    return _normalize_nanos_timestamps(df)


def _ensure_nanos_readable(spark: SparkSession) -> None:
    """Some test parquet stores TIMESTAMP(NANOS), which Spark's vectorized
    reader rejects; read them as raw nanos longs instead (converted back to
    timestamps in :func:`_normalize_nanos_timestamps`)."""
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        # timestamps are data, not wall clock; DuckDB oracle is UTC-naive
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        # micros-precision parquet timestamps must read as TIMESTAMP_LTZ
        # (UTC session), not TIMESTAMP_NTZ: NTZ forbids cast-to-long, which
        # the epoch-arithmetic queries (sessionization, as-of, range join)
        # rely on, and LTZ@UTC renders identically to DuckDB's naive micros.
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    except Exception:  # pragma: no cover - static-conf sessions
        pass


def _normalize_nanos_timestamps(df: DataFrame) -> DataFrame:
    """Convert nanos-as-long timestamp columns back to TimestampType.

    With ``nanosAsLong`` the NANOS columns surface as LongType; DuckDB (and
    our semantics) use microsecond timestamps, so integer-divide by 1000 —
    plain column arithmetic, stays in codegen.
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    out = df
    for f in df.schema.fields:
        if f.name in ("ts",) and isinstance(f.dataType, T.LongType):
            out = out.withColumn(f.name, F.timestamp_micros(F.expr(f"{f.name} div 1000")))
        elif isinstance(f.dataType, T.TimestampNTZType):
            # Files annotated isAdjustedToUTC=false surface as NTZ no
            # matter what inferTimestampNTZ says; NTZ forbids the
            # cast-to-long epoch arithmetic the sessionization/as-of
            # queries use (ANSI CANNOT_CAST). The session is pinned to
            # UTC, so NTZ -> LTZ keeps identical wall values.
            out = out.withColumn(f.name, F.col(f.name).cast(T.TimestampType()))
    return out


def load_tables(spark: SparkSession, sf_dir: str | None = None) -> dict[str, DataFrame]:
    return {t: load_table(spark, t, sf_dir) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str | None = None) -> None:
    """Register every synthetic table as a temp view for spark.sql use."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
