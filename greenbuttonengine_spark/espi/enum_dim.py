"""ESPI enum dictionary as a broadcast dim table (P10, S7).

The reference compiles the XSD enum values into a static phf map and
decodes per row (gb_type_details.rs:8-31).  Spark-first: the dictionary
is DATA — a 454-row parquet dim (built by tools/build_enum_dim.py from
the public NAESB espi.xsd) broadcast-joined per enum column.  Codes stay
ints through every shuffle; strings appear only in the final projection
— the same "intern until the end" property the reference gets from
&'static str.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ENUM_DIM_PATH = str(Path(__file__).resolve().parent / "data" / "espi_enum_dim.parquet")

MISSING_APP_INFO = "Missing app info"


def load_enum_dim(spark: SparkSession, path: str | None = None) -> DataFrame:
    return spark.read.parquet(path or ENUM_DIM_PATH)


_MAPS_CACHE: dict[tuple[str, str], dict[int, str]] | None = None


def enum_maps() -> dict[tuple[str, str], dict[int, str]]:
    """The dictionary as plain Python maps, loaded once per process via
    pyarrow (no Spark job).  Keyed by (type, field)."""
    global _MAPS_CACHE
    if _MAPS_CACHE is None:
        import pyarrow.parquet as pq

        tbl = pq.read_table(ENUM_DIM_PATH, columns=["type", "field", "value", "app_info"])
        maps: dict[tuple[str, str], dict[int, str]] = {}
        for typ, field, value, app_info in zip(*(tbl.column(c).to_pylist() for c in tbl.column_names)):
            maps.setdefault((typ, field), {})[value] = app_info
        _MAPS_CACHE = maps
    return _MAPS_CACHE


_DECODE_SQL_CACHE: dict[tuple[str, str, str], str] = {}


def _decode_sql(code_col: str, field: str, scope: str) -> str:
    """The literal-map decode as ONE SQL string, cached per process.

    Building the map from ~100 ``F.lit`` Column objects costs ~2 py4j
    round trips per literal (~0.5s per pipeline construction across the
    9 decode columns); a single parsed expression string is one round
    trip total, and the string survives session restarts (Columns are
    tied to a JVM gateway, strings are not)."""
    key = (code_col, field, scope)
    if key not in _DECODE_SQL_CACHE:
        mapping = enum_maps()[(scope, field)]

        def q(s: str) -> str:
            return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"

        entries = ", ".join(
            f"{code}, {q(mapping[code])}" for code in sorted(mapping)
        )
        _DECODE_SQL_CACHE[key] = (
            f"coalesce(map({entries})[`{code_col}`], {q(MISSING_APP_INFO)})"
        )
    return _DECODE_SQL_CACHE[key]


def decode_enum_expr(code_col: str, field: str, scope: str = "ReadingType"):
    """Enum decode as a literal MAP lookup — the Spark analog of the
    reference's compile-time phf map (gb_type_details.rs:8-31).

    Strictly cheaper than the broadcast-join form at any scale: no
    exchange, no extra stage, evaluates inside whole-stage codegen.
    Unknown / NULL codes -> 'Missing app info' (gb_type_details.rs:24-29).
    """
    return F.expr(_decode_sql(code_col, field, scope))


def decode_enum(
    df: DataFrame,
    dim: DataFrame,
    code_col: str,
    out_col: str,
    field: str,
    scope: str = "ReadingType",
) -> DataFrame:
    """Decode an int enum-code column to its app_info string via a
    broadcast join; unknown codes -> 'Missing app info'
    (gb_type_details.rs:24-29)."""
    sub = dim.filter((F.col("type") == scope) & (F.col("field") == field)).select(
        F.col("value").alias("__enum_code"), F.col("app_info").alias("__enum_str")
    )
    joined = df.join(F.broadcast(sub), df[code_col] == F.col("__enum_code"), "left")
    return (
        joined.withColumn(out_col, F.coalesce(F.col("__enum_str"), F.lit(MISSING_APP_INFO)))
        .drop("__enum_code", "__enum_str")
    )
