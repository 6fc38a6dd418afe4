"""Fixed schemas for the ESPI pipeline (SURVEY §1.1-1.2).

The parse stage emits ONE union-typed DataFrame (``PARSED_SCHEMA``) with
a ``row_kind`` discriminator instead of four separate passes — one parse
of each file populates all four normalized tables, and Catalyst prunes
irrelevant columns per branch downstream.  Reference tables:
entries (entry.rs:16-31), interval_readings (interval_reading.rs:11-25),
reading_types (reading_type.rs:9-22), local_time_parameters
(local_time_parameters.rs:15-22).
"""

from __future__ import annotations

KIND_ENTRY = "entry"
KIND_INTERVAL_READING = "interval_reading"
KIND_READING_TYPE = "reading_type"
KIND_LOCAL_TIME_PARAMETERS = "local_time_parameters"
KIND_ERROR = "error"


def __getattr__(name: str):
    # PARSED_SCHEMA is built lazily so importing this module (and the
    # pure-Python parser that needs only the KIND_* constants) never
    # pulls pyspark — the CLI fast path (fastpath.py) converts a
    # single small file in <200 ms, which a JVM-gateway import would
    # dwarf on its own.
    if name == "PARSED_SCHEMA":
        schema = _build_parsed_schema()
        globals()[name] = schema
        return schema
    raise AttributeError(name)


def _build_parsed_schema():
    from pyspark.sql import types as T

    return T.StructType(
    [
        T.StructField("source_file", T.StringType(), False),
        T.StructField("row_kind", T.StringType(), False),
        T.StructField("entry_index", T.LongType(), True),
        # entries
        T.StructField("entry_type", T.StringType(), True),
        T.StructField("href", T.StringType(), True),
        T.StructField("title", T.StringType(), True),
        T.StructField("published_unix", T.LongType(), True),
        T.StructField("updated_unix", T.LongType(), True),
        T.StructField("related_meter_reading_entry_href", T.StringType(), True),
        T.StructField("related_reading_type_entry_href", T.StringType(), True),
        # interval_readings
        T.StructField("cost", T.FloatType(), True),
        T.StructField("quality", T.IntegerType(), True),
        T.StructField("value", T.LongType(), True),
        T.StructField("tou", T.IntegerType(), True),
        T.StructField("time_period_start_unix", T.LongType(), True),
        T.StructField("time_period_duration_seconds", T.IntegerType(), True),
        # reading_types (enum codes)
        T.StructField("accumulation_behaviour", T.IntegerType(), True),
        T.StructField("commodity", T.IntegerType(), True),
        T.StructField("currency", T.IntegerType(), True),
        T.StructField("data_qualifier", T.IntegerType(), True),
        T.StructField("flow_direction", T.IntegerType(), True),
        T.StructField("kind", T.IntegerType(), True),
        T.StructField("power_of_ten_multiplier", T.IntegerType(), True),
        T.StructField("phase", T.IntegerType(), True),
        T.StructField("uom", T.IntegerType(), True),
        # local_time_parameters (u32 rules in a long)
        T.StructField("dst_start_rule", T.LongType(), True),
        T.StructField("dst_end_rule", T.LongType(), True),
        T.StructField("dst_offset", T.LongType(), True),
        T.StructField("tz_offset", T.LongType(), True),
        # error channel (S2: per-file error tolerance)
        T.StructField("error", T.StringType(), True),
    ]
)

# Output TimeSeries (timeseries.rs:20-58); epoch seconds kept as long —
# sinks convert units (ms for parquet, ns for influx).
TIMESERIES_COLUMNS = [
    "title",
    "cost",
    "quality",
    "value",
    "tou",
    "time_period_start_unix",
    "time_period_duration_seconds",
    "accumulation_behaviour",
    "commodity",
    "currency",
    "data_qualifier",
    "flow_direction",
    "kind",
    "phase",
    "uom",
]
