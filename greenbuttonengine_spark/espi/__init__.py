"""The Green Button / ESPI pipeline: XML Atom feeds -> normalized tables
-> denormalized TimeSeries -> {csv, parquet, influx} sinks.

Spark-first layout (contrast with the reference's single-pass Rust loop,
lib/personalgreenbutton/src/lib.rs:32-233):

    parser    pure-Python per-file XML parse (runs inside mapInPandas)
    schemas   fixed StructTypes for the parse output + TimeSeries
    source    distributed file scan -> union-typed parse-output DataFrame
    enum_dim  XSD enum dictionary as a broadcast dim table
    dst       DST/tz rule evaluation as native Catalyst expressions
    pipeline  denormalize_and_link as declarative joins + projections
"""

from .pipeline import (
    denormalize_and_link,
    denormalize_with_errors,
    espi_ingest,
    timeseries_from_files,
)

__all__ = [
    "denormalize_and_link",
    "denormalize_with_errors",
    "espi_ingest",
    "timeseries_from_files",
]
