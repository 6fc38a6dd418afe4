"""Distributed ESPI file source.

``spark.read.format('binaryFile')`` lists and splits the file set
across executors; the per-file parse runs inside ``mapInPandas`` (Arrow
batches in/out), emitting union-typed rows per PARSED_SCHEMA.  One
parse pass feeds all four normalized tables — the reference parses each
file once too (lib.rs:192-233), but single-threaded.

At 100 TB scale: file listing is driver-side metadata only; parse
parallelism = number of files (fine for many small provider exports —
the expected shape of Green Button data).  Column pruning below the
parse is manual (the parser only emits the §1.1 fields, mirroring the
reference's 9-of-20 ReadingType pruning).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from .parser import parse_espi_feed
from .schemas import PARSED_SCHEMA


def _parse_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    cols = [f.name for f in PARSED_SCHEMA.fields]
    for pdf in batches:
        out: list[dict] = []
        for _, row in pdf.iterrows():
            content = row["content"]
            try:
                text = (
                    content.decode("utf-8")
                    if isinstance(content, (bytes, bytearray))
                    else str(content)
                )
            except UnicodeDecodeError as ex:  # S2: bad encoding is a per-file error
                out.append(
                    {
                        "row_kind": "error",
                        "source_file": row["path"],
                        "error": f"UnicodeDecodeError: {ex}",
                    }
                )
                continue
            out.extend(parse_espi_feed(text, row["path"]))
        yield pd.DataFrame(out, columns=cols) if out else pd.DataFrame(columns=cols)


from ..shipping import ensure_package_shipped as _ensure_package_shipped  # noqa: E402


def read_espi(spark: SparkSession, paths: str | list[str]) -> DataFrame:
    """paths (glob/dir/list) -> union-typed parsed DataFrame."""
    _ensure_package_shipped(spark)
    raw = spark.read.format("binaryFile").load(paths).select("path", "content")
    return raw.mapInPandas(_parse_batches, schema=PARSED_SCHEMA)


def split_tables(parsed: DataFrame) -> dict[str, DataFrame]:
    """Union-typed parse output -> the four normalized tables + errors.

    Each is a filter+project off one cached scan; Catalyst prunes the
    unused union columns per branch.
    """
    from pyspark.sql import functions as F

    from . import schemas as S

    def kind(k: str) -> DataFrame:
        return parsed.filter(F.col("row_kind") == k)

    entries = kind(S.KIND_ENTRY).select(
        "source_file",
        "entry_index",
        "entry_type",
        "href",
        "title",
        "published_unix",
        "updated_unix",
        "related_meter_reading_entry_href",
        "related_reading_type_entry_href",
    )
    interval_readings = kind(S.KIND_INTERVAL_READING).select(
        "source_file",
        "entry_index",
        "cost",
        "quality",
        "value",
        "tou",
        "time_period_start_unix",
        "time_period_duration_seconds",
    )
    reading_types = kind(S.KIND_READING_TYPE).select(
        "source_file",
        "entry_index",
        "accumulation_behaviour",
        "commodity",
        "currency",
        "data_qualifier",
        "flow_direction",
        "kind",
        "power_of_ten_multiplier",
        "phase",
        "uom",
    )
    local_time_parameters = kind(S.KIND_LOCAL_TIME_PARAMETERS).select(
        "source_file", "entry_index",
        "dst_start_rule", "dst_end_rule", "dst_offset", "tz_offset",
    )
    errors = kind(S.KIND_ERROR).select("source_file", "error")
    return {
        "entries": entries,
        "interval_readings": interval_readings,
        "reading_types": reading_types,
        "local_time_parameters": local_time_parameters,
        "errors": errors,
    }
