"""JSONL corpus source/sink: the lingua franca of LLM training-data
interchange (one JSON document per line).

Mirrors the ESPI ingest's error posture (reference:
lib/personalgreenbutton/src/lib.rs per-file tolerance) at line
granularity: a corrupt line never fails the job — it is routed to an
errors DataFrame with the raw line preserved, and the good rows flow
on.  At 100 TB this is non-negotiable: a crawl drop WILL contain
truncated/garbled lines, and a pipeline that dies on line 40 billion
is not a pipeline.

Scale shape:

* JSONL is line-splittable — Spark assigns file ranges to tasks with
  no coordination, so read parallelism is free (unlike multi-line
  JSON, which must be parsed whole-file).
* The schema is REQUIRED, never inferred: schema inference is a full
  extra pass over the data before the real one.
* PERMISSIVE mode + ``columnNameOfCorruptRecord`` keeps parsing in
  the JVM's Jackson path (whole-stage codegen downstream) — no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# documents-table schema (TESTDATA.md): the interchange contract
DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

_CORRUPT = "_corrupt_record"


def _split_lines(lines: DataFrame, schema: T.StructType) -> tuple[DataFrame, DataFrame]:
    """Shared batch/streaming parse: raw text lines -> (good, errors).

    Blank/whitespace-only lines are DROPPED (the JSONL convention:
    they are separators, not records) — without the filter they would
    surface as phantom all-NULL good rows, because from_json returns a
    null-fields struct with a NULL corrupt-record for empty input.
    Non-object JSON scalars (``null``, ``123``) parse to a NULL struct
    and are routed to errors.
    """
    full = T.StructType(schema.fields + [T.StructField(_CORRUPT, T.StringType())])
    parsed = lines.filter(F.trim(F.col("value")) != "").select(
        F.col("value"),
        F.from_json(
            "value", full, {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": _CORRUPT}
        ).alias("__j"),
    )
    bad = F.col("__j").isNull() | F.col(f"__j.{_CORRUPT}").isNotNull()
    good = parsed.filter(~bad).select(
        *[F.col(f"__j.{f.name}").alias(f.name) for f in schema.fields]
    )
    errors = parsed.filter(bad).select(F.col("value").alias("raw_line"))
    return good, errors


def write_jsonl(df: DataFrame, path: str, compression: str | None = None) -> None:
    """One JSON object per line; optionally compressed per file.
    Partition count = file count — callers coalesce/repartition to set
    output file sizes (aim ~128-512 MB per file at scale).

    Compression choice matters at scale: gzip files are NOT splittable
    (one task per file on read — size files accordingly), so prefer
    uncompressed or a splittable/indexed codec when read parallelism
    within a file matters."""
    w = df.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.json(path)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType = DOCUMENTS_SCHEMA,
) -> tuple[DataFrame, DataFrame]:
    """Tolerant JSONL read -> (good, errors).

    good: rows matching ``schema``.  errors: (raw_line,) for every
    line Jackson could not parse into the schema.  Counting either
    side triggers its own scan; neither blocks the other.
    """
    # read.text + from_json rather than read.json: Spark forbids plans
    # that reference ONLY the internal corrupt-record column of a JSON
    # scan (the errors channel is exactly that plan), and this form
    # keeps one scan feeding both channels with no special cases.
    # Parsing still runs in the JVM's Jackson path.
    return _split_lines(spark.read.text(path), schema)


def stream_jsonl(
    spark: SparkSession,
    drop_dir: str,
    schema: T.StructType = DOCUMENTS_SCHEMA,
    max_files_per_trigger: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Streaming variant of :func:`read_jsonl`: watch ``drop_dir`` for
    new JSONL shards, emit (good, errors) STREAMING DataFrames with the
    same per-line tolerance contract as batch.

    The continuous-crawl ingest topology: each crawl drop lands as
    files; good rows flow to a bronze append sink, error lines to a
    quarantine sink, and every downstream batch operator (dedup,
    quality, decontam) reads bronze on demand.  ``maxFilesPerTrigger``
    bounds per-micro-batch work so one giant drop cannot stall the
    stream.  Same scan shape as batch (text source + JVM from_json):
    identical lines produce identical rows in both modes.
    """
    reader = spark.readStream.format("text").schema("value string")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return _split_lines(reader.load(drop_dir), schema)
