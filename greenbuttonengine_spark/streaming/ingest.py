"""Incremental / streaming ESPI ingest (SURVEY §2.7).

The reference's closest behavior is the WASM session: ``ingest_xml``
appends each dropped file into an accumulated TimeSeries and readers
re-sort the whole (lib/wasm/src/lib.rs:6,15-42).  Structured-Streaming
analog:

* file-source stream over a drop directory (text, wholetext — one row
  per file, exactly the batch parse input shape)
* the SAME parse stage (parser.parse_espi_feed) inside foreachBatch
* accumulation = append-mode parquet of the union-typed parse output
  ("bronze"); ``read_accumulated_timeseries`` runs the batch
  denormalize over bronze on demand — re-sorting the accumulated whole,
  exactly the WASM contract.

No watermarks/event-time windows: ESPI timestamps are DATA, not stream
time (the reference has no late-data semantics to mirror).  The bronze
store is TRANSACTIONAL (streaming.bronze): per-epoch directories +
atomic commit markers give exactly-once across crash/replay — a
replayed epoch overwrites its own directory and re-publishes the same
marker, so readers never see duplicates or partial writes.

At scale this is the continuous-ingest topology: bronze is partitioned
by ingest date; the denormalize query prunes to new partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..espi import denormalize_and_link
from ..espi.enum_dim import load_enum_dim
from ..espi.parser import parse_espi_feed
from ..espi.schemas import PARSED_SCHEMA
from ..espi.source import split_tables
from .bronze import commit_epoch, read_bronze


def start_ingest_stream(
    spark: SparkSession,
    drop_dir: str,
    bronze_dir: str,
    checkpoint_dir: str,
) -> StreamingQuery:
    """Watch ``drop_dir`` for new XML files; append parsed rows to the
    bronze store with exactly-once checkpointing."""
    from ..espi.source import _ensure_package_shipped

    _ensure_package_shipped(spark)

    files = (
        spark.readStream.format("text")
        .option("wholetext", "true")
        .load(drop_dir)
        .select(F.input_file_name().alias("path"), F.col("value").alias("content"))
    )

    def _parse_batch(batch: DataFrame, epoch_id: int) -> None:
        import pandas as pd

        def gen(it):
            cols = [f.name for f in PARSED_SCHEMA.fields]
            for pdf in it:
                rows = []
                for _, r in pdf.iterrows():
                    rows.extend(parse_espi_feed(str(r["content"]), r["path"]))
                yield pd.DataFrame(rows, columns=cols) if rows else pd.DataFrame(columns=cols)

        parsed = batch.mapInPandas(gen, schema=PARSED_SCHEMA)
        commit_epoch(parsed, bronze_dir, epoch_id)

    return (
        files.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(_parse_batch)
        .start()
    )


def read_accumulated_timeseries(
    spark: SparkSession, bronze_dir: str, include_source_file: bool = False
) -> DataFrame:
    """Denormalize everything ingested so far, sorted (title, time) —
    the WASM ``get_timeseries_chunked`` contract over the accumulated
    whole."""
    parsed = read_bronze(spark, bronze_dir, PARSED_SCHEMA)
    tables = split_tables(parsed)
    ts = denormalize_and_link(tables, load_enum_dim(spark), include_source_file)
    return ts.orderBy("title", "time_period_start_unix")
