"""Training-corpus shard writer: the delivery end of the data build.

Trainers consume fixed-size shards with a manifest (shard -> row count
+ content hash) so a run can verify integrity, resume mid-epoch, and
assign shards to data-loader workers.  This sink produces exactly
that: N even shards (parquet or JSONL) plus a manifest DataFrame
computed FROM THE WRITTEN FILES — the manifest certifies what landed
on disk, not what the plan intended.

Scale shape: one count() to size the shard grid (a columnar count —
cheap), one round-robin repartition (the only shuffle; gives size-
uniform shards regardless of upstream skew), one write.  The manifest
pass reads the written shards grouped by file — a scan of what was
written, parallel per shard, with the per-shard row hash computed as
an order-insensitive aggregate (exact DECIMAL sum of per-row JSON
xxhash64) so it is stable under Spark's nondeterministic intra-file
row order.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_corpus_shards(
    df: DataFrame,
    path: str,
    rows_per_shard: int = 100_000,
    fmt: str = "parquet",
    n_shards: int | None = None,
) -> int:
    """Write ``df`` as ~``rows_per_shard``-row shards; returns the
    shard count.  Round-robin repartition gives every shard within one
    row of the mean — no skew no matter how the upstream was keyed.

    The shard grid needs a row count, which executes ``df`` once
    before the write executes it again — for an expensive upstream
    (e.g. a full dedup cascade) either persist/localCheckpoint the
    DataFrame first or pass ``n_shards`` explicitly to skip the
    counting pass."""
    if n_shards is None:
        total = df.count()
        n_shards = math.ceil(total / rows_per_shard)
    n_shards = max(1, n_shards)
    writer = df.repartition(n_shards).write.mode("overwrite")
    if fmt == "jsonl":
        writer.json(path)
    else:
        writer.format(fmt).save(path)
    return n_shards


def shard_manifest(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema=None,
) -> DataFrame:
    """Manifest over the WRITTEN shard files: (shard_file, n_rows,
    content_hash).

    content_hash = DECIMAL(38,0) sum of per-row xxhash64 over the
    row's JSON encoding.  Three deliberate choices:

    * the hash input is ``to_json(struct(cols))``, not the bare
      columns — xxhash64 SKIPS null arguments, so hashing columns
      directly cannot tell (NULL, 'a') from ('a', NULL); the JSON
      encoding is null-discriminating and column-labeled.
    * SUM in DECIMAL (exact, order-insensitive, cannot hit ANSI long
      overflow), not XOR — XOR cancels even-multiplicity rows, so a
      shard with one row duplicated twice and another dropped twice
      would "certify" as intact.
    * for jsonl the writer's ``schema`` is REQUIRED — an inferred
      schema is an extra full pass and can type-drift per directory,
      breaking cross-layout hash equality.
    """
    if fmt == "jsonl":
        if schema is None:
            raise ValueError("jsonl manifest requires the writer's schema")
        df = spark.read.schema(schema).json(path)
    else:
        df = spark.read.format(fmt).load(path)
    row_hash = F.xxhash64(F.to_json(F.struct(*[F.col(c) for c in sorted(df.columns)])))
    return (
        df.withColumn("shard_file", F.element_at(F.split(F.input_file_name(), "/"), -1))
        .withColumn("__rh", row_hash.cast("decimal(38,0)"))
        .groupBy("shard_file")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum("__rh").alias("content_hash"),
        )
    )
