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
an order-insensitive aggregate (XOR of per-row xxhash64) so it is
stable under Spark's nondeterministic intra-file row order.
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
) -> int:
    """Write ``df`` as ~``rows_per_shard``-row shards; returns the
    shard count.  Round-robin repartition gives every shard within one
    row of the mean — no skew no matter how the upstream was keyed."""
    total = df.count()
    n_shards = max(1, math.ceil(total / rows_per_shard))
    writer = df.repartition(n_shards).write.mode("overwrite")
    if fmt == "jsonl":
        writer.json(path)
    else:
        writer.format(fmt).save(path)
    return n_shards


def shard_manifest(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    """Manifest over the WRITTEN shard files: (shard_file, n_rows,
    content_hash).  content_hash = XOR of per-row xxhash64 over every
    column — order-insensitive (two readers that split the shard
    differently still agree) and overflow-free (a SUM of longs would
    trip ANSI-mode overflow)."""
    reader = spark.read
    df = reader.json(path) if fmt == "jsonl" else reader.format(fmt).load(path)
    row_hash = F.xxhash64(*[F.col(c) for c in sorted(df.columns)])
    return (
        df.withColumn("shard_file", F.element_at(F.split(F.input_file_name(), "/"), -1))
        .withColumn("__rh", row_hash)
        .groupBy("shard_file")
        .agg(
            F.count("*").alias("n_rows"),
            F.expr("bit_xor(__rh)").alias("content_hash"),
        )
    )
