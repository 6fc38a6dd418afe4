"""Corpus audit reports: the summary tables a 100 TB training-data
pipeline publishes after every build (length distributions, per-source
duplication/quality, mix shares).

All pure Catalyst aggregations — each report is one hash-aggregate
shuffle over O(strata) output rows, so cost is one scan of the corpus
regardless of scale.  Ratios are computed as exact integer quotients
(single fp division at the end) so the DuckDB oracle hash-matches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def length_histogram(
    docs: DataFrame, len_col: str = "n_chars"
) -> DataFrame:
    """Power-of-two length histogram: bucket k holds docs with length
    in [2^k, 2^(k+1)); zero-length docs land in bucket -1.

    The standard corpus-shape audit (tokenizer budgeting, truncation
    policy, chunk sizing all read off this table).  floor(log2(n)) is
    exact for BIGINT inputs in both engines.
    """
    from pyspark.sql.window import Window

    n = F.col(len_col).cast("bigint")
    # bit-length - 1, NOT floor(log2(double)): Math.log(x)/Math.log(2)
    # rounds unpredictably exactly at the power-of-two bucket
    # boundaries, and the whole point of the bucket id is that both
    # engines agree on it bit-for-bit.
    bucket = F.when(n <= 0, F.lit(-1)).otherwise(
        F.length(F.bin(n)) - F.lit(1)
    )
    # share denominator via an unpartitioned window over the AGGREGATED
    # result — O(buckets) rows, not the corpus — so the corpus is
    # scanned exactly once (a .count() pre-pass would scan it twice).
    total = F.sum("n_docs").over(Window.partitionBy())
    return (
        docs.groupBy(bucket.cast("bigint").alias("len_bucket"))
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(n).alias("total_chars"),
            F.min(n).alias("min_len"),
            F.max(n).alias("max_len"),
        )
        .withColumn("share", F.col("n_docs") / total)
        .select(
            "len_bucket",
            F.col("n_docs").cast("bigint"),
            F.col("total_chars").cast("bigint"),
            F.col("min_len").cast("bigint"),
            F.col("max_len").cast("bigint"),
            "share",
        )
    )


def source_report(
    docs: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    len_col: str = "n_chars",
) -> DataFrame:
    """Per-source corpus health: volume, exact-duplicate rate, and
    length stats — the table that decides per-source sampling weights.

    dup_rate = 1 - distinct_fingerprints/n_docs, with the same
    normalization fingerprint as the exact-dedup pass (md5 of
    whitespace-collapsed lowercase), so the report and the dedup stage
    agree on what "duplicate" means.  COUNT(DISTINCT) over the md5
    is a two-stage partial-distinct aggregate in Spark — one shuffle
    keyed by source, no global collect.
    """
    from .textstats import fingerprint_col

    fp = fingerprint_col(F.col(text_col))
    n = F.col(len_col).cast("bigint")
    return (
        docs.groupBy(F.col(source_col).alias("source"))
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct(fp).alias("n_distinct"),
            F.sum(n).alias("total_chars"),
            F.min(n).alias("min_len"),
            F.max(n).alias("max_len"),
        )
        .select(
            "source",
            F.col("n_docs").cast("bigint"),
            F.col("n_distinct").cast("bigint"),
            (F.lit(1.0) - F.col("n_distinct") / F.col("n_docs")).alias("dup_rate"),
            F.col("total_chars").cast("bigint"),
            F.col("min_len").cast("bigint"),
            F.col("max_len").cast("bigint"),
        )
    )
