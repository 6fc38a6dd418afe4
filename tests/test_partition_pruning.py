"""Partitioned-layout pruning: the SCALING.md claim that a date/source
partitioned layout gives partition pruning for free, asserted on the
physical plan and on the files actually read.

Companion to test_bucketing.py (which proves the shuffle-free join
side of the layout story); together they demonstrate the two layout
levers a 100 TB deployment uses: partitioning for scan pruning,
bucketing for join co-location.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_date_partitioned_scan_prunes(spark, tmp_path):
    ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    out = str(tmp_path / "events_by_day")
    ev.withColumn("day", F.to_date("ts")).write.mode("overwrite").partitionBy(
        "day"
    ).parquet(out)

    n_days = ev.select(F.to_date("ts").alias("d")).distinct().count()
    part = spark.read.parquet(out)

    one_day = part.filter(F.col("day") == "2024-01-05")
    plan = one_day._jdf.queryExecution().executedPlan().toString()
    # the filter must reach the scan as a partition filter, not a data filter
    assert "PartitionFilters: [" in plan
    assert "isnotnull(day" in plan or "(day" in plan.split("PartitionFilters")[1][:200]

    # physical proof: the pruned scan reads ~1/n_days of the files
    files_all = part.select(F.input_file_name()).distinct().count()
    files_one = one_day.select(F.input_file_name()).distinct().count()
    assert files_one * (n_days - 1) < files_all, (files_one, files_all, n_days)

    # and the day column equality still computes correct rows
    expect = ev.filter(F.to_date("ts") == "2024-01-05").count()
    assert one_day.count() == expect


def test_partition_values_roundtrip(spark, tmp_path):
    """Partition-column values survive the directory encoding (the
    write path moves `day` out of the file into the path)."""
    ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet").limit(500)
    out = str(tmp_path / "ev")
    ev.withColumn("day", F.to_date("ts")).write.mode("overwrite").partitionBy(
        "day"
    ).parquet(out)
    back = spark.read.parquet(out)
    orig = {(r.event_id, str(r.day)) for r in ev.withColumn("day", F.to_date("ts")).select("event_id", "day").collect()}
    got = {(r.event_id, str(r.day)) for r in back.select("event_id", "day").collect()}
    assert orig == got
