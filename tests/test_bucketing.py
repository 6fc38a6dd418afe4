"""Bucketed-table co-located join: writing both fact tables bucketed on
the join key lets repeated joins run WITHOUT a shuffle — the SCALING.md
claim, asserted on the physical plan."""

from __future__ import annotations

import pytest


@pytest.mark.slow
def test_bucketed_join_avoids_shuffle(spark, tmp_path, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")

    spark.sql(f"CREATE DATABASE IF NOT EXISTS buckdb LOCATION '{tmp_path / 'wh'}'")
    try:
        (
            li.write.mode("overwrite")
            .bucketBy(8, "l_orderkey")
            .sortBy("l_orderkey")
            .saveAsTable("buckdb.li_bucketed")
        )
        (
            o.write.mode("overwrite")
            .bucketBy(8, "o_orderkey")
            .sortBy("o_orderkey")
            .saveAsTable("buckdb.o_bucketed")
        )
        lb = spark.table("buckdb.li_bucketed")
        ob = spark.table("buckdb.o_bucketed")
        # disable auto-broadcast so the join would otherwise shuffle both sides
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = lb.join(ob, lb["l_orderkey"] == ob["o_orderkey"])
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan[:2000]}"
        assert joined.count() == li.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS buckdb.li_bucketed")
        spark.sql("DROP TABLE IF EXISTS buckdb.o_bucketed")
        spark.sql("DROP DATABASE IF EXISTS buckdb")
