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


@pytest.mark.slow
def test_band_store_bucketed_probe_leaves_store_unshuffled(spark, tmp_path, sf_dir):
    """The SCALING.md admission claim, asserted on the plan: with the
    persistent LSH band store bucketed by band_hash, the per-batch
    probe join shuffles ONLY the (micro-batch-sized) probe side — the
    store is read in place."""
    from greenbuttonengine_spark.extensions.dedup import (
        band_buckets, minhash_signatures)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    corpus = docs.filter("doc_id % 5 != 4")
    batch = docs.filter("doc_id % 5 = 4")

    spark.sql(f"CREATE DATABASE IF NOT EXISTS banddb LOCATION '{tmp_path / 'wh'}'")
    try:
        (band_buckets(minhash_signatures(corpus))
         .write.mode("overwrite")
         .bucketBy(8, "band_idx", "band_hash")
         .sortBy("band_idx", "band_hash")
         .saveAsTable("banddb.band_store"))
        store = spark.table("banddb.band_store")
        # materialize the probe side so its own signature-build
        # exchanges (batch-side prep, inherent) drop out of the join
        # plan, isolating the claim under test: the JOIN adds one
        # probe-side Exchange and none on the store
        probe_side = band_buckets(minhash_signatures(batch)).localCheckpoint()
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        probe = probe_side.join(store.withColumnRenamed("doc_id", "matched_id"),
                                ["band_idx", "band_hash"])
        plan = probe._jdf.queryExecution().executedPlan().toString()
        n_exchanges = plan.count("Exchange")
        assert n_exchanges == 1, f"store side shuffled:\n{plan[:2500]}"
        assert probe.count() > 0  # planted near-dups collide
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS banddb.band_store")
        spark.sql("DROP DATABASE IF EXISTS banddb")
