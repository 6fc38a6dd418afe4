"""Round-12 wave: the two streaming batch-parity queries must agree
with the actual production streaming machinery, not just the oracle."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

pytestmark = pytest.mark.usefixtures("spark")


@pytest.fixture(scope="module")
def sf_dir() -> str:
    return "/root/testdata/sf0.001"


def _queries():
    import __spark_entry__

    __spark_entry__._registry()  # populates the registry

    from greenbuttonengine_spark.plans.registry import QUERIES

    return QUERIES


def test_admission_parity_decision_paths(spark, tmp_path):
    """admission_decision (the production per-batch function) must
    admit exactly: first-of-fingerprint batch rows not in the store,
    and only the accepted text of an ambiguous doc_id."""
    from greenbuttonengine_spark.streaming.admission import admission_decision

    batch = spark.createDataFrame(
        [
            Row(doc_id=1, text="alpha text", lang="en", source="s", n_chars=10),
            Row(doc_id=2, text="ALPHA   TEXT", lang="en", source="s", n_chars=12),
            Row(doc_id=3, text="known doc", lang="en", source="s", n_chars=9),
            Row(doc_id=4, text="fresh doc", lang="en", source="s", n_chars=9),
        ]
    )
    from greenbuttonengine_spark.extensions.textstats import fingerprint_col

    store = (
        spark.createDataFrame([Row(text="known  DOC")])
        .select(fingerprint_col(F.col("text")).alias("fingerprint"))
    )
    ids, accepted = admission_decision(batch, store)
    assert {r.doc_id for r in ids.collect()} == {1, 4}
    got = {r.doc_id: r.text for r in accepted.collect()}
    assert got == {1: "alpha text", 4: "fresh doc"}


def test_admission_parity_query_matches_verdicts(spark, sf_dir):
    """The gated query's admitted rows == documents whose
    dedup_incremental verdict is 'accept' (same batch/store split)."""
    QUERIES = _queries()
    rows = QUERIES["streaming_admission_parity"].fn(spark, sf_dir).collect()
    verdicts = QUERIES["dedup_incremental"].fn(spark, sf_dir).collect()
    accepted_ids = {r.doc_id for r in verdicts if r.verdict == "accept"}
    assert {r.doc_id for r in rows} == accepted_ids
    # full document rows ride along, not just ids
    assert rows and all(
        r.text is not None and r.n_chars is not None for r in rows
    )


def test_silver_upsert_matches_real_cow_store(spark, sf_dir, tmp_path):
    """Gold-standard parity: replay the SAME batch/state split through
    the actual copy-on-write bucket store (apply_cdc_batch epoch 1 then
    epoch 2) and require read_current == the gated plan's live rows."""
    from pyspark.sql.types import (
        DoubleType, LongType, StringType, StructField, StructType,
    )

    from greenbuttonengine_spark.sources.catalog import load_table
    from greenbuttonengine_spark.streaming.silver import (
        apply_cdc_batch, read_current,
    )

    QUERIES = _queries()
    schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("event_id", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
        ]
    )
    table = str(tmp_path / "silver")
    ev = load_table(spark, "events", sf_dir).select(
        "user_id", "event_id", "event_type", "value"
    )
    op = F.when(F.col("event_type") == "error", F.lit("d")).otherwise(
        F.lit("u")
    )
    # epoch 1: the stored-state rows; epoch 2: the micro-batch — the
    # same split streaming_silver_upsert declares
    apply_cdc_batch(
        ev.filter(F.col("event_id") % 3 == 0).withColumn("op", op),
        table, schema, ["user_id"], "event_id", epoch_id=1, op_col="op",
    )
    apply_cdc_batch(
        ev.filter(F.col("event_id") % 3 != 0).withColumn("op", op),
        table, schema, ["user_id"], "event_id", epoch_id=2, op_col="op",
    )
    stored = {
        (r.user_id, r.event_id, r.event_type, r.value)
        for r in read_current(spark, table, schema).collect()
    }
    plan = QUERIES["streaming_silver_upsert"].fn(spark, sf_dir).collect()
    live = {
        (r.user_id, r.event_id, r.event_type, r.value)
        for r in plan
        if not r.deleted
    }
    assert stored == live
    # tombstone metadata: every deleted winner carries its epoch
    for r in plan:
        if r.deleted:
            assert r.del_epoch in (1, 2)
        # one winner per key
    assert len({r.user_id for r in plan}) == len(plan)
