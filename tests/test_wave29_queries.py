"""Round-13 wave 29: the streaming_matview_merge oracle row must be
(a) the production merge function, not a re-implementation, and
(b) pinned against the REAL stream path — the same events split driven
through start_matview_stream's foreachBatch into the copy-on-write
store must yield the identical per-user totals."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

pytestmark = pytest.mark.usefixtures("spark")

SF = "/root/testdata/sf0.001"


def _queries():
    import __spark_entry__

    __spark_entry__._registry()

    from greenbuttonengine_spark.plans.registry import QUERIES

    return QUERIES


def _totals(rows):
    return {
        r.user_id: (r.n_events, r.total_cents, r.max_cents, r.min_cents)
        for r in rows
    }


def test_merge_of_partials_equals_full_recompute(spark):
    """The decomposable-aggregate identity the row gates:
    merge(partial(state), partial(delta)) == aggregate(all events)."""
    from greenbuttonengine_spark.plans.wave29_queries import mv_merge_aggs
    from greenbuttonengine_spark.sources.catalog import load_table

    got = _totals(_queries()["streaming_matview_merge"].fn(spark, SF).collect())
    ev = load_table(spark, "events", SF)
    want = _totals(ev.groupBy("user_id").agg(*mv_merge_aggs()).collect())
    assert got == want
    # the split is non-degenerate: both sides contribute rows
    assert ev.filter(F.col("event_id") % 3 == 0).count() > 0
    assert ev.filter(F.col("event_id") % 3 != 0).count() > 0


def test_gated_merge_matches_deployed_stream(spark, tmp_path):
    """Drive the SAME state/batch split through start_matview_stream
    (two availableNow cycles on one checkpoint -> two foreachBatch
    epochs through cow_apply_batch) and pin the maintained store
    against the declared query's output."""
    from greenbuttonengine_spark.plans.wave29_queries import (
        _MV_SCHEMA,
        mv_merge_aggs,
    )
    from greenbuttonengine_spark.sources.catalog import load_table
    from greenbuttonengine_spark.streaming.matview import (
        read_view,
        start_matview_stream,
    )

    ev = load_table(spark, "events", SF).select("user_id", "event_id", "value")
    d = str(tmp_path / "view")
    cp = str(tmp_path / "cp")
    drop = tmp_path / "drop"
    drop.mkdir()

    def run():
        stream = (
            spark.readStream.schema(ev.schema)
            .option("recursiveFileLookup", "true")
            .parquet(str(drop))
        )
        q = start_matview_stream(
            spark, stream, d, cp, _MV_SCHEMA, ["user_id"], mv_merge_aggs(),
            n_buckets=16, minmax_cols={"max_cents": "max", "min_cents": "min"},
            available_now=True,
        )
        q.awaitTermination(120)

    # batch 1 = the declared query's stored-state split, batch 2 = its delta
    ev.filter(F.col("event_id") % 3 == 0).coalesce(1).write.parquet(str(drop / "a"))
    run()
    ev.filter(F.col("event_id") % 3 != 0).coalesce(1).write.parquet(str(drop / "b"))
    run()

    stream_totals = _totals(read_view(spark, d, _MV_SCHEMA).collect())
    declared = _totals(_queries()["streaming_matview_merge"].fn(spark, SF).collect())
    assert stream_totals == declared


def test_agg_merge_rejects_misdeclared_minmax_cols(spark):
    """A typo'd minmax_cols key would silently SUM a column meant to
    min/max-merge — the merge must refuse instead."""
    import pytest

    from greenbuttonengine_spark.plans.wave29_queries import _MV_SCHEMA
    from greenbuttonengine_spark.streaming.matview import agg_merge_deltas

    empty = spark.createDataFrame([], _MV_SCHEMA).withColumn(
        "__bucket", F.lit(0)
    )
    with pytest.raises(ValueError, match="not in the view's value columns"):
        agg_merge_deltas(empty, empty, _MV_SCHEMA, ["user_id"],
                         minmax_cols={"max_centz": "max"})
    with pytest.raises(ValueError, match="must be 'min' or 'max'"):
        agg_merge_deltas(empty, empty, _MV_SCHEMA, ["user_id"],
                         minmax_cols={"max_cents": "greatest"})
