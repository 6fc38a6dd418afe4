"""Round-11 additions: batch-parity oracle row for the streaming
interval join, trained-PQ residual encoding, CLI fast path."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_attribution_interval_join_replays_static_join(spark, sf_dir):
    """The declared batch form (which calls the PRODUCTION streaming
    function on batch frames) equals an independently-built static
    time-range join, row for row, with exact delay accounting."""
    from greenbuttonengine_spark.plans.wave20_queries import (
        attribution_interval_join)
    from greenbuttonengine_spark.sources.catalog import load_table

    got = {
        (r.key, r.l_id, r.r_id, r.delay_sec)
        for r in attribution_interval_join(spark, sf_dir).collect()
    }

    ev = load_table(spark, "events", sf_dir)
    imps = ev.filter(F.col("event_type") == "view").selectExpr(
        "user_id k", "event_id i_id", "ts i_ts")
    convs = ev.filter(F.col("event_type") == "purchase").selectExpr(
        "user_id ck", "event_id c_id", "ts c_ts")
    want = {
        (r.k, r.i_id, r.c_id,
         (r.c_ts - r.i_ts).total_seconds())
        for r in imps.join(
            convs,
            (imps.k == convs.ck)
            & (convs.c_ts >= imps.i_ts)
            & (convs.c_ts <= F.expr("i_ts + INTERVAL 60 minutes")),
        ).collect()
    }
    assert want, "corpus has no view->purchase pairs within the window"
    assert got == want
    assert all(0 <= d <= 3600 for *_, d in got)
