"""Round-11 wave: a driver-visible oracle row for the STREAMING
interval-join shape (VERDICT r10 item 3).

``streaming/joins.py interval_join_streams`` is pytest-pinned
stream == batch (the inner join's row set is identical to the static
join across micro-batch boundaries), but the whole streaming surface
had no driver-visible correctness row because DuckDB cannot run a
stream.  The inner join's ROW SET is batch-expressible, so this wave
declares the static form as an oracle query that calls the EXACT
production function (``withWatermark`` is a no-op on batch frames, so
the full select -> watermark -> time-range join -> project plan is the
code under gate), following ``pit_interval_join`` (wave7) which did the
same for the validity-window family.

Scale shape: equi-join on ``user_id`` with a time-range residual —
co-partitioned sort-merge/shuffled-hash on the key, residual filter
evaluated per key group (never a nested-loop range join).  The
streaming twin bounds both sides' state by watermark + max_delay; this
batch twin is the backfill/repair path a production attribution
pipeline runs over historical partitions with the same semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.catalog import load_table
from ..streaming.joins import attribute_conversions_stream
from .registry import register


@register(
    "attribution_interval_join",
    """
    SELECT l.user_id AS key,
           l.event_id AS l_id, l.ts AS l_ts,
           r.event_id AS r_id, r.ts AS r_ts,
           (epoch_us(r.ts) - epoch_us(l.ts)) / 1000000.0 AS delay_sec
    FROM events l
    JOIN events r
      ON r.user_id = l.user_id
     AND r.ts >= l.ts
     AND r.ts <= l.ts + INTERVAL 60 MINUTE
    WHERE l.event_type = 'view' AND r.event_type = 'purchase'
    """,
    tags=("events", "join", "temporal", "streaming-parity"),
    doc="Batch-parity oracle for the watermarked stream-stream interval "
    "join (attribution: every view -> purchase-of-same-user within 60 "
    "minutes, all candidates kept for downstream credit models).  Runs "
    "the PRODUCTION streaming function on batch frames — withWatermark "
    "is a no-op there — so the gated plan is the deployed code, not a "
    "re-implementation.  delay_sec = exact integer-microsecond delta / "
    "1e6 on both engines (one correctly-rounded division; cast-to-"
    "double per side would round twice and drift 1 ulp).",
)
def attribution_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    return attribute_conversions_stream(
        ev,
        impression_type="view",
        conversion_type="purchase",
        max_delay="60 minutes",
        watermark="30 minutes",
        join_type="inner",
    )
