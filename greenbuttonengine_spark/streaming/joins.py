"""Stream-stream joins (SURVEY §2.7 engine surface): watermarked
interval joins between two live streams — the attribution shape
(impression x conversion-within-N-minutes) every event pipeline runs.

Structured Streaming buffers BOTH sides in keyed state and needs two
things to bound that state: a watermark on each side (how late data
may arrive) and a time-range join condition (how far apart matching
rows may be).  With both, the engine evicts left rows once
``left_ts + max_delay`` passes the right watermark and vice versa, so
state is O(input rate x (watermark + max_delay)) per key range —
bounded regardless of stream length, exactly the contract a 100 TB/day
pipeline needs.  Left-outer emits the unmatched left row (NULL right
columns) only after the watermark proves no match can still arrive.

The inner join's row set is IDENTICAL to the equivalent static join
(pytest pins stream == batch across micro-batch boundaries); the outer
join's NULL rows additionally depend on watermark progress, which is a
property of stream position, not data (the final rows of a finite
stream stay buffered — a real stream keeps flowing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    max_delay: str = "10 minutes",
    watermark: str = "30 minutes",
    join_type: str = "inner",
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Join two event streams on ``key_col`` where the right event
    lands within ``[left_ts, left_ts + max_delay]``.

    Output: (key, l_id, l_ts, r_id, r_ts, delay_sec).  ``join_type``
    'inner' or 'left_outer' (unmatched lefts emit NULL right columns
    once the watermark closes their window)."""
    l = left.select(
        F.col(key_col).alias("key"),
        F.col(id_col).alias("l_id"),
        F.col(ts_col).alias("l_ts"),
    ).withWatermark("l_ts", watermark)
    r = right.select(
        F.col(key_col).alias("r_key"),
        F.col(id_col).alias("r_id"),
        F.col(ts_col).alias("r_ts"),
    ).withWatermark("r_ts", watermark)
    cond = (
        (l["key"] == r["r_key"])
        & (r["r_ts"] >= l["l_ts"])
        & (r["r_ts"] <= l["l_ts"] + F.expr(f"INTERVAL {max_delay}"))
    )
    # delay in EXACT integer microseconds, then ONE correctly-rounded
    # division: cast(ts as double) would round each side separately
    # (seconds = micros/1e6), leaving the difference 1 ulp off the
    # DuckDB oracle's (epoch_us - epoch_us)/1e6 in the declared batch
    # form (attribution_interval_join).
    return l.join(r, cond, join_type).select(
        "key",
        "l_id",
        "l_ts",
        "r_id",
        "r_ts",
        (
            (F.unix_micros("r_ts") - F.unix_micros("l_ts"))
            / F.lit(1000000.0)
        ).alias("delay_sec"),
    )


def attribute_conversions_stream(
    events: DataFrame,
    impression_type: str = "view",
    conversion_type: str = "purchase",
    max_delay: str = "60 minutes",
    watermark: str = "30 minutes",
    join_type: str = "inner",
) -> DataFrame:
    """Attribution over ONE event stream: each ``conversion_type``
    event joined to every ``impression_type`` event of the same user
    within the preceding ``max_delay`` — the streaming analog of the
    batch as-of family (asof_last_click_before_purchase keeps only the
    latest; this emits all candidates so downstream can apply
    last-touch/linear credit, cf. attribution_linear_clicks).

    A self-join of one stream is two filtered views of the same source
    — Structured Streaming plans it as a genuine stream-stream join
    with per-side state."""
    imps = events.filter(F.col("event_type") == impression_type)
    convs = events.filter(F.col("event_type") == conversion_type)
    return interval_join_streams(
        imps,
        convs,
        max_delay=max_delay,
        watermark=watermark,
        join_type=join_type,
    )
