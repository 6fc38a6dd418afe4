"""Custom stateful streaming operators (SURVEY §2.7 engine surface).

The reference has no streaming runtime; these are the engine-level
capabilities a continuous ingest needs, expressed with Structured
Streaming primitives:

  windowed_event_counts   event-time tumbling-window aggregation with a
                          watermark (late data beyond the watermark is
                          dropped) — the streaming d1 rollup.
  sessionize_stream       custom stateful sessionization via
                          applyInPandasWithState: per-user session state
                          (start, last-seen, count) persists across
                          micro-batches; a session is emitted exactly
                          once when later data crosses the inactivity
                          gap — the streaming analog of the batch
                          sessionize_events query.

State scale notes: state is partitioned by the grouping key across
executors (RocksDB-backed state store in production configs). Sessions
close on OBSERVED data (NoTimeout); production deployments add
GroupStateTimeout.ProcessingTimeTimeout to also flush sessions of
users who stop sending entirely (and to bound state size) — omitted
here because timeout-driven empty batches don't quiesce under the
synchronous processAllAvailable used in tests.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_GAP_SECONDS = 30 * 60

SESSION_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
    ]
)

SESSION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n", T.LongType()),
    ]
)


def windowed_event_counts(events: DataFrame, window: str = "5 minutes",
                          watermark: str = "10 minutes") -> DataFrame:
    """Tumbling event-time window counts with late-data watermark."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), F.col("event_type"))
        .agg(F.count("*").alias("n"), F.sum("value").alias("total_value"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n",
            "total_value",
        )
    )


def dedup_stream(
    events: DataFrame,
    key_cols: list[str] | None = None,
    watermark: str = "10 minutes",
    event_time_col: str = "ts",
) -> DataFrame:
    """Streaming exact dedup: first arrival per key wins; re-arrivals
    within the watermark horizon are dropped.

    ``dropDuplicatesWithinWatermark`` bounds the dedup state by event
    time — keys older than the watermark are evicted, so state size is
    O(keys per watermark window), not O(all keys ever) — the property
    that makes continuous ingest dedup viable at 100 TB (the streaming
    analog of the batch ``exact_duplicates`` operator).
    """
    key_cols = key_cols or ["event_id"]
    return events.withWatermark(event_time_col, watermark).dropDuplicatesWithinWatermark(
        key_cols
    )


def _sessionize_group(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Emit closed sessions for one user; keep the open session in state."""
    (user_id,) = key

    ts_us: list[int] = []
    for pdf in batches:
        ts_us.extend(int(t.value // 1000) for t in pd.to_datetime(pdf["ts"]))
    ts_us.sort()

    if state.exists:
        start_us, last_us, n = state.get
    else:
        start_us, last_us, n = ts_us[0], ts_us[0], 0

    closed: list[tuple[int, int, int]] = []
    gap_us = SESSION_GAP_SECONDS * 1_000_000
    for t in ts_us:
        if t - last_us > gap_us:
            closed.append((start_us, last_us, n))
            start_us, n = t, 0
        last_us = max(last_us, t)
        n += 1

    state.update((start_us, last_us, n))

    if closed:
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(closed),
                "session_start": [pd.Timestamp(s, unit="us") for s, _, _ in closed],
                "session_end": [pd.Timestamp(e, unit="us") for _, e, _ in closed],
                "n_events": [c for _, _, c in closed],
            }
        )


def sessionize_stream(events: DataFrame) -> DataFrame:
    """Custom stateful operator: streaming sessionization with a
    30-minute inactivity gap, state per user across micro-batches."""
    from ..shipping import ensure_package_shipped

    ensure_package_shipped(events.sparkSession)
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_group,
            outputStructType=SESSION_OUTPUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
