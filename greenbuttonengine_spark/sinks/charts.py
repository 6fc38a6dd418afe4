"""Per-series chart export: the reference's typed-array column getters
feeding its d3 charts (timeseries.rs:366-436 wasm getters;
web-frontend/src/charts/date_aggregated_chart.ts:50-58 consumes
time_period_start dates + values + uom[0] and d3 extents).

Spark-first split of that workload:

* ordering (O1), per-series extents (A1: d3.extent analog) and the
  first-of-series uom (O3) are DISTRIBUTED aggregates;
* the final per-title Arrow slice is a driver-side zero-copy cut of one
  Arrow transfer — charts are a client-side artifact, and the DataFrame
  handed in is expected to be chart-sized (aggregate first; the engine's
  rollup operators exist for exactly that).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator

import pyarrow as pa

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class ChartChunk:
    """One renderable series: the reference's per-chunk chart input."""

    title: str
    uom: str  # first-of-series (O3; chart.ts uses uom[0])
    date_extent: tuple  # (min ts, max ts) — d3 dateExtent
    value_extent: tuple  # (min value, max value) — d3 numericExtent
    table: pa.Table  # all columns, rows sorted by time


def aggregate_by_period(
    ts: DataFrame,
    period: str = "month",
    title_col: str = "title",
    time_col: str = "time_period_start_unix",
    value_col: str = "value",
    cost_col: str = "cost",
) -> DataFrame:
    """Per-series calendar rollup feeding the date-aggregated charts
    (web-frontend/src/charts/date_aggregated_chart.ts: the UI sums
    values per day/month/year bucket before rendering).

    ``period`` is any ``date_trunc`` unit (day/week/month/year).
    Epoch-seconds time column -> truncated bucket; one hash aggregate
    (map-side partial) keyed (title, bucket) — the shuffle carries one
    row per bucket, never the readings.  NaN costs (the missing-cost
    sentinel) are excluded from the cost sum the way the reference's
    chart ignores them; an all-NaN bucket yields cost NULL.
    """
    bucket = F.date_trunc(period, F.timestamp_seconds(F.col(time_col)))
    cost_ok = ~F.isnan(F.col(cost_col)) & F.col(cost_col).isNotNull()
    return (
        ts.groupBy(F.col(title_col), bucket.alias("period_start"))
        .agg(
            F.sum(value_col).alias("total_value"),
            F.sum(F.when(cost_ok, F.col(cost_col))).alias("total_cost"),
            F.count("*").alias("n_readings"),
        )
        .orderBy(title_col, "period_start")
    )


def chart_chunks(
    ts: DataFrame,
    title_col: str = "title",
    time_col: str = "time_period_start_unix",
    value_col: str = "value",
    uom_col: str = "uom",
) -> Iterator[ChartChunk]:
    """Yield one :class:`ChartChunk` per distinct title, sorted by title.

    Extents and first-of-series metadata come from a distributed
    aggregate; rows arrive sorted (title, time) in a single Arrow
    transfer and are sliced zero-copy per series.
    """
    extents = {
        r[title_col]: r
        for r in (
            ts.groupBy(title_col)
            .agg(
                F.min(time_col).alias("min_t"),
                F.max(time_col).alias("max_t"),
                F.min(value_col).alias("min_v"),
                F.max(value_col).alias("max_v"),
                F.min_by(uom_col, time_col).alias("first_uom"),
            )
            .collect()
        )
    }
    tbl = ts.orderBy(title_col, time_col).toArrow()
    titles = tbl[title_col]
    n = len(tbl)
    start = 0
    while start < n:
        title = titles[start].as_py()
        end = start
        while end < n and titles[end].as_py() == title:
            end += 1
        ex = extents[title]
        yield ChartChunk(
            title=title,
            uom=ex["first_uom"],
            date_extent=(ex["min_t"], ex["max_t"]),
            value_extent=(ex["min_v"], ex["max_v"]),
            table=tbl.slice(start, end - start),
        )
        start = end
