from .charts import ChartChunk, aggregate_by_period, chart_chunks
from .writers import write_csv, write_parquet, write_influx_lines, influx_lines_df

__all__ = [
    "ChartChunk",
    "aggregate_by_period",
    "chart_chunks",
    "write_csv",
    "write_parquet",
    "write_influx_lines",
    "influx_lines_df",
]
