from .writers import write_csv, write_parquet, write_influx_lines, influx_lines_df

__all__ = ["write_csv", "write_parquet", "write_influx_lines", "influx_lines_df"]
