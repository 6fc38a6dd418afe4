from .ingest import start_ingest_stream, read_accumulated_timeseries

__all__ = ["start_ingest_stream", "read_accumulated_timeseries"]
