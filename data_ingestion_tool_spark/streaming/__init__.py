from .ingest import stream_ingest_parquet
from .windows import run_stream_to_table, tumbling_window_counts

__all__ = [
    "run_stream_to_table",
    "stream_ingest_parquet",
    "tumbling_window_counts",
]
