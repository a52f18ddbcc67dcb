from .windows import tumbling_window_counts, run_stream_to_table

__all__ = ["tumbling_window_counts", "run_stream_to_table"]
