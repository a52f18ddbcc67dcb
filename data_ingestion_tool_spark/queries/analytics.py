"""Event-analytics queries: time-series gap-fill, funnel conversion,
cohort retention, heavy hitters.

The reference is pitched as an ingest/analytics bridge
(`backend/main.py` moves tables; the analytics happen downstream) —
these are the downstream questions every event table eventually gets
asked, expressed Spark-first with DuckDB oracle twins.

Determinism notes: every aggregate here is MIN/MAX/COUNT over
timestamps, dates, or exact values (no float summation), so results
hash identically cross-engine without decimal detours; the heavy-hitter
threshold is integer math (see operators/frequency.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.ranking import (
    with_global_ntile,
    with_global_prefix_sum,
    with_global_row_number,
)
from ..sources.parquet_io import read_events, read_table
from .registry import query
from ..plans.pin import pin