"""Structured-Streaming queries over ``events`` (north-star)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.parquet_io import (
    enable_nanos_as_long,
    nanos_to_timestamp,
    read_table,
)
from ..streaming import run_stream_to_table, tumbling_window_counts
from .registry import query


@query(
    "stream_tumbling_window_counts",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start, event_type,
           COUNT(*) AS cnt
    FROM events GROUP BY date_trunc('hour', ts), event_type
    """,
)
def stream_tumbling_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream(parquet) → watermark + 1h tumbling window →
    AvailableNow memory sink. The finite trigger closes the stream over
    the whole input, so the result equals the batch/date_trunc answer."""
    import os

    enable_nanos_as_long(spark)  # events.ts is TIMESTAMP(NANOS) parquet
    schema = read_table(spark, sf_dir, "events").schema  # ts as ns-long

    def transform(stream):
        return tumbling_window_counts(
            stream.withColumn("ts", nanos_to_timestamp("ts")),
            ts_col="ts",
            key_col="event_type",
            window="1 hour",
        )

    return run_stream_to_table(
        spark, os.path.join(sf_dir, "events.parquet"), schema, transform
    )
