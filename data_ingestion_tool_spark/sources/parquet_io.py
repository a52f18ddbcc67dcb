"""Parquet scan helpers (the engine's native storage format).

The reference stores tables in ClickHouse MergeTree with no sort key
(`backend/main.py:266-267`, ``ORDER BY tuple()``); our equivalent is
plain Parquet directories/files. Reads stay fully declarative so
Catalyst keeps column pruning + predicate pushdown into the scan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TPCH_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one named table from a scale-factor directory."""
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def read_tables(spark: SparkSession, sf_dir: str, *names: str) -> tuple[DataFrame, ...]:
    return tuple(read_table(spark, sf_dir, n) for n in names)


def enable_nanos_as_long(spark: SparkSession) -> None:
    """The ``events`` table carries TIMESTAMP(NANOS) parquet, which
    Spark's TimestampType (microseconds) refuses outright. With this
    legacy conf the column surfaces as nanosecond longs instead."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")


def nanos_to_timestamp(col: str):
    """Exact ns→µs conversion via integer division (no double rounding)."""
    from pyspark.sql import functions as F

    return F.timestamp_micros(F.expr(f"CAST({col} DIV 1000 AS LONG)"))


def normalize_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize an event-time column to TimestampType regardless of how
    this Spark version surfaced the TIMESTAMP(NANOS) parquet source:
    ns-bigint (<=4.0 with ``nanosAsLong``) → exact ns→µs integer
    division; TIMESTAMP_NTZ (>=4.1 native) → cast, a pure
    reinterpretation under the pinned UTC session timezone. Works on
    batch and streaming DataFrames alike.
    """
    from pyspark.sql import functions as F

    dt = dict(df.dtypes).get(col)
    if dt == "bigint":
        return df.withColumn(col, nanos_to_timestamp(col))
    if dt == "timestamp_ntz":
        return df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def read_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``events`` with ``ts`` normalized to a timestamp (µs, truncated
    from ns exactly as DuckDB truncates).

    Spark-version adaptive: Spark <=4.0 refuses TIMESTAMP(NANOS) parquet
    unless ``nanosAsLong`` surfaces it as a bigint we convert ourselves;
    Spark >=4.1 reads it natively as TIMESTAMP_NTZ with the same µs
    truncation DuckDB applies (verified value-identical). The NTZ column
    is cast to TimestampType — a pure reinterpretation under the pinned
    UTC session timezone (session.py:44) — so downstream instant
    functions (``unix_micros`` etc.) keep working unchanged.
    """
    enable_nanos_as_long(spark)
    return normalize_ts(read_table(spark, sf_dir, "events"))
