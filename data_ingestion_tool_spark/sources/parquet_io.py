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


def read_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``events`` with ``ts`` normalized to a proper TimestampType (µs,
    truncated from ns exactly as DuckDB truncates)."""
    enable_nanos_as_long(spark)
    df = read_table(spark, sf_dir, "events")
    return df.withColumn("ts", nanos_to_timestamp("ts"))
