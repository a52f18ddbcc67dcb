"""Deduplication queries over ``documents`` (north-star)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedup as DD
from ..sources.parquet_io import read_table
from .registry import QUERIES, query
from ..plans.pin import pin