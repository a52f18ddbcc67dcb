"""Text-analysis queries over ``documents`` (north-star)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import text as TX
from ..sources.parquet_io import read_table
from .registry import query
from ..plans.pin import pin