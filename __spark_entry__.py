"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (the reference's R4 comma-join,
SURVEY.md §7 Phase 0) at sf0.001. ``queries()`` / ``oracle_sql()``
expose the full declared inventory from
:mod:`data_ingestion_tool_spark.queries` (SURVEY.md §2.B).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from data_ingestion_tool_spark import apply_session_defaults  # noqa: E402
from data_ingestion_tool_spark.queries import ORACLES, QUERIES  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Faithful reference R4 (`backend/main.py:178-180`): comma-join +
    opaque WHERE, built through the API façade; Catalyst recovers it to
    a hash equi-join.
    """
    apply_session_defaults(spark)
    return QUERIES["join_theta_comma"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI-SQL twin per hash-checked query; keys absent
    here (but present in ``queries()``) are rows-only-checked ops."""
    return dict(ORACLES)
