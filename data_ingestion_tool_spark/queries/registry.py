"""Registry plumbing shared by the query modules."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query; ``oracle=None`` → driver does a rows-only check."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = " ".join(oracle.split())
        return fn

    return deco


def dsum(col: str, scale: int = 2) -> F.Column:
    """Order-independent double sum: exact decimal accumulate → double."""
    return F.sum(F.col(col).cast(f"decimal(18,{scale})")).cast("double")


def davg(col: str, scale: int = 6) -> F.Column:
    """Deterministic average: exact decimal sum divided by count, both
    sides computing the same IEEE double division."""
    return F.sum(F.col(col).cast(f"decimal(18,{scale})")).cast("double") / F.count(
        F.lit(1)
    )


def sql_dsum(col: str, scale: int = 2) -> str:
    return f"CAST(SUM(CAST({col} AS DECIMAL(18,{scale}))) AS DOUBLE)"


def sql_davg(col: str, scale: int = 6) -> str:
    return f"CAST(SUM(CAST({col} AS DECIMAL(18,{scale}))) AS DOUBLE) / COUNT(*)"
