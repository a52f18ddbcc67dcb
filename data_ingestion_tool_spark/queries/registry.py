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
        if name in QUERIES:  # a silent overwrite once hid a dup (r5)
            raise ValueError(
                f"query {name!r} registered twice "
                f"(existing: {QUERIES[name].__module__}, "
                f"new: {fn.__module__})"
            )
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = " ".join(oracle.split())
        return fn

    return deco


def dsum(col: F.Column | str, scale: int = 2) -> F.Column:
    """Order-independent double sum: exact decimal accumulate → double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(18,{scale})")).cast("double")


def davg(col: str, scale: int = 6) -> F.Column:
    """Deterministic average: exact decimal sum divided by count, both
    sides computing the same IEEE double division."""
    return F.sum(F.col(col).cast(f"decimal(18,{scale})")).cast("double") / F.count(
        F.lit(1)
    )


def fsum(col: F.Column | str, scale: int = 2) -> F.Column:
    """Fixed-point deterministic sum — the FAST path for exact-decimal
    doubles: round(x·10^s)→bigint accumulate (whole-stage codegen long
    adds, ~1.5x faster than decimal sums) then one double division.

    Preconditions (caller must know the data): values carry at most
    ``scale`` decimal digits exactly (so x·10^s is within 1 ulp of its
    integer and both engines round to the SAME integer), and the group
    sum × 10^s stays < 2^53 (so the bigint→double conversion before the
    division is exact). Use :func:`dsum` when either doesn't hold.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(F.round(c * (10**scale), 0).cast("bigint")) / float(10**scale)


def sql_fsum(col: str, scale: int = 2) -> str:
    return (
        f"SUM(CAST(ROUND({col} * {10**scale}, 0) AS BIGINT)) / {float(10**scale)}"
    )


def sql_dsum(col: str, scale: int = 2) -> str:
    return f"CAST(SUM(CAST({col} AS DECIMAL(18,{scale}))) AS DOUBLE)"


def sql_davg(col: str, scale: int = 6) -> str:
    return f"CAST(SUM(CAST({col} AS DECIMAL(18,{scale}))) AS DOUBLE) / COUNT(*)"
