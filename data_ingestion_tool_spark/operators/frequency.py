"""Frequent-item (heavy hitter) mining — exact answers at streaming
cost via candidate generation + candidate-only verification.

No counterpart in the reference (its surface is scan/join/ingest,
`backend/main.py`); this is a standard analytics-engine addition for
"what dominates this 100 TB column" questions (top vocabulary terms,
hot keys before a salted join, spam-domain detection).

Scale shape (the point of the two-phase design):

1. **Candidate phase** — one pass, per partition, bounded memory:
   Misra-Gries summaries with ``k = ceil(1/min_share)`` counters per
   partition (``mapInPandas``; the MG dict spans all Arrow batches of
   the partition). Guarantee: an item with GLOBAL share >= min_share
   has share >= min_share in at least one partition, and Misra-Gries
   with k counters never evicts an item whose partition share exceeds
   1/k — so the union of per-partition candidates is a SUPERSET of the
   true heavy hitters (no recall loss, only false candidates).
2. **Verify phase** — exact counts for CANDIDATES ONLY: a broadcast
   semi-join keeps candidate rows (the full column never shuffles),
   then one small groupBy. Total rows come from the same scan's
   count aggregate, shipped as a one-row broadcast.

The threshold compare is INTEGER math (``cnt * denom >= num * total``)
so engines can't disagree in the last ulp of ``min_share * total``.
"""

from __future__ import annotations

import math
from fractions import Fraction
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _misra_gries_partition(col: str, k: int):
    """mapInPandas factory: per-partition Misra-Gries candidate items."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        for pdf in batches:
            for item in pdf[col]:
                if item is None:
                    continue
                if item in counters:
                    counters[item] += 1
                elif len(counters) < k:
                    counters[item] = 1
                else:
                    # decrement-all step; drop zeroed counters
                    dead = []
                    for key in counters:
                        counters[key] -= 1
                        if counters[key] == 0:
                            dead.append(key)
                    for key in dead:
                        del counters[key]
        yield pd.DataFrame({col: list(counters.keys())})

    return gen


def frequent_items(
    df: DataFrame, col: str, min_share: float = 0.01
) -> DataFrame:
    """Exact items of ``col`` whose share of non-null rows is at least
    ``min_share`` (0 < min_share <= 1), as (item, cnt) with cnt BIGINT.

    One full scan for candidates + one for verification; memory is
    O(partitions / min_share) candidate keys, never the full domain.
    """
    if not 0 < min_share <= 1:
        raise ValueError(f"min_share must be in (0, 1], got {min_share}")
    k = math.ceil(1 / min_share)
    src = df.select(F.col(col).alias(col)).filter(F.col(col).isNotNull())
    candidates = (
        src.mapInPandas(_misra_gries_partition(col, k), schema=src.schema)
        .distinct()
    )
    total = src.agg(F.count(F.lit(1)).alias("__total"))
    frac = Fraction(min_share).limit_denominator(10**9)
    counted = (
        src.join(F.broadcast(candidates), col, "left_semi")
        .groupBy(col)
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    return (
        counted.crossJoin(F.broadcast(total))
        .filter(
            F.col("cnt") * F.lit(frac.denominator)
            >= F.lit(frac.numerator) * F.col("__total")
        )
        .select(F.col(col).alias("item"), "cnt")
    )
