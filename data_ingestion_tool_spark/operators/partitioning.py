"""Scan-parallelism repair: fan a starved scan out to every core.

A parquet file is readable in parallel only at ROW-GROUP granularity —
Spark assigns a row group to the task whose byte-range split contains
its midpoint, so a single-row-group file is a single-task scan no
matter what ``spark.sql.files.maxPartitionBytes`` says. Every
computation fused into that scan stage (md5 per row, shingle/trigram
explodes, HOF folds, the map side of the first aggregation) then runs
on ONE core until the first exchange.

:func:`spread` is the optimization-guide §2.5 fix ("input skew: one
huge unsplittable file — repartition immediately after the read"),
made scale-adaptive: it round-robin repartitions to
``sparkContext.defaultParallelism`` ONLY when the frame has fewer
partitions than that, so on a real cluster (many row groups / many
files per scan) it is a plan no-op and costs nothing. Locally it adds
one narrow-row shuffle and buys a cores-wide map stage for everything
downstream.

Place it BEFORE heavy per-row compute and AFTER the narrowest
projection, so the shuffle carries only the columns the compute needs
(guide §2.3 "project before the exchange").

Determinism: round-robin repartition is retry-safe (Spark's
sort-before-repartition, SPARK-23207, keeps row→partition assignment
stable across task retries), and every query in this repo is
partition-order-independent by construction (decimal/fixed-point
accumulation, tie-broken windows) — the differential gate verifies
each one.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def spread(
    df: DataFrame,
    min_parts: int | None = None,
    *,
    by: list[str | Column] | None = None,
) -> DataFrame:
    """Repartition ``df`` to ``defaultParallelism`` iff it currently has
    fewer partitions (single-row-group local files); no-op otherwise.

    ``by``: distribute by ``xxhash64(by...)`` instead of round-robin.
    Round-robin repartition first LOCALLY SORTS its input for
    retry-determinism (sortBeforeRepartition, SPARK-23207) — paid
    inside the starved single task this call exists to relieve; a
    deterministic hash of a near-unique key skips that sort (measured
    0.83s → 0.49s on a 600k-row md5 map stage). Pass a key with ≫32×
    the partition count in distinct values (guide §2.5) — row keys,
    doc ids — never a low-cardinality column.
    """
    target = min_parts or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    if by:
        cols = [F.col(c) if isinstance(c, str) else c for c in by]
        return df.repartition(target, F.xxhash64(*cols))
    return df.repartition(target)
