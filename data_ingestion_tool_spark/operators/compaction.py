"""Small-file compaction — the table-maintenance operator every
long-running ingest needs: streaming/batched appends (reference
main.py:273-286 appends 10k-row batches) accumulate thousands of tiny
parquet files, and at 100 TB the resulting scan-task explosion (one
task per file, driver listing cost, NameNode/object-store pressure)
dominates query latency.

Compaction rewrites a directory to ~target-sized files. It uses
``coalesce`` (narrow, NO shuffle — each output task concatenates whole
input files) rather than ``repartition`` (full shuffle of every byte);
the tradeoff is no redistribution of skewed file sizes, which is the
right default for append-generated files of similar size.
"""

from __future__ import annotations

import math
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

DEFAULT_TARGET_BYTES = 128 * 1024 * 1024  # one HDFS-ish block per file


def parquet_file_stats(path: str) -> tuple[int, int]:
    """(n_data_files, total_bytes) for a parquet directory."""
    files = [
        p for p in Path(path).rglob("*.parquet") if not p.name.startswith("_")
    ]
    return len(files), sum(p.stat().st_size for p in files)


def compact_parquet(
    spark: SparkSession,
    src: str,
    dst: str,
    target_bytes: int = DEFAULT_TARGET_BYTES,
) -> DataFrame:
    """Rewrite ``src`` into ``dst`` with ~``target_bytes`` files; returns
    the compacted DataFrame. Shuffle-free: coalesce concatenates input
    splits into n output tasks."""
    _, total = parquet_file_stats(src)
    n_out = max(1, math.ceil(total / target_bytes))
    df = spark.read.parquet(src)
    df.coalesce(n_out).write.mode("overwrite").parquet(dst)
    return spark.read.parquet(dst)


def compact_parquet_rows(
    spark: SparkSession,
    src: str,
    dst: str,
    target_rows: int,
) -> DataFrame:
    """Row-targeted compaction: rewrite ``src`` into
    ``ceil(n_rows / target_rows)`` files. Unlike the byte-targeted
    variant, the output file COUNT is a pure function of row count —
    independent of encodings, compression ratios, and parquet-writer
    versions — so it is assertable by an engine-independent oracle
    (``CEIL(COUNT(*) / target)``). Same shuffle-free coalesce plan;
    coalesce(n) over >=n non-empty input partitions yields exactly n
    non-empty partitions, hence exactly n data files.

    Scan partition count depends on core count and file-packing config
    (maxPartitionBytes / openCostInBytes): on a low-core host many small
    files can pack into fewer than ``n_out`` splits, where coalesce
    would under-produce files. Guard the invariant: fall back to a
    round-robin ``repartition(n_out)`` (one extra shuffle of a small
    table) so the file count stays a pure function of row count on any
    machine."""
    df = spark.read.parquet(src)
    n_out = max(1, math.ceil(df.count() / target_rows))
    if df.rdd.getNumPartitions() < n_out:
        df = df.repartition(n_out)
    else:
        df = df.coalesce(n_out)
    df.write.mode("overwrite").parquet(dst)
    return spark.read.parquet(dst)
