"""Compaction operator: file-count math and losslessness."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_ingestion_tool_spark.operators.compaction import (
    compact_parquet,
    parquet_file_stats,
)


def test_compact_merges_to_target_and_preserves_content(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    df = spark.range(10_000).withColumn("v", F.col("id") * 2)
    df.repartition(16).write.parquet(src)
    n_before, total_bytes = parquet_file_stats(src)
    assert n_before == 16
    # target bigger than the whole input → exactly one output file
    out = compact_parquet(spark, src, dst, target_bytes=total_bytes * 10)
    n_after, _ = parquet_file_stats(dst)
    assert n_after == 1
    assert out.count() == 10_000
    assert out.agg(F.sum("v")).collect()[0][0] == df.agg(F.sum("v")).collect()[0][0]


def test_compact_respects_target_size(spark, tmp_path):
    src, dst = str(tmp_path / "s2"), str(tmp_path / "d2")
    spark.range(50_000).withColumn("pad", F.sha2(F.col("id").cast("string"), 256)) \
        .repartition(32).write.parquet(src)
    _, total = parquet_file_stats(src)
    # ~quarter-of-input target → ceil(total/target) = 4 output files
    out = compact_parquet(spark, src, dst, target_bytes=total // 4 + 1)
    n_after, _ = parquet_file_stats(dst)
    assert n_after == 4
    assert out.count() == 50_000


def test_compact_rows_when_scan_packs_fewer_partitions(spark, tmp_path):
    """Round-5 ADVICE guard: when the parquet scan packs the input into
    FEWER splits than the target file count (one big file on a low-core
    host), row-targeted compaction must repartition up, keeping the
    file count a pure function of row count on any machine."""
    from data_ingestion_tool_spark.operators.compaction import (
        compact_parquet_rows,
    )

    src, dst = str(tmp_path / "s3"), str(tmp_path / "d3")
    spark.range(1_000).coalesce(1).write.parquet(src)
    scan_parts = spark.read.parquet(src).rdd.getNumPartitions()
    assert scan_parts < 10  # one file packs into (far) fewer than 10 splits
    out = compact_parquet_rows(spark, src, dst, target_rows=100)
    from data_ingestion_tool_spark.operators.compaction import (
        parquet_file_stats,
    )

    n_files, _ = parquet_file_stats(dst)
    assert n_files == 10  # ceil(1000/100), despite the packed scan
    assert out.count() == 1_000
