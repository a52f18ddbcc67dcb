"""Python DataSource connector: partition planning and determinism."""

from __future__ import annotations

from data_ingestion_tool_spark.sources.pyds import register_synthetic_source


def _load(spark, rows=1000, partitions=4):
    register_synthetic_source(spark)
    return (
        spark.read.format("synthetic_rows")
        .option("rows", rows)
        .option("partitions", partitions)
        .load()
    )


def test_partition_planning(spark):
    """The driver's split plan becomes real task parallelism."""
    df = _load(spark, rows=1000, partitions=4)
    assert df.rdd.getNumPartitions() == 4
    assert df.count() == 1000


def test_rows_deterministic_and_complete(spark):
    df = _load(spark, rows=100, partitions=3)
    rows = sorted(tuple(r) for r in df.collect())
    assert rows == [
        (i, i % 97, (i * 31) % 1000 / 10.0, i % 30) for i in range(100)
    ]
    # re-read is identical (pure generation)
    again = sorted(tuple(r) for r in _load(spark, 100, 3).collect())
    assert rows == again


def test_uneven_split_covers_all_rows(spark):
    df = _load(spark, rows=10, partitions=3)
    assert df.count() == 10
    assert df.select("event_id").distinct().count() == 10


def test_checksum_sink_ignores_unmanifested_strays(spark, tmp_path):
    """The sink's visibility rule: readers see exactly the manifested
    files — a stray staged file (failed/speculative task) is invisible."""
    import pyspark.sql.functions as F

    from data_ingestion_tool_spark.sources.pyds import (
        read_manifested,
        register_checksum_sink,
    )

    register_checksum_sink(spark)
    root = str(tmp_path / "sink")
    df = spark.range(10).select(
        F.col("id").cast("string").alias("k"), F.lit("x").alias("v")
    )
    df.write.format("checksum_sink").option("path", root).mode(
        "append"
    ).save()
    # simulate a zombie task's uncommitted output
    with open(f"{root}/staged-zombie.csv", "w") as fh:
        fh.write("999,zzz\n")
    back = read_manifested(spark, root)
    assert back.count() == 10
    assert back.filter("k = '999'").count() == 0
