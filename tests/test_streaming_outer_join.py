"""Left-outer stream-stream join semantics — the second streaming
behavior batch-equivalence oracles cannot see (after watermark drops,
tests/test_streaming_watermark.py): the NULL-padded result for an
unmatched left row is emitted only once the watermark passes the row's
join window (plus the one-batch eviction lag), and a left row the
stream ends on — still inside the watermark — NEVER emits its outer
result.  A batch left join over the same input disagrees on exactly
those young rows; production readers of an outer-join sink must treat
the tail as incomplete, not missing.

Reference behavior base: the repo's stream_stream_join
(queries/streaming.py) inner form; Spark's outer-join state eviction
is public Structured Streaming semantics.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from data_ingestion_tool_spark.streaming.windows import run_stream_to_table

SCHEMA = "ts timestamp, event_type string, user_id bigint, event_id bigint"


def _outer_join_transform(stream):
    errors = (
        stream.filter(F.col("event_type") == "error")
        .select(
            F.col("event_id").alias("error_id"),
            F.col("user_id").alias("e_user"),
            F.col("ts").alias("e_ts"),
        )
        .withWatermark("e_ts", "10 minutes")
    )
    clicks = (
        stream.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "10 minutes")
    )
    return errors.join(
        clicks,
        (F.col("e_user") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("e_ts") - F.expr("INTERVAL 10 MINUTES"))
        & (F.col("c_ts") <= F.col("e_ts")),
        "left_outer",
    ).select("error_id", "click_id")


def test_left_outer_join_null_emission_and_held_tail(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)

    def tdf(rows):
        return spark.createDataFrame(
            rows, "ts string, event_type string, user_id bigint, event_id bigint"
        ).withColumn("ts", F.col("ts").cast("timestamp"))

    batches = [
        # batch 1: matched error (E1 x C100) + unmatched error E2
        [
            ("2024-01-01 00:05:00", "click", 1, 100),
            ("2024-01-01 00:10:00", "error", 1, 1),
            ("2024-01-01 00:12:00", "error", 2, 2),
        ],
        # batch 2: advances watermark to 00:50 (> E1/E2 windows)
        [("2024-01-01 01:00:00", "click", 9, 101)],
        # batch 3: eviction lags one batch — E2's null row emits here;
        # E3 (01:55) stays inside the final watermark (01:50) forever
        [
            ("2024-01-01 02:00:00", "click", 9, 102),
            ("2024-01-01 01:55:00", "error", 3, 3),
        ],
    ]
    now = time.time()
    for i, rows in enumerate(batches):
        d = os.path.join(src, f"b{i}")
        tdf(rows).coalesce(1).write.mode("overwrite").parquet(d)
        t = now - 3600 + i * 600
        for root, _, files in os.walk(d):
            for f in files:
                os.utime(os.path.join(root, f), (t, t))

    out = run_stream_to_table(
        spark,
        src,
        SCHEMA,
        _outer_join_transform,
        output_mode="append",
        reader_options={
            "maxFilesPerTrigger": "1",
            "recursiveFileLookup": "true",
        },
    )
    got = {(r.error_id, r.click_id) for r in out.collect()}
    # matched pair emits (inner results don't wait on the watermark)
    assert (1, 100) in got, got
    # E2's outer null row emitted after watermark passed + eviction lag
    assert (2, None) in got, got
    # E3 ended the stream inside the watermark: outer row NEVER emitted
    assert (3, None) not in got, got

    # batch semantics over the same input WOULD emit E3's null row —
    # the difference is precisely the held (un-evicted) tail
    static = spark.read.option("recursiveFileLookup", "true").parquet(src)
    batch = {
        (r.error_id, r.click_id)
        for r in _outer_join_transform(static).collect()
    }
    assert (3, None) in batch
    assert batch - got == {(3, None)}
