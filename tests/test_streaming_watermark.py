"""Watermark late-data semantics — the one streaming behavior the
batch-equivalence oracles CANNOT see (a single AvailableNow batch over
finite input never drops anything: the watermark starts at epoch).

The input is split across three micro-batches (maxFilesPerTrigger=1,
file order pinned via mtime). Batch 1 advances the watermark past the
hour-0 window; window state evicts at the END of batch 2's predecessor
(eviction lags the displayed watermark by one batch — a late row
arriving in the SAME batch as the eviction still merges); batch 3's
straggler then hits evicted state and is DROPPED — the exact behavior
a 100 TB continuous ingest relies on to bound state.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from data_ingestion_tool_spark.streaming.windows import (
    run_stream_to_table,
    tumbling_window_counts,
)

SCHEMA = "ts timestamp, event_type string"


def test_late_event_dropped_past_watermark(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)

    def tdf(rows):
        return spark.createDataFrame(
            rows, "ts string, event_type string"
        ).withColumn("ts", F.col("ts").cast("timestamp"))

    batches = [
        # batch 1: hour-0 rows + a 02:00 row that pushes watermark to 01:50
        [("2024-01-01 00:10:00", "click"), ("2024-01-01 00:20:00", "click"),
         ("2024-01-01 02:00:00", "click")],
        # batch 2: runs with watermark 01:50 → hour-0 state evicts+emits
        [("2024-01-01 02:10:00", "click")],
        # batch 3: 00:30 straggler (dropped — state gone) + on-time row
        [("2024-01-01 00:30:00", "click"), ("2024-01-01 02:30:00", "click")],
    ]
    now = time.time()
    for i, rows in enumerate(batches):
        d = os.path.join(src, f"b{i}")
        tdf(rows).coalesce(1).write.mode("overwrite").parquet(d)
        t = now - 3600 + i * 600  # pin batch order by mtime
        for root, _, files in os.walk(d):
            for f in files:
                os.utime(os.path.join(root, f), (t, t))

    out = run_stream_to_table(
        spark,
        src,
        SCHEMA,
        lambda s: tumbling_window_counts(s, watermark="10 minutes"),
        output_mode="append",
        reader_options={"maxFilesPerTrigger": "1", "recursiveFileLookup": "true"},
    )
    got = {
        r.window_start.strftime("%H:%M"): r.cnt
        for r in out.filter(F.col("event_type") == "click").collect()
    }
    # hour-0 window: only the two batch-1 events; the straggler is dropped
    assert got.get("00:00") == 2, got
    # batch semantics over the same input WOULD have counted it — the
    # difference is precisely the streaming watermark drop
    batch_counts = {
        r.window_start.strftime("%H:%M"): r.cnt
        for r in tumbling_window_counts(
            spark.read.option("recursiveFileLookup", "true").parquet(src),
            watermark="10 minutes",
        ).collect()
    }
    assert batch_counts.get("00:00") == 3


def test_continuous_rollup_is_genuinely_incremental(spark, tmp_path):
    """The versioned rollup must show real incremental maintenance:
    multiple micro-batches, later versions superseding earlier ones for
    windows whose counts grew, and the compacted view equal to the
    batch answer."""
    from data_ingestion_tool_spark.streaming.continuous_agg import (
        continuous_rollup,
        rollup_view,
    )

    def tdf(rows):
        return spark.createDataFrame(
            rows, "ts string, event_type string"
        ).withColumn("ts", F.col("ts").cast("timestamp"))

    batches = [
        [("2024-01-01 00:10:00", "click"), ("2024-01-01 00:40:00", "view")],
        [("2024-01-01 00:20:00", "click")],  # hour-0 click count 1 -> 2
        [("2024-01-01 01:05:00", "click")],  # new hour-1 window
    ]
    src = str(tmp_path / "src")
    now = time.time()
    for i, rows in enumerate(batches):
        d = os.path.join(src, f"b{i}")
        tdf(rows).coalesce(1).write.mode("overwrite").parquet(d)
        t = now - 3600 + i * 600
        for root, _, files in os.walk(d):
            for f in files:
                os.utime(os.path.join(root, f), (t, t))
    dest = str(tmp_path / "rollup")

    seen = continuous_rollup(
        spark, src, "ts timestamp, event_type string", dest,
        max_files_per_trigger=1,
        reader_options={"recursiveFileLookup": "true"},
    )
    assert len(seen) >= 3  # one per file: genuinely multi-batch

    raw = spark.read.parquet(dest)
    # the hour-0 click row must exist in >1 version (count 1 then 2)
    versions = (
        raw.filter(
            (F.col("event_type") == "click")
            & (F.col("window_start") == "2024-01-01 00:00:00")
        )
        .select("_v", "cnt")
        .collect()
    )
    assert len(versions) >= 2
    assert {r.cnt for r in versions} == {1, 2}

    got = {
        (str(r.window_start), r.event_type): r.cnt
        for r in rollup_view(spark, dest).collect()
    }
    assert got == {
        ("2024-01-01 00:00:00", "click"): 2,
        ("2024-01-01 00:00:00", "view"): 1,
        ("2024-01-01 01:00:00", "click"): 1,
    }


def test_continuous_rollup_replay_is_idempotent(spark, tmp_path):
    """Re-running the whole stream against the SAME rollup table (fresh
    checkpoint => every batch id replays) must overwrite versions in
    place, not double-append — the dynamic-partition batch-id guard is
    the exactly-once story for plain-parquet sinks."""
    from data_ingestion_tool_spark.streaming.continuous_agg import (
        continuous_rollup,
        rollup_view,
    )

    def tdf(rows):
        return spark.createDataFrame(
            rows, "ts string, event_type string"
        ).withColumn("ts", F.col("ts").cast("timestamp"))

    src = str(tmp_path / "src")
    os.makedirs(src)
    tdf(
        [("2024-01-01 00:10:00", "click"), ("2024-01-01 01:20:00", "view")]
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(src, "b0"))
    dest = str(tmp_path / "rollup")
    opts = {"recursiveFileLookup": "true"}

    continuous_rollup(
        spark, src, "ts timestamp, event_type string", dest,
        reader_options=opts,
    )
    first = {
        (str(r.window_start), r.event_type): r.cnt
        for r in rollup_view(spark, dest).collect()
    }
    n_files_first = spark.read.parquet(dest).count()

    # fresh checkpoint => batch 0 replays against the existing table
    continuous_rollup(
        spark, src, "ts timestamp, event_type string", dest,
        reader_options=opts,
    )
    second = {
        (str(r.window_start), r.event_type): r.cnt
        for r in rollup_view(spark, dest).collect()
    }
    assert second == first
    # overwrote its version partition instead of appending rows
    assert spark.read.parquet(dest).count() == n_files_first
