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
