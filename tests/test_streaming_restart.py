"""Checkpoint-recovery proof: a stateful streaming query killed after
half its input and RESTARTED with the same checkpoint must (a) resume
from the offset log instead of reprocessing, and (b) produce exactly
the batch answer over the full input — the exactly-once contract that
makes streaming ingest production-usable.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import functions as F

from data_ingestion_tool_spark.sources.parquet_io import read_events


def test_stateful_restart_resumes_from_checkpoint(spark, sf_dir, tmp_path):
    ev = read_events(spark, sf_dir).select("event_id", "ts", "event_type")
    half = ev.where(F.col("event_id") % 2 == 0)
    rest = ev.where(F.col("event_id") % 2 == 1)

    src = str(tmp_path / "src")
    os.makedirs(src)
    half.coalesce(1).write.mode("append").parquet(src)
    n_rest = rest.count()

    ckpt = str(tmp_path / "ckpt")
    schema = spark.read.parquet(src).schema

    def run(name: str):
        q = (
            spark.readStream.schema(schema)
            .parquet(src)
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return q

    n1 = f"restart_a_{uuid.uuid4().hex[:6]}"
    run(n1)
    first = {r.event_type: r.cnt for r in spark.table(n1).collect()}
    half_expected = {
        r.event_type: r.cnt
        for r in half.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    assert first == half_expected

    # "crash": the query object is gone; the checkpoint survives.
    # Land the second half and restart against the SAME checkpoint.
    rest.coalesce(1).write.mode("append").parquet(src)
    n2 = f"restart_b_{uuid.uuid4().hex[:6]}"
    q2 = run(n2)

    # (a) exactly-once resume: the restarted run ingested ONLY the new
    # rows (offset log skipped the already-committed first half)
    resumed_rows = sum(
        p["numInputRows"] for p in (q2.recentProgress or [])
    )
    assert resumed_rows == n_rest, (resumed_rows, n_rest)

    # (b) state recovery: the complete-mode result equals the batch
    # answer over the FULL input (first half's counts came from the
    # restored state store, not a rescan)
    full_expected = {
        r.event_type: r.cnt
        for r in ev.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    got = {r.event_type: r.cnt for r in spark.table(n2).collect()}
    assert got == full_expected

    shutil.rmtree(ckpt, ignore_errors=True)
