"""transformWithState (Spark 4 typed-state API) — per-key distinct
tracking with MapState + ValueState, checked against the batch
COUNT(DISTINCT).  The Python worker for this operator speaks a
protobuf protocol, so the test SKIPS where google.protobuf is absent
(pyspark ships it only via the optional 'connect' extra); plan
construction itself is dependency-free and always exercised."""

from __future__ import annotations

import importlib.util

import pytest
from pyspark.sql import functions as F

from data_ingestion_tool_spark.streaming.stateful import (
    distinct_types_per_key_tws,
)

_HAS_PROTOBUF = (
    importlib.util.find_spec("google") is not None
    and importlib.util.find_spec("google.protobuf") is not None
)


def test_plan_constructs_without_dependency(spark):
    # building the streaming plan must not require protobuf
    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", "1").load()
        .selectExpr(
            "value AS user_id", "CAST(value % 3 AS STRING) AS event_type"
        )
    )
    out = distinct_types_per_key_tws(stream)
    assert set(out.schema.fieldNames()) == {
        "user_id", "n_distinct_types", "n_events",
    }


@pytest.mark.skipif(
    not _HAS_PROTOBUF, reason="google.protobuf not available in this env"
)
def test_tws_distinct_equals_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    rows = [(u, t) for u in range(5) for t in ["a", "b", "a", "c"][: u + 1]]
    df = spark.createDataFrame(rows, "user_id bigint, event_type string")
    df.coalesce(1).write.parquet(src)

    from data_ingestion_tool_spark.streaming.windows import run_stream_to_table

    out = run_stream_to_table(
        spark,
        src,
        "user_id bigint, event_type string",
        distinct_types_per_key_tws,
        output_mode="update",
    )
    final = {
        r.user_id: (r.n_distinct_types, r.n_events)
        for r in out.groupBy("user_id")
        .agg(
            F.max("n_distinct_types").alias("n_distinct_types"),
            F.max("n_events").alias("n_events"),
        )
        .collect()
    }
    want = {
        r.user_id: (r.d, r.n)
        for r in df.groupBy("user_id")
        .agg(
            F.countDistinct("event_type").alias("d"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    }
    assert final == want
