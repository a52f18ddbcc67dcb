"""Unit tests: as-of join edge cases, IVF recall vs brute force,
partition pruning reaches the scan."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from data_ingestion_tool_spark.operators.asof import asof_join
from data_ingestion_tool_spark.operators.similarity import cosine_topk, ivf_topk


def ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [
            (1, ts("2024-01-01T10:00:00"), "a"),   # exact-tie match
            (1, ts("2024-01-01T11:00:00"), "b"),   # later match wins
            (2, ts("2024-01-01T09:00:00"), "c"),   # no earlier right row
            (3, ts("2024-01-01T12:00:00"), "d"),   # key absent on right
        ],
        "k long, t timestamp, tag string",
    )
    right = spark.createDataFrame(
        [
            (1, ts("2024-01-01T10:00:00"), 100.0),
            (1, ts("2024-01-01T10:30:00"), 200.0),
            (2, ts("2024-01-01T09:30:00"), 300.0),
        ],
        "k long, t timestamp, price double",
    )
    out = asof_join(
        left, right, on="k", left_ts="t", right_ts="t",
        payload={"price": "asof_price"},
    )
    got = {r.tag: r.asof_price for r in out.collect()}
    assert got == {"a": 100.0, "b": 200.0, "c": None, "d": None}
    assert out.columns == ["k", "t", "tag", "asof_price"]


def test_asof_join_null_payload_stays_attached(spark):
    """A NULL payload value in the MATCHED right row must come through as
    NULL (not be back-filled from an older right row), and with multiple
    payload columns every output column must come from the same matched
    row — DuckDB ASOF JOIN semantics."""
    left = spark.createDataFrame(
        [(1, ts("2024-01-01T12:00:00"), "x")],
        "k long, t timestamp, tag string",
    )
    right = spark.createDataFrame(
        [
            # older row: fully populated
            (1, ts("2024-01-01T10:00:00"), 100.0, "old"),
            # most recent match: price is NULL, src differs
            (1, ts("2024-01-01T11:00:00"), None, "new"),
        ],
        "k long, t timestamp, price double, src string",
    )
    out = asof_join(
        left, right, on="k", left_ts="t", right_ts="t",
        payload={"price": "asof_price", "src": "asof_src"},
    )
    row = out.collect()[0]
    assert row.asof_src == "new"
    assert row.asof_price is None, (
        "NULL payload of the matched row was substituted by an older row"
    )


def test_asof_join_row_preserving(spark, sf_dir):
    """LEFT ASOF never duplicates or drops left rows."""
    from data_ingestion_tool_spark.queries import QUERIES

    df = QUERIES["join_asof_last_click"](spark, sf_dir)
    from data_ingestion_tool_spark.sources.parquet_io import read_events

    n_errors = (
        read_events(spark, sf_dir).filter(F.col("event_type") == "error").count()
    )
    assert df.count() == n_errors
    assert df.select("event_id").distinct().count() == n_errors


def test_ivf_recall_vs_brute_force(spark, sf_dir):
    """Approximate ANN must actually approximate: recall@5 against the
    exact answer well above chance (50 corpus cells → chance ≈ 0.25)."""
    from data_ingestion_tool_spark.sources.parquet_io import read_table

    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.orderBy("vec_id").limit(10)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in cosine_topk(emb, queries, k=5).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in ivf_topk(emb, queries, k=5, n_centroids=8, n_probe=3).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"IVF recall@5 too low: {recall:.2f}"


def test_ivf_assign_paths_agree(spark, sf_dir):
    """The expression path and the numpy mapInPandas path of IVF cell
    assignment must produce identical (id → cells) maps."""
    from data_ingestion_tool_spark.operators.similarity import (
        _as_double,
        _assign_cells,
        ivf_centroids,
    )
    from data_ingestion_tool_spark.sources.parquet_io import read_table

    emb = read_table(spark, sf_dir, "embeddings").limit(300)
    cents = ivf_centroids(emb, n_centroids=8)
    base = emb.select(
        F.col("vec_id"), _as_double("embedding").alias("v")
    )
    expr = {
        r.vec_id: r.cells
        for r in _assign_cells(
            base, "v", cents, 3, "cells", use_numpy=False
        ).collect()
    }
    npy = {
        r.vec_id: r.cells
        for r in _assign_cells(
            base, "v", cents, 3, "cells", use_numpy=True
        ).collect()
    }
    assert expr == npy


def test_srp_bucket_paths_agree(spark, sf_dir):
    """Expression-path and numpy-path SRP bucketing must emit the same
    (id, table, bucket) set."""
    import numpy as np

    from data_ingestion_tool_spark.operators.similarity import _with_srp_buckets
    from data_ingestion_tool_spark.sources.parquet_io import read_table

    rng = np.random.RandomState(42)
    tables = [
        [rng.standard_normal(64).tolist() for _ in range(8)] for _ in range(4)
    ]
    emb = read_table(spark, sf_dir, "embeddings").limit(300)
    expr = {
        (r.vid, r.tbl, r.bkt)
        for r in _with_srp_buckets(
            emb, "vec_id", "embedding", tables, "vid", use_numpy=False
        ).collect()
    }
    npy = {
        (r.vid, r.tbl, r.bkt)
        for r in _with_srp_buckets(
            emb, "vec_id", "embedding", tables, "vid", use_numpy=True
        ).collect()
    }
    assert expr == npy


def test_ivf_recall_large_codebook(spark, sf_dir):
    """256-centroid codebook (256×64 literals > IVF_MAX_CODEBOOK_LITERALS
    → numpy auto-path): recall must stay well above the probed fraction."""
    from data_ingestion_tool_spark.operators import similarity as S
    from data_ingestion_tool_spark.sources.parquet_io import read_table

    assert 256 * 64 > S.IVF_MAX_CODEBOOK_LITERALS
    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.orderBy("vec_id").limit(5)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in cosine_topk(emb, queries, k=5).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in ivf_topk(
            emb, queries, k=5, n_centroids=256, n_probe=64
        ).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"IVF recall@5 too low at 256 cells: {recall:.2f}"


def test_partition_pruning_in_plan(spark, sf_dir):
    """The partitioned-ingest read must prune directories at plan time:
    the scan's PartitionFilters carries the o_orderstatus predicate."""
    from data_ingestion_tool_spark.plans import formatted_plan
    from data_ingestion_tool_spark.queries import QUERIES

    df = QUERIES["ingest_partitioned_prune"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "PartitionFilters" in plan
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "o_orderstatus" in m.group(1)


def test_asof_nearest_tie_prefers_backward(spark):
    """Equidistant matches resolve to the earlier (backward) row, and
    one-sided cases fall back to whichever side exists."""
    from datetime import datetime

    from data_ingestion_tool_spark.operators.asof import asof_join

    T = datetime
    left = spark.createDataFrame(
        [(1, 1, T(2024, 1, 1, 12, 0, 0)),   # tie: clicks at 11:00 and 13:00
         (2, 1, T(2024, 1, 1, 9, 0, 0)),    # only forward exists
         (3, 2, T(2024, 1, 1, 12, 0, 0))],  # only backward exists
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(1, T(2024, 1, 1, 11, 0, 0), "early"),
         (1, T(2024, 1, 1, 13, 0, 0), "late"),
         (2, T(2024, 1, 1, 8, 0, 0), "only_b")],
        "user_id long, ts timestamp, tag string",
    )
    out = {
        r.event_id: r.tag
        for r in asof_join(
            left, right, on="user_id", left_ts="ts", right_ts="ts",
            payload={"tag": "tag"}, direction="nearest",
        ).collect()
    }
    assert out == {1: "early", 2: "early", 3: "only_b"}


def test_asof_tolerance_nulls_stale_matches(spark):
    from data_ingestion_tool_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00"), (1, "2024-01-01 12:00:00")],
        "k int, t string",
    ).selectExpr("k", "CAST(t AS TIMESTAMP) AS t")
    right = spark.createDataFrame(
        [(1, "2024-01-01 09:55:00", 7.0), (1, "2024-01-01 10:30:00", 9.0)],
        "k int, t string, v double",
    ).selectExpr("k", "CAST(t AS TIMESTAMP) AS t", "v")
    out = asof_join(
        left,
        right,
        on="k",
        left_ts="t",
        right_ts="t",
        payload={"v": "asof_v"},
        tolerance_us=10 * 60 * 1_000_000,
    )
    got = {str(r["t"]): r["asof_v"] for r in out.collect()}
    # 10:00 matches 09:55 (5 min <= tol); 12:00's best match 10:30 is
    # 90 min stale -> nulled, row itself preserved (LEFT semantics)
    assert got["2024-01-01 10:00:00"] == 7.0
    assert got["2024-01-01 12:00:00"] is None
    # nearest + tolerance is rejected loudly
    import pytest as _pytest

    with _pytest.raises(ValueError):
        asof_join(
            left, right, on="k", left_ts="t", right_ts="t",
            payload={"v": "x"}, direction="nearest", tolerance_us=1,
        )


def test_sweepline_prefix_sum_spans_partitions(spark):
    """Round-5 verdict item 5 (executed round 6): the sweep-line
    concurrency family (events_peak_concurrency_hourly temporal.py;
    events_peak_concurrency statistics.py) rides the parallel global
    prefix sum — pin that the sweep is exact when the boundary stream
    spans many range partitions, including p >> rows (empty partitions
    between populated ones), touching intervals at identical
    timestamps (end must decrement BEFORE the next start counts), and
    overlap runs crossing partition edges."""
    from pyspark.sql import Window

    from data_ingestion_tool_spark.operators.ranking import (
        with_global_prefix_sum,
    )

    # 40 events: a dense overlap run (1-minute spacing, 5-minute
    # windows => concurrency climbs to 5), a touching chain (each
    # start == previous end), and a sparse tail
    rows = []
    for i in range(20):
        rows.append((i + 1, datetime(2024, 1, 1, 10, i)))  # dense run
    for i in range(10):
        rows.append((100 + i, datetime(2024, 1, 1, 12, 5 * i)))  # touching
    for i in range(10):
        rows.append((200 + i, datetime(2024, 1, 2, i)))  # sparse
    e = spark.createDataFrame(rows, "event_id long, ts timestamp")
    starts = e.select(
        F.col("ts").alias("t"), F.lit(1).alias("delta"), "event_id"
    )
    ends = e.select(
        (F.col("ts") + F.expr("INTERVAL 5 MINUTE")).alias("t"),
        F.lit(-1).alias("delta"),
        "event_id",
    )
    b = starts.unionAll(ends)

    w = Window.orderBy("t", "delta", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    naive = (
        b.select("t", "delta", F.sum("delta").over(w).alias("running"))
        .where(F.col("delta") == 1)
        .groupBy(F.date_trunc("hour", "t").alias("hour"))
        .agg(F.max("running").cast("bigint").alias("peak"))
    )
    ref = {r["hour"]: r["peak"] for r in naive.collect()}
    # the touching chain must never double-count: peak 1 in hour 12
    assert ref[datetime(2024, 1, 1, 12)] == 1
    # the dense run reaches 5 concurrent
    assert ref[datetime(2024, 1, 1, 10)] == 5

    for p in (3, 7, 997):  # runs span edges; p=997 leaves most empty
        sw = with_global_prefix_sum(
            b,
            ["t", "delta", "event_id"],
            "delta",
            rn="__rn",
            cum="running",
            num_partitions=p,
        )
        got = {
            r["hour"]: r["peak"]
            for r in sw.where(F.col("delta") == 1)
            .groupBy(F.date_trunc("hour", "t").alias("hour"))
            .agg(F.max("running").cast("bigint").alias("peak"))
            .collect()
        }
        assert got == ref, p
