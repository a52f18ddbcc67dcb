"""Two-phase heavy hitters: exactness, recall guarantee, edge cases."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_ingestion_tool_spark.operators.frequency import frequent_items


def test_exact_against_bruteforce(spark):
    """Result must EQUAL brute-force GROUP BY + threshold — the
    Misra-Gries phase may only add candidates, never lose one, and the
    verify phase filters exactly."""
    # zipf-ish skew: item i appears ~1000/i times
    rows = [(f"item_{i}",) for i in range(1, 40) for _ in range(1000 // i)]
    df = spark.createDataFrame(rows, "k string").repartition(8)
    got = {(r.item, r.cnt) for r in frequent_items(df, "k", 0.05).collect()}
    total = len(rows)
    counts = {}
    for (k,) in rows:
        counts[k] = counts.get(k, 0) + 1
    want = {(k, c) for k, c in counts.items() if c * 20 >= total}
    assert got == want and len(want) > 0


def test_nulls_excluded_from_total_and_items(spark):
    df = spark.createDataFrame(
        [("a",)] * 6 + [(None,)] * 10 + [("b",)] * 4, "k string"
    )
    got = {(r.item, r.cnt) for r in frequent_items(df, "k", 0.5).collect()}
    # total non-null = 10; only 'a' (6/10) reaches 50%
    assert got == {("a", 6)}


def test_threshold_is_integer_exact_at_boundary(spark):
    """An item at EXACTLY min_share must be included (>=), with no
    float-product wobble: 2 of 20 rows at min_share=0.1."""
    df = spark.createDataFrame(
        [("hot",)] * 2 + [(f"x{i}",) for i in range(18)], "k string"
    )
    got = {r.item for r in frequent_items(df, "k", 0.1).collect()}
    assert "hot" in got


def test_many_partitions_do_not_lose_recall(spark):
    """The pigeonhole argument holds per partition: even spread across
    many partitions, a 10% item always survives somewhere."""
    rows = [("hh",)] * 100 + [(f"u{i}",) for i in range(900)]
    df = spark.createDataFrame(rows, "k string").repartition(32)
    got = {r.item for r in frequent_items(df, "k", 0.1).collect()}
    assert got == {"hh"}


def test_bad_min_share_raises(spark):
    df = spark.createDataFrame([("a",)], "k string")
    with pytest.raises(ValueError, match="min_share"):
        frequent_items(df, "k", 0.0)
    with pytest.raises(ValueError, match="min_share"):
        frequent_items(df, "k", 1.5)


def test_no_collect_in_operator(spark):
    """The operator is lazy end-to-end — building the frame triggers no
    jobs (candidates/total ship as broadcast subplans, not collects)."""
    df = spark.createDataFrame([("a",)] * 10, "k string")
    tracker = spark.sparkContext.statusTracker()
    before = tracker.getJobIdsForGroup(None)
    out = frequent_items(df, "k", 0.2)
    after = tracker.getJobIdsForGroup(None)
    assert len(after) == len(before)
    assert out.count() >= 1


def test_sketch_mergeable_distinct_accuracy(spark, sf_dir):
    """Merged daily HLL sketches stay within 5% of the exact span-level
    distinct user count (carried as the est_within_5pct value the
    oracle pins TRUE), and the output is run-deterministic."""
    from data_ingestion_tool_spark.queries import QUERIES
    from data_ingestion_tool_spark.sources.parquet_io import read_events

    row = QUERIES["agg_sketch_mergeable_distinct"](spark, sf_dir).collect()[0]
    exact = read_events(spark, sf_dir).select("user_id").distinct().count()
    assert row.exact_users == exact
    assert row.est_within_5pct is True
    row2 = QUERIES["agg_sketch_mergeable_distinct"](spark, sf_dir).collect()[0]
    assert row.asDict() == row2.asDict()
