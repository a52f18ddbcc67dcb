"""Approximate-aggregate accuracy: sketches must land near exact."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_ingestion_tool_spark.queries import QUERIES
from data_ingestion_tool_spark.sources.parquet_io import read_events, read_table


def test_approx_distinct_within_rsd(spark, sf_dir):
    """Value-level accuracy of the raw estimator (the promoted query
    outputs only the exact twin + bound flag; this pins the estimate
    itself near exact)."""
    e = read_events(spark, sf_dir)
    rows = (
        e.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.01).alias("est"),
            F.countDistinct("user_id").alias("n"),
        )
        .collect()
    )
    assert rows
    for r in rows:
        assert abs(r.est - r.n) <= max(3, 0.05 * r.n), (r.event_type, r.est, r.n)
    # the promoted query's bound flags must all be TRUE
    for r in QUERIES["agg_approx_distinct"](spark, sf_dir).collect():
        assert r.est_within_5pct is True


def test_approx_quantiles_close_to_exact(spark, sf_dir):
    """Value-level accuracy of percentile_approx vs exact percentile
    (the promoted query outputs rank-bound flags; this pins values)."""
    o = read_table(spark, sf_dir, "orders")
    rows = (
        o.groupBy("o_orderstatus")
        .agg(
            F.percentile("o_totalprice", F.lit(0.5)).alias("e50"),
            F.percentile("o_totalprice", F.lit(0.95)).alias("e95"),
            F.percentile_approx(
                "o_totalprice", [0.5, 0.95], 10000
            ).alias("a"),
        )
        .collect()
    )
    assert rows
    for r in rows:
        assert abs(r.a[0] - r.e50) / r.e50 < 0.02
        assert abs(r.a[1] - r.e95) / r.e95 < 0.02
    for r in QUERIES["agg_approx_quantiles"](spark, sf_dir).collect():
        assert r.rank_within_bound is True


def test_sample_seeded_reproducible(spark, sf_dir):
    a = sorted(tuple(r) for r in QUERIES["sample_seeded"](spark, sf_dir).collect())
    b = sorted(tuple(r) for r in QUERIES["sample_seeded"](spark, sf_dir).collect())
    assert a == b
    assert all(r[2] is True for r in a)  # every group within 5 sigma
    l = read_table(spark, sf_dir, "lineitem")
    total = l.count()
    sampled = l.sample(fraction=0.1, seed=42).count()
    assert 0.05 * total < sampled < 0.15 * total
