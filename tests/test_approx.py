"""Approximate-aggregate accuracy: sketches must land near exact."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_ingestion_tool_spark.queries import QUERIES
from data_ingestion_tool_spark.sources.parquet_io import read_events, read_table


def test_approx_distinct_within_rsd(spark, sf_dir):
    exact = {
        r.event_type: r.n
        for r in read_events(spark, sf_dir)
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    approx = {
        r.event_type: r.approx_users
        for r in QUERIES["agg_approx_distinct"](spark, sf_dir).collect()
    }
    assert set(approx) == set(exact)
    for k, n in exact.items():
        assert abs(approx[k] - n) <= max(3, 0.05 * n), (k, approx[k], n)


def test_approx_quantiles_close_to_exact(spark, sf_dir):
    o = read_table(spark, sf_dir, "orders")
    exact = {
        r.o_orderstatus: (r.p50, r.p95)
        for r in o.groupBy("o_orderstatus")
        .agg(
            F.percentile("o_totalprice", F.lit(0.5)).alias("p50"),
            F.percentile("o_totalprice", F.lit(0.95)).alias("p95"),
        )
        .collect()
    }
    approx = {
        r.o_orderstatus: (r.p50, r.p95)
        for r in QUERIES["agg_approx_quantiles"](spark, sf_dir).collect()
    }
    for k, (e50, e95) in exact.items():
        a50, a95 = approx[k]
        assert abs(a50 - e50) / e50 < 0.02
        assert abs(a95 - e95) / e95 < 0.02


def test_sample_seeded_reproducible(spark, sf_dir):
    a = sorted(tuple(r) for r in QUERIES["sample_seeded"](spark, sf_dir).collect())
    b = sorted(tuple(r) for r in QUERIES["sample_seeded"](spark, sf_dir).collect())
    assert a == b
    total = read_table(spark, sf_dir, "lineitem").count()
    sampled = sum(r[1] for r in a)
    assert 0.05 * total < sampled < 0.15 * total
