"""Skew-salting correctness + bucketed co-located joins.

Both are the manual scale levers for when AQE alone isn't enough:
salting spreads hot keys across reducers; bucketing pre-shuffles a
table once at write time so every later join on the bucket key is
shuffle-free.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_ingestion_tool_spark.operators.skew import (
    deterministic_salt,
    salted_agg,
    salted_join,
)
from data_ingestion_tool_spark.plans import exchange_count, join_strategies


@pytest.fixture()
def skewed(spark):
    # one hot key (90%), many cold keys
    rows = [(i, "hot" if i % 10 else "cold%d" % i, float(i)) for i in range(1000)]
    return spark.createDataFrame(rows, "id long, k string, v double")


def test_salt_deterministic(skewed):
    a = skewed.select("id", deterministic_salt("id", 8).alias("s")).collect()
    b = skewed.select("id", deterministic_salt("id", 8).alias("s")).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert all(0 <= r.s < 8 for r in a)


def test_salted_agg_matches_direct(skewed):
    direct = {
        (r.k): (r.cnt, r.mx)
        for r in skewed.groupBy("k")
        .agg(F.count(F.lit(1)).alias("cnt"), F.max("v").alias("mx"))
        .collect()
    }
    salted = {
        (r.k): (r.cnt, r.mx)
        for r in salted_agg(
            skewed, ["k"], {"cnt": ("v", "count"), "mx": ("v", "max")},
            salt_from="id", n_salts=8,
        ).collect()
    }
    assert salted == direct


def test_salted_join_matches_direct(spark, skewed):
    dim = spark.createDataFrame(
        [("hot", 1), ("cold1", 2), ("cold7", 3)], "k string, tag int"
    )
    direct = sorted(
        tuple(r) for r in skewed.join(dim, "k").select("id", "tag").collect()
    )
    salted = sorted(
        tuple(r)
        for r in salted_join(skewed, dim, "k", salt_from="id", n_salts=8)
        .select("id", "tag")
        .collect()
    )
    assert salted == direct


def test_salted_join_rejects_small_side_outer(spark, skewed):
    import pytest

    dim = spark.createDataFrame([("hot", 1)], "k string, tag int")
    for how in ("right", "full", "right_outer", "full_outer"):
        with pytest.raises(ValueError, match="unsupported"):
            salted_join(skewed, dim, "k", salt_from="id", how=how)


def test_sentinel_bypass_join_semantics(spark):
    """Bypass rewrite == plain LEFT join when the right side never
    carries the sentinel; NULL keys also ride the bypass."""
    from data_ingestion_tool_spark.operators.skew import sentinel_bypass_join

    big = spark.createDataFrame(
        [(1, 10), (2, -1), (3, 20), (4, None), (5, -1), (6, 30)],
        "row_id long, k int",
    )
    right = spark.createDataFrame(
        [(10, "a"), (20, "b")], "rk int, tag string"
    )
    got = sorted(
        tuple(r)
        for r in sentinel_bypass_join(
            big, right, on="k", right_on="rk", sentinel=-1
        ).select("row_id", "k", "tag").collect()
    )
    direct = sorted(
        tuple(r)
        for r in big.join(right, big.k == right.rk, "left")
        .select("row_id", "k", "tag")
        .collect()
    )
    assert got == direct
    assert (1, 10, "a") in got and (4, None, None) in got


def test_sentinel_join_hot_key_never_shuffles(spark, sf_dir):
    """The scale property behind join_skewed_sentinel: the hot sentinel
    (~40% of the fact) must not enter the join — the joined side's max
    key share stays near-uniform, so no reducer partition is bound to
    the hot key at any scale."""
    from pyspark.sql import functions as F

    from data_ingestion_tool_spark.sources.parquet_io import read_events

    e = read_events(spark, sf_dir)
    tagged = e.select(
        F.when(F.col("event_type").isin("signup", "error"), F.lit(-1))
        .otherwise(F.col("user_id"))
        .alias("join_uid")
    )
    total = tagged.count()
    hot = tagged.filter(F.col("join_uid") == -1).count()
    assert hot / total > 0.3  # the skew is real in the raw fact
    joined_side = tagged.filter(F.col("join_uid") != -1)
    freq = joined_side.groupBy("join_uid").count()
    mx, n_keys, joined_total = freq.agg(
        F.max("count"), F.count(F.lit(1)), F.sum("count")
    ).collect()[0]
    # max key share within 3x of perfectly uniform
    assert mx <= 3 * joined_total / n_keys


def test_bucketed_join_no_shuffle(spark, sf_dir, tmp_path):
    """bucketBy(8, key) on both sides → SortMergeJoin with ZERO shuffle
    exchanges: the bucket layout IS the shuffle, paid once at write
    time. This is the 100 TB fact⋈fact pattern (broadcast covers
    fact⋈dim; bucketing covers fact⋈fact reuse)."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    (o.write.bucketBy(8, "o_custkey").sortBy("o_custkey")
       .mode("overwrite").saveAsTable("b_orders"))
    (c.write.bucketBy(8, "c_custkey").sortBy("c_custkey")
       .mode("overwrite").saveAsTable("b_customer"))
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("b_orders").join(
            spark.table("b_customer"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        assert exchange_count(joined) == 0
        assert "SortMergeJoin" in join_strategies(joined)
        assert joined.count() > 0
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_customer")


def test_sentinel_bypass_join_rejects_name_collision(spark):
    import pytest

    from data_ingestion_tool_spark.operators.skew import sentinel_bypass_join

    big = spark.createDataFrame([(1, 10)], "row_id long, k int")
    right = spark.createDataFrame([(10, "a")], "k int, tag string")
    with pytest.raises(ValueError, match="collision"):
        sentinel_bypass_join(big, right, on="k", right_on="k", sentinel=-1)
