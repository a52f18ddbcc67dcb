"""Runtime proof that AQE's skew-join handling engages on this engine's
sessions — the third leg of the skew strategy (salting and the sentinel
bypass are operator-level and already pinned by test_skew_bucketing;
AQE is the zero-code path the scale rules lean on)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_aqe_splits_skewed_join_partition(spark):
    """A 1-hot-key join under AQE with test-sized thresholds must mark
    the skewed side in the final adaptive plan (skew=true), i.e. the
    hot partition was split at runtime rather than hogging one task."""
    confs = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "65536",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32768",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force SMJ
        "spark.sql.shuffle.partitions": "8",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        # left: 200k rows, 95% on key 0 (hot), padded to make bytes count
        left = (
            spark.range(200_000)
            .select(
                F.when(F.col("id") % 20 != 0, F.lit(0))
                .otherwise(F.col("id"))
                .alias("k"),
                F.concat(F.lit("x" * 64), F.col("id").cast("string")).alias(
                    "pad"
                ),
            )
        )
        right = spark.range(2_000).select(
            F.col("id").alias("k"), F.col("id").alias("v")
        )
        joined = left.join(right, "k")
        # collect() executes THIS Dataset's own QueryExecution (count()
        # would build a separate one and leave this plan un-finalized)
        assert len(joined.collect()) > 0
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, f"AQE did not split the hot key:\n{plan[:2000]}"
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
