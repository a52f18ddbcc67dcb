"""Cluster-safe pinning (plans/pin.py, round-7 verdict item 3).

Pins the two contracts the multi-consumer pipelines rely on:
1. a pinned frame is MATERIALIZED ONCE — the second consumer reads the
   stored blocks, never recomputes the lineage (accumulator proof);
2. with a checkpoint dir configured (the cluster-deploy signal), pin()
   switches to a RELIABLE DataFrame.checkpoint whose blocks live in
   fault-tolerant storage (files visible under the dir), so an
   executor loss recomputes nothing and kills nothing.

Ordering note: the reliable test SETS the shared context's checkpoint
dir (Spark has no unset); it runs last in this file and pins the
session conf to mode=local afterwards so every later test keeps the
pre-round-7 local behavior.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from data_ingestion_tool_spark.plans.pin import PIN_MODE_CONF, pin


def _counting_frame(spark, acc):
    """A frame whose materialization increments ``acc`` once per row."""
    df = spark.range(0, 100, 1, 4)

    def count_rows(batches):
        for pdf in batches:
            acc.add(len(pdf))
            yield pdf

    return df.mapInPandas(count_rows, "id long")


def test_pin_reliable_requires_dir(spark):
    if spark.sparkContext.getCheckpointDir() is not None:
        pytest.skip("checkpoint dir already set by a later-ordered test")
    with pytest.raises(ValueError, match="reliable"):
        pin(spark.range(1), mode="reliable")


def test_pin_rejects_unknown_mode(spark):
    with pytest.raises(ValueError, match="pin.mode"):
        pin(spark.range(1), mode="banana")


def test_pinned_frame_materializes_once(spark):
    acc = spark.sparkContext.accumulator(0)
    pinned = pin(_counting_frame(spark, acc))
    assert pinned.count() == 100
    first = acc.value
    assert first == 100
    # Second consumer: groupBy over the SAME pinned frame — must read
    # stored blocks, not re-run the mapInPandas lineage.
    assert pinned.groupBy((F.col("id") % 2).alias("p")).count().count() == 2
    assert acc.value == first, "pinned frame was recomputed"


def test_unpinned_lineage_recomputes(spark):
    # Control: without pin() the same two actions run the pass twice,
    # proving the accumulator actually observes recomputation.
    acc = spark.sparkContext.accumulator(0)
    df = _counting_frame(spark, acc)
    df.count()
    df.count()
    assert acc.value == 200


def test_pin_reliable_writes_checkpoint_files(spark, tmp_path):
    ckdir = str(tmp_path / "ck")
    # setCheckpointDir cannot be unset, so lock the SESSION to the
    # local pin path BEFORE setting the dir: whatever order the other
    # tests run in, they never observe mode=auto resolving to reliable.
    # Reliable behavior is exercised via explicit mode= overrides
    # scoped to this test.
    spark.conf.set(PIN_MODE_CONF, "local")
    spark.sparkContext.setCheckpointDir(ckdir)
    acc = spark.sparkContext.accumulator(0)
    pinned = pin(_counting_frame(spark, acc), eager=True, mode="reliable")
    files = [
        os.path.join(r, f)
        for r, _, fs in os.walk(ckdir)
        for f in fs
    ]
    assert files, "reliable pin wrote no checkpoint files"
    assert pinned.count() == 100
    assert acc.value == 100  # eager materialization, single pass
    # auto mode resolves to reliable iff a dir is set; flip the conf
    # only inside this try and restore it even if the assert fails.
    try:
        spark.conf.set(PIN_MODE_CONF, "auto")
        pinned2 = pin(spark.range(5), eager=True)
        assert pinned2.count() == 5
    finally:
        spark.conf.set(PIN_MODE_CONF, "local")
