"""Partition evolution on the txn-log table format: each batch keeps
its own physical partition spec (recorded in the commit entry), and a
filtered read prunes every spec group at its own granularity — year
directories in the year-partitioned batch, year+month directories in
the evolved batch.  Pins both the row-level semantics and the plan
shape (two scans, each with its own PartitionFilters)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_ingestion_tool_spark.sources.txnlog import TxnLogTable


def _mk(spark, tmp_path):
    rows = [
        (k, 1995 + k % 3, 1 + k % 12, k * 10)
        for k in range(200)
    ]
    df = spark.createDataFrame(
        rows, "k bigint, o_year int, o_month int, cents bigint"
    )
    t = TxnLogTable(spark, str(tmp_path / "tevo"))
    t.commit(df.where(F.col("k") % 2 == 0), partition_by=["o_year"])
    t.commit(
        df.where(F.col("k") % 2 == 1), partition_by=["o_year", "o_month"]
    )
    return t, df


def test_evolved_snapshot_row_parity(spark, tmp_path):
    t, df = _mk(spark, tmp_path)
    snap = t.snapshot_evolved()
    cond = (F.col("o_year") == 1996) & (F.col("o_month") <= 3)
    got = sorted(
        (r.k, r.o_year, r.o_month, r.cents)
        for r in snap.where(cond).collect()
    )
    want = sorted(
        (r.k, r.o_year, r.o_month, r.cents)
        for r in df.where(cond).collect()
    )
    assert got == want and len(got) > 0


def test_each_spec_group_prunes_at_its_own_granularity(spark, tmp_path):
    t, _ = _mk(spark, tmp_path)
    snap = t.snapshot_evolved()
    cond = (F.col("o_year") == 1996) & (F.col("o_month") <= 3)
    plan = (
        snap.where(cond)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    pf = []
    for line in plan.splitlines():
        if "PartitionFilters: [" not in line:
            continue
        frag = line.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
        if "o_year" in frag:
            pf.append(frag)
    # two scans, each with partition filters on its own spec
    assert len(pf) == 2, plan
    month_pruned = [frag for frag in pf if "o_month" in frag]
    year_only = [frag for frag in pf if "o_month" not in frag]
    assert len(month_pruned) == 1, pf
    assert len(year_only) == 1, pf

    # spec recorded in the log entries
    specs = {tuple(t._entry(v).get("spec", ())) for v in t.versions()}
    assert specs == {("o_year",), ("o_year", "o_month")}

def test_evolved_snapshot_validates_version_and_mor_deletes(
    spark, tmp_path
):
    import pytest

    t, df = _mk(spark, tmp_path)
    with pytest.raises(ValueError, match="unknown version"):
        t.snapshot_evolved(version=99)

    # MoR tombstone: delete k in {0, 3}; reading without key_col must
    # refuse (silent resurrection was the round-10 advice bug), and
    # with key_col the tombstones apply sequence-aware.
    t.commit_deletes(
        spark.createDataFrame([(0,), (3,)], "k bigint").select("k")
    )
    with pytest.raises(ValueError, match="MoR delete"):
        t.snapshot_evolved()
    snap = t.snapshot_evolved(key_col="k")
    ks = {r.k for r in snap.select("k").collect()}
    assert 0 not in ks and 3 not in ks
    assert len(ks) == 198

    # a key re-inserted AFTER its deletion survives (sequence-aware)
    t.commit(
        df.where(F.col("k") == 0), partition_by=["o_year", "o_month"]
    )
    ks2 = {r.k for r in t.snapshot_evolved(key_col="k").select("k").collect()}
    assert 0 in ks2 and 3 not in ks2
