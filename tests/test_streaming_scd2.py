"""SCD2 CDC merge is order-insensitive across micro-batches.

Round-10 advice flagged that `stream_cdc_scd2_apply` pinned micro-batch
order by file mtime and the merge silently produced wrong intervals if
updates ever arrived before inserts. The merge now refolds each touched
key's change history by eff_ts, so ANY arrival order yields the batch
SCD2 construction. These tests deliver the same change feed in forward,
reversed, and interleaved-late order and require identical tables.
"""

from __future__ import annotations

import datetime as dt
import os
import time

from pyspark.sql import functions as F

from data_ingestion_tool_spark.streaming.ingest import stream_cdc_scd2_txnlog

SCHEMA = "k bigint, status string, eff_ts date"


def _d(day: int) -> dt.date:
    return dt.date(2024, 1, day)


def _feed(spark, tmp_path, name, batches):
    """Write one parquet file per batch with strictly increasing mtimes
    in the GIVEN order, so FileStreamSource delivers them in that order."""
    src = str(tmp_path / name / "src")
    now = time.time()
    for i, rows in enumerate(batches):
        d = os.path.join(src, f"b{i}")
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(d)
        ts = now - 3600 + i * 60
        for root, _, files in os.walk(d):
            for f in files:
                os.utime(os.path.join(root, f), (ts, ts))
    return src


def _run(spark, tmp_path, name, batches):
    src = _feed(spark, tmp_path, name, batches)
    t = stream_cdc_scd2_txnlog(
        spark, src, SCHEMA, str(tmp_path / name / "table")
    )
    return sorted(
        (r.k, r.status, r.valid_from, r.valid_to)
        for r in t.snapshot_mor("k").collect()
    )


CHANGES = [
    (1, "A", _d(1)),
    (1, "B", _d(5)),
    (1, "C", _d(9)),
    (2, "A", _d(2)),
    (2, "B", _d(7)),
    (3, "A", _d(3)),
]

EXPECTED = sorted(
    [
        (1, "A", _d(1), _d(5)),
        (1, "B", _d(5), _d(9)),
        (1, "C", _d(9), None),
        (2, "A", _d(2), _d(7)),
        (2, "B", _d(7), None),
        (3, "A", _d(3), None),
    ]
)


def test_forward_order(spark, tmp_path):
    batches = [CHANGES[:3], CHANGES[3:]]
    assert _run(spark, tmp_path, "fwd", batches) == EXPECTED


def test_reversed_order_updates_before_inserts(spark, tmp_path):
    # updates (later eff_ts) arrive in the FIRST batch, inserts last —
    # the exact failure mode the round-10 advice described
    upd = [c for c in CHANGES if c[1] != "A"]
    ins = [c for c in CHANGES if c[1] == "A"]
    assert _run(spark, tmp_path, "rev", [upd, ins]) == EXPECTED


def test_late_middle_change_splices_into_history(spark, tmp_path):
    # key 1's middle change ('B', day 5) arrives LAST, after the table
    # already holds A(1)->C(9): the refold must splice it in, closing A
    # at day 5 and B at day 9 rather than appending B as the open row
    first = [c for c in CHANGES if c != (1, "B", _d(5))]
    late = [(1, "B", _d(5))]
    assert _run(spark, tmp_path, "late", [first, late]) == EXPECTED


def test_one_batch_per_change_any_order(spark, tmp_path):
    import random

    rng = random.Random(11)
    shuffled = list(CHANGES)
    rng.shuffle(shuffled)
    batches = [[c] for c in shuffled]
    assert _run(spark, tmp_path, "shuf", batches) == EXPECTED


def test_small_batches_take_mor_path_and_merge_correctly(spark, tmp_path):
    """Round-12 adaptive CoW/MoR: a batch much smaller than the table
    must take the merge-on-read branch (equality tombstones + touched-
    keys-only append, NO table rewrite), and duplicate re-delivery of
    the same change in a later batch must stay idempotent."""
    from data_ingestion_tool_spark.sources.txnlog import TxnLogTable

    # batch 0: 40 keys (the bulk load); batches 1-2: one-key updates
    bulk = [(k, "A", _d(1)) for k in range(1, 41)]
    upd1 = [(1, "B", _d(5))]
    dup = [(1, "B", _d(5)), (2, "B", _d(6))]  # re-delivers (1,B,d5)
    src = _feed(spark, tmp_path, "mor", [bulk, upd1, dup])
    t = stream_cdc_scd2_txnlog(
        spark, src, SCHEMA, str(tmp_path / "mor" / "table")
    )
    # MoR evidence: tombstone batches live, no overwrite wiped them
    assert t._live_with_versions(None, "add_deletes"), (
        "small batches should tombstone, not rewrite the table"
    )
    # crash-atomicity invariant (round-13): every entry that carries a
    # tombstone ALSO carries its refolded append and the src_batch
    # idempotency meta — a tombstone can never exist without the append
    # it belongs to, so a driver crash cannot hide keys a replay then
    # fails to rebuild
    for v in t.versions():
        e = t._entry(v)
        if e.get("add_deletes"):
            assert e.get("add"), f"orphanable tombstone at v{v}: {e}"
            assert "src_batch" in e.get("meta", {}), (
                f"tombstone entry without idempotency meta at v{v}: {e}"
            )
    rows = sorted(
        (r.k, r.status, r.valid_from, r.valid_to)
        for r in t.snapshot_mor("k").collect()
    )
    expected = sorted(
        [(1, "A", _d(1), _d(5)), (1, "B", _d(5), None),
         (2, "A", _d(1), _d(6)), (2, "B", _d(6), None)]
        + [(k, "A", _d(1), None) for k in range(3, 41)]
    )
    assert rows == expected
    # compaction folds tombstones in and snapshot() then agrees
    TxnLogTable(spark, str(tmp_path / "mor" / "table")).commit(
        t.snapshot_mor("k"), mode="overwrite"
    )
    assert sorted(
        (r.k, r.status, r.valid_from, r.valid_to)
        for r in t.snapshot().collect()
    ) == expected
