"""Streaming ingest: readStream → foreachBatch → table.

The streaming half of the reference's ingest surface ("batch or
streaming loads", BASELINE.json): a file/Kafka stream lands in a
Parquet table through ``foreachBatch``, which hands each micro-batch to
the same batch writer the batch path uses — one code path for both
load modes, exactly-once per micro-batch via the checkpoint (a replayed
batch id overwrites instead of double-appending... for parquet sinks
Spark's foreachBatch replays are at-least-once; idempotence here comes
from the batch-id guard pattern below).

At scale: each micro-batch write is a normal distributed parquet write
(per-partition task files); backpressure comes from
``maxFilesPerTrigger`` / source rate limits; the checkpoint directory
is the restart token.
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def stream_ingest_parquet(
    spark: SparkSession,
    source_path: str,
    schema,
    dest_path: str,
    transform=None,
    max_files_per_trigger: int | None = None,
) -> list[int]:
    """Ingest a (finite) parquet file stream into ``dest_path``.

    Returns the list of micro-batch ids processed. ``transform`` maps
    each streaming DataFrame before the write (projection/cleansing —
    the streaming twin of ingest-time column mapping).
    """
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    if os.path.isfile(source_path):
        reader = reader.option("pathGlobFilter", os.path.basename(source_path))
        source_path = os.path.dirname(source_path)
    stream = reader.parquet(source_path)
    if transform is not None:
        stream = transform(stream)

    seen: list[int] = []

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        # batch-id guard: a replayed id must not double-append. Parquet
        # has no atomic MERGE, so partition the output by batch id and
        # overwrite just that partition — replay-idempotent.
        seen.append(batch_id)
        (
            batch_df.withColumn("_ingest_batch", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_ingest_batch")
            .parquet(dest_path)
        )

    ckpt = os.path.join(
        tempfile.gettempdir(), "spark-graft-ckpt", f"ingest-{uuid.uuid4().hex}"
    )
    q = (
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return seen


def stream_ingest_txnlog(
    spark: SparkSession,
    source_path: str,
    schema,
    table_root: str,
    transform=None,
    max_files_per_trigger: int = 1,
    checkpoint: str | None = None,
):
    """Stream a (finite) parquet source into a transaction-log table,
    EXACTLY-ONCE: each micro-batch commits as one table version tagged
    ``meta={"src_batch": id}``, and a replayed batch id is detected by
    scanning the log (``has_meta``) and skipped — the put-if-absent
    idempotence pattern Delta's ``txnAppId/txnVersion`` implements.
    Returns the TxnLogTable.

    ``checkpoint`` pins the checkpoint location so a killed run can be
    RESUMED (the restart token); default is a fresh temp dir per call
    (one-shot ingest). tests/test_streaming_restart.py proves both the
    offset-log resume and the has_meta replay guard across restarts.

    At scale the log scan is kilobytes of driver-side JSON per commit;
    each batch write is a normal distributed parquet write."""
    from ..sources.txnlog import TxnLogTable

    t = TxnLogTable(spark, table_root)
    reader = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", max_files_per_trigger
    )
    stream = reader.parquet(source_path)
    if transform is not None:
        stream = transform(stream)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        if t.has_meta("src_batch", batch_id):
            return  # replayed micro-batch: already committed
        t.commit(batch_df, meta={"src_batch": batch_id})

    ckpt = checkpoint or os.path.join(
        tempfile.gettempdir(), "spark-graft-ckpt", f"txn-{uuid.uuid4().hex}"
    )
    q = (
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return t


def stream_cdc_scd2_txnlog(
    spark: SparkSession,
    source_path: str,
    schema,
    table_root: str,
    key_col: str = "k",
    status_col: str = "status",
    ts_col: str = "eff_ts",
    max_files_per_trigger: int = 1,
):
    """Stream a CDC change feed into an SCD TYPE-2 dimension on the
    transaction-log format: each micro-batch MERGES its changes into
    the current interval table (close the open row of every touched
    key at the change's effective timestamp, append the new open row)
    and commits the merged state as one overwrite version tagged with
    the micro-batch id — idempotent under foreachBatch replay via the
    same ``has_meta`` guard as :func:`stream_ingest_txnlog`.

    Within a batch, multiple changes to one key fold by effective-ts
    order (lead() closes each but the last).  The result is exactly the
    batch SCD2 construction over the full feed — provided the feed
    delivers each key's changes in non-decreasing ts order across
    batches (the CDC contract; out-of-order arrivals belong to the
    asof/watermark family, not SCD2 merge).

    Scale: the merge is one join of current-state against the batch's
    key set plus a union — on a partitioned production table this
    rewrites only matched partitions (Delta MERGE semantics); the
    overwrite commit here is the small-dimension case where full
    rewrite IS the partition."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ..sources.txnlog import TxnLogTable

    t = TxnLogTable(spark, table_root)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("recursiveFileLookup", "true")
        .parquet(source_path)
    )

    out_cols = [key_col, status_col, "valid_from", "valid_to"]

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        if t.has_meta("src_batch", batch_id):
            return  # replayed micro-batch: already merged
        w = Window.partitionBy(key_col).orderBy(ts_col)
        incoming = (
            batch_df.withColumn(
                "valid_to", F.lead(ts_col).over(w)
            )
            .select(
                key_col,
                status_col,
                F.col(ts_col).alias("valid_from"),
                "valid_to",
            )
        )
        first_change = batch_df.groupBy(key_col).agg(
            F.min(ts_col).alias("__first_ts")
        )
        if t.versions():
            cur = t.snapshot()
            untouched = cur.join(first_change, key_col, "left_anti")
            touched = cur.join(first_change, key_col).select(
                key_col,
                status_col,
                "valid_from",
                # only the OPEN row closes; closed history is immutable
                F.when(
                    F.col("valid_to").isNull(), F.col("__first_ts")
                ).otherwise(F.col("valid_to")).alias("valid_to"),
            )
            merged = untouched.select(out_cols).unionByName(
                touched.select(out_cols)
            ).unionByName(incoming.select(out_cols))
        else:
            merged = incoming.select(out_cols)
        t.commit(merged, mode="overwrite", meta={"src_batch": batch_id})

    ckpt = os.path.join(
        tempfile.gettempdir(), "spark-graft-ckpt", f"scd2-{uuid.uuid4().hex}"
    )
    q = (
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return t
