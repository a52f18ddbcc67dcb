"""Multimodal-column queries (north-star).

The payload here is text bytes (no codecs in the container) but the
execution shape — binary column + mapInPandas metadata extraction — is
exactly the production image/audio path (see operators.multimodal).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window

from ..operators.multimodal import extract_binary_metadata, with_binary_payload
from ..sources.parquet_io import read_table
from .registry import query


@query(
    "multimodal_binary_meta",
    oracle="""
    SELECT doc_id,
           CAST(strlen(text) AS BIGINT) AS byte_len,
           sha256(text) AS sha256_hex
    FROM documents
    """,
)
def multimodal_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """binary payload column → Arrow-batched mapInPandas metadata
    extraction (byte length + sha256, standing in for width/height/
    duration). Hash-checked against DuckDB's sha256 over the same
    bytes — the Pandas-UDF plumbing must produce bit-identical output."""
    d = read_table(spark, sf_dir, "documents")
    return extract_binary_metadata(with_binary_payload(d, "text"))


@query("multimodal_decode_resize")  # rows-only: fake-decoder features
def multimodal_decode_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """decode (deterministic fake codec behind the production seam) →
    resize planning as pure column math. One mapInPandas pass, then
    codegen'd arithmetic."""
    from ..operators.multimodal import decode_images, resize_plan

    d = read_table(spark, sf_dir, "documents")
    decoded = decode_images(with_binary_payload(d, "text"))
    return resize_plan(decoded, max_side=64)


@query("multimodal_frame_sample")  # rows-only: executor-side fan-out
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-style frame sampling: each payload fans out to its sampled
    frames inside the executor (mapInPandas emits more rows than it
    gets — no shuffle), then a per-document frame count."""
    from pyspark.sql import functions as F

    from ..operators.multimodal import sample_frames

    d = read_table(spark, sf_dir, "documents")
    frames = sample_frames(with_binary_payload(d, "text"), every_n=2)
    return frames.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_sampled_frames"),
        F.min("frame_sha").alias("first_sha"),
    )


@query("multimodal_audio_features")  # executor-side fan-out: rows-only
def multimodal_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-style feature extraction over binary payloads treated as
    int8 PCM (no codec needed — the bytes are the samples): windowed
    RMS + zero-crossing rate executor-side, then a per-document
    profile. Accuracy vs a pure-Python reference is unit-tested
    (tests/test_multimodal.py)."""
    from pyspark.sql import functions as F

    from ..operators.multimodal import audio_window_features

    d = read_table(spark, sf_dir, "documents")
    feats = audio_window_features(with_binary_payload(d, "text"))
    return feats.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_windows"),
        F.round(F.avg("rms"), 6).alias("mean_rms"),
        F.round(F.avg("zcr"), 6).alias("mean_zcr"),
    )


@query(
    "multimodal_dedup_binary",
    oracle="""
    WITH h AS (
      SELECT doc_id, source, sha256(text) AS payload_hash,
             CAST(strlen(text) AS BIGINT) AS byte_len
      FROM documents
    ),
    ranked AS (
      SELECT doc_id, source, payload_hash, byte_len,
             row_number() OVER (
               PARTITION BY payload_hash ORDER BY doc_id
             ) AS rn,
             CAST(COUNT(*) OVER (PARTITION BY payload_hash) AS BIGINT)
               AS n_copies
      FROM h
    )
    SELECT doc_id, source, byte_len, n_copies
    FROM ranked WHERE rn = 1
    """,
)
def multimodal_dedup_binary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup of BINARY payloads by content digest — the first
    pass of any image/audio corpus dedup (byte-identical copies from
    re-crawls/mirrors), keeping the lowest doc_id per digest with the
    copy count. The digest is computed executor-side over the binary
    column (mapInPandas plumbing shared with multimodal_binary_meta);
    only (digest, id) pairs ever shuffle — payload bytes stay put, the
    property that makes this affordable on a 100 TB media lake.
    """
    from pyspark.sql import functions as F

    d = read_table(spark, sf_dir, "documents")
    h = extract_binary_metadata(with_binary_payload(d, "text")).select(
        "doc_id", F.col("sha256_hex").alias("payload_hash"), "byte_len"
    )
    src = read_table(spark, sf_dir, "documents").select("doc_id", "source")
    h = h.join(src, "doc_id")
    w = Window.partitionBy("payload_hash").orderBy("doc_id")
    ranked = h.withColumn("rn", F.row_number().over(w)).withColumn(
        "n_copies",
        F.count(F.lit(1)).over(Window.partitionBy("payload_hash")).cast("bigint"),
    )
    return ranked.where(F.col("rn") == 1).select(
        "doc_id", "source", "byte_len", "n_copies"
    )
