"""Multimodal-column queries (north-star).

The payload here is text bytes (no codecs in the container) but the
execution shape — binary column + mapInPandas metadata extraction — is
exactly the production image/audio path (see operators.multimodal).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

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
