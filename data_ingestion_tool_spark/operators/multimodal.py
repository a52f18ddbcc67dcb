"""Multimodal columns: opaque binary payloads + typed metadata.

North-star extension (BASELINE.json). The design: image/audio/video
payloads live in a ``binary`` column beside typed metadata columns;
decode / feature-extract / resize / frame-sample run as Arrow-batched
Pandas functions over ``mapInPandas`` so each task processes a batch of
payloads without ever collecting to the driver.

The container has no image/audio codecs, so the decode step is STUBBED:
:func:`extract_binary_metadata` computes real, deterministic metadata
(byte length, sha256) via the same mapInPandas plumbing a real decoder
would use, and :func:`decode_image_stub` raises ``NotImplementedError``
exactly where a codec (PIL/ffmpeg) would plug in. The Spark-side
plumbing — schema, batch shape, partitioning — is real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def with_binary_payload(df: DataFrame, src_col: str, out_col: str = "payload") -> DataFrame:
    """Pack a column into the opaque binary payload column (here from
    text; in production from raw image/audio bytes at ingest)."""
    return df.withColumn(out_col, F.encode(F.col(src_col), "UTF-8"))


METADATA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("byte_len", T.LongType()),
        T.StructField("sha256_hex", T.StringType()),
    ]
)


def extract_binary_metadata(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Typed metadata per payload via mapInPandas (Arrow batches).

    This is the exact execution shape a real decoder uses: per-task
    iterator of pandas batches in, schema-declared batches out, nothing
    on the driver. sha256/length stand in for width/height/duration.
    """

    def meta_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_col]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "byte_len": payloads.map(len).astype("int64"),
                    "sha256_hex": payloads.map(
                        lambda b: hashlib.sha256(bytes(b)).hexdigest()
                    ),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(meta_batches, METADATA_SCHEMA)


def decode_image_stub(
    df: DataFrame, payload_col: str = "payload"
) -> DataFrame:
    """Where PIL/libjpeg would decode payload → (height, width, pixels).

    STUB: no image codecs in this environment. The mapInPandas
    signature/schema below is the production contract.
    """
    raise NotImplementedError(
        "image decode requires a codec library (e.g. PIL); not available "
        "in this environment. Use extract_binary_metadata for the "
        "codec-free metadata path."
    )


def frame_sample_stub(
    df: DataFrame, payload_col: str = "payload", every_n: int = 30
) -> DataFrame:
    """Video frame sampling stub — same contract as decode_image_stub."""
    raise NotImplementedError(
        "video frame sampling requires ffmpeg bindings; not available in "
        "this environment."
    )
