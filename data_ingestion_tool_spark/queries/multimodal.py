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
