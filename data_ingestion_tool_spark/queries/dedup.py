"""Deduplication queries over ``documents`` (north-star)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedup as DD
from ..sources.parquet_io import read_table
from .registry import query


@query(
    "dedup_exact_docs",
    oracle="""
    SELECT md5(lower(trim(text))) AS content_hash,
           MIN(doc_id) AS keeper_id,
           CAST(COUNT(*) AS BIGINT) AS n_copies
    FROM documents GROUP BY md5(lower(trim(text)))
    """,
)
def dedup_exact_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact content dedup: min-id representative per fingerprint. The
    shuffle carries (digest, id) pairs only."""
    return DD.exact_dedup_by_content(read_table(spark, sf_dir, "documents"))


@query("dedup_near_minhash")  # rows-only: LSH candidate generation
def dedup_near_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+banded-LSH near-dup pairs (jaccard-sim estimate >= 0.5),
    deterministic under the fixed seed."""
    d = read_table(spark, sf_dir, "documents")
    return DD.minhash_near_dup_pairs(d, jaccard_threshold=0.5).orderBy(
        "id_a", "id_b"
    )


@query("dedup_simhash")  # rows-only
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs (hamming <= 3 over 64-bit fingerprints)."""
    d = read_table(spark, sf_dir, "documents")
    return DD.simhash_near_dup_pairs(d, max_hamming=3).orderBy("id_a", "id_b")


@query("dedup_ngram_jaccard")  # rows-only
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard >= 0.8 over LSH-pruned candidate pairs."""
    d = read_table(spark, sf_dir, "documents")
    return DD.ngram_jaccard_pairs(d, threshold=0.8).orderBy("id_a", "id_b")


@query("dedup_resolve_clusters")  # rows-only: iterative, not SQL-expressible
def dedup_resolve_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end dedup resolution: minhash near-dup pairs → connected
    components (iterative hash-min) → one keeper per cluster. The
    non-SQL-expressible iterative operator class; correctness is
    unit-tested on known graphs (tests/test_graph.py)."""
    from ..operators.dedup import minhash_near_dup_pairs
    from ..operators.graph import dedup_clusters

    d = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    pairs = minhash_near_dup_pairs(d, jaccard_threshold=0.5)
    out = dedup_clusters(pairs, d, "doc_id")
    return out.groupBy("cluster_size").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.min("keeper_id").alias("min_keeper"),
    )
