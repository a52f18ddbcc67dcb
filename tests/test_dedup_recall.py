"""Planted near-duplicate recall: mutate real documents slightly, then
require the LSH pipelines to find the planted pairs. Catches silent
recall collapse (bad banding, broken signatures) that rows-only driver
checks can't see."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_ingestion_tool_spark.operators.dedup import (
    minhash_near_dup_pairs,
    simhash_near_dup_pairs,
)
from data_ingestion_tool_spark.operators.similarity import (
    embedding_near_dup_pairs,
)
from data_ingestion_tool_spark.sources.parquet_io import read_table


@pytest.fixture(scope="module")
def planted(spark, sf_dir):
    """50 docs + a near-dup clone of each (one word appended): clone id
    = original id + 10_000."""
    d = (
        read_table(spark, sf_dir, "documents")
        .filter(F.length("text") > 100)
        .limit(50)
        .select("doc_id", "text")
        .cache()
    )
    clones = d.select(
        (F.col("doc_id") + 10_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" extraword")).alias("text"),
    )
    return d.unionByName(clones), {r.doc_id for r in d.collect()}


def test_minhash_recall_on_planted_pairs(planted):
    docs, orig_ids = planted
    pairs = {
        (r.id_a, r.id_b)
        for r in minhash_near_dup_pairs(docs, jaccard_threshold=0.5).collect()
    }
    found = sum((i, i + 10_000) in pairs for i in orig_ids)
    assert found / len(orig_ids) >= 0.9, f"minhash recall {found}/{len(orig_ids)}"


def test_simhash_recall_on_planted_pairs(spark, sf_dir):
    """SimHash hamming shift scales with the RELATIVE feature change, so
    plant the one-word mutation in long documents (>300 chars ≈ 60+
    shingles → few bits flip). Short docs legitimately spread to
    hamming 5-12 — that's the fingerprint working, not a bug."""
    d = (
        read_table(spark, sf_dir, "documents")
        .filter(F.col("n_chars") > 300)
        .limit(50)
        .select("doc_id", "text")
        .cache()
    )
    clones = d.select(
        (F.col("doc_id") + 10_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" extraword")).alias("text"),
    )
    orig_ids = {r.doc_id for r in d.collect()}
    pairs = {
        (r.id_a, r.id_b)
        for r in simhash_near_dup_pairs(d.unionByName(clones), max_hamming=3).collect()
    }
    found = sum((i, i + 10_000) in pairs for i in orig_ids)
    assert found / len(orig_ids) >= 0.7, f"simhash recall {found}/{len(orig_ids)}"


def test_minhash_estimates_track_exact_jaccard(spark, sf_dir):
    """Precision: every pair MinHash reports at threshold 0.8 must have
    a high EXACT shingle Jaccard too (the test corpus contains genuine
    generator-planted near-dups, so asserting zero pairs would be
    wrong — asserting estimate quality is the real property)."""
    from data_ingestion_tool_spark.operators.dedup import (
        hashed_shingles,
        ngram_jaccard_pairs,
    )

    d = (
        read_table(spark, sf_dir, "documents")
        .filter(F.length("text") > 100)
        .limit(100)
        .select("doc_id", "text")
    )
    est = {
        (r.id_a, r.id_b): r.jaccard_sim
        for r in minhash_near_dup_pairs(d, jaccard_threshold=0.8).collect()
    }
    exact = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(d, threshold=0.0).collect()
    }
    assert est, "corpus should contain generator-planted near-dups"
    for pair, e in est.items():
        assert exact.get(pair, 0.0) >= 0.55, (pair, e, exact.get(pair))


def test_embedding_near_dup_planted(spark, sf_dir):
    """Perturb embeddings by ~1%: every (orig, clone) pair must clear a
    0.99-cosine threshold via the LSH-bucketed self-join."""
    e = read_table(spark, sf_dir, "embeddings").limit(30).select(
        "vec_id", "embedding"
    )
    clones = e.select(
        (F.col("vec_id") + 10_000).alias("vec_id"),
        F.transform("embedding", lambda x: x * 1.01).alias("embedding"),
    )
    both = e.unionByName(clones)
    pairs = {
        (r.id_a, r.id_b)
        for r in embedding_near_dup_pairs(both, threshold=0.99).collect()
    }
    orig = {r.vec_id for r in e.collect()}
    found = sum((i, i + 10_000) in pairs for i in orig)
    # scaling a vector doesn't change cosine; LSH bucketing must not
    # lose identical-direction pairs
    assert found / len(orig) >= 0.95, f"embedding recall {found}/{len(orig)}"


def test_minhash_candidates_scale_linearly(spark, sf_dir):
    """The scale property behind the LSH design: growing the corpus n×
    with DISTINCT content must grow the banded self-join's candidate
    set ~n×, never ~n² (all-pairs would be 16× here). Distinctness
    matters — cloned text would plant quadratic duplicate clusters and
    measure the data, not the algorithm."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    from soak_dedup import scaled_documents

    from data_ingestion_tool_spark.operators.dedup import minhash_near_dup_pairs

    def candidates(mult: int) -> int:
        docs = scaled_documents(spark, sf_dir, mult)
        return minhash_near_dup_pairs(docs, jaccard_threshold=0.0).count()

    c1, c4 = candidates(1), candidates(4)
    assert c1 > 0
    # linear growth with slack; quadratic would be ~16x
    assert c4 <= 4 * c1 * 1.8, f"candidates superlinear: {c1} -> {c4}"
    assert c4 >= 2 * c1  # the corpus really did grow


def test_simhash_schemes_agree_and_pairs_prune(spark, sf_dir):
    """chunk_pairs must return EXACTLY the same verified pairs as the
    4x16 scheme (both pigeonhole-exact for hamming<=3) while generating
    strictly fewer chance candidates."""
    from data_ingestion_tool_spark.operators.dedup import simhash_near_dup_pairs

    d = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    p4 = {
        (r.id_a, r.id_b)
        for r in simhash_near_dup_pairs(d, scheme="chunks").collect()
    }
    p6 = {
        (r.id_a, r.id_b)
        for r in simhash_near_dup_pairs(d, scheme="chunk_pairs").collect()
    }
    p20 = {
        (r.id_a, r.id_b)
        for r in simhash_near_dup_pairs(d, scheme="chunk_triples").collect()
    }
    assert p4 == p6 == p20 and len(p4) > 0
    # candidate volume: max_hamming=64 disables the verify filter, so
    # the counts expose raw candidate sets
    c4 = simhash_near_dup_pairs(d, max_hamming=64, scheme="chunks", allow_recall_loss=True).count()
    c6 = simhash_near_dup_pairs(d, max_hamming=64, scheme="chunk_pairs", allow_recall_loss=True).count()
    c20 = simhash_near_dup_pairs(d, max_hamming=64, scheme="chunk_triples", allow_recall_loss=True).count()
    assert c20 <= c6 <= c4


def test_simhash_rejects_bound_beyond_pigeonhole_guarantee(spark):
    """max_hamming past the scheme's recall guarantee (chunks<=3,
    chunk_pairs<=4) must raise unless recall loss is explicitly
    accepted — silent incomplete results are worse than an error."""
    import pytest

    from data_ingestion_tool_spark.operators.dedup import simhash_near_dup_pairs

    d = spark.createDataFrame([(1, "a b c"), (2, "a b d")], "doc_id long, text string")
    with pytest.raises(ValueError, match="pigeonhole"):
        simhash_near_dup_pairs(d, max_hamming=4, scheme="chunks")
    with pytest.raises(ValueError, match="pigeonhole"):
        simhash_near_dup_pairs(d, max_hamming=5, scheme="chunk_pairs")
    with pytest.raises(ValueError, match="pigeonhole"):
        simhash_near_dup_pairs(d, max_hamming=4, scheme="chunk_triples")
    # within guarantee: fine
    simhash_near_dup_pairs(d, max_hamming=4, scheme="chunk_pairs")
    simhash_near_dup_pairs(d, max_hamming=3, scheme="chunk_triples")
    # explicit opt-out: fine
    simhash_near_dup_pairs(d, max_hamming=6, scheme="chunks", allow_recall_loss=True)


def test_embedding_near_dup_int_planted(spark, sf_dir):
    """The cross-engine exact-integer SRP path (round-8 promotion) must
    keep the same recall property as the gaussian float path: scaled
    clones share every bucket bit with their originals (identical
    direction → identical int-dot signs), so no planted pair is lost.
    Threshold 0.98 = 49/50 (integer cross-multiplication form)."""
    from data_ingestion_tool_spark.operators.similarity import (
        embedding_near_dup_pairs_int,
    )

    e = read_table(spark, sf_dir, "embeddings").limit(30).select(
        "vec_id", "embedding"
    )
    clones = e.select(
        (F.col("vec_id") + 10_000).alias("vec_id"),
        F.transform("embedding", lambda x: x * 1.01).alias("embedding"),
    )
    both = e.unionByName(clones)
    pairs = {
        (r.id_a, r.id_b)
        for r in embedding_near_dup_pairs_int(
            both, threshold_num=49, threshold_den=50
        ).collect()
    }
    orig = {r.vec_id for r in e.collect()}
    found = sum((i, i + 10_000) in pairs for i in orig)
    # quantization perturbs direction by <=1e-6 per component — far
    # inside the 0.98 threshold for a 1.01-scaled clone
    assert found / len(orig) >= 0.95, f"int-SRP recall {found}/{len(orig)}"
