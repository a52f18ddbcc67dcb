"""Product-quantization ANN: recall vs brute force, determinism, and
compression shape. PQ is approximate, so its registry entry is
rows-only — these tests are its accuracy gate."""

from __future__ import annotations

import pytest

from data_ingestion_tool_spark.operators.similarity import (
    cosine_topk,
    pq_encode,
    pq_topk,
    pq_train,
)
from data_ingestion_tool_spark.sources.parquet_io import read_table


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return read_table(spark, sf_dir, "embeddings")


def test_pq_recall_vs_bruteforce(spark, emb):
    """ADC shortlist + exact re-rank (m=16, 32 codes, 8k shortlist)
    must hold recall@5 >= 0.7 against exact cosine on the 500-vector
    corpus (chance is 5/499 ~ 1%; measured 0.94)."""
    queries = emb.orderBy("vec_id").limit(10)
    exact = {
        (r.query_id, r.neighbor_id) for r in cosine_topk(emb, queries, k=5).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in pq_topk(emb, queries, k=5, m=16, n_codes=32, rerank=8).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.7, f"PQ recall@5 too low: {recall:.2f}"


def test_pq_pure_adc_orders_reasonably(spark, emb):
    """rerank=0 (pure ADC) still beats chance handily — the quantized
    scores alone order the corpus usefully."""
    queries = emb.orderBy("vec_id").limit(10)
    exact = {
        (r.query_id, r.neighbor_id) for r in cosine_topk(emb, queries, k=5).collect()
    }
    adc = pq_topk(emb, queries, k=5, m=16, n_codes=32, rerank=0)
    assert "approx_score" in adc.columns
    approx = {(r.query_id, r.neighbor_id) for r in adc.collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.3, f"pure-ADC recall@5 too low: {recall:.2f}"


def test_pq_deterministic(spark, emb):
    """Same input -> bit-identical codes and top-k across runs (stable
    seeding, stable tie-breaks — no RNG anywhere in train/encode)."""
    books1, _ = pq_train(emb, m=8, n_codes=16)
    books2, _ = pq_train(emb, m=8, n_codes=16)
    assert (books1 == books2).all()

    codes = lambda: {  # noqa: E731
        r.neighbor_id: tuple(r.codes) for r in pq_encode(emb, books1).collect()
    }
    assert codes() == codes()

    queries = emb.orderBy("vec_id").limit(5)
    run = lambda: sorted(  # noqa: E731
        (r.query_id, r.rank, r.neighbor_id, r.score)
        for r in pq_topk(emb, queries, k=5).collect()
    )
    assert run() == run()


def test_pq_codes_shape_and_range(spark, emb):
    """Every vector encodes to exactly m codes, each in [0, n_codes)."""
    books, dim = pq_train(emb, m=8, n_codes=16)
    assert books.shape == (8, 16, dim // 8)
    rows = pq_encode(emb, books).collect()
    assert len(rows) == emb.count()
    for r in rows[:50]:
        assert len(r.codes) == 8
        assert all(0 <= c < 16 for c in r.codes)


def test_pq_rejects_indivisible_dim(spark, emb):
    with pytest.raises(ValueError, match="not divisible"):
        pq_train(emb, m=7, n_codes=16)


def test_ivfpq_recall_vs_bruteforce(spark, emb):
    """Coarse routing (probe 4/16 cells) + PQ codes + exact re-rank
    must hold recall@5 >= 0.5 (chance ~1%; routing misses are the main
    loss vs pure PQ's 0.94)."""
    from data_ingestion_tool_spark.operators.similarity import ivfpq_topk

    queries = emb.orderBy("vec_id").limit(10)
    exact = {
        (r.query_id, r.neighbor_id) for r in cosine_topk(emb, queries, k=5).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in ivfpq_topk(
            emb, queries, k=5, n_centroids=16, n_probe=4, m=16, n_codes=32,
            rerank=8,
        ).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"IVFPQ recall@5 too low: {recall:.2f}"


def test_ivfpq_deterministic(spark, emb):
    from data_ingestion_tool_spark.operators.similarity import ivfpq_topk

    queries = emb.orderBy("vec_id").limit(5)
    run = lambda: sorted(  # noqa: E731
        (r.query_id, r.rank, r.neighbor_id, r.score)
        for r in ivfpq_topk(emb, queries, k=5).collect()
    )
    assert run() == run()


def test_hash_sampled_seeding_unbiased_on_clustered_corpus(spark):
    """Round-4 verdict item 3: on an id-SORTED clustered corpus (ids
    0-99 = cluster 0, 100-199 = cluster 1, ...) a head-of-table seed
    sample lands entirely in cluster 0, while the md5(id)-ordered
    sample now used by ivf_centroids/pq_train covers >= 3 of the 4
    clusters — and IVF recall on that corpus stays high."""
    import numpy as np
    from pyspark.sql import functions as F

    from data_ingestion_tool_spark.operators.similarity import (
        ivf_centroids,
        ivf_topk,
    )

    dim, per = 8, 100
    centers = np.zeros((4, dim))
    for c in range(4):
        centers[c, c] = 10.0  # well-separated orthogonal cluster centers
    rows = []
    for c in range(4):
        for i in range(per):
            v = centers[c].copy()
            # deterministic small within-cluster jitter (no RNG)
            v[(i * 3) % dim] += 0.01 * ((i % 7) - 3)
            rows.append((c * per + i, [float(x) for x in v]))
    corpus = spark.createDataFrame(rows, "vec_id: bigint, embedding: array<double>")

    def cluster_of(vec):
        return int(np.argmax(np.abs(np.array(vec))))

    # The OLD head-of-table sample: every seed sits in cluster 0.
    head = corpus.orderBy("vec_id").limit(4).collect()
    assert {cluster_of(r.embedding) for r in head} == {0}

    # The md5-ordered sample (what ivf_centroids/pq_train do now)
    # covers at least 3 distinct clusters.
    hashed = (
        corpus.orderBy(F.md5(F.col("vec_id").cast("string")), F.col("vec_id"))
        .limit(4)
        .collect()
    )
    assert len({cluster_of(r.embedding) for r in hashed}) >= 3

    # End-to-end: centroids land one-per-cluster and IVF recall with a
    # single probe is perfect on this corpus.
    cents = ivf_centroids(corpus, n_centroids=4, refine_iters=2)
    assert len({cluster_of(v) for _, v in cents}) == 4

    queries = corpus.where(F.col("vec_id").isin([0, 150, 250, 350]))
    exact = {
        (r.query_id, r.neighbor_id) for r in cosine_topk(corpus, queries, k=5).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in ivf_topk(corpus, queries, k=5, n_centroids=4, n_probe=1).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, f"IVF recall on clustered corpus: {recall:.2f}"


def test_ivf_sweep_matches_per_point_runs(spark, emb):
    """ivf_topk_sweep's every operating point must equal an individual
    ivf_topk run with the same codebook — the batching-prune grouped by
    (query, probe_idx) may not drop any prefix-set top-k row."""
    from data_ingestion_tool_spark.operators.similarity import (
        ivf_centroids,
        ivf_topk,
        ivf_topk_sweep,
    )

    queries = emb.orderBy("vec_id").limit(6)
    cents = ivf_centroids(emb, 8)
    sweep = ivf_topk_sweep(
        emb, queries, k=5, n_centroids=8, probes=(1, 2, 4), cents=cents
    ).collect()
    by_p = {}
    for r in sweep:
        by_p.setdefault(r.n_probe, set()).add(
            (r.query_id, r.neighbor_id, r.rank)
        )
    for p in (1, 2, 4):
        solo = {
            (r.query_id, r.neighbor_id, r.rank)
            for r in ivf_topk(
                emb, queries, k=5, n_centroids=8, n_probe=p, cents=cents
            ).collect()
        }
        assert by_p.get(p, set()) == solo, f"n_probe={p} diverged"
