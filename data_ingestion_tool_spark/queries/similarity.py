"""Similarity-search queries over ``embeddings`` (north-star)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import similarity as SIM
from ..sources.parquet_io import read_table
from .registry import QUERIES, query

N_QUERY_VECS = 10
TOP_K = 5

# Brute-force exact cosine top-k over the full corpus — the oracle for
# similarity_topk_cosine AND for the full-probe/exhaustive ANN
# invariant keys below (an ANN configured to prune nothing must equal
# brute force exactly).
_BRUTE_TOPK_ORACLE = f"""
    WITH q AS (SELECT vec_id, embedding::DOUBLE[] AS qv FROM embeddings
               WHERE vec_id < {N_QUERY_VECS}),
         c AS (SELECT vec_id, embedding::DOUBLE[] AS cv FROM embeddings),
         scored AS (
           SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                  list_dot_product(qv, cv) /
                    (sqrt(list_dot_product(qv, qv)) *
                     sqrt(list_dot_product(cv, cv))) AS score
           FROM q, c WHERE q.vec_id <> c.vec_id),
         ranked AS (
           SELECT query_id, neighbor_id, score,
                  CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                       ORDER BY score DESC, neighbor_id) AS BIGINT) AS rank
           FROM scored)
    SELECT query_id, neighbor_id, ROUND(score, 9) AS score, rank FROM ranked
    WHERE rank <= {TOP_K}
    """


@query("similarity_topk_cosine", oracle=_BRUTE_TOPK_ORACLE)
def similarity_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force cosine top-k: query block broadcast (in the
    mapInPandas closure), corpus streamed partition-local with numpy
    matmul scoring (the 100 TB shape — the corpus never shuffles).
    Scores rounded to 9 decimals on both sides: BLAS matmul vs the
    oracle's sequential fold drift only in the last couple of ulps."""
    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERY_VECS)
    out = SIM.cosine_topk(emb, queries, k=TOP_K)
    return out.withColumn("score", F.round("score", 9))


# Cross-engine exact-integer SRP scaffold shared by the two promoted
# LSH keys (round-8): md5-derived integer hyperplanes + decimal(9,6)
# vector quantization make the WHOLE pipeline — bucketing included —
# replayable bit-for-bit in DuckDB, so the oracle checks the actual
# approximate output (candidates AND scores), not a stand-in.
_INT_SRP_COMMON = """
    planes AS (
      SELECT tt.t, pp.p, dd.d,
             (CAST('0x' || substr(md5(tt.t || '-' || pp.p || '-' || dd.d),
                                  1, 15) AS BIGINT) % 2001) - 1000 AS r
      FROM (SELECT unnest(generate_series(0, 3)) AS t) tt,
           (SELECT unnest(generate_series(0, 7)) AS p) pp,
           (SELECT unnest(generate_series(0, 63)) AS d) dd
    ),
    vq AS (
      SELECT vec_id, d, x FROM (
        SELECT vec_id,
               generate_subscripts(embedding, 1) - 1 AS d,
               CAST(CAST(CAST(unnest(embedding) AS DOUBLE) AS DECIMAL(9,6))
                    * 1000000 AS BIGINT) AS x
        FROM embeddings)
    ),
    dots AS (
      SELECT vec_id, t, p, SUM(x * r) AS s
      FROM vq JOIN planes USING (d)
      GROUP BY vec_id, t, p
    ),
    keys AS (
      SELECT vec_id, t,
             CAST(SUM(CASE WHEN s > 0
                           THEN (CAST(1 AS BIGINT) << p)
                           ELSE 0 END) AS BIGINT) AS bkt
      FROM dots GROUP BY vec_id, t
    ),
    norms AS MATERIALIZED (
      SELECT vec_id, CAST(SUM(x * x) AS BIGINT) AS n2 FROM vq GROUP BY vec_id
    )
"""


@query(
    "similarity_topk_lsh",
    oracle=f"""
    WITH {_INT_SRP_COMMON},
    cand AS (
      SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
      FROM keys q JOIN keys c ON q.t = c.t AND q.bkt = c.bkt
      WHERE q.vec_id < {N_QUERY_VECS} AND c.vec_id <> q.vec_id
    ),
    pairdot AS (
      SELECT query_id, neighbor_id, CAST(SUM(xa.x * xb.x) AS BIGINT) AS dp
      FROM cand
      JOIN vq xa ON xa.vec_id = query_id
      JOIN vq xb ON xb.vec_id = neighbor_id AND xb.d = xa.d
      GROUP BY query_id, neighbor_id
    ),
    scored AS (
      SELECT query_id, neighbor_id,
             CAST(dp AS DOUBLE)
               / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE)))
               AS score
      FROM pairdot
      JOIN norms na ON na.vec_id = query_id
      JOIN norms nb ON nb.vec_id = neighbor_id
    ),
    ranked AS (
      SELECT query_id, neighbor_id, score,
             CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                  ORDER BY score DESC, neighbor_id) AS BIGINT) AS rank
      FROM scored)
    SELECT query_id, neighbor_id, ROUND(score, 9) AS score, rank
    FROM ranked WHERE rank <= {TOP_K}
    """,
)
def similarity_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH bucketed ANN, promoted to a FULL differential
    oracle (round-8): the exact-integer SRP path (md5-derived integer
    planes, decimal(9,6)-quantized vectors — operators/similarity.py
    int_srp_planes/quantize_vec) makes every bucket bit the sign of an
    exact int64 dot, so DuckDB replays candidate generation AND the
    re-rank scores bit-for-bit. Production keeps the gaussian/BLAS
    path (SIM.lsh_topk); this query pins the same bucketed
    sub-linear-candidates shape on the oracle-able parameterization."""
    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERY_VECS)
    return SIM.lsh_topk_int(emb, queries, k=TOP_K).orderBy("query_id", "rank")


@query(
    "dedup_embedding_cosine",
    oracle=f"""
    WITH {_INT_SRP_COMMON},
    cand AS (
      SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
      FROM keys a JOIN keys b
        ON a.t = b.t AND a.bkt = b.bkt AND a.vec_id < b.vec_id
    ),
    pairdot AS (
      SELECT id_a, id_b, CAST(SUM(xa.x * xb.x) AS BIGINT) AS dp
      FROM cand
      JOIN vq xa ON xa.vec_id = id_a
      JOIN vq xb ON xb.vec_id = id_b AND xb.d = xa.d
      GROUP BY id_a, id_b
    )
    SELECT id_a, id_b,
           ROUND(CAST(dp AS DOUBLE)
                 / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))),
                 9) AS score
    FROM pairdot
    JOIN norms na ON na.vec_id = id_a
    JOIN norms nb ON nb.vec_id = id_b
    WHERE dp > 0
      AND 25 * (CAST(dp AS HUGEINT) * dp)
          >= 4 * (CAST(na.n2 AS HUGEINT) * nb.n2)
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs via LSH buckets, promoted to a
    FULL differential oracle (round-8): same exact-integer SRP scaffold
    as similarity_topk_lsh, with the cos ≥ 0.4 threshold decided by
    integer cross-multiplication (25·dot² ≥ 4·na2·nb2 ∧ dot > 0 — no
    float boundary a pair can straddle). The synthetic embeddings are
    near-random (max pairwise cosine ~0.51 at sf0.01), so 0.4 means
    'unusually similar for this corpus'; real near-dup corpora would
    use 0.9+."""
    emb = read_table(spark, sf_dir, "embeddings")
    return SIM.embedding_near_dup_pairs_int(
        emb, threshold_num=2, threshold_den=5
    ).orderBy("id_a", "id_b")


@query(
    "dedup_semantic_resolve",
    oracle=f"""
    WITH RECURSIVE {_INT_SRP_COMMON},
    cand AS (
      SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
      FROM keys a JOIN keys b
        ON a.t = b.t AND a.bkt = b.bkt AND a.vec_id < b.vec_id
    ),
    pairdot AS (
      SELECT id_a, id_b, CAST(SUM(xa.x * xb.x) AS BIGINT) AS dp
      FROM cand
      JOIN vq xa ON xa.vec_id = id_a
      JOIN vq xb ON xb.vec_id = id_b AND xb.d = xa.d
      GROUP BY id_a, id_b
    ),
    pairs AS (
      SELECT id_a, id_b FROM pairdot
      JOIN norms na ON na.vec_id = id_a
      JOIN norms nb ON nb.vec_id = id_b
      WHERE dp > 0
        AND 25 * (CAST(dp AS HUGEINT) * dp)
            >= 4 * (CAST(na.n2 AS HUGEINT) * nb.n2)
    ),
    e AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ),
    r AS (
      SELECT src AS node, src AS reach FROM e
      UNION
      SELECT r.node, e.dst FROM r JOIN e ON e.src = r.reach
    ),
    comp AS (SELECT node, MIN(reach) AS cid FROM r GROUP BY node),
    lab AS (
      SELECT em.vec_id, em.label, COALESCE(comp.cid, em.vec_id) AS cid
      FROM embeddings em LEFT JOIN comp ON comp.node = em.vec_id
    )
    SELECT CAST(label AS INT) AS label,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           CAST(SUM(CASE WHEN vec_id = cid THEN 1 ELSE 0 END) AS BIGINT)
             AS n_kept,
           CAST(SUM(CASE WHEN vec_id = cid THEN 0 ELSE 1 END) AS BIGINT)
             AS n_dropped
    FROM lab GROUP BY label
    """,
)
def dedup_semantic_resolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup END-TO-END with a FULL differential
    oracle: embedding-cosine near-dup pairs (the exact-integer SRP
    scaffold of dedup_embedding_cosine — every bucket bit and the
    cos ≥ 0.4 verify are exact int64/int128 decisions DuckDB replays) →
    connected components (hash-min label propagation) → min-id keeper
    per cluster → per-label kept/dropped census. The oracle replays the
    whole composition, closing the clusters with an independent
    recursive-CTE transitive closure.

    Scale shape: candidates come from SRP bucket self-joins (never
    all-pairs); the CC loop shuffles only the near-dup PAIR graph; the
    census is one labels-sized aggregate. This is the curation step
    that drops semantically-redundant documents before training — at
    100 TB the pair graph is orders of magnitude smaller than the
    corpus, and the signature frame is pinned so it computes once."""
    from ..operators.graph import dedup_clusters

    emb = read_table(spark, sf_dir, "embeddings")
    pairs = SIM.embedding_near_dup_pairs_int(
        emb, threshold_num=2, threshold_den=5
    ).select("id_a", "id_b")
    resolved = dedup_clusters(pairs, emb, "vec_id")
    lab = emb.select("vec_id", "label").join(resolved, "vec_id")
    keeper = F.col("vec_id") == F.col("keeper_id")
    return (
        lab.groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
            F.sum(F.when(keeper, 1).otherwise(0)).cast("bigint").alias(
                "n_kept"
            ),
            F.sum(F.when(keeper, 0).otherwise(1)).cast("bigint").alias(
                "n_dropped"
            ),
        )
        .select(
            F.col("label").cast("int").alias("label"),
            "n_vecs",
            "n_kept",
            "n_dropped",
        )
        .orderBy("label")
    )


@query(
    "embedding_centroid_per_label",
    oracle="""
    SELECT label, pos,
           CAST(SUM(CAST(CAST(v AS DOUBLE) AS DECIMAL(18,6))) AS DOUBLE)
             / COUNT(*) AS centroid_val,
           COUNT(*) AS n_vecs
    FROM (SELECT label, generate_subscripts(embedding, 1) - 1 AS pos,
                 unnest(embedding) AS v
          FROM embeddings)
    GROUP BY label, pos ORDER BY label, pos
    """,
)
def embedding_centroid_per_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid of the embedding column as (label, pos,
    centroid_val) rows — the vector aggregate under k-means/IVF
    codebook training. posexplode fans each vector into (pos, value)
    pairs that partial-aggregate map-side before the (label, pos)
    shuffle — shuffle rows = labels x dims, independent of corpus
    size, so the shape holds at 100 TB. Values widen float→double
    (exact) BEFORE the decimal(18,6) quantization — the engines round
    float→decimal differently — then decimal-exact accumulate; NO
    final ROUND (the engines' round() disagree at exact .5 boundaries;
    the raw sum/count division of identical doubles is deterministic)."""
    e = read_table(spark, sf_dir, "embeddings")
    ex = e.select("label", F.posexplode("embedding").alias("pos", "v"))
    cnt = F.count(F.lit(1))
    return (
        ex.groupBy("label", "pos")
        .agg(
            (
                F.sum(F.col("v").cast("double").cast("decimal(18,6)")).cast(
                    "double"
                )
                / cnt
            ).alias("centroid_val"),
            cnt.cast("bigint").alias("n_vecs"),
        )
        .select(
            F.col("label").cast("int").alias("label"),
            F.col("pos").cast("int").alias("pos"),
            "centroid_val",
            "n_vecs",
        )
        .orderBy("label", "pos")
    )


@query(
    "similarity_filtered_topk",
    oracle=f"""
    WITH q AS (SELECT vec_id, embedding::DOUBLE[] AS qv FROM embeddings
               WHERE vec_id < {N_QUERY_VECS}),
         c AS (SELECT vec_id, embedding::DOUBLE[] AS cv FROM embeddings
               WHERE label IN (1, 3, 7)),
         scored AS (
           SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                  list_dot_product(qv, cv) /
                    (sqrt(list_dot_product(qv, qv)) *
                     sqrt(list_dot_product(cv, cv))) AS score
           FROM q, c WHERE q.vec_id <> c.vec_id),
         ranked AS (
           SELECT query_id, neighbor_id, score,
                  CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                       ORDER BY score DESC, neighbor_id) AS BIGINT) AS rank
           FROM scored)
    SELECT query_id, neighbor_id, ROUND(score, 9) AS score, rank FROM ranked
    WHERE rank <= {TOP_K}
    """,
)
def similarity_filtered_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTERED vector search — the production-hard case: a metadata
    predicate restricts the corpus BEFORE scoring (pre-filtering), so
    top-k is exact over the allowed subset. Post-filtering (top-k first,
    filter after) silently under-fills k when neighbors get excluded —
    this query is the correct composition. The predicate sits on the
    corpus scan (parquet pushdown at 100 TB); scoring shape is the same
    broadcast-queries / corpus-never-shuffles matmul as
    similarity_topk_cosine."""
    emb = read_table(spark, sf_dir, "embeddings")
    corpus = emb.filter(F.col("label").isin(1, 3, 7))
    queries = emb.filter(F.col("vec_id") < N_QUERY_VECS)
    out = SIM.cosine_topk(corpus, queries, k=TOP_K)
    return out.withColumn("score", F.round("score", 9))


def _recall_fence(
    queries_df: DataFrame, ann: DataFrame, bf: DataFrame, k: int, pct: int
) -> DataFrame:
    """Bound-as-value fence for PRUNED ANN paths (round-5 technique,
    round-10 oracle promotion): the trained-codebook output itself is
    not SQL-replayable, but its CONTRACT is — the index must return
    exactly k rows per query, and aggregate recall@k vs exact cosine
    must clear a floor. Spark computes the facts (hits via a join
    against the brute-force top-k, pure integer comparisons per the
    cross-engine threshold rule); the DuckDB oracle replays the CLAIM
    (recall_ok = 1, n_result_rows = n_queries·k). Any machinery
    regression — under-filled shortlist, dropped query, recall
    collapse — flips a value and breaks the driver hash."""
    # ONE pass over the ANN output (a left join against the tiny
    # brute-force pair set) computes both the row-count contract and
    # the hit count — two separate aggregates would re-execute the
    # whole index pipeline (codebook training included) per branch
    pairs = bf.select("query_id", "neighbor_id").withColumn(
        "__hit", F.lit(1)
    )
    stats = (
        ann.select("query_id", "neighbor_id")
        .join(F.broadcast(pairs), ["query_id", "neighbor_id"], "left")
        .agg(
            F.count(F.lit(1)).alias("n_result_rows"),
            F.sum(F.coalesce(F.col("__hit"), F.lit(0))).alias("hits"),
        )
    )
    nq = queries_df.agg(F.count(F.lit(1)).alias("nq"))
    return nq.crossJoin(stats).select(
        F.col("nq").cast("bigint").alias("n_queries"),
        F.lit(k).cast("int").alias("k"),
        F.col("n_result_rows").cast("bigint").alias("n_result_rows"),
        (F.col("hits") * 100 >= F.col("nq") * k * pct)
        .cast("int")
        .alias("recall_ok"),
    )


_RECALL_FENCE_ORACLE = f"""
    WITH q AS (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT {N_QUERY_VECS})
    SELECT CAST(COUNT(*) AS BIGINT) AS n_queries,
           CAST({TOP_K} AS INT) AS k,
           CAST(COUNT(*) * {TOP_K} AS BIGINT) AS n_result_rows,
           CAST(1 AS INT) AS recall_ok
    FROM q
    """


@query("similarity_topk_pq", oracle=_RECALL_FENCE_ORACLE)
def similarity_topk_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN with exact re-rank (the IVFPQ
    production pattern): the corpus compresses to m=16 one-byte codes
    per vector (~16x for these 64-dim floats), queries shortlist 8k
    candidates via per-query ADC lookup tables, then exact cosine
    re-ranks the shortlist. The memory-bound scale path: a
    billion-vector index fits in executor RAM as codes, and the exact
    pass touches only candidates. Output is the hash-oracled recall
    FENCE over the real pruned run (floor 70%; measured 46/50 hits at
    sf0.01, 41/50 at sf0.1 — see _recall_fence); raw-output exactness
    is pinned by the similarity_topk_pq_exhaustive differential twin
    and tests/test_pq.py (recall + determinism)."""
    from ..plans.pin import pin

    # index-once shape (round-11): pin the projected corpus so the
    # trainer sample, encode pass, re-rank join, brute-force fence and
    # query block all read ONE materialization instead of re-scanning
    # embeddings x5 (PLANS.md rescans note, round-10 verdict item 2)
    emb = pin(
        read_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    )
    queries = emb.orderBy("vec_id").limit(N_QUERY_VECS)
    ann = SIM.pq_topk(emb, queries, k=TOP_K, m=16, n_codes=32, rerank=8)
    bf = SIM.cosine_topk(emb, queries, k=TOP_K)
    return _recall_fence(queries, ann, bf, TOP_K, 70)


@query(
    "embedding_vector_ops",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS INT) AS dim,
           ROUND(sqrt(list_aggregate(
             list_transform(embedding, x -> CAST(x AS DOUBLE)
                            * CAST(x AS DOUBLE)), 'sum')), 6) AS l2_norm,
           ROUND(list_aggregate(
             list_transform(embedding, x -> CAST(x AS DOUBLE)), 'max'), 6)
             AS max_elem,
           CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_positive
    FROM embeddings
    """,
)
def embedding_vector_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order-function surface over the vector column: transform
    (square), aggregate (sum → norm), max-reduce, filter-count — the
    array kernel every embedding pipeline leans on, all JVM codegen
    (no UDF). Sums fold left in array order on both engines; norms are
    rounded to 6 decimals as composed-float hygiene (float32 inputs
    widen to double at different points otherwise).

    Scale shape: per-row expressions on the scan; no shuffle.
    """
    emb = read_table(spark, sf_dir, "embeddings")
    dbl = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    sq_sum = F.aggregate(
        F.transform(dbl, lambda x: x * x),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    max_elem = F.aggregate(
        dbl,
        F.lit(None).cast("double"),
        lambda acc, x: F.when(acc.isNull() | (x > acc), x).otherwise(acc),
    )
    return emb.select(
        "vec_id",
        F.size("embedding").cast("int").alias("dim"),
        F.round(F.sqrt(sq_sum), 6).alias("l2_norm"),
        F.round(max_elem, 6).alias("max_elem"),
        F.size(F.filter(F.col("embedding"), lambda x: x > 0)).cast("bigint").alias(
            "n_positive"
        ),
    )


@query("similarity_topk_ivfpq", oracle=_RECALL_FENCE_ORACLE)
def similarity_topk_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ composite ANN: coarse 16-cell routing (probe 4) over
    PQ-compressed codes (m=16, 32 codes) with exact re-rank of the 8k
    shortlist — the production billion-vector index architecture,
    combining ivf_topk's scan pruning with pq_topk's byte-table
    scoring. Output is the hash-oracled recall fence over the real
    pruned run (floor 50% — routing misses dominate; measured 28/50 at
    sf0.01, 29/50 at sf0.1); raw-output exactness is pinned by the
    similarity_topk_ivfpq_exhaustive twin and tests/test_pq.py::
    test_ivfpq_recall_vs_bruteforce."""
    from ..plans.pin import pin

    emb = pin(  # index-once: one corpus materialization, N consumers
        read_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    )
    queries = emb.orderBy("vec_id").limit(N_QUERY_VECS)
    ann = SIM.ivfpq_topk(
        emb, queries, k=TOP_K, n_centroids=16, n_probe=4, m=16, n_codes=32,
        rerank=8,
    )
    bf = SIM.cosine_topk(emb, queries, k=TOP_K)
    return _recall_fence(queries, ann, bf, TOP_K, 50)


# --- ANN machinery invariants (round-8 oracle promotion) -------------------
#
# An ANN index configured to prune NOTHING must equal brute force
# exactly: IVF probing every cell scans the whole corpus; PQ with a
# shortlist >= corpus re-ranks everything exactly. These keys run the
# REAL index machinery (k-means routing, cell assignment, ADC lookup
# tables, shortlist windows, exact re-rank) through that invariant, so
# the driver's differential hash verifies the machinery end-to-end —
# a cell-assignment bug that drops or duplicates one vector, or a
# shortlist window off-by-one, breaks the hash. The PRUNED
# configurations (similarity_topk_ivf/pq/ivfpq) gained hash oracles in
# round 10 via the bound-as-value recall fence (_recall_fence above):
# their raw output depends on trained codebooks no SQL engine can
# replay, but the CONTRACT (k rows per query, recall floor) is
# integer-replayable.

# rerank=400 ⇒ shortlist_k = k·rerank = 2000 ≥ corpus at sf0.01 (500)
# and sf0.1 (2000): nothing is pruned at oracle scales.
_EXHAUSTIVE_RERANK = 400


@query("similarity_topk_ivf_fullprobe", oracle=_BRUTE_TOPK_ORACLE)
def similarity_topk_ivf_fullprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF with n_probe = n_centroids: every cell probed ⇒ exact by
    construction, so the brute-force SQL is a true oracle for the whole
    routing + cell-scan + re-rank pipeline (see the invariant note
    above). Scores round to 9: the zip_with fold vs DuckDB's
    list_dot_product differ only in final ulps."""
    from ..plans.pin import pin

    emb = pin(  # index-once: one corpus materialization, N consumers
        read_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    )
    queries = emb.filter(F.col("vec_id") < N_QUERY_VECS)
    out = SIM.ivf_topk(emb, queries, k=TOP_K, n_centroids=16, n_probe=16)
    return out.withColumn("score", F.round("score", 9))


@query("similarity_topk_pq_exhaustive", oracle=_BRUTE_TOPK_ORACLE)
def similarity_topk_pq_exhaustive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ with an exhaustive shortlist (k·rerank ≥ corpus): the ADC
    stage still encodes, builds per-query lookup tables, and windows
    the shortlist — but prunes nothing, so the exact re-rank equals
    brute force and the differential hash checks the full PQ pipeline
    (invariant note above)."""
    from ..plans.pin import pin

    emb = pin(  # index-once: one corpus materialization, N consumers
        read_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    )
    queries = emb.filter(F.col("vec_id") < N_QUERY_VECS)
    out = SIM.pq_topk(
        emb, queries, k=TOP_K, m=16, n_codes=32, rerank=_EXHAUSTIVE_RERANK
    )
    return out.withColumn("score", F.round("score", 9))


@query("similarity_topk_ivfpq_exhaustive", oracle=_BRUTE_TOPK_ORACLE)
def similarity_topk_ivfpq_exhaustive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ with full probing AND an exhaustive shortlist: the
    composite router + ADC + re-rank machinery with pruning disabled
    must equal brute force (invariant note above)."""
    from ..plans.pin import pin

    emb = pin(  # index-once: one corpus materialization, N consumers
        read_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    )
    queries = emb.filter(F.col("vec_id") < N_QUERY_VECS)
    out = SIM.ivfpq_topk(
        emb, queries, k=TOP_K, n_centroids=16, n_probe=16, m=16, n_codes=32,
        rerank=_EXHAUSTIVE_RERANK,
    )
    return out.withColumn("score", F.round("score", 9))


@query(
    "similarity_knn_within_label",
    oracle="""
    WITH e AS (
      SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
    ),
    scored AS (
      SELECT a.vec_id, b.vec_id AS neighbor_id,
             list_dot_product(a.v, b.v)
               / (sqrt(list_dot_product(a.v, a.v))
                  * sqrt(list_dot_product(b.v, b.v))) AS score
      FROM e a JOIN e b ON a.label = b.label AND a.vec_id <> b.vec_id
    ),
    ranked AS (
      SELECT vec_id, neighbor_id, score,
             CAST(ROW_NUMBER() OVER (PARTITION BY vec_id
                  ORDER BY score DESC, neighbor_id) AS BIGINT) AS rank
      FROM scored
    )
    SELECT vec_id, neighbor_id, ROUND(score, 9) AS score, rank
    FROM ranked WHERE rank <= 3
    """,
)
def similarity_knn_within_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked kNN-graph build: top-3 cosine neighbors for EVERY vector
    within its label block — the all-corpus neighbor graph behind
    embedding dedup/clustering, BLOCKED so candidate generation stays
    bounded (per-block quadratic, never corpus-quadratic; at 100 TB the
    block key is an IVF/LSH bucket instead of a label and this exact
    plan carries over).

    Execution: groupBy(label) → applyInPandas with one float64 numpy
    matmul per block (the dense-numerics fast path per CLAUDE.md scale
    rules) + per-row (score desc, neighbor_id) top-3. Scores round to
    9 decimals on both sides (BLAS vs sequential-fold ulp drift)."""
    import numpy as np
    import pandas as pd

    emb = read_table(spark, sf_dir, "embeddings")

    def knn(pdf: pd.DataFrame) -> pd.DataFrame:
        V = np.array(pdf["embedding"].tolist(), dtype=np.float64)
        ids = pdf["vec_id"].to_numpy()
        n = len(ids)
        if n < 2:
            return pd.DataFrame(
                columns=["vec_id", "neighbor_id", "score", "rank"]
            )
        norms = np.sqrt((V * V).sum(axis=1))
        S = (V @ V.T) / np.outer(norms, norms)
        rows = []
        for i in range(n):
            s = S[i].copy()
            s[i] = -np.inf
            order = sorted(range(n), key=lambda j: (-s[j], ids[j]))[:3]
            for r, j in enumerate(order, 1):
                rows.append((int(ids[i]), int(ids[j]), float(s[j]), r))
        return pd.DataFrame(
            rows, columns=["vec_id", "neighbor_id", "score", "rank"]
        )

    out = emb.groupBy("label").applyInPandas(
        knn, "vec_id long, neighbor_id long, score double, rank long"
    )
    return out.withColumn("score", F.round("score", 9))


RANGE_TAU = 0.3
N_RANGE_QUERIES = 20


@query(
    "similarity_range_search",
    oracle=f"""
    WITH q AS (SELECT vec_id, embedding::DOUBLE[] AS qv FROM embeddings
               WHERE vec_id < {N_RANGE_QUERIES}),
         c AS (SELECT vec_id, embedding::DOUBLE[] AS cv FROM embeddings),
         scored AS (
           SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                  list_dot_product(qv, cv) /
                    (sqrt(list_dot_product(qv, qv)) *
                     sqrt(list_dot_product(cv, cv))) AS score
           FROM q, c WHERE q.vec_id <> c.vec_id)
    SELECT query_id, neighbor_id, ROUND(score, 9) AS score
    FROM scored WHERE score >= {RANGE_TAU}
    """,
)
def similarity_range_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE (radius) search — "every vector at least this similar",
    the retrieval mode similarity-dedup and recall-first pipelines need
    where a fixed k under- or over-shoots per query. Exact scores, no
    ranking window: the ≥ τ predicate is applied per Arrow batch inside
    the scan (operators/similarity.cosine_range_search), so only hits
    ever leave the executors — output volume is the answer size.

    τ = 0.3 sits ≥ 1e-4 from every realizable score in this corpus
    (measured at sf0.01 and sf0.1), 11 orders of magnitude above the
    matmul-vs-fold double drift (~4e-16), so the boundary can't flip
    cross-engine. Scores rounded to 9 for the hash (composed-float
    rule).
    """
    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_RANGE_QUERIES)
    out = SIM.cosine_range_search(emb, queries, tau=RANGE_TAU)
    return out.select(
        "query_id", "neighbor_id", F.round("score", 9).alias("score")
    )


@query(
    "embedding_centroid_drift",
    oracle="""
    WITH c AS (
      SELECT label, CAST(half AS INT) AS half, pos,
             CAST(SUM(CAST(CAST(v AS DOUBLE) AS DECIMAL(18,6))) AS DOUBLE)
               / COUNT(*) AS cv,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM (SELECT label, vec_id % 2 AS half,
                   generate_subscripts(embedding, 1) - 1 AS pos,
                   unnest(embedding) AS v
            FROM embeddings)
      GROUP BY label, half, pos
    ),
    p AS (
      SELECT a.label,
             CAST(SUM(CAST(a.cv * b.cv AS DECIMAL(20,14))) AS DOUBLE) AS dot,
             CAST(SUM(CAST(a.cv * a.cv AS DECIMAL(20,14))) AS DOUBLE) AS na,
             CAST(SUM(CAST(b.cv * b.cv AS DECIMAL(20,14))) AS DOUBLE) AS nb,
             MAX(a.n) AS n_even, MAX(b.n) AS n_odd
      FROM c a JOIN c b ON a.label = b.label AND a.pos = b.pos
      WHERE a.half = 0 AND b.half = 1
      GROUP BY a.label
    )
    SELECT label, n_even, n_odd,
           ROUND(dot / (sqrt(na) * sqrt(nb)), 9) AS centroid_cosine
    FROM p
    """,
)
def embedding_centroid_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding drift monitor: cosine similarity between each label's
    centroid computed over two deterministic halves of the corpus
    (vec_id parity — in production, two time windows). Near-1 means the
    embedding distribution is stable; a dropping value is the signal to
    re-train an IVF/PQ index or investigate upstream encoder drift.
    Centroids use the decimal-exact posexplode aggregate of
    embedding_centroid_per_label; the 64-term dot/norm folds quantize
    each product to DECIMAL(20,14) so the contraction is
    order-independent, and the final cosine is identical-expression
    (correctly-rounded sqrts), rounded to 9.

    Scale shape: shuffle rows = labels × dims × 2 after map-side
    partials, independent of corpus size; the half-vs-half join runs on
    that domain-bounded frame.
    """
    e = read_table(spark, sf_dir, "embeddings")
    ex = e.select(
        "label",
        (F.col("vec_id") % 2).cast("int").alias("half"),
        F.posexplode("embedding").alias("pos", "v"),
    )
    cnt = F.count(F.lit(1))
    c = ex.groupBy("label", "half", "pos").agg(
        (
            F.sum(F.col("v").cast("double").cast("decimal(18,6)")).cast("double")
            / cnt
        ).alias("cv"),
        cnt.cast("bigint").alias("n"),
    )
    a = c.filter(F.col("half") == 0).alias("a")
    b = c.filter(F.col("half") == 1).alias("b")
    p = (
        a.join(b, (F.col("a.label") == F.col("b.label")) & (F.col("a.pos") == F.col("b.pos")))
        .groupBy(F.col("a.label").alias("label"))
        .agg(
            F.sum((F.col("a.cv") * F.col("b.cv")).cast("decimal(20,14)"))
            .cast("double")
            .alias("dot"),
            F.sum((F.col("a.cv") * F.col("a.cv")).cast("decimal(20,14)"))
            .cast("double")
            .alias("na"),
            F.sum((F.col("b.cv") * F.col("b.cv")).cast("decimal(20,14)"))
            .cast("double")
            .alias("nb"),
            F.max("a.n").alias("n_even"),
            F.max("b.n").alias("n_odd"),
        )
    )
    return p.select(
        F.col("label").cast("int").alias("label"),
        "n_even",
        "n_odd",
        F.round(
            F.col("dot") / (F.sqrt(F.col("na")) * F.sqrt(F.col("nb"))), 9
        ).alias("centroid_cosine"),
    )


# ---------------------------------------------------------------------------
# Pairwise distance matrix between label centroids (cluster separation)
# ---------------------------------------------------------------------------


@query(
    "embedding_centroid_distance_matrix",
    oracle="""
    WITH cent AS (
      SELECT label, pos,
             CAST(SUM(CAST(CAST(v AS DOUBLE) AS DECIMAL(18,6))) AS DOUBLE)
               / COUNT(*) AS c
      FROM (SELECT label, generate_subscripts(embedding, 1) - 1 AS pos,
                   unnest(embedding) AS v
            FROM embeddings)
      GROUP BY label, pos
    )
    SELECT a.label AS label_a, b.label AS label_b,
           ROUND(sqrt(CAST(SUM(CAST(ROUND((a.c - b.c) * (a.c - b.c), 12)
                                    AS DECIMAL(20,12))) AS DOUBLE)), 9)
             AS euclidean_dist
    FROM cent a JOIN cent b
      ON a.pos = b.pos AND a.label < b.label
    GROUP BY a.label, b.label
    """,
)
def embedding_centroid_distance_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Euclidean distance between every pair of label centroids — the
    cluster-separation diagnostic behind IVF codebook health and
    label-leakage checks (two labels whose centroids nearly coincide
    are not separable classes). Centroids reuse the decimal-exact
    mean (identical doubles, see embedding_centroid_per_label); each
    squared difference is ROUNDed to 12 places BEFORE the
    DECIMAL(20,12) cast (both engines share ROUND's half-up-on-doubles
    semantics, whereas the bare double→decimal cast is HALF_UP on
    Spark but half-even on DuckDB; ADVICE r4 hardening) so the 64-term
    contraction is order-independent, then one sqrt + ROUND(9).

    Scale shape: centroids are labels × dims rows (map-side partial
    aggregate; corpus never shuffles whole); the pair join runs on
    that tiny frame — label-pair count is |labels|²/2, corpus-free.
    """
    e = read_table(spark, sf_dir, "embeddings")
    ex = e.select("label", F.posexplode("embedding").alias("pos", "v"))
    cent = ex.groupBy("label", "pos").agg(
        (
            F.sum(F.col("v").cast("double").cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("c")
    )
    a = cent.alias("a")
    b = cent.alias("b")
    diff = F.col("a.c") - F.col("b.c")
    return (
        a.join(
            b,
            (F.col("a.pos") == F.col("b.pos"))
            & (F.col("a.label") < F.col("b.label")),
        )
        .groupBy(
            F.col("a.label").alias("label_a"), F.col("b.label").alias("label_b")
        )
        .agg(
            F.round(
                F.sqrt(
                    F.sum(
                        F.round(diff * diff, 12).cast("decimal(20,12)")
                    ).cast("double")
                ),
                9,
            ).alias("euclidean_dist")
        )
    )


# ---------------------------------------------------------------------------
# Simplified silhouette per label (clustering quality of the label space)
# ---------------------------------------------------------------------------


@query(
    "embedding_silhouette_per_label",
    oracle="""
    WITH cent AS (
      SELECT label, pos,
             CAST(SUM(CAST(CAST(v AS DOUBLE) AS DECIMAL(18,6))) AS DOUBLE)
               / COUNT(*) AS c
      FROM (SELECT label, generate_subscripts(embedding, 1) - 1 AS pos,
                   unnest(embedding) AS v
            FROM embeddings)
      GROUP BY label, pos
    ),
    ex AS (
      SELECT vec_id, label, generate_subscripts(embedding, 1) - 1 AS pos,
             CAST(unnest(embedding) AS DOUBLE) AS v
      FROM embeddings
    ),
    d2 AS (
      SELECT ex.vec_id, ex.label, cent.label AS m_label,
             CAST(CAST(SUM(CAST(ROUND((ex.v - cent.c) * (ex.v - cent.c)
                                       * 1000000000000.0, 0) AS BIGINT))
                       AS BIGINT) AS DOUBLE)
               / 1000000000000.0 AS dd
      FROM ex JOIN cent ON ex.pos = cent.pos
      GROUP BY ex.vec_id, ex.label, cent.label
    ),
    ab AS (
      SELECT vec_id, label,
             MAX(CASE WHEN m_label = label THEN sqrt(dd) END) AS a,
             MIN(CASE WHEN m_label <> label THEN sqrt(dd) END) AS b
      FROM d2 GROUP BY vec_id, label
    ),
    s AS (
      SELECT label,
             CASE WHEN GREATEST(a, b) > 0
                  THEN ROUND((b - a) / GREATEST(a, b), 12) ELSE 0.0 END AS s
      FROM ab
    )
    SELECT label, CAST(COUNT(*) AS BIGINT) AS n_members,
           ROUND(CAST(SUM(CAST(s AS DECIMAL(16,12))) AS DOUBLE)
                 / COUNT(*), 9) AS mean_silhouette
    FROM s GROUP BY label
    """,
)
def embedding_silhouette_per_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simplified (centroid-based) silhouette per label — the standard
    clustering-quality score: a = distance to the OWN label centroid,
    b = distance to the NEAREST other centroid, s = (b−a)/max(a,b),
    averaged per label. High mean silhouette = separable labels; ~0 or
    negative = label leakage / mislabeled clusters. Full pairwise
    silhouette is O(n²); the centroid form is the linear-scan variant
    actually run at corpus scale.

    Engine-exactness (the distance_matrix discipline, now in FIXED
    POINT): centroids are decimal-exact means (identical doubles both
    engines); each per-dim squared diff is quantized to 1e-12 units
    with half-away-from-zero rounding of the SAME IEEE double — numpy
    ``floor(t·1e12 + 0.5)`` over non-negative terms equals DuckDB
    ``ROUND(t·1e12, 0)`` bit-for-bit (differentially verified over all
    sf0.01 (vector, centroid) pairs) — and accumulated in int64 (max
    4e12·64 ≈ 2.6e14 « 2^53), so the 64-term contraction is
    order-independent and exact; dd = units/1e12 is one correctly-
    rounded division on both engines. Each s is ROUND(12)ed then
    DECIMAL-accumulated so the per-label mean is order-independent,
    emitted at ROUND(9).

    Scale shape (round-6 replan, ~6x less fan-out than the posexplode
    twin it replaces): ONE Arrow-batched mapInPandas pass computes the
    n×L distance block per batch via vectorized numpy against the
    broadcast L×d centroid matrix (collected once — L·d = 640 values,
    documented bound); no n·L·d row explosion through a JVM join, no
    per-vector shuffle — the only shuffle left is the |labels|-row
    final aggregate. Linear in corpus, embarrassingly partitionable.
    """
    import numpy as np
    import pandas as pd

    e = read_table(spark, sf_dir, "embeddings")
    ex = e.select(
        "vec_id", "label", F.posexplode("embedding").alias("pos", "v")
    ).withColumn("v", F.col("v").cast("double"))
    cent_rows = (
        ex.groupBy("label", "pos")
        .agg(
            (
                F.sum(F.col("v").cast("decimal(18,6)")).cast("double")
                / F.count(F.lit(1))
            ).alias("c")
        )
        .collect()
    )
    labels = sorted({r["label"] for r in cent_rows})
    lidx = {l: i for i, l in enumerate(labels)}
    dim = 1 + max(r["pos"] for r in cent_rows)
    cmat = np.zeros((len(labels), dim), dtype=np.float64)
    for r in cent_rows:
        cmat[lidx[r["label"]], r["pos"]] = r["c"]

    out_schema = "label bigint, s_raw double"

    def batch_silhouette(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            v = np.stack(
                [np.asarray(x, dtype=np.float64) for x in pdf["embedding"]]
            )
            t = v[:, None, :] - cmat[None, :, :]
            t = t * t * 1e12
            # half-up == DuckDB half-away-from-zero: terms are >= 0
            units = np.floor(t + 0.5).astype(np.int64).sum(axis=2)
            dist = np.sqrt(units.astype(np.float64) / 1e12)
            own = np.array([lidx[l] for l in pdf["label"]], dtype=np.int64)
            rows = np.arange(len(own))
            a = dist[rows, own]
            masked = dist.copy()
            masked[rows, own] = np.inf
            b = masked.min(axis=1)
            mx = np.maximum(a, b)
            with np.errstate(invalid="ignore", divide="ignore"):
                s = np.where(mx > 0, (b - a) / mx, 0.0)
            yield pd.DataFrame(
                {"label": pdf["label"].astype("int64"), "s_raw": s}
            )

    s = e.select("label", "embedding").mapInPandas(
        batch_silhouette, out_schema
    ).select(
        "label",
        F.round(F.col("s_raw"), 12).alias("s"),
    )
    return s.groupBy("label").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_members"),
        F.round(
            F.sum(F.col("s").cast("decimal(16,12)")).cast("double")
            / F.count(F.lit(1)),
            9,
        ).alias("mean_silhouette"),
    )


# ---------------------------------------------------------------------------
# k-means E-step: nearest-centroid assignment counts (label leakage map)
# ---------------------------------------------------------------------------


@query(
    "similarity_centroid_assign_counts",
    oracle="""
    WITH cent AS (
      SELECT label, pos,
             CAST(SUM(CAST(CAST(v AS DOUBLE) AS DECIMAL(18,6))) AS DOUBLE)
               / COUNT(*) AS c
      FROM (SELECT label, generate_subscripts(embedding, 1) - 1 AS pos,
                   unnest(embedding) AS v
            FROM embeddings)
      GROUP BY label, pos
    ),
    ex AS (
      SELECT vec_id, label, generate_subscripts(embedding, 1) - 1 AS pos,
             CAST(unnest(embedding) AS DOUBLE) AS v
      FROM embeddings
    ),
    d2 AS (
      SELECT ex.vec_id, ex.label, cent.label AS m_label,
             CAST(SUM(CAST(ROUND((ex.v - cent.c) * (ex.v - cent.c)
                                  * 1000000000000.0, 0) AS BIGINT))
                  AS BIGINT) AS units
      FROM ex JOIN cent ON ex.pos = cent.pos
      GROUP BY ex.vec_id, ex.label, cent.label
    ),
    assigned AS (
      SELECT vec_id, label,
             MIN({'d': units, 'l': m_label}) AS nearest
      FROM d2 GROUP BY vec_id, label
    )
    SELECT label, nearest.l AS nearest_label,
           CAST(COUNT(*) AS BIGINT) AS n_vecs
    FROM assigned GROUP BY label, nearest.l
    """,
)
def similarity_centroid_assign_counts(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """k-means E-step over the label centroids: assign every vector to
    its nearest centroid and report the (true label × nearest centroid)
    confusion counts — the label-leakage / cluster-quality map next to
    the silhouette score (an off-diagonal count = vectors closer to
    another label's centroid than their own).

    Engine-exactness: the same fixed-point contraction as
    embedding_silhouette_per_label — per-dim squared diffs quantized to
    1e-12 units with half-away rounding of the identical IEEE double,
    int64-accumulated, and the argmin runs on the INTEGER units with a
    (units, label) tuple tie-break (numpy argmin over ascending labels
    == DuckDB MIN over structs) — no float comparison anywhere.

    Scale shape: one Arrow-batched mapInPandas pass against the
    broadcast L×d centroid matrix (640 values, documented bound); the
    only shuffle is the L×L output aggregate.
    """
    import numpy as np
    import pandas as pd

    e = read_table(spark, sf_dir, "embeddings")
    ex = e.select(
        "vec_id", "label", F.posexplode("embedding").alias("pos", "v")
    ).withColumn("v", F.col("v").cast("double"))
    cent_rows = (
        ex.groupBy("label", "pos")
        .agg(
            (
                F.sum(F.col("v").cast("decimal(18,6)")).cast("double")
                / F.count(F.lit(1))
            ).alias("c")
        )
        .collect()
    )
    labels = sorted({r["label"] for r in cent_rows})
    lidx = {l: i for i, l in enumerate(labels)}
    dim = 1 + max(r["pos"] for r in cent_rows)
    cmat = np.zeros((len(labels), dim), dtype=np.float64)
    for r in cent_rows:
        cmat[lidx[r["label"]], r["pos"]] = r["c"]
    larr = np.array(labels, dtype=np.int64)

    def assign(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            v = np.stack(
                [np.asarray(x, dtype=np.float64) for x in pdf["embedding"]]
            )
            t = v[:, None, :] - cmat[None, :, :]
            t = t * t * 1e12
            units = np.floor(t + 0.5).astype(np.int64).sum(axis=2)
            # first-occurrence argmin over ascending labels == the
            # (units, label) tuple min
            nearest = larr[np.argmin(units, axis=1)]
            yield pd.DataFrame(
                {
                    "label": pdf["label"].astype("int64"),
                    "nearest_label": nearest,
                }
            )

    out = e.select("label", "embedding").mapInPandas(
        assign, "label bigint, nearest_label bigint"
    )
    return out.groupBy("label", "nearest_label").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vecs")
    )


def _mmr_oracle(pool_k: int = 20, n_pick: int = 5) -> str:
    """Unrolled-recursion DuckDB twin of the MMR selection: the greedy
    argmax loop becomes n_pick chained CTE steps, each re-ranking the
    unselected pool by score − λ·max-sim-to-selected with the same
    (margin DESC, cid) tie-break the operator uses."""
    steps = []
    for i in range(2, n_pick + 1):
        steps.append(f"""
    cand{i} AS MATERIALIZED (
      SELECT p.query_id, p.cid, p.score,
             p.score - 0.5 * MAX(ps.sim) AS margin
      FROM pool p
      JOIN sel{i - 1} s ON s.query_id = p.query_id
      JOIN psim ps ON ps.ca = p.cid AND ps.cb = s.cid
      LEFT JOIN sel{i - 1} x
        ON x.query_id = p.query_id AND x.cid = p.cid
      WHERE x.cid IS NULL
      GROUP BY p.query_id, p.cid, p.score
    ),
    s{i} AS (
      SELECT query_id, cid, margin, CAST({i} AS INT) AS pick_rank
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                       ORDER BY margin DESC, cid) AS rn FROM cand{i})
      WHERE rn = 1
    ),
    sel{i} AS MATERIALIZED (SELECT query_id, cid FROM sel{i - 1}
               UNION ALL SELECT query_id, cid FROM s{i})""")
    union = "\n      UNION ALL ".join(
        f"SELECT query_id, pick_rank, cid, margin FROM s{i}"
        for i in range(1, n_pick + 1)
    )
    return f"""
    WITH vq AS MATERIALIZED (
      SELECT vec_id, d, x FROM (
        SELECT vec_id,
               generate_subscripts(embedding, 1) - 1 AS d,
               CAST(CAST(CAST(unnest(embedding) AS DOUBLE) AS DECIMAL(9,6))
                    * 1000000 AS BIGINT) AS x
        FROM embeddings)
    ),
    norms AS MATERIALIZED (
      SELECT vec_id, CAST(SUM(x * x) AS BIGINT) AS n2
      FROM vq GROUP BY vec_id
    ),
    dots AS (
      SELECT xa.vec_id AS query_id, xb.vec_id AS cid,
             CAST(SUM(xa.x * xb.x) AS BIGINT) AS dp
      FROM vq xa JOIN vq xb ON xb.d = xa.d AND xb.vec_id <> xa.vec_id
      WHERE xa.vec_id < 10
      GROUP BY xa.vec_id, xb.vec_id
    ),
    scored AS (
      SELECT query_id, cid,
             CAST(dp AS DOUBLE)
               / (sqrt(CAST(nq.n2 AS DOUBLE)) * sqrt(CAST(nc.n2 AS DOUBLE)))
               AS score
      FROM dots
      JOIN norms nq ON nq.vec_id = query_id
      JOIN norms nc ON nc.vec_id = cid
    ),
    pool AS MATERIALIZED (
      SELECT query_id, cid, score
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                       ORDER BY score DESC, cid) AS rn FROM scored)
      WHERE rn <= {pool_k}
    ),
    pairs AS (
      SELECT DISTINCT a.cid AS ca, b.cid AS cb
      FROM pool a JOIN pool b
        ON a.query_id = b.query_id AND a.cid <> b.cid
    ),
    pdp AS (
      SELECT ca, cb, CAST(SUM(xa.x * xb.x) AS BIGINT) AS dp
      FROM pairs
      JOIN vq xa ON xa.vec_id = ca
      JOIN vq xb ON xb.vec_id = cb AND xb.d = xa.d
      GROUP BY ca, cb
    ),
    psim AS MATERIALIZED (
      SELECT ca, cb,
             CAST(dp AS DOUBLE)
               / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE)))
               AS sim
      FROM pdp
      JOIN norms na ON na.vec_id = ca
      JOIN norms nb ON nb.vec_id = cb
    ),
    s1 AS MATERIALIZED (
      SELECT query_id, cid, score AS margin, CAST(1 AS INT) AS pick_rank
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                       ORDER BY score DESC, cid) AS rn FROM pool)
      WHERE rn = 1
    ),
    sel1 AS MATERIALIZED (SELECT query_id, cid FROM s1),{",".join(steps)}
    SELECT query_id, pick_rank, cid AS neighbor_id, ROUND(margin, 9) AS margin
    FROM ({union})
    """


@query("similarity_topk_mmr_diversified", oracle=_mmr_oracle())
def similarity_topk_mmr_diversified(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Maximal Marginal Relevance (MMR) diversified top-k — the
    retrieval-side curation op that trades relevance against redundancy
    (λ=0.5): greedily pick 5 of the top-20 cosine pool, each step
    re-scoring unselected candidates by score − λ·max-sim-to-selected.
    On the exact-integer quantized vectors every cosine is the same
    double on both engines, so the greedy argmax (tie-break: margin
    DESC, cid) is deterministic and the FULL selection replays in an
    unrolled-recursion DuckDB twin.

    Scale shape: the pool stage is the bucketed/brute top-k machinery
    (one broadcast of 10 query vectors, rank ≤ 20); the quadratic part
    — pairwise sims and the greedy loop — runs on 20-row pools ONLY,
    inside one applyInPandas per query (380 int dots per group). At
    100 TB the pool bound keeps MMR O(queries · k²) regardless of
    corpus size."""
    import pandas as pd

    from ..plans.pin import pin

    emb = read_table(spark, sf_dir, "embeddings")
    iq = emb.select(
        "vec_id", SIM.quantize_vec(F.col("embedding")).alias("qv")
    ).withColumn("n2", SIM._int_dot(F.col("qv"), F.col("qv")))
    qs = (
        iq.filter(F.col("vec_id") < N_QUERY_VECS)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("qv").alias("qqv"),
            F.col("n2").alias("qn2"),
        )
    )
    c = iq.select(
        F.col("vec_id").alias("cid"), F.col("qv"), F.col("n2")
    )
    dp = SIM._int_dot(F.col("qqv"), F.col("qv"))
    score = dp.cast("double") / (
        F.sqrt(F.col("qn2").cast("double"))
        * F.sqrt(F.col("n2").cast("double"))
    )
    scored = (
        c.join(F.broadcast(qs), F.col("cid") != F.col("query_id"))
        .withColumn("score", score)
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("cid")
    )
    pool = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 20)
        .select("query_id", "cid", "score", "qv", "n2")
        .transform(pin, eager=False)
    )
    a, b = pool.alias("a"), pool.alias("b")
    sim = SIM._int_dot(F.col("a.qv"), F.col("b.qv")).cast("double") / (
        F.sqrt(F.col("a.n2").cast("double"))
        * F.sqrt(F.col("b.n2").cast("double"))
    )
    feed = a.join(
        b,
        (F.col("a.query_id") == F.col("b.query_id"))
        & (F.col("a.cid") != F.col("b.cid")),
    ).select(
        F.col("a.query_id").alias("query_id"),
        F.col("a.cid").alias("cid_a"),
        F.col("a.score").alias("score_a"),
        F.col("b.cid").alias("cid_b"),
        sim.alias("sim"),
    )

    def mmr(pdf: pd.DataFrame) -> pd.DataFrame:
        qid = int(pdf["query_id"].iloc[0])
        scores: dict[int, float] = {}
        sims: dict[tuple[int, int], float] = {}
        for ca, sa, cb, s in zip(
            pdf["cid_a"], pdf["score_a"], pdf["cid_b"], pdf["sim"]
        ):
            scores[int(ca)] = float(sa)
            sims[(int(ca), int(cb))] = float(s)
        selected: list[int] = []
        rows = []
        for rank in range(1, 6):
            best = None
            for cid, sc in scores.items():
                if cid in selected:
                    continue
                m = (
                    sc - 0.5 * max(sims[(cid, s)] for s in selected)
                    if selected
                    else sc
                )
                key = (m, -cid)
                if best is None or key > best[0]:
                    best = (key, cid, m)
            if best is None:
                break
            selected.append(best[1])
            rows.append((qid, rank, best[1], best[2]))
        return pd.DataFrame(
            rows, columns=["query_id", "pick_rank", "neighbor_id", "margin"]
        ).astype(
            {
                "query_id": "int64",
                "pick_rank": "int32",
                "neighbor_id": "int64",
                "margin": "float64",
            }
        )

    out = feed.groupBy("query_id").applyInPandas(
        mmr,
        "query_id long, pick_rank int, neighbor_id long, margin double",
    )
    return out.select(
        "query_id", "pick_rank", "neighbor_id", F.round("margin", 9).alias("margin")
    )


@query(
    "similarity_hybrid_rrf_fusion",
    oracle=f"""
    WITH vq AS MATERIALIZED (
      SELECT vec_id, d, x FROM (
        SELECT vec_id,
               generate_subscripts(embedding, 1) - 1 AS d,
               CAST(CAST(CAST(unnest(embedding) AS DOUBLE) AS DECIMAL(9,6))
                    * 1000000 AS BIGINT) AS x
        FROM embeddings)
    ),
    norms AS MATERIALIZED (
      SELECT vec_id, CAST(SUM(x * x) AS BIGINT) AS n2
      FROM vq GROUP BY vec_id
    ),
    dots AS (
      SELECT xa.vec_id AS query_id, xb.vec_id AS cid,
             CAST(SUM(xa.x * xb.x) AS BIGINT) AS dp
      FROM vq xa JOIN vq xb ON xb.d = xa.d AND xb.vec_id <> xa.vec_id
      WHERE xa.vec_id < {N_QUERY_VECS}
      GROUP BY xa.vec_id, xb.vec_id
    ),
    scored AS (
      SELECT query_id, cid,
             CAST(dp AS DOUBLE)
               / (sqrt(CAST(nq.n2 AS DOUBLE)) * sqrt(CAST(nc.n2 AS DOUBLE)))
               AS cos,
             nq.n2 + nc.n2 - 2 * dp AS l2sq
      FROM dots
      JOIN norms nq ON nq.vec_id = query_id
      JOIN norms nc ON nc.vec_id = cid
    ),
    ranked AS (
      SELECT query_id, cid, l2sq,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cos DESC, cid) AS r_dense,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY l2sq, cid) AS r_l2
      FROM scored
    ),
    fused AS (
      SELECT query_id, cid,
             CAST(r_dense AS BIGINT) AS rank_dense,
             CAST(r_l2 AS BIGINT) AS rank_l2,
             1.0 / (60 + r_dense) + 1.0 / (60 + r_l2) AS rrf
      FROM ranked
    )
    SELECT query_id, cid AS neighbor_id, rank_dense, rank_l2, rrf,
           CAST(rn AS BIGINT) AS rank
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                     ORDER BY rrf DESC, cid) AS rn FROM fused)
    WHERE rn <= {TOP_K}
    """,
)
def similarity_hybrid_rrf_fusion(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Reciprocal-rank fusion (RRF, k=60) of two dense retrieval
    rankings — cosine and squared-L2 — the standard hybrid-search merge
    (unnormalized scorers disagree, so fuse RANKS, not scores). On the
    exact-integer quantized vectors l2sq = n_a + n_b − 2·dot is an
    exact int64 and every cosine is the same double on both engines, so
    both rankings (vec_id tie-break), the fused 1/(60+r) sums, and the
    final top-k replay bit-for-bit with NO rounding anywhere.

    Scale shape: the candidate stage here is brute per-query for the
    oracle's sake; production swaps in the bucketed LSH/IVF candidate
    paths (same module) and fuses EXACTLY the same way — RRF only needs
    ranks, so it composes with any retriever pair. The fusion itself is
    two window functions over per-query candidate lists."""
    emb = read_table(spark, sf_dir, "embeddings")
    iq = emb.select(
        "vec_id", SIM.quantize_vec(F.col("embedding")).alias("qv")
    ).withColumn("n2", SIM._int_dot(F.col("qv"), F.col("qv")))
    qs = iq.filter(F.col("vec_id") < N_QUERY_VECS).select(
        F.col("vec_id").alias("query_id"),
        F.col("qv").alias("qqv"),
        F.col("n2").alias("qn2"),
    )
    c = iq.select(
        F.col("vec_id").alias("cid"), F.col("qv"), F.col("n2")
    )
    dp = SIM._int_dot(F.col("qqv"), F.col("qv"))
    scored = (
        c.join(F.broadcast(qs), F.col("cid") != F.col("query_id"))
        .withColumn("dp", dp)
        .select(
            "query_id",
            "cid",
            (
                F.col("dp").cast("double")
                / (
                    F.sqrt(F.col("qn2").cast("double"))
                    * F.sqrt(F.col("n2").cast("double"))
                )
            ).alias("cos"),
            (F.col("qn2") + F.col("n2") - 2 * F.col("dp")).alias("l2sq"),
        )
    )
    wd = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("cid")
    )
    wl = Window.partitionBy("query_id").orderBy("l2sq", "cid")
    fused = scored.select(
        "query_id",
        "cid",
        F.row_number().over(wd).alias("r_dense"),
        F.row_number().over(wl).alias("r_l2"),
    ).withColumn(
        "rrf",
        F.lit(1.0) / (60 + F.col("r_dense"))
        + F.lit(1.0) / (60 + F.col("r_l2")),
    )
    wf = Window.partitionBy("query_id").orderBy(
        F.col("rrf").desc(), F.col("cid")
    )
    return (
        fused.withColumn("rn", F.row_number().over(wf))
        .filter(F.col("rn") <= TOP_K)
        .select(
            "query_id",
            F.col("cid").alias("neighbor_id"),
            F.col("r_dense").cast("bigint").alias("rank_dense"),
            F.col("r_l2").cast("bigint").alias("rank_l2"),
            "rrf",
            F.col("rn").cast("bigint").alias("rank"),
        )
    )


def _pca_oracle(n_iter: int = 10) -> str:
    """Unrolled power-iteration DuckDB twin: exact-int64 centered Gram
    (n·Σxxᵀ − SSᵀ on the quantized vectors), then n_iter chained
    matvec+normalize steps from v₀ = 1/8 (exact dyadic)."""
    steps = []
    for k in range(1, n_iter + 1):
        steps.append(f"""
    u{k} AS MATERIALIZED (
      SELECT g.i AS d, SUM(g.val * v{k - 1}.x) AS u
      FROM gram g JOIN v{k - 1} ON v{k - 1}.d = g.j GROUP BY g.i
    ),
    n{k} AS (SELECT sqrt(SUM(u * u)) AS nrm FROM u{k}),
    v{k} AS MATERIALIZED (
      SELECT d, u / nrm AS x FROM u{k}, n{k}
    )""")
    return f"""
    WITH vq AS MATERIALIZED (
      SELECT vec_id, d, x FROM (
        SELECT vec_id,
               generate_subscripts(embedding, 1) - 1 AS d,
               CAST(CAST(CAST(unnest(embedding) AS DOUBLE) AS DECIMAL(9,6))
                    * 1000000 AS BIGINT) AS x
        FROM embeddings)
    ),
    nn AS (SELECT CAST(COUNT(DISTINCT vec_id) AS BIGINT) AS n FROM vq),
    sums AS MATERIALIZED (
      SELECT d, CAST(SUM(x) AS BIGINT) AS s FROM vq GROUP BY d
    ),
    sxx AS MATERIALIZED (
      SELECT a.d AS i, b.d AS j, CAST(SUM(a.x * b.x) AS BIGINT) AS sxx
      FROM vq a JOIN vq b ON b.vec_id = a.vec_id
      GROUP BY a.d, b.d
    ),
    gram AS MATERIALIZED (
      SELECT i, j,
             CAST(CAST(nn.n * sxx.sxx - si.s * sj.s AS BIGINT) AS DOUBLE)
               AS val
      FROM sxx
      JOIN sums si ON si.d = sxx.i
      JOIN sums sj ON sj.d = sxx.j
      CROSS JOIN nn
    ),
    v0 AS (
      SELECT DISTINCT i AS d, 0.125 AS x FROM gram
    ),{",".join(steps)}
    SELECT v.d AS dim, ROUND(v.x, 6) AS loading,
           ROUND(n.nrm / ((SELECT CAST(n * n AS DOUBLE) FROM nn)
                          * 1000000000000.0), 6) AS ev_scaled
    FROM v{n_iter} v, n{n_iter} n
    """


@query("embedding_pca_top_component", oracle=_pca_oracle())
def embedding_pca_top_component(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Top principal component of the embedding corpus by power
    iteration — the spectral summary behind drift monitoring and
    anisotropy checks ('is the corpus collapsing to one direction?').
    The CENTERED Gram is exact int64: n·Σxxᵀ − SSᵀ on the
    decimal-quantized vectors (n² × the covariance, scale 10¹²), so
    both engines start the float iteration from the IDENTICAL matrix;
    10 matvec+normalize steps from the exact-dyadic v₀ = 1/8 then agree
    to ~1e-13 (sum-order ulps only — power iteration does not amplify
    them), and loadings/eigenvalue round to 6.

    Scale shape: the Gram partials are a per-partition numpy
    X.T @ X (int64, exact) emitting 64x64 rows per partition — one
    map-side reduction, the corpus never shuffles; the iteration runs
    driver-side on the collected 64x64 matrix (bounded by dim², never
    by rows — the documented collect). int64 holds n·Σxx up to ~9e18,
    i.e. corpora to ~40k quantized vectors at this dim; past that the
    partials switch to decimal(38) with the same plan."""
    import numpy as np
    import pandas as pd

    emb = read_table(spark, sf_dir, "embeddings")
    iq = emb.select(SIM.quantize_vec(F.col("embedding")).alias("qv"))

    def gram_partials(it):
        for pdf in it:
            if not len(pdf):
                continue
            X = np.array(pdf["qv"].tolist(), dtype=np.int64)
            G = X.T @ X  # exact: numpy integer matmul, no BLAS
            s = X.sum(axis=0, dtype=np.int64)
            d = G.shape[0]
            ii, jj = np.indices((d, d))
            yield pd.DataFrame(
                {
                    "i": ii.ravel().astype("int32"),
                    "j": jj.ravel().astype("int32"),
                    "sxx": G.ravel().astype("int64"),
                    "s_i": np.where(
                        jj.ravel() == 0, s[ii.ravel()], 0
                    ).astype("int64"),
                    "cnt": np.where(
                        (ii.ravel() == 0) & (jj.ravel() == 0), len(pdf), 0
                    ).astype("int64"),
                }
            )

    partials = iq.mapInPandas(
        gram_partials, "i int, j int, sxx long, s_i long, cnt long"
    )
    agg = (
        partials.groupBy("i", "j")
        .agg(
            F.sum("sxx").alias("sxx"),
            F.sum("s_i").alias("s_i"),
            F.sum("cnt").alias("cnt"),
        )
        .collect()  # bounded: dim² = 4096 rows, documented above
    )
    d = max(r["i"] for r in agg) + 1
    sxx = np.zeros((d, d), dtype=np.int64)
    s = np.zeros(d, dtype=np.int64)
    n = 0
    for r in agg:
        sxx[r["i"], r["j"]] = r["sxx"]
        if r["j"] == 0:
            s[r["i"]] = r["s_i"]
        if r["i"] == 0 and r["j"] == 0:
            n = r["cnt"]
    gram = (n * sxx - np.outer(s, s)).astype(np.float64)
    v = np.full(d, 0.125, dtype=np.float64)
    nrm = 1.0
    for _ in range(10):
        u = gram @ v
        nrm = float(np.sqrt(np.sum(u * u)))
        v = u / nrm
    ev_scaled = nrm / (float(n) * float(n) * 1.0e12)
    out = pd.DataFrame(
        {
            "dim": np.arange(d, dtype=np.int64),
            "loading": v,
            "ev_scaled": np.full(d, ev_scaled),
        }
    )
    # round Spark-side: F.round is half-up like DuckDB ROUND; numpy's
    # banker's rounding would diverge on exact .5 boundaries
    return spark.createDataFrame(out).select(
        "dim",
        F.round("loading", 6).alias("loading"),
        F.round("ev_scaled", 6).alias("ev_scaled"),
    )


@query(
    "embedding_quantize_int8_error",
    oracle="""
    WITH vq AS (
      SELECT vec_id, label,
             CAST(CAST(CAST(unnest(embedding) AS DOUBLE) AS DECIMAL(9,6))
                  * 1000000 AS BIGINT) AS x
      FROM embeddings
    ),
    mv AS (
      SELECT vec_id, MAX(abs(x)) AS m FROM vq GROUP BY vec_id
    ),
    e AS (
      SELECT vq.vec_id, vq.label, vq.x, mv.m,
             127 * vq.x
             - (CASE WHEN (254 * vq.x + mv.m) >= 0
                     THEN (254 * vq.x + mv.m) // (2 * mv.m)
                     ELSE -(((-(254 * vq.x + mv.m)) + 2 * mv.m - 1)
                            // (2 * mv.m))
                END) * mv.m AS err
      FROM vq JOIN mv ON vq.vec_id = mv.vec_id
      WHERE mv.m > 0
    )
    SELECT label,
           CAST(COUNT(DISTINCT vec_id) AS BIGINT) AS n_vecs,
           CAST(COUNT(*) AS BIGINT) AS n_components,
           CAST(SUM(err * err) AS BIGINT) AS sse_scaled,
           ROUND(sqrt(CAST(SUM(err * err) AS DOUBLE)
                      / CAST(COUNT(*) AS DOUBLE)) / 127000000.0, 9)
             AS rmse
    FROM e GROUP BY label
    """,
)
def embedding_quantize_int8_error(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-vector symmetric int8 quantization (the scalar-quantization
    step every vector index runs before PQ/IVF: scale by 127/max|x|,
    round to integer) with an EXACT reconstruction-error audit per
    label. The whole pipeline is integer math: components are
    decimal(9,6)-quantized micro-units (quantize_vec), the quantized
    code is floor(127·x/m + 1/2) computed as an integer case-split so
    Spark's truncating DIV and DuckDB's flooring // agree on both
    signs, and the per-component error 127·x − q·m is an exact int64
    whose squared sum stays < 2^63 to ~1e9 vectors. Only the final
    RMSE touches doubles (identical expression, ROUND 9).

    Scale shape: per-vector work is a codegen HOF chain over the
    array column — no explode, no shuffle until the label rollup
    (map-side combinable). The quantization itself is the bandwidth
    saver at 100 TB: 4x smaller vectors before any index build."""
    from ..operators.similarity import quantize_vec

    emb = read_table(spark, sf_dir, "embeddings")
    df = (
        emb.select(
            "vec_id",
            "label",
            quantize_vec(F.col("embedding")).alias("xq"),
        )
        .withColumn(
            "m", F.array_max(F.expr("transform(xq, v -> abs(v))"))
        )
        .filter(F.col("m") > 0)
    )
    errs = df.withColumn(
        "errs",
        F.expr(
            "transform(xq, v -> 127 * v"
            " - (CASE WHEN (254 * v + m) >= 0"
            "         THEN (254 * v + m) DIV (2 * m)"
            "         ELSE -(((-(254 * v + m)) + 2 * m - 1)"
            "                DIV (2 * m))"
            "    END) * m)"
        ),
    ).withColumn(
        "sse",
        F.expr(
            "aggregate(errs, CAST(0 AS BIGINT),"
            " (acc, e) -> acc + e * e)"
        ),
    ).withColumn("n_comp", F.size("xq").cast("bigint"))
    g = errs.groupBy("label").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
        F.sum("n_comp").cast("bigint").alias("n_components"),
        F.sum("sse").cast("bigint").alias("sse_scaled"),
    )
    return g.select(
        "label",
        "n_vecs",
        "n_components",
        "sse_scaled",
        F.round(
            F.sqrt(
                F.col("sse_scaled").cast("double")
                / F.col("n_components").cast("double")
            )
            / 127000000.0,
            9,
        ).alias("rmse"),
    )


@query(
    "embedding_jl_projection_distortion",
    oracle="""
    WITH planes AS (
      SELECT pp.p, dd.d,
             (CAST('0x' || substring(md5('jl-' || pp.p || '-' || dd.d),
                                     1, 15) AS BIGINT) % 2) * 2 - 1 AS r
      FROM (SELECT unnest(generate_series(0, 15)) AS p) pp,
           (SELECT unnest(generate_series(0, 63)) AS d) dd
    ),
    vq AS (
      SELECT vec_id, d, x FROM (
        SELECT vec_id,
               generate_subscripts(embedding, 1) - 1 AS d,
               CAST(CAST(CAST(unnest(embedding) AS DOUBLE) AS DECIMAL(9,6))
                    * 1000000 AS BIGINT) AS x
        FROM embeddings)
    ),
    proj AS (
      SELECT vec_id, p, CAST(SUM(x * r) AS BIGINT) AS y
      FROM vq JOIN planes USING (d)
      GROUP BY vec_id, p
    ),
    pairs AS (
      SELECT a.vec_id AS va, b.vec_id AS vb
      FROM (SELECT DISTINCT vec_id FROM vq) a
      JOIN (SELECT DISTINCT vec_id FROM vq) b
        ON b.vec_id = a.vec_id + 17
      WHERE a.vec_id % 10 = 0
    ),
    d2o AS (
      SELECT p.va, p.vb, CAST(SUM((xa.x - xb.x) * (xa.x - xb.x)) AS BIGINT)
               AS d2_orig
      FROM pairs p
      JOIN vq xa ON xa.vec_id = p.va
      JOIN vq xb ON xb.vec_id = p.vb AND xb.d = xa.d
      GROUP BY p.va, p.vb
    ),
    d2p AS (
      SELECT p.va, p.vb, CAST(SUM((ya.y - yb.y) * (ya.y - yb.y)) AS BIGINT)
               AS d2_proj
      FROM pairs p
      JOIN proj ya ON ya.vec_id = p.va
      JOIN proj yb ON yb.vec_id = p.vb AND yb.p = ya.p
      GROUP BY p.va, p.vb
    )
    SELECT o.va AS vec_id_a, o.vb AS vec_id_b, o.d2_orig, j.d2_proj,
           ROUND(CAST(j.d2_proj AS DOUBLE) / 16.0
                 / CAST(o.d2_orig AS DOUBLE), 6) AS distortion_ratio
    FROM d2o o JOIN d2p j ON o.va = j.va AND o.vb = j.vb
    WHERE o.d2_orig > 0
    """,
)
def embedding_jl_projection_distortion(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Johnson–Lindenstrauss random projection (64 → 16 dims,
    Rademacher ±1 matrix from seeded md5 — Achlioptas 2003) with an
    EXACT pairwise-distance distortion audit: for a deterministic pair
    sample (every 10th vector against its +17 neighbor), the original
    and projected squared distances are exact int64 (quantized
    micro-unit components, ±1 projection entries), and the distortion
    ratio ||R(a−b)||²/(k·||a−b||²) — expected 1 under JL — is one
    identical double expression, ROUND 6. The md5-derived matrix means
    the DuckDB oracle REBUILDS the projection bit-for-bit (the int-SRP
    move, operators/similarity.py:331).

    Scale shape: projection is a per-row HOF fold (codegen, no
    shuffle) — the 4x dimension cut every downstream ANN/cluster pass
    pays for once; the audit joins are pair-sample-sized. The ±1
    matrix is 16×64 literals — broadcast-free."""
    import hashlib

    emb = read_table(spark, sf_dir, "embeddings")
    planes = [
        [
            (int(hashlib.md5(f"jl-{p}-{d}".encode()).hexdigest()[:15], 16)
             % 2) * 2 - 1
            for d in range(64)
        ]
        for p in range(16)
    ]
    from ..operators.similarity import quantize_vec

    vq = emb.select(
        "vec_id", quantize_vec(F.col("embedding")).alias("xq")
    )
    proj_cols = [
        F.aggregate(
            F.zip_with(
                F.col("xq"),
                F.array(*[F.lit(v) for v in row]),
                lambda x, r: x * r,
            ),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        ).alias(f"y{p}")
        for p, row in enumerate(planes)
    ]
    pv = vq.select("vec_id", "xq", F.array(*proj_cols).alias("yq"))
    a = pv.select(
        F.col("vec_id").alias("vec_id_a"),
        F.col("xq").alias("xa"),
        F.col("yq").alias("ya"),
    ).filter(F.col("vec_id_a") % 10 == 0)
    b = pv.select(
        F.col("vec_id").alias("vec_id_b"),
        F.col("xq").alias("xb"),
        F.col("yq").alias("yb"),
    )
    j = a.join(b, F.col("vec_id_b") == F.col("vec_id_a") + 17)

    def sqdist(u, v):
        return F.aggregate(
            F.zip_with(F.col(u), F.col(v), lambda x, y: (x - y) * (x - y)),
            F.lit(0).cast("long"),
            lambda acc, w: acc + w,
        )

    out = j.select(
        "vec_id_a",
        "vec_id_b",
        sqdist("xa", "xb").alias("d2_orig"),
        sqdist("ya", "yb").alias("d2_proj"),
    ).filter(F.col("d2_orig") > 0)
    return out.withColumn(
        "distortion_ratio",
        F.round(
            F.col("d2_proj").cast("double")
            / 16.0
            / F.col("d2_orig").cast("double"),
            6,
        ),
    )


@query(
    "array_hof_surface",
    oracle="""
    WITH vq AS (
      SELECT vec_id, label,
             list_transform(embedding,
               e -> CAST(CAST(CAST(e AS DOUBLE) AS DECIMAL(9,6)) * 1000000
                         AS BIGINT)) AS xq
      FROM embeddings
    )
    SELECT vec_id,
           array_to_string(list_sort(xq, 'DESC')[1:3], ',') AS top3,
           list_bool_or(list_transform(xq, v -> v > 500000)) AS any_big,
           list_bool_and(list_transform(xq, v -> v > -2000000)) AS all_sane,
           CAST(len(list_distinct(xq)) AS BIGINT) AS n_distinct,
           CAST(COALESCE(list_sum(list_filter(xq, v -> v > 0)), 0)
                AS BIGINT) AS sum_pos
    FROM vq
    """,
)
def array_hof_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array-function surface in one pass: sort-desc
    top-3, EXISTS / FORALL predicates, distinct-count, and a filtered
    fold — the lambda-expression vocabulary (SPARK-23908) against
    DuckDB's list_* twins. Components are decimal(9,6)-quantized
    int64s first so every comparison and the array-to-string render
    are integer-exact; the top-3 slice is deterministic because sort
    order on distinct-able ints has no float ties.

    Scale shape: all codegen HOFs over the array column — zero
    shuffle, scan speed."""
    from ..operators.similarity import quantize_vec

    emb = read_table(spark, sf_dir, "embeddings")
    vq = emb.select(
        "vec_id", quantize_vec(F.col("embedding")).alias("xq")
    )
    return vq.select(
        "vec_id",
        F.expr(
            "array_join(slice(sort_array(xq, false), 1, 3), ',')"
        ).alias("top3"),
        F.expr("exists(xq, v -> v > 500000)").alias("any_big"),
        F.expr("forall(xq, v -> v > -2000000)").alias("all_sane"),
        F.expr("CAST(size(array_distinct(xq)) AS BIGINT)").alias(
            "n_distinct"
        ),
        F.expr(
            "aggregate(filter(xq, v -> v > 0), CAST(0 AS BIGINT),"
            " (acc, v) -> acc + v)"
        ).alias("sum_pos"),
    )


# ---------------------------------------------------------------------------
# IVF operating-point sweep: recall fence at each n_probe (round 10b)
# ---------------------------------------------------------------------------

# Floors measured with >=3-hit margin at BOTH scales (hits/50:
# sf0.01 14/18/28/40, sf0.1 17/23/30/41 for n_probe 1/2/4/8).
_NPROBE_FLOORS = {1: 20, 2: 30, 4: 50, 8: 70}


@query(
    "similarity_recall_vs_nprobe_curve",
    oracle=f"""
    WITH q AS (SELECT vec_id FROM embeddings ORDER BY vec_id
               LIMIT {N_QUERY_VECS}),
    pts AS (SELECT UNNEST([1, 2, 4, 8]) AS n_probe)
    SELECT pts.n_probe,
           CAST((SELECT COUNT(*) FROM q) AS BIGINT) AS n_queries,
           CAST({TOP_K} AS INT) AS k,
           CAST((SELECT COUNT(*) FROM q) * {TOP_K} AS BIGINT)
             AS n_result_rows,
           CAST(1 AS INT) AS recall_ok,
           CAST(1 AS INT) AS monotone_ok
    FROM pts ORDER BY pts.n_probe
    """,
)
def similarity_recall_vs_nprobe_curve(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ANN tuning curve: ONE IVF codebook (index-once / probe-many),
    probed at n_probe ∈ {1,2,4,8}, each operating point emitted through
    the bound-as-value recall fence (row-count contract + integer
    recall floor vs Spark-computed brute force), PLUS the superset
    guarantee as a value: with exact re-ranking, a larger probe set's
    hits are provably non-decreasing, so monotone_ok must be 1 at every
    point.  This is the n_probe-vs-recall table an index operator
    actually tunes from.

    Determinism: fence rule — hits·100 >= n·k·pct in integer math;
    monotonicity via integer lag comparison over the 4-row sweep.

    Scale shape: ONE corpus cell assignment and ONE candidate scoring
    pass at max(n_probe) carrying the probe rank (operators/
    similarity.py ivf_topk_sweep); each operating point is a filter +
    top-k window over the pinned pruned candidates, so 4 points cost ~1
    index run (20.8s -> 5.9s at sf0.01).  Brute-force top-k is computed
    once and pin()ed, reused by all 4 fences.
    """
    from ..plans.pin import pin

    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.orderBy("vec_id").limit(N_QUERY_VECS)
    sweep = SIM.ivf_topk_sweep(
        emb, queries, k=TOP_K, n_centroids=16,
        probes=tuple(_NPROBE_FLOORS),
    )
    bf = pin(SIM.cosine_topk(emb, queries, k=TOP_K), eager=False)
    pairs = bf.select("query_id", "neighbor_id").withColumn(
        "__hit", F.lit(1)
    )
    nq = queries.agg(F.count(F.lit(1)).alias("nq"))
    floors = F.create_map(
        *[F.lit(x) for kv in _NPROBE_FLOORS.items() for x in kv]
    )
    stats = (
        sweep.select("n_probe", "query_id", "neighbor_id")
        .join(F.broadcast(pairs), ["query_id", "neighbor_id"], "left")
        .groupBy("n_probe")
        .agg(
            F.count(F.lit(1)).alias("n_result_rows"),
            F.sum(F.coalesce(F.col("__hit"), F.lit(0))).alias("hits"),
        )
        .withColumn("pct", floors[F.col("n_probe")])
    )
    return (
        stats.crossJoin(F.broadcast(nq))
        .select(
            "n_probe",
            F.col("nq").cast("bigint").alias("n_queries"),
            F.lit(TOP_K).cast("int").alias("k"),
            F.col("n_result_rows").cast("bigint").alias("n_result_rows"),
            (F.col("hits") * 100 >= F.col("nq") * TOP_K * F.col("pct"))
            .cast("int")
            .alias("recall_ok"),
            (
                F.col("hits")
                >= F.coalesce(
                    # n_probe sweep grain: bounded (a few probe settings)
                    F.lag("hits").over(Window.orderBy("n_probe")),
                    F.lit(0),
                )
            )
            .cast("int")
            .alias("monotone_ok"),
        )
        .orderBy("n_probe")
    )


N_TRIPLET_QUERIES = 60


@query(
    "similarity_triplet_hard_negatives",
    oracle=f"""
    WITH q AS (
      SELECT vec_id AS qid, label AS qlabel, embedding::DOUBLE[] AS qv
      FROM embeddings WHERE vec_id < {N_TRIPLET_QUERIES}
    ),
    c AS (SELECT vec_id AS nid, label, embedding::DOUBLE[] AS cv
          FROM embeddings),
    scored AS (
      SELECT q.qid, q.qlabel, c.nid,
             CASE WHEN c.label = q.qlabel THEN 1 ELSE 0 END AS same,
             list_dot_product(qv, cv)
               / (sqrt(list_dot_product(qv, qv))
                  * sqrt(list_dot_product(cv, cv))) AS score
      FROM q JOIN c ON c.nid <> q.qid
    ),
    best AS (
      SELECT qid, qlabel, same, nid, score,
             ROW_NUMBER() OVER (PARTITION BY qid, same
                                ORDER BY score DESC, nid) AS rk
      FROM scored
    )
    SELECT p.qid AS query_id, p.qlabel AS label,
           p.nid AS pos_id, ROUND(p.score, 9) AS pos_score,
           n.nid AS neg_id, ROUND(n.score, 9) AS neg_score,
           ROUND(p.score - n.score, 9) AS margin,
           CAST(ROUND(n.score - p.score, 9) >= 0 AS INT)
             AS margin_violation
    FROM best p JOIN best n ON n.qid = p.qid
    WHERE p.same = 1 AND p.rk = 1 AND n.same = 0 AND n.rk = 1
    ORDER BY p.qid
    """,
)
def similarity_triplet_hard_negatives(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TRIPLET HARD-NEGATIVE MINING for embedding-model training: for
    each query vector, the most-similar SAME-label vector (positive)
    and the most-similar OTHER-label vector (hard negative), with the
    triplet margin and a violation flag (negative closer than positive
    = the triplet a trainer actually wants in the batch).

    Determinism: scores are the identical zip_with/aggregate
    sequential fold both engines run (rounded 9 on output per house
    rule); the per-side argmax is value-determined with a neighbor-id
    tie-break (max of (score, -nid) struct == ROW_NUMBER rank-1 in the
    oracle); the margin and violation flag compare the same rounded
    diffs.

    Scale shape: the query block broadcasts (bounded at
    N_TRIPLET_QUERIES); the corpus never shuffles — scoring happens in
    the scan projection and the per-(query, side) argmax is ONE
    map-side-combinable aggregate (max_by via struct max), no window
    over candidates, no candidate materialization at all.

    Round 14: keyed :func:`spread` of the corpus projection — the
    single-row-group local scan ran ALL |Q|x|corpus| cosine folds on
    one core before the first exchange (guide §2.5; no-op on cluster
    layouts). A/B solo 2.38 → 0.81 s; scores/argmax unchanged (spread
    only moves rows, the argmax is value-determined with an id
    tie-break)."""
    from ..operators.partitioning import spread
    from ..operators.similarity import _as_double, cosine
    from ..plans.pin import pin

    emb = read_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < N_TRIPLET_QUERIES).select(
        F.col("vec_id").alias("qid"),
        F.col("label").alias("qlabel"),
        _as_double("embedding").alias("qv"),
    )
    c = spread(
        emb.select(
            F.col("vec_id").alias("nid"),
            F.col("label").alias("nlabel"),
            _as_double("embedding").alias("cv"),
        ),
        by=["nid"],
    )
    scored = (
        c.join(F.broadcast(q), F.col("nid") != F.col("qid"))
        .select(
            "qid",
            "qlabel",
            "nid",
            F.when(F.col("nlabel") == F.col("qlabel"), 1)
            .otherwise(0)
            .alias("same"),
            cosine(F.col("qv"), F.col("cv")).alias("score"),
        )
    )
    best = (
        scored.groupBy("qid", "qlabel", "same")
        .agg(
            F.max(
                F.struct(
                    F.col("score"), (-F.col("nid")).alias("neg_nid")
                )
            ).alias("b")
        )
        .select(
            "qid",
            "qlabel",
            "same",
            (-F.col("b.neg_nid")).alias("nid"),
            F.col("b.score").alias("score"),
        )
        # both the pos and neg branches read this frame: pin it so the
        # corpus-scoring cross join runs ONCE (PLANS.md rescan triage)
        .transform(pin, eager=False)
    )
    p = best.filter(F.col("same") == 1).select(
        F.col("qid").alias("query_id"),
        F.col("qlabel").alias("label"),
        F.col("nid").alias("pos_id"),
        F.col("score").alias("pos_raw"),
    )
    n = best.filter(F.col("same") == 0).select(
        F.col("qid").alias("query_id"),
        F.col("nid").alias("neg_id"),
        F.col("score").alias("neg_raw"),
    )
    return (
        p.join(F.broadcast(n), "query_id")
        .select(
            "query_id",
            "label",
            "pos_id",
            F.round("pos_raw", 9).alias("pos_score"),
            "neg_id",
            F.round("neg_raw", 9).alias("neg_score"),
            F.round(F.col("pos_raw") - F.col("neg_raw"), 9).alias("margin"),
            (F.round(F.col("neg_raw") - F.col("pos_raw"), 9) >= 0)
            .cast("int")
            .alias("margin_violation"),
        )
        .orderBy("query_id")
    )


@query(
    "embedding_dim_variance_profile",
    oracle="""
    WITH q AS (
      SELECT vec_id,
             unnest(embedding) AS fv,
             generate_subscripts(embedding, 1) AS dim
      FROM embeddings
    ),
    iv AS (
      SELECT CAST(dim AS INT) AS dim,
             CAST(CAST(CAST(fv AS DOUBLE) AS DECIMAL(9,6)) * 1000000
                  AS BIGINT) AS v
      FROM q
    )
    SELECT dim,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(CAST(SUM(v) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
                 / 1000000.0, 6) AS mean,
           ROUND((CAST(SUM(v*v) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
                  - (CAST(SUM(v) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))
                    * (CAST(SUM(v) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)))
                 / 1000000000000.0, 9) AS var_pop,
           ROUND(CAST(MIN(v) AS DOUBLE) / 1000000.0, 6) AS min_v,
           ROUND(CAST(MAX(v) AS DOUBLE) / 1000000.0, 6) AS max_v
    FROM iv GROUP BY dim ORDER BY dim
    """,
)
def embedding_dim_variance_profile(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """PER-DIMENSION embedding health profile: mean, population
    variance and range for each of the 64 dimensions — the feature-QA
    pass that catches dead dimensions (no variance), drifted scaling
    and saturated channels before they silently poison similarity
    search.

    Determinism: each component is quantized float -> double ->
    DECIMAL(9,6) -> scaled int64 (the int-SRP quantization, exact and
    engine-identical), so every sum/moment is exact integer math; the
    final means/variances are identical-expression divisions, ROUND
    6/9.  v*v sums stay inside int64 to ~9e6 vectors; past that widen
    to DECIMAL(38,0).

    Scale shape: posexplode fans out executor-side (64 rows per
    vector) into ONE map-side-combinable groupBy on the 64-value dim
    key — no shuffle wider than the dim domain."""
    emb = read_table(spark, sf_dir, "embeddings")
    iv = emb.select(
        F.posexplode("embedding").alias("dim0", "fv")
    ).select(
        (F.col("dim0") + 1).cast("int").alias("dim"),
        F.expr(
            "CAST(CAST(CAST(fv AS DOUBLE) AS DECIMAL(9,6)) * 1000000"
            " AS BIGINT)"
        ).alias("v"),
    )
    return (
        iv.groupBy("dim")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("v").cast("bigint").alias("sv"),
            F.sum(F.col("v") * F.col("v")).cast("bigint").alias("svv"),
            F.min("v").cast("bigint").alias("mn"),
            F.max("v").cast("bigint").alias("mx"),
        )
        .selectExpr(
            "dim",
            "n",
            "ROUND(CAST(sv AS DOUBLE) / CAST(n AS DOUBLE) / 1000000.0, 6)"
            " AS mean",
            "ROUND((CAST(svv AS DOUBLE) / CAST(n AS DOUBLE)"
            " - (CAST(sv AS DOUBLE) / CAST(n AS DOUBLE))"
            " * (CAST(sv AS DOUBLE) / CAST(n AS DOUBLE)))"
            " / 1000000000000.0, 9) AS var_pop",
            "ROUND(CAST(mn AS DOUBLE) / 1000000.0, 6) AS min_v",
            "ROUND(CAST(mx AS DOUBLE) / 1000000.0, 6) AS max_v",
        )
        .orderBy("dim")
    )


# ---------------------------------------------------------------------------
# Persisted IVF index: build once on disk, probe from the index only
# ---------------------------------------------------------------------------


@query("similarity_ivf_index_persist", oracle=_BRUTE_TOPK_ORACLE)
def similarity_ivf_index_persist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF index PERSISTED to storage, then probed: the index build
    (codebook + cell assignment) writes a parquet table partitioned by
    cell id — `partitionBy(cid)` makes every cell its own directory —
    and the probe phase runs :func:`ivf_topk` against ONLY the
    persisted index, never re-touching the raw corpus. This is the
    index-once/probe-many pattern made literal for a 100 TB corpus:
    one assignment pass amortizes over every future query batch, and a
    pruned probe (n_probe < n_centroids) reads n_probe/n_centroids of
    the index DIRECTORIES (partition pruning on the cid join key).

    Probing ALL cells here makes the result exactly brute force, so
    the full build→persist→read→probe machinery is hash-verified
    against the exact-cosine SQL oracle (the no-pruning-invariant
    discipline; scores ROUND 9 for BLAS-vs-fold ulps).
    """
    import os

    from ..plans.pin import pin
    from .sources_sinks import _scratch

    emb = pin(
        read_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    )
    cents = SIM.ivf_centroids(emb, n_centroids=16)
    assigned = SIM._assign_cells(
        emb.select(
            F.col("vec_id").alias("neighbor_id"),
            SIM._as_double("embedding").alias("cv"),
        ),
        "cv",
        cents,
        1,
        "cids",
    ).withColumn("cid", F.col("cids")[0]).drop("cids")
    path = os.path.join(_scratch("ivfidx"), "index")
    assigned.write.partitionBy("cid").parquet(path)
    idx = spark.read.parquet(path)
    queries = emb.filter(F.col("vec_id") < N_QUERY_VECS)
    out = SIM.ivf_topk(
        emb,
        queries,
        k=TOP_K,
        n_centroids=16,
        n_probe=16,
        cents=cents,
        assigned=idx,
    )
    return out.withColumn("score", F.round("score", 9))


# ---------------------------------------------------------------------------
# Matryoshka truncation distortion: cosine drift when keeping d/2 dims
# ---------------------------------------------------------------------------


@query(
    "embedding_matryoshka_truncation_error",
    oracle="""
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS v,
             (embedding::DOUBLE[])[1:32] AS vh
      FROM embeddings
    ),
    p AS (
      SELECT a.vec_id AS id_a,
             CAST(ROUND(list_dot_product(a.v, b.v)
               / (sqrt(list_dot_product(a.v, a.v))
                  * sqrt(list_dot_product(b.v, b.v))), 9)
               AS DECIMAL(18,9)) AS cos_full,
             CAST(ROUND(list_dot_product(a.vh, b.vh)
               / (sqrt(list_dot_product(a.vh, a.vh))
                  * sqrt(list_dot_product(b.vh, b.vh))), 9)
               AS DECIMAL(18,9)) AS cos_half
      FROM e a JOIN e b ON b.vec_id = a.vec_id + 1
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(CAST(abs(cos_full - cos_half) AS DECIMAL(18,9)))
                AS DOUBLE) AS total_abs_drift,
           CAST(MAX(CAST(abs(cos_full - cos_half) AS DECIMAL(18,9)))
                AS DOUBLE) AS max_abs_drift,
           CAST(SUM(CASE WHEN (cos_full >= 0.5) <> (cos_half >= 0.5)
                         THEN 1 ELSE 0 END) AS BIGINT)
             AS threshold_flips
    FROM p
    """,
)
def embedding_matryoshka_truncation_error(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Matryoshka-style truncation audit: how much does cosine
    similarity drift when keeping only the FIRST 32 of 64 dims — the
    measurement behind MRL-truncated retrieval indexes (store d/2,
    re-rank at d). Pairs are the deterministic adjacent-id chain
    (vec_id, vec_id+1): corpus-linear, no all-pairs.

    Determinism: each cosine is a left-fold dot product (identical
    array order both engines) rounded to 9 decimals and QUANTIZED to
    DECIMAL(18,9), so the |full − half| drifts, their sum/max, and the
    0.5-threshold flip count are exact decimal arithmetic.

    Scale shape: a self-join on vec_id+1 (one shuffle, or co-located
    under id bucketing); per-row JVM HOF folds, no Python, no window.
    """
    e = read_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("v"),
        F.transform(
            F.slice(F.col("embedding"), 1, 32), lambda x: x.cast("double")
        ).alias("vh"),
    )

    def dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    a = e.select(
        F.col("vec_id").alias("id_a"),
        F.col("v").alias("va"),
        F.col("vh").alias("vha"),
    )
    b = e.select(
        (F.col("vec_id") - 1).alias("id_a"),
        F.col("v").alias("vb"),
        F.col("vh").alias("vhb"),
    )
    p = a.join(b, "id_a").select(
        "id_a",
        F.round(
            dot(F.col("va"), F.col("vb"))
            / (
                F.sqrt(dot(F.col("va"), F.col("va")))
                * F.sqrt(dot(F.col("vb"), F.col("vb")))
            ),
            9,
        )
        .cast("decimal(18,9)")
        .alias("cos_full"),
        F.round(
            dot(F.col("vha"), F.col("vhb"))
            / (
                F.sqrt(dot(F.col("vha"), F.col("vha")))
                * F.sqrt(dot(F.col("vhb"), F.col("vhb")))
            ),
            9,
        )
        .cast("decimal(18,9)")
        .alias("cos_half"),
    )
    drift = F.abs(F.col("cos_full") - F.col("cos_half")).cast(
        "decimal(18,9)"
    )
    flip = (F.col("cos_full") >= 0.5) != (F.col("cos_half") >= 0.5)
    return p.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sum(drift).cast("double").alias("total_abs_drift"),
        F.max(drift).cast("double").alias("max_abs_drift"),
        F.sum(F.when(flip, 1).otherwise(0)).cast("bigint").alias(
            "threshold_flips"
        ),
    )


# ---------------------------------------------------------------------------
# Mutual-kNN symmetrization: reciprocity of the within-label kNN graph
# ---------------------------------------------------------------------------


def _mutual_knn_oracle() -> str:
    from .registry import ORACLES

    return f"""
    WITH knn AS ({ORACLES["similarity_knn_within_label"]})
    SELECT CAST(COUNT(*) AS BIGINT) AS n_directed_edges,
           CAST(SUM(CASE WHEN m.vec_id IS NOT NULL THEN 1 ELSE 0 END) / 2
                AS BIGINT) AS n_mutual_pairs,
           CAST(SUM(CASE WHEN m.vec_id IS NOT NULL THEN 1 ELSE 0 END)
                * 1000000 // COUNT(*) AS BIGINT) AS reciprocity_ppm
    FROM knn e LEFT JOIN knn m
      ON m.vec_id = e.neighbor_id AND m.neighbor_id = e.vec_id
    """


@query("similarity_mutual_knn_pairs", oracle=_mutual_knn_oracle())
def similarity_mutual_knn_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual-kNN symmetrization: how many directed top-3 edges of the
    within-label kNN graph are RECIPROCATED (a in b's top-3 AND b in
    a's top-3) — the standard graph-cleaning step before density-based
    dedup/clustering (mutual edges are far more precise than one-way
    neighbors). Reuses the hash-oracled blocked kNN construction; the
    oracle composes that key's SQL verbatim as a CTE, so both layers
    stay in lockstep.

    Determinism: edge membership is rank-determined with the
    (score desc, neighbor_id) tie-break already pinned by the kNN key;
    counts are exact integers, reciprocity ships as exact ppm.

    Scale shape: the kNN frame (corpus × k rows) self-joins once on
    the swapped pair key — a shuffle of the EDGE LIST only, never the
    corpus; per-label blocks bound candidate generation upstream.
    """
    knn = QUERIES["similarity_knn_within_label"](spark, sf_dir).select(
        "vec_id", "neighbor_id"
    )
    from ..plans.pin import pin

    knn = pin(knn)  # both sides of the reciprocity self-join
    m = knn.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("neighbor_id").alias("vec_id"),
        F.lit(1).alias("__m"),
    )
    j = knn.join(m, ["vec_id", "neighbor_id"], "left")
    hit = F.sum(F.coalesce(F.col("__m"), F.lit(0)))
    return j.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_directed_edges"),
        (hit / 2).cast("bigint").alias("n_mutual_pairs"),
        (hit * 1000000).cast("bigint").alias("__hm"),
    ).selectExpr(
        "n_directed_edges",
        "n_mutual_pairs",
        "CAST(__hm DIV n_directed_edges AS BIGINT) AS reciprocity_ppm",
    )


# ---------------------------------------------------------------------------
# Round-12 additions: unit-norm audit + per-dimension magnitude profile
# ---------------------------------------------------------------------------


@query(
    "embedding_unit_norm_audit",
    oracle="""
    WITH q AS (
      SELECT label,
             list_sum(list_transform(embedding,
               x -> CAST(CAST(CAST(x AS DOUBLE) AS DECIMAL(9,6)) * 1000000
                         AS BIGINT)
                    * CAST(CAST(CAST(x AS DOUBLE) AS DECIMAL(9,6)) * 1000000
                           AS BIGINT))) AS nsq
      FROM embeddings)
    SELECT label,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           CAST(MAX(abs(nsq - 1000000000000)) AS BIGINT)
             AS max_abs_drift_int,
           CAST(SUM(CASE WHEN abs(nsq - 1000000000000) > 10000000
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_out_of_tol
    FROM q GROUP BY label ORDER BY label
    """,
)
def embedding_unit_norm_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unit-normalization audit of the embedding corpus: per label, the
    max |‖v‖² − 1| drift and the count beyond a 10⁻⁵ tolerance — the
    data-quality gate before any cosine machinery (an unnormalized
    batch silently corrupts dot-product ≡ cosine shortcuts). Vectors
    quantize through the int-SRP decimal(9,6)→·10⁶→int64 path, so ‖v‖²
    is an exact int64 (64·(10⁶)² ≪ 2^53) and every drift/threshold is
    integer math.

    Scale shape: one scan, per-row array fold, label-grain aggregate."""
    from ..operators.similarity import quantize_vec

    emb = read_table(spark, sf_dir, "embeddings")
    q = quantize_vec("embedding")
    nsq = F.aggregate(
        q,
        F.lit(0).cast("long"),
        lambda acc, x: acc + x * x,
    )
    drift = F.abs(nsq - F.lit(10**12))
    return (
        emb.select("label", drift.alias("drift"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
            F.max("drift").cast("bigint").alias("max_abs_drift_int"),
            F.sum((F.col("drift") > 10**7).cast("int"))
            .cast("bigint")
            .alias("n_out_of_tol"),
        )
        .orderBy("label")
    )


@query(
    "embedding_dim_mean_abs_profile",
    oracle="""
    WITH vq AS (
      SELECT generate_subscripts(embedding, 1) - 1 AS dim,
             CAST(CAST(CAST(unnest(embedding) AS DOUBLE) AS DECIMAL(9,6))
                  * 1000000 AS BIGINT) AS x
      FROM embeddings)
    SELECT CAST(dim AS INT) AS dim,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(abs(x)) AS BIGINT) AS sum_abs_int,
           CAST(SUM(abs(x)) AS BIGINT)
             / (CAST(COUNT(*) AS DOUBLE) * 1000000.0) AS mean_abs
    FROM vq GROUP BY dim ORDER BY dim
    """,
)
def embedding_dim_mean_abs_profile(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-dimension mean |x| over the corpus — the dead/dominant-
    dimension profile that decides Matryoshka truncation points and
    flags collapsed dimensions after a bad fine-tune (the variance
    sibling is embedding_dim_variance_profile). Components quantize to
    exact int64, so the sums are exact and mean_abs is one identical
    division.

    Scale shape: posexplode → 64-group map-side-combined aggregate;
    nothing wider than (dim) shuffles."""
    from ..operators.similarity import quantize_vec

    emb = read_table(spark, sf_dir, "embeddings")
    return (
        emb.select(
            F.posexplode(quantize_vec("embedding")).alias("dim", "x")
        )
        .groupBy("dim")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.abs("x")).cast("bigint").alias("sum_abs_int"),
        )
        .select(
            F.col("dim").cast("int").alias("dim"),
            "n",
            "sum_abs_int",
            (
                F.col("sum_abs_int")
                / (F.col("n").cast("double") * F.lit(1000000.0))
            ).alias("mean_abs"),
        )
        .orderBy("dim")
    )
